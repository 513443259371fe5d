"""Batch 44: price indices, self-excitation lift, triangle null model."""

import os
from datetime import datetime, timedelta


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


EVENTS = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
LINEITEM = (
    "l_orderkey long, l_partkey long, l_quantity double, "
    "l_extendedprice double, l_shipdate timestamp"
)


def test_price_index_uniform_inflation(spark, tmp_path):
    """Every part's unit price doubles in month 2 with any quantity mix
    -> Laspeyres = Paasche = Fisher = 2."""
    from pliers_spark.queries import QUERIES

    rows = []
    k = 0
    for part, (p0, q0, q1) in {1: (10.0, 5, 3), 2: (40.0, 2, 7)}.items():
        rows.append((k, part, float(q0), p0 * q0, datetime(2024, 1, 10))); k += 1
        rows.append((k, part, float(q1), 2 * p0 * q1, datetime(2024, 2, 10))); k += 1
    sf = _write(spark, tmp_path, "lineitem", rows, LINEITEM)
    r = QUERIES["price_index"](spark, sf).collect()[0]
    assert r.n_parts == 2
    assert r.laspeyres == 2.0 and r.paasche == 2.0 and r.fisher == 2.0


def test_self_excitation_planted_bursts(spark, tmp_path):
    """'burst' events come in tight same-type runs -> lift > 1; 'alt'
    events always alternate with others -> same_soon = 0, lift NULL."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    t = datetime(2024, 1, 1)
    # user 1: burst burst burst ... (1-second gaps)
    for i in range(20):
        rows.append((eid, t + timedelta(seconds=i), 1, "burst", 1.0, "")); eid += 1
    # user 2: alt / other alternating
    for i in range(20):
        rows.append((eid, t + timedelta(seconds=i), 2,
                     "alt" if i % 2 == 0 else "other", 1.0, "")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = {r.event_type: r for r in QUERIES["self_excitation"](spark, sf).collect()}
    assert out["burst"].p_observed == 1.0 and out["burst"].lift > 1.0
    assert out["alt"].same_soon == 0 and out["alt"].lift is None


def test_triangle_nullmodel_clique_exceeds_null(spark, tmp_path):
    """A 5-clique has 10 triangles; the configuration null for the same
    degrees predicts fewer -> clustering_ratio > 1."""
    from pliers_spark.queries import QUERIES

    rows = [(1, p) for p in range(1, 6)]  # one basket = K5
    sf = _write(
        spark, tmp_path, "lineitem",
        [(o, p, 1.0, 1.0, datetime(2024, 1, 1)) for o, p in rows], LINEITEM,
    )
    r = QUERIES["triangle_nullmodel"](spark, sf).collect()[0]
    assert r.n_nodes == 5 and r.n_edges == 10 and r.triangles == 10
    # null: (sum d(d-1)/sum d)^3/6 = (60/20)^3/6 = 4.5
    assert r.expected_null == 4.5
    assert r.clustering_ratio == round(10 / 4.5, 4)

"""Batch 45: butterfly counting, weighted Jaccard, log-rank test."""

import os
from datetime import datetime, timedelta


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"
EVENTS = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_butterfly_k22(spark, tmp_path):
    """Two orders sharing the same two parts = exactly one butterfly;
    the 2x2 biclique's L3 = 4 so cc = 4*1/4 = 1."""
    from pliers_spark.queries import QUERIES

    rows = [(1, 10), (1, 20), (2, 10), (2, 20)]
    sf = _write(spark, tmp_path, "lineitem", rows, "l_orderkey long, l_partkey long")
    r = QUERIES["butterfly_count"](spark, sf).collect()[0]
    assert r.n_edges == 4 and r.butterflies == 1
    assert r.paths3 == 4 and r.bipartite_cc == 1.0


def test_butterfly_star_has_none(spark, tmp_path):
    """A star (one order, many parts) has no butterflies and no 3-paths
    from the order side only."""
    from pliers_spark.queries import QUERIES

    rows = [(1, p) for p in range(10, 15)]
    sf = _write(spark, tmp_path, "lineitem", rows, "l_orderkey long, l_partkey long")
    r = QUERIES["butterfly_count"](spark, sf).collect()[0]
    assert r.butterflies == 0 and r.paths3 == 0 and r.bipartite_cc is None


def test_weighted_jaccard_hand_multisets(spark, tmp_path):
    """A = {x:3, y:1}, B = {x:1, y:1, z:2}: WJ = (1+1)/(3+1+2) = 1/3."""
    from pliers_spark.queries import QUERIES

    rows = [
        (1, "x x x y", "en", "A", 1),
        (2, "x y z z", "en", "B", 1),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["weighted_jaccard"](spark, sf).collect()[0]
    assert (r.src_a, r.src_b) == ("A", "B")
    assert r.weighted_jaccard == round(2 / 6, 6)


def test_logrank_identical_groups_is_zero(spark, tmp_path):
    """Both arms convert on identical schedules -> O-E = 0, chi2 = 0."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    for u in range(20):  # parity split; mirrored behavior
        t0 = datetime(2024, 1, 1)
        rows.append((eid, t0, u, "view", 1.0, "")); eid += 1
        rows.append((eid, t0 + timedelta(days=(u // 2) % 5 + 1), u, "purchase", 1.0, "")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["logrank_test"](spark, sf).collect()[0]
    assert r.events_treat == r.events_ctrl == 10
    assert r.o_minus_e == 0.0 and r.chi2_logrank == 0.0


def test_logrank_separated_groups(spark, tmp_path):
    """Treated convert day 1, control day 20 -> large chi2."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    for u in range(20):
        t0 = datetime(2024, 1, 1)
        conv = 1 if u % 2 == 0 else 20
        rows.append((eid, t0, u, "view", 1.0, "")); eid += 1
        rows.append((eid, t0 + timedelta(days=conv), u, "purchase", 1.0, "")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["logrank_test"](spark, sf).collect()[0]
    assert abs(r.o_minus_e) > 3
    assert r.chi2_logrank > 10

"""Batch 109: ICC/design effect, batch means CI, reciprocity."""

import os
from datetime import datetime


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


def test_icc_clustered_vs_mixed(spark, tmp_path):
    """Users with internally-identical values: ICC ~ 1 and DEFF ~ m.
    Values independent of user: ICC ~ 0, DEFF ~ 1."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    for u in range(10):
        for _ in range(5):
            rows.append((eid, datetime(2024, 1, 1, 0, 0, eid), u, "c", float(10 * u), "{}"))
            eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["icc_design_effect"](spark, sf).collect()[0]
    assert r.n_clusters == 10 and r.n_obs == 50
    assert r.icc > 0.99
    assert r.design_effect > 4.5

    rows2 = []
    eid = 0
    for u in range(10):
        for j in range(5):
            rows2.append((eid, datetime(2024, 1, 1, 0, 0, eid), u, "c", float((eid * 7) % 11), "{}"))
            eid += 1
    sf2 = _write(spark, tmp_path, "events", rows2, EVENTS)
    r2 = QUERIES["icc_design_effect"](spark, sf2).collect()[0]
    assert abs(r2.icc) < 0.4
    assert r2.design_effect < r.design_effect


def test_batch_means_ci_brackets_mean(spark, tmp_path):
    from pliers_spark.queries import QUERIES

    rows = []
    for d in range(40):
        rows.append((d, datetime(2024, 1, 1 + d % 28, 0, 0, d // 28), d, "c", 10.0 + (d % 5), "{}"))
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["batch_means_ci"](spark, sf).collect()[0]
    assert r.n_batches == 10
    assert r.ci_lo <= r.grand_mean <= r.ci_hi
    assert r.se_batch >= 0


def test_reciprocity_bounds(spark):
    """On sf0.001: r in [0,1], mutual count even-consistent, and the
    density-corrected rho <= ... sanity bounds."""
    from pliers_spark.queries import QUERIES

    r = QUERIES["graph_reciprocity"](spark, "/root/testdata/sf0.001").collect()[0]
    assert 0 <= r.reciprocity <= 1
    assert r.n_recip % 2 == 0  # mutual pairs counted from both sides
    assert r.n_recip <= r.n_edges

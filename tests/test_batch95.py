"""Batch 95: RANSAC line, shorth mode, PCA projection."""

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
EMB = "vec_id long, embedding array<float>, label int"


def _days(vals):
    rows = []
    for d, v in enumerate(vals):
        rows.append((d, datetime(2024, 1, 1 + d, 0, 0, 0), d, "c", float(v), "{}"))
    return rows


def test_ransac_ignores_outliers(spark, tmp_path):
    """y = 2t + 5 with 3 wild outliers: consensus recovers the line
    (OLS would not); inliers = n - 3."""
    from pliers_spark.queries import QUERIES

    vals = [2 * t + 5 for t in range(20)]
    vals[3] = 500.0
    vals[11] = -300.0
    vals[17] = 999.0
    sf = _write(spark, tmp_path, "events", _days(vals), EVENTS)
    r = QUERIES["ransac_line"](spark, sf).collect()[0]
    assert r.n_inliers == 17
    assert abs(r.slope - 2.0) < 0.2
    assert abs(r.intercept - 5.0) < 3.0


def test_shorth_finds_dense_cluster(spark, tmp_path):
    """14 values near 10 and 6 spread far: the shorth interval sits in
    the dense cluster, not at the overall median span."""
    from pliers_spark.queries import QUERIES

    vals = [10.0 + 0.01 * i for i in range(14)] + [100.0, 200.0, -50.0, 300.0, 400.0, 500.0]
    rows = [(i, datetime(2024, 1, 1, 0, 0, i), i, "c", v, "{}") for i, v in enumerate(vals)]
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["shorth_mode"](spark, sf).collect()[0]
    assert r.n == 20 and r.half_count == 10
    assert 9.9 <= r.shorth_lo <= r.shorth_hi <= 10.2
    assert 9.9 <= r.mode_est <= 10.2


def test_pca_project_axis_aligned(spark, tmp_path):
    """Variance lives almost entirely in dim 0: pc1 ~ +-(x0 - anything
    constant); scores ordered like x0 (up to global sign)."""
    from pliers_spark.queries import QUERIES

    rows = []
    for i in range(30):
        v = [float(i), 0.1 * ((i * 3) % 2), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
        rows.append((i, v + [0.0] * 56, 0))
    sf = _write(spark, tmp_path, "embeddings", rows, EMB)
    out = {r.vec_id: r.pc1 for r in QUERIES["pca_project"](spark, sf).collect()}
    xs = [out[i] for i in range(30)]
    diffs = [xs[i + 1] - xs[i] for i in range(29)]
    assert all(d > 0 for d in diffs) or all(d < 0 for d in diffs)
    # spacing ~ 1 per step (unit eigenvector on dim 0)
    assert abs(abs(xs[1] - xs[0]) - 1.0) < 0.05

"""Batch 94: Granger lag-1, Davies-Bouldin, classical decomposition."""

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


def test_granger_clicks_drive_purchases(spark, tmp_path):
    """Purchases today = clicks yesterday exactly: huge F, b_xlag = 1.
    Independent purchases: F near 0."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    clicks = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    for d, c in enumerate(clicks):
        for j in range(c):
            rows.append((eid, datetime(2024, 1, 1 + d, 1, 0, j), eid, "click", 1.0, "{}"))
            eid += 1
        if d > 0:
            for j in range(clicks[d - 1]):
                rows.append((eid, datetime(2024, 1, 1 + d, 2, 0, j), eid, "purchase", 1.0, "{}"))
                eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["granger_lag1"](spark, sf).collect()[0]
    # exact functional dependence: SSR_u = 0 -> guarded F emits NULL
    assert abs(r.b_xlag - 1.0) < 1e-6
    assert r.f_stat is None
    assert r.r2_u == 1.0

    # same relation plus a wiggle: finite large F, positive coefficient
    rows2 = list(rows)
    eid2 = len(rows2) * 10
    for d in range(1, 12):
        if d % 3 == 0:
            rows2.append((eid2, datetime(2024, 1, 1 + d, 3, 0, 0), eid2, "purchase", 1.0, "{}"))
            eid2 += 1
    sf2 = _write(spark, tmp_path, "events", rows2, EVENTS)
    r2 = QUERIES["granger_lag1"](spark, sf2).collect()[0]
    assert r2.f_stat is not None and r2.f_stat > 10
    assert r2.b_xlag > 0.5


def test_davies_bouldin_tight_vs_loose(spark, tmp_path):
    """Well-separated tight clusters give a much lower DB index than
    overlapping loose ones."""
    from pliers_spark.queries import QUERIES

    def mk(sep):
        rows = []
        for lbl in (0, 1):
            for i in range(10):
                base = lbl * sep
                v = [base + 0.01 * ((i * 3 + j) % 5) for j in range(8)]
                rows.append((lbl * 100 + i, [float(x) for x in v] + [0.0] * 56, lbl))
        return rows

    sf1 = _write(spark, tmp_path, "embeddings", mk(10.0), EMB)
    tight = QUERIES["davies_bouldin"](spark, sf1).collect()[0].db_index
    sf2 = _write(spark, tmp_path, "embeddings", mk(0.05), EMB)
    loose = QUERIES["davies_bouldin"](spark, sf2).collect()[0].db_index
    assert tight < 0.1 * loose


def test_classical_decompose_recovers_weekly_pattern(spark, tmp_path):
    """Counts = 10 + weekday bump (2 on wd 0): seasonal ~ bump shape,
    trend ~ weekly mean, residual ~ 0."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    for d in range(28):
        wd = d % 7  # 2024-01-01 anchor makes day d have wd = d % 7
        cnt = 10 + (4 if wd == 0 else 0)
        for j in range(cnt):
            rows.append((eid, datetime(2024, 1, 1 + d, 0, 0, j), eid, "c", 1.0, "{}"))
            eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = sorted(QUERIES["classical_decompose"](spark, sf).collect(), key=lambda r: r.day)
    mid = [r for r in out if r.trend is not None]
    assert len(mid) == 22  # 28 days minus 3 on each edge
    for r in mid:
        # trend = weekly mean = (6*10 + 14)/7
        assert abs(r.trend - (6 * 10 + 14) / 7) < 1e-6
        assert abs(r.resid) < 1e-5
    wd0 = [r for r in mid if r.day.weekday() is not None and r.x == 14]
    assert all(abs(r.seasonal - (14 - 74 / 7)) < 1e-5 for r in wd0)

"""Batch 92: isotonic fit, von Neumann ratio, Cronbach's alpha."""

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
        if isinstance(v, (int, float)):
            v = [v]
        for j, x in enumerate(v):
            rows.append((len(rows), datetime(2024, 1, 1 + d, 0, 0, j), d, "c", float(x), "{}"))
    return rows


def test_isotonic_pools_violator(spark, tmp_path):
    """Series 1, 3, 2, 4: the (3,2) violation pools to 2.5; monotone
    ends untouched."""
    from pliers_spark.queries import QUERIES

    sf = _write(spark, tmp_path, "events", _days([1.0, 3.0, 2.0, 4.0]), EVENTS)
    out = sorted(QUERIES["isotonic_fit"](spark, sf).collect(), key=lambda r: r.day)
    assert [r.y for r in out] == [1.0, 3.0, 2.0, 4.0]
    assert [r.iso_fit for r in out] == [1.0, 2.5, 2.5, 4.0]


def test_isotonic_monotone_input_identity(spark, tmp_path):
    from pliers_spark.queries import QUERIES

    sf = _write(spark, tmp_path, "events", _days([1.0, 2.0, 5.0, 9.0]), EVENTS)
    out = sorted(QUERIES["isotonic_fit"](spark, sf).collect(), key=lambda r: r.day)
    assert [r.iso_fit for r in out] == [1.0, 2.0, 5.0, 9.0]


def test_isotonic_decreasing_pools_to_mean(spark, tmp_path):
    from pliers_spark.queries import QUERIES

    sf = _write(spark, tmp_path, "events", _days([4.0, 3.0, 2.0, 1.0]), EVENTS)
    out = sorted(QUERIES["isotonic_fit"](spark, sf).collect(), key=lambda r: r.day)
    assert [r.iso_fit for r in out] == [2.5, 2.5, 2.5, 2.5]


def test_von_neumann_alternating_above_2(spark, tmp_path):
    """Alternating counts give VN near its maximum (> 2); a trending
    series drives it below 2."""
    from pliers_spark.queries import QUERIES

    alt = []
    for d in range(12):
        cnt = 1 if d % 2 == 0 else 3
        alt.append([1.0] * cnt)
    sf = _write(spark, tmp_path, "events", _days(alt), EVENTS)
    r = QUERIES["von_neumann_ratio"](spark, sf).collect()[0]
    assert r.vn_ratio > 2 and r.z > 0

    trend = [[1.0] * (d + 1) for d in range(12)]
    sf2 = _write(spark, tmp_path, "events", _days(trend), EVENTS)
    r2 = QUERIES["von_neumann_ratio"](spark, sf2).collect()[0]
    assert r2.vn_ratio < 2 and r2.z < 0


def test_cronbach_alpha_parallel_items(spark, tmp_path):
    """Items = identical copies of the same signal: alpha = 1.
    Independent-ish alternating items: alpha far below 1."""
    from pliers_spark.queries import QUERIES

    rows = []
    for i in range(12):
        s = float(i)
        rows.append((i, [s, s, s, s] + [0.0] * 60, 0))
    sf = _write(spark, tmp_path, "embeddings", rows, EMB)
    r = QUERIES["cronbach_alpha"](spark, sf).collect()[0]
    assert r.k == 4 and abs(r.alpha - 1.0) < 1e-4

    rows2 = []
    for i in range(12):
        v = [float((i * 7 + j * 3) % 5) for j in range(4)]
        rows2.append((i, v + [0.0] * 60, 0))
    sf2 = _write(spark, tmp_path, "embeddings", rows2, EMB)
    r2 = QUERIES["cronbach_alpha"](spark, sf2).collect()[0]
    assert r2.alpha < 0.9

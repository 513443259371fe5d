"""Batch 107: Gumbel maxima, record highs, turning points."""

import math
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


def _days(vals):
    rows = []
    for d, v in enumerate(vals):
        if isinstance(v, (int, float)):
            v = [v]
        for j, x in enumerate(v):
            rows.append((len(rows), datetime(2024, 1, 1 + d, 0, 0, j), d, "c", float(x), "{}"))
    return rows


def test_gumbel_return_levels_ordered(spark, tmp_path):
    """Return levels grow with T and sit above the mean of maxima."""
    from pliers_spark.queries import QUERIES

    vals = [[10.0 + (d * 7) % 13, 5.0] for d in range(20)]
    sf = _write(spark, tmp_path, "events", _days(vals), EVENTS)
    r = QUERIES["gumbel_maxima"](spark, sf).collect()[0]
    assert r.n_days == 20
    assert r.return_level_365 > r.return_level_30 > r.mu
    # mu close to mean minus gamma*beta: sanity via reconstruction
    maxima = [10.0 + (d * 7) % 13 for d in range(20)]
    mean = sum(maxima) / 20
    assert abs(r.mu + 0.5772156649015329 * r.beta - mean) < 0.01


def test_record_highs_trend_inflates(spark, tmp_path):
    """Strictly increasing counts: every day is a record, z >> 0."""
    from pliers_spark.queries import QUERIES

    vals = [[1.0] * (d + 1) for d in range(12)]
    sf = _write(spark, tmp_path, "events", _days(vals), EVENTS)
    r = QUERIES["record_highs"](spark, sf).collect()[0]
    assert r.n == 12 and r.n_records == 12
    h12 = sum(1 / k for k in range(1, 13))
    assert abs(r.expected_records - h12) < 0.01
    assert r.z > 3


def test_turning_points_alternating(spark, tmp_path):
    """Alternating series: every interior day is a turn, z > 0;
    monotone series: zero turns, z < 0."""
    from pliers_spark.queries import QUERIES

    alt = [[1.0] * (2 if d % 2 == 0 else 5) for d in range(14)]
    sf = _write(spark, tmp_path, "events", _days(alt), EVENTS)
    r = QUERIES["turning_points"](spark, sf).collect()[0]
    assert r.n == 14 and r.n_turns == 12
    assert r.z > 2

    mono = [[1.0] * (d + 1) for d in range(14)]
    sf2 = _write(spark, tmp_path, "events", _days(mono), EVENTS)
    r2 = QUERIES["turning_points"](spark, sf2).collect()[0]
    assert r2.n_turns == 0 and r2.z < -2

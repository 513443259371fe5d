"""Batch 81: Page-Hinkley drift, periodogram peak, Grubbs outlier."""

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


def _day_events(day_values, per_day=1):
    rows = []
    eid = 0
    for day, vals in enumerate(day_values):
        for j, v in enumerate(vals):
            rows.append((eid, datetime(2024, 1, 1 + day, 0, 0, j), eid, "c", float(v), "{}"))
            eid += 1
    return rows


def test_page_hinkley_alarms_on_level_shift(spark, tmp_path):
    """10 days at 1.0 then 5 days at 3.0: PH stays ~0 through the flat
    stretch, alarms after the shift."""
    from pliers_spark.queries import QUERIES

    rows = _day_events([[1.0]] * 10 + [[3.0]] * 5)
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = sorted(QUERIES["page_hinkley"](spark, sf).collect(), key=lambda r: r.day)
    assert all(r.alarm == 0 for r in out[:10])
    assert out[-1].alarm == 1
    assert out[-1].ph_fp > out[10].ph_fp >= 0


def test_page_hinkley_flat_series_silent(spark, tmp_path):
    from pliers_spark.queries import QUERIES

    rows = _day_events([[2.0]] * 8)
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = QUERIES["page_hinkley"](spark, sf).collect()
    assert all(r.alarm == 0 for r in out)


def test_periodogram_detects_period_4(spark, tmp_path):
    """Counts cycling 5,3,1,3 (a sampled cosine of period 4, no
    subharmonic energy) over 16 days: unique peak at period 4."""
    from pliers_spark.queries import QUERIES

    day_values = []
    for d in range(16):
        cnt = [5, 3, 1, 3][d % 4]
        day_values.append([1.0] * cnt)
    rows = _day_events(day_values)
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = {r.period: r for r in QUERIES["periodogram_peak"](spark, sf).collect()}
    assert set(out) == set(range(2, 15))
    peaks = [p for p, r in out.items() if r.is_peak == 1]
    assert peaks == [4]


def test_grubbs_flags_the_spike_day(spark, tmp_path):
    """Daily means 10,10,10,10,50: suspect day is the spike; G matches
    the hand formula."""
    from pliers_spark.queries import QUERIES

    rows = _day_events([[10.0], [10.0], [10.0], [10.0], [50.0]])
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["grubbs_outlier"](spark, sf).collect()[0]
    assert r.suspect_day == datetime(2024, 1, 5)
    xs = [10, 10, 10, 10, 50]
    n = 5
    mean = sum(xs) / n
    s = math.sqrt(sum((x - mean) ** 2 for x in xs) / (n - 1))
    assert abs(r.g - round((50 - mean) / s, 6)) < 1e-6

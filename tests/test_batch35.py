"""Batch 35: MDE power analysis, CUPED variance reduction, SPRT replay."""

import math
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


def test_mde_closed_form(spark, tmp_path):
    """MDE matches the textbook (z_a+z_b)·σ·sqrt(2/n) on planted data."""
    from pliers_spark.queries import QUERIES

    # exactly half the values are 10 -> sigma = 5; user parity -> 20/arm
    rows = [(i, datetime(2024, 1, 1, 0, i % 60), i % 2, "t",
             10.0 if i < 20 else 0.0, "") for i in range(40)]
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["mde_power"](spark, sf).collect()[0]
    assert r.n_a == r.n_b == 20
    assert r.sigma == 5.0
    want = round((1.959964 + 0.841621) * 5.0 * math.sqrt(2 / 20), 6)
    assert r.mde_abs == want
    assert r.mde_rel == round(want / 5.0, 6)  # mean = 5


def test_cuped_perfectly_correlated_covariate(spark, tmp_path):
    """Y = X per user (pre mean equals post mean) -> theta = 1 and the
    variance reduction is rho^2 = 1."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    for u in range(20):
        val = float(u + 1)
        for i in range(4):   # 2 pre, 2 post around the global median
            ts = datetime(2024, 1, 1) + timedelta(hours=i * 24 + u)
            rows.append((eid, ts, u, "t", val, "")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["cuped_adjustment"](spark, sf).collect()[0]
    assert r.n == 20
    assert r.theta == 1.0 and r.var_reduction == 1.0


def test_sprt_crosses_up_on_biased_stream(spark, tmp_path):
    """A stream where ~all values sit at/above the median (ties count as
    successes) must cross the upper bound; first_cross matches the
    closed-form ceil(bound/step)."""
    from pliers_spark.queries import QUERIES

    # 100 events: values strictly increasing -> median at rank 50; the
    # indicator v >= med is true for ranks >= 50, i.e. the SECOND half
    # of the time-ordered stream (ts order == value order here), so the
    # cumsum first drifts down then climbs. Instead make ts order the
    # REVERSE of value order so successes come first.
    rows = [(i, datetime(2024, 1, 1) + timedelta(minutes=i), 1, "t",
             1000.0 - i, "") for i in range(100)]
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["sprt_crossing"](spark, sf).collect()[0]
    assert r.n == 100
    assert r.decision == "h1"
    assert r.first_cross == math.ceil(2_944_439 / 182_322)  # 17 straight wins


def test_sprt_no_crossing_on_tiny_stream(spark, tmp_path):
    """Too few events to reach either bound -> decision 'none'."""
    from pliers_spark.queries import QUERIES

    rows = [(i, datetime(2024, 1, 1) + timedelta(minutes=i), 1, "t",
             float(i), "") for i in range(10)]
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["sprt_crossing"](spark, sf).collect()[0]
    assert r.decision == "none" and r.first_cross == 0 and r.n == 10

"""Batch 51: Hurst exponent, Shapley channel attribution."""

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


def test_hurst_periodic_series_low_h(spark, tmp_path):
    """A strictly alternating daily series has NO long memory: R/S
    barely grows with scale, so H lands well below the 0.5 random-walk
    line (anti-persistent)."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    base = datetime(2024, 1, 1)
    for day in range(32):
        n = 2 if day % 2 == 0 else 6  # alternating counts
        for _ in range(n):
            rows.append((eid, base + timedelta(days=day), 1, "t", 1.0, "")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["hurst_exponent"](spark, sf).collect()[0]
    assert r.n_days == 32 and r.n_scales == 3
    assert r.hurst_h is not None and r.hurst_h < 0.3


def test_hurst_trending_series_high_h(spark, tmp_path):
    """A monotone trend accumulates deviations: R/S grows ~linearly with
    scale -> H near 1 (persistent)."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    base = datetime(2024, 1, 1)
    for day in range(32):
        for _ in range(day + 1):  # steadily growing counts
            rows.append((eid, base + timedelta(days=day), 1, "t", 1.0, "")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["hurst_exponent"](spark, sf).collect()[0]
    assert r.hurst_h is not None and r.hurst_h > 0.8


def test_shapley_single_driver_channel(spark, tmp_path):
    """Conversion happens iff 'click' is in the path: click carries all
    the credit; a channel present in every path but adding nothing
    (view) gets ~0; Shapley values are exact per the hand formula."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    t0 = datetime(2024, 1, 1)
    # 10 users: view only, never convert
    for u in range(10):
        rows.append((eid, t0, u, "view", 1.0, "")); eid += 1
    # 10 users: view + click then purchase
    for u in range(100, 110):
        rows.append((eid, t0, u, "view", 1.0, "")); eid += 1
        rows.append((eid, t0 + timedelta(minutes=1), u, "click", 1.0, "")); eid += 1
        rows.append((eid, t0 + timedelta(minutes=2), u, "purchase", 1.0, "")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = {r.channel: r.shapley_value for r in QUERIES["shapley_attribution"](spark, sf).collect()}
    # k=2 channels; coalitions: {view} v=0, {view,click} v=1
    # click: w(2)*(v({v,c}) - v({v})) = 1/2 * 1 = 0.5
    # view:  w(1)*(v({v}) - v({})) + w(2)*(v({v,c}) - v({c}=unobserved->0))
    #      = 1/2*0 + 1/2*1 = 0.5
    assert out["click"] == 0.5
    assert out["view"] == 0.5
    assert set(out) == {"click", "view"}

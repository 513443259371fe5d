"""Batch 49: peak concurrency, interarrival burstiness, Pareto 80/20."""

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
ORDERS = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def test_peak_concurrency_hand_case(spark, tmp_path):
    """Three events within one 5-min span overlap (peak 3); a fourth
    starting exactly when the first ends does NOT raise the peak
    (half-open intervals)."""
    from pliers_spark.queries import QUERIES

    t0 = datetime(2024, 1, 1)
    rows = [
        (0, t0, 1, "t", 1.0, ""),
        (1, t0 + timedelta(minutes=1), 1, "t", 1.0, ""),
        (2, t0 + timedelta(minutes=2), 1, "t", 1.0, ""),
        (3, t0 + timedelta(minutes=5), 1, "t", 1.0, ""),  # starts as #0 ends
    ]
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["peak_concurrency"](spark, sf).collect()[0]
    assert r.n_intervals == 4 and r.peak_concurrency == 3
    # peak first reached when the third event starts
    assert r.peak_at_us == int((t0 + timedelta(minutes=2)).timestamp() * 1e6)


def test_burstiness_extremes(spark, tmp_path):
    """Perfectly periodic gaps -> B = -1 (sigma 0); one huge gap among
    tiny ones -> B > 0."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    t0 = datetime(2024, 1, 1)
    for i in range(10):  # user 1: exact 60s metronome
        rows.append((eid, t0 + timedelta(minutes=i), 1, "t", 1.0, "")); eid += 1
    # user 2: 9 one-second gaps then a 10-hour gap
    t = t0
    for i in range(10):
        rows.append((eid, t, 2, "t", 1.0, "")); eid += 1
        t += timedelta(seconds=1)
    rows.append((eid, t + timedelta(hours=10), 2, "t", 1.0, "")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = {r.user_id: r for r in QUERIES["interarrival_burstiness"](spark, sf).collect()}
    assert out[1].burstiness_b == -1.0 and out[1].mean_gap_us == 60_000_000
    assert out[2].burstiness_b > 0.4


def test_pareto_concentrated_revenue(spark, tmp_path):
    """One whale of 10 customers holds 91% of revenue: top-20% (2 custs)
    share > 0.9; a single customer already crosses 80%."""
    from pliers_spark.queries import QUERIES

    rows = [(0, 0, "O", 9100.0, datetime(2024, 1, 1), "x")]
    rows += [(i, i, "O", 100.0, datetime(2024, 1, 1), "x") for i in range(1, 10)]
    sf = _write(spark, tmp_path, "orders", rows, ORDERS)
    r = QUERIES["pareto_8020"](spark, sf).collect()[0]
    assert r.n_customers == 10
    assert r.top20_revenue_share == 0.92  # whale + one 100er = 9200/10000
    assert r.customers_for_80pct == 1

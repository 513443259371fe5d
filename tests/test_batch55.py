"""Batch 55: Haar energy, FD binning, PACF(2)."""

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
ORDERS = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def test_haar_alternating_energy_in_level1(spark, tmp_path):
    """Day-to-day alternation (2,6,2,6,...) is pure level-1 detail:
    every level-1 coefficient = -4, higher levels = 0."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    base = datetime(2024, 1, 1)
    for day in range(16):
        for _ in range(2 if day % 2 == 0 else 6):
            rows.append((eid, base + timedelta(days=day), 1, "t", 1.0, "")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = {r.level: r for r in QUERIES["haar_energy"](spark, sf).collect()}
    assert out[1].n_coeffs == 8 and out[1].energy == 8 * 16  # (2-6)^2 per pair
    assert out[2].energy == 0 and out[3].energy == 0


def test_haar_period8_energy_in_level3(spark, tmp_path):
    """A period-8 square wave (4 low, 4 high, repeating) is pure level-3
    detail: adjacent 4-day sums differ by 32 -> energy 2*32^2; levels
    1-2 cancel within constant half-periods."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    base = datetime(2024, 1, 1)
    for day in range(16):
        low = (day % 8) < 4
        for _ in range(2 if low else 10):
            rows.append((eid, base + timedelta(days=day), 1, "t", 1.0, "")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = {r.level: r for r in QUERIES["haar_energy"](spark, sf).collect()}
    assert out[1].energy == 0 and out[2].energy == 0
    assert out[3].n_coeffs == 2 and out[3].energy == 2 * 32 ** 2


def test_fd_binning_hand_case(spark, tmp_path):
    """Uniform cents 1..64: q1 at rank 16 -> 16, q3 at rank 48 -> 48,
    IQR = 32, width = 64/4 = 16, bins = ceil(63/16) = 4."""
    from pliers_spark.queries import QUERIES

    rows = [(i, i, "O", i / 100.0, datetime(2024, 1, 1), "x") for i in range(1, 65)]
    sf = _write(spark, tmp_path, "orders", rows, ORDERS)
    r = QUERIES["fd_binning"](spark, sf).collect()[0]
    assert r.n == 64 and r.iqr_fp == 32
    assert r.width_fp == round(2 * 32 / 64 ** (1 / 3), 4)
    assert r.n_bins == math.ceil(63 / (2 * 32 / 64 ** (1 / 3)))


def test_pacf2_ar1_like(spark, tmp_path):
    """A smooth AR(1)-ish ramp has rho2 ~ rho1^2 -> pacf2 near 0."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    base = datetime(2024, 1, 1)
    # long sinusoid-ish slow series: counts follow a smooth slow cycle
    pattern = [5, 6, 7, 8, 9, 10, 9, 8, 7, 6] * 3
    for day, n in enumerate(pattern):
        for _ in range(n):
            rows.append((eid, base + timedelta(days=day), 1, "t", 1.0, "")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["pacf_lag2"](spark, sf).collect()[0]
    assert r.rho1 is not None and r.rho1 > 0.5
    assert r.pacf2 is not None and abs(r.pacf2) < 0.9

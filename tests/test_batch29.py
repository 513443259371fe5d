"""Batch 29: Mann-Kendall + Sen slope, Kruskal-Wallis, CMH odds ratio."""

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
ORDERS = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def test_mann_kendall_monotone_series(spark, tmp_path):
    """Strictly increasing series: S = n(n-1)/2, tau = 1, Sen slope =
    the exact per-second rate. Strictly decreasing: tau = -1."""
    from pliers_spark.queries import QUERIES

    rows = []
    # user 1: +2.0 per minute over 10 points -> slope 2/60 per second
    for i in range(10):
        rows.append((i, datetime(2024, 1, 1, 0, i), 1, "t", 2.0 * i, ""))
    # user 2: strictly decreasing
    for i in range(10):
        rows.append((100 + i, datetime(2024, 1, 1, 0, i), 2, "t", -1.0 * i, ""))
    # user 3: below min_n -> excluded
    for i in range(3):
        rows.append((200 + i, datetime(2024, 1, 1, 0, i), 3, "t", 1.0 * i, ""))
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = {r.user_id: r for r in QUERIES["mann_kendall_sen"](spark, sf).collect()}
    assert set(out) == {1, 2}
    assert out[1].mk_s == 45 and out[1].tau == 1.0
    assert out[1].sen_slope_fp == round(1e6 * 2.0 / 60)
    assert out[2].mk_s == -45 and out[2].tau == -1.0


def test_kruskal_wallis_identical_vs_shifted(spark, tmp_path):
    """Two groups drawn from the same values -> H = 0; well-separated
    groups -> H near its max n-1 regime (> chi2 threshold)."""
    from pliers_spark.queries import QUERIES

    same = [(i, datetime(2024, 1, 1), 1, "A" if i % 2 else "B", float(i // 2), "")
            for i in range(40)]
    sf = _write(spark, tmp_path, "events", same, EVENTS)
    r = QUERIES["kruskal_wallis"](spark, sf).collect()[0]
    assert r.k == 2 and r.n == 40
    # every value appears once in each group -> identical rank sums
    assert abs(r.h_tie_corrected) < 1e-6

    apart = [(i, datetime(2024, 1, 1), 1, "A", float(i), "") for i in range(20)] + [
        (100 + i, datetime(2024, 1, 1), 1, "B", 1000.0 + i, "") for i in range(20)
    ]
    sf2 = _write(spark, tmp_path / "b", "events", apart, EVENTS)
    r2 = QUERIES["kruskal_wallis"](spark, sf2).collect()[0]
    assert r2.h > 25  # >> chi2_0.001(df=1)


def test_cmh_unconfounds_simpson(spark, tmp_path):
    """Treatment has NO within-stratum effect, but treated units pile
    into the high-failure stratum: crude OR >> 1, CMH OR = 1."""
    from pliers_spark.queries import QUERIES

    rows = []
    k = 0

    def add(n, month, urgent, fail):
        nonlocal k
        for _ in range(n):
            rows.append(
                (k, k, "F" if fail else "O", 10.0, datetime(2024, month, 5),
                 "1-URGENT" if urgent else "3-MEDIUM")
            )
            k += 1

    # stratum Jan: failure rate 80% for BOTH arms; mostly treated
    add(32, 1, True, True); add(8, 1, True, False)
    add(8, 1, False, True); add(2, 1, False, False)
    # stratum Jun: failure rate 20% for BOTH arms; mostly control
    add(2, 6, True, True); add(8, 6, True, False)
    add(8, 6, False, True); add(32, 6, False, False)
    sf = _write(spark, tmp_path, "orders", rows, ORDERS)
    r = QUERIES["cmh_odds"](spark, sf).collect()[0]
    assert r.n_strata == 2
    assert r.or_cmh == 1.0 and r.log_or_cmh == 0.0
    assert r.or_pooled > 2.0  # the confounded crude estimate

"""Batch 34: mergeable KMV rollup, diff-in-diff, Markov held-out eval."""

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


def test_kmv_rollup_exact_when_days_small(spark, tmp_path):
    """Every day has < k distinct users -> daily sketches are exact sets
    -> the merged weekly estimate equals the exact weekly distinct."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    base = datetime(2024, 1, 1)  # a Monday
    for day in range(7):
        for u in range(10):       # 10 users/day << k=32, overlapping sets
            rows.append((eid, base + timedelta(days=day, hours=u), day * 3 + u,
                         "t", 1.0, "")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = QUERIES["kmv_rollup"](spark, sf).collect()
    for r in out:
        assert r.est_users == float(r.exact_users)
        assert r.rel_err == 0.0
    assert sum(r.n_days for r in out) == 7


def test_kmv_rollup_estimates_on_corpus(spark):
    """sf0.01 events: merged weekly estimates stay within 60% (k=32 has
    ~18% sd; deterministic seed, loose bound) and weeks partition days."""
    from pliers_spark.queries import QUERIES

    out = QUERIES["kmv_rollup"](spark, "/root/testdata/sf0.01").collect()
    assert out
    for r in out:
        if r.exact_users > 32:
            assert abs(r.rel_err) < 0.6, r


def test_diff_in_diff_planted_effect(spark, tmp_path):
    """Control flat at 10; treated at 10 pre and 17 post -> DiD = 7."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    for i in range(40):
        post = i >= 20
        ts = datetime(2024, 1, 1) + timedelta(hours=i)
        rows.append((eid, ts, 2, "t", 17.0 if post else 10.0, "")); eid += 1  # treat
        rows.append((eid, ts, 3, "t", 10.0, "")); eid += 1                     # control
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["diff_in_diff"](spark, sf).collect()[0]
    assert r.n11 + r.n10 == 40 and r.n01 + r.n00 == 40
    assert r.did == 7.0


def test_markov_beats_majority_on_deterministic_chain(spark, tmp_path):
    """A deterministic A->B->C->A cycle: the Markov model is perfect on
    held-out transitions, the majority baseline is ~1/3."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    cyc = ["A", "B", "C"]
    for u in range(5):
        for i in range(30):
            rows.append((eid, datetime(2024, 1, 1) + timedelta(minutes=i), u,
                         cyc[i % 3], 1.0, "")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["markov_accuracy"](spark, sf).collect()[0]
    assert r.acc_markov == 1.0
    assert r.acc_majority < 0.5
    assert r.n_train + r.n_test == 5 * 29

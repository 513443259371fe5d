"""Windowed temporal operators: correctness + the zero-leakage gate."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from pliers_spark.operators import temporal as TP


@pytest.fixture(scope="module")
def ev(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    # u1: three bursts separated by > 1h gaps
    for offset_min, v in [(0, 1.0), (5, 2.0), (10, None), (200, 4.0), (205, 5.0), (500, 6.0)]:
        rows.append(("u1", base + dt.timedelta(minutes=offset_min), v))
    rows.append(("u2", base, 9.0))
    return spark.createDataFrame(rows, "uid string, ts timestamp, v double")


def test_lag_lead(ev):
    out = TP.lag_features(ev, ["uid"], "ts", "v", [1])
    out = TP.lead_features(out, ["uid"], "ts", "v", [1])
    r = {(x.uid, x.ts.minute + 60 * x.ts.hour): x for x in out.collect()}
    assert r[("u1", 5)].v_lag1 == 1.0
    assert r[("u1", 0)].v_lag1 is None
    assert r[("u1", 5)].v_lead1 is None  # next value is NULL
    assert r[("u2", 0)].v_lag1 is None


def test_ffill_and_bfill(ev):
    out = TP.ffill(ev, ["uid"], "ts", "v")
    r = sorted(out.where("uid='u1'").collect(), key=lambda x: x.ts)
    assert [x.v_ffill for x in r] == [1.0, 2.0, 2.0, 4.0, 5.0, 6.0]
    out2 = TP.bfill(ev, ["uid"], "ts", "v")
    r2 = sorted(out2.where("uid='u1'").collect(), key=lambda x: x.ts)
    assert [x.v_bfill for x in r2] == [1.0, 2.0, 4.0, 4.0, 5.0, 6.0]


def test_sessionize_gaps(ev):
    out = TP.sessionize(ev, ["uid"], "ts", gap_seconds=3600)
    r = sorted(out.where("uid='u1'").collect(), key=lambda x: x.ts)
    assert [x.session_id for x in r] == [1, 1, 1, 2, 2, 3]
    bounds = TP.session_bounds(ev, ["uid"], "ts", gap_seconds=3600)
    b = {(x.uid, x.session_id): x.n_events for x in bounds.collect()}
    assert b[("u1", 1)] == 3 and b[("u1", 2)] == 2 and b[("u1", 3)] == 1
    assert b[("u2", 1)] == 1


def test_rolling_agg_trailing_range(ev):
    out = TP.rolling_agg(ev, ["uid"], "ts", "v", 600.0, aggs={"s": "sum", "c": "count"})
    r = sorted(out.where("uid='u1'").collect(), key=lambda x: x.ts)
    # at minute 10 (v=None): window covers minutes 0,5,10 → sum 3.0, count 2
    assert r[2].s == 3.0 and r[2].c == 2
    # at minute 205: window covers 200,205 → 9.0
    assert r[4].s == 9.0 and r[4].c == 2


def test_running_count_and_object_id(spark):
    df = spark.createDataFrame(
        [("d", 0, "x"), ("d", 1, "y"), ("d", 2, "x"), ("d", 3, "x")],
        "doc string, pos long, tok string",
    )
    rc = TP.running_count(df, ["doc"], "tok", "pos", out_col="c")
    assert [r.c for r in rc.orderBy("pos").collect()] == [1, 1, 2, 3]
    oid = TP.with_object_id(df, ["doc", "tok"], "pos")
    got = {(r.tok, r.pos): r.object_id for r in oid.collect()}
    assert got[("x", 0)] == 0 and got[("x", 2)] == 1 and got[("x", 3)] == 2


def test_top_n_by_change(ev):
    out = TP.top_n_by_change(ev.na.drop(), ["uid"], "ts", "v", 1)
    r = out.where("uid='u1'").collect()
    assert len(r) == 1
    # largest |Δ| among consecutive non-null: |4-2|=2 at minute 200... but
    # na.drop removes the NULL row first, so diffs are 1,2,1,1 → minute 200
    assert r[0].ts == dt.datetime(2024, 1, 1, 3, 20)


def test_resample_grid_step(ev):
    grid = TP.resample_grid(ev, ["uid"], "ts", 3600)
    g1 = [r.ts for r in grid.where("uid='u1'").orderBy("ts").collect()]
    assert g1[0] == dt.datetime(2024, 1, 1, 0, 0)
    assert g1[1] == dt.datetime(2024, 1, 1, 1, 0)
    assert g1[-1] <= dt.datetime(2024, 1, 1, 8, 20)


def test_zero_temporal_leakage(spark, pages):
    """North-rule leakage gate: recompute windowed features with all rows
    after a cutoff deleted — features at (url, ts <= cutoff) must be
    identical (no frame reads the future)."""
    feats = lambda df: TP.lag_features(
        TP.ffill(
            TP.sessionize(df, ["url"], "warc_ts", gap_seconds=30 * 86400),
            ["url"], "warc_ts", "text_len",
        ),
        ["url"], "warc_ts", "text_len", [1],
    )
    base = pages.select("url", "warc_ts", F.length("text").alias("text_len"))
    us = F.unix_micros(F.col("warc_ts").cast("timestamp_ltz"))
    cutoff = base.select(F.expr(
        "percentile_approx(unix_micros(cast(warc_ts as timestamp_ltz)), 0.5)"
    )).first()[0]
    full = feats(base).where(us <= cutoff)
    truncated = feats(base.where(us <= cutoff))
    a = sorted(map(tuple, full.collect()))
    b = sorted(map(tuple, truncated.collect()))
    assert a == b and len(a) > 0


def test_sample_every_nth(ev):
    out = TP.sample_every_nth(ev, ["uid"], "ts", 2)
    kept = sorted((r.uid, r.ts.minute + 60 * r.ts.hour) for r in out.collect())
    # u1 rows at offsets 0,5,10,200,205,500 -> indices 0,2,4 kept
    assert kept == [("u1", 0), ("u1", 10), ("u1", 205), ("u2", 0)]


def test_sample_per_period(ev):
    out = TP.sample_per_period(ev, ["uid"], "ts", "hour")
    kept = sorted((r.uid, r.ts.minute + 60 * r.ts.hour) for r in out.collect())
    # u1 hours: 0 (first=0min), 3 (first=200min), 8 (500min); u2 hour 0
    assert kept == [("u1", 0), ("u1", 200), ("u1", 500), ("u2", 0)]


def test_temporal_trim_rebase(ev):
    import datetime as dt

    start = dt.datetime(2024, 1, 1, 1, 0)
    end = dt.datetime(2024, 1, 1, 8, 0)
    out = TP.temporal_trim(ev, "ts", start, end, rebase=True)
    rows = {r.ts.minute + 60 * r.ts.hour: r.rel_s for r in out.collect()}
    # only u1's 200/205-minute rows fall in [60min, 480min)
    assert sorted(rows) == [200, 205]
    assert rows[200] == (200 - 60) * 60.0


def test_lag1_timesplit_equals_plain_lag(spark):
    """Time-bucket-split lag-1 == plain window lag, including null
    values mid-stream and entities spanning many/missing buckets."""
    import datetime as dt

    from pliers_spark.operators.skew import lag1_timesplit
    from pliers_spark.operators.temporal import lag_features

    base = dt.datetime(2024, 1, 1)
    rows = []
    for uid in ["hot", "cold"]:
        n = 500 if uid == "hot" else 7
        for k in range(n):
            # irregular spacing → buckets with many rows, one row, none
            ts = base + dt.timedelta(minutes=17 * k + (k % 5) * 123)
            v = None if k % 11 == 3 else float(k)
            rows.append((uid, ts, v))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")

    want = {
        (r.user_id, r.ts): r.value_lag1
        for r in lag_features(df, ["user_id"], "ts", "value", [1]).collect()
    }
    got = {
        (r.user_id, r.ts): r.value_lag1
        for r in lag1_timesplit(df, ["user_id"], "ts", "value", bucket_seconds=3600).collect()
    }
    assert got == want and len(got) == 507


def test_sessionize_timesplit_equals_plain(spark):
    import datetime as dt

    from pliers_spark.operators.skew import sessionize_timesplit
    from pliers_spark.operators.temporal import sessionize

    base = dt.datetime(2024, 1, 1)
    rows = []
    for uid in ["hot", "cold"]:
        t = base
        n = 400 if uid == "hot" else 9
        for k in range(n):
            # gaps straddling bucket boundaries and the session threshold
            t += dt.timedelta(minutes=25 if k % 7 else 60 * 9)
            rows.append((uid, t))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")

    want = {
        (r.user_id, r.ts): r.session_id
        for r in sessionize(df, ["user_id"], "ts", gap_seconds=4 * 3600).collect()
    }
    got = {
        (r.user_id, r.ts): r.session_id
        for r in sessionize_timesplit(
            df, ["user_id"], "ts", gap_seconds=4 * 3600, bucket_seconds=3600
        ).collect()
    }
    assert got == want and len(got) == 409


def test_ffill_timesplit_equals_plain(spark):
    """Includes all-null buckets (carry must ffill across them)."""
    import datetime as dt

    from pliers_spark.operators.skew import ffill_timesplit
    from pliers_spark.operators.temporal import ffill

    base = dt.datetime(2024, 1, 1)
    rows = []
    for uid in ["hot", "cold"]:
        n = 300 if uid == "hot" else 8
        for k in range(n):
            ts = base + dt.timedelta(minutes=13 * k)
            v = float(k) if k % 9 == 0 else None  # long null runs spanning buckets
            rows.append((uid, ts, v))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")

    want = {
        (r.user_id, r.ts): r.value_ffill
        for r in ffill(df, ["user_id"], "ts", "value").collect()
    }
    got = {
        (r.user_id, r.ts): r.value_ffill
        for r in ffill_timesplit(df, ["user_id"], "ts", "value", bucket_seconds=3600).collect()
    }
    assert got == want and len(got) == 308


def test_rolling_timesplit_equals_plain(spark):
    import datetime as dt

    from pliers_spark.operators.skew import rolling_timesplit
    from pliers_spark.operators.temporal import rolling_agg

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("hot", base + dt.timedelta(minutes=7 * k), float(k % 13)) for k in range(400)
    ] + [("cold", base + dt.timedelta(hours=3 * k), 1.0) for k in range(6)]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")

    want = {
        (r.user_id, r.ts): (round(r.rs, 6), r.rc)
        for r in rolling_agg(df, ["user_id"], "ts", "value", 3600.0,
                             aggs={"rs": "sum", "rc": "count"}).collect()
    }
    got = {
        (r.user_id, r.ts): (round(r.rs, 6), r.rc)
        for r in rolling_timesplit(df, ["user_id"], "ts", "value", 3600.0, 7200,
                                   aggs={"rs": "sum", "rc": "count"}).collect()
    }
    assert got == want and len(got) == 406

    import pytest

    with pytest.raises(ValueError):
        rolling_timesplit(df, ["user_id"], "ts", "value", 7201.0, 7200)


def test_timesplit_subsecond_timestamps(spark):
    """Sub-second data: the split ops must agree with their plain twins at
    µs precision (regression: unix_timestamp truncation made rolling
    frames read same-second FUTURE rows and mis-split sub-second gaps)."""
    import datetime as dt

    from pliers_spark.operators.skew import (
        ffill_timesplit,
        lag1_timesplit,
        rolling_timesplit,
        sessionize_timesplit,
    )
    from pliers_spark.operators.temporal import ffill, lag_features, rolling_agg, sessionize

    base = dt.datetime(2024, 1, 1)
    rows = []
    for uid in ["hot", "cold"]:
        n = 120 if uid == "hot" else 9
        t = base
        for k in range(n):
            # 0.25s steps with occasional 2.5s gaps — everything sub-bucket
            t += dt.timedelta(milliseconds=250 if k % 8 else 2500)
            v = None if k % 11 == 4 else float(k)
            rows.append((uid, t, v))
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")

    want = {
        (r.user_id, r.ts): (round(r.rs, 6) if r.rs is not None else None, r.rc)
        for r in rolling_agg(df, ["user_id"], "ts", "value", 1.0,
                             aggs={"rs": "sum", "rc": "count"}).collect()
    }
    got = {
        (r.user_id, r.ts): (round(r.rs, 6) if r.rs is not None else None, r.rc)
        for r in rolling_timesplit(df, ["user_id"], "ts", "value", 1.0, 5,
                                   aggs={"rs": "sum", "rc": "count"}).collect()
    }
    assert got == want

    want = {
        (r.user_id, r.ts): r.session_id
        for r in sessionize(df, ["user_id"], "ts", gap_seconds=0.6).collect()
    }
    got = {
        (r.user_id, r.ts): r.session_id
        for r in sessionize_timesplit(
            df, ["user_id"], "ts", gap_seconds=0.6, bucket_seconds=5
        ).collect()
    }
    assert got == want

    want = {
        (r.user_id, r.ts): r.value_lag1
        for r in lag_features(df, ["user_id"], "ts", "value", [1]).collect()
    }
    got = {
        (r.user_id, r.ts): r.value_lag1
        for r in lag1_timesplit(df, ["user_id"], "ts", "value", bucket_seconds=5).collect()
    }
    assert got == want

    want = {
        (r.user_id, r.ts): r.value_ffill
        for r in ffill(df, ["user_id"], "ts", "value").collect()
    }
    got = {
        (r.user_id, r.ts): r.value_ffill
        for r in ffill_timesplit(df, ["user_id"], "ts", "value", bucket_seconds=5).collect()
    }
    assert got == want

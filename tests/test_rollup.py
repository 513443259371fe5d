"""Multi-resolution rollup (operators/rollup.py): exact partial-merge
semantics and the one-raw-scan plan property."""

import datetime as dt

from pyspark.sql import functions as F

from pliers_spark.operators.rollup import multires_rollup


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _mk(spark):
    rows = [
        # two hours inside one day, plus a row in the next ISO week
        (1, dt.datetime(2024, 3, 1, 10, 15), 1.25),
        (2, dt.datetime(2024, 3, 1, 10, 45), 2.50),
        (3, dt.datetime(2024, 3, 1, 11, 5), -0.75),
        (4, dt.datetime(2024, 3, 2, 0, 0), 4.00),
        (5, dt.datetime(2024, 3, 4, 9, 0), 8.00),  # Monday → new week
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, value double")


def test_levels_merge_exactly_from_finer(spark):
    out = multires_rollup(_mk(spark), cut=False)
    got = {
        (r.resolution, r.bucket_start): (r.n_events, r.sum_value_fp)
        for r in out.collect()
    }
    # hour level straight from raw
    assert got[("hour", dt.datetime(2024, 3, 1, 10))] == (2, 3_750_000)
    assert got[("hour", dt.datetime(2024, 3, 1, 11))] == (1, -750_000)
    # day = merge of its hours
    assert got[("day", dt.datetime(2024, 3, 1))] == (3, 3_000_000)
    assert got[("day", dt.datetime(2024, 3, 2))] == (1, 4_000_000)
    # week (ISO Monday): Mar 1 2024 is a Friday -> week starts Feb 26;
    # Mar 4 is the next Monday
    assert got[("week", dt.datetime(2024, 2, 26))] == (4, 7_000_000)
    assert got[("week", dt.datetime(2024, 3, 4))] == (1, 8_000_000)


def test_coarse_levels_equal_direct_aggregation(spark):
    # differential: day/week built from hour partials == day/week from raw
    ev = _mk(spark)
    out = multires_rollup(ev, cut=False)
    for lv in ("day", "week"):
        direct = (
            ev.select(
                F.date_trunc(lv, "ts").alias("bucket_start"),
                F.round(F.col("value") * 1e6, 0).cast("long").alias("v"),
            )
            .groupBy("bucket_start")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        )
        got = {
            r.bucket_start: (r.n_events, r.sum_value_fp)
            for r in out.where(F.col("resolution") == lv).collect()
        }
        want = {r.bucket_start: (r.n, r.s) for r in direct.collect()}
        assert got == want, lv


def test_dag_cut_removes_raw_rescan(spark, tmp_path):
    # with the cut, the union plan references the checkpointed hour
    # partials — the raw source appears in NO branch of the final plan
    p = str(tmp_path / "ev.parquet")
    _mk(spark).write.mode("overwrite").parquet(p)
    ev = spark.read.parquet(p)
    plan_cut = _plan(multires_rollup(ev, cut=True))
    assert "Scan parquet" not in plan_cut, plan_cut
    # without the cut each tier replays the scan (here: 3 branches)
    plan_raw = _plan(multires_rollup(ev, cut=False))
    assert plan_raw.count("Scan parquet") == 3


def test_incremental_rollup_merge_equals_from_scratch(spark, tmp_path):
    """Snapshot delta folded into an existing hour rollup == rollup of
    the full table (materialized-view maintenance over snapshots)."""
    from pliers_spark.operators.rollup import merge_rollup, multires_rollup
    from pliers_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    batch1 = _mk(spark)
    s1 = t.commit(batch1.select("event_id", "ts", "value"))
    rolled = multires_rollup(t.read(spark, s1), cut=False).where(
        F.col("resolution") == "hour"
    )

    batch2 = spark.createDataFrame(
        [
            (6, dt.datetime(2024, 3, 1, 10, 59), 0.5),   # lands in an EXISTING hour
            (7, dt.datetime(2024, 3, 5, 12, 0), -2.25),  # new hour entirely
        ],
        "event_id long, ts timestamp, value double",
    )
    s2 = t.commit(batch2)

    merged = merge_rollup(rolled, t.read_incremental(spark, from_id=s1, to_id=s2))
    scratch = multires_rollup(t.read(spark, s2), cut=False).where(
        F.col("resolution") == "hour"
    )
    got = {(r.bucket_start): (r.n_events, r.sum_value_fp) for r in merged.collect()}
    want = {(r.bucket_start): (r.n_events, r.sum_value_fp) for r in scratch.collect()}
    assert got == want
    # and the existing-hour bucket really absorbed the delta row
    assert got[dt.datetime(2024, 3, 1, 10)] == (3, 4_250_000)

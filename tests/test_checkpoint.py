"""Resume-from-checkpoint gate (FIXTURES.md §8): kill after K partitions,
restart, identical final output, completed partitions not recomputed."""

import pyspark.sql.functions as F
import pytest

from pliers_spark.functions import text as T
from pliers_spark.plans.checkpoint import CheckpointedRun


def transform(df):
    return df.select(
        "url", "warc_ts", T.text_length("text").alias("text_length"), T.token_count("text").alias("n_tokens")
    )


def bucket_expr(n):
    return F.pmod(F.xxhash64("url"), F.lit(n)).cast("int")


def test_resume_after_simulated_crash(spark, pages, tmp_path):
    n_buckets = 8
    run = CheckpointedRun("textfeat", str(tmp_path / "out"), num_buckets=n_buckets)

    with pytest.raises(RuntimeError, match="simulated failure"):
        run.run(spark, pages, transform, bucket_expr(n_buckets), input_snapshot_id="snap1", fail_after=3)

    assert len(run.completed_keys(spark)) == 3

    # resume: only the remaining 5 buckets execute
    executed = run.run(spark, pages, transform, bucket_expr(n_buckets), input_snapshot_id="snap1")
    assert executed == n_buckets - 3

    # final output identical to a non-checkpointed run
    expected = sorted(map(tuple, transform(pages).collect()))
    got = sorted(map(tuple, run.read_output(spark).select(*transform(pages).columns).collect()))
    assert got == expected

    # lineage + metrics: one manifest row per bucket, counts add up
    m = run.metrics(spark)
    rows = m.collect()
    assert len(rows) == n_buckets
    assert sum(r.row_count for r in rows) == pages.count()
    assert all(r.input_snapshot_id == "snap1" and r.status == "done" for r in rows)

    # idempotence: a third run executes nothing
    assert run.run(spark, pages, transform, bucket_expr(n_buckets)) == 0

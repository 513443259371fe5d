"""Bucketed-sorted layout contract (SURVEY.md §4 item 2): writing pages
bucketed by url and sorted by (url, warc_ts) must (a) let entity-keyed
aggregations and self-joins plan WITHOUT an Exchange, and (b) satisfy
the runtime sortedness validator."""

import pytest
from pyspark.sql import functions as F

from pliers_spark.sources.layout import (
    bucketed_scan_is_shuffle_free,
    check_sorted_contract,
    write_bucketed_table,
)


@pytest.fixture(scope="module")
def bucketed_pages(spark, pages):
    write_bucketed_table(
        pages.select("url", "warc_ts", "lang", F.length("text").alias("text_len")),
        "pages_bucketed",
        bucket_cols=["url"],
        sort_cols=["url", "warc_ts"],
        num_buckets=4,
    )
    yield "pages_bucketed"
    spark.sql("DROP TABLE IF EXISTS pages_bucketed")


def test_groupby_on_bucket_key_has_no_exchange(spark, bucketed_pages):
    assert bucketed_scan_is_shuffle_free(spark, bucketed_pages, ["url"])


def test_bucketed_self_join_has_no_exchange(spark, bucketed_pages):
    a = spark.table(bucketed_pages).groupBy("url").agg(F.max("warc_ts").alias("latest"))
    b = spark.table(bucketed_pages).groupBy("url").agg(F.count("*").alias("n"))
    plan = a.join(b, "url")._jdf.queryExecution().executedPlan().toString()
    # broadcast of the small agg result is fine; what bucketing must
    # eliminate is the shuffle (hashpartitioning) exchange
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Bucketed: true" in plan, plan


def test_windowed_stage_on_bucketed_table_shuffle_free(spark, bucketed_pages):
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy("warc_ts")
    df = spark.table(bucketed_pages).withColumn("prev", F.lag("text_len").over(w))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_sorted_contract_holds_after_bucketed_write(spark, bucketed_pages):
    df = spark.table(bucketed_pages)
    assert check_sorted_contract(df, ["url"], "warc_ts") == 0


def test_sorted_contract_detects_violation(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [("b", t0, 1), ("a", t0, 2), ("a", t0 - dt.timedelta(days=1), 3)]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, x long").coalesce(1)
    assert check_sorted_contract(df, ["url"], "warc_ts") > 0

"""Incremental feature maintenance == full recompute (url-delta units)."""

import pyarrow.parquet as pq
from pyspark.sql import Window
from pyspark.sql import functions as F

from pliers_spark.pages_pipeline import (
    extract_page_features_arrow,
    incremental_page_features,
    windowed_page_features,
)
from pliers_spark.sources.snapshots import SnapshotTable
from pliers_spark.synthgen import generate_pages


def test_incremental_equals_full(spark, tmp_path):
    tbl = generate_pages(n_urls=60, max_snapshots=5, seed=7)
    p = str(tmp_path / "all.parquet")
    pq.write_table(tbl, p)
    df = spark.read.parquet(p)

    urls = sorted(r.url for r in df.select("url").distinct().collect())
    recrawled, new_urls = set(urls[:20]), set(urls[40:])
    # batch 1: the old corpus; re-crawled urls contribute only the
    # earliest half of their snapshots (the rest arrive in batch 2,
    # mutating those urls' lag chains and sessions)
    w = Window.partitionBy("url").orderBy("warc_ts")
    ranked = df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count("*").over(Window.partitionBy("url"))
    )
    is_late_recrawl = F.col("url").isin(recrawled) & (F.col("_rn") > F.col("_n") / 2)
    batch1 = ranked.where(~F.col("url").isin(new_urls) & ~is_late_recrawl).drop("_rn", "_n")
    batch2 = ranked.where(F.col("url").isin(new_urls) | is_late_recrawl).drop("_rn", "_n")
    assert batch1.count() + batch2.count() == df.count()
    assert batch2.count() > 0

    table = SnapshotTable(str(tmp_path / "tbl"))
    s1 = table.commit(batch1)
    prev = windowed_page_features(extract_page_features_arrow(table.read(spark, s1)))
    s2 = table.commit(batch2)

    got = incremental_page_features(spark, table, prev, s1, s2)
    want = windowed_page_features(extract_page_features_arrow(table.read(spark, s2)))

    key = lambda r: (r["url"], r["warc_ts"])
    got_rows = sorted((r.asDict() for r in got.collect()), key=key)
    want_rows = sorted((r.asDict() for r in want.collect()), key=key)
    assert got_rows == want_rows

"""Physical table layout: url-hash-bucketed, (url, warc_ts)-sorted pages.

SURVEY.md §4 custom-physical-work item 2: the as-of join and every
per-entity window stage cluster on the entity key, so the fact table
should be WRITTEN pre-clustered — bucketed by hash(entity) and sorted by
(entity, ts) within buckets. Then:

- joins/aggregations keyed on the entity column read the bucketing
  metadata and skip their Exchange entirely (asserted in
  tests/test_layout.py on the executed plan);
- bucket files arrive time-sorted, so per-bucket ``applyInPandas``
  stages (the cogrouped as-of) get their sort for near-free (a
  partition-local sort of already-sorted runs);
- on a real deployment this is Iceberg's ``bucket(B, url)`` partition
  transform + ``sort_order(url, warc_ts)`` table metadata — the writer
  below is the local-parquet equivalent via the session catalog
  (``bucketBy().sortBy().saveAsTable``), which is what Spark's bucketing
  reader understands without Hive.

The layout is a *contract*: readers assume in-bucket sortedness. Since
external writers can violate it, ``check_sorted_contract`` is a
runtime validator (one cheap distributed pass) to run before trusting a
foreign snapshot — the physical analog of the reference's validation
modes (pliers/transformers/base.py:78-124).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    sort_cols: list[str],
    num_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed + in-bucket-sorted catalog table."""
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, bucket_cols[0], *bucket_cols[1:])
        .sortBy(sort_cols[0], *sort_cols[1:])
        .saveAsTable(table)
    )


def check_sorted_contract(
    df: DataFrame, entity_cols: list[str], ts_col: str
) -> int:
    """Count of rows that violate (entity, ts) sortedness within their
    input partition. 0 ⇒ the layout contract holds. One narrow pass —
    a per-partition vectorized comparison, no shuffle, no collect of
    data (only the tiny violation count aggregates back).
    """
    import pandas as pd

    cols = [*entity_cols, ts_col]

    def _count(it):
        for pdf in it:
            if len(pdf) < 2:
                yield pd.DataFrame({"violations": [0]})
                continue
            key = pdf[cols]
            ok = True
            prev = key.iloc[:-1].reset_index(drop=True)
            cur = key.iloc[1:].reset_index(drop=True)
            # lexicographic non-decreasing check, vectorized
            viol = pd.Series(False, index=prev.index)
            tie = pd.Series(True, index=prev.index)
            for c in cols:
                lt = cur[c] < prev[c]
                viol |= tie & lt
                tie &= cur[c] == prev[c]
                del lt
            yield pd.DataFrame({"violations": [int(viol.sum())]})
            del ok

    counts = df.select(*cols).mapInPandas(_count, schema="violations long")
    row = counts.agg(F.sum("violations").alias("v")).collect()[0]
    return int(row["v"] or 0)


def bucketed_scan_is_shuffle_free(spark: SparkSession, table: str, key_cols: list[str]) -> bool:
    """True if a groupBy on the bucket key over ``table`` plans without
    an Exchange — i.e. Spark honored the bucketing metadata."""
    plan = (
        spark.table(table)
        .groupBy(*key_cols)
        .count()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    return "Exchange hashpartitioning" not in plan

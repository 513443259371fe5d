"""Sequence packing — map every document to its position in the packed
token stream a GPT-style pre-training run consumes.

The standard recipe (public: GPT/T5 data pipelines) concatenates the
corpus in a deterministic order and slices it into fixed-length windows
of ``seq_len`` tokens; a document's placement is a pure function of the
GLOBAL prefix sum of token counts in that order. The naive Spark
formulation — ``Window.orderBy(h)`` with no partition spec — collapses
to a single task and is exactly the scale-killer this engine bans, so
the operator computes the prefix sum with the classic two-level
distributed scan:

1. bucket each row by the high bits of its order key (bucket id is
   monotone in the key, so bucket order == global order);
2. local cumulative sums inside each bucket (one hash shuffle, B-way
   parallel);
3. per-bucket totals → exclusive prefix per bucket (B rows — a
   single-partition window over *bucket count* rows, thousands at
   most, never data-sized) → broadcast join back.

Everything is int64 arithmetic, so the DuckDB oracle (one global
``sum() OVER (ORDER BY …)``) matches bit-for-bit while the engine plan
stays fully parallel.

Reference anchor: no pliers counterpart (pliers stops at features);
this is part of the training-data surface the 100 TB goal requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.hashing import HEX_CHARS, md5_int, md5_int_sql

_KEY_BITS = 4 * HEX_CHARS  # md5_int yields a 60-bit non-negative key


def pack_sequences(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 128,
    num_buckets: int | None = None,
) -> DataFrame:
    """Per-doc packed placement: ``(id, n_tokens, pack_id, pack_offset,
    spans_boundary)`` under hash-shuffled concatenate-and-chunk packing.

    ``pack_id``/``pack_offset`` locate the document's first token in the
    fixed-``seq_len`` window stream; ``spans_boundary`` marks documents
    split across two windows (the chunking, not padding, convention).
    """
    spark = docs.sparkSession
    b = num_buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
    span = (1 << _KEY_BITS) // b + 1  # monotone: bucket order == key order

    d = docs.select(
        F.col(id_col),
        F.size(T.tokenize(F.col(text_col))).cast("long").alias("n_tokens"),
        md5_int(F.col(id_col).cast("string")).alias("h"),
    ).withColumn("bucket", (F.col("h") / span).cast("long"))

    w_local = Window.partitionBy("bucket").orderBy("h", id_col)
    local = d.withColumn(
        "local_cum", F.sum("n_tokens").over(w_local) - F.col("n_tokens")
    )

    # per-bucket totals: B rows total — the only single-partition window
    # runs over bucket COUNT, not row count (bounded at any data scale)
    w_buckets = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    prefix = (
        d.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("tot"))
        .withColumn("bucket_prefix", F.coalesce(F.sum("tot").over(w_buckets), F.lit(0)))
        .select("bucket", "bucket_prefix")
    )

    out = local.join(F.broadcast(prefix), "bucket")
    start = F.col("bucket_prefix") + F.col("local_cum")
    return out.select(
        id_col,
        "n_tokens",
        F.floor(start / seq_len).cast("long").alias("pack_id"),
        (start % seq_len).alias("pack_offset"),
        (start % seq_len + F.col("n_tokens") > seq_len).alias("spans_boundary"),
    )


def pack_sequences_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_len: int = 128,
) -> str:
    """DuckDB oracle: the same placement as ONE global ordered prefix
    sum — the semantics the distributed two-level scan must equal."""
    h = md5_int_sql(f"CAST({id_col} AS VARCHAR)")
    return f"""WITH d AS (
         SELECT {id_col},
                len(string_split(trim({text_col}), ' '))::BIGINT AS n_tokens,
                {h}::BIGINT AS h
         FROM {table}),
       c AS (
         SELECT {id_col}, n_tokens,
                sum(n_tokens) OVER (ORDER BY h, {id_col}) - n_tokens AS start
         FROM d)
       SELECT {id_col}, n_tokens,
              (start // {seq_len})::BIGINT AS pack_id,
              (start % {seq_len})::BIGINT AS pack_offset,
              (start % {seq_len} + n_tokens > {seq_len}) AS spans_boundary
       FROM c"""

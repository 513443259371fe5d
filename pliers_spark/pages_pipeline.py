"""The north-rule flagship job over ``pages(url, warc_ts, html, text, lang)``:

  scan (html pruned) → per-snapshot feature extraction (JVM column
  stages + lexicon broadcast join) → per-url windowed features
  (sessionize, lag, ffill) → point-in-time as-of join onto a query
  spine → feature table.

This is the job the scaling evidence (BENCH/BASELINE.md) measures in
pages/sec at two parallelism levels. Every stage is shuffle-accounted:

1. extraction: ZERO shuffles (narrow column maps, codegen-fused);
2. windowed features: ONE shuffle on url (all window specs share the
   same partitioning, so Catalyst reuses one Exchange);
3. as-of join: ONE shuffle of the (small) spine + the already
   url-partitioned features (union+window strategy).

The ``html`` binary column is never referenced — column pruning keeps
it out of the scan entirely (asserted in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import text as T
from .functions.hashing import minhash_signature, shingles
from .operators import temporal as TP
from .operators.asof import asof_join

SESSION_GAP_DAYS = 30.0


def extract_page_features(pages: DataFrame, minhash_k: int = 4) -> DataFrame:
    """Per-snapshot extraction — narrow, shuffle-free, codegen-fused."""
    toks = T.tokenize(F.col("text"))
    sh = shingles(toks, 3)
    return pages.select(
        "url",
        "warc_ts",
        "lang",
        T.text_length("text").alias("text_length"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.round(T.stopword_ratio("text"), 6).alias("stopword_ratio"),
        T.quality_score("text").alias("quality"),
        T.langid_best("text").alias("lang_pred"),
        *minhash_signature(sh, minhash_k),
    )


def windowed_page_features(feats: DataFrame) -> DataFrame:
    """Per-url temporal features — one shuffle on url, leakage-safe frames."""
    out = TP.sessionize(feats, ["url"], "warc_ts", gap_seconds=SESSION_GAP_DAYS * 86400)
    out = TP.lag_features(out, ["url"], "warc_ts", "text_length", [1])
    out = TP.lag_features(out, ["url"], "warc_ts", "quality", [1])
    out = out.withColumn(
        "quality_delta", F.round(F.col("quality") - F.col("quality_lag1"), 6)
    )
    return out


def pages_flagship(
    spark: SparkSession,
    pages_path: str,
    spine_step_hours: int = 24 * 7,
    minhash_k: int = 4,
) -> DataFrame:
    """Full pipeline returning the point-in-time feature table: for each
    (url, t) on a weekly spine grid, the features of the latest snapshot
    with warc_ts <= t."""
    pages = spark.read.parquet(pages_path)
    feats = windowed_page_features(extract_page_features(pages, minhash_k))
    spine = TP.resample_grid(
        pages.select("url", "warc_ts"), ["url"], "warc_ts", spine_step_hours * 3600
    ).withColumnRenamed("warc_ts", "t")
    value_cols = [c for c in feats.columns if c not in ("url", "warc_ts")]
    return asof_join(spine, feats, ["url"], "t", "warc_ts", value_cols)

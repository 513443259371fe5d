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


def extract_page_features(pages: DataFrame, minhash_k: int = 0) -> DataFrame:
    """Per-snapshot extraction — narrow, shuffle-free, codegen-fused.

    The token array is materialized ONCE per row (`_toks`) and every
    feature expression references the column: tokenization is the
    dominant per-row cost, and relying on expression CSE to dedupe ~20
    inlined `split()`s is fragile — an explicit intermediate column
    guarantees single evaluation."""
    from pyspark.sql import Column

    toks = F.col("_toks")
    lower_toks = F.col("_ltoks")
    sh = shingles(toks, 3)

    def isin_count(words: list[str]) -> Column:
        return F.size(F.filter(lower_toks, T._isin_lambda(words)))

    denom = F.greatest(F.size(toks), F.lit(1))
    sw_ratio = isin_count(T.ENGLISH_STOPWORDS) / denom

    alpha = F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", "")) / F.greatest(
        F.length(F.col("text")), F.lit(1)
    )
    mtl = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast(
        "double"
    ) / denom
    quality = F.round(
        F.lit(0.25) * F.least(F.size(toks).cast("double") / F.lit(50.0), F.lit(1.0))
        + F.lit(0.25) * alpha
        + F.lit(0.25) * F.least(sw_ratio * F.lit(5.0), F.lit(1.0))
        + F.lit(0.25) * F.when((mtl >= 2.0) & (mtl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0)),
        6,
    )

    scored = None
    for i, (lang, words) in enumerate(T.LANG_PROFILES.items()):
        score = isin_count(words) / denom - F.lit(i * 1e-9)
        pair = F.struct(score.alias("s"), F.lit(lang).alias("l"))
        scored = pair if scored is None else F.when(pair["s"] > scored["s"], pair).otherwise(scored)

    # NB: lowercase the string once then split — per-element
    # F.transform(.., lower) is ~6x slower (interpreted lambda per token)
    return pages.select(
        "url",
        "warc_ts",
        "lang",
        "text",
        T.tokenize(F.col("text")).alias("_toks"),
        T.tokenize(T.lower_case(F.col("text"))).alias("_ltoks"),
    ).select(
        "url",
        "warc_ts",
        "lang",
        T.text_length("text").alias("text_length"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        quality.alias("quality"),
        scored["l"].alias("lang_pred"),
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
    minhash_k: int = 0,
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

"""Repetition-based document quality signals for training-data curation.

The signals published in the Gopher (Rae et al. 2021, §A1.1) and
RefinedWeb data-quality appendices — duplicate-token fraction, most-
frequent-token fraction, top-bigram character fraction — as one
Spark stage per doc. The reference has no direct counterpart (its
quality surface is the extractor set); these are the web-corpus
curation ops a 100 TB pipeline runs between dedup and tokenization,
grouped with the engine's quality_score/quality_filter family.

Scale shape: explode tokens → (doc, token) counts (map-side partial
agg) → per-doc reduction; bigrams likewise via the shared shingle
expression. Both aggregations key on doc_id, so the final join is
co-partitioned (one shuffle each side, no extra exchange for the
join). Ratios are emitted as exact BIGINT parts-per-million
(floor(cnt·1e6/denom), the same cross-engine-bit-stable convention as
the langid scores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.hashing import shingles


def _ppm(num, denom):
    return F.floor(num * F.lit(1_000_000.0) / denom).cast("long")


def repetition_signals(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc: n_tokens, dup_token_ppm (1 − distinct/total),
    top_token_ppm (most frequent token's share), top_bigram_ppm
    (most frequent bigram's share of all bigrams; NULL when the doc has
    fewer than 2 tokens)."""
    toks = df.select(F.col(id_col), F.explode(T.tokenize(F.col(text_col))).alias("_t"))
    tok_counts = toks.groupBy(id_col, "_t").agg(F.count(F.lit(1)).alias("c"))
    tok_stats = tok_counts.groupBy(id_col).agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_unique"),
        F.max("c").alias("top_c"),
    )
    bg = df.select(
        F.col(id_col),
        F.explode(shingles(T.tokenize(F.col(text_col)), 2)).alias("_b"),
    )
    bg_counts = bg.groupBy(id_col, "_b").agg(F.count(F.lit(1)).alias("c"))
    bg_stats = bg_counts.groupBy(id_col).agg(
        F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bc")
    )
    out = tok_stats.join(bg_stats, id_col, "left")
    return out.select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        _ppm(F.col("n_tokens") - F.col("n_unique"), F.col("n_tokens")).alias("dup_token_ppm"),
        _ppm(F.col("top_c"), F.col("n_tokens")).alias("top_token_ppm"),
        _ppm(F.col("top_bc"), F.col("n_bigrams")).alias("top_bigram_ppm"),
    )


def repetition_signals_sql(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    return f"""WITH toks AS (
  SELECT {id_col}, unnest(string_split(trim({text_col}), ' ')) AS t FROM {table}),
tc AS (SELECT {id_col}, t, count(*) AS c FROM toks GROUP BY 1, 2),
ts AS (SELECT {id_col}, sum(c) AS n_tokens, count(*) AS n_unique, max(c) AS top_c
       FROM tc GROUP BY 1),
base AS (SELECT {id_col}, string_split(trim({text_col}), ' ') AS w FROM {table}),
bgs AS (
  SELECT {id_col}, unnest(list_transform(range(1, greatest(len(w), 1)),
                                         i -> w[i] || ' ' || w[i+1])) AS b
  FROM base),
bc AS (SELECT {id_col}, b, count(*) AS c FROM bgs GROUP BY 1, 2),
bs AS (SELECT {id_col}, sum(c) AS n_bigrams, max(c) AS top_bc FROM bc GROUP BY 1)
SELECT ts.{id_col},
       ts.n_tokens::BIGINT AS n_tokens,
       floor((ts.n_tokens - ts.n_unique) * 1000000.0 / ts.n_tokens)::BIGINT AS dup_token_ppm,
       floor(ts.top_c * 1000000.0 / ts.n_tokens)::BIGINT AS top_token_ppm,
       floor(bs.top_bc * 1000000.0 / bs.n_bigrams)::BIGINT AS top_bigram_ppm
FROM ts LEFT JOIN bs USING ({id_col})"""

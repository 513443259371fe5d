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


# ---------------------------------------------------------------------------
# Gopher document-quality ruleset (Rae et al. 2021, Table A1)

GOPHER_REQUIRED_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
_BULLET_CHARS = ["-", "*", "•"]  # '-', '*', '•'


def gopher_rules(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """The published Gopher quality-filter rules as one per-doc gate:

    1. 50 <= word count <= 100,000
    2. 3 <= mean word length <= 10
    3. symbol-to-word ratio ('#' chars + '...' occurrences) <= 0.1
    4. <= 90% of lines start with a bullet ('-', '*', '•')
    5. <= 30% of lines end with an ellipsis ('...' or '…')
    6. >= 80% of words contain at least one alphabetic character
    7. >= 2 distinct words from the required set
       {the, be, to, of, and, that, have, with} appear as tokens

    Every ratio threshold is evaluated by integer cross-multiplication
    (e.g. rule 2 as ``3*n_words <= sum_len <= 10*n_words``), so the
    emitted booleans are bit-stable across engines — no float division
    anywhere. Tokens are the engine's whitespace tokens; rule 7 matches
    lowercased whole tokens (a trailing-punctuation token like 'the,'
    does not match — documented simplification, punctuation-stripped
    matching is the text_prep stage's job upstream).

    Scale shape: two explode->groupBy branches (tokens, lines), both
    keyed on the doc id (map-side partial agg, co-partitioned join back
    to the per-doc scalar projection — AQE coalesces the residual
    exchanges); no UDF, no driver state. Beyond-reference: the
    reference's quality surface is its extractor set, not corpus
    gates."""
    t = F.col(text_col)
    toks = df.select(F.col(id_col), F.explode(T.tokenize(t)).alias("_t"))
    lw = F.lower(F.col("_t"))
    ta = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.length("_t")).alias("sum_len"),
        F.sum(F.when(F.col("_t").rlike("[A-Za-z]"), 1).otherwise(0)).alias("n_alpha"),
        F.count_distinct(
            F.when(lw.isin(GOPHER_REQUIRED_WORDS), lw)
        ).alias("n_req"),
    )
    lines = df.select(F.col(id_col), F.explode(F.split(t, "\n")).alias("_ln"))
    first = F.substring(F.ltrim(F.col("_ln")), 1, 1)
    tail = F.rtrim(F.col("_ln"))
    la = lines.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(first.isin(_BULLET_CHARS), 1).otherwise(0)).alias("n_bullet"),
        F.sum(
            F.when(tail.endswith("...") | tail.endswith("…"), 1).otherwise(0)
        ).alias("n_ell"),
    )
    sc = df.select(
        F.col(id_col),
        (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))).alias("n_hash"),
        (
            (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / F.lit(3)
        ).cast("long").alias("n_dots"),
    )
    j = (
        sc.join(ta, id_col, "left")
        .join(la, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("sum_len", F.lit(0)).alias("sum_len"),
            F.coalesce("n_alpha", F.lit(0)).alias("n_alpha"),
            F.coalesce("n_req", F.lit(0)).alias("n_req"),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_bullet", F.lit(0)).alias("n_bullet"),
            F.coalesce("n_ell", F.lit(0)).alias("n_ell"),
            "n_hash",
            "n_dots",
        )
    )
    n, sl = F.col("n_words"), F.col("sum_len")
    flags = {
        "ok_word_count": (n >= 50) & (n <= 100_000),
        "ok_mean_word_len": (sl >= 3 * n) & (sl <= 10 * n),
        "ok_symbol_ratio": 10 * (F.col("n_hash") + F.col("n_dots")) <= n,
        "ok_bullet_lines": 10 * F.col("n_bullet") <= 9 * F.col("n_lines"),
        "ok_ellipsis_lines": 10 * F.col("n_ell") <= 3 * F.col("n_lines"),
        "ok_alpha_words": 5 * F.col("n_alpha") >= 4 * n,
        "ok_required_words": F.col("n_req") >= 2,
    }
    all_ok = None
    for c in flags.values():
        all_ok = c if all_ok is None else (all_ok & c)
    return j.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        F.col("n_lines").cast("long").alias("n_lines"),
        *[c.alias(name) for name, c in flags.items()],
        all_ok.alias("pass_gopher"),
    )


def gopher_rules_sql(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    req = ", ".join(f"'{w}'" for w in GOPHER_REQUIRED_WORDS)
    return f"""WITH toks AS (
  SELECT {id_col}, unnest(string_split(trim({text_col}), ' ')) AS t FROM {table}),
ta AS (
  SELECT {id_col}, count(*) AS n_words, sum(length(t)) AS sum_len,
         sum(CASE WHEN regexp_matches(t, '[A-Za-z]') THEN 1 ELSE 0 END) AS n_alpha,
         count(DISTINCT CASE WHEN lower(t) IN ({req}) THEN lower(t) END) AS n_req
  FROM toks WHERE t <> '' GROUP BY 1),
lns AS (
  SELECT {id_col}, unnest(string_split({text_col}, chr(10))) AS ln FROM {table}),
la AS (
  SELECT {id_col}, count(*) AS n_lines,
         sum(CASE WHEN substr(ltrim(ln), 1, 1) IN ('-', '*', '•')
                  THEN 1 ELSE 0 END) AS n_bullet,
         sum(CASE WHEN rtrim(ln) LIKE '%...' OR rtrim(ln) LIKE '%…'
                  THEN 1 ELSE 0 END) AS n_ell
  FROM lns GROUP BY 1),
sc AS (
  SELECT {id_col},
         length({text_col}) - length(replace({text_col}, '#', '')) AS n_hash,
         (length({text_col}) - length(replace({text_col}, '...', ''))) // 3 AS n_dots
  FROM {table}),
j AS (
  SELECT sc.{id_col},
         coalesce(ta.n_words, 0) AS n_words, coalesce(ta.sum_len, 0) AS sum_len,
         coalesce(ta.n_alpha, 0) AS n_alpha, coalesce(ta.n_req, 0) AS n_req,
         coalesce(la.n_lines, 0) AS n_lines, coalesce(la.n_bullet, 0) AS n_bullet,
         coalesce(la.n_ell, 0) AS n_ell, sc.n_hash, sc.n_dots
  FROM sc LEFT JOIN ta USING ({id_col}) LEFT JOIN la USING ({id_col}))
SELECT {id_col},
       n_words::BIGINT AS n_words,
       n_lines::BIGINT AS n_lines,
       (n_words >= 50 AND n_words <= 100000) AS ok_word_count,
       (sum_len >= 3*n_words AND sum_len <= 10*n_words) AS ok_mean_word_len,
       (10*(n_hash + n_dots) <= n_words) AS ok_symbol_ratio,
       (10*n_bullet <= 9*n_lines) AS ok_bullet_lines,
       (10*n_ell <= 3*n_lines) AS ok_ellipsis_lines,
       (5*n_alpha >= 4*n_words) AS ok_alpha_words,
       (n_req >= 2) AS ok_required_words,
       ((n_words >= 50 AND n_words <= 100000)
        AND (sum_len >= 3*n_words AND sum_len <= 10*n_words)
        AND (10*(n_hash + n_dots) <= n_words)
        AND (10*n_bullet <= 9*n_lines)
        AND (10*n_ell <= 3*n_lines)
        AND (5*n_alpha >= 4*n_words)
        AND (n_req >= 2)) AS pass_gopher
FROM j"""

"""Distributed BPE merge-rule learning (Sennrich et al. 2016).

The published byte-pair-encoding trainer learns merge rules over a
WORD-FREQUENCY table, not the raw corpus: pairs never cross word
boundaries, so the corpus contributes only its word census and every
iteration runs on the (much smaller) distinct-word relation. That is
exactly the right distributed decomposition:

1. **word census** — the only corpus-sized stage: one explode +
   groupBy(word) with map-side combine.
2. **symbol relation** ``(word, freq, pos, sym)`` — characters of each
   DISTINCT word; dimension-sized (Σ lengths of distinct words).
3. **R rounds**, each fully relational on the symbol relation:
   adjacent-pair census weighted by word frequency → argmax pair
   (count desc, pair asc — deterministic) → greedy left-to-right merge
   application. Greedy conflicts only exist inside runs of a repeated
   symbol (merge (a,a) on "aaaa" takes positions 0 and 2); the run
   offset comes from the classic gaps-and-islands construction, so the
   whole round is window functions + a filter — no Python in the loop
   body, and the same expressions replay in SQL.

The round loop is driver-coordinated like :func:`~pliers_spark.
operators.similarity.kmeans_fit` (collect = 1 row per round: the best
pair); the symbol relation is stableCheckpoint-truncated per round.
Everything is integer counts and string symbols — no floats anywhere —
so the DuckDB oracle (the full fit unrolled, :func:`bpe_learn_sql`)
matches exactly.

Reference anchor: pliers has no tokenizer-training surface; this is
the vocabulary-construction pass of the 100 TB training-data goal
(``token_count_bpe`` applies a FIXED pre-tokenizer; this LEARNS the
merge table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T


def _char_symbols(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq, pos, sym) over distinct words — chars by position
    (substring(word, i, 1) so the oracle indexes identically)."""
    words = (
        docs.select(F.explode(T.tokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return words.select(
        "word",
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("pos"),
    ).select(
        "word", "freq", F.col("pos").cast("long").alias("pos"),
        F.substring(F.col("word"), F.col("pos").cast("int"), 1).alias("sym"),
    )


def _apply_merge(syms: DataFrame, a: str, b: str) -> DataFrame:
    """Greedy left-to-right application of merge (a, b) within words."""
    w = Window.partitionBy("word").orderBy("pos")
    is_a = F.col("sym") == a
    # gaps-and-islands: run id for consecutive sym==a positions, offset
    # within the run decides which overlapping candidates merge
    arn = F.when(is_a, F.row_number().over(Window.partitionBy("word", is_a).orderBy("pos")))
    t = syms.select(
        "word", "freq", "pos", "sym",
        F.lead("sym").over(w).alias("nxt"),
        (F.col("pos") - arn).alias("rungrp"),
    )
    runoff = F.when(
        t["sym"] == a,
        F.row_number().over(Window.partitionBy("word", "rungrp").orderBy("pos")) - 1,
    )
    cand = (F.col("sym") == a) & (F.col("nxt") == b)
    kept = cand & ((F.lit(a) != F.lit(b)) | (runoff % 2 == 0))
    t = t.select("word", "freq", "pos", "sym", kept.alias("kept"))
    t = t.select(
        "word", "freq", "pos", "kept",
        F.coalesce(F.lag("kept").over(w), F.lit(False)).alias("absorbed"),
        F.when(F.col("kept"), F.lit(a + b)).otherwise(F.col("sym")).alias("sym"),
    )
    surv = t.where(~F.col("absorbed"))
    return surv.select(
        "word", "freq",
        F.row_number().over(w).cast("long").alias("pos"),
        "sym",
    )


def bpe_learn(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 5,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules over the corpus.

    Returns the merge table: ``(merge_rank, left_sym, right_sym,
    pair_count, new_sym)`` — the trained model, one row per round.
    """
    spark = docs.sparkSession
    syms = _char_symbols(docs, text_col).stableCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int, str]] = []
    for r in range(1, n_merges + 1):
        w = Window.partitionBy("word").orderBy("pos")
        pairs = (
            syms.select("freq", "sym", F.lead("sym").over(w).alias("s2"))
            .where(F.col("s2").isNotNull())
            .groupBy("sym", "s2")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), "sym", "s2").limit(1).collect()
        if not best:  # vocabulary exhausted — every word is one symbol
            break
        a, b, cnt = best[0]["sym"], best[0]["s2"], int(best[0]["cnt"])
        merges.append((r, a, b, cnt, a + b))
        syms = _apply_merge(syms, a, b).stableCheckpoint(eager=True)
    return spark.createDataFrame(
        merges,
        "merge_rank long, left_sym string, right_sym string, pair_count long, new_sym string",
    )


def _fit_ctes(table: str, text_col: str, n_merges: int) -> str:
    """The unrolled-fit WITH body shared by the learn and encode
    oracles: round ``r`` derives best-pair ``b{r}`` and survivor
    relation ``s{r}`` from ``s{r-1}`` with the same census, tie-break,
    and greedy-run semantics as the engine."""
    parts = [
        f"""WITH wc AS (
         SELECT w AS word, count(*)::BIGINT AS freq
         FROM (SELECT unnest(string_split(trim({text_col}), ' ')) AS w FROM {table})
         GROUP BY w),
       s0 AS (
         SELECT word, freq, u.i::BIGINT AS pos, substr(word, u.i, 1) AS sym
         FROM wc, unnest(range(1, length(word) + 1)) AS u(i))"""
    ]
    prev = "s0"
    for r in range(1, n_merges + 1):
        parts.append(
            f"""p{r} AS (
         SELECT sym AS a, s2 AS b, sum(freq)::BIGINT AS cnt
         FROM (SELECT freq, sym,
                      lead(sym) OVER (PARTITION BY word ORDER BY pos) AS s2
               FROM {prev})
         WHERE s2 IS NOT NULL GROUP BY sym, s2)""")
        parts.append(
            f"""b{r} AS (SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1)""")
        parts.append(
            f"""u{r} AS (
         SELECT s.word, s.freq, s.pos, s.sym, m.a, m.b,
                lead(s.sym) OVER (PARTITION BY s.word ORDER BY s.pos) AS nxt,
                s.pos - CASE WHEN s.sym = m.a THEN
                  row_number() OVER (PARTITION BY s.word, (s.sym = m.a) ORDER BY s.pos)
                END AS rungrp
         FROM {prev} s CROSS JOIN b{r} m)""")
        parts.append(
            f"""v{r} AS (
         SELECT *,
                (sym = a AND nxt = b AND (a <> b OR
                   (row_number() OVER (PARTITION BY word, rungrp ORDER BY pos) - 1) % 2 = 0)
                ) AS kept
         FROM u{r})""")
        parts.append(
            f"""s{r} AS (
         SELECT word, freq,
                row_number() OVER (PARTITION BY word ORDER BY pos)::BIGINT AS pos,
                CASE WHEN kept THEN a || b ELSE sym END AS sym
         FROM (SELECT *,
                      coalesce(lag(kept) OVER (PARTITION BY word ORDER BY pos), false)
                        AS absorbed
               FROM v{r})
         WHERE NOT absorbed)""")
        prev = f"s{r}"
    return ",\n       ".join(parts)


def bpe_learn_sql(
    table: str = "documents",
    text_col: str = "text",
    n_merges: int = 5,
) -> str:
    """DuckDB oracle for :func:`bpe_learn` (the fit unrolled, final
    select = the merge table)."""
    selects = "\n       UNION ALL ".join(
        f"SELECT {r}::BIGINT AS merge_rank, a AS left_sym, b AS right_sym, "
        f"cnt AS pair_count, a || b AS new_sym FROM b{r}"
        for r in range(1, n_merges + 1)
    )
    return f"{_fit_ctes(table, text_col, n_merges)}\n       {selects}"


def bpe_encode_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 5,
) -> DataFrame:
    """Token accounting under the LEARNED tokenizer: train ``n_merges``
    BPE rules (:func:`bpe_learn` loop), then count each document's
    subword tokens. The per-word subword count is a dimension table
    (one row per distinct word), so encoding the corpus is a narrow
    explode + broadcast join + per-doc reduction — the train→encode
    round trip a tokenizer pipeline runs before sequence packing.

    Returns ``(id, n_words, n_subwords)``.
    """
    syms = _char_symbols(docs, text_col).stableCheckpoint(eager=True)
    for _ in range(n_merges):
        w = Window.partitionBy("word").orderBy("pos")
        pairs = (
            syms.select("freq", "sym", F.lead("sym").over(w).alias("s2"))
            .where(F.col("s2").isNotNull())
            .groupBy("sym", "s2")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), "sym", "s2").limit(1).collect()
        if not best:
            break
        syms = _apply_merge(syms, best[0]["sym"], best[0]["s2"]).stableCheckpoint(eager=True)
    word_len = syms.groupBy("word").agg(F.count(F.lit(1)).alias("n_sub"))
    toks = docs.select(id_col, F.explode(T.tokenize(F.col(text_col))).alias("word"))
    return (
        toks.join(F.broadcast(word_len), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").alias("n_subwords"),
        )
    )


def bpe_encode_counts_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 5,
) -> str:
    """DuckDB oracle for :func:`bpe_encode_counts` — reuses the
    unrolled fit's final survivor relation ``s{n_merges}``."""
    return f"""{_fit_ctes(table, text_col, n_merges)},
       wl AS (SELECT word, count(*)::BIGINT AS n_sub FROM s{n_merges} GROUP BY word),
       dt AS (SELECT {id_col}, unnest(string_split(trim({text_col}), ' ')) AS word
              FROM {table})
       SELECT dt.{id_col}, count(*)::BIGINT AS n_words, sum(wl.n_sub)::BIGINT AS n_subwords
       FROM dt JOIN wl USING (word)
       GROUP BY dt.{id_col}"""

"""Statistical-LM corpus scoring and repeated-span removal.

Two more passes a production pre-training pipeline runs between
cleaning and tokenization, extending operators/curation.py:

- **Bigram-LM scoring** (CCNet-style, Wenzek et al. 2020): train an
  add-one-smoothed bigram language model ON the corpus itself, score
  every document with its average per-token log-probability, and bucket
  documents into head/middle/tail by per-language score percentile.
  CCNet uses a KenLM 5-gram trained on Wikipedia; the distributed
  mechanics are identical with the model order and training corpus
  swapped — the MODEL is a dimension table (vocab-bounded), the corpus
  scan is narrow, and the only corpus-sized shuffles are the model
  aggregation (map-side partial) and the per-doc score reduction.

- **Repeated-span (chunk) removal** (C4 / Gopher-style): census every
  K-token span of every document, drop spans that occur in more than
  ``max_docs`` distinct documents (boilerplate: navigation, license
  headers, templated footers), and reassemble each document from its
  surviving spans in order. C4 removes any 3-sentence span occurring
  more than once; Gopher removes high-frequency lines. The synthetic
  corpus has no newlines, so spans are fixed K-token windows here —
  production splits on '\\n\\n' with the same plan shape.

Cross-engine bit-determinism: every log-probability is rounded to
integer micro-nats (``round(ln(p)*1e6)`` as BIGINT) before summing, so
per-doc accumulation is exact integer arithmetic on both engines and
the final average is the same two IEEE divisions on both.

Reference anchor: pliers has no corpus-level LM or boilerplate surface
(its extractors are per-stimulus, pliers/extractors/text.py); these are
the engine-level counterpart required by the 100 TB training-data goal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T

UNK = "<unk>"


def _mapped_bigrams(docs: DataFrame, vocab: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) per consecutive token pair, OOV mapped to <unk>.

    Bigram construction is per-row ``arrays_zip`` of two shifted slices
    (zero shuffle); OOV mapping is two broadcast left joins against the
    vocab dimension — the corpus side never shuffles here.
    """
    toks = docs.select(id_col, T.tokenize(F.col(text_col)).alias("toks"))
    pairs = toks.select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.slice("toks", 1, F.greatest(F.size("toks") - 1, F.lit(0))).alias("a"),
                F.slice("toks", 2, F.greatest(F.size("toks") - 1, F.lit(0))).alias("b"),
            )
        ).alias("p"),
    ).select(id_col, F.col("p.a").alias("w1r"), F.col("p.b").alias("w2r"))
    v1 = vocab.select(F.col("w").alias("w1r"), F.lit(1).alias("s1"))
    v2 = vocab.select(F.col("w").alias("w2r"), F.lit(1).alias("s2"))
    return (
        pairs.join(F.broadcast(v1), "w1r", "left")
        .join(F.broadcast(v2), "w2r", "left")
        .select(
            id_col,
            F.when(F.col("s1") == 1, F.col("w1r")).otherwise(F.lit(UNK)).alias("w1"),
            F.when(F.col("s2") == 1, F.col("w2r")).otherwise(F.lit(UNK)).alias("w2"),
        )
    )


def bigram_lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
    min_count: int = 1,
) -> DataFrame:
    """Per-document average bigram log-probability under an add-one-
    smoothed bigram LM trained on the same corpus.

    Plan shape: vocab = distributed top-k on the token census
    (``TakeOrderedAndProject`` — map-side partial top-k, never a
    single-partition rank window); model = one bigram-key aggregation
    with map-side combine; scoring = narrow bigram map + broadcast join
    against the (vocab-bounded) model + one per-doc reduction.
    ``min_count`` pre-gates the census so crawl-scale garbage tokens
    (urls, hashes — billions of singletons at 100 TB) never reach the
    top-k heap.

    p(w2|w1) = (c(w1,w2) + 1) / (c(w1,·) + |V| + 1), |V|+1 covering
    ``<unk>``. Each bigram contributes round(ln(p)*1e6) micro-nats as
    BIGINT — integer sums are order-independent, so the driver's
    raw-float-bit hash is stable across engines.

    Returns ``(id, n_bigrams, sum_lp_unats, avg_lp)``.
    """
    tok_census = (
        docs.select(F.explode(T.tokenize(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_count)
    )
    # vocab feeds two broadcast joins AND a count action — checkpoint the
    # (vocab-bounded) dimension so the corpus-wide census runs once
    vocab = (
        tok_census.orderBy(F.desc("c"), F.asc("w"))
        .limit(vocab_size)
        .select("w")
        .stableCheckpoint(eager=True)
    )
    n_vocab = vocab.count()  # free after the checkpoint

    # per-doc bigram counts are the smallest cut of this DAG consumed by
    # BOTH the model aggregation and the scoring join — checkpoint them
    # once (same shape as the LSH signature checkpoint, operators/
    # dedup.py) so the tokenize→zip→explode corpus scan never re-runs
    bg = (
        _mapped_bigrams(docs, vocab, text_col, id_col)
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("k"))
        .stableCheckpoint(eager=True)
    )
    model = bg.groupBy("w1", "w2").agg(F.sum("k").alias("cb"))
    ctx = model.groupBy("w1").agg(F.sum("cb").alias("cw"))
    model = model.join(ctx, "w1")

    lp = (F.col("cb") + 1).cast("double") / (F.col("cw") + n_vocab + 1).cast("double")
    # each distinct per-doc bigram contributes k × round(ln(p)·1e6):
    # identical to summing per occurrence, but the scoring join carries
    # one row per (doc, bigram) instead of one per token
    scored = bg.join(F.broadcast(model), ["w1", "w2"]).select(
        id_col,
        F.col("k"),
        (F.col("k") * F.round(F.log(lp) * 1e6, 0).cast("long")).alias("lp_unats"),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum("k").alias("n_bigrams"),
        F.sum("lp_unats").alias("sum_lp_unats"),
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("sum_lp_unats", F.lit(0)).cast("long").alias("sum_lp_unats"),
            F.when(
                F.col("n_bigrams").isNotNull(),
                F.round(
                    (F.col("sum_lp_unats").cast("double") / F.col("n_bigrams"))
                    / F.lit(1000000.0),
                    6,
                ),
            ).alias("avg_lp"),
        )
    )


def bigram_lm_score_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
    min_count: int = 1,
) -> str:
    """DuckDB oracle for :func:`bigram_lm_score` (same smoothing, same
    integer micro-nat rounding, same division order)."""
    return f"""WITH base AS (
         SELECT {id_col}, string_split(trim({text_col}), ' ') AS toks FROM {table}),
       census AS (
         SELECT t AS w, count(*)::BIGINT AS c
         FROM (SELECT unnest(toks) AS t FROM base) GROUP BY t
         HAVING count(*) >= {min_count}),
       vocab AS (SELECT w FROM census ORDER BY c DESC, w LIMIT {vocab_size}),
       nv AS (SELECT count(*)::BIGINT AS n_vocab FROM vocab),
       bi AS (
         SELECT b.{id_col},
                CASE WHEN v1.w IS NULL THEN '{UNK}' ELSE w1r END AS w1,
                CASE WHEN v2.w IS NULL THEN '{UNK}' ELSE w2r END AS w2
         FROM (SELECT {id_col},
                      unnest(toks[1:len(toks)-1]) AS w1r,
                      unnest(toks[2:len(toks)]) AS w2r
               FROM base) b
         LEFT JOIN vocab v1 ON b.w1r = v1.w
         LEFT JOIN vocab v2 ON b.w2r = v2.w),
       model AS (SELECT w1, w2, count(*)::BIGINT AS cb FROM bi GROUP BY w1, w2),
       ctx AS (SELECT w1, sum(cb)::BIGINT AS cw FROM model GROUP BY w1),
       scored AS (
         SELECT bi.{id_col},
                CAST(round(ln(((m.cb + 1)::DOUBLE) / ((c.cw + nv.n_vocab + 1)::DOUBLE)) * 1e6)
                     AS BIGINT) AS lp_unats
         FROM bi JOIN model m USING (w1, w2) JOIN ctx c USING (w1) CROSS JOIN nv),
       per_doc AS (
         SELECT {id_col}, count(*)::BIGINT AS n_bigrams,
                sum(lp_unats)::BIGINT AS sum_lp_unats
         FROM scored GROUP BY {id_col})
       SELECT b.{id_col},
              coalesce(p.n_bigrams, 0)::BIGINT AS n_bigrams,
              coalesce(p.sum_lp_unats, 0)::BIGINT AS sum_lp_unats,
              CASE WHEN p.n_bigrams IS NOT NULL
                   THEN round((p.sum_lp_unats::DOUBLE / p.n_bigrams) / 1000000.0, 6)
              END AS avg_lp
       FROM base b LEFT JOIN per_doc p USING ({id_col})"""


def ccnet_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    vocab_size: int = 1000,
) -> DataFrame:
    """CCNet head/middle/tail bucketing: per-language percentile of the
    bigram-LM score (higher log-prob = more fluent = head). One rank
    window per language partition on the (already doc-sized) score
    table; ties broken on id so the rank is deterministic.

    Returns ``(id, lang, n_bigrams, avg_lp, ppl_bucket)``.
    """
    scores = bigram_lm_score(docs, text_col, id_col, vocab_size)
    scored = scores.join(docs.select(id_col, lang_col), id_col)
    w = Window.partitionBy(lang_col).orderBy(
        (F.col("sum_lp_unats").cast("double") / F.col("n_bigrams")), F.col(id_col)
    )
    pr = F.percent_rank().over(w)
    return scored.where(F.col("n_bigrams") > 0).select(
        id_col,
        lang_col,
        "n_bigrams",
        "avg_lp",
        F.when(pr < 1.0 / 3, F.lit("tail"))
        .when(pr < 2.0 / 3, F.lit("middle"))
        .otherwise(F.lit("head"))
        .alias("ppl_bucket"),
    )


def ccnet_buckets_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    vocab_size: int = 1000,
) -> str:
    """DuckDB oracle for :func:`ccnet_buckets`."""
    score_sql = bigram_lm_score_sql(table, text_col, id_col, vocab_size)
    return f"""WITH sc AS ({score_sql}),
       j AS (
         SELECT sc.{id_col}, d.{lang_col}, sc.n_bigrams, sc.avg_lp,
                sc.sum_lp_unats
         FROM sc JOIN {table} d USING ({id_col})
         WHERE sc.n_bigrams > 0),
       r AS (
         SELECT *,
                percent_rank() OVER (
                  PARTITION BY {lang_col}
                  ORDER BY (sum_lp_unats::DOUBLE / n_bigrams), {id_col}) AS pr
         FROM j)
       SELECT {id_col}, {lang_col}, n_bigrams, avg_lp,
              CASE WHEN pr < 1.0/3 THEN 'tail'
                   WHEN pr < 2.0/3 THEN 'middle'
                   ELSE 'head' END AS ppl_bucket
       FROM r"""


def chunk_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    max_docs: int = 2,
    broadcast_cap: int = 5_000_000,
) -> DataFrame:
    """Remove every K-token span that occurs in more than ``max_docs``
    distinct documents; reassemble surviving spans in order.

    Plan shape: spans are built per-row (``transform`` over a bounded
    index sequence + ``slice`` — zero shuffle); the census is
    distinct(span, doc) then a count with map-side partials; the
    dropped-span set is **small by construction** (only spans repeated
    across >max_docs docs — boilerplate) so the removal pass is a
    broadcast LEFT ANTI join and the corpus never shuffles for the
    filter, only for the ordered per-doc reassembly. Same census→
    broadcast-anti shape as the LSH bucket cap (operators/dedup.py).

    Returns ``(id, n_chunks, n_removed, clean_text)``; a document whose
    every span was dropped keeps a row with ``clean_text = ''``.
    """
    # greatest(…, 1): an empty doc still owns one (empty) span, so it
    # keeps an output row — and sequence() never sees a negative stop
    n_chunks = F.greatest(F.floor((F.size("toks") + k - 1) / k), F.lit(1)).cast("long")
    base = docs.select(
        id_col,
        T.tokenize(F.col(text_col)).alias("toks"),
    ).select(id_col, n_chunks.alias("n_chunks"), F.col("toks"))
    # spans feed the census, the anti-join AND the per-doc totals —
    # checkpoint the one corpus-sized cut so the tokenize→slice scan
    # runs once (same shape as the LSH signature checkpoint,
    # operators/dedup.py)
    spans = (
        base.select(
            id_col,
            "n_chunks",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("n_chunks") - 1),
                    lambda i: F.struct(
                        i.alias("chunk_idx"),
                        F.array_join(F.slice("toks", i * k + 1, k), " ").alias("chunk"),
                    ),
                )
            ).alias("s"),
        )
        .select(id_col, "n_chunks", F.col("s.chunk_idx"), F.col("s.chunk"))
        .stableCheckpoint(eager=True)
    )

    census = (
        spans.select("chunk", id_col)
        .distinct()
        .groupBy("chunk")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    dropped = census.where(F.col("n_docs") > max_docs).select("chunk")

    # the dropped set is small on real corpora (only spans shared by
    # >max_docs docs — boilerplate), but nothing BOUNDS it: a corpus of
    # templated pages can push it to O(spans)/(max_docs+1). Forcing the
    # broadcast there would OOM the driver, so gate the hint on a
    # census-derived count (the census is already materialized work)
    # and otherwise leave the join strategy to the planner/AQE.
    n_dropped = dropped.count()
    anti_side = F.broadcast(dropped) if n_dropped <= broadcast_cap else dropped
    kept = spans.join(anti_side, "chunk", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda x: x["chunk"],
            ),
            " ",
        ).alias("clean_text"),
    )
    # doc universe from the checkpointed spans (map-side-reduced to one
    # (id, n_chunks) row per doc per partition) — never re-tokenize
    universe = spans.groupBy(id_col).agg(F.first("n_chunks").alias("n_chunks"))
    return universe.join(rebuilt, id_col, "left").select(
        id_col,
        F.col("n_chunks"),
        (F.col("n_chunks") - F.coalesce("n_kept", F.lit(0))).cast("long").alias("n_removed"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


def chunk_dedup_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    max_docs: int = 2,
) -> str:
    """DuckDB oracle for :func:`chunk_dedup` (same spans, same census
    threshold, same ordered reassembly)."""
    return f"""WITH base AS (
         SELECT {id_col}, string_split(trim({text_col}), ' ') AS toks,
                ((len(string_split(trim({text_col}), ' ')) + {k} - 1) // {k})::BIGINT AS n_chunks
         FROM {table}),
       idx AS (
         SELECT {id_col}, toks, n_chunks,
                unnest(range(n_chunks))::BIGINT AS chunk_idx
         FROM base),
       ch AS (
         SELECT {id_col}, n_chunks, chunk_idx,
                array_to_string(toks[chunk_idx*{k}+1 : (chunk_idx+1)*{k}], ' ') AS chunk
         FROM idx),
       census AS (
         SELECT chunk, count(DISTINCT {id_col}) AS n_docs FROM ch GROUP BY chunk),
       dropped AS (SELECT chunk FROM census WHERE n_docs > {max_docs}),
       kept AS (SELECT * FROM ch WHERE chunk NOT IN (SELECT chunk FROM dropped)),
       rebuilt AS (
         SELECT {id_col}, count(*)::BIGINT AS n_kept,
                string_agg(chunk, ' ' ORDER BY chunk_idx) AS clean_text
         FROM kept GROUP BY {id_col})
       SELECT b.{id_col}, b.n_chunks,
              (b.n_chunks - coalesce(r.n_kept, 0))::BIGINT AS n_removed,
              coalesce(r.clean_text, '') AS clean_text
       FROM base b LEFT JOIN rebuilt r USING ({id_col})"""


def kneser_ney_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
    min_count: int = 1,
    discount: float = 0.75,
) -> DataFrame:
    """Per-document score under an interpolated Kneser-Ney bigram LM
    (Kneser & Ney, ICASSP 1995; Chen & Goodman 1999 eq. 4.24) trained on
    the corpus itself — the smoothing family KenLM uses, i.e. the actual
    CCNet quality-filter model class, upgrading :func:`bigram_lm_score`'s
    add-one baseline:

        p(w2|w1) = (c(w1,w2) − D)/c(w1·)
                 + D · N1+(w1·)/c(w1·) · N1+(·w2)/N1+(··)

    with absolute discount D and continuation probability
    N1+(·w2)/N1+(··) (distinct-predecessor types, not raw counts — the
    "San Francisco" correction). Every scored bigram exists in the
    training counts (same corpus), so the discounted term is > 0.

    Plan: identical shuffle structure to :func:`bigram_lm_score` —
    vocab top-k census, one bigram-key model aggregation (the N1+ type
    counts are count-distinct on the SAME (w1,w2) grain, no extra
    corpus pass), broadcast model join, one per-doc reduction. Per-type
    log-probs round ONCE to integer micro-nats; per-doc sums are exact
    int64; perplexity exp()s the final rounded average only.

    Returns ``(id, n_bigrams, sum_lp_unats, avg_lp, ppl)``.
    """
    tok_census = (
        docs.select(F.explode(T.tokenize(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_count)
    )
    vocab = (
        tok_census.orderBy(F.desc("c"), F.asc("w"))
        .limit(vocab_size)
        .select("w")
        .stableCheckpoint(eager=True)
    )
    bg = (
        _mapped_bigrams(docs, vocab, text_col, id_col)
        .groupBy(id_col, "w1", "w2")
        .agg(F.count(F.lit(1)).alias("k"))
        .stableCheckpoint(eager=True)
    )
    model = bg.groupBy("w1", "w2").agg(F.sum("k").alias("cb"))
    ctx = model.groupBy("w1").agg(
        F.sum("cb").alias("cw"), F.count(F.lit(1)).cast("long").alias("n1_fwd")
    )
    cont = model.groupBy("w2").agg(F.count(F.lit(1)).cast("long").alias("n1_bwd"))
    nt = model.agg(F.count(F.lit(1)).cast("long").alias("n1_all"))
    full = model.join(ctx, "w1").join(cont, "w2").crossJoin(F.broadcast(nt))

    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    p = (d_("cb") - F.lit(discount)) / d_("cw") + (
        F.lit(discount) * d_("n1_fwd") / d_("cw")
    ) * (d_("n1_bwd") / d_("n1_all"))
    scored = bg.join(F.broadcast(full), ["w1", "w2"]).select(
        id_col,
        F.col("k"),
        (F.col("k") * F.round(F.log(p) * 1e6, 0).cast("long")).alias("lp_unats"),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum("k").alias("n_bigrams"), F.sum("lp_unats").alias("sum_lp_unats")
    )
    avg = F.round(
        (F.col("sum_lp_unats").cast("double") / F.col("n_bigrams")) / F.lit(1e6), 6
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("sum_lp_unats", F.lit(0)).cast("long").alias("sum_lp_unats"),
            F.when(F.col("n_bigrams").isNotNull(), avg).alias("avg_lp"),
            F.when(F.col("n_bigrams").isNotNull(), F.round(F.exp(-avg), 6)).alias("ppl"),
        )
    )


def kneser_ney_score_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
    min_count: int = 1,
    discount: float = 0.75,
) -> str:
    """DuckDB oracle for :func:`kneser_ney_score` (same discount, same
    micro-nat rounding, same division/exp order)."""
    return f"""WITH base AS (
         SELECT {id_col}, string_split(trim({text_col}), ' ') AS toks FROM {table}),
       census AS (
         SELECT t AS w, count(*)::BIGINT AS c
         FROM (SELECT unnest(toks) AS t FROM base) GROUP BY t
         HAVING count(*) >= {min_count}),
       vocab AS (SELECT w FROM census ORDER BY c DESC, w LIMIT {vocab_size}),
       bi AS (
         SELECT b.{id_col},
                CASE WHEN v1.w IS NULL THEN '{UNK}' ELSE w1r END AS w1,
                CASE WHEN v2.w IS NULL THEN '{UNK}' ELSE w2r END AS w2
         FROM (SELECT {id_col},
                      unnest(toks[1:len(toks)-1]) AS w1r,
                      unnest(toks[2:len(toks)]) AS w2r
               FROM base) b
         LEFT JOIN vocab v1 ON b.w1r = v1.w
         LEFT JOIN vocab v2 ON b.w2r = v2.w),
       model AS (SELECT w1, w2, count(*)::BIGINT AS cb FROM bi GROUP BY w1, w2),
       ctx AS (SELECT w1, sum(cb)::BIGINT AS cw, count(*)::BIGINT AS n1_fwd
               FROM model GROUP BY w1),
       cont AS (SELECT w2, count(*)::BIGINT AS n1_bwd FROM model GROUP BY w2),
       nt AS (SELECT count(*)::BIGINT AS n1_all FROM model),
       scored AS (
         SELECT bi.{id_col},
                CAST(round(ln((m.cb::DOUBLE - {discount}) / c.cw::DOUBLE
                              + ({discount} * c.n1_fwd::DOUBLE / c.cw::DOUBLE)
                                * (co.n1_bwd::DOUBLE / nt.n1_all::DOUBLE)) * 1e6)
                     AS BIGINT) AS lp_unats
         FROM bi JOIN model m USING (w1, w2) JOIN ctx c USING (w1)
              JOIN cont co USING (w2) CROSS JOIN nt),
       per_doc AS (
         SELECT {id_col}, count(*)::BIGINT AS n_bigrams,
                sum(lp_unats)::BIGINT AS sum_lp_unats
         FROM scored GROUP BY {id_col})
       SELECT b.{id_col},
              coalesce(p.n_bigrams, 0)::BIGINT AS n_bigrams,
              coalesce(p.sum_lp_unats, 0)::BIGINT AS sum_lp_unats,
              CASE WHEN p.n_bigrams IS NOT NULL
                   THEN round((p.sum_lp_unats::DOUBLE / p.n_bigrams) / 1000000.0, 6)
              END AS avg_lp,
              CASE WHEN p.n_bigrams IS NOT NULL
                   THEN round(exp(-round((p.sum_lp_unats::DOUBLE / p.n_bigrams)
                                         / 1000000.0, 6)), 6)
              END AS ppl
       FROM base b LEFT JOIN per_doc p USING ({id_col})"""

"""IR / corpus-statistics operators: BM25 retrieval, PMI collocations,
readability scoring.

The classic text-analytics trio a web-corpus pipeline runs for search,
phrase mining, and quality signals:

- **bm25_topk** (Robertson–Spärck Jones Okapi BM25): seed-document
  retrieval — the k best corpus documents for each query's term set.
  The plan is inverted-index-shaped without materializing an index:
  one (doc, term) tf aggregation over the corpus (map-side combine),
  then a BROADCAST semi-join against the tiny query-term dimension so
  document-frequency and scoring only ever touch matching postings;
  the corpus is scanned once and never re-shuffled. Scores are summed
  as integer micro-units (each per-term contribution rounds once), so
  accumulation is order-independent and the ranking is total.

- **pmi_collocations** (Church & Hanks 1990): top bigram collocations
  by pointwise mutual information with a minimum-count gate. Two
  censuses (token, bigram — each one shuffle with partial agg), the
  corpus-total scalars ride a 1-row broadcast, and the top-k is
  ``orderBy(...).limit(k)`` = TakeOrderedAndProject (per-partition
  heaps, no global sort) on a unique (pmi_fp desc, w1, w2) order.

- **readability** (Flesch 1948 / Kincaid 1975): per-document reading
  ease and grade level from words/sentences/syllables. A pure narrow
  projection — sentence boundaries and vowel-group syllable counts are
  Column algebra over the token array (zero shuffle, no UDF), so the
  stage fuses into any downstream quality gate.

Cross-engine bit-determinism follows operators/lm.py: every float
factor is the same IEEE-double expression tree on both engines and is
rounded ONCE to integer micro-units (``round(x·1e6)`` as BIGINT)
before any sum or ranking.

Reference anchor: pliers has no retrieval/collocation surface; its
TextStim complexity metrics (pliers/extractors/text.py length/
frequency extractors) are the per-stimulus seed of the readability
signals here, recast corpus-wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T

K1 = 1.2
B = 0.75


def _tf(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term, tf) postings."""
    toks = docs.select(F.col(id_col), F.explode(T.tokenize(F.col(text_col))).alias("term"))
    return toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    q_id_col: str = "q_id",
    term_col: str = "term",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` documents per query by Okapi BM25 (k1=1.2, b=0.75).

    ``queries`` is a small (q_id, term) dimension — it is broadcast;
    the corpus side is one tf aggregation and is never re-shuffled.
    Returns (q_id, doc_id, score_fp, rank) with ``score_fp`` the BM25
    score in integer micro-units (sum of once-rounded per-term
    contributions — order-independent, total ranking).
    """
    tf = _tf(docs, text_col, id_col)
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = docs.select(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    ).crossJoin(dl.agg(F.sum("dl").cast("long").alias("sum_dl")))
    qterms = queries.select(q_id_col, F.col(term_col).alias("term")).distinct()
    # the broadcast term semi-join gates FIRST: only matching postings
    # ever join the (narrow, one-long-per-doc) dl table — the full
    # postings set is never shuffled on the doc key
    postings = tf.join(F.broadcast(qterms), "term").join(dl, id_col)
    df_ = postings.select("term", id_col).distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    scored = (
        postings.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            q_id_col,
            id_col,
            F.round(
                F.log(
                    F.lit(1.0)
                    + ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
                    / (F.col("df").cast("double") + F.lit(0.5))
                )
                * (
                    (F.col("tf").cast("double") * F.lit(K1 + 1.0))
                    / (
                        F.col("tf").cast("double")
                        + F.lit(K1)
                        * (
                            F.lit(1.0 - B)
                            + (F.lit(B) * (F.col("dl").cast("double") * F.col("n_docs").cast("double")))
                            / F.col("sum_dl").cast("double")
                        )
                    )
                )
                * F.lit(1e6),
                0,
            )
            .cast("long")
            .alias("contrib_fp"),
        )
    )
    per_q = scored.groupBy(q_id_col, id_col).agg(F.sum("contrib_fp").alias("score_fp"))
    w = Window.partitionBy(q_id_col).orderBy(F.desc("score_fp"), F.col(id_col))
    return (
        per_q.select("*", F.row_number().over(w).cast("long").alias("rank"))
        .where(F.col("rank") <= k)
    )


def bm25_topk_sql(
    table: str = "documents",
    queries_cte: str = "queries",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    tail: str | None = None,
) -> str:
    """DuckDB oracle body for :func:`bm25_topk` — expects a CTE named
    ``queries_cte`` with (q_id, term) to be prepended by the caller.
    ``tail`` (for composition, e.g. :func:`bm25_rerank_sql`) replaces
    the default final SELECT; it sees the result as a CTE ``bm25``."""
    final = tail if tail is not None else f"SELECT q_id, {id_col}, score_fp, rank FROM bm25"
    return f"""toks AS (
  SELECT {id_col}, unnest(string_split(trim({text_col}), ' ')) AS term FROM {table}),
tf AS (SELECT {id_col}, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT {id_col}, sum(tf) AS dl FROM tf GROUP BY 1),
stats AS (SELECT (SELECT count(*) FROM {table}) AS n_docs,
                 (SELECT sum(dl) FROM dl) AS sum_dl),
qt AS (SELECT DISTINCT q_id, term FROM {queries_cte}),
post AS (SELECT qt.q_id, tf.{id_col}, tf.term, tf.tf, dl.dl
         FROM tf JOIN qt USING (term) JOIN dl USING ({id_col})),
dfreq AS (SELECT term, count(DISTINCT {id_col}) AS df FROM post GROUP BY 1),
contrib AS (
  SELECT post.q_id, post.{id_col},
         CAST(round(
           ln(1.0 + (CAST(stats.n_docs - dfreq.df AS DOUBLE) + 0.5)
                    / (CAST(dfreq.df AS DOUBLE) + 0.5))
           * ((CAST(post.tf AS DOUBLE) * {K1 + 1.0})
              / (CAST(post.tf AS DOUBLE)
                 + {K1} * ({1.0 - B}
                           + ({B} * (CAST(post.dl AS DOUBLE) * CAST(stats.n_docs AS DOUBLE)))
                             / CAST(stats.sum_dl AS DOUBLE))))
           * 1000000.0) AS BIGINT) AS contrib_fp
  FROM post JOIN dfreq USING (term) CROSS JOIN stats),
per_q AS (SELECT q_id, {id_col}, sum(contrib_fp)::BIGINT AS score_fp FROM contrib GROUP BY 1, 2),
ranked AS (SELECT q_id, {id_col}, score_fp,
                  row_number() OVER (PARTITION BY q_id ORDER BY score_fp DESC, {id_col})::BIGINT AS rank
           FROM per_q),
bm25 AS (SELECT q_id, {id_col}, score_fp, rank FROM ranked WHERE rank <= {k})
{final}"""


def bm25_rerank(
    docs: DataFrame,
    queries: DataFrame,
    emb: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    q_id_col: str = "q_id",
    term_col: str = "term",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k1: int = 20,
    k: int = 5,
) -> DataFrame:
    """Two-stage hybrid retrieval: lexical BM25 recall (top ``k1``) →
    semantic cosine rerank (top ``k``) against an embedding sidecar
    table joined on document id.

    The funnel is the scale story: the corpus-sized embedding table is
    only ever touched through a BROADCAST semi-join against the tiny
    candidate set (n_queries × k1 rows), so no dense scoring pass runs
    over the full corpus — exactly how a production retrieval stack
    gates its cross-encoder stage. Cosine reuses the exact expressions
    of similarity.cosine_topk (same rounding contract as the
    ``embedding_topk`` oracle).

    Returns (q_id, doc_id, bm25_fp, cosine, rank) — ``rank`` is the
    semantic rerank order; ``bm25_fp`` rides along for score fusion
    downstream.
    """
    from .similarity import _dot, _norm

    cands = bm25_topk(
        docs, queries, text_col, id_col, q_id_col, term_col, k=k1
    ).withColumnRenamed("score_fp", "bm25_fp").drop("rank")
    cvec = emb.select(F.col(vec_id_col).alias(id_col), F.col(vec_col).alias("c_vec"))
    qvec = emb.select(F.col(vec_id_col).alias(q_id_col), F.col(vec_col).alias("q_vec"))
    cand_vecs = cvec.join(F.broadcast(cands), id_col)
    q_ids = cands.select(q_id_col).distinct()
    q_vecs = qvec.join(F.broadcast(q_ids), q_id_col)
    scored = cand_vecs.join(F.broadcast(q_vecs), q_id_col).select(
        q_id_col,
        id_col,
        "bm25_fp",
        F.round(
            _dot(F.col("c_vec"), F.col("q_vec"))
            / (_norm(F.col("c_vec")) * _norm(F.col("q_vec"))),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.select("*", F.row_number().over(w).cast("long").alias("rank"))
        .where(F.col("rank") <= k)
    )


def bm25_rerank_sql(
    table: str = "documents",
    emb_table: str = "embeddings",
    queries_cte: str = "queries",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k1: int = 20,
    k: int = 5,
) -> str:
    """DuckDB oracle body for :func:`bm25_rerank` (caller prepends the
    ``queries_cte``); cosine SQL mirrors the ``embedding_topk`` oracle."""
    dot = (
        f"list_sum(list_transform(range(1, len(c.c_emb)+1),"
        f" i -> c.c_emb[i]::DOUBLE * q.q_emb[i]::DOUBLE))"
    )
    n_c = f"sqrt(list_sum(list_transform(c.c_emb, x -> x::DOUBLE * x::DOUBLE)))"
    n_q = f"sqrt(list_sum(list_transform(q.q_emb, x -> x::DOUBLE * x::DOUBLE)))"
    tail = f""", cvec AS (
  SELECT b.q_id, b.{id_col}, b.score_fp AS bm25_fp, e.{vec_col} AS c_emb
  FROM bm25 b JOIN {emb_table} e ON e.{vec_id_col} = b.{id_col}),
qvec AS (
  SELECT {vec_id_col} AS q_id, {vec_col} AS q_emb FROM {emb_table}
  WHERE {vec_id_col} IN (SELECT DISTINCT q_id FROM bm25)),
rescored AS (
  SELECT c.q_id, c.{id_col}, c.bm25_fp,
         round({dot} / ({n_c} * {n_q}), 6) AS cosine
  FROM cvec c JOIN qvec q USING (q_id)),
reranked AS (
  SELECT q_id, {id_col}, bm25_fp, cosine,
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, {id_col})::BIGINT AS rank
  FROM rescored)
SELECT q_id, {id_col}, bm25_fp, cosine, rank FROM reranked WHERE rank <= {k}"""
    return bm25_topk_sql(table, queries_cte, "text", id_col, k=k1, tail=tail)


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-``k`` bigram collocations by PMI (integer micro-nats).

    pmi = ln( p(w1,w2) / (p(w1)·p(w2)) ) with p from corpus counts:
    ln( (c12·Ntok·Ntok) / (c1·c2·Nbg) ) — one double expression,
    rounded once. Returns (w1, w2, c12, pmi_fp) in ranked order.
    """
    toks = docs.select(F.explode(T.tokenize(F.col(text_col))).alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    arr = docs.select(T.tokenize(F.col(text_col)).alias("t"))
    pairs = arr.select(
        F.explode(
            F.zip_with(
                F.slice("t", 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice("t", 2, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bg = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    totals = uni.agg(F.sum("c").cast("long").alias("n_tok")).crossJoin(
        bg.agg(F.sum("c12").cast("long").alias("n_bg"))
    )
    # uni is vocabulary-sized — billions of rows at web scale — so the
    # count-attachment joins shuffle on the word key (AQE may still
    # broadcast small vocabularies at runtime); only the 1-row totals
    # dimension is an explicit broadcast.
    out = (
        bg.where(F.col("c12") >= min_count)
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.round(
                F.log(
                    (F.col("c12").cast("double") * F.col("n_tok").cast("double") * F.col("n_tok").cast("double"))
                    / (F.col("c1").cast("double") * F.col("c2").cast("double") * F.col("n_bg").cast("double"))
                )
                * F.lit(1e6),
                0,
            )
            .cast("long")
            .alias("pmi_fp"),
        )
    )
    return out.orderBy(F.desc("pmi_fp"), "w1", "w2").limit(k)


def pmi_collocations_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    k: int = 50,
) -> str:
    return f"""WITH toks AS (
  SELECT unnest(string_split(trim({text_col}), ' ')) AS w FROM {table}),
uni AS (SELECT w, count(*) AS c FROM toks GROUP BY 1),
base AS (SELECT string_split(trim({text_col}), ' ') AS t FROM {table}),
pairs AS (
  SELECT t[i] AS w1, t[i+1] AS w2
  FROM base, unnest(range(1, greatest(len(t), 1))) AS u(i)),
bg AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
totals AS (SELECT (SELECT sum(c) FROM uni) AS n_tok,
                  (SELECT sum(c12) FROM bg) AS n_bg)
SELECT bg.w1, bg.w2, bg.c12::BIGINT AS c12,
       CAST(round(ln((CAST(bg.c12 AS DOUBLE) * CAST(totals.n_tok AS DOUBLE) * CAST(totals.n_tok AS DOUBLE))
                     / (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE) * CAST(totals.n_bg AS DOUBLE)))
                  * 1000000.0) AS BIGINT) AS pmi_fp
FROM bg JOIN uni u1 ON u1.w = bg.w1 JOIN uni u2 ON u2.w = bg.w2
CROSS JOIN totals
WHERE bg.c12 >= {min_count}
ORDER BY pmi_fp DESC, w1, w2 LIMIT {k}"""


def readability(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    boundary_word: str = "the",
) -> DataFrame:
    """Flesch reading ease + Flesch–Kincaid grade per document, as one
    narrow projection (zero shuffle, no UDF).

    The synthetic corpus carries no punctuation, so sentence boundaries
    are first derived deterministically (a '.' after every
    ``boundary_word`` — the same device as the ``sentence_split``
    query); production web text skips that step. Syllables are
    vowel-group counts per token (min 1), summed with an array
    ``aggregate`` — per-row work, no explode. Scores are integer
    micro-units of the published formulas.
    """
    marked = F.regexp_replace(
        F.trim(F.col(text_col)), rf"\b{boundary_word}\b", f"{boundary_word}."
    )
    sents = T.split_sentences(marked)
    toks = T.tokenize(F.col(text_col))
    syl = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.greatest(F.lit(1), F.regexp_count(F.lower(t), F.lit("[aeiouy]+"))).cast("long"),
    )
    n_w = F.size(toks).cast("long")
    n_s = F.size(sents).cast("long")
    wps = n_w.cast("double") / F.nullif(n_s, F.lit(0)).cast("double")
    spw = syl.cast("double") / F.nullif(n_w, F.lit(0)).cast("double")
    flesch = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    fk = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    return docs.select(
        F.col(id_col),
        n_w.alias("n_words"),
        n_s.alias("n_sents"),
        syl.alias("n_syllables"),
        F.round(flesch * F.lit(1e6), 0).cast("long").alias("flesch_fp"),
        F.round(fk * F.lit(1e6), 0).cast("long").alias("fk_grade_fp"),
    )


def readability_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    boundary_word: str = "the",
) -> str:
    marked = (
        f"regexp_replace(trim({text_col}), '\\b{boundary_word}\\b', '{boundary_word}.', 'g')"
    )
    sents = (
        f"len(list_filter(string_split(regexp_replace({marked}, '([.!?])\\s+', "
        f"'\\1' || chr(10), 'g'), chr(10)), s -> trim(s) <> ''))"
    )
    toks = f"string_split(trim({text_col}), ' ')"
    syl = (
        f"list_sum(list_transform({toks}, "
        f"t -> greatest(1, len(regexp_extract_all(lower(t), '[aeiouy]+')))))"
    )
    return f"""WITH m AS (
  SELECT {id_col},
         len({toks})::BIGINT AS n_words,
         CAST({sents} AS BIGINT) AS n_sents,
         CAST({syl} AS BIGINT) AS n_syllables
  FROM {table})
SELECT {id_col}, n_words, n_sents, n_syllables,
       CAST(round((206.835 - 1.015 * (CAST(n_words AS DOUBLE) / CAST(nullif(n_sents, 0) AS DOUBLE))
                           - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(nullif(n_words, 0) AS DOUBLE)))
                  * 1000000.0) AS BIGINT) AS flesch_fp,
       CAST(round((0.39 * (CAST(n_words AS DOUBLE) / CAST(nullif(n_sents, 0) AS DOUBLE))
                   + 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(nullif(n_words, 0) AS DOUBLE))
                   - 15.59)
                  * 1000000.0) AS BIGINT) AS fk_grade_fp
FROM m"""


def rrf_fuse(
    docs: DataFrame,
    queries: DataFrame,
    emb: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    q_id_col: str = "q_id",
    term_col: str = "term",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k1: int = 20,
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
    of a lexical and a dense ranking — the standard hybrid-search merge
    (Elasticsearch/Vespa ship exactly this formula).

    Two independent top-``k1`` rankings per query — BM25 over the text
    corpus and cosine over the embedding sidecar (query vector = the
    seed document's own embedding) — are fused by
    ``rrf = Σ 1/(rrf_k + rank)`` over the rankings a document appears
    in, computed in integer micro-units (one rounding per ranking, so
    the fused score is an order-independent BIGINT sum and the final
    ordering is total).

    Scale shape: BM25 reuses the broadcast-gated postings plan of
    :func:`bm25_topk`; the dense side here scores the full embedding
    table against the broadcast query vectors (the exact baseline — at
    corpus scale the IVF/LSH operators in operators/similarity.py
    produce the same (q_id, id, rank) contract and swap in unchanged).
    The fusion itself joins two (n_queries × k1)-row rankings — a
    driver-free full-outer join on (q_id, id) that is trivially
    broadcastable.

    Returns (q_id, doc_id, bm25_rank, cos_rank, rrf_fp, rank).
    """
    from .similarity import _dot, _norm

    lex = (
        bm25_topk(docs, queries, text_col, id_col, q_id_col, term_col, k=k1)
        .select(q_id_col, id_col, F.col("rank").alias("bm25_rank"))
    )
    q_ids = queries.select(q_id_col).distinct()
    qvec = (
        emb.select(F.col(vec_id_col).alias(q_id_col), F.col(vec_col).alias("q_vec"))
        .join(F.broadcast(q_ids), q_id_col)
    )
    dense_scored = emb.crossJoin(F.broadcast(qvec)).select(
        q_id_col,
        F.col(vec_id_col).alias(id_col),
        F.round(
            _dot(F.col(vec_col), F.col("q_vec"))
            / (_norm(F.col(vec_col)) * _norm(F.col("q_vec"))),
            6,
        ).alias("cosine"),
    )
    w_d = Window.partitionBy(q_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    dense = (
        dense_scored.select(q_id_col, id_col, F.row_number().over(w_d).cast("long").alias("cos_rank"))
        .where(F.col("cos_rank") <= k1)
    )
    fused = lex.join(dense, [q_id_col, id_col], "full_outer").select(
        q_id_col,
        id_col,
        "bm25_rank",
        "cos_rank",
        (
            F.coalesce(
                F.round(F.lit(1e6) / (F.lit(rrf_k) + F.col("bm25_rank")), 0).cast("long"),
                F.lit(0).cast("long"),
            )
            + F.coalesce(
                F.round(F.lit(1e6) / (F.lit(rrf_k) + F.col("cos_rank")), 0).cast("long"),
                F.lit(0).cast("long"),
            )
        ).alias("rrf_fp"),
    )
    w_f = Window.partitionBy(q_id_col).orderBy(F.desc("rrf_fp"), F.col(id_col))
    return (
        fused.select("*", F.row_number().over(w_f).cast("long").alias("rank"))
        .where(F.col("rank") <= k)
    )


def rrf_fuse_sql(
    table: str = "documents",
    emb_table: str = "embeddings",
    queries_cte: str = "queries",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k1: int = 20,
    k: int = 10,
    rrf_k: int = 60,
) -> str:
    """DuckDB oracle body for :func:`rrf_fuse` (caller prepends the
    ``queries_cte``); the dense ranking mirrors the ``embedding_topk``
    oracle's rounded-cosine + id tie-break ordering."""
    dot = (
        f"list_sum(list_transform(range(1, len(e.{vec_col})+1),"
        f" i -> e.{vec_col}[i]::DOUBLE * q.q_emb[i]::DOUBLE))"
    )
    n_c = f"sqrt(list_sum(list_transform(e.{vec_col}, x -> x::DOUBLE * x::DOUBLE)))"
    n_q = f"sqrt(list_sum(list_transform(q.q_emb, x -> x::DOUBLE * x::DOUBLE)))"
    tail = f""", qvec AS (
  SELECT {vec_id_col} AS q_id, {vec_col} AS q_emb FROM {emb_table}
  WHERE {vec_id_col} IN (SELECT DISTINCT q_id FROM qt)),
dscore AS (
  SELECT q.q_id, e.{vec_id_col} AS {id_col},
         round({dot} / ({n_c} * {n_q}), 6) AS cosine
  FROM {emb_table} e CROSS JOIN qvec q),
dense AS (
  SELECT q_id, {id_col},
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, {id_col})::BIGINT AS cos_rank
  FROM dscore QUALIFY cos_rank <= {k1}),
lex AS (SELECT q_id, {id_col}, rank AS bm25_rank FROM bm25),
fused AS (
  SELECT coalesce(l.q_id, d.q_id) AS q_id,
         coalesce(l.{id_col}, d.{id_col}) AS {id_col},
         l.bm25_rank, d.cos_rank,
         (coalesce(CAST(round(1000000.0 / ({rrf_k} + l.bm25_rank), 0) AS BIGINT), 0)
          + coalesce(CAST(round(1000000.0 / ({rrf_k} + d.cos_rank), 0) AS BIGINT), 0)) AS rrf_fp
  FROM lex l FULL OUTER JOIN dense d
    ON l.q_id = d.q_id AND l.{id_col} = d.{id_col})
SELECT q_id, {id_col}, bm25_rank, cos_rank, rrf_fp,
       row_number() OVER (PARTITION BY q_id ORDER BY rrf_fp DESC, {id_col})::BIGINT AS rank
FROM fused QUALIFY rank <= {k}"""
    return bm25_topk_sql(table, queries_cte, "text", id_col, k=k1, tail=tail)

"""Corpus-curation operators: benchmark decontamination and
quality-weighted (importance) sampling.

These extend the LLM-training-data family (dedup, quality scoring,
boilerplate removal, PII scrub) with the two passes every production
pre-training pipeline runs between cleaning and tokenization:

- **Decontamination** — remove/flag training documents that share long
  word n-grams with an evaluation benchmark so test answers don't leak
  into the training set (the published n-gram-overlap protocol used by
  GPT-2/GPT-3 and The Pile; 13-gram overlap in the papers, configurable
  here). The eval side is SMALL by construction (benchmarks are a few
  MB even when the corpus is 100 TB), so the eval n-gram set is a
  broadcast dimension — the 100 TB training scan stays a narrow map +
  broadcast-hash-join with no shuffle of the big side.

- **Quality-weighted sampling** — instead of a hard quality threshold
  (``quality_filter``), resample with a keep-rate that rises with the
  document's quality bucket and carry ``1/rate`` importance weights
  (the DCLM / FineWeb-style soft curation). The keep decision is a
  deterministic content hash, NOT ``rand()``: reproducible across
  retries/executors, and duplicate texts make identical decisions so a
  resampled corpus can't leak near-dups across train/val splits.

Reference anchor: pliers has no corpus-curation surface (its filters
are per-stimulus, pliers/filters/text.py); these operators are the
engine-level counterpart required by the 100 TB training-data goal.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.hashing import md5_int, md5_int_sql
from ..functions.hashing import shingles as _shingles


def decontaminate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    eval_mod: int = 97,
) -> DataFrame:
    """Flag training docs sharing any word ``n``-gram with the eval set.

    The eval set is carved deterministically (``id % eval_mod == 0``) so
    tests need no external benchmark data; in production the eval side
    is the benchmark table. Plan shape: both sides shingle per-row with
    zero shuffle (``zip_with`` concats, no explode until after
    ``array_distinct``), the eval n-gram set is broadcast, and the
    training side aggregates matched-distinct-shingle counts with
    map-side partial aggregation. Exact string keys (collision-free);
    at 100 TB swap the key to a 128-bit hash to shrink the broadcast.

    Returns one row per NON-eval doc: ``(id, n_overlap, contaminated)``.
    """
    sh = docs.select(
        id_col,
        F.array_distinct(_shingles(T.tokenize(F.col(text_col)), n)).alias("sh"),
    )
    is_eval = F.col(id_col) % eval_mod == 0
    eval_sh = (
        sh.where(is_eval)
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    train = sh.where(~is_eval)
    hits = (
        train.select(id_col, F.explode("sh").alias("s"))
        .join(F.broadcast(eval_sh), "s")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    eval_mod: int = 97,
) -> str:
    """DuckDB oracle for :func:`decontaminate` (same shingle windows,
    same distinct-count semantics)."""
    gram = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    return f"""WITH base AS (
         SELECT {id_col}, string_split(trim({text_col}), ' ') AS toks FROM {table}),
       sh_t AS (
         SELECT {id_col},
                list_distinct(list_transform(
                    range(1, greatest(len(toks) - {n - 2}, 1)), i -> {gram})) AS sh
         FROM base),
       ev AS (SELECT DISTINCT unnest(sh) AS s FROM sh_t WHERE {id_col} % {eval_mod} = 0),
       tr AS (SELECT {id_col}, unnest(sh) AS s FROM sh_t WHERE {id_col} % {eval_mod} <> 0),
       ov AS (SELECT {id_col}, count(*) AS n_overlap FROM tr JOIN ev USING (s) GROUP BY {id_col})
       SELECT b.{id_col},
              coalesce(o.n_overlap, 0)::BIGINT AS n_overlap,
              coalesce(o.n_overlap, 0) > 0 AS contaminated
       FROM base b LEFT JOIN ov o USING ({id_col})
       WHERE b.{id_col} % {eval_mod} <> 0"""


def quality_weighted_sample(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 5,
    seed: int = 11,
) -> DataFrame:
    """Importance-resample by quality bucket: bucket ``b`` keeps a
    ``(b+1)/n_buckets`` fraction, decided by a deterministic content
    hash, and kept rows carry ``sample_weight = 1/rate`` so downstream
    aggregates stay unbiased. Narrow map + filter — no shuffle, no
    ``rand()`` (retry-stable, and identical texts sample identically so
    resampling cannot split a duplicate pair across train/val)."""
    q = T.quality_score(text_col)
    bucket = F.least(F.floor(q * n_buckets).cast("long"), F.lit(n_buckets - 1))
    ticket = F.pmod(md5_int(F.col(text_col), seed=seed), F.lit(1_000_000))
    rate = (bucket + 1).cast("double") / n_buckets
    return (
        docs.select(
            F.col(id_col),
            bucket.alias("quality_bucket"),
            ticket.alias("_ticket"),
            rate.alias("_rate"),
        )
        .where(F.col("_ticket") < F.col("_rate") * 1_000_000)
        .select(
            id_col,
            "quality_bucket",
            F.round(F.lit(1.0) / F.col("_rate"), 6).alias("sample_weight"),
        )
    )


def quality_weighted_sample_sql(
    quality_query: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 5,
    seed: int = 11,
) -> str:
    """DuckDB oracle for :func:`quality_weighted_sample`.

    ``quality_query`` is the SAME SQL the ``quality_score`` oracle runs
    (returns ``(id, quality)`` — single source of truth for the score;
    the two oracles cannot drift)."""
    return f"""WITH qsrc AS ({quality_query}),
       b AS (
         SELECT d.{id_col}, d.{text_col},
                least(floor(q.quality * {n_buckets})::BIGINT, {n_buckets - 1}) AS quality_bucket
         FROM {table} d JOIN qsrc q USING ({id_col}))
       SELECT {id_col}, quality_bucket,
              round(1.0 / ((quality_bucket + 1)::DOUBLE / {n_buckets}), 6) AS sample_weight
       FROM b
       WHERE {md5_int_sql(text_col, seed=seed)} % 1000000
             < ((quality_bucket + 1)::DOUBLE / {n_buckets}) * 1000000"""


def mixture_sample(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 23,
) -> DataFrame:
    """Balance the corpus mixture across ``group_col`` (equalize to the
    smallest group — the uniform-mixture special case of data-mixture
    reweighting). Keep decisions are PURE INTEGER comparisons
    (``ticket·|group| < |min|·10^6``), so the oracle is bit-trivial and
    no float rate ever rounds a boundary differently across engines.
    Plan: one group-count agg (map-side partial), the per-group rates
    broadcast back, then a narrow filter — the corpus scan shuffles
    nothing."""
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("grp_n"))
    min_n = counts.agg(F.min("grp_n").alias("min_n"))
    rates = counts.crossJoin(F.broadcast(min_n))
    ticket = F.pmod(md5_int(F.col(text_col), seed=seed), F.lit(1_000_000))
    return (
        docs.join(F.broadcast(rates), group_col)
        .where(ticket * F.col("grp_n") < F.col("min_n") * 1_000_000)
        .select(
            id_col,
            group_col,
            F.round(F.col("grp_n").cast("double") / F.col("min_n"), 6).alias("sample_weight"),
        )
    )


def mixture_sample_sql(
    table: str = "documents",
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 23,
) -> str:
    """DuckDB oracle for :func:`mixture_sample` (same integer keep rule)."""
    return f"""WITH counts AS (
         SELECT {group_col}, count(*)::BIGINT AS grp_n FROM {table} GROUP BY {group_col}),
       m AS (SELECT min(grp_n) AS min_n FROM counts)
       SELECT d.{id_col}, d.{group_col},
              round(c.grp_n::DOUBLE / m.min_n, 6) AS sample_weight
       FROM {table} d JOIN counts c USING ({group_col}) CROSS JOIN m
       WHERE ({md5_int_sql(text_col, seed=seed)} % 1000000) * c.grp_n
             < m.min_n * 1000000"""


def temperature_sample(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 29,
) -> DataFrame:
    """Temperature-based mixture sampling at α = 1/2 (the multilingual
    sampling rule of Conneau et al. 2020 / Xue et al. 2021: sample
    group ``s`` proportional to ``n_s^α``, flattening the head without
    equalizing — :func:`mixture_sample` is the α→0 corner, pass-through
    is α=1). Pure downsampling calibration: the largest keep
    probability is 1, so ``p_keep(s) = sqrt(n_min / n_s)`` and the
    output mixture follows ``sqrt(n_s)`` exactly in expectation.

    The keep decision never touches a float: ``ticket < SCALE·sqrt(
    n_min/n_s)`` is squared into ``ticket²·n_s < SCALE²·n_min`` and
    evaluated in DECIMAL(38,0) (DuckDB HUGEINT) — exact at any corpus
    size, same boundary on every engine. Plan: one map-side group
    census, rates broadcast back, narrow filter; the corpus scan
    shuffles nothing."""
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("grp_n"))
    min_n = counts.agg(F.min("grp_n").alias("min_n"))
    rates = counts.crossJoin(F.broadcast(min_n))
    scale = 1_000_000
    ticket = F.pmod(md5_int(F.col(text_col), seed=seed), F.lit(scale))
    dec = "decimal(38,0)"
    keep = (ticket.cast(dec) * ticket.cast(dec)) * F.col("grp_n").cast(dec) < (
        F.lit(scale).cast(dec) * F.lit(scale).cast(dec) * F.col("min_n").cast(dec)
    )
    return (
        docs.join(F.broadcast(rates), group_col)
        .where(keep)
        .select(
            id_col,
            group_col,
            F.round(F.sqrt(F.col("min_n").cast("double") / F.col("grp_n")), 6).alias(
                "keep_prob"
            ),
        )
    )


def temperature_sample_sql(
    table: str = "documents",
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 29,
) -> str:
    """DuckDB oracle for :func:`temperature_sample` (same squared
    integer keep rule in HUGEINT)."""
    return f"""WITH counts AS (
         SELECT {group_col}, count(*)::BIGINT AS grp_n FROM {table} GROUP BY {group_col}),
       m AS (SELECT min(grp_n) AS min_n FROM counts)
       SELECT d.{id_col}, d.{group_col},
              round(sqrt(m.min_n::DOUBLE / c.grp_n), 6) AS keep_prob
       FROM {table} d JOIN counts c USING ({group_col}) CROSS JOIN m
       WHERE (({md5_int_sql(text_col, seed=seed)} % 1000000)::HUGEINT
              * ({md5_int_sql(text_col, seed=seed)} % 1000000)::HUGEINT)
             * c.grp_n::HUGEINT
             < 1000000::HUGEINT * 1000000::HUGEINT * m.min_n::HUGEINT"""


def source_kl(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source KL divergence of the unigram distribution from the
    corpus distribution — the mixture diagnostic behind data-mixture
    reweighting (a source with high KL is lexically atypical; one near
    zero is redundant with the blend).

    KL(p_s ‖ p_c) = Σ_w p_s(w)·ln(p_s(w)/p_c(w)) with p_s = c_sw/N_s,
    p_c = c_w/N — all counts exact int64. Each log-ratio is rounded to
    integer micro-nats and weighted by the integer count, so the only
    float steps are one ln and two IEEE divisions per term, identical
    on both engines (same trick as the bigram LM, operators/lm.py).
    (c_sw·t fits int64 up to ~3·10^11 tokens per (source, word) cell —
    beyond any real corpus's single-word count.)

    Plan shape: one (source, word) census shuffle with map-side combine
    — the corpus is touched once; everything after runs on the census,
    which is checkpointed because FOUR branches consume it (corpus-word
    totals, per-source totals, the grand total, and the term join).
    Census-vs-census joins stay plain shuffle joins so AQE can pick
    broadcast when the vocab is small without forcing it at crawl
    scale.

    Returns ``(group, n_tokens, kl)`` — one row per source.
    """
    csw = (
        docs.select(group_col, F.explode(T.tokenize(F.col(text_col))).alias("w"))
        .groupBy(group_col, "w")
        .agg(F.count(F.lit(1)).alias("c_sw"))
        .stableCheckpoint(eager=True)
    )
    cw = csw.groupBy("w").agg(F.sum("c_sw").alias("c_w"))
    ns = csw.groupBy(group_col).agg(F.sum("c_sw").alias("n_s"))
    n = ns.agg(F.sum("n_s").alias("n"))

    ratio = (F.col("c_sw").cast("double") * F.col("n").cast("double")) / (
        F.col("n_s").cast("double") * F.col("c_w").cast("double")
    )
    t = F.round(F.log(ratio) * 1e6, 0).cast("long")
    return (
        csw.join(cw, "w")
        .join(F.broadcast(ns), group_col)
        .crossJoin(F.broadcast(n))
        .select(group_col, "n_s", (F.col("c_sw") * t).alias("term_unats"))
        .groupBy(group_col)
        .agg(
            F.first("n_s").alias("n_tokens"),
            F.round(
                (F.sum("term_unats").cast("double") / F.first("n_s")) / F.lit(1000000.0), 6
            ).alias("kl"),
        )
    )


def source_kl_sql(
    table: str = "documents",
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`source_kl` (same micro-nat rounding,
    same multiplication/division order)."""
    return f"""WITH toks AS (
         SELECT {group_col}, unnest(string_split(trim({text_col}), ' ')) AS w
         FROM {table}),
       csw AS (
         SELECT {group_col}, w, count(*)::BIGINT AS c_sw
         FROM toks GROUP BY {group_col}, w),
       cw AS (SELECT w, sum(c_sw)::BIGINT AS c_w FROM csw GROUP BY w),
       ns AS (SELECT {group_col}, sum(c_sw)::BIGINT AS n_s FROM csw GROUP BY {group_col}),
       nn AS (SELECT sum(n_s)::BIGINT AS n FROM ns),
       terms AS (
         SELECT c.{group_col}, s.n_s,
                c.c_sw * CAST(round(ln((c.c_sw::DOUBLE * nn.n::DOUBLE)
                                       / (s.n_s::DOUBLE * w.c_w::DOUBLE)) * 1e6)
                              AS BIGINT) AS term_unats
         FROM csw c JOIN cw w USING (w) JOIN ns s USING ({group_col}) CROSS JOIN nn)
       SELECT {group_col}, any_value(n_s)::BIGINT AS n_tokens,
              round((sum(term_unats)::DOUBLE / any_value(n_s)) / 1000000.0, 6) AS kl
       FROM terms GROUP BY {group_col}"""


def normalize_text(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Unicode + whitespace normalization — the first pass of every
    crawl-curation pipeline: NFC-compose the text (so equal-looking
    strings hash equal for the dedup stages downstream), strip control
    characters (keeping \\n and \\t), collapse horizontal-whitespace
    runs, and trim.

    NFC runs in an Arrow-batched pandas UDF (Python ``unicodedata`` —
    the same Unicode tables DuckDB's ``nfc_normalize`` implements, so
    the oracle is exact); the regex cleanup stays JVM-side codegen.
    Narrow map, zero shuffle.

    Returns ``(id, norm_text, changed)``.
    """
    @F.pandas_udf("string")
    def _nfc(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import unicodedata

        for s in batches:
            yield s.map(
                lambda t: unicodedata.normalize("NFC", t) if t is not None else None
            )

    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(_nfc(F.col(text_col)), r"[\x00-\x08\x0b-\x1f\x7f]", ""),
            r"[ \t]+",
            " ",
        )
    )
    return docs.select(
        id_col,
        norm.alias("norm_text"),
        (norm != F.col(text_col)).alias("changed"),
    )


def normalize_text_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle for :func:`normalize_text` (same NFC tables, same
    regex cascade)."""
    norm = (
        f"trim(regexp_replace(regexp_replace(nfc_normalize({text_col}), "
        f"'[\\x00-\\x08\\x0b-\\x1f\\x7f]', '', 'g'), '[ \\t]+', ' ', 'g'))"
    )
    return f"""SELECT {id_col}, {norm} AS norm_text,
              ({norm} <> {text_col}) AS changed
       FROM {table}"""


# ---------------------------------------------------------------------------
# DSIR — data selection via importance resampling (Xie et al. 2023)


def dsir_weights(
    docs: DataFrame,
    target_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """DSIR importance weights over hashed word-bigram features.

    The published estimator: featurize every document into a bag of
    hashed n-grams, fit two add-one-smoothed unigram bag models — one
    on the TARGET distribution (rows where ``target_pred`` holds, e.g.
    a trusted high-quality subset) and one on the RAW corpus — and
    weight each document by its log likelihood ratio

        log w(x) = Σ_b k_b(x) · [ln p_target(b) − ln p_raw(b)]

    The two models are fit on DISJOINT rows — target = rows where
    ``target_pred`` holds, raw = the remaining pool (the candidates
    being selected from, mirroring the paper's separate target dataset
    vs raw pool); weights are emitted for every row either way.

    Resampling then keeps documents ∝ exp(log w): raw text that looks
    like the target domain is up-weighted. Here the weight (and the
    feature count) is emitted per doc; the sampling step composes with
    the engine's hash-lottery (`quality_weighted_sample`).

    Cross-engine bit-determinism: each bucket's two log-probs are
    rounded to integer micro-nats (round(ln(p)·1e6) BIGINT — the
    bigram-LM convention, operators/lm.py) BEFORE the per-doc sum, so
    ``logw_unats`` is an exact integer accumulation in any order.

    Scale shape: one explode → (doc, bucket) count (map-side partial
    agg); the bucket model is a bounded dimension (≤ n_buckets rows)
    aggregated once and broadcast back onto per-doc features; the
    scalar totals ride along via a 1-row cross join (broadcast). No
    UDF, no driver state, one shuffle per aggregation keyed on doc.

    ``target_pred``: a Column boolean over ``docs`` marking target rows.
    """
    toks = T.tokenize(F.col(text_col))
    feats = (
        docs.select(
            F.col(id_col),
            # NULL predicate (e.g. `lang = 'en'` on a NULL lang) means
            # "not target" → raw pool, matching the oracle's CASE
            # (which routes non-TRUE rows to r_cnt). Without the
            # coalesce, ~NULL is NULL and those rows vanish from BOTH
            # models, silently skewing r_tot.
            F.coalesce(target_pred, F.lit(False)).alias("_t"),
            F.explode(_shingles(toks, 2)).alias("_g"),
        )
        .select(
            F.col(id_col),
            F.col("_t"),
            F.pmod(md5_int(F.col("_g")), F.lit(n_buckets)).alias("b"),
        )
    )
    # per_doc_b feeds BOTH the bucket model and the final scoring pass;
    # bucket_dim feeds both lr and the scalar totals. Without a
    # materialized cut Spark re-runs the explode → md5 → groupBy scan
    # (the expensive part) three times. Checkpoint the smallest cuts:
    # per_doc_b is one row per (doc, bucket) — far smaller than the
    # exploded grams — and bucket_dim is <= n_buckets rows.
    per_doc_b = feats.groupBy(id_col, "_t", "b").agg(
        F.count(F.lit(1)).alias("k")
    ).stableCheckpoint(eager=True)
    bucket_dim = per_doc_b.groupBy("b").agg(
        F.sum(F.when(~F.col("_t"), F.col("k")).otherwise(0)).alias("r_cnt"),
        F.sum(F.when(F.col("_t"), F.col("k")).otherwise(0)).alias("t_cnt"),
    ).stableCheckpoint(eager=True)
    totals = bucket_dim.agg(
        F.sum("r_cnt").alias("r_tot"), F.sum("t_cnt").alias("t_tot")
    )
    nb = F.lit(n_buckets)
    lr = bucket_dim.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.round(F.log((F.col("t_cnt") + 1) / (F.col("t_tot") + nb)) * 1e6, 0).cast("long")
            - F.round(F.log((F.col("r_cnt") + 1) / (F.col("r_tot") + nb)) * 1e6, 0).cast("long")
        ).alias("lr_unats"),
    )
    scored = per_doc_b.join(F.broadcast(lr), "b").groupBy(id_col).agg(
        F.sum("k").cast("long").alias("n_feats"),
        F.sum(F.col("k") * F.col("lr_unats")).cast("long").alias("logw_unats"),
    )
    spine = docs.select(id_col)
    return spine.join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce("logw_unats", F.lit(0)).cast("long").alias("logw_unats"),
    )


def dsir_weights_sql(
    target_pred_sql: str,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> str:
    """DuckDB oracle for :func:`dsir_weights` — same hash, same add-one
    smoothing, same micro-nat rounding, same division order."""
    g_hash = md5_int_sql("g")
    return f"""WITH base AS (
  SELECT {id_col}, coalesce(({target_pred_sql}), false) AS is_t,
         string_split(trim({text_col}), ' ') AS w
  FROM {table}),
grams AS (
  SELECT {id_col}, is_t,
         unnest(list_transform(range(1, greatest(len(w), 1)),
                               i -> w[i] || ' ' || w[i+1])) AS g
  FROM base),
feats AS (
  SELECT {id_col}, is_t, CAST({g_hash} % {n_buckets} AS BIGINT) AS b
  FROM grams WHERE g IS NOT NULL),
pdb AS (
  SELECT {id_col}, is_t, b, count(*)::BIGINT AS k FROM feats GROUP BY 1, 2, 3),
dim AS (
  SELECT b, sum(CASE WHEN is_t THEN 0 ELSE k END)::BIGINT AS r_cnt,
         sum(CASE WHEN is_t THEN k ELSE 0 END)::BIGINT AS t_cnt
  FROM pdb GROUP BY b),
tot AS (SELECT sum(r_cnt)::BIGINT AS r_tot, sum(t_cnt)::BIGINT AS t_tot FROM dim),
lr AS (
  SELECT b,
         CAST(round(ln((t_cnt + 1)::DOUBLE / (t_tot + {n_buckets})::DOUBLE) * 1e6) AS BIGINT)
         - CAST(round(ln((r_cnt + 1)::DOUBLE / (r_tot + {n_buckets})::DOUBLE) * 1e6) AS BIGINT)
           AS lr_unats
  FROM dim CROSS JOIN tot),
scored AS (
  SELECT {id_col}, sum(k)::BIGINT AS n_feats,
         sum(k * lr_unats)::BIGINT AS logw_unats
  FROM pdb JOIN lr USING (b) GROUP BY {id_col})
SELECT b.{id_col},
       coalesce(s.n_feats, 0)::BIGINT AS n_feats,
       coalesce(s.logw_unats, 0)::BIGINT AS logw_unats
FROM base b LEFT JOIN scored s USING ({id_col})"""


def decontaminate_fuzzy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_mod: int = 97,
    min_shared_fps: int = 2,
) -> DataFrame:
    """FUZZY benchmark decontamination: flag training docs sharing
    winnowing fingerprints with the eval set — the robust sibling of
    the exact-n-gram :func:`decontaminate`. Winnowing's guarantee
    (any sufficiently long shared substring yields a shared selected
    fingerprint) survives small edits and repositioning that break
    exact n-gram matching, which is how lightly-paraphrased eval
    content actually leaks into training corpora.

    Same split convention as :func:`decontaminate` (id % eval_mod == 0
    carves a deterministic eval side for tests; in production the eval
    side is the benchmark table), same plan shape: fingerprints once
    per doc (windowed min over the exploded grams — one per-doc
    shuffle), DISTINCT eval fingerprint set broadcast, train side
    aggregates shared-distinct-fp counts with map-side partial agg.

    Returns one row per NON-eval doc:
    (id, n_shared_fps, fuzzy_contaminated).
    """
    from .dedup import winnowing_fingerprints

    fps = winnowing_fingerprints(docs, text_col, id_col)
    is_eval = F.col(id_col) % eval_mod == 0
    eval_fps = fps.where(is_eval).select("fp").distinct()
    train_fps = fps.where(~is_eval)
    hits = (
        train_fps.join(F.broadcast(eval_fps), "fp")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
    )
    spine = docs.where(~is_eval).select(id_col)
    return spine.join(hits, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_shared_fps", F.lit(0)).cast("long").alias("n_shared_fps"),
        (F.coalesce("n_shared_fps", F.lit(0)) >= min_shared_fps).alias(
            "fuzzy_contaminated"
        ),
    )


def decontaminate_fuzzy_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_mod: int = 97,
    min_shared_fps: int = 2,
) -> str:
    """DuckDB oracle for :func:`decontaminate_fuzzy`."""
    from .dedup import winnowing_fingerprints_sql

    return f"""WITH fps AS ({winnowing_fingerprints_sql(table, text_col, id_col)}),
eval_fps AS (
  SELECT DISTINCT fp FROM fps WHERE {id_col} % {eval_mod} = 0),
hits AS (
  SELECT f.{id_col}, count(*)::BIGINT AS n_shared_fps
  FROM fps f JOIN eval_fps USING (fp)
  WHERE f.{id_col} % {eval_mod} <> 0
  GROUP BY 1)
SELECT d.{id_col},
       coalesce(h.n_shared_fps, 0)::BIGINT AS n_shared_fps,
       (coalesce(h.n_shared_fps, 0) >= {min_shared_fps}) AS fuzzy_contaminated
FROM (SELECT {id_col} FROM {table} WHERE {id_col} % {eval_mod} <> 0) d
LEFT JOIN hits h USING ({id_col})"""

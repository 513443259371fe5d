"""Deduplication operators for web-scale training-data pipelines.

Exact dedup, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
near-dup — all built on the deterministic cross-engine hashes in
``functions/hashing.py`` so each has a DuckDB oracle.

Scale notes (100 TB design):
- exact dedup is a single hash-groupBy (map-side partial agg);
- MinHash signatures hash each shingle ONCE and derive the K families
  by Carter–Wegman arithmetic inside whole-stage codegen (explode +
  partial-agg mins — the shuffle carries one row per doc); the
  LSH banding explodes to (doc, band_key) — ``num_bands`` rows per doc —
  then one groupBy-join on band buckets; candidate verification is a
  narrow self-join restricted to bucket-mates, never all-pairs;
- n-gram Jaccard all-pairs is intentionally bucket-gated: the exposed
  ``ngram_jaccard_pairs`` computes pairs via an inverted token index
  (explode + equi-join on token + group count) — |pairs sharing ≥1
  token|, not |docs|², and degenerates gracefully under Zipf skew by
  optionally dropping ultra-common tokens (document-frequency cap).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.hashing import band_key, md5_int, shingles


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one representative row id per exact text (minimum id — the
    deterministic 'keep first' of the reference's batch dedup,
    ``pliers/transformers/base.py:241-247``). Returns
    (text_hash, keep_id, n_dups)."""
    return (
        df.select(md5_int(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    shingle_n: int = 3,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document MinHash signature columns ``mh_0..mh_{K-1}`` over
    word-``shingle_n``-gram shingles.

    Shape: explode shingles → ONE md5 per shingle (30-bit base hash, a
    real column so it is computed exactly once) → K Carter–Wegman
    permutations as plain arithmetic projections (whole-stage codegen)
    → groupBy(id) with K ``min`` aggregates. Map-side partial agg
    collapses each doc to one row before the shuffle, so the exchange
    carries K longs per document. The old formulation (K interpreted
    ``transform`` passes, each re-hashing every shingle with a seeded
    md5) did 16× the hash work inside interpreted HOF lambdas.
    ``explode_outer`` keeps empty-shingle docs as all-NULL signatures
    (min over an all-NULL group is NULL). ``extra_cols`` (id-functional
    attributes, e.g. a delta/partition flag) ride along as extra
    grouping keys — partial agg is unaffected since they don't widen
    the key space."""
    from ..functions.hashing import MINHASH_MASK30, minhash_params, minhash_permute

    extras = list(extra_cols or [])
    toks = T.tokenize(F.col(text_col))
    sh = shingles(toks, shingle_n)
    exploded = df.select(F.col(id_col), *extras, F.explode_outer(sh).alias("_s"))
    hashed = exploded.withColumn("_h30", md5_int(F.col("_s")).bitwiseAND(F.lit(MINHASH_MASK30)))
    params = minhash_params(num_hashes)
    return hashed.groupBy(id_col, *extras).agg(
        *[
            F.min(minhash_permute(F.col("_h30"), a, b)).alias(f"mh_{k}")
            for k, (a, b) in enumerate(params)
        ]
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing at least one LSH band.

    signature (map) → explode to (id, band_key) → bucket-size census →
    drop degenerate buckets (> ``max_bucket`` members) → groupBy band
    bucket collecting the sorted id set → upper-triangle pair expansion
    inside each bucket → distinct.

    Why not a self-equi-join on band_key: without an explicit persist,
    both join branches re-run the whole shingling + K-hash signature
    scan (the expensive part), and the shuffle carries every banded row
    twice. This shape computes signatures ONCE and shuffles only tiny
    (band_key, id) rows; pair expansion is map-side array algebra over
    each bucket.

    ``max_bucket`` bounds task memory: a degenerate band key (empty
    shingles, boilerplate pages) would otherwise ``collect_set`` every
    matching doc into one array on one task — and a bucket of size B
    emits B² pairs, which is never what a dedup pipeline wants from an
    "everything matches" band (those docs are caught by exact dedup /
    stop-shingle logic instead). The census is an algebraic count
    (map-side partial agg — safe under the very skew it defends
    against); dropped bands are counted and logged, never silently
    truncated. Pass ``max_bucket=None`` to disable.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    if max_bucket is not None:
        # the census and the final pass both consume the signatures;
        # without a materialization each would re-run the expensive part
        # (tokenize → shingle → hash) from scratch. Checkpoint SIGS —
        # one row per doc, K longs, the smallest possible cut of this
        # DAG (banded rows are `bands`× bigger, the text far bigger) —
        # so both consumers re-derive band keys with cheap arithmetic
        # over the materialized rows. (Measured alternatives at sf0.1:
        # census-only checkpoint = 2 full signature scans; persisting
        # the banded rows = columnar-cache build cost + broken
        # whole-stage pipelines; both bench slower.)
        sigs = sigs.stableCheckpoint(eager=True)
    sig_cols = [F.col(f"mh_{k}") for k in range(num_hashes)]
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(*[band_key(sig_cols, b, rows_per_band) for b in range(bands)])
        ).alias("band_key"),
    ).where(F.col("band_key").isNotNull())
    if max_bucket is not None:
        # census once, keep only the DROPPED keys — bounded by
        # construction (degenerate boilerplate bands are rare at any
        # scale, that's why they're degenerate), so the cap costs the
        # big side a broadcast anti-join instead of a shuffle join
        # against the (huge) kept-key set.
        dropped = (
            banded.groupBy("band_key")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > max_bucket)
            .select("band_key")
            .stableCheckpoint(eager=True)
        )
        n_dropped = dropped.count()  # cheap: counts the checkpointed rows
        if n_dropped:
            import logging

            logging.getLogger(__name__).warning(
                "minhash_lsh_candidates: dropped %d degenerate band bucket(s) "
                "with > %d members (bounded-task-memory cap; see docstring)",
                n_dropped,
                max_bucket,
            )
            banded = banded.join(F.broadcast(dropped), "band_key", "left_anti")
    buckets = (
        banded.groupBy("band_key")
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
        .where(F.size("ids") > 1)
    )
    ids = F.col("ids")
    pair_arr = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.size(ids)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def simhash_fingerprints(df: DataFrame, text_col: str, id_col: str, bits: int = 32) -> DataFrame:
    """Per-document SimHash fingerprint (per-bit majority vote of token
    hashes): bit_b = 1 iff Σ_tokens (+1 if hash(token) bit b set else -1) > 0.

    Shape: explode → hash each token ONCE → groupBy(doc) with ``bits``
    conditional sums → recombine. Everything is built-in expressions
    inside whole-stage codegen, and the vote sums partial-aggregate
    map-side, so the shuffle carries one pre-collapsed row per (doc,
    mapper). The previous formulation — one interpreted ``F.aggregate``
    pass PER BIT, each re-hashing every token — was the slowest bench
    query (32 boxed expression-tree walks per row); this shape benches
    ~5x faster and is the plan you'd want at 10^12 rows. Docs with no
    tokens keep a row (simhash 0) via explode_outer.
    """
    toks = df.select(
        F.col(id_col), F.explode_outer(T.tokenize(F.col(text_col))).alias("_t")
    )
    # project the hash once per token row; the 32 vote expressions below
    # then reference the materialized column, not 32 fresh md5 calls
    hashed = toks.select(F.col(id_col), md5_int(F.col("_t")).alias("_h"))
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_v{b}")
            for b in range(bits)
        ]
    )
    sim = F.lit(0).cast("long")
    for b in range(bits):
        sim = sim + F.when(F.col(f"_v{b}") > 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return votes.select(F.col(id_col), sim.alias("simhash"))


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold_num: int = 3,
    threshold_den: int = 5,
) -> DataFrame:
    """EXACT token-set Jaccard self-join via positional prefix filtering
    (Chaudhuri et al. ICDE'06; Xiao et al. WWW'08 PPJoin candidate rule).

    The exact complement to MinHash-LSH: no false negatives, no banding
    probability — and still never |docs|². For threshold t = num/den and
    a global token order (rarest first: ascending document frequency,
    token as tie-break), two sets with J ≥ t MUST share a token within
    each one's first ``L - ceil(t·L) + 1`` tokens, so candidate
    generation explodes ONLY those prefix tokens — rare tokens, tiny
    inverted-index buckets even under Zipf skew (the common tokens that
    blow up a full inverted-index join never enter the index). A length
    filter (``den·Lmin ≥ num·Lmax``) prunes candidates before
    verification; verification counts the exact intersection for the
    surviving pairs only.

    The correctness theorem holds for ANY global total order, so the
    DuckDB oracle can be the brute-force all-pairs Jaccard — set
    equality between the two is exactly the prefix-filter guarantee.

    Threshold is integer num/den; the final gate cross-multiplies
    (``den·inter ≥ num·union``) so no float enters the decision.
    Returns (id_a, id_b, inter_size, union_size, jaccard).

    Scale shape: one token-DF census (map-side partial agg), one
    shuffle to rank tokens within docs, prefix explode (O(L·(1-t))
    rows per doc), equi-join on rare tokens. Verification joins the
    candidate pairs back to ONE compact token-array row per doc and
    counts the intersection with ``array_intersect`` inside codegen —
    one row per candidate pair, never a per-token fan-out (a corpus
    whose vocabulary is small relative to |docs| makes candidates
    near-quadratic, and an explode-based verification join then
    multiplies that by tokens-per-doc; the array form keeps it linear
    in |candidates|). No UDFs, no collects.
    """
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(T.tokenize(F.col(text_col))).alias("toks"),
    ).withColumn("set_size", F.size("toks"))
    toks = base.select("_id", F.explode("toks").alias("tok"))
    # Global order key: document frequency asc, token asc (deterministic).
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_df"))
    ranked = (
        toks.join(dfreq, "tok")
        .withColumn(
            "pos",
            F.row_number().over(Window.partitionBy("_id").orderBy("_df", "tok")),
        )
        .withColumn("set_size", F.count(F.lit(1)).over(Window.partitionBy("_id")))
    )
    # prefix length p = L - ceil(t*L) + 1 ; ceil(num*L/den) = floor((num*L + den - 1)/den)
    ceil_tl = F.floor(
        (F.lit(threshold_num) * F.col("set_size") + F.lit(threshold_den - 1))
        / F.lit(threshold_den)
    )
    # Pin the self-join's partitioning: the candidate join's OUTPUT can
    # be orders of magnitude larger than its input (boilerplate-heavy
    # corpora), and AQE sizes post-shuffle partitions from the INPUT —
    # left alone it coalesces the pair expansion into one task. An
    # explicit repartition-by-key with a fixed count is exempt from AQE
    # coalescing, so the expansion stays spread across the cluster.
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    prefix = (
        ranked.where(F.col("pos") <= F.col("set_size") - ceil_tl + 1)
        .select("_id", "tok", "set_size")
        .repartition(n_part, "tok")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cands = (
        a.join(b, on="tok")
        .where(F.col("a._id") < F.col("b._id"))
        # length filter: J >= t requires den*Lmin >= num*Lmax
        .where(
            F.lit(threshold_den) * F.least("a.set_size", "b.set_size")
            >= F.lit(threshold_num) * F.greatest("a.set_size", "b.set_size")
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a.set_size").alias("size_a"),
            F.col("b.set_size").alias("size_b"),
        )
        .distinct()
    )
    ta = base.select(F.col("_id").alias("id_a"), F.col("toks").alias("_toks_a"))
    tb = base.select(F.col("_id").alias("id_b"), F.col("toks").alias("_toks_b"))
    inter = (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .withColumn("inter_size", F.size(F.array_intersect("_toks_a", "_toks_b")))
        .drop("_toks_a", "_toks_b")
    )
    union = F.col("size_a") + F.col("size_b") - F.col("inter_size")
    return (
        inter.withColumn("union_size", union)
        .where(
            F.lit(threshold_den) * F.col("inter_size")
            >= F.lit(threshold_num) * F.col("union_size")
        )
        .select(
            "id_a",
            "id_b",
            F.col("inter_size").cast("long").alias("inter_size"),
            F.col("union_size").cast("long").alias("union_size"),
            F.round(F.col("inter_size").cast("double") / F.col("union_size"), 6).alias(
                "jaccard"
            ),
        )
    )


def _dup_window_starts(
    df: DataFrame, text_col: str, id_col: str, span_tokens: int, min_count: int
) -> DataFrame:
    """Start positions of every ``span_tokens``-token window whose gram
    occurs ≥ ``min_count`` times in the corpus: gram-hash in place (the
    string never reaches a shuffle) → map-side census → 1:1 join back.
    Shared by :func:`exact_substr_spans` (report) and
    :func:`exact_substr_cut` (rewrite)."""
    toks = T.tokenize(F.col(text_col))
    # posexplode over the shingle array: shingles() drops only TRAILING
    # partial windows, so _p is the 0-based start position of each gram.
    wins = df.select(
        F.col(id_col), F.posexplode(shingles(toks, span_tokens)).alias("pos", "_s")
    ).select(F.col(id_col), "pos", md5_int(F.col("_s")).alias("_h"))
    census = wins.groupBy("_h").agg(F.count(F.lit(1)).alias("_cnt"))
    return wins.join(census.where(F.col("_cnt") >= min_count), "_h").select(
        id_col, "pos"
    )


def exact_substr_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    span_tokens: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Span-level exact-substring dedup (the ExactSubstr role of Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): find every maximal token span that is part of some
    ``span_tokens``-token window occurring ≥ ``min_count`` times in the
    corpus (across documents OR repeated within one). Unlike the
    doc-level dedups above, the unit of removal is the SPAN — the
    precise regions a curation pipeline would cut from otherwise-unique
    documents (licence boilerplate, quoted headers, lyrics).

    The paper builds a corpus-wide suffix array; the relational
    equivalent at fixed window granularity is three linear passes with
    no pair expansion anywhere:

    1. window grams: every ``span_tokens``-token window per doc
       (positional), hashed to 60-bit ints immediately so the gram
       string never reaches a shuffle;
    2. corpus census: groupBy(hash) count — map-side partial agg, safe
       under the boilerplate skew it is designed to catch (a window
       repeated 10^9 times is ONE census row, not a pair explosion);
    3. flagged positions join back on hash (1:1 per position), then a
       per-doc interval merge of overlapping windows — the classic
       gaps-and-islands: break when a position starts after the running
       max end of all previous windows, island = running sum of breaks.

    Returns (id, span_start, span_end, span_len) in token coordinates,
    inclusive; one row per maximal duplicated span. Docs with fewer
    than ``span_tokens`` tokens emit nothing.
    """
    from pyspark.sql import Window as W

    flagged = _dup_window_starts(df, text_col, id_col, span_tokens, min_count)
    part = W.partitionBy(id_col).orderBy("pos")
    prev_max_end = F.max(F.col("pos") + span_tokens).over(
        part.rowsBetween(W.unboundedPreceding, -1)
    )
    marked = flagged.withColumn(
        "_brk",
        F.when(F.col("pos") > F.coalesce(prev_max_end, F.lit(-1)), 1).otherwise(0),
    ).withColumn("_island", F.sum("_brk").over(part))
    return (
        marked.groupBy(id_col, "_island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + span_tokens - 1).cast("long").alias("span_end"),
            (F.max("pos") + span_tokens - F.min("pos")).cast("long").alias("span_len"),
        )
        .drop("_island")
    )


def exact_substr_cut(
    df: DataFrame,
    text_col: str,
    id_col: str,
    span_tokens: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """The rewrite half of ExactSubstr dedup (Lee et al. 2022): return
    every document with its duplicated spans REMOVED — the actual
    training-corpus output, where :func:`exact_substr_spans` is the
    audit report. A token is cut iff it is covered by at least one
    flagged window (start ``s`` with ``p - span_tokens < s ≤ p``).

    Shape: flagged window starts (see :func:`_dup_window_starts`) →
    explode each start to its ``span_tokens`` covered positions
    (bounded: only duplicated regions fan out, by exactly the span
    length) → distinct covered set → anti-join against the positional
    token explode → order-preserving re-aggregation per doc
    (sort_array over (pos, tok) structs — no window, one groupBy).
    Fully-duplicated docs come back as empty strings, not dropped,
    via the final left join from the input (a curation pipeline needs
    the row to count removal, and "doc became empty" is the signal to
    drop it in the NEXT filter stage, explicitly).

    Returns (id, clean_text, n_tokens, n_removed).
    """
    starts = _dup_window_starts(df, text_col, id_col, span_tokens, min_count)
    covered = starts.select(
        id_col,
        F.explode(F.sequence(F.col("pos"), F.col("pos") + span_tokens - 1)).alias(
            "pos"
        ),
    ).distinct()
    toks = df.select(
        F.col(id_col), F.posexplode(T.tokenize(F.col(text_col))).alias("pos", "tok")
    )
    kept = toks.join(covered, [id_col, "pos"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda x: x.tok
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("_kept"),
    )
    totals = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tokens"))
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("n_tokens") - F.coalesce(F.col("_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle.

    Inverted-index join: explode distinct shingles → equi-join on
    shingle → per-pair intersection count → Jaccard via
    |A|+|B|-∩. ``max_df`` drops shingles appearing in more than that
    many docs (stopword-shingle guard for Zipf-skewed corpora) —
    candidate generation only considers the surviving shingles, which
    lower-bounds Jaccard safely when ``max_df`` is None.
    """
    sh = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(T.tokenize(F.col(text_col)), n))).alias("sh"),
    )
    if max_df is not None:
        df_counts = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
        sh = sh.join(F.broadcast(df_counts.where(F.col("_df") <= max_df)), "sh").drop("_df")
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, on="sh")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    out = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("inter")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def embedding_near_dups(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    bucket_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    With ``bucket_col`` (e.g. a coarse cluster / LSH bucket) the
    self-join is gated to bucket-mates; without it this is brute-force
    all-pairs — correct baseline, only for small/sampled inputs.
    Cosine is an exact ``zip_with``/``aggregate`` fold (JVM, no UDF).
    """
    cols = [F.col(id_col), F.col(vec_col)] + ([F.col(bucket_col)] if bucket_col else [])
    v = df.select(*cols)
    a = v.alias("a")
    b = v.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if bucket_col:
        joined = a.join(b, on=bucket_col).where(cond)
    else:
        joined = a.crossJoin(b).where(cond)
    dot = F.aggregate(
        F.zip_with(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )
    norm = lambda side: F.sqrt(
        F.aggregate(F.col(f"{side}.{vec_col}"), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        joined.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(dot / (norm("a") * norm("b")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 16,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-duplicate pairs at Hamming distance ≤ ``max_hamming``.

    Scale path: exact banded search — split the ``bits``-bit fingerprint
    into ``bands`` contiguous slices; by pigeonhole, any pair within
    Hamming distance ≤ bands-1 agrees exactly on at least one band, so
    candidates come from an equi-join on (band_id, band_value) — never
    an all-pairs scan — then the exact popcount(xor) filter. Requires
    ``max_hamming < bands`` for zero false negatives.

    Returns distinct (id_a, id_b, hamming) with id_a < id_b.
    """
    if max_hamming >= bands:
        raise ValueError("exactness requires max_hamming < bands")
    from ..functions.hashing import hamming64

    width = bits // bands
    mask = (1 << width) - 1
    sims = simhash_fingerprints(df, text_col, id_col, bits=bits)
    banded = sims.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright("simhash", b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band"),
    ).select(id_col, "simhash", "_band.band_id", "_band.band_val")

    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("_sh_a"), "band_id", "band_val"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("_sh_b"), "band_id", "band_val"
    )
    pairs = (
        a.join(b, ["band_id", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming64(F.col("_sh_a"), F.col("_sh_b")).alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Duplicate-cluster labeling: connected components over a near-dup
    pair list by iterative min-label propagation. Each node's label is
    the minimum id reachable from it; a cluster is the set of nodes
    sharing a label. This is the step after candidate generation
    (MinHash-LSH / SimHash banding) in a dedup pipeline: pick one
    representative per *transitive* duplicate cluster, not per pair.

    Scale notes (100 TB design): each iteration is one equi-join of the
    label frame with the edge list plus one min-groupBy — both shuffle on
    node id, so AQE coalesces/splits partitions per round. Lineage is
    truncated with ``stableCheckpoint`` (durability modes: plans/reliable.py) every round (otherwise the plan
    doubles per iteration and the driver OOMs long before the data
    does). Converges in <= graph-diameter rounds; near-dup clusters are
    dense (quasi-cliques), so 2-3 rounds is typical. The per-round
    convergence check is a count action on the changed set — a driver
    loop is the idiomatic Spark shape for iterative graph algorithms
    (same structure as GraphX/GraphFrames CC).

    Returns (doc_id, cluster_id) for every node that appears in a pair;
    cluster_id = min doc_id of the component.
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).union(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    )
    edges = edges.distinct().stableCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .stableCheckpoint(eager=True)
    )
    changed = -1
    for _ in range(max_iter):
        # phase 1 — propagate: candidate label for dst = current label of
        # src; keep own label too
        prop = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"), "label"
        )
        hop = (
            prop.unionByName(labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # phase 2 — shortcut (pointer jumping, the Hash-to-Min idea,
        # Rastogi et al. 2013): label(v) <- label(label(v)). A label is
        # always an existing node id, so the self-join resolves; this
        # halves remaining path lengths each round, turning convergence
        # from O(diameter) rounds into O(log diameter) — a 5000-point
        # DBSCAN blob (diameter >> 25) converges where one-hop
        # propagation hit the round cap.
        lut = hop.select(F.col("node").alias("label"), F.col("label").alias("label2"))
        new_labels = (
            hop.join(lut, "label", "left")
            .select("node", F.coalesce("label2", "label").alias("label"))
            .stableCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # a component with diameter > max_iter would otherwise silently
        # return one cluster split into several — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter"
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def novelty_vs_previous(
    df: DataFrame,
    text_col: str,
    part_cols: list[str],
    order_col: str,
) -> DataFrame:
    """Inter-document novelty within an ordered stream: 1 - Jaccard of
    the distinct-token set vs the previous document in the same
    partition (lag over a per-stream window). The streaming twin of
    near-dup pairs: detects boilerplate re-crawls / mirrored feeds the
    moment they arrive, without any pair join. First doc per stream has
    NULL novelty.

    Scale notes: one shuffle (window partition by stream); all token-set
    work is JVM array expressions (array_distinct/intersect/union) —
    no Python, no explode, rows in = rows out.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*part_cols).orderBy(order_col)
    toks = df.select(
        *part_cols, order_col, F.array_distinct(T.tokenize(F.col(text_col))).alias("_tok_set")
    )
    prev = F.lag("_tok_set").over(w)
    inter = F.size(F.array_intersect(F.col("_tok_set"), prev))
    union = F.size(F.array_union(F.col("_tok_set"), prev))
    novelty = F.when(prev.isNull(), F.lit(None).cast("double")).otherwise(
        F.round(1.0 - inter / F.nullif(union, F.lit(0)), 6)
    )
    return toks.select(*part_cols, order_col, novelty.alias("novelty"))


def incremental_dedup(
    spark,
    table,
    from_snapshot: str | None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Dedup a snapshot DELTA against the already-ingested corpus — the
    ingestion-time shape of exact dedup: when a new crawl snapshot
    lands, only its delta is hashed and checked, never the history.

    Plan: ``read_incremental`` yields just the new rows (snapshot
    pruning, sources/snapshots.py); the existing corpus contributes
    only its content-hash set (one narrow projection — at production
    scale this hash set is itself a maintained table, appended per
    ingest, so the old corpus is never re-scanned); the check is a
    LEFT ANTI join on the 60-bit content hash, plus an exact-dup drop
    WITHIN the delta (same hash-groupBy as :func:`exact_dedup`,
    keep-min-id rule).

    Returns the delta's surviving rows ``(id, content_hash)``.
    """
    from pyspark.sql import functions as F

    from ..functions.hashing import md5_int

    delta = table.read_incremental(spark, from_snapshot)
    if from_snapshot is None:
        old = None
    else:
        old = table.read(spark, from_snapshot).select(
            md5_int(F.col(text_col)).alias("content_hash")
        ).distinct()
    h = delta.select(id_col, md5_int(F.col(text_col)).alias("content_hash"))
    if old is not None:
        h = h.join(old, "content_hash", "left_anti")
    w_min = h.groupBy("content_hash").agg(F.min(id_col).alias(id_col))
    return h.join(w_min, ["content_hash", id_col]).select(id_col, "content_hash")


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023): semantic dedup via k-means + intra-cluster
# cosine pruning


def semantic_dedup(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    tau_num: int = 19,
    tau_den: int = 20,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster embeddings with the IVF
    coarse quantizer (one Lloyd assignment, ``similarity.kmeans_assign``),
    then within each cluster mark as DROPPED every row that is the
    centroid-farther member of at least one pair whose cosine
    similarity is >= tau (tau = tau_num/tau_den, default 0.95) — the
    published policy of keeping the lowest-distance-to-centroid
    representative among semantic duplicates.

    Exactness: coordinates are scaled to int64 MILLI-units
    (floor(x*1e3 + 0.5), half-up — the kmeans_assign rounding rule at
    1e3), and ``cos >= tau`` is evaluated without any float or sqrt as

        dot > 0  AND  tau_den^2 * dot^2 >= tau_num^2 * ||a||^2 * ||b||^2

    entirely in int64: with squared milli-unit norms n2 = Σ v_u², the
    largest products are tau_den²·G² and tau_num²·n2_a·n2_b, and
    |G| <= max(n2) by Cauchy–Schwarz, so exactness needs
    max(n2) <= sqrt(2^63 / max(tau_den², tau_num²)) ≈ 1.5e8 at the
    default tau — e.g. unit-normalized vectors at any D (n2 ≈ 1e6), or
    D=64 with |x| ≲ 1.5. The UDF asserts THIS bound on the actual data
    so an out-of-range corpus fails loudly instead of silently
    wrapping. Milli-unit quantization bounds the cosine decision at
    ~1e-3 coordinate resolution — a dedup-gate threshold, not a
    ranking score, so the quantization is immaterial and buys a fully
    int64-exact, vectorized evaluation.

    Scale shape: stage 2 is ``applyInPandas`` per cluster — the
    published algorithm's intra-cluster pairwise step as ONE exact
    int64 numpy matmul per cluster (m x m Gram matrix), never an
    interpreted per-pair expression fold and never an all-pairs join
    across clusters. k is chosen ∝ corpus size so expected cluster
    size m (and the m^2 task memory) stays bounded; a degenerate hot
    cluster is the same failure mode as a hot LSH band — gate it with
    the heavy-hitter census (operators/asof.detect_heavy_hitters)
    before the group step at production scale.

    Returns (id, cluster_id, d_u, dropped).
    """
    import numpy as np
    import pandas as pd

    from .similarity import kmeans_assign

    assigned = kmeans_assign(vectors, id_col, vec_col, k)
    base = vectors.select(id_col, vec_col).join(assigned, id_col)
    num2 = tau_num * tau_num
    den2 = tau_den * tau_den

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        du = pdf["d_u"].to_numpy(dtype=np.int64)
        X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        V = np.floor(X * 1e3 + 0.5).astype(np.int64)
        n2_all = (V * V).sum(axis=1)
        # exact int64 envelope: the largest products formed below are
        # den2*G*G and num2*n2_a*n2_b; |G| <= max(n2) (Cauchy–Schwarz),
        # so both are bounded by max(den2, num2) * max(n2)^2 — assert
        # THAT directly instead of a loose per-coordinate bound (a
        # |x|<=2 bound at D=64 already overflows: 400*(2.56e8)^2 ≈
        # 2.6e19 > 2^63).
        n2_cap = int(np.sqrt((2**63 - 1) / max(den2, num2)))
        if n2_all.size and int(n2_all.max()) > n2_cap:
            raise ValueError(
                "semantic_dedup int64 envelope exceeded: max squared "
                f"milli-unit norm {int(n2_all.max())} > {n2_cap} "
                "(shrink coordinates or dimensionality, or reduce tau_den)"
            )
        G = V @ V.T  # exact int64 Gram matrix
        n2 = np.diag(G)
        dup = (G > 0) & (den2 * G * G >= num2 * np.outer(n2, n2))
        np.fill_diagonal(dup, False)
        # loser(i vs j): lexicographically larger (d_u, id)
        worse = (du[:, None] > du[None, :]) | (
            (du[:, None] == du[None, :]) & (ids[:, None] > ids[None, :])
        )
        dropped = (dup & worse).any(axis=1)
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster_id": pdf["cluster_id"].to_numpy(dtype=np.int64),
                "d_u": du,
                "dropped": dropped,
            }
        )

    return base.groupBy("cluster_id").applyInPandas(
        prune, schema=f"{id_col} long, cluster_id long, d_u long, dropped boolean"
    )


def semantic_dedup_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    tau_num: int = 19,
    tau_den: int = 20,
) -> str:
    """DuckDB oracle for :func:`semantic_dedup` — replays the Lloyd
    assignment (kmeans_assign_sql), the int64 milli-unit cosine gate,
    and the lexicographic loser rule. Products stay BIGINT (not
    HUGEINT) on purpose: inside the documented envelope they are
    exact and equal to the engine's int64 values; outside it DuckDB
    raises on overflow, surfacing the violation."""
    from .similarity import kmeans_assign_sql

    t2n, t2d = tau_num * tau_num, tau_den * tau_den
    return f"""WITH asg AS ({kmeans_assign_sql(table, id_col, vec_col, k)}),
base AS (
  SELECT e.{id_col}, asg.cluster_id, asg.d_u,
         list_transform(e.{vec_col},
           x -> CAST(floor(x::DOUBLE * 1e3 + 0.5) AS BIGINT)) AS vu
  FROM {table} e JOIN asg USING ({id_col})),
n AS (
  SELECT *, CAST(list_sum(list_transform(vu, x -> x * x)) AS BIGINT) AS n2
  FROM base),
pairs AS (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
         a.d_u AS da, b.d_u AS db,
         CAST(list_sum(list_transform(range(1, len(a.vu) + 1),
                                      i -> a.vu[i] * b.vu[i])) AS BIGINT) AS dot_u,
         a.n2 AS na2, b.n2 AS nb2
  FROM n a JOIN n b ON a.cluster_id = b.cluster_id AND a.{id_col} < b.{id_col}),
dups AS (
  SELECT * FROM pairs
  WHERE dot_u > 0
    AND {t2d} * dot_u * dot_u >= {t2n} * na2 * nb2),
losers AS (
  SELECT DISTINCT CASE WHEN (da, id_a) > (db, id_b) THEN id_a ELSE id_b END
         AS {id_col}
  FROM dups)
SELECT asg.{id_col}, asg.cluster_id, asg.d_u,
       (losers.{id_col} IS NOT NULL) AS dropped
FROM asg LEFT JOIN losers USING ({id_col})"""


# ---------------------------------------------------------------------------
# Bloom-filter membership dedup (the Dolma/CCNet ingestion-gate pattern)


def bloom_dedup(
    docs: DataFrame,
    history_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k_hashes: int = 3,
) -> DataFrame:
    """Bloom-filter dedup gate: test each DELTA document against a
    Bloom filter built from the HISTORY corpus — the constant-memory
    membership structure web-scale ingestion (Dolma's dedupe, CCNet's
    hash gate) uses when the exact hash set no longer fits.

    The filter is represented relationally: the history's k bit
    positions (seeded 60-bit md5 of the content, mod ``m_bits``) form
    a distinct-position table; a delta doc is ``maybe_dup`` iff all k
    of its positions are present. That is semantically EXACTLY a Bloom
    lookup — the bit array is just the dense encoding of this set —
    while staying a pure DataFrame plan (explode → distinct →
    co-partitioned join → count == k) that an oracle can replay
    bit-for-bit. The dense bitmap encoding is an executor-local
    optimization (OR-merge per partition, broadcast the array); the
    POSITION SET is the semantics, and at 2^20 bits the set form is
    also the honest local-scale plan.

    Each delta row also carries ``is_dup_exact`` (60-bit content-hash
    anti-join truth) so the emitted ``false_positive`` column measures
    the filter's actual FP behaviour on this corpus — the number a
    pipeline operator watches when sizing m/k.

    Returns (id, maybe_dup, is_dup_exact, false_positive) for delta rows.
    """
    h = docs.select(
        F.col(id_col), history_pred.alias("_hist"), F.col(text_col).alias("_t")
    )
    pos = lambda seed: F.pmod(md5_int(F.col("_t"), seed=seed), F.lit(m_bits))
    hist_pos = (
        h.where(F.col("_hist"))
        .select(F.explode(F.array(*[pos(s) for s in range(k_hashes)])).alias("p"))
        .distinct()
    )
    hist_hash = h.where(F.col("_hist")).select(md5_int(F.col("_t")).alias("_ch")).distinct()
    delta = h.where(~F.col("_hist"))
    delta_pos = delta.select(
        F.col(id_col),
        F.explode(F.array(*[pos(s) for s in range(k_hashes)])).alias("p"),
    )
    bloom_hits = (
        delta_pos.join(hist_pos, "p")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_nhit"))
    )
    exact = delta.select(F.col(id_col), md5_int(F.col("_t")).alias("_ch")).join(
        hist_hash.withColumn("_e", F.lit(True)), "_ch", "left"
    )
    out = (
        delta.select(id_col)
        .join(bloom_hits, id_col, "left")
        .join(exact.select(id_col, "_e"), id_col, "left")
    )
    maybe = F.coalesce(F.col("_nhit"), F.lit(0)) == k_hashes
    is_dup = F.coalesce(F.col("_e"), F.lit(False))
    return out.select(
        F.col(id_col),
        maybe.alias("maybe_dup"),
        is_dup.alias("is_dup_exact"),
        (maybe & ~is_dup).alias("false_positive"),
    )


def bloom_dedup_sql(
    history_pred_sql: str,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k_hashes: int = 3,
) -> str:
    """DuckDB oracle for :func:`bloom_dedup` — same seeded hashes, same
    position-set semantics."""
    from ..functions.hashing import md5_int_sql

    pos_rows = " UNION ALL ".join(
        f"SELECT {id_col}, hist, CAST({md5_int_sql(text_col, seed=s)} % {m_bits} AS BIGINT) AS p FROM base"
        for s in range(k_hashes)
    )
    return f"""WITH base AS (
  SELECT {id_col}, ({history_pred_sql}) AS hist, {text_col} FROM {table}),
pos AS ({pos_rows}),
hist_pos AS (SELECT DISTINCT p FROM pos WHERE hist),
hist_hash AS (
  SELECT DISTINCT CAST({md5_int_sql(text_col)} AS BIGINT) AS ch
  FROM base WHERE hist),
delta AS (SELECT * FROM base WHERE NOT hist),
hits AS (
  SELECT dp.{id_col}, count(*)::BIGINT AS nhit
  FROM (SELECT * FROM pos WHERE NOT hist) dp
  JOIN hist_pos USING (p) GROUP BY 1),
exact AS (
  SELECT d.{id_col},
         (hh.ch IS NOT NULL) AS is_dup
  FROM (SELECT {id_col}, CAST({md5_int_sql(text_col)} AS BIGINT) AS ch FROM delta) d
  LEFT JOIN hist_hash hh USING (ch))
SELECT d.{id_col},
       (coalesce(h.nhit, 0) = {k_hashes}) AS maybe_dup,
       e.is_dup AS is_dup_exact,
       (coalesce(h.nhit, 0) = {k_hashes} AND NOT e.is_dup) AS false_positive
FROM delta d
LEFT JOIN hits h USING ({id_col})
JOIN exact e USING ({id_col})"""


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the MOSS
# local document fingerprinting algorithm)


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing: hash every ``shingle_n``-gram, slide a ``window`` of
    consecutive hashes over each document, and keep the minimum hash of
    every full window. The published guarantee: any shared substring
    long enough to cover window+shingle-1 grams yields at least one
    shared fingerprint, while only ~2/(window+1) of hashes are kept —
    the local, position-robust dedup primitive plagiarism/overlap
    detectors use where MinHash's global signature is too coarse.
    (Adapted to word shingles — the engine's shingle convention — the
    paper uses char k-grams; parameterization is identical.)

    Output: DISTINCT (id, fp). Tie positions inside a window don't
    affect the distinct fingerprint set, so the window reduction is a
    plain ``min`` — one sort-free window pass over the exploded grams
    (rows frame, map-side after the per-doc shuffle), then a distinct.
    Docs with fewer than ``window`` full grams emit nothing (paper
    semantics: no full window, no fingerprint).
    """
    from pyspark.sql import Window as W

    toks = T.tokenize(F.col(text_col))
    grams = df.select(
        F.col(id_col),
        F.posexplode(shingles(toks, shingle_n)).alias("_p", "_s"),
    ).select(F.col(id_col), F.col("_p"), md5_int(F.col("_s")).alias("_h"))
    part = W.partitionBy(id_col)
    win = part.orderBy("_p").rowsBetween(0, window - 1)
    sel = grams.select(
        F.col(id_col),
        F.col("_p"),
        F.count(F.lit(1)).over(part).alias("_n"),
        F.min("_h").over(win).alias("fp"),
    ).where(F.col("_p") <= F.col("_n") - window)
    return sel.select(id_col, "fp").distinct()


def winnowing_fingerprints_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    window: int = 4,
) -> str:
    """DuckDB oracle for :func:`winnowing_fingerprints` (same hash,
    same full-window rule)."""
    from ..functions.hashing import md5_int_sql

    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(shingle_n))
    h = md5_int_sql("g")
    return f"""WITH base AS (
  SELECT {id_col}, string_split(trim({text_col}), ' ') AS w FROM {table}),
grams AS (
  -- i is 1-based: grams i = 1 .. len(w) - shingle_n + 1
  SELECT {id_col}, s.i AS p, {gram} AS g
  FROM base, unnest(range(1, greatest(len(w) - {shingle_n} + 2, 1))) s(i)),
hashed AS (
  SELECT {id_col}, p, CAST({h} AS BIGINT) AS h FROM grams),
sel AS (
  SELECT {id_col}, p,
         count(*) OVER (PARTITION BY {id_col}) AS n,
         min(h) OVER (PARTITION BY {id_col} ORDER BY p
                      ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS fp
  FROM hashed)
SELECT DISTINCT {id_col}, fp FROM sel WHERE p <= n - {window} + 1"""


def edit_distance_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_shared_fps: int = 2,
    max_fp_df: int = 50,
    prefix: int = 256,
    threshold: int = 40,
) -> DataFrame:
    """Edit-distance near-duplicate verification over winnowing-gated
    candidates — the fuzzy-dedup tier between exact hashing and
    MinHash: pairs that share >= ``min_shared_fps`` winnowing
    fingerprints (fingerprints appearing in more than ``max_fp_df``
    docs are dropped first — the stop-shingle/df-cap defense, so a
    ubiquitous phrase never drives a quadratic bucket) are verified
    with EXACT Levenshtein distance over the first ``prefix`` chars.

    The prefix bound is the scale design, not a shortcut: Levenshtein
    is O(len_a * len_b) per pair, so production fuzzy dedup always
    verifies on a bounded window — cost per pair is a constant
    O(prefix^2) at any corpus size. ``levenshtein`` is a built-in with
    identical standard semantics in Spark and DuckDB, so the distance
    column is integer-exact cross-engine.

    Returns (id_a, id_b, n_shared_fps, lev_prefix, near_dup) with
    id_a < id_b.
    """
    # fps feeds the df census AND the gated index — checkpoint the
    # (doc, fp) cut (one row per selected fingerprint) so the winnowing
    # scan (explode + hash + window) runs once, not twice.
    fps = winnowing_fingerprints(df, text_col, id_col).stableCheckpoint(eager=True)
    rare = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df")).where(
        F.col("_df") <= max_fp_df
    )
    gated = fps.join(rare.select("fp"), "fp")
    a, b = gated.alias("a"), gated.alias("b")
    cand = (
        a.join(b, "fp")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
        .where(F.col("n_shared_fps") >= min_shared_fps)
    )
    texts = df.select(
        F.col(id_col), F.substring(F.col(text_col), 1, prefix).alias("_pfx")
    )
    return (
        cand.join(texts.withColumnsRenamed({id_col: "id_a", "_pfx": "_pa"}), "id_a")
        .join(texts.withColumnsRenamed({id_col: "id_b", "_pfx": "_pb"}), "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared_fps",
            F.levenshtein("_pa", "_pb").cast("long").alias("lev_prefix"),
        )
        .withColumn("near_dup", F.col("lev_prefix") <= threshold)
    )


def edit_distance_dups_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_shared_fps: int = 2,
    max_fp_df: int = 50,
    prefix: int = 256,
    threshold: int = 40,
) -> str:
    """DuckDB oracle for :func:`edit_distance_dups`."""
    return f"""WITH fps AS ({winnowing_fingerprints_sql(table, text_col, id_col)}),
rare AS (
  SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {max_fp_df}),
gated AS (SELECT f.* FROM fps f JOIN rare USING (fp)),
cand AS (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
         count(*)::BIGINT AS n_shared_fps
  FROM gated a JOIN gated b ON a.fp = b.fp AND a.{id_col} < b.{id_col}
  GROUP BY 1, 2 HAVING count(*) >= {min_shared_fps}),
tx AS (SELECT {id_col}, substr({text_col}, 1, {prefix}) AS pfx FROM {table})
SELECT c.id_a, c.id_b, c.n_shared_fps,
       levenshtein(ta.pfx, tb.pfx)::BIGINT AS lev_prefix,
       (levenshtein(ta.pfx, tb.pfx) <= {threshold}) AS near_dup
FROM cand c
JOIN tx ta ON ta.{id_col} = c.id_a
JOIN tx tb ON tb.{id_col} = c.id_b"""


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold_num: int = 4,
    threshold_den: int = 5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram-shingle-set CONTAINMENT join: pairs where the smaller set is
    almost a subset of the larger — |A∩B| / min(|A|,|B|) ≥ t.

    Jaccard misses inclusion dups (a paragraph quoted inside a much
    longer page scores near 0 on Jaccard but 1.0 on containment);
    containment is the statistic quote/boilerplate-inclusion detection
    actually needs (Broder 1997 §2 defines both resemblance and
    containment for exactly this reason).

    Plan shape = the inverted-index join of :func:`ngram_jaccard_pairs`
    (explode distinct tokens → equi-join on token → per-pair
    intersection census), with the same ``max_df`` stop-token guard for
    Zipf-skewed corpora. The threshold gate is the pure-integer cross
    product ``den·∩ ≥ num·min(|A|,|B|)`` — no float until the reported
    score, which rounds once to 6 dp. At 100 TB the index join carries
    only post-``max_df`` postings; nothing is ever all-pairs.
    """
    grams = (
        T.tokenize(F.col(text_col))
        if n <= 1
        else shingles(T.tokenize(F.col(text_col)), n)
    )
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(grams)).alias("tok"),
    )
    if max_df is not None:
        df_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_df"))
        toks = toks.join(F.broadcast(df_counts.where(F.col("_df") <= max_df)), "tok").drop("_df")
    sizes = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, on="tok")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    min_sz = F.least(F.col("size_a"), F.col("size_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .where(F.lit(threshold_den) * F.col("inter") >= F.lit(threshold_num) * min_sz)
        .select(
            "id_a",
            "id_b",
            F.col("inter").cast("long").alias("inter_size"),
            min_sz.cast("long").alias("min_size"),
            F.round(F.col("inter").cast("double") / min_sz, 6).alias("containment"),
        )
    )


def containment_pairs_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold_num: int = 4,
    threshold_den: int = 5,
    max_df: int | None = None,
) -> str:
    """DuckDB oracle for :func:`containment_pairs`."""
    if n <= 1:
        gram = f"unnest(string_split(trim({text_col}), ' '))"
        toks_cte = f"""toks AS (
  SELECT DISTINCT {id_col}, {gram} AS tok
  FROM {table})"""
    else:
        cat = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
        toks_cte = f"""base AS (
  SELECT {id_col}, string_split(trim({text_col}), ' ') AS t FROM {table}),
toks AS (
  SELECT DISTINCT {id_col},
         unnest(list_transform(range(1, len(t) - {n - 2}), i -> {cat})) AS tok
  FROM base WHERE len(t) >= {n})"""
    gate = ""
    if max_df is not None:
        gate = f""", keep AS (
  SELECT tok FROM toks GROUP BY tok HAVING count(*) <= {max_df}),
gated AS (SELECT t.* FROM toks t JOIN keep USING (tok))"""
    src = "gated" if max_df is not None else "toks"
    return f"""WITH {toks_cte}{gate},
sizes AS (SELECT {id_col}, count(*) AS set_size FROM {src} GROUP BY 1),
inter AS (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, count(*) AS inter
  FROM {src} a JOIN {src} b USING (tok)
  WHERE a.{id_col} < b.{id_col}
  GROUP BY 1, 2)
SELECT id_a, id_b,
       inter::BIGINT AS inter_size,
       least(sa.set_size, sb.set_size)::BIGINT AS min_size,
       round(inter::DOUBLE / least(sa.set_size, sb.set_size), 6) AS containment
FROM inter
JOIN sizes sa ON sa.{id_col} = id_a
JOIN sizes sb ON sb.{id_col} = id_b
WHERE {threshold_den} * inter >= {threshold_num} * least(sa.set_size, sb.set_size)"""


def incremental_lsh_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    delta_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 2,
) -> DataFrame:
    """Incremental near-dup gate for a NEW crawl batch against an
    already-indexed corpus — the shape a continuously-ingesting pipeline
    actually runs (GPT-3 appendix A / CCNet both dedup each dump against
    prior dumps, not the union from scratch).

    ``delta_col`` (boolean) marks the incoming batch. A delta doc is a
    duplicate if it shares ≥1 LSH band with ANY index doc, or with an
    EARLIER (smaller id) delta doc — keep-first within the batch, index
    always wins. Returns one row per delta doc:
    (id, n_matches, first_match, keep).

    Scale shape: signatures are computed here for both sides (the sf
    tables are one parquet), but the join is asymmetric by construction
    — only the DELTA side explodes into probe band keys that drive the
    equi-join; in production the index side's (band_key, id) postings
    are a materialized table maintained by `sources/snapshots.py`
    commits, so each ingest shuffles only the tiny delta. The candidate
    census aggregates per delta doc (map-side partial agg) — bucket
    degeneracy is bounded by the same max-bucket logic as
    :func:`minhash_lsh_candidates` upstream of this gate.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(
        df.select(F.col(id_col), F.col(text_col), F.col(delta_col)),
        text_col,
        id_col,
        num_hashes,
        shingle_n,
        extra_cols=[delta_col],
    )
    sig_cols = [F.col(f"mh_{k}") for k in range(num_hashes)]
    banded = sigs.select(
        F.col(id_col),
        F.col(delta_col),
        F.explode(
            F.array(*[band_key(sig_cols, b, rows_per_band) for b in range(bands)])
        ).alias("band_key"),
    ).where(F.col("band_key").isNotNull())
    probe = banded.where(F.col(delta_col)).select(
        F.col(id_col).alias("new_id"), "band_key"
    )
    post = banded.select(
        F.col(id_col).alias("old_id"), F.col(delta_col).alias("old_delta"), "band_key"
    )
    cand = (
        probe.join(post, "band_key")
        .where(
            (~F.col("old_delta") & (F.col("old_id") != F.col("new_id")))
            | (F.col("old_delta") & (F.col("old_id") < F.col("new_id")))
        )
        .select("new_id", "old_id")
        .distinct()
    )
    matches = cand.groupBy("new_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        F.min("old_id").cast("long").alias("first_match"),
    )
    delta_ids = df.where(F.col(delta_col)).select(F.col(id_col).alias("new_id"))
    return (
        delta_ids.join(matches, "new_id", "left")
        .select(
            F.col("new_id").alias(id_col),
            F.coalesce(F.col("n_matches"), F.lit(0).cast("long")).alias("n_matches"),
            "first_match",
            F.col("n_matches").isNull().alias("keep"),
        )
    )


def jaro_winkler_blocked(
    docs: DataFrame,
    text_col: str = "text",
    min_len: int = 5,
    block_chars: int = 2,
    max_len_diff: int = 2,
    threshold: float = 0.9,
) -> DataFrame:
    """Jaro-Winkler fuzzy token matching with prefix blocking — the
    record-linkage workhorse (Winkler, ASA 1990) for typo/variant
    detection in vocabularies, entity names, and URL slugs. Candidate
    pairs come from a ``block_chars``-char prefix block + length-window
    gate (|len_a − len_b| ≤ ``max_len_diff``) so the all-pairs product
    never forms: the join is an equi-join on the block key, the same
    candidate-gating shape as ``edit_distance_dups``'s winnowing gate.

    Scoring is the standard Jaro similarity (match window
    ⌊max(l1,l2)/2⌋−1, half-transpositions) with the Winkler prefix
    bonus (p=0.1, prefix ≤ 4, applied only when jaro > 0.7) — verified
    against DuckDB's ``jaro_winkler_similarity`` semantics so the
    oracle is the built-in. Scoring runs in ONE Arrow-batched pandas
    UDF over the gated pairs (never per-row Python in the corpus scan;
    the pair list after blocking is the small side).

    Returns (tok_a, tok_b, jw) with tok_a < tok_b and jw ≥ threshold,
    rounded to 6dp.
    """
    @F.pandas_udf("double")
    def _jw(batches: Iterator[Tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        def score(s1: str, s2: str) -> float:
            l1, l2 = len(s1), len(s2)
            if l1 == 0 or l2 == 0:
                return 0.0
            win = max(l1, l2) // 2 - 1
            if win < 0:
                win = 0
            m2 = [False] * l2
            m1 = [False] * l1
            m = 0
            for i, c in enumerate(s1):
                lo, hi = max(0, i - win), min(l2, i + win + 1)
                for j in range(lo, hi):
                    if not m2[j] and s2[j] == c:
                        m1[i] = m2[j] = True
                        m += 1
                        break
            if m == 0:
                return 0.0
            t = 0
            j = 0
            for i in range(l1):
                if m1[i]:
                    while not m2[j]:
                        j += 1
                    if s1[i] != s2[j]:
                        t += 1
                    j += 1
            t //= 2
            jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
            if jaro > 0.7:
                p = 0
                for i in range(min(4, l1, l2)):
                    if s1[i] == s2[i]:
                        p += 1
                    else:
                        break
                jaro = jaro + p * 0.1 * (1.0 - jaro)
            return jaro

        for a, b in batches:
            yield pd.Series([score(x, y) for x, y in zip(a, b)])

    toks = (
        docs.select(F.explode(T.tokenize(F.col(text_col))).alias("tok"))
        .where(F.length("tok") >= min_len)
        .distinct()
        .select("tok", F.substring("tok", 1, block_chars).alias("blk"), F.length("tok").alias("ln"))
        .stableCheckpoint(eager=True)
    )
    a, b = toks.alias("a"), toks.alias("b")
    pairs = (
        a.join(b, "blk")
        .where(
            (F.col("a.tok") < F.col("b.tok"))
            & (F.abs(F.col("a.ln") - F.col("b.ln")) <= max_len_diff)
        )
        .select(F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b"))
    )
    return (
        pairs.withColumn("jw", F.round(_jw("tok_a", "tok_b"), 6))
        .where(F.col("jw") >= threshold)
        .select("tok_a", "tok_b", "jw")
    )


def jaro_winkler_blocked_sql(
    table: str = "documents",
    text_col: str = "text",
    min_len: int = 5,
    block_chars: int = 2,
    max_len_diff: int = 2,
    threshold: float = 0.9,
) -> str:
    """DuckDB oracle for :func:`jaro_winkler_blocked` — the scorer is
    DuckDB's built-in ``jaro_winkler_similarity`` (same standard
    semantics: window ⌊max/2⌋−1, p=0.1, prefix ≤ 4, 0.7 boost gate)."""
    return f"""WITH toks AS (
  SELECT DISTINCT unnest(string_split(trim({text_col}), ' ')) AS tok FROM {table}),
sel AS (
  SELECT tok, substr(tok, 1, {block_chars}) AS blk, length(tok) AS ln
  FROM toks WHERE length(tok) >= {min_len}),
pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b
  FROM sel a JOIN sel b ON a.blk = b.blk AND a.tok < b.tok
         AND abs(a.ln - b.ln) <= {max_len_diff})
SELECT tok_a, tok_b, round(jaro_winkler_similarity(tok_a, tok_b), 6) AS jw
FROM pairs
WHERE round(jaro_winkler_similarity(tok_a, tok_b), 6) >= {threshold}"""

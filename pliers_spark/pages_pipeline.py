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
from .functions.hashing import minhash_signature_array, shingles
from .operators import temporal as TP
from .operators.asof import asof_join

SESSION_GAP_DAYS = 30.0

_EXTRACT_SCHEMA = (
    "url string, warc_ts timestamp, lang string, text_length int, n_tokens int, "
    "n_unique int, stopword_ratio double, quality double, lang_pred string"
)


def extract_page_features_arrow(pages: DataFrame) -> DataFrame:
    """Per-snapshot extraction as ONE vectorized Arrow stage (the
    north-star formulation: partition-parallel pandas/Arrow UDFs, never
    per-row Python).

    Identical output to :func:`extract_page_features`; differential
    tests pin the two together. All per-token work is a single explode +
    ONE C-level groupby over membership masks — no Python row loop. On
    this sandbox the Arrow path beats the JVM expression path ~2x
    because JVM string ops (lower/split/regex) dominate there, while
    pandas str ops and isin run at C speed; at cluster scale both are
    embarrassingly parallel narrow stages."""
    import numpy as np
    import pandas as pd

    stop_set = frozenset(T.ENGLISH_STOPWORDS)
    profiles = [(lang, frozenset(ws)) for lang, ws in T.LANG_PROFILES.items()]
    lang_names = np.array([lang for lang, _ in profiles])

    # JVM-parity constants (r5 review fixes): Java regex \s is the ASCII
    # class [ \t\n\x0b\f\r] (NOT Unicode whitespace — pandas' bare
    # .str.split()/.str.strip() would treat \xa0 etc. as separators and
    # silently diverge from the codegen path on real crawl text), and
    # F.round is HALF_UP while np.round is banker's (half-to-even) — a
    # dyadic half-tie like 1/128 rounds differently. One rule: the JVM
    # expression path defines the feature semantics; this stage
    # reproduces it bit-for-bit (pinned by tests/test_pages_extract.py's
    # adversarial equality sweep).
    _WS = " \t\n\x0b\f\r"
    _SPLIT_RE = "[" + _WS + "]+"
    _NONWS_RE = "[^" + _WS + "]"
    # every char Python str.split() treats as whitespace but Java \s does
    # not (NBSP, \x1c-\x1f, \x85, the U+2000 block, ...): rows free of
    # these are split with the C fast path; only flagged rows pay the
    # regex split that reproduces Java semantics exactly
    _EXTRA_WS = "".join(
        chr(c) for c in range(0x10000)
        if chr(c).isspace() and chr(c) not in _WS
    )
    _EXTRA_WS_RE = "[" + _EXTRA_WS + "]"

    def _round6_half_up(x):
        return np.floor(x * 1e6 + 0.5) / 1e6  # non-negative inputs only

    def batches(it):
        for pdf in it:
            s = pdf["text"]
            idx = np.arange(len(pdf))
            s.index = idx
            null_mask = s.isna().values
            # str.strip(chars) is the C fast path for the exact ASCII
            # class — no regex pass needed for the strip
            stripped = s.str.strip(_WS)
            extra = stripped.str.contains(_EXTRA_WS_RE, regex=True, na=False)
            tokens = stripped.str.split()  # C fast path (Unicode ws)
            if extra.values.any():
                # rows with non-ASCII whitespace re-split under the exact
                # Java \s class (e.g. NBSP stays INSIDE its token there)
                tokens = tokens.copy()
                tokens[extra] = stripped[extra].str.split(_SPLIT_RE, regex=True)
            ex = tokens.explode()
            empty_any = (stripped.values == "").any()
            if null_mask.any() or empty_any or extra.values.any():
                ex = ex.dropna()
                ex = ex[ex != ""]  # regex split of '' yields [''] — not a token
            # factorize the token stream: lowering and set membership run
            # once per VOCABULARY entry (Heaps-bounded), then fan back out
            # by integer code — measured ~2x over per-token str ops; the
            # per-row sums and the CASE-SENSITIVE distinct count (JVM
            # array_distinct semantics) are C-level bincount/lexsort
            codes, uniq = pd.factorize(ex.values)
            uniq_low = pd.Index(uniq).str.lower()
            ii = ex.index.values.astype("int64")
            nrow = len(pdf)

            def _row_hits(member_u):
                sel = np.asarray(member_u)[codes]
                return np.bincount(ii[sel], minlength=nrow)

            sw_hits = _row_hits(uniq_low.isin(stop_set))
            lang_hits = {lang: _row_hits(uniq_low.isin(ws)) for lang, ws in profiles}
            o = np.lexsort((codes, ii))
            i2, c2 = ii[o], codes[o]
            first = np.ones(len(o), dtype=bool)
            first[1:] = (i2[1:] != i2[:-1]) | (c2[1:] != c2[:-1])
            n_unique = np.bincount(i2[first], minlength=nrow)
            n_tokens = tokens.str.len().fillna(0).astype("int64").values
            n_tokens = np.where(stripped.fillna("").values == "", 0, n_tokens)
            denom = np.maximum(n_tokens, 1)
            sw_ratio = sw_hits / denom
            alpha = (s.str.count(r"[A-Za-z]") / np.maximum(s.str.len(), 1)).values
            mtl = s.str.count(_NONWS_RE).values / denom
            quality = _round6_half_up(
                0.25 * np.minimum(n_tokens / 50.0, 1.0)
                + 0.25 * alpha
                + 0.25 * np.minimum(sw_ratio * 5.0, 1.0)
                + 0.25 * ((mtl >= 2.0) & (mtl <= 12.0)).astype(float)
            )
            scores = np.stack(
                [lang_hits[lang] / denom - j * 1e-9 for j, (lang, _) in enumerate(profiles)],
                axis=1,
            )
            # null text -> null features (JVM null propagation); argmax
            # over all-NaN rows picks index 0 = the JVM when-chain's
            # first-profile fallback, so lang_pred needs no masking
            text_length = stripped.str.len().values
            if null_mask.any():
                out_int = lambda v: pd.array(
                    np.where(null_mask, np.nan, np.asarray(v, dtype="float64")),
                    dtype="Int32",
                )
                out_dbl = lambda v: np.where(null_mask, np.nan, v)
            else:  # common case: no nulls — plain int32, no masking pass
                out_int = lambda v: np.asarray(v).astype("int32")
                out_dbl = lambda v: v
            yield pd.DataFrame(
                {
                    "url": pdf["url"].values,
                    "warc_ts": pdf["warc_ts"].values,
                    "lang": pdf["lang"].values,
                    "text_length": out_int(text_length),
                    "n_tokens": out_int(n_tokens),
                    "n_unique": out_int(n_unique),
                    "stopword_ratio": out_dbl(_round6_half_up(sw_ratio)),
                    "quality": out_dbl(quality),
                    "lang_pred": lang_names[np.argmax(scores, axis=1)],
                }
            )

    return pages.select("url", "warc_ts", "lang", "text").mapInPandas(
        batches, schema=_EXTRACT_SCHEMA
    )


def extract_page_features(pages: DataFrame, minhash_k: int = 0) -> DataFrame:
    """Per-snapshot extraction — narrow, shuffle-free, codegen-fused.

    Every expression here stays inside whole-stage codegen: token
    membership counts are single regexp_count passes
    (functions.text.token_membership_count) and token stats are
    split/length arithmetic. Higher-order array lambdas (F.filter /
    F.aggregate) are deliberately absent — they are *interpreted* per
    element (no codegen) and profiled ~50x slower on this exact stage."""
    from pyspark.sql import Column

    lower_text = F.col("_ltext")

    def isin_count(words: list[str]) -> Column:
        return T.token_membership_count(lower_text, words)

    n_tokens = F.col("_n_tokens")
    denom = F.greatest(n_tokens, F.lit(1))
    sw_ratio = isin_count(T.ENGLISH_STOPWORDS) / denom

    alpha = F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", "")) / F.greatest(
        F.length(F.col("text")), F.lit(1)
    )
    # Σ len(token) = non-whitespace char count (tokens are \S+ runs)
    mtl = F.length(F.regexp_replace(F.col("text"), r"\s", "")).cast("double") / denom
    quality = F.round(
        F.lit(0.25) * F.least(n_tokens.cast("double") / F.lit(50.0), F.lit(1.0))
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

    mh_cols = []
    if minhash_k:
        # single array<long> column: one aggregate pass, md5 once per
        # shingle (see hashing.minhash_signature_array for why not K
        # top-level columns)
        sh = shingles(T.tokenize(F.col("text")), 3)
        mh_cols = [minhash_signature_array(sh, minhash_k).alias("minhash")]

    return pages.select(
        "url",
        "warc_ts",
        "lang",
        "text",
        T.lower_case(F.col("text")).alias("_ltext"),
        T.token_count(F.col("text")).alias("_n_tokens"),
    ).select(
        "url",
        "warc_ts",
        "lang",
        T.text_length("text").alias("text_length"),
        n_tokens.alias("n_tokens"),
        T.num_unique_words("text").alias("n_unique"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        quality.alias("quality"),
        scored["l"].alias("lang_pred"),
        *mh_cols,
    )


def windowed_page_features(feats: DataFrame, skew_safe: bool = False) -> DataFrame:
    """Per-url temporal features — one shuffle on url, leakage-safe frames.

    ``skew_safe=True`` routes every window through the time-bucket-split
    operators (``operators/skew.py``) so no single task ever owns a hot
    domain's full history — bit-equal output (each split op is
    oracle-gated, and tests/test_incremental.py::equality covers the
    composition). Use it when the heavy-hitter census
    (``asof.detect_heavy_hitters``) reports domains above the task-size
    budget; the plain path is faster when no key is hot.
    """
    gap_s = SESSION_GAP_DAYS * 86400
    if skew_safe:
        from .operators.skew import lag1_timesplit, sessionize_timesplit

        bucket_s = 90 * 86400  # ~1 quarter per task for the hottest domain
        out = sessionize_timesplit(feats, ["url"], "warc_ts", gap_s, bucket_s)
        out = lag1_timesplit(out, ["url"], "warc_ts", "text_length", bucket_s)
        out = lag1_timesplit(out, ["url"], "warc_ts", "quality", bucket_s)
    else:
        out = TP.sessionize(feats, ["url"], "warc_ts", gap_seconds=gap_s)
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
    arrow_extract: bool = True,
    skew_safe: bool | None = None,
    heavy_hitter_threshold: int = 1_000_000,
) -> DataFrame:
    """Full pipeline returning the point-in-time feature table: for each
    (url, t) on a weekly spine grid, the features of the latest snapshot
    with warc_ts <= t.

    ``skew_safe=None`` (default) makes the choice data-driven: a
    heavy-hitter census over the url column (one cheap pruned-scan
    aggregate; operators/asof.detect_heavy_hitters) engages the
    time-bucket-split window operators when any url's snapshot count
    exceeds ``heavy_hitter_threshold`` — no single task then owns a hot
    domain's full history. Pass True/False to force either path (the
    two are bit-equal; pinned by tests/test_pages_extract.py)."""
    pages = spark.read.parquet(pages_path)
    if skew_safe is None:
        from .operators.asof import detect_heavy_hitters

        skew_safe = bool(
            detect_heavy_hitters(
                pages.select("url"), ["url"], heavy_hitter_threshold
            ).take(1)
        )
    extracted = (
        extract_page_features_arrow(pages)
        if arrow_extract and not minhash_k
        else extract_page_features(pages, minhash_k)
    )
    feats = windowed_page_features(extracted, skew_safe=skew_safe)
    # build-time gate: no window frame in the feature plan may read the
    # future (north rule; plans/leakage.py audits the optimized plan)
    from .plans.leakage import assert_leakage_free

    assert_leakage_free(feats)
    spine = TP.resample_grid(
        pages.select("url", "warc_ts"), ["url"], "warc_ts", spine_step_hours * 3600
    ).withColumnRenamed("warc_ts", "t")
    value_cols = [c for c in feats.columns if c not in ("url", "warc_ts")]
    if skew_safe:
        # the heavy-hitter census engaged the timesplit WINDOW operators;
        # the final as-of join must not reintroduce the hot url as one
        # unsplit sort group — route it through the time-range-split twin
        # (bit-equal; same boundary-carry contract the window ops use)
        from .operators.asof import asof_join_split

        return asof_join_split(
            spine, feats, ["url"], "t", "warc_ts", value_cols,
            split_seconds=90 * 86400.0,
        )
    return asof_join(spine, feats, ["url"], "t", "warc_ts", value_cols)


def incremental_page_features(
    spark: SparkSession,
    table,
    prev_features: DataFrame | None,
    from_id: str | None,
    to_id: str | None = None,
) -> DataFrame:
    """Incrementally maintain the windowed feature table after new crawl
    snapshots land in a :class:`~pliers_spark.sources.snapshots.SnapshotTable`.

    Windowed features (lag/session/ffill) are stateful *per url*: a new
    snapshot changes its url's lag chain and can merge its sessions, but
    touches no other url. So the delta unit is the **url**, not the row:

    1. incremental-scan the snapshot range → distinct urls in the delta
       (reads only the delta files, never the corpus);
    2. left-semi join the table at ``to_id`` to those urls → the full
       history of affected urls only (at 10^12 rows the semi-join prunes
       with a bloom/broadcast under AQE — the delta url set is tiny
       relative to the corpus);
    3. re-extract + re-window just those urls (extraction is
       deterministic, so recomputed rows are byte-identical to a full
       run; a further refinement at scale persists the pre-window
       extracted table and re-extracts only the delta *rows*);
    4. anti-join the previous feature table to drop the affected urls'
       stale rows, union the fresh ones.

    Equivalence with a full recompute is pinned by
    tests/test_incremental.py.
    """
    delta_urls = table.read_incremental(spark, from_id, to_id).select("url").distinct()
    full = table.read(spark, to_id)
    affected = full.join(delta_urls, "url", "left_semi")
    fresh = windowed_page_features(extract_page_features_arrow(affected))
    if prev_features is None:
        return fresh
    kept = prev_features.join(delta_urls, "url", "left_anti")
    return kept.unionByName(fresh)


def html_to_text(pages: DataFrame, html_col: str = "html", out_col: str = "extracted_text") -> DataFrame:
    """Converter stage: ``html`` binary → extracted text — the pages-table
    analog of a pliers ``Converter`` (Stim type A → type B, 1→1;
    pliers/converters/base.py:12-25), and the stage the north rule's
    byte-identity invariant guards ("byte-identical extracted text per
    url"). Deterministic, dependency-free extraction: utf-8 decode, tag
    strip, entity unescape, whitespace collapse — one Arrow-vectorized
    stage (pandas str ops at C speed); the only residual Python-level
    call is entity unescape, applied to just the rows containing '&'
    (it is the identity elsewhere). tests/test_pages_extract.py pins ``extracted_text == text``
    byte-for-byte on the synthetic corpus, whose html wraps the text.

    Scale note: html is by far the widest column (10-100 KB/row at
    crawl scale vs ~1 KB of text); this stage is the ONLY one allowed
    to read it, so everything downstream keeps the scan pruned to the
    narrow columns.
    """
    import html as _html

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from pyspark.sql.functions import PandasUDFType

    @pandas_udf("string", PandasUDFType.SCALAR)
    def _extract(s):
        txt = s.str.decode("utf-8", errors="replace")  # vectorized, null-safe
        txt = (
            # (?s): script/style bodies span newlines in real HTML — without
            # DOTALL a multi-line <script> survives tag-stripping and its JS
            # leaks into extracted_text (north-rule byte-identity violation)
            txt.str.replace(r"(?s)<(script|style)\b[^>]*>.*?</\1>", " ", regex=True)
            .str.replace(r"<[^>]+>", " ", regex=True)
        )
        # entity unescape has no vectorized form; it is the identity on
        # text without '&', so only those rows pay the Python call
        amp = txt.str.contains("&", regex=False, na=False)
        if amp.any():
            txt = txt.copy()
            txt.loc[amp] = txt.loc[amp].map(_html.unescape)
        return txt.str.replace(r"\s+", " ", regex=True).str.strip()

    return pages.withColumn(out_col, _extract(F.col(html_col)))


def url_features(pages: DataFrame, url_col: str = "url",
                 key_cols: tuple[str, ...] = ()) -> DataFrame:
    """URL structure features — host, registrable domain proxy, path
    depth, https flag — all JVM ``parse_url``/regex expressions inside
    whole-stage codegen (crawl partitioning/skew analysis runs on these:
    hot-domain detection groups by ``host``). ``key_cols`` ride along
    unchanged (e.g. a doc id when the table isn't keyed by url)."""
    u = F.col(url_col)
    host = F.parse_url(u, F.lit("HOST"))
    path = F.parse_url(u, F.lit("PATH"))
    return pages.select(
        *key_cols,
        url_col,
        host.alias("host"),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1).alias("domain"),
        path.alias("path"),
        (F.size(F.split(path, "/")) - 1).cast("long").alias("path_depth"),
        u.startswith("https://").alias("is_https"),
    )


_TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)(=.*)?$"


def canonical_url(url_col) -> "Column":
    """Canonicalize a URL for crawl dedup — the normalization step a
    Common-Crawl-scale pipeline runs before URL-keyed dedup/grouping
    (beyond-reference; the reference's stimuli carry opaque filenames).

    Rules (each a pure Column expression, whole-stage codegen):
      1. fragment stripped (`#...` never reaches the server);
      2. scheme and host lowercased (RFC 3986 §6.2.2.1 — path case is
         preserved, it IS significant);
      3. default ports dropped (`:80` for http, `:443` for https);
      4. tracking query params removed (utm_*, fbclid, gclid, ref),
         remaining params kept in original order, `?` dropped when
         none survive;
      5. trailing `/` stripped from non-root paths, empty path → `/`.

    The query-param filter is an array filter over the split param
    list — interpreted, but bounded by the param count of one URL
    (single digits), not data volume. ``www.`` is NOT stripped: it can
    be a distinct origin; policy-level host folding belongs to the
    caller.
    """
    u = F.regexp_replace(url_col, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, r":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, r":443$", ""),
    ).otherwise(hostport)
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?]*)", 1)
    path_stripped = F.regexp_replace(rest, r"/$", "")
    path = F.when(path_stripped == "", F.lit("/")).otherwise(path_stripped)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(_TRACKING_PARAM_RE),
    )
    qs = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(
        F.lit("")
    )
    # scheme-less / malformed input (relative URLs, mailto:, junk) has
    # no canonical form — pass it through UNCHANGED rather than
    # collapsing every such row to the same ':///' key, which would
    # merge unrelated documents in a downstream URL-keyed dedup.
    return F.when(scheme == "", url_col).otherwise(
        F.concat(scheme, F.lit("://"), host, path, qs)
    )


def canonical_url_sql(url_expr: str) -> str:
    """DuckDB twin of :func:`canonical_url` (same regexes, same rules)."""
    u = f"regexp_replace({url_expr}, '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    hostport = f"lower(regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1))"
    host = f"""CASE
      WHEN {scheme} = 'http' AND {hostport} LIKE '%:80'
        THEN regexp_replace({hostport}, ':80$', '')
      WHEN {scheme} = 'https' AND {hostport} LIKE '%:443'
        THEN regexp_replace({hostport}, ':443$', '')
      ELSE {hostport} END"""
    rest = f"regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.-]*://[^?#/]+([^?]*)', 1)"
    path = f"""CASE WHEN regexp_replace({rest}, '/$', '') = '' THEN '/'
               ELSE regexp_replace({rest}, '/$', '') END"""
    query = f"regexp_extract({u}, '\\?([^#]*)', 1)"
    kept = (
        f"list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING_PARAM_RE}'))"
    )
    qs = f"CASE WHEN len({kept}) > 0 THEN '?' || array_to_string({kept}, '&') ELSE '' END"
    return (
        f"CASE WHEN {scheme} = '' THEN {url_expr} "
        f"ELSE {scheme} || '://' || {host} || {path} || {qs} END"
    )

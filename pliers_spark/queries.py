"""Driver-facing query registry: every implemented operator from
SURVEY.md §2 as a (Spark callable, DuckDB oracle SQL) pair.

Each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame;
the oracle is ANSI SQL DuckDB runs on the same parquet (views
pre-registered by the driver). Column names/aliases match exactly on
both sides; float outputs are rounded to 6 decimals on both sides so
the order-insensitive value-hash is stable across engines.
"""

from __future__ import annotations

import string
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import text as T
from .functions.text import _isin_lambda
from .functions.hashing import md5_int, md5_int_sql
from .operators import asof as A
from .operators import dedup as D
from .operators import dictionary as DI
from .operators import results as R
from .operators import similarity as S
from .operators import temporal as TP
from .operators import vectorizer as V
from .session import load_table

# --------------------------------------------------------------------------
# registry plumbing

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    def deco(fn):
        if name in QUERIES:
            # a later registration would silently shadow the earlier query
            # (dict assignment) — fail at import time instead
            raise ValueError(f"duplicate query registration: {name!r}")
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def _docs(spark, sf_dir):
    # spread: every downstream documents query is a CPU-heavy per-row map
    # (tokenize/hash/UDF); a sub-MB local scan is 1 split otherwise.
    return load_table(spark, sf_dir, "documents", spread=True)


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


# --------------------------------------------------------------------------
# §2.2/§2.4 text extractors & filters (pliers parity surface)

_PUNCT_SQL_CLASS = "[" + "".join("\\" + (c if c != "'" else "''") for c in string.punctuation) + "]"


@query(
    "text_length",
    "SELECT doc_id, length(trim(text))::BIGINT AS text_length FROM documents",
)
def q_text_length(spark, sf_dir):
    """LengthExtractor ≡ len(text.strip()) (pliers/extractors/text.py:162-170)."""
    return _docs(spark, sf_dir).select("doc_id", T.text_length("text").cast("long").alias("text_length"))


@query(
    "text_prep",
    f"""SELECT doc_id, regexp_replace(lower(text), '{_PUNCT_SQL_CLASS}', '', 'g') AS clean_text
        FROM documents""",
)
def q_text_prep(spark, sf_dir):
    """LowerCasing + PunctuationRemoval filter chain (pliers/filters/text.py:186-201)."""
    return _docs(spark, sf_dir).select(
        "doc_id", T.remove_punctuation(T.lower_case(F.col("text"))).alias("clean_text")
    )


@query(
    "tokenize",
    """SELECT doc_id,
              unnest(range(len(string_split(trim(text), ' '))))::BIGINT AS pos,
              unnest(string_split(trim(text), ' ')) AS token
       FROM documents""",
)
def q_tokenize(spark, sf_dir):
    """TokenizingFilter 1→N posexplode (pliers/filters/text.py:113-145)."""
    return _docs(spark, sf_dir).select(
        "doc_id", F.posexplode(T.tokenize(F.col("text"))).alias("pos", "token")
    ).withColumn("pos", F.col("pos").cast("long"))


@query(
    "num_unique_words",
    "SELECT doc_id, len(list_distinct(string_split(trim(text), ' ')))::BIGINT AS n_unique FROM documents",
)
def q_num_unique_words(spark, sf_dir):
    """NumUniqueWordsExtractor — exact distinct (pliers/extractors/text.py:173-201)."""
    return _docs(spark, sf_dir).select(
        "doc_id", T.num_unique_words("text").cast("long").alias("n_unique")
    )


@query(
    "word_counter",
    """WITH toks AS (
         SELECT doc_id,
                unnest(range(len(string_split(trim(text), ' '))))::BIGINT AS pos,
                lower(unnest(string_split(trim(text), ' '))) AS token
         FROM documents)
       SELECT doc_id, pos, token,
              count(*) OVER (PARTITION BY doc_id, token ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS word_count
       FROM toks""",
)
def q_word_counter(spark, sf_dir):
    """WordCounterExtractor — running per-token count, case-folded
    (pliers/extractors/text.py:834-862)."""
    toks = (
        _docs(spark, sf_dir)
        .select("doc_id", F.posexplode(T.tokenize(F.col("text"))).alias("pos", "token"))
        .withColumn("pos", F.col("pos").cast("long"))
        .withColumn("token", F.lower(F.col("token")))
    )
    return TP.running_count(toks, ["doc_id"], "token", "pos", out_col="word_count").withColumn(
        "word_count", F.col("word_count").cast("long")
    )


# small inline lexical dictionary (FIXTURES.md §4 shape) — same VALUES on
# both sides; includes words present & missing vs the corpus.
_LEXICON_ROWS = [
    ("data", 4, 11.729, 2),
    ("query", 5, 8.25, 2),
    ("table", 5, 6.5, 2),
    ("fast", 4, 3.75, 1),
    ("slow", 4, 2.25, 1),
    ("zzznotpresent", 13, 0.1, 4),
]
_LEXICON_SQL = "VALUES " + ", ".join(
    f"('{w}', {l}, {f}, {s})" for (w, l, f, s) in _LEXICON_ROWS
)


@query(
    "dictionary_lookup",
    f"""WITH dict(word, length, frequency, syllables) AS ({_LEXICON_SQL}),
       toks AS (
         SELECT doc_id,
                unnest(range(len(string_split(trim(text), ' '))))::BIGINT AS pos,
                unnest(string_split(trim(text), ' ')) AS token
         FROM documents)
       SELECT t.doc_id, t.pos, t.token,
              d.length::BIGINT AS length, d.frequency::DOUBLE AS frequency,
              d.syllables::BIGINT AS syllables
       FROM toks t LEFT JOIN dict d ON lower(t.token) = lower(d.word)""",
)
def q_dictionary_lookup(spark, sf_dir):
    """DictionaryExtractor — broadcast left-outer lookup, NULL on miss
    (pliers/extractors/text.py:88-95)."""
    toks = (
        _docs(spark, sf_dir)
        .select("doc_id", F.posexplode(T.tokenize(F.col("text"))).alias("pos", "token"))
        .withColumn("pos", F.col("pos").cast("long"))
    )
    dim = spark.createDataFrame(_LEXICON_ROWS, "word string, length long, frequency double, syllables long")
    out = DI.dictionary_lookup(toks, dim, "token", "word", case_sensitive=False)
    return out.select("doc_id", "pos", "token", "length", "frequency", "syllables")


@query(
    "count_vectorizer",
    """WITH toks AS (
         SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents),
       dtc AS (
         SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
       stats AS (
         SELECT term, sum(tf) AS cf, count(*) AS df FROM dtc GROUP BY term),
       vocab AS (
         SELECT term FROM stats ORDER BY cf DESC, term LIMIT 16)
       SELECT d.doc_id, d.term, d.tf FROM dtc d JOIN vocab v USING (term)""",
)
def q_count_vectorizer(spark, sf_dir):
    """TextVectorizerExtractor — two-pass global vocab + per-doc counts
    (pliers/extractors/text.py:282-315)."""
    return V.count_vectorize(_docs(spark, sf_dir), "doc_id", "text", vocab_size=16)


@query(
    "tfidf",
    """WITH toks AS (
         SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents),
       dtc AS (
         SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
       stats AS (
         SELECT term, sum(tf) AS cf, count(*) AS df FROM dtc GROUP BY term),
       vocab AS (
         SELECT term, df FROM stats ORDER BY cf DESC, term LIMIT 16),
       n AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n_docs FROM documents)
       SELECT d.doc_id, d.term, d.tf,
              round(d.tf * (ln((1.0 + n.n_docs) / (1.0 + v.df)) + 1.0), 6) AS tfidf
       FROM dtc d JOIN vocab v USING (term), n""",
)
def q_tfidf(spark, sf_dir):
    return V.tfidf_vectorize(_docs(spark, sf_dir), "doc_id", "text", vocab_size=16)


# sentiment lexicon with VADER-style normalization sum/sqrt(sum^2+15)
_VALENCE_ROWS = [
    ("fast", 1.3), ("slow", -0.9), ("big", 0.6), ("small", -0.3),
    ("error", -1.8), ("value", 0.8), ("merge", 0.2), ("spill", -0.7),
]
_VALENCE_SQL = "VALUES " + ", ".join(f"('{w}', {v})" for (w, v) in _VALENCE_ROWS)


@query(
    "sentiment_lexicon",
    f"""WITH lex(word, valence) AS ({_VALENCE_SQL}),
       toks AS (
         SELECT doc_id, lower(unnest(string_split(trim(text), ' '))) AS token FROM documents),
       sums AS (
         SELECT t.doc_id, coalesce(sum(l.valence), 0.0) AS s
         FROM toks t LEFT JOIN lex l ON t.token = l.word GROUP BY t.doc_id)
       SELECT doc_id, round(s / sqrt(s * s + 15.0), 6) AS sentiment FROM sums""",
)
def q_sentiment_lexicon(spark, sf_dir):
    """Lexicon-valence sentiment with VADER's alpha-normalization
    (clean-room; scoring shape of nltk VADER as used by
    pliers/extractors/text.py:318-336 — full rule engine in functions/vader.py)."""
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.explode(T.tokenize(F.lower(F.col("text")))).alias("token")
    )
    lex = spark.createDataFrame(_VALENCE_ROWS, "word string, valence double")
    sums = (
        toks.join(F.broadcast(lex), toks.token == lex.word, "left")
        .groupBy("doc_id")
        .agg(F.coalesce(F.sum("valence"), F.lit(0.0)).alias("s"))
    )
    return sums.select(
        "doc_id", F.round(F.col("s") / F.sqrt(F.col("s") * F.col("s") + 15.0), 6).alias("sentiment")
    )


_SW_LIST = ", ".join(f"'{w}'" for w in T.ENGLISH_STOPWORDS)


@query(
    "quality_score",
    _QUALITY_ORACLE := f"""WITH base AS (
         SELECT doc_id, text, string_split(trim(text), ' ') AS toks FROM documents),
       m AS (
         SELECT doc_id,
                len(toks)::DOUBLE AS n_tok,
                length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                  / greatest(length(text), 1) AS alpha,
                len(list_filter(list_transform(toks, t -> lower(t)),
                                t -> list_contains([{_SW_LIST}], t)))::DOUBLE
                  / greatest(len(toks), 1) AS swr,
                list_sum(list_transform(toks, t -> length(t)))::DOUBLE
                  / greatest(len(toks), 1) AS mtl
         FROM base)
       SELECT doc_id,
              round(0.25 * least(n_tok / 50.0, 1.0)
                  + 0.25 * alpha
                  + 0.25 * least(swr * 5.0, 1.0)
                  + 0.25 * (CASE WHEN mtl >= 2.0 AND mtl <= 12.0 THEN 1.0 ELSE 0.0 END),
                    6) AS quality
       FROM m""",
)
def q_quality_score(spark, sf_dir):
    """Training-pipeline quality scoring (length/alpha/stopword/token-shape)."""
    return _docs(spark, sf_dir).select("doc_id", T.quality_score("text").alias("quality"))


@query(
    "token_stats",
    f"""SELECT doc_id,
              len(string_split(trim(text), ' '))::BIGINT AS n_tokens,
              round(len(list_filter(list_transform(string_split(trim(text), ' '), t -> lower(t)),
                                t -> list_contains([{_SW_LIST}], t)))::DOUBLE
                  / greatest(len(string_split(trim(text), ' ')), 1), 6) AS stopword_ratio,
              round((length(text) - length(regexp_replace(text, '{_PUNCT_SQL_CLASS}', '', 'g')))::DOUBLE
                  / greatest(length(text), 1), 6) AS punct_ratio
       FROM documents""",
)
def q_token_stats(spark, sf_dir):
    """Token accounting + quality signal ratios."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        T.token_count("text").cast("long").alias("n_tokens"),
        F.round(T.stopword_ratio("text"), 6).alias("stopword_ratio"),
        F.round(T.punct_ratio("text"), 6).alias("punct_ratio"),
    )


def _langid_sql() -> str:
    # scores are exact BIGINT parts-per-million (floor(hits*1e6/denom)) —
    # integer outputs hash bit-identically across engines, unlike raw
    # float ratios whose last ulp depends on accumulation order; the
    # argmax tie-break is CASE order = profile order on both engines.
    score_exprs = []
    for lang, words in T.LANG_PROFILES.items():
        wl = ", ".join(f"'{w}'" for w in words)
        score_exprs.append(
            f"floor(len(list_filter(toks, t -> list_contains([{wl}], t))) * 1000000.0"
            f" / greatest(len(toks), 1))::BIGINT AS s_{lang}"
        )
    langs = list(T.LANG_PROFILES)
    greatest_all = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    cases = " ".join(f"WHEN s_{l} = {greatest_all} THEN '{l}'" for l in langs)
    expr = f"CASE {cases} ELSE '{langs[0]}' END"
    return f"""WITH base AS (
         SELECT doc_id, list_transform(string_split(trim(text), ' '), t -> lower(t)) AS toks
         FROM documents),
       scored AS (SELECT doc_id, {', '.join(score_exprs)} FROM base)
       SELECT doc_id, {', '.join(f's_{l} AS score_{l}' for l in langs)},
              {expr} AS lang_pred
       FROM scored"""


@query("langid", _langid_sql())
def q_langid(spark, sf_dir):
    """n-gram/stopword-profile language-ID heuristic (training-pipeline op).
    Scores emitted as exact integer ppm so the cross-engine value hash is
    bit-deterministic (both engines floor the same exact-double division)."""
    d = _docs(spark, sf_dir)
    toks = T.tokenize(T.lower_case(F.col("text")))
    denom = F.greatest(F.size(toks), F.lit(1))
    cols = [F.col("doc_id")]
    scores = []
    for lang, words in T.LANG_PROFILES.items():
        hits = F.size(F.filter(toks, _isin_lambda(words)))
        s = F.floor(hits * F.lit(1_000_000.0) / denom).cast("long")
        scores.append((lang, s))
        cols.append(s.alias(f"score_{lang}"))
    greatest_all = F.greatest(*[s for _, s in scores])
    pred = None
    for lang, s in scores:  # first max in profile order wins (≡ SQL CASE)
        pred = F.when(s == greatest_all, F.lit(lang)) if pred is None else pred.when(
            s == greatest_all, F.lit(lang)
        )
    cols.append(pred.otherwise(F.lit(scores[0][0])).alias("lang_pred"))
    return d.select(*cols)


@query(
    "features_long",
    """WITH f AS (
         SELECT doc_id,
                length(trim(text))::DOUBLE AS text_length,
                len(string_split(trim(text), ' '))::DOUBLE AS n_tokens,
                len(list_distinct(string_split(trim(text), ' ')))::DOUBLE AS n_unique
         FROM documents)
       SELECT doc_id, 'text#text_length' AS feature, text_length AS value FROM f
       UNION ALL
       SELECT doc_id, 'text#n_tokens', n_tokens FROM f
       UNION ALL
       SELECT doc_id, 'text#n_unique', n_unique FROM f""",
)
def q_features_long(spark, sf_dir):
    """ExtractorResult.to_df(format='long') ≡ melt with extractor#feature
    namespacing (pliers/extractors/base.py:175-177, 308-310)."""
    wide = _docs(spark, sf_dir).select(
        "doc_id",
        T.text_length("text").alias("text_length"),
        T.token_count("text").alias("n_tokens"),
        T.num_unique_words("text").alias("n_unique"),
    )
    return R.to_long(wide, ["doc_id"], ["text_length", "n_tokens", "n_unique"], extractor="text")


@query(
    "merge_wide",
    """SELECT d.doc_id,
              length(trim(d.text))::BIGINT AS text_length,
              len(list_distinct(string_split(trim(d.text), ' ')))::BIGINT AS n_unique
       FROM documents d""",
)
def q_merge_wide(spark, sf_dir):
    """merge_results(format='wide') as a composite-key join of
    per-extractor frames (pliers/extractors/base.py:312-340)."""
    d = _docs(spark, sf_dir)
    f1 = d.select("doc_id", T.text_length("text").cast("long").alias("text_length"))
    f2 = d.select("doc_id", T.num_unique_words("text").cast("long").alias("n_unique"))
    return R.merge_features([f1, f2], ["doc_id"])


# --------------------------------------------------------------------------
# §2.3/§2.5 temporal operators over `events` (north-rule core:
# as-of join, lag/lead, ffill, sessionize, rolling, resample)

_GRID_START = "2024-01-01 00:00:00"
_GRID_END = "2024-01-31 00:00:00"


def _user_grid(spark, sf_dir, hours: int):
    users = _events(spark, sf_dir).select("user_id").distinct()
    return users.select(
        "user_id",
        F.explode(
            F.sequence(
                F.to_timestamp(F.lit(_GRID_START)),
                F.to_timestamp(F.lit(_GRID_END)),
                F.expr(f"INTERVAL {hours} HOURS"),
            )
        ).alias("t"),
    )


def _grid_sql(hours: int) -> str:
    return f"""(SELECT user_id, unnest(generate_series(TIMESTAMP '{_GRID_START}',
                TIMESTAMP '{_GRID_END}', INTERVAL {hours} HOUR)) AS t
               FROM (SELECT DISTINCT user_id FROM events))"""


_ASOF_SQL = f"""SELECT g.user_id, g.t, e.value AS last_value, e.ts AS matched_ts
       FROM {_grid_sql(6)} g
       ASOF LEFT JOIN events e ON g.user_id = e.user_id AND g.t >= e.ts"""


@query("asof_join", _ASOF_SQL)
def q_asof_join(spark, sf_dir):
    """Point-in-time as-of join (union + window-ffill strategy, pure JVM):
    latest event value per (user, t), inclusive tie — the north-rule core
    operator (generalizes pliers' step-fill, pliers/utils/base.py:218-223)."""
    spine = _user_grid(spark, sf_dir, 6)
    ev = _events(spark, sf_dir)
    out = A.asof_join(spine, ev, ["user_id"], "t", "ts", ["value"], matched_ts_col="matched_ts")
    return out.select("user_id", "t", F.col("value").alias("last_value"), "matched_ts")


_ASOF_FWD_SQL = f"""SELECT g.user_id, g.t, e.value AS next_value, e.ts AS matched_ts
       FROM {_grid_sql(6)} g
       ASOF LEFT JOIN events e ON g.user_id = e.user_id AND g.t <= e.ts"""


@query("asof_join_forward", _ASOF_FWD_SQL)
def q_asof_join_forward(spark, sf_dir):
    """Forward as-of join (earliest event with ts >= t, inclusive):
    pandas merge_asof direction='forward' on the same one-shuffle
    union+window plan — the backward operator's following-frame mirror."""
    spine = _user_grid(spark, sf_dir, 6)
    ev = _events(spark, sf_dir)
    out = A.asof_join_directional(
        spine, ev, ["user_id"], "t", "ts", ["value"],
        direction="forward", matched_ts_col="matched_ts",
    )
    return out.select("user_id", "t", F.col("value").alias("next_value"), "matched_ts")


_ASOF_NEAREST_TOL_S = 21_600  # 6 h — half the spine step, so some rows null out


def _asof_nearest_sql() -> str:
    tol_us = _ASOF_NEAREST_TOL_S * 1_000_000
    return f"""WITH b AS (
         SELECT g.user_id, g.t, e.value AS bv, e.ts AS bts
         FROM {_grid_sql(6)} g
         ASOF LEFT JOIN events e ON g.user_id = e.user_id AND g.t >= e.ts),
       f AS (
         SELECT g.user_id, g.t, e.value AS fv, e.ts AS fts
         FROM {_grid_sql(6)} g
         ASOF LEFT JOIN events e ON g.user_id = e.user_id AND g.t <= e.ts),
       j AS (
         SELECT b.user_id, b.t, bv, bts, fv, fts,
                epoch_us(b.t) - epoch_us(bts) AS bd,
                epoch_us(fts) - epoch_us(b.t) AS fd
         FROM b JOIN f ON b.user_id = f.user_id AND b.t = f.t),
       pick AS (
         SELECT user_id, t,
                (bts IS NOT NULL AND (fts IS NULL OR bd <= fd)) AS use_back,
                CASE WHEN (bts IS NOT NULL AND (fts IS NULL OR bd <= fd))
                     THEN bd ELSE fd END AS dist,
                bv, bts, fv, fts
         FROM j)
       SELECT user_id, t,
              CASE WHEN dist IS NOT NULL AND dist <= {tol_us}
                   THEN (CASE WHEN use_back THEN bv ELSE fv END) END AS near_value,
              CASE WHEN dist IS NOT NULL AND dist <= {tol_us}
                   THEN (CASE WHEN use_back THEN bts ELSE fts END) END AS matched_ts
       FROM pick"""


@query("asof_join_nearest", _asof_nearest_sql())
def q_asof_join_nearest(spark, sf_dir):
    """Nearest as-of join with tolerance (pandas merge_asof
    direction='nearest', tolerance=6h): closest event either side,
    equal-distance ties to the backward row, matches beyond the
    tolerance nulled. Both directions come from two window frames over
    ONE per-entity sort — still a single shuffle; distance arithmetic
    is exact integer microseconds on both engines."""
    spine = _user_grid(spark, sf_dir, 6)
    ev = _events(spark, sf_dir)
    out = A.asof_join_directional(
        spine, ev, ["user_id"], "t", "ts", ["value"],
        direction="nearest", tolerance_seconds=_ASOF_NEAREST_TOL_S,
        matched_ts_col="matched_ts",
    )
    return out.select("user_id", "t", F.col("value").alias("near_value"), "matched_ts")


@query("asof_join_cogroup", _ASOF_SQL)
def q_asof_join_cogroup(spark, sf_dir):
    """Same semantics, second physical strategy: cogrouped applyInPandas
    sort-merge (pandas.merge_asof per url-hash group — the north rule's
    sort-merge formulation). Differential twin of `asof_join`."""
    spine = _user_grid(spark, sf_dir, 6)
    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    out = A.asof_join_cogroup(
        spine, ev, ["user_id"], "t", "ts", ["value"], matched_ts_col="matched_ts"
    )
    return out.select("user_id", "t", F.col("value").alias("last_value"), "matched_ts")


@query("asof_join_split", _ASOF_SQL)
def q_asof_join_split(spark, sf_dir):
    """Same semantics, third physical strategy: time-range-split as-of join
    (skew defense for hot entities — chunk the timeline, exact boundary
    carry via a chunk-level as-of)."""
    spine = _user_grid(spark, sf_dir, 6)
    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    out = A.asof_join_split(spine, ev, ["user_id"], "t", "ts", ["value"], split_seconds=7 * 86400.0)
    return out.select("user_id", "t", F.col("value").alias("last_value"), F.col("matched_ts"))


@query(
    "lag_lead",
    """SELECT user_id, ts, value,
              lag(value, 1) OVER w AS value_lag1,
              lag(value, 2) OVER w AS value_lag2,
              lead(value, 1) OVER w AS value_lead1
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts)""",
)
def q_lag_lead(spark, sf_dir):
    """Lag/lead features per entity timeline (north-rule windowed stage;
    lead flagged as future-reading — label construction only)."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    out = TP.lag_features(ev, ["user_id"], "ts", "value", [1, 2])
    out = TP.lead_features(out, ["user_id"], "ts", "value", [1])
    return out


@query(
    "ffill",
    """SELECT user_id, ts,
              last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
       FROM (SELECT user_id, ts,
                    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
             FROM events)""",
)
def q_ffill(spark, sf_dir):
    """Forward-fill over nulls — the reference resample's step-function
    fill generalized (pliers/utils/base.py:218-223)."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        "ts",
        F.when(F.col("event_type") == "error", F.lit(None).cast("double")).otherwise(F.col("value")).alias("v"),
    )
    return TP.ffill(ev, ["user_id"], "ts", "v", out_col="v_ffill").select("user_id", "ts", "v_ffill")


@query(
    "bfill",
    """SELECT user_id, ts,
              first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_bfill
       FROM (SELECT user_id, ts,
                    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
             FROM events)""",
)
def q_bfill(spark, sf_dir):
    """Backward-fill over nulls (north-rule backfill stage). Reads future
    rows by construction — label/imputation use only, never a leakage-safe
    feature; the ffill/asof family stays bounded at currentRow."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        "ts",
        F.when(F.col("event_type") == "error", F.lit(None).cast("double")).otherwise(F.col("value")).alias("v"),
    )
    return TP.bfill(ev, ["user_id"], "ts", "v", out_col="v_bfill").select("user_id", "ts", "v_bfill")


_SESSION_GAP_S = 6 * 3600


@query(
    "sessionize",
    f"""WITH flagged AS (
         SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch(ts) - epoch(lag(ts) OVER w) > {_SESSION_GAP_S}
                     THEN 1 ELSE 0 END AS is_new
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       sess AS (
         SELECT user_id, ts,
                sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         FROM flagged)
       SELECT user_id, session_id::BIGINT AS session_id,
              min(ts) AS session_start, max(ts) AS session_end,
              count(*)::BIGINT AS n_events
       FROM sess GROUP BY user_id, session_id""",
)
def q_sessionize(spark, sf_dir):
    """Gap-based sessionization of per-entity timelines (north-rule op;
    batch twin of Structured Streaming session_window)."""
    ev = _events(spark, sf_dir).select("user_id", "ts")
    out = TP.session_bounds(ev, ["user_id"], "ts", gap_seconds=_SESSION_GAP_S)
    return out.withColumn("session_id", F.col("session_id").cast("long")).withColumn(
        "n_events", F.col("n_events").cast("long")
    )


@query(
    "rolling_window",
    """SELECT user_id, ts,
              round(sum(value) OVER w, 6) AS roll_sum_1h,
              count(value) OVER w::BIGINT AS roll_cnt_1h
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""",
)
def q_rolling_window(spark, sf_dir):
    """Leakage-safe trailing time-range aggregates (frame ends at the
    current row — never reads the future)."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    out = TP.rolling_agg(
        ev, ["user_id"], "ts", "value", 3600.0,
        aggs={"roll_sum_1h": "sum", "roll_cnt_1h": "count"},
    )
    return out.select(
        "user_id", "ts", F.round("roll_sum_1h", 6).alias("roll_sum_1h"),
        F.col("roll_cnt_1h").cast("long").alias("roll_cnt_1h"),
    )


@query(
    "resample_ffill",
    """WITH bounds AS (
         SELECT user_id, min(ts) AS t0, max(ts) AS t1 FROM events GROUP BY user_id),
       grid AS (
         SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS t FROM bounds)
       SELECT g.user_id, g.t, e.value AS value FROM grid g
       ASOF LEFT JOIN events e ON g.user_id = e.user_id AND g.t >= e.ts""",
)
def q_resample_ffill(spark, sf_dir):
    """Resample to a dense hourly grid + as-of forward fill — the Spark
    recast of the reference resample() (pliers/utils/base.py:173-248:
    step-fill + regular-grid interpolation, grid via sequence+explode)."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    grid = TP.resample_grid(ev, ["user_id"], "ts", 3600).withColumnRenamed("ts", "t")
    out = A.asof_join(grid, ev, ["user_id"], "t", "ts", ["value"], matched_ts_col=None)
    return out.select("user_id", "t", "value")


@query(
    "interval_join",
    f"""WITH flagged AS (
         SELECT user_id, ts, value,
                CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch(ts) - epoch(lag(ts) OVER w) > {_SESSION_GAP_S}
                     THEN 1 ELSE 0 END AS is_new
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       sess AS (
         SELECT user_id, ts, value,
                sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         FROM flagged),
       intervals AS (
         SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end
         FROM sess GROUP BY user_id, session_id)
       SELECT i.user_id, i.session_id::BIGINT AS session_id,
              round(avg(e.value), 6) AS mean_value, count(*)::BIGINT AS n_in
       FROM intervals i JOIN events e
         ON e.user_id = i.user_id AND e.ts >= i.session_start AND e.ts <= i.session_end
       GROUP BY i.user_id, i.session_id""",
)
def q_interval_join(spark, sf_dir):
    """Interval/range join + per-interval aggregate — MeanAmplitudeExtractor
    recast (aggregate samples inside each word interval,
    pliers/extractors/audio.py:116-147)."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    intervals = TP.session_bounds(ev, ["user_id"], "ts", gap_seconds=_SESSION_GAP_S).select(
        "user_id", "session_id", "session_start", "session_end"
    )
    joined = intervals.join(ev, "user_id").where(
        (F.col("ts") >= F.col("session_start")) & (F.col("ts") <= F.col("session_end"))
    )
    return joined.groupBy("user_id", F.col("session_id").cast("long").alias("session_id")).agg(
        F.round(F.avg("value"), 6).alias("mean_value"),
        F.count(F.lit(1)).alias("n_in"),
    )


@query(
    "object_id",
    """SELECT user_id, event_type, ts,
              (row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts) - 1)::BIGINT AS object_id
       FROM events""",
)
def q_object_id(spark, sf_dir):
    """object_id group-cumcount (pliers/extractors/base.py:155-164)."""
    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    out = TP.with_object_id(ev, ["user_id", "event_type"], "ts")
    return out.withColumn("object_id", F.col("object_id").cast("long"))


@query(
    "top_n_by_change",
    """WITH d AS (
         SELECT user_id, ts, value,
                abs(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts)) AS chg
         FROM events),
       r AS (
         SELECT user_id, ts, value, chg,
                row_number() OVER (PARTITION BY user_id ORDER BY chg DESC, ts) AS rk
         FROM d WHERE chg IS NOT NULL)
       SELECT user_id, ts, value, round(chg, 6) AS chg FROM r WHERE rk <= 3""",
)
def q_top_n_by_change(spark, sf_dir):
    """Top-n rows by inter-row change — FrameSamplingFilter(top_n) recast
    (lag-diff + rank, pliers/filters/video.py:55-67)."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    out = TP.top_n_by_change(ev, ["user_id"], "ts", "value", 3)
    return out.select("user_id", "ts", "value", F.round("_chg", 6).alias("chg"))


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "events_pivot",
    "SELECT user_id, "
    + ", ".join(
        f"count(CASE WHEN event_type = '{t}' THEN 1 END)::BIGINT AS n_{t}" for t in _EVENT_TYPES
    )
    + ", "
    + ", ".join(
        f"round(coalesce(sum(CASE WHEN event_type = '{t}' THEN value END), 0.0), 6) AS sum_{t}"
        for t in _EVENT_TYPES
    )
    + " FROM events GROUP BY user_id",
)
def q_events_pivot(spark, sf_dir):
    """Long→wide pivot with static categories (merge_results pivot recast,
    pliers/extractors/base.py:312-340) — conditional aggregation keeps it
    a single shuffle (no second pivot pass)."""
    ev = _events(spark, sf_dir)
    aggs = [
        F.count(F.when(F.col("event_type") == t, F.lit(1))).alias(f"n_{t}") for t in _EVENT_TYPES
    ] + [
        F.round(F.coalesce(F.sum(F.when(F.col("event_type") == t, F.col("value"))), F.lit(0.0)), 6).alias(f"sum_{t}")
        for t in _EVENT_TYPES
    ]
    return ev.groupBy("user_id").agg(*aggs)


# --------------------------------------------------------------------------
# general relational capability (TPC-H-style over the star schema)


@query(
    "tpch_q1",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 6) AS sum_qty,
              round(sum(l_extendedprice), 6) AS sum_base_price,
              round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
              round(avg(l_quantity), 6) AS avg_qty,
              round(avg(l_discount), 6) AS avg_disc,
              count(*)::BIGINT AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus""",
)
def q_tpch_q1(spark, sf_dir):
    """Pricing-summary aggregate (MetricExtractor-style scalar reductions
    at relational scale; predicate pushed to the parquet scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "tpch_q3",
    """SELECT l.l_orderkey,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
              o.o_orderdate, o.o_orderpriority
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE c.c_mktsegment = 'BUILDING'
         AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
       GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
       ORDER BY revenue DESC, l.l_orderkey
       LIMIT 10""",
)
def q_tpch_q3(spark, sf_dir):
    """Shipping-priority (TPC-H Q3 shape): selective dim filter pushed
    to the customer scan, customer⋈orders broadcast (filtered dim),
    orders⋈lineitem on the fact key, partial-agg revenue, distributed
    top-k (TakeOrderedAndProject — no global sort). The multi-join
    demonstrates Catalyst join reordering + AQE over a star schema;
    nothing hand-scheduled."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5",
    """SELECT n.n_name,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
                      AND c.c_nationkey = s.s_nationkey
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       WHERE r.r_name = 'ASIA'
         AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       GROUP BY n.n_name""",
)
def q_tpch_q5(spark, sf_dir):
    """Local-supplier-volume (TPC-H Q5 shape): a 6-table star join with
    a region→nation snowflake filter, the classic co-location predicate
    (customer and supplier share a nation), and a per-nation revenue
    rollup. region/nation/supplier/customer are broadcast dims; the
    fact-side orders⋈lineitem shuffles once on the order key. The
    canonical 'let Catalyst reorder it' benchmark shape."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
            ).alias("revenue")
        )
    )


@query(
    "top_customers",
    """WITH rev AS (
         SELECT o.o_custkey, sum(o.o_totalprice) AS revenue
         FROM orders o GROUP BY o.o_custkey),
       ranked AS (
         SELECT c.c_custkey, c.c_name, round(r.revenue, 6) AS revenue,
                row_number() OVER (ORDER BY r.revenue DESC, c.c_custkey) AS rk
         FROM rev r JOIN customer c ON c.c_custkey = r.o_custkey)
       SELECT c_custkey, c_name, revenue FROM ranked WHERE rk <= 10""",
)
def q_top_customers(spark, sf_dir):
    """Broadcast dim join + agg + deterministic top-k."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rev = orders.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("revenue"))
    joined = rev.join(F.broadcast(cust), rev.o_custkey == cust.c_custkey)
    # orderBy+limit → TakeOrderedAndProject (distributed heap top-k), not
    # a single-partition global row_number window.
    return (
        joined.select("c_custkey", "c_name", F.col("revenue"))
        .orderBy(F.desc("revenue"), F.col("c_custkey"))
        .limit(10)
        .select("c_custkey", "c_name", F.round("revenue", 6).alias("revenue"))
    )


# --------------------------------------------------------------------------
# dedup / similarity / fingerprints over documents & embeddings
# (training-data pipeline operators; hashes are md5-derived so the DuckDB
# oracle reproduces them bit-for-bit — see functions/hashing.py)


def _tok_sql(src: str = "trim(text)") -> str:
    return f"string_split({src}, ' ')"


_URL_SYNTH_SQL = """(CASE WHEN doc_id % 2 = 1 THEN 'https://' ELSE 'http://' END)
             || 'www.site' || CAST(doc_id % 50 AS VARCHAR)
             || '.example' || CAST(doc_id % 7 AS VARCHAR)
             || '.com/sec' || CAST(doc_id % 5 AS VARCHAR)
             || '/page' || CAST(doc_id % 11 AS VARCHAR)
             || (CASE WHEN doc_id % 3 = 0 THEN '?q=spark' ELSE '' END)"""

_URL_HOST_SQL = "regexp_extract(url, '^[a-z]+://([^/]+)', 1)"
_URL_PATH_SQL = "regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1)"


@query(
    "dedup_exact",
    f"""SELECT {md5_int_sql('text')} AS text_hash,
              min(doc_id)::BIGINT AS keep_id, count(*)::BIGINT AS n_dups
       FROM documents GROUP BY 1""",
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup via hash-groupBy (keep-first semantics of the reference
    batch dedup, pliers/transformers/base.py:241-247)."""
    out = D.exact_dedup(_docs(spark, sf_dir), "text", "doc_id")
    return out.select("text_hash", F.col("keep_id").cast("long").alias("keep_id"),
                      F.col("n_dups").cast("long").alias("n_dups"))


_MH_K = 8
_MH_BANDS = 4
_MH_SHINGLE = 2


def _minhash_cte() -> str:
    """Oracle mirror of ``dedup.minhash_signatures``: explode shingles,
    ONE md5 per shingle masked to 30 bits, K Carter–Wegman permutations
    ``(a_k·h + b_k) mod p`` (identical parameter list, products < 2^60
    so BIGINT-exact in both engines), min per family."""
    from pliers_spark.functions.hashing import (
        MINHASH_MASK30, minhash_params, minhash_permute_sql)

    join = " || ' ' || ".join(f"toks[i+{j}]" for j in range(_MH_SHINGLE))
    params = minhash_params(_MH_K)
    sigs = ", ".join(
        f"min({minhash_permute_sql('h30', a, b)}) AS mh_{k}"
        for k, (a, b) in enumerate(params)
    )
    return f"""WITH base AS (
         SELECT doc_id, {_tok_sql()} AS toks FROM documents),
       sh_t AS (
         SELECT doc_id,
                list_transform(range(1, greatest(len(toks) - {_MH_SHINGLE - 2}, 1)),
                               i -> {join}) AS sh
         FROM base),
       sh_e AS (
         SELECT doc_id,
                unnest(CASE WHEN len(sh) = 0 THEN [NULL] ELSE sh END) AS s
         FROM sh_t),
       hashed AS (
         SELECT doc_id,
                CAST({md5_int_sql('s')} AS BIGINT) & {MINHASH_MASK30} AS h30
         FROM sh_e),
       sigs AS (SELECT doc_id, {sigs} FROM hashed GROUP BY doc_id)"""


def _band_key_sql(b: int, rows: int) -> str:
    concat = " || '|' || ".join(f"CAST(mh_{b * rows + j} AS VARCHAR)" for j in range(rows))
    return md5_int_sql(f"({concat})", seed=10_000 + b)


@query(
    "minhash_signatures",
    _minhash_cte() + " SELECT doc_id, " + ", ".join(f"mh_{k}" for k in range(_MH_K)) + " FROM sigs",
)
def q_minhash_signatures(spark, sf_dir):
    """MinHash signatures over word-2-gram shingles — one md5 per
    shingle + Carter–Wegman families in whole-stage codegen, partial-agg
    mins (the scale path for near-dup at 10^12 docs)."""
    return D.minhash_signatures(_docs(spark, sf_dir), "text", "doc_id", _MH_K, _MH_SHINGLE)


_ROWS_PER_BAND = _MH_K // _MH_BANDS

_MINHASH_PAIRS_SQL = (
    _minhash_cte()
    + f""",
       banded AS (
         SELECT doc_id, unnest([{', '.join(_band_key_sql(b, _ROWS_PER_BAND) for b in range(_MH_BANDS))}]) AS band_key
         FROM sigs)
       SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       FROM banded a JOIN banded b USING (band_key)
       WHERE a.doc_id < b.doc_id"""
)


@query("minhash_lsh", _MINHASH_PAIRS_SQL)
def q_minhash_lsh(spark, sf_dir):
    """MinHash+LSH candidate pairs: band the signatures, bucket-join —
    near-dup candidate generation without all-pairs comparison."""
    return D.minhash_lsh_candidates(
        _docs(spark, sf_dir), "text", "doc_id", _MH_K, _MH_BANDS, _MH_SHINGLE
    )


def _lsh_recall_sql() -> str:
    banded = ", ".join(_band_key_sql(b, _ROWS_PER_BAND) for b in range(_MH_BANDS))
    return (
        _minhash_cte()
        + f""",
       banded AS (
         SELECT doc_id, unnest([{banded}]) AS band_key FROM sigs),
       cand AS (
         SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM banded a JOIN banded b USING (band_key)
         WHERE a.doc_id < b.doc_id),
       shd AS (SELECT DISTINCT doc_id, s FROM sh_e WHERE s IS NOT NULL),
       sizes AS (SELECT doc_id, count(*) AS set_size FROM shd GROUP BY 1),
       inter AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         FROM shd a JOIN shd b USING (s)
         WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
       truth AS (
         SELECT id_a, id_b FROM inter
         JOIN sizes sa ON sa.doc_id = id_a
         JOIN sizes sb ON sb.doc_id = id_b
         WHERE round(inter::DOUBLE / (sa.set_size + sb.set_size - inter), 6) >= 0.5),
       agg AS (
         SELECT (SELECT count(*) FROM truth)::BIGINT AS n_truth,
                (SELECT count(*) FROM cand)::BIGINT AS n_candidates,
                (SELECT count(*) FROM truth t JOIN cand c
                  ON t.id_a = c.id_a AND t.id_b = c.id_b)::BIGINT AS n_hits)
       SELECT n_truth, n_candidates, n_hits,
              CASE WHEN n_truth = 0 THEN NULL
                   ELSE round(n_hits::DOUBLE / n_truth, 6) END AS recall
       FROM agg"""
    )


@query("lsh_recall", _lsh_recall_sql())
def q_lsh_recall(spark, sf_dir):
    """Dedup-quality audit: MinHash-LSH candidate recall against the
    EXACT shingle-Jaccard truth at t=0.5 (same shingle convention and
    banding as `minhash_lsh`). The number a curation pipeline must
    publish before trusting probabilistic dedup — banding has a known
    miss curve (1-(1-t^r)^b) and this measures the realized one. Both
    pipelines are deterministic, so even this meta-metric carries a full
    oracle. At production scale the truth side runs on a hash-sampled
    slice; the LSH side is the production operator unchanged."""
    docs = _docs(spark, sf_dir)
    truth = D.ngram_jaccard_pairs(
        docs, "text", "doc_id", n=_MH_SHINGLE, threshold=0.5
    ).select("id_a", "id_b")
    cand = D.minhash_lsh_candidates(
        docs, "text", "doc_id", _MH_K, _MH_BANDS, _MH_SHINGLE
    ).select("id_a", "id_b")
    j = truth.withColumn("_t", F.lit(1)).join(
        cand.withColumn("_c", F.lit(1)), ["id_a", "id_b"], "full"
    )
    agg = j.agg(
        F.coalesce(F.sum("_t"), F.lit(0)).cast("long").alias("n_truth"),
        F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_candidates"),
        F.coalesce(
            F.sum(F.when(F.col("_t").isNotNull() & F.col("_c").isNotNull(), 1)),
            F.lit(0),
        ).cast("long").alias("n_hits"),
    )
    return agg.withColumn(
        "recall",
        F.when(
            F.col("n_truth") > 0, F.round(F.col("n_hits") / F.col("n_truth"), 6)
        ),
    )


_SIMHASH_BITS = 16


def _simhash_sql() -> str:
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{b}"
        for b in range(_SIMHASH_BITS)
    )
    recomb = " + ".join(f"(CASE WHEN v_{b} > 0 THEN {2**b} ELSE 0 END)" for b in range(_SIMHASH_BITS))
    return f"""WITH toks AS (
         SELECT doc_id, unnest({_tok_sql()}) AS token FROM documents),
       hashed AS (
         SELECT doc_id, {md5_int_sql('token')} AS h FROM toks),
       votes AS (
         SELECT doc_id, {votes} FROM hashed GROUP BY doc_id)
       SELECT doc_id, ({recomb})::BIGINT AS simhash FROM votes"""


@query("simhash", _simhash_sql())
def q_simhash(spark, sf_dir):
    """SimHash fingerprints (per-bit majority vote of token hashes) —
    Hamming-distance near-dup at constant per-doc cost."""
    return D.simhash_fingerprints(_docs(spark, sf_dir), "text", "doc_id", bits=_SIMHASH_BITS)


@query(
    "ngram_jaccard",
    """WITH toks AS (
         SELECT DISTINCT doc_id, unnest(string_split(trim(text), ' ')) AS sh FROM documents),
       sizes AS (SELECT doc_id, count(*) AS set_size FROM toks GROUP BY doc_id),
       inter AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         FROM toks a JOIN toks b USING (sh)
         WHERE a.doc_id < b.doc_id
         GROUP BY a.doc_id, b.doc_id)
       SELECT id_a, id_b,
              round(inter::DOUBLE / (sa.set_size + sb.set_size - inter), 6) AS jaccard
       FROM inter
       JOIN sizes sa ON sa.doc_id = id_a
       JOIN sizes sb ON sb.doc_id = id_b
       WHERE inter::DOUBLE / (sa.set_size + sb.set_size - inter) >= 0.6""",
)
def q_ngram_jaccard(spark, sf_dir):
    """Exact token-set Jaccard for pairs sharing ≥1 token (inverted-index
    join — never |docs|² on sparse overlap)."""
    return D.ngram_jaccard_pairs(_docs(spark, sf_dir), "text", "doc_id", n=1, threshold=0.6)


@query(
    "prefix_filter_jaccard",
    """WITH toks AS (
         SELECT DISTINCT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
       sizes AS (SELECT doc_id, count(*) AS set_size FROM toks GROUP BY doc_id),
       inter AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter_size
         FROM toks a JOIN toks b USING (tok)
         WHERE a.doc_id < b.doc_id
         GROUP BY 1, 2)
       SELECT id_a, id_b,
              inter_size::BIGINT AS inter_size,
              (sa.set_size + sb.set_size - inter_size)::BIGINT AS union_size,
              round(inter_size::DOUBLE / (sa.set_size + sb.set_size - inter_size), 6) AS jaccard
       FROM inter
       JOIN sizes sa ON sa.doc_id = id_a
       JOIN sizes sb ON sb.doc_id = id_b
       WHERE 5 * inter_size >= 3 * (sa.set_size + sb.set_size - inter_size)""",
)
def q_prefix_filter_jaccard(spark, sf_dir):
    """EXACT Jaccard near-dup join via positional prefix filtering
    (Chaudhuri ICDE'06 / PPJoin) at t = 3/5. The engine explodes only
    each doc's rarest ``L - ceil(t·L) + 1`` tokens (ascending-DF global
    order) so the inverted index never contains Zipf-head tokens; the
    oracle is the brute-force all-pairs join — set equality IS the
    prefix-filter correctness theorem."""
    return D.prefix_filter_jaccard_pairs(
        _docs(spark, sf_dir), "text", "doc_id", threshold_num=3, threshold_den=5
    )


def _pagerank_sql(iterations: int = 10, n_hosts: int = 50, links: int = 3) -> str:
    """K-unrolled chained-CTE PageRank oracle: the same fixed-point
    integer recurrence as operators.graph.pagerank, one CTE per round
    (aggregation is not allowed in a recursive term, and unrolling makes
    the oracle a pure function DuckDB optimizes as a straight DAG)."""
    def dst(j: int) -> str:
        h = md5_int_sql(f"concat(doc_id::VARCHAR, ':{j}')")
        return f"({h} % {n_hosts})::BIGINT"
    link_union = " UNION ALL ".join(
        f"SELECT (doc_id % {n_hosts})::BIGINT AS src, {dst(j)} AS dst FROM documents"
        for j in range(links)
    )
    base = "(3000000000 // (20 * (SELECT count(*) FROM nodes)))"
    ctes = [
        f"edges AS (SELECT DISTINCT src, dst FROM ({link_union}) WHERE src != dst)",
        "nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION SELECT dst FROM edges))",
        "outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1)",
        "r0 AS (SELECT node, 1000000000 // (SELECT count(*) FROM nodes) AS rank_fp FROM nodes)",
    ]
    for k in range(iterations):
        ctes.append(
            f"""r{k + 1} AS (
              SELECT n.node, {base} + (17 * coalesce(s.i, 0)) // 20 AS rank_fp
              FROM nodes n LEFT JOIN (
                SELECT e.dst AS node, sum(r.rank_fp // o.outdeg) AS i
                FROM edges e JOIN r{k} r ON r.node = e.src
                JOIN outdeg o ON o.src = e.src
                GROUP BY 1) s USING (node))"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
        SELECT node, rank_fp::BIGINT AS rank_fp,
               round(rank_fp / 1000000000, 6) AS rank
        FROM r{iterations}"""
    )


@query("host_pagerank", _pagerank_sql())
def q_host_pagerank(spark, sf_dir):
    """Host-level PageRank (Page et al. 1999, simplified variant) over
    the deterministic doc→host link graph, 10 rounds of the exact
    fixed-point integer recurrence — bit-identical to the oracle's
    unrolled CTE chain, no float accumulation anywhere."""
    from .operators.graph import host_link_edges, pagerank

    return pagerank(host_link_edges(_docs(spark, sf_dir)), iterations=10)


@query(
    "doc_authority",
    f"""WITH pr AS ({_pagerank_sql()})
       SELECT d.doc_id, (d.doc_id % 50)::BIGINT AS host, pr.rank_fp
       FROM documents d JOIN pr ON pr.node = d.doc_id % 50""",
)
def q_doc_authority(spark, sf_dir):
    """Attach the host-PageRank authority prior to every document —
    the curation signal a sampling/weighting stage consumes: rank table
    is per-HOST (tiny), so the attachment is a broadcast join; the
    corpus scan never shuffles."""
    from .operators.graph import host_link_edges, pagerank

    docs = _docs(spark, sf_dir)
    pr = pagerank(host_link_edges(docs), iterations=10)
    return docs.select(
        "doc_id", F.pmod(F.col("doc_id"), F.lit(50)).alias("host")
    ).join(F.broadcast(pr), F.col("host") == F.col("node")).select(
        "doc_id", "host", "rank_fp"
    )


@query(
    "exact_substr_spans",
    f"""WITH toks AS (
         SELECT doc_id, {_tok_sql()} AS t FROM documents),
       pos AS (
         SELECT doc_id, t, unnest(range(len(t)))::BIGINT AS pos FROM toks),
       wins AS (
         SELECT doc_id, pos,
                {md5_int_sql("array_to_string(t[pos+1:pos+8], ' ')")} AS h
         FROM pos WHERE pos + 8 <= len(t)),
       census AS (SELECT h, count(*) AS cnt FROM wins GROUP BY 1),
       flagged AS (
         SELECT w.doc_id, w.pos FROM wins w JOIN census c USING (h)
         WHERE c.cnt >= 2),
       marked AS (
         SELECT doc_id, pos,
                CASE WHEN pos > coalesce(max(pos+8) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                     THEN 1 ELSE 0 END AS brk
         FROM flagged),
       isl AS (
         SELECT doc_id, pos,
                sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         FROM marked)
       SELECT doc_id, min(pos)::BIGINT AS span_start,
              (max(pos)+7)::BIGINT AS span_end,
              (max(pos)+8-min(pos))::BIGINT AS span_len
       FROM isl GROUP BY doc_id, island""",
)
def q_exact_substr_spans(spark, sf_dir):
    """Maximal duplicated token spans — the ExactSubstr curation role
    (Lee et al. 2022): 8-token windows occurring ≥2 times anywhere in
    the corpus, merged per doc into maximal intervals. Census is on the
    60-bit gram hash in BOTH engines, so hash collisions (if any) are
    identical and the match stays exact."""
    return D.exact_substr_spans(_docs(spark, sf_dir), "text", "doc_id", 8, 2)


@query(
    "exact_substr_cut",
    f"""WITH toks0 AS (
         SELECT doc_id, {_tok_sql()} AS t FROM documents),
       posn AS (
         SELECT doc_id, t, unnest(range(len(t)))::BIGINT AS pos FROM toks0),
       wins AS (
         SELECT doc_id, pos,
                {md5_int_sql("array_to_string(t[pos+1:pos+8], ' ')")} AS h
         FROM posn WHERE pos + 8 <= len(t)),
       census AS (SELECT h, count(*) AS cnt FROM wins GROUP BY 1),
       flagged AS (
         SELECT w.doc_id, w.pos FROM wins w JOIN census c USING (h)
         WHERE c.cnt >= 2),
       covered AS (
         SELECT DISTINCT doc_id, pos + u AS pos
         FROM flagged, (SELECT unnest(range(8)) AS u)),
       toks AS (SELECT doc_id, pos, t[pos+1] AS tok FROM posn),
       kept AS (
         SELECT k.doc_id, k.pos, k.tok FROM toks k
         LEFT JOIN covered c ON c.doc_id = k.doc_id AND c.pos = k.pos
         WHERE c.pos IS NULL),
       rebuilt AS (
         SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                count(*) AS kept_n
         FROM kept GROUP BY doc_id),
       totals AS (SELECT doc_id, count(*) AS n_tokens FROM toks GROUP BY 1)
       SELECT t.doc_id, coalesce(r.clean_text, '') AS clean_text,
              t.n_tokens::BIGINT AS n_tokens,
              (t.n_tokens - coalesce(r.kept_n, 0))::BIGINT AS n_removed
       FROM totals t LEFT JOIN rebuilt r USING (doc_id)""",
)
def q_exact_substr_cut(spark, sf_dir):
    """ExactSubstr rewrite (Lee et al. 2022): documents with every
    token covered by a duplicated 8-token window removed — the actual
    deduplicated training corpus, where `exact_substr_spans` is the
    audit. Fully-duplicated docs return as empty strings (the explicit
    drop signal for the next filter stage), never silently vanish."""
    return D.exact_substr_cut(_docs(spark, sf_dir), "text", "doc_id", 8, 2)


@query(
    "doc_fingerprint",
    f"""WITH base AS (SELECT doc_id, {_tok_sql()} AS toks FROM documents),
       sh_t AS (
         SELECT doc_id,
                list_transform(range(1, greatest(len(toks) - 1, 1)),
                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS sh
         FROM base)
       SELECT doc_id, list_min(list_transform(sh, s -> {md5_int_sql('s', seed=777)}))::BIGINT AS fingerprint
       FROM sh_t""",
)
def q_doc_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprint (min shingle hash — winnowing-style
    content signature)."""
    from pliers_spark.functions.hashing import rolling_fingerprint

    return _docs(spark, sf_dir).select(
        "doc_id", rolling_fingerprint(T.tokenize(F.col("text")), n=3).alias("fingerprint")
    )


# --- embeddings: similarity search -----------------------------------------

_DOT_SQL = "list_sum(list_transform(range(1, len(a.embedding)+1), i -> a.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE))"
_NORM_A = "sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))"
_NORM_Q = "sqrt(list_sum(list_transform(q.embedding, x -> x::DOUBLE * x::DOUBLE)))"


@query(
    "embedding_topk",
    f"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
       scored AS (
         SELECT q.vec_id AS q_id, a.vec_id AS c_id,
                round({_DOT_SQL} / ({_NORM_A} * {_NORM_Q}), 6) AS cosine
         FROM embeddings a, q WHERE a.vec_id <> q.vec_id),
       ranked AS (
         SELECT q_id, c_id, cosine,
                row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
         FROM scored)
       SELECT q_id, c_id, cosine, rank::BIGINT AS rank FROM ranked WHERE rank <= 5""",
)
def q_embedding_topk(spark, sf_dir):
    """Brute-force exact cosine top-k (correctness baseline for ANN):
    broadcast query set, JVM zip_with dot products, per-query rank window."""
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 8)
    out = S.cosine_topk(emb, qs, "vec_id", "embedding", "vec_id", "embedding", k=5)
    return out.select("q_id", "c_id", "cosine", F.col("rank").cast("long").alias("rank"))


@query(
    "ann_ivf_topk",
    f"""WITH q AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 8),
       scored AS (
         SELECT q.vec_id AS q_id, a.vec_id AS c_id,
                round({_DOT_SQL} / ({_NORM_A} * {_NORM_Q}), 6) AS cosine
         FROM embeddings a JOIN q ON a.label = q.label AND a.vec_id <> q.vec_id),
       ranked AS (
         SELECT q_id, c_id, cosine,
                row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
         FROM scored)
       SELECT q_id, c_id, cosine, rank::BIGINT AS rank FROM ranked WHERE rank <= 5""",
)
def q_ann_ivf_topk(spark, sf_dir):
    """IVF-style ANN: probe only the query's coarse partition (label as
    the cluster id) — the bucket-gated scale path; candidates shrink by
    the bucket fan-out."""
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 8)
    out = S.ivf_topk(emb, qs, "vec_id", "embedding", "vec_id", "embedding", "label", k=5)
    return out.select("q_id", "c_id", "cosine", F.col("rank").cast("long").alias("rank"))


@query(
    "embedding_near_dups",
    f"""WITH pairs AS (
         SELECT a.vec_id AS id_a, q.vec_id AS id_b,
                round({_DOT_SQL} / ({_NORM_A} * {_NORM_Q}), 6) AS cosine
         FROM embeddings a JOIN embeddings q ON a.label = q.label AND a.vec_id < q.vec_id)
       SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.9""",
)
def q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, bucket-gated by the coarse
    cluster id (label) — never all-pairs."""
    emb = load_table(spark, sf_dir, "embeddings")
    return D.embedding_near_dups(emb, "vec_id", "embedding", threshold=0.9, bucket_col="label")


def _semantic_dedup_sql() -> str:
    from pliers_spark.operators.dedup import semantic_dedup_sql

    return semantic_dedup_sql(tau_num=2, tau_den=5)


@query("semantic_dedup", _semantic_dedup_sql())
def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embedding
    column (the engine's IVF coarse quantizer), then inside each
    cluster drop the centroid-farther member of every pair whose
    cosine >= tau. The cosine gate and loser rule are pure int64
    arithmetic (milli-unit coordinates, cross-multiplied squares —
    no float, no sqrt), evaluated as ONE exact numpy Gram matmul per
    cluster (applyInPandas), so the verdict column is bit-stable
    across engines and the hot path is vectorized, never an
    interpreted per-pair fold. tau here is 2/5: the synthetic
    embeddings are near-orthogonal random vectors with no true
    semantic duplicates (max intra-cluster cosine ~0.49), so the
    production default 0.95 would never fire — the lowered gate
    makes the drop path (20 rows at sf0.01) part of the checked
    surface rather than dead code."""
    from pliers_spark.operators.dedup import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, "vec_id", "embedding", k=8, tau_num=2, tau_den=5)


# --------------------------------------------------------------------------
# batch 4: stopword removal, stemming, POS tagging, embeddings, metric
# extraction, diagnostics

_STOPWORD_SQL_LIST = ", ".join(f"'{w}'" for w in T.ENGLISH_STOPWORDS)


@query(
    "remove_stopwords",
    f"""SELECT doc_id,
              array_to_string(list_filter(string_split(trim(text), ' '),
                              t -> NOT list_contains([{_STOPWORD_SQL_LIST}], lower(t))), ' ')
                AS filtered_text
       FROM documents""",
)
def q_remove_stopwords(spark, sf_dir):
    """TokenRemovalFilter — drop stopwords, preserve order & duplicates,
    re-join with ' ' (pliers/filters/text.py:148-183)."""
    lowered_match = F.filter(
        T.tokenize(F.col("text")), lambda t: ~F.lower(t).isin(*T.ENGLISH_STOPWORDS)
    )
    return _docs(spark, sf_dir).select(
        "doc_id", F.array_join(lowered_match, " ").alias("filtered_text")
    )


def _porter_sql() -> str:
    # full Porter 1980 rule cascade as DuckDB SQL, generated from the same
    # step tables as the Python engine (functions/stemming.porter_sql_ctes;
    # differentially tested on random words in tests/test_stemming.py) —
    # stems computed once per DISTINCT token, then joined back.
    from pliers_spark.functions.stemming import porter_sql_ctes

    body, out_col = porter_sql_ctes()
    return f"""WITH toks AS (
         SELECT doc_id,
                unnest(range(len(string_split(trim(text), ' '))))::BIGINT AS pos,
                unnest(string_split(trim(text), ' ')) AS token
         FROM documents),
       pstem_in AS (SELECT DISTINCT token, lower(token) AS w0 FROM toks),
       {body}
       SELECT t.doc_id, t.pos, t.token, p.{out_col} AS stem
       FROM toks t JOIN pstem_out p USING (token)"""


@query("porter_stem", _porter_sql())
def q_porter_stem(spark, sf_dir):
    """WordStemmingFilter(porter) — clean-room Porter stemmer as a
    vectorized pandas UDF (pliers/filters/text.py:24-110). Oracle: the
    same published rule cascade rendered as DuckDB SQL from one shared
    step table (functions/stemming.porter_sql_ctes)."""
    from pliers_spark.functions.stemming import porter_stem_col

    toks = (
        _docs(spark, sf_dir)
        .select("doc_id", F.posexplode(T.tokenize(F.col("text"))).alias("pos", "token"))
        .withColumn("pos", F.col("pos").cast("long"))
    )
    return toks.withColumn("stem", porter_stem_col(F.col("token")))


def _tag_case_sql() -> str:
    """The suffix/lexicon tagger of functions/pos.py as a DuckDB CASE over
    columns ``w`` (lowered token) and ``prev_w`` (lowered lag(token))."""
    from pliers_spark.functions.pos import (
        CONJUNCTIONS, DETERMINERS, PREPOSITIONS, PRONOUNS, VERBS,
    )

    fmt = lambda s: ", ".join(f"'{w}'" for w in sorted(s))
    return f"""CASE
                WHEN regexp_full_match(replace(replace(w, '.', ''), ',', ''), '[0-9]+') THEN 'CD'
                WHEN list_contains([{fmt(DETERMINERS)}], w) THEN 'DT'
                WHEN prev_w IS NOT NULL AND list_contains([{fmt(DETERMINERS)}], prev_w) THEN 'NN'
                WHEN list_contains([{fmt(PREPOSITIONS)}], w) THEN 'IN'
                WHEN list_contains([{fmt(CONJUNCTIONS)}], w) THEN 'CC'
                WHEN list_contains([{fmt(PRONOUNS)}], w) THEN 'PRP'
                WHEN list_contains([{fmt(VERBS)}], w) THEN 'VB'
                WHEN w LIKE '%ing' THEN 'VBG'
                WHEN w LIKE '%ed' THEN 'VBD'
                WHEN w LIKE '%ly' THEN 'RB'
                WHEN w LIKE '%ous' OR w LIKE '%ful' OR w LIKE '%ive'
                     OR w LIKE '%able' OR w LIKE '%al' THEN 'JJ'
                ELSE 'NN'
              END"""


def _pos_sql() -> str:
    return f"""WITH toks AS (
         SELECT doc_id,
                unnest(range(len(string_split(text, ' '))))::BIGINT AS pos,
                unnest(string_split(text, ' ')) AS token
         FROM documents),
       ctx AS (
         SELECT doc_id, pos, token, lower(token) AS w,
                lower(lag(token) OVER (PARTITION BY doc_id ORDER BY pos)) AS prev_w
         FROM toks)
       SELECT doc_id, pos, token, {_tag_case_sql()} AS tag
       FROM ctx"""


@query("pos_tags", _pos_sql())
def q_pos_tags(spark, sf_dir):
    """PartOfSpeechExtractor — sequence-contextual tagging per document
    via applyInPandas (the tagger sees the whole doc, like the
    reference's batch nltk.pos_tag, pliers/extractors/text.py:204-229)."""
    from pliers_spark.functions.pos import pos_tag_docs

    return pos_tag_docs(_docs(spark, sf_dir)).withColumn("pos", F.col("pos").cast("long"))


_EMB_DIM = 4


def _word_emb_sql() -> str:
    # exact integer-ppm sums + one final division: bit-deterministic
    # across engines (see functions/embeddings.hash_embedding_dim_ppm)
    from pliers_spark.functions.embeddings import hash_embedding_dim_ppm_sql

    dims = ", ".join(
        f"round(sum({hash_embedding_dim_ppm_sql('token', d)})"
        f" / (count(*) * 1000000.0), 6) AS emb_{d}"
        for d in range(_EMB_DIM)
    )
    return f"""WITH toks AS (
         SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents)
       SELECT doc_id, {dims} FROM toks GROUP BY doc_id"""


@query("word_embeddings", _word_emb_sql())
def q_word_embeddings(spark, sf_dir):
    """WordEmbeddingExtractor + mean pooling — token → deterministic
    md5-derived pseudo-vector, per-dimension avg (real models plug in via
    embeddings.embedding_lookup broadcast join;
    pliers/extractors/text.py:232-279)."""
    from pliers_spark.functions.embeddings import doc_mean_embedding

    return doc_mean_embedding(_docs(spark, sf_dir), "doc_id", "text", dim=_EMB_DIM)


@query(
    "metric_extractor",
    """SELECT user_id,
              round(avg(value), 6) AS value_mean,
              round(min(value), 6) AS value_min,
              round(max(value), 6) AS value_max,
              round(stddev_samp(value), 6) AS value_std,
              count(value)::BIGINT AS value_count
       FROM events GROUP BY user_id""",
)
def q_metric_extractor(spark, sf_dir):
    """MetricExtractor — N scalar reductions per series
    (pliers/extractors/misc.py:13-74); named aggregates stay JVM-side."""
    from pliers_spark.operators.metrics import metric_extract

    out = metric_extract(
        _events(spark, sf_dir), ["user_id"], "value", ["mean", "min", "max", "std", "count"]
    )
    return out.select(
        "user_id",
        F.round("value_mean", 6).alias("value_mean"),
        F.round("value_min", 6).alias("value_min"),
        F.round("value_max", 6).alias("value_max"),
        F.round("value_std", 6).alias("value_std"),
        F.col("value_count").cast("long").alias("value_count"),
    )


@query(
    "categorical_entropy",
    """WITH counts AS (
         SELECT user_id, event_type, count(*)::DOUBLE AS c FROM events GROUP BY 1, 2)
       SELECT user_id,
              round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy
       FROM counts GROUP BY user_id""",
)
def q_categorical_entropy(spark, sf_dir):
    """Shannon entropy of the per-user event-type distribution
    (MetricExtractor with scipy.stats.entropy — the reference's example
    custom metric, pliers/tests/extractors/test_misc_extractors.py)."""
    from pliers_spark.operators.metrics import categorical_entropy

    return categorical_entropy(_events(spark, sf_dir), ["user_id"], "event_type")


@query(
    "feature_correlations",
    """WITH f AS (
         SELECT length(trim(text))::DOUBLE AS text_length,
                len(string_split(trim(text), ' '))::DOUBLE AS n_tokens,
                len(list_distinct(string_split(trim(text), ' ')))::DOUBLE AS n_unique
         FROM documents)
       SELECT round(corr(text_length, n_tokens), 6) AS corr_len_tokens,
              round(corr(text_length, n_unique), 6) AS corr_len_unique,
              round(corr(n_tokens, n_unique), 6) AS corr_tokens_unique
       FROM f""",
)
def q_feature_correlations(spark, sf_dir):
    """Diagnostics: correlation matrix over the merged feature table
    (pliers/diagnostics/base.py:12-214 correlation_matrix) — pairwise
    corr aggregates, one pass."""
    f = _docs(spark, sf_dir).select(
        T.text_length("text").cast("double").alias("text_length"),
        T.token_count("text").cast("double").alias("n_tokens"),
        T.num_unique_words("text").cast("double").alias("n_unique"),
    )
    return f.agg(
        F.round(F.corr("text_length", "n_tokens"), 6).alias("corr_len_tokens"),
        F.round(F.corr("text_length", "n_unique"), 6).alias("corr_len_unique"),
        F.round(F.corr("n_tokens", "n_unique"), 6).alias("corr_tokens_unique"),
    )


def _vader_oracle_sql() -> str:
    from pliers_spark.functions.vader import vader_sql

    return vader_sql()


@query("vader_sentiment", _vader_oracle_sql())
def q_vader_sentiment(spark, sf_dir):
    """VADERSentimentExtractor — clean-room VADER rule engine (golden
    values pinned in tests/test_vader.py; nltk used when importable for
    exact reference parity; pliers/extractors/text.py:318-336). Oracle:
    the full rule engine rendered as DuckDB SQL from the same lexicon
    and constants (functions/vader.vader_sql), differentially tested on
    randomized texts exercising every rule."""
    from pliers_spark.functions.vader import with_vader

    return with_vader(_docs(spark, sf_dir).select("doc_id", "text")).drop("text")


@query(
    "resample_interpolate",
    """WITH bounds AS (
         SELECT user_id, min(ts) AS t0, max(ts) AS t1 FROM events GROUP BY user_id),
       grid AS (
         SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 6 HOUR)) AS t FROM bounds),
       prev AS (
         SELECT g.user_id, g.t, e.ts AS pts, e.value AS pv
         FROM grid g ASOF LEFT JOIN events e ON g.user_id = e.user_id AND g.t >= e.ts),
       nxt AS (
         SELECT g.user_id, g.t, e.ts AS nts, e.value AS nv
         FROM grid g ASOF LEFT JOIN events e ON g.user_id = e.user_id AND g.t <= e.ts)
       SELECT p.user_id, p.t,
              round(CASE
                WHEN p.pts IS NULL OR n.nts IS NULL THEN NULL
                WHEN epoch(p.pts) = epoch(n.nts) THEN p.pv
                ELSE p.pv + (n.nv - p.pv) * (epoch(p.t) - epoch(p.pts))
                            / (epoch(n.nts) - epoch(p.pts))
              END, 6) AS value_interp
       FROM prev p JOIN nxt n ON p.user_id = n.user_id AND p.t = n.t""",
)
def q_resample_interpolate(spark, sf_dir):
    """Linear interpolation onto a regular grid — the reference
    resample()'s interp1d step generalized (pliers/utils/base.py:235-239);
    future-reading upper bracket flagged (offline/label use)."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    grid = TP.resample_grid(ev, ["user_id"], "ts", 6 * 3600).withColumnRenamed("ts", "t")
    return TP.interpolate_linear(ev, grid, ["user_id"], "ts", "t", "value")


# --------------------------------------------------------------------------
# batch 5: framed aggregation, simhash near-dups, diagnostics, n-grams,
# vector norms, tumbling windows


@query(
    "framed_agg",
    """WITH e AS (
         SELECT user_id, epoch(ts) - epoch(TIMESTAMP '2024-01-01 00:00:00') AS off, value
         FROM events WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'),
       f AS (
         SELECT user_id, value,
                unnest(range(greatest(floor((off - 7200.0) / 3600.0)::BIGINT + 1, 0),
                             floor(off / 3600.0)::BIGINT + 1)) AS frame_id
         FROM e)
       SELECT user_id, frame_id, count(value)::BIGINT AS n_events,
              round(sum(value), 6) AS value_sum
       FROM f GROUP BY 1, 2""",
)
def q_framed_agg(spark, sf_dir):
    """STFT-style overlapping frame/hop aggregation (frame=2h, hop=1h):
    the framing pattern of the reference's audio extractors
    (pliers/extractors/audio.py:64-113) as a bounded explode + single
    hash agg — no range join, no per-entity sort."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    out = TP.framed_agg(
        ev, ["user_id"], "ts", "value", 7200, 3600,
        origin="2024-01-01 00:00:00",
        aggs={"n_events": "count", "value_sum": "sum"},
    )
    return out.select(
        "user_id", "frame_id",
        F.col("n_events").cast("long").alias("n_events"),
        F.round("value_sum", 6).alias("value_sum"),
    )


def _simhash_sims_cte() -> str:
    """CTE chain ending in ``sims(doc_id, simhash)`` — the fingerprint
    computation shared by the pair oracles and the keep-rule oracle."""
    votes = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{b}"
        for b in range(_SIMHASH_BITS)
    )
    recomb = " + ".join(f"(CASE WHEN v_{b} > 0 THEN {2**b} ELSE 0 END)" for b in range(_SIMHASH_BITS))
    return f"""toks AS (
         SELECT doc_id, unnest({_tok_sql()}) AS token FROM documents),
       hashed AS (
         SELECT doc_id, {md5_int_sql('token')} AS h FROM toks),
       votes AS (
         SELECT doc_id, {votes} FROM hashed GROUP BY doc_id),
       sims AS (
         SELECT doc_id, ({recomb})::BIGINT AS simhash FROM votes)"""


def _simhash_pairs_cte(bands: int = 4, max_hamming: int = 3) -> str:
    """CTE chain ending in ``nd_pairs(id_a, id_b, hamming)`` — shared by
    the near-dup-pairs oracle and the dup-clusters recursive oracle.
    ``bands`` exact slices of the 16-bit fingerprint (pigeonhole needs
    max_hamming < bands for zero false negatives)."""
    assert _SIMHASH_BITS % bands == 0 and max_hamming < bands
    width = _SIMHASH_BITS // bands
    mask = (1 << width) - 1
    band_ids = ", ".join(str(b) for b in range(bands))
    return f"""{_simhash_sims_cte()},
       banded AS (
         SELECT doc_id, simhash, unnest([{band_ids}]) AS band_id FROM sims),
       b2 AS (
         SELECT doc_id, simhash, band_id, (simhash >> (band_id * {width})) & {mask} AS band_val
         FROM banded),
       nd_pairs AS (
         SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
         FROM b2 a JOIN b2 b ON a.band_id = b.band_id AND a.band_val = b.band_val
                             AND a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming})"""


def _simhash_near_dups_sql() -> str:
    return f"WITH {_simhash_pairs_cte()} SELECT id_a, id_b, hamming FROM nd_pairs"


@query("simhash_near_dups", _simhash_near_dups_sql())
def q_simhash_near_dups(spark, sf_dir):
    """SimHash near-dup pairs (Hamming ≤ 3 over 16 bits) via exact banded
    search: pigeonhole guarantees any ≤3-distance pair shares one of 4
    exact 4-bit bands — an equi-join on (band, value), never all-pairs."""
    out = D.simhash_near_dup_pairs(
        _docs(spark, sf_dir), "text", "doc_id", bits=_SIMHASH_BITS, bands=4, max_hamming=3
    )
    return out.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


_F3_SQL = """SELECT length(trim(text))::DOUBLE AS text_length,
                len(string_split(trim(text), ' '))::DOUBLE AS n_tokens,
                len(list_distinct(string_split(trim(text), ' ')))::DOUBLE AS n_unique
         FROM documents"""

_VIF_DET = "(1 + 2*r12*r13*r23 - r12*r12 - r13*r13 - r23*r23)"


@query(
    "vif_diagnostics",
    f"""WITH f AS ({_F3_SQL}),
       s AS (SELECT corr(text_length, n_tokens) AS r12,
                    corr(text_length, n_unique) AS r13,
                    corr(n_tokens, n_unique) AS r23 FROM f)
       SELECT round((1 - r23*r23) / {_VIF_DET}, 4) AS vif_text_length,
              round((1 - r13*r13) / {_VIF_DET}, 4) AS vif_n_tokens,
              round((1 - r12*r12) / {_VIF_DET}, 4) AS vif_n_unique
       FROM s""",
)
def q_vif_diagnostics(spark, sf_dir):
    """Variance inflation factors (pliers/diagnostics/base.py
    variance_inflation_factors) — closed-form R⁻¹ diagonal from pairwise
    corr aggregates; rounded to 4 (quotient of near-collinear corrs)."""
    from pliers_spark.operators.diagnostics import vif3

    f = _docs(spark, sf_dir).select(
        T.text_length("text").cast("double").alias("text_length"),
        T.token_count("text").cast("double").alias("n_tokens"),
        T.num_unique_words("text").cast("double").alias("n_unique"),
    )
    out = vif3(f, "text_length", "n_tokens", "n_unique")
    return out.select(
        *[F.round(F.col(c), 4).alias(c) for c in ("vif_text_length", "vif_n_tokens", "vif_n_unique")]
    )


@query(
    "mahalanobis",
    """WITH f AS (
         SELECT doc_id, length(trim(text))::DOUBLE AS a,
                len(list_distinct(string_split(trim(text), ' ')))::DOUBLE AS b
         FROM documents),
       s AS (SELECT avg(a) AS m1, stddev_samp(a) AS s1,
                    avg(b) AS m2, stddev_samp(b) AS s2, corr(a, b) AS r FROM f)
       SELECT doc_id,
              round(sqrt((((a - m1)/s1)*((a - m1)/s1)
                    - 2*r*((a - m1)/s1)*((b - m2)/s2)
                    + ((b - m2)/s2)*((b - m2)/s2)) / (1 - r*r)), 3) AS mahalanobis
       FROM f, s""",
)
def q_mahalanobis(spark, sf_dir):
    """Per-row Mahalanobis distance over (text_length, n_unique)
    (pliers/diagnostics/base.py mahalanobis_distances): one stats pass +
    broadcast 1-row join + JVM quadratic form — rows never move."""
    from pliers_spark.operators.diagnostics import mahalanobis2

    f = _docs(spark, sf_dir).select(
        "doc_id",
        T.text_length("text").cast("double").alias("a"),
        T.num_unique_words("text").cast("double").alias("b"),
    )
    out = mahalanobis2(f, ["doc_id"], "a", "b")
    return out.select("doc_id", F.round("mahalanobis", 3).alias("mahalanobis"))


@query(
    "eigen_diagnostics",
    f"""WITH f AS ({_F3_SQL}),
       s AS (SELECT corr(text_length, n_tokens) AS r12,
                    corr(text_length, n_unique) AS r13,
                    corr(n_tokens, n_unique) AS r23 FROM f),
       m AS (SELECT sqrt((r12*r12 + r13*r13 + r23*r23) / 3.0) AS p,
                    r12 * r13 * r23 AS prod FROM s),
       t AS (SELECT p, acos(greatest(least(prod / (p*p*p), 1.0), -1.0)) / 3.0 AS phi
             FROM m),
       e AS (SELECT 1.0 + 2.0*p*cos(phi) AS e1,
                    1.0 + 2.0*p*cos(phi + 2.0*pi()/3.0) AS e3 FROM t),
       ee AS (SELECT e1, 3.0 - e1 - e3 AS e2, e3 FROM e)
       SELECT 1::BIGINT AS rank, round(e1, 6) AS eigenvalue,
              1.0 AS condition_index FROM ee
       UNION ALL
       SELECT 2::BIGINT, round(e2, 6), round(sqrt(e1/e2), 6) FROM ee
       UNION ALL
       SELECT 3::BIGINT, round(e3, 6), round(sqrt(e1/e3), 6) FROM ee""",
)
def q_eigen_diagnostics(spark, sf_dir):
    """Eigenvalues + condition indices of the feature correlation matrix
    (pliers/diagnostics/base.py:25-46): K²-scalar streaming corr pass,
    driver-side K×K eigvalsh. Oracle: exact trigonometric closed form for
    a symmetric 3×3 with unit diagonal (zero-diagonal deviatoric det =
    2·b12·b13·b23)."""
    from pliers_spark.operators.diagnostics import eigen_diagnostics

    f = _docs(spark, sf_dir).select(
        T.text_length("text").cast("double").alias("text_length"),
        T.token_count("text").cast("double").alias("n_tokens"),
        T.num_unique_words("text").cast("double").alias("n_unique"),
    )
    return eigen_diagnostics(spark, f, ["text_length", "n_tokens", "n_unique"])


@query(
    "bigrams",
    """WITH base AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
       SELECT doc_id, unnest(range(len(toks) - 1))::BIGINT AS pos,
              unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bigram
       FROM base""",
)
def q_bigrams(spark, sf_dir):
    """Word-bigram extraction (shingle generator of the dedup family as a
    first-class n-gram operator; zip_with-based, zero shuffle)."""
    from pliers_spark.functions.hashing import shingles

    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.posexplode(shingles(T.tokenize(F.col("text")), 2)).alias("pos", "bigram"))
        .withColumn("pos", F.col("pos").cast("long"))
    )


@query(
    "embedding_norms",
    """SELECT vec_id, len(embedding)::BIGINT AS dim,
              round(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))), 6) AS l2_norm
       FROM embeddings""",
)
def q_embedding_norms(spark, sf_dir):
    """Vector L2 norms over the embedding column — JVM aggregate over the
    array (SeriesStim / MetricExtractor vector-reduction analog)."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        "embedding", F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.sqrt(sq), 6).alias("l2_norm"),
    )


@query(
    "jl_projection",
    f"""WITH pos AS (
         SELECT vec_id, unnest(range(len(embedding)))::BIGINT AS i, embedding
         FROM embeddings),
       q AS (
         SELECT vec_id, i,
                floor(embedding[i+1]::DOUBLE * 1000000 + 0.5)::BIGINT AS q
         FROM pos),
       s AS (
         SELECT u.i, t.j AS dim,
                1 - 2 * CAST({md5_int_sql("concat(t.j::VARCHAR, ':', u.i::VARCHAR)")} % 2 AS BIGINT) AS s
         FROM (SELECT unnest(range(16))::BIGINT AS j) t,
              (SELECT DISTINCT i FROM q) u)
       SELECT q.vec_id, s.dim, sum(s.s * q.q)::BIGINT AS y
       FROM q JOIN s USING (i) GROUP BY 1, 2""",
)
def q_jl_projection(spark, sf_dir):
    """Johnson–Lindenstrauss ±1 projection (Achlioptas 2003) of the
    64-d embeddings to 16 integer components: micro-unit quantization +
    md5-derived sign matrix + integer dot products — bit-identical on
    both engines, long-format output for downstream bucketing."""
    from .operators.similarity import jl_project

    return jl_project(load_table(spark, sf_dir, "embeddings"), "vec_id", "embedding", 16)


@query(
    "tumbling_daily",
    """SELECT date_trunc('day', ts)::TIMESTAMP AS day, event_type,
              count(value)::BIGINT AS n_events, round(sum(value), 6) AS sum_value
       FROM events GROUP BY 1, 2""",
)
def q_tumbling_daily(spark, sf_dir):
    """Tumbling 1-day window aggregation — the batch twin of the
    Structured Streaming windowed count (streaming/sessions.py
    streaming_windowed_counts); F.window keeps event-time semantics
    identical across batch and stream."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 day").alias("_w"), "event_type")
        .agg(F.count("value").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("_w.start").alias("day"), "event_type", "n_events", "sum_value")
    )


def _wordnet_sql() -> str:
    from pliers_spark.functions.stemming import TAG_TO_WORDNET, morphy_sql

    wn_whens = " ".join(f"WHEN tag = '{t}' THEN '{p}'" for t, p in TAG_TO_WORDNET.items())
    return f"""WITH toks AS (
         SELECT doc_id,
                unnest(range(len(string_split(text, ' '))))::BIGINT AS pos,
                unnest(string_split(text, ' ')) AS token
         FROM documents),
       ctx AS (
         SELECT doc_id, pos, lower(token) AS w,
                lower(lag(token) OVER (PARTITION BY doc_id ORDER BY pos)) AS prev_w
         FROM toks),
       tagged AS (
         SELECT doc_id, pos, w, {_tag_case_sql()} AS tag FROM ctx),
       wn AS (
         SELECT doc_id, pos, w,
                CASE {wn_whens} ELSE 'n' END AS wn_pos0
         FROM tagged),
       resolved AS (
         SELECT doc_id, pos, w,
                arg_max(wn_pos0, pos) OVER (PARTITION BY doc_id, w) AS wn_pos
         FROM wn)
       SELECT doc_id,
              string_agg({morphy_sql('w', 'wn_pos')}, ' ' ORDER BY pos) AS lemmatized
       FROM resolved GROUP BY doc_id"""


@query("wordnet_lemmas", _wordnet_sql())
def q_wordnet_lemmas(spark, sf_dir):
    """WordStemmingFilter(stemmer='wordnet') — POS-aware morphy-lite
    lemmatization (pliers/filters/text.py:73-108), entirely Spark
    built-ins: posexplode → lag window for the contextual tag → max_by
    window for the reference's last-occurrence-wins tag dict → CASE-chain
    lemma → ordered re-assembly. Both shuffles hash on doc_id, so the
    plan stays one exchange wide at any scale."""
    from pliers_spark.functions.stemming import wordnet_lemmatize_docs

    return wordnet_lemmatize_docs(_docs(spark, sf_dir))


@query(
    "sample_every_nth",
    """WITH rn AS (
         SELECT user_id, ts, value,
                row_number() OVER (PARTITION BY user_id ORDER BY ts) - 1 AS rn
         FROM events)
       SELECT user_id, ts, value FROM rn WHERE rn % 3 = 0""",
)
def q_sample_every_nth(spark, sf_dir):
    """FrameSamplingFilter(every=n) — keep every n-th snapshot per entity
    (pliers/filters/video.py:42-44); one shuffle, map-side modulo."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    return TP.sample_every_nth(ev, ["user_id"], "ts", 3)


@query(
    "sample_hourly",
    """WITH rn AS (
         SELECT user_id, ts, value,
                row_number() OVER (
                  PARTITION BY user_id, date_trunc('hour', ts) ORDER BY ts) AS rn
         FROM events)
       SELECT user_id, ts, value FROM rn WHERE rn = 1""",
)
def q_sample_hourly(spark, sf_dir):
    """FrameSamplingFilter(hertz=h) recast for event time — earliest
    snapshot per (entity, hour bucket) (pliers/filters/video.py:46-53)."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    return TP.sample_per_period(ev, ["user_id"], "ts", "hour")


@query(
    "temporal_trim",
    """SELECT user_id, ts, value,
              round((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-10 00:00:00')) / 1000000.0, 6)
                AS rel_s
       FROM events
       WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'""",
)
def q_temporal_trim(spark, sf_dir):
    """TemporalTrimmingFilter — subclip [start,end) on the event-time axis
    with re-onset-to-0 rebase (pliers/filters/base.py:27-68). The range
    predicate reaches the parquet scan as a pushed filter."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    out = TP.temporal_trim(ev, "ts", "2024-01-10 00:00:00", "2024-01-20 00:00:00", rebase=True)
    return out.withColumn("rel_s", F.round("rel_s", 6))


_MERGED_DICT_SQL = (
    "d1(word, frequency) AS (" + _LEXICON_SQL.replace("VALUES", "SELECT word, frequency FROM (VALUES")
    + ") t(word, length, frequency, syllables)), d2(word, valence) AS (" + _VALENCE_SQL + ")"
)


@query(
    "dictionary_merge",
    f"""WITH {_MERGED_DICT_SQL},
       dict AS (
         SELECT coalesce(d1.word, d2.word) AS word,
                d1.frequency::DOUBLE AS frequency, d2.valence::DOUBLE AS valence
         FROM d1 FULL JOIN d2 ON d1.word = d2.word),
       toks AS (
         SELECT doc_id, lower(unnest(string_split(trim(text), ' '))) AS token FROM documents)
       SELECT t.doc_id,
              round(coalesce(sum(d.frequency), 0.0), 6) + 0.0 AS freq_sum,
              round(coalesce(sum(d.valence), 0.0), 6) + 0.0 AS valence_sum,
              count(d.word)::BIGINT AS n_matched
       FROM toks t LEFT JOIN dict d ON t.token = d.word
       GROUP BY t.doc_id""",
)
def q_dictionary_merge(spark, sf_dir):
    """PredefinedDictionaryExtractor — outer-concat of several
    dictionaries on the word key (pliers/extractors/text.py:142-156) then
    broadcast lookup + per-doc reduction; the fact table never shuffles
    for the join, only for the final doc aggregate."""
    d1 = spark.createDataFrame(
        _LEXICON_ROWS, "word string, length long, frequency double, syllables long"
    ).select("word", "frequency")
    d2 = spark.createDataFrame(_VALENCE_ROWS, "word string, valence double")
    dim = DI.combine_dictionaries([d1, d2], "word")
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.explode(T.tokenize(F.col("text"))).alias("token")
    )
    out = DI.dictionary_lookup(toks, dim, "token", "word", case_sensitive=False)
    return out.groupBy("doc_id").agg(
        # `+ 0.0` normalizes IEEE signed zero: a per-doc valence sum that
        # cancels to -0.0 on one engine and +0.0 on the other would
        # hash-mismatch under the driver's raw-float-bit compare
        (F.round(F.coalesce(F.sum("frequency"), F.lit(0.0)), 6) + F.lit(0.0)).alias("freq_sum"),
        (F.round(F.coalesce(F.sum("valence"), F.lit(0.0)), 6) + F.lit(0.0)).alias("valence_sum"),
        # the lookup drops the dict key; every merged-dict row carries at
        # least one non-null variable, so this counts join hits exactly
        F.count(F.coalesce(F.col("frequency"), F.col("valence"))).alias("n_matched"),
    )


def _snowball_sql() -> str:
    from pliers_spark.functions.snowball import snowball_golden_sql

    return snowball_golden_sql()


@query("snowball_stem", _snowball_sql())
def q_snowball_stem(spark, sf_dir):
    """WordStemmingFilter(stemmer='snowball') — clean-room English
    Snowball (Porter2) stemmer as a vectorized pandas UDF
    (pliers/filters/text.py:24-110 wraps nltk SnowballStemmer). Oracle:
    golden (word, stem) VALUES table generated from the SAME clean-room
    function over the full corpus vocabulary
    (functions/snowball.snowball_golden_sql); the cascade itself is
    golden-tested in tests/test_stemming.py."""
    from pliers_spark.functions.snowball import snowball_stem_col

    toks = (
        _docs(spark, sf_dir)
        .select("doc_id", F.posexplode(T.tokenize(F.col("text"))).alias("pos", "token"))
        .withColumn("pos", F.col("pos").cast("long"))
    )
    return toks.withColumn("stem", snowball_stem_col(F.lower(F.col("token"))))


# --------------------------------------------------------------------------
# batch 6: sentence tokenization, spectral framing, low-pass resample,
# max-pool encoding, diagnostics flags


@query(
    "sentence_split",
    r"""WITH marked AS (
         SELECT doc_id,
                regexp_replace(regexp_replace(trim(text), '\bthe\b', 'the.', 'g'),
                               '([.!?])\s+', '\1' || chr(10), 'g') AS m
         FROM documents)
       SELECT doc_id, trim(s) AS sentence, length(trim(s))::BIGINT AS sent_len
       FROM marked, unnest(string_split(m, chr(10))) AS u(s)
       WHERE trim(s) <> ''""",
)
def q_sentence_split(spark, sf_dir):
    """ComplexTextStim(unit='sentence') sentence tokenization
    (pliers/stimuli/text.py:230-244). The synthetic corpus carries no
    punctuation, so the query first derives boundaries deterministically
    (a '.' after every 'the') — identically on both engines — then
    exercises the real operator: split_sentences as pure Column algebra
    (regexp mark → split → trim → drop empties), one narrow map stage."""
    marked = F.regexp_replace(F.col("text"), r"\bthe\b", "the.")
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(T.split_sentences(marked)).alias("sentence"))
        .withColumn("sent_len", F.length("sentence").cast("long"))
    )


def _stft_sql() -> str:
    from pliers_spark.functions.spectral import stft_power_sql

    return stft_power_sql()


@query("stft_power", _stft_sql())
def q_stft_power(spark, sf_dir):
    """STFTAudioExtractor (pliers/extractors/audio.py:64-113): Hann-
    windowed rFFT power per (entity, frame), frame_size=8 hop=4, full
    frames only. Spark side is numpy rfft inside applyInPandas (Arrow
    batch per entity); the oracle is the same transform written as an
    explicit DFT with constant-folded twiddle factors."""
    from pliers_spark.functions.spectral import stft_power_frames

    return stft_power_frames(
        _events(spark, sf_dir),
        "user_id",
        "ts",
        "value",
        order_cols=["ts", "event_id"],
    )


def _lowpass_sql() -> str:
    from pliers_spark.functions.spectral import lowpass_decimate_sql

    return lowpass_decimate_sql()


@query("resample_lowpass", _lowpass_sql())
def q_resample_lowpass(spark, sf_dir):
    """resample() downsample path — windowed-sinc anti-alias low-pass
    then decimate 4× per entity (role of pliers/utils/base.py:225-239's
    Butterworth; scipy absent so the FIR design is golden-tested in
    tests/test_spectral.py). applyInPandas per entity-hash bucket, the
    convolution as an explicit tap-ordered fold so the DuckDB oracle
    (spectral.lowpass_decimate_sql — the same convolution as relational
    algebra, list_reduce fold) is bit-identical."""
    from pliers_spark.functions.spectral import lowpass_decimate

    return lowpass_decimate(_events(spark, sf_dir), "user_id", "ts", "value", decimate=4)


def _maxpool_sql() -> str:
    from pliers_spark.functions.embeddings import hash_embedding_dim_sql

    dims = ", ".join(
        f"round(max({hash_embedding_dim_sql('token', d)}), 6) AS emb_{d}" for d in range(_EMB_DIM)
    )
    return f"""WITH toks AS (
         SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents)
       SELECT doc_id, {dims} FROM toks GROUP BY doc_id"""


@query("doc_embedding_maxpool", _maxpool_sql())
def q_doc_embedding_maxpool(spark, sf_dir):
    """BertExtractor-style pooling with pooling='max' — per-dimension max
    over token vectors (pliers/extractors/text.py:412-560 pools token
    encodings with np.<fn>). Same deterministic hash-embedding as
    word_embeddings; partial-agg (max) map-side, one shuffle on doc_id."""
    from pliers_spark.functions.embeddings import hash_embedding_dim

    toks = _docs(spark, sf_dir).select(
        "doc_id", F.explode(T.tokenize(F.col("text"))).alias("token")
    )
    return toks.groupBy("doc_id").agg(
        *[
            F.round(F.max(hash_embedding_dim(F.col("token"), d)), 6).alias(f"emb_{d}")
            for d in range(_EMB_DIM)
        ]
    )


def _diag_flag_sql() -> str:
    feats = ["text_length", "n_tokens", "n_unique", "n_chars"]
    exprs = {
        "text_length": "length(trim(text))",
        "n_tokens": "length(string_split(trim(text), ' '))",
        "n_unique": "length(list_distinct(string_split(trim(text), ' ')))",
        "n_chars": "n_chars",
    }
    base = ", ".join(f"{e}::DOUBLE AS {c}" for c, e in exprs.items())
    aggs = [f"var_samp({c}) AS v_{c}" for c in feats]
    pairs: dict[str, list[str]] = {c: [] for c in feats}
    for i, a in enumerate(feats):
        for b in feats[i + 1 :]:
            aggs.append(f"corr({a}, {b}) AS c_{a}__{b}")
            pairs[a].append(f"c_{a}__{b}")
            pairs[b].append(f"c_{a}__{b}")
    rows = []
    for c in feats:
        mc = "greatest(" + ", ".join(f"abs({p})" for p in pairs[c]) + ")"
        rows.append(
            f"SELECT '{c}' AS feature, round(v_{c}, 6) AS variance,"
            f" round({mc}, 6) AS max_abs_corr,"
            f" v_{c} < 0.000001 AS low_variance, {mc} > 0.95 AS collinear FROM s"
        )
    return (
        f"WITH f AS (SELECT {base} FROM documents),\n"
        f" s AS (SELECT {', '.join(aggs)} FROM f)\n" + "\nUNION ALL\n".join(rows)
    )


@query("diag_flags", _diag_flag_sql())
def q_diag_flags(spark, sf_dir):
    """Diagnostics.flag/flag_all (pliers/diagnostics/base.py:150-214) —
    per-feature variance + max |corr| + boolean flags over a derived
    feature table, all K aggregates in ONE map-side-partial pass."""
    from pliers_spark.operators.diagnostics import flag_features

    feats = _docs(spark, sf_dir).select(
        T.text_length("text").cast("double").alias("text_length"),
        T.token_count("text").cast("double").alias("n_tokens"),
        T.num_unique_words("text").cast("double").alias("n_unique"),
        F.col("n_chars").cast("double").alias("n_chars"),
    )
    return flag_features(feats, ["text_length", "n_tokens", "n_unique", "n_chars"])


@query(
    "word_counter_log",
    """WITH toks AS (
         SELECT doc_id,
                unnest(range(len(string_split(trim(text), ' '))))::BIGINT AS pos,
                lower(unnest(string_split(trim(text), ' '))) AS token
         FROM documents)
       SELECT doc_id, pos, token,
              round(ln(count(*) OVER (PARTITION BY doc_id, token ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS log_word_count
       FROM toks""",
)
def q_word_counter_log(spark, sf_dir):
    """WordCounterExtractor(log_scale=True) — np.log of the running
    count, feature named log_word_count (pliers/extractors/text.py:
    844-858). Same single-shuffle window as word_counter."""
    toks = (
        _docs(spark, sf_dir)
        .select("doc_id", F.posexplode(T.tokenize(F.col("text"))).alias("pos", "token"))
        .withColumn("pos", F.col("pos").cast("long"))
        .withColumn("token", F.lower(F.col("token")))
    )
    out = TP.running_count(toks, ["doc_id"], "token", "pos", out_col="cnt")
    return out.select(
        "doc_id", "pos", "token", F.round(F.log(F.col("cnt")), 6).alias("log_word_count")
    )


@query(
    "compound_slots",
    """SELECT doc_id,
              struct_extract(c, 'text') AS slot_text,
              struct_extract(c, 'lang') AS slot_lang,
              struct_extract(c, 'n_chars')::BIGINT AS slot_n_chars
       FROM (SELECT doc_id,
                    struct_pack(text := text, lang := lang, n_chars := n_chars) AS c
             FROM documents)""",
)
def q_compound_slots(spark, sf_dir):
    """CompoundStim typed slots (pliers/stimuli/compound.py:10-110):
    heterogeneous payload as a StructType column; a stage pulls the slot
    matching its input type (transformers/base.py:96-100). Struct
    pack/extract is pure Column algebra — Catalyst collapses it to a
    projection (asserted in tests/test_plans.py). No spread: projection
    is not CPU-bound, so the extra Exchange would be pure cost."""
    docs = load_table(spark, sf_dir, "documents")
    compound = docs.select(
        "doc_id", F.struct(F.col("text"), F.col("lang"), F.col("n_chars")).alias("c")
    )
    return compound.select(
        "doc_id",
        F.col("c.text").alias("slot_text"),
        F.col("c.lang").alias("slot_lang"),
        F.col("c.n_chars").cast("long").alias("slot_n_chars"),
    )


def _seq_encode_oracle() -> str:
    from pliers_spark.functions.encoder import seq_encode_sql

    return seq_encode_sql()


@query("seq_encoding", _seq_encode_oracle())
def q_seq_encoding(spark, sf_dir):
    """BertExtractor pattern (pliers/extractors/text.py:412-560) —
    Iterator-of-batches pandas UDF, model loaded once per worker,
    mean-pooled sequence vector per document. Weights are a
    deterministic stand-in (no torch here); the Spark plumbing is the
    production shape. The stand-in is built from md5-derived exact ppm
    integers + libm tanh-via-exp, so the DuckDB oracle recomputes the
    SAME model in SQL bit-for-bit (functions/encoder.seq_encode_sql).
    Parity pinned in tests/test_encoder.py."""
    from pliers_spark.functions.encoder import sequence_encode_col

    docs = _docs(spark, sf_dir)
    enc = docs.select("doc_id", sequence_encode_col(F.col("text")).alias("emb"))
    return enc.select(
        "doc_id", *[F.col("emb")[d].alias(f"emb_{d}") for d in range(8)]
    )


@query(
    "metric_percentiles",
    """SELECT user_id,
              round(quantile_cont(value, 0.5), 6) AS p50,
              round(quantile_cont(value, 0.9), 6) AS p90,
              round(quantile_cont(value, 0.99), 6) AS p99
       FROM events GROUP BY user_id""",
)
def q_metric_percentiles(spark, sf_dir):
    """MetricExtractor with quantile reducers (pliers/extractors/misc.py:
    13-74 accepts any numpy fn, e.g. np.percentile). Exact percentiles
    via F.percentile (linear interpolation — same definition as
    numpy/DuckDB quantile_cont). At 100 TB swap to approx_percentile
    with a documented error bound; the exact form is the oracle-able
    reference semantics."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


@query(
    "hierarchical_tokens",
    r"""WITH marked AS (
         SELECT doc_id,
                regexp_replace(regexp_replace(trim(text), '\bthe\b', 'the.', 'g'),
                               '([.!?])\s+', '\1' || chr(10), 'g') AS m
         FROM documents),
       sent_raw AS (
         SELECT doc_id, i, trim(ss[i + 1]) AS sentence
         FROM (SELECT doc_id, string_split(m, chr(10)) AS ss FROM marked),
              unnest(range(len(ss))) AS u(i)),
       sents AS (
         SELECT doc_id,
                row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS sent_pos,
                sentence
         FROM sent_raw WHERE sentence <> ''),
       toks AS (
         SELECT doc_id, sent_pos, string_split(sentence, ' ') AS tt FROM sents)
       SELECT doc_id, sent_pos, j AS tok_pos, tt[j + 1] AS token
       FROM toks, unnest(range(len(tt))) AS v(j)
       WHERE tt[j + 1] <> ''""",
)
def q_hierarchical_tokens(spark, sf_dir):
    """ComplexTextStim hierarchy (pliers/stimuli/text.py:54-256): a
    document is an ordered list of sentences, each an ordered list of
    tokens — two nested posexplodes carrying (sent_pos, tok_pos), the
    Spark shape of pliers' per-element onset/order propagation. Narrow
    map + generate stages only: zero shuffle."""
    marked = F.regexp_replace(F.col("text"), r"\bthe\b", "the.")
    sents = _docs(spark, sf_dir).select(
        "doc_id",
        F.posexplode(T.split_sentences(marked)).alias("sent_pos", "sentence"),
    )
    return (
        sents.select(
            "doc_id",
            F.col("sent_pos").cast("long"),
            F.posexplode(T.tokenize(F.col("sentence"))).alias("tok_pos", "token"),
        )
        .withColumn("tok_pos", F.col("tok_pos").cast("long"))
        .select("doc_id", "sent_pos", "tok_pos", "token")
    )


@query(
    "corpus_stats",
    """WITH toks AS (
         SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents)
       SELECT count(DISTINCT doc_id)::BIGINT AS n_docs,
              count(*)::BIGINT AS total_tokens,
              count(DISTINCT token)::BIGINT AS vocab_size,
              round(count(*) / count(DISTINCT doc_id)::DOUBLE, 6) AS avg_doc_tokens
       FROM toks""",
)
def q_corpus_stats(spark, sf_dir):
    """Corpus accounting for a training-data pipeline: doc count, token
    count, exact vocabulary size, mean doc length — one exploded scan,
    map-side partial aggregation. At 100 TB vocab_size switches to
    approx_count_distinct (HLL) — asserted within 5% of exact in
    tests/test_batch5.py — because an exact global distinct over ~10^9
    types forces a full shuffle of every token."""
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.explode(T.tokenize(F.col("text"))).alias("token")
    )
    return toks.agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("total_tokens"),
        F.countDistinct("token").alias("vocab_size"),
        F.round(F.count("*") / F.countDistinct("doc_id"), 6).alias("avg_doc_tokens"),
    )


@query(
    "token_top100",
    """WITH toks AS (
         SELECT lower(unnest(string_split(trim(text), ' '))) AS token FROM documents)
       SELECT token, count(*)::BIGINT AS cnt
       FROM toks GROUP BY token
       ORDER BY cnt DESC, token LIMIT 100""",
)
def q_token_top100(spark, sf_dir):
    """Corpus frequency head (Zipf table): distributed top-k — partial
    counts map-side, one shuffle on token, then TakeOrderedAndProject
    (per-partition heaps, no global sort). Deterministic tiebreak on the
    token so both engines agree at the cut."""
    toks = _docs(spark, sf_dir).select(
        F.explode(T.tokenize(F.lower(F.col("text")))).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(100)
    )


def _decon_fuzzy_sql() -> str:
    from pliers_spark.operators.curation import decontaminate_fuzzy_sql

    return decontaminate_fuzzy_sql()


@query("decontaminate_fuzzy", _decon_fuzzy_sql())
def q_decontaminate_fuzzy(spark, sf_dir):
    """FUZZY benchmark decontamination: training docs sharing >= 2
    winnowing fingerprints with the eval split are flagged — winnowing's
    local-overlap guarantee survives the small edits and repositioning
    that defeat the exact n-gram protocol (`decontaminate`), which is
    how lightly-paraphrased eval content actually leaks. Same broadcast
    shape: the eval fingerprint set is a tiny dimension; the training
    scan stays narrow."""
    from pliers_spark.operators.curation import decontaminate_fuzzy

    return decontaminate_fuzzy(_docs(spark, sf_dir))


def _cms_sql() -> str:
    from pliers_spark.operators.sketches import countmin_token_sql

    return countmin_token_sql()


@query("countmin_tokens", _cms_sql())
def q_countmin_tokens(spark, sf_dir):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over corpus
    tokens, probed with the exact top-20: depth=3 x width=1024 BIGINT
    counters via the seeded 60-bit md5 — build is one explode +
    groupBy whose shuffle carries at most depth*width rows regardless
    of corpus size; probes take MIN over their depth counters
    (guaranteed overestimate, emitted as the `overcount` column a
    pipeline watches when sizing the sketch). Fully deterministic —
    the oracle replays build AND probe bit-for-bit."""
    from pliers_spark.operators.sketches import countmin_build, countmin_probe

    toks = _docs(spark, sf_dir).select(
        F.explode(T.tokenize(F.col("text"))).alias("token")
    )
    sketch = countmin_build(toks, "token")
    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("token"))
        .limit(20)
    )
    est = countmin_probe(sketch, exact.select("token"), "token")
    return exact.join(est, "token").select(
        "token",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).cast("long").alias("overcount"),
    )


@query(
    "salted_unique_tokens",
    """WITH toks AS (
         SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents)
       SELECT doc_id, count(DISTINCT token)::BIGINT AS n_distinct
       FROM toks GROUP BY doc_id""",
)
def q_salted_unique_tokens(spark, sf_dir):
    """Skew-spread exact distinct (operators/skew.py): two-stage salted
    count-distinct whose result is provably identical to the plain
    aggregate (the oracle IS the plain aggregate). The value-hash salt
    spreads a hot key over 32 reduce tasks — the fix for hot-domain
    exact-distinct at 10^12 rows, where partial aggregation alone
    cannot help a non-algebraic aggregate."""
    from pliers_spark.operators.skew import salted_count_distinct

    toks = _docs(spark, sf_dir).select(
        "doc_id", F.explode(T.tokenize(F.col("text"))).alias("token")
    )
    return salted_count_distinct(toks, ["doc_id"], "token", num_salts=32)


# --------------------------------------------------------------------------
# batch 6: duplicate clustering (iterative CC), stream novelty, per-doc
# token heads


def _dup_clusters_sql() -> str:
    # Transitive closure via recursive UNION (dedups rows, so cycles
    # terminate); cluster id = min reachable node — same fixpoint the
    # Spark min-label propagation converges to.
    return f"""WITH RECURSIVE {_simhash_pairs_cte()},
       edges AS (
         SELECT id_a AS src, id_b AS dst FROM nd_pairs
         UNION
         SELECT id_b AS src, id_a AS dst FROM nd_pairs),
       reach(node, peer) AS (
         SELECT src, src FROM edges
         UNION
         SELECT r.node, e.dst FROM reach r JOIN edges e ON r.peer = e.src)
       SELECT node AS doc_id, min(peer)::BIGINT AS cluster_id
       FROM reach GROUP BY node"""


@query("dup_clusters", _dup_clusters_sql())
def q_dup_clusters(spark, sf_dir):
    """Transitive duplicate clusters: connected components over the
    SimHash near-dup pair list via iterative min-label propagation
    (driver loop, localCheckpoint-truncated lineage — the idiomatic
    Spark shape for iterative graph algorithms). Dedup keeps one
    representative per *cluster*, not per pair: A~B, B~C must retire
    both B and C even when A~C was never emitted."""
    pairs = D.simhash_near_dup_pairs(
        _docs(spark, sf_dir), "text", "doc_id", bits=_SIMHASH_BITS, bands=4, max_hamming=3
    ).select("id_a", "id_b")
    out = D.connected_components(pairs)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


def _cluster_reps_sql() -> str:
    # cluster key = the EXACT 16-bit SimHash fingerprint (hamming-0
    # equivalence classes): still fuzzy at the token level (the
    # majority vote erases small word reorderings/substitutions) but a
    # single hash-groupBy — no pair expansion, no iterative closure.
    # Graph-transitive clustering is dup_clusters' job; this query is
    # the KEEP RULE on top of whatever clustering ran.
    return f"""WITH {_simhash_sims_cte()},
q AS ({_QUALITY_ORACLE}),
spine AS (
  SELECT q.doc_id, s.simhash, q.quality
  FROM q JOIN sims s USING (doc_id)),
ranked AS (
  SELECT doc_id, quality,
         min(doc_id) OVER (PARTITION BY simhash) AS cluster_id,
         row_number() OVER (PARTITION BY simhash
                            ORDER BY quality DESC, doc_id) AS rn
  FROM spine)
SELECT doc_id, cluster_id::BIGINT AS cluster_id, quality, (rn = 1) AS keep
FROM ranked"""


@query("cluster_representatives", _cluster_reps_sql())
def q_cluster_representatives(spark, sf_dir):
    """End-to-end fuzzy-dedup keep rule (the RefinedWeb 'retire all but
    one' step): SimHash hamming-0 equivalence classes (the majority
    vote already absorbs small token edits/reorderings) joined with
    the quality score; within each class the highest-quality doc
    (ties -> smallest id) is the kept representative, singletons keep
    themselves. ONE fingerprint groupBy + one rank window — no pair
    expansion, no iterative closure (transitive clustering at looser
    thresholds is `dup_clusters`; this is the quality-ranked keep
    decision that follows ANY clustering). Dedup keeps the BEST
    document, not the first-seen one."""
    from pyspark.sql import Window as W

    sims = D.simhash_fingerprints(
        _docs(spark, sf_dir), "text", "doc_id", bits=_SIMHASH_BITS
    )
    quality = q_quality_score(spark, sf_dir)
    spine = quality.join(sims, "doc_id")
    w = W.partitionBy("simhash")
    rn = F.row_number().over(w.orderBy(F.desc("quality"), F.asc("doc_id")))
    return spine.select(
        "doc_id",
        F.min("doc_id").over(w).cast("long").alias("cluster_id"),
        "quality",
        (rn == 1).alias("keep"),
    )


@query(
    "novelty_jaccard",
    """WITH t AS (
         SELECT source, doc_id,
                list_distinct(string_split(trim(text), ' ')) AS tok_set
         FROM documents),
       l AS (
         SELECT source, doc_id, tok_set,
                lag(tok_set) OVER (PARTITION BY source ORDER BY doc_id) AS prev
         FROM t)
       SELECT source, doc_id,
              CASE WHEN prev IS NULL THEN NULL
                   ELSE round(1.0 - len(list_intersect(tok_set, prev))::DOUBLE /
                              nullif(len(list_distinct(list_concat(tok_set, prev))), 0), 6)
              END AS novelty
       FROM l""",
)
def q_novelty_jaccard(spark, sf_dir):
    """Inter-document novelty (1 - token-set Jaccard vs the previous doc
    in the same source stream): lag over per-stream windows + JVM array
    set algebra. Catches boilerplate re-crawls inline — one shuffle, no
    pair join, rows in = rows out."""
    return D.novelty_vs_previous(_docs(spark, sf_dir), "text", ["source"], "doc_id")


@query(
    "top_tokens_per_doc",
    """WITH toks AS (
         SELECT doc_id, lower(unnest(string_split(trim(text), ' '))) AS token
         FROM documents),
       counts AS (
         SELECT doc_id, token, count(*)::BIGINT AS cnt FROM toks GROUP BY 1, 2)
       SELECT doc_id, token, cnt, rank FROM (
         SELECT doc_id, token, cnt,
                row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, token)::BIGINT AS rank
         FROM counts)
       WHERE rank <= 3""",
)
def q_top_tokens_per_doc(spark, sf_dir):
    """Per-document token head (top-3 by count, deterministic tie-break):
    the per-group top-k pattern — hash agg then rank-window + filter,
    never a global sort (BertLMExtractor's per-sequence top-k,
    pliers/extractors/text.py:740-749, as a relational op)."""
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.explode(T.tokenize(F.lower(F.col("text")))).alias("token")
    )
    counts = toks.groupBy("doc_id", "token").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("token"))
    return counts.withColumn("rank", F.row_number().over(w).cast("long")).where(
        F.col("rank") <= 3
    )


@query(
    "props_extract",
    """SELECT event_id,
              json_extract_string(props, '$.k')::BIGINT AS k,
              (json_extract_string(props, '$.k')::BIGINT % 10)::BIGINT AS k_bucket
       FROM events""",
)
def q_props_extract(spark, sf_dir):
    """Semi-structured payload extraction: pull a typed field out of a
    JSON metadata column (the crawl-record pattern — WARC headers /
    page metadata ride along as JSON strings). JVM-side
    ``get_json_object`` — no Python, stays inside codegen; at 10^12
    rows the parse cost is the scan, so the projection prunes to
    (event_id, props) only."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.select(
        "event_id", k.alias("k"), F.pmod(k, F.lit(10)).cast("long").alias("k_bucket")
    )


# --------------------------------------------------------------------------
# batch 7: reproducible sampling / splits / per-group feature scaling
# (training-data pipeline staples; all JVM expressions, full oracles)


@query(
    "hash_sample",
    f"""SELECT doc_id, text FROM documents
       WHERE {md5_int_sql('text', seed=7)} % 100 < 10""",
)
def q_hash_sample(spark, sf_dir):
    """Deterministic 10% corpus sample by content-hash bucket. The
    reproducible-at-scale sampling pattern: ``rand()`` re-rolls per
    task retry / partition replan, a content hash never does — the
    sample is a pure function of the data, stable across reruns,
    engines, and cluster sizes (the oracle reproduces it exactly)."""
    d = _docs(spark, sf_dir)
    return d.where(F.pmod(md5_int(F.col("text"), seed=7), F.lit(100)) < 10).select(
        "doc_id", "text"
    )


@query(
    "split_assign",
    f"""SELECT doc_id,
              CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
       FROM (SELECT doc_id, {md5_int_sql('text', seed=13)} % 100 AS b FROM documents)""",
)
def q_split_assign(spark, sf_dir):
    """Deterministic train/val/test assignment (80/10/10) by content
    hash — leak-proof by construction: exact duplicates land in the
    same split (the hash is over ``text``, not the id), so a dup can't
    straddle train and test."""
    d = _docs(spark, sf_dir)
    b = F.pmod(md5_int(F.col("text"), seed=13), F.lit(100))
    split = (
        F.when(b < 80, F.lit("train")).when(b < 90, F.lit("val")).otherwise(F.lit("test"))
    )
    return d.select("doc_id", split.alias("split"))


@query(
    "feature_zscore",
    """WITH f AS (
         SELECT doc_id, lang, length(trim(text))::DOUBLE AS text_length FROM documents)
       SELECT doc_id, lang,
              round((text_length - avg(text_length) OVER (PARTITION BY lang)) /
                    nullif(stddev_samp(text_length) OVER (PARTITION BY lang), 0), 6) AS z
       FROM f""",
)
def q_feature_zscore(spark, sf_dir):
    """Per-group feature standardization (z-score within lang) as a
    single window pass — no two-phase agg-then-rejoin, one shuffle on
    the group key. The feature-scaling stage a training pipeline runs
    just before export."""
    d = _docs(spark, sf_dir)
    w = Window.partitionBy("lang")
    x = T.text_length("text").cast("double")
    f = d.select("doc_id", "lang", x.alias("text_length"))
    z = (F.col("text_length") - F.avg("text_length").over(w)) / F.nullif(
        F.stddev_samp("text_length").over(w), F.lit(0)
    )
    return f.select("doc_id", "lang", F.round(z, 6).alias("z"))


@query(
    "latest_value_per_user",
    """SELECT user_id, max(ts) AS latest_ts,
              max_by(value, ts) AS latest_value,
              count(*)::BIGINT AS n_snapshots
       FROM events GROUP BY user_id""",
)
def q_latest_value_per_user(spark, sf_dir):
    """Dedup-to-latest (keep the newest snapshot per entity) as a single
    ``max_by`` hash aggregate — map-side partial agg, one shuffle, no
    window sort and no self-join. The 'current state of every url'
    compaction a crawl store runs continuously; ties on ts resolve to
    one deterministic row here because events carry unique timestamps
    per user (enforced by the oracle agreeing)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("user_id").agg(
        F.max("ts").alias("latest_ts"),
        F.max_by("value", "ts").alias("latest_value"),
        F.count("*").cast("long").alias("n_snapshots"),
    )


@query(
    "quality_filter",
    """WITH q AS (
         SELECT doc_id, lang, length(trim(text))::DOUBLE AS ql FROM documents),
       r AS (
         SELECT doc_id, lang, ql,
                percent_rank() OVER (PARTITION BY lang ORDER BY ql, doc_id) AS pr
         FROM q)
       SELECT doc_id, lang, ql, round(pr, 6) AS pr FROM r WHERE pr >= 0.1""",
)
def q_quality_filter(spark, sf_dir):
    """Percentile-gated corpus filter: drop the bottom decile per
    language by a quality proxy — rank-window + filter, the
    distribution-relative cleaning rule (an absolute threshold can't
    survive per-language length distributions at crawl scale). Tie-break
    on doc_id keeps the rank deterministic."""
    d = _docs(spark, sf_dir)
    f = d.select("doc_id", "lang", T.text_length("text").cast("double").alias("ql"))
    w = Window.partitionBy("lang").orderBy("ql", "doc_id")
    r = f.withColumn("pr", F.percent_rank().over(w))
    return r.where(F.col("pr") >= 0.1).select(
        "doc_id", "lang", "ql", F.round("pr", 6).alias("pr")
    )


@query(
    "regexp_stem",
    """WITH toks AS (
         SELECT doc_id,
                unnest(range(len(string_split(trim(text), ' '))))::BIGINT AS pos,
                lower(unnest(string_split(trim(text), ' '))) AS token
         FROM documents)
       SELECT doc_id, pos, token,
              CASE WHEN length(token) < 4 THEN token
                   ELSE regexp_replace(token, 'ing$|s$|e$', '', 'g') END AS stem
       FROM toks""",
)
def q_regexp_stem(spark, sf_dir):
    """WordStemmingFilter(stemmer='regexp') — nltk RegexpStemmer as a
    pure codegen expression: strip suffix matches unless the word is
    shorter than min (pliers/filters/text.py:43-52)."""
    from pliers_spark.functions.stemming import regexp_stem

    toks = (
        _docs(spark, sf_dir)
        .select("doc_id", F.posexplode(T.tokenize(F.col("text"))).alias("pos", "token"))
        .withColumn("pos", F.col("pos").cast("long"))
        .withColumn("token", F.lower(F.col("token")))
    )
    return toks.withColumn("stem", regexp_stem(F.col("token"), "ing$|s$|e$", min_len=4))


def _lsh_planes(dim: int = 64, n_planes: int = 4, seed: int = 42) -> list[list[float]]:
    # identical constants to operators/similarity.random_hyperplane_buckets
    import hashlib

    def coef(p, d):
        h = int(hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[:15], 16)
        return (h / float(2**60)) * 2.0 - 1.0

    return [[coef(p, d) for d in range(dim)] for p in range(n_planes)]


def _ann_lsh_sql() -> str:
    planes = _lsh_planes()
    terms = []
    for p, plane in enumerate(planes):
        arr = "[" + ", ".join(repr(c) for c in plane) + "]"
        proj = (
            f"list_sum(list_transform(range(1, {len(plane)+1}), "
            f"i -> embedding[i]::DOUBLE * ({arr}::DOUBLE[])[i]))"
        )
        terms.append(f"(CASE WHEN {proj} > 0 THEN {2**p} ELSE 0 END)")
    bucket = " + ".join(terms)
    return f"""WITH b AS (
         SELECT vec_id, embedding, ({bucket})::BIGINT AS bucket FROM embeddings),
       q AS (SELECT * FROM b WHERE vec_id < 8),
       scored AS (
         SELECT q.vec_id AS q_id, a.vec_id AS c_id,
                round({_DOT_SQL} / ({_NORM_A} * {_NORM_Q}), 6) AS cosine
         FROM b a JOIN q ON a.bucket = q.bucket AND a.vec_id != q.vec_id),
       ranked AS (
         SELECT q_id, c_id, cosine,
                row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id)::BIGINT AS rank
         FROM scored)
       SELECT q_id, c_id, cosine, rank FROM ranked WHERE rank <= 5"""


@query("ann_lsh_topk", _ann_lsh_sql())
def q_ann_lsh_topk(spark, sf_dir):
    """Sign-LSH ANN: random-hyperplane bucket assignment (deterministic
    md5-derived coefficients — reproducible across engines, retries,
    cluster sizes) + bucket-local cosine top-k. The second ANN family
    beside IVF: no training pass, bucket count fixed by n_planes, recall
    tuned by multi-probe. All JVM array expressions."""
    emb = S.random_hyperplane_buckets(
        load_table(spark, sf_dir, "embeddings"), "embedding", dim=64, n_planes=4, seed=42
    )
    qs = emb.where(F.col("vec_id") < 8)
    out = S.ivf_topk(emb, qs, "vec_id", "embedding", "vec_id", "embedding", "bucket", k=5)
    return out.select("q_id", "c_id", "cosine", F.col("rank").cast("long").alias("rank"))


@query(
    "lag_split",
    """SELECT user_id, ts,
              lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS value_lag1
       FROM events""",
)
def q_lag_split(spark, sf_dir):
    """Skew-defused lag-1 (time-bucket split + boundary carry,
    operators/skew.py::lag1_timesplit). The oracle IS the plain window
    lag — proving the split path bit-equal, the same pattern as
    `salted_unique_tokens` and `asof_join_split`."""
    from pliers_spark.operators.skew import lag1_timesplit

    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    out = lag1_timesplit(ev, ["user_id"], "ts", "value", bucket_seconds=6 * 3600)
    return out.select("user_id", "ts", "value_lag1")


@query(
    "sessionize_split",
    f"""WITH flagged AS (
         SELECT user_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch(ts) - epoch(lag(ts) OVER w) > {_SESSION_GAP_S}
                     THEN 1 ELSE 0 END AS is_new
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts))
       SELECT user_id, ts,
              sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id
       FROM flagged""",
)
def q_sessionize_split(spark, sf_dir):
    """Skew-defused sessionization (two-level scan decomposition over
    time buckets, operators/skew.py::sessionize_timesplit); the oracle
    is the plain single-window sessionize — bit-equal."""
    from pliers_spark.operators.skew import sessionize_timesplit

    ev = _events(spark, sf_dir).select("user_id", "ts")
    out = sessionize_timesplit(
        ev, ["user_id"], "ts", gap_seconds=_SESSION_GAP_S, bucket_seconds=12 * 3600
    )
    return out.select("user_id", "ts", "session_id")


@query(
    "ffill_split",
    """WITH v AS (
         SELECT user_id, ts,
                CASE WHEN event_type = 'view' THEN NULL ELSE value END AS value
         FROM events)
       SELECT user_id, ts,
              last_value(value IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
       FROM v""",
)
def q_ffill_split(spark, sf_dir):
    """Skew-defused forward-fill (time-bucket split + non-null carry,
    operators/skew.py::ffill_timesplit); oracle = plain window ffill
    over the same null-punched series."""
    from pliers_spark.operators.skew import ffill_timesplit

    ev = _events(spark, sf_dir).select(
        "user_id",
        "ts",
        F.when(F.col("event_type") == "view", F.lit(None)).otherwise(F.col("value")).alias("value"),
    )
    out = ffill_timesplit(ev, ["user_id"], "ts", "value", bucket_seconds=12 * 3600)
    return out.select("user_id", "ts", F.col("value_ffill"))


@query(
    "rolling_split",
    """SELECT user_id, ts,
              round(sum(value) OVER w, 6) AS roll_sum_1h,
              count(value) OVER w::BIGINT AS roll_cnt_1h
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""",
)
def q_rolling_split(spark, sf_dir):
    """Skew-defused rolling window (ghost-row union split,
    operators/skew.py::rolling_timesplit); oracle = the plain trailing
    range window."""
    from pliers_spark.operators.skew import rolling_timesplit

    ev = _events(spark, sf_dir).select("user_id", "ts", "value")
    out = rolling_timesplit(
        ev, ["user_id"], "ts", "value", range_seconds=3600.0, bucket_seconds=6 * 3600,
        aggs={"roll_sum_1h": "sum", "roll_cnt_1h": "count"},
    )
    return out.select(
        "user_id", "ts", F.round("roll_sum_1h", 6).alias("roll_sum_1h"),
        F.col("roll_cnt_1h").cast("long").alias("roll_cnt_1h"),
    )


# --------------------------------------------------------------------------
# batch 6 (round 2): masked-LM head, softmax sentiment, spaCy-style token
# attributes, named spectral features, merge_results 'first' aggfunc.


def _lm_common_ctes() -> str:
    """Shared SQL: per-doc context vector (exact integer-ppm sums, one
    final division) — the DuckDB twin of encoder._context_vector."""
    from pliers_spark.functions.embeddings import hash_embedding_dim_ppm_sql

    dims = ", ".join(
        f"sum({hash_embedding_dim_ppm_sql('token', d)}) / (count(*) * 1000000.0) AS c{d}"
        for d in range(4)
    )
    zeros = ", ".join(f"coalesce(c.c{d}, 0.0) AS c{d}" for d in range(4))
    return f"""toks AS (
         SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents
         WHERE trim(text) <> ''),
       ctx0 AS (SELECT doc_id, {dims} FROM toks GROUP BY doc_id),
       ctx AS (SELECT d.doc_id, {zeros} FROM documents d LEFT JOIN ctx0 c USING (doc_id))"""


def _lm_vocab_values() -> str:
    """The stand-in LM 'weights' as literal VALUES rows — the same
    md5-derived embeddings encoder._embed builds per worker (repr emits
    shortest round-trip decimals, so both engines parse identical bits)."""
    from pliers_spark.functions.encoder import LM_VOCAB, _embed

    rows = ", ".join(
        "('" + w + "', " + ", ".join(repr(x) for x in _embed(w)) + ")" for w in sorted(LM_VOCAB)
    )
    return f"vocab(word, e0, e1, e2, e3) AS (VALUES {rows})"


_LM_TOP_K = 5


def _lm_topk_sql() -> str:
    dot = " + ".join(f"c{d} * e{d}" for d in range(4))
    return f"""WITH {_lm_common_ctes()},
       {_lm_vocab_values()},
       logits AS (SELECT doc_id, word, {dot} AS l FROM ctx CROSS JOIN vocab),
       mx AS (SELECT doc_id, max(l) AS m FROM logits GROUP BY doc_id),
       expd AS (SELECT l.doc_id, l.word, exp(l.l - m.m) AS ev
                FROM logits l JOIN mx m USING (doc_id)),
       den AS (SELECT doc_id,
                      list_reduce(list_prepend(0.0, list(ev ORDER BY word)),
                                  (a, b) -> a + b) AS s
               FROM expd GROUP BY doc_id),
       probs AS (SELECT e.doc_id, e.word, e.ev / d.s AS p
                 FROM expd e JOIN den d USING (doc_id)),
       ranked AS (SELECT doc_id, word, p,
                         row_number() OVER (PARTITION BY doc_id
                                            ORDER BY p DESC, word) AS rank
                  FROM probs)
       SELECT doc_id, rank::BIGINT AS rank, word AS token, round_even(p, 6) AS prob
       FROM ranked WHERE rank <= {_LM_TOP_K}"""


@query("lm_topk", _lm_topk_sql())
def q_lm_topk(spark, sf_dir):
    """BertLMExtractor masked-LM top-k candidate selection (reference
    pliers/extractors/text.py:740-749) on the md5-derived stand-in
    weights: per doc, softmax over the candidate vocabulary of
    context·candidate logits, top-5 by probability. Iterator pandas UDF
    (weights built once per worker), bit-deterministic vs the oracle
    (libm exp + fixed-order folds)."""
    from pliers_spark.functions.encoder import masked_lm_scores

    return masked_lm_scores(
        _docs(spark, sf_dir), "text", "doc_id", top_k=_LM_TOP_K
    )


def _encoder_sentiment_sql() -> str:
    from pliers_spark.functions.encoder import SENT_CLASSES, _embed

    dot = lambda cls: " + ".join(
        f"c{d} * {repr(_embed('class:' + cls)[d])}" for d in range(4)
    )
    logits = ", ".join(f"({dot(c)}) AS l_{c}" for c in SENT_CLASSES)
    mx = "greatest(" + ", ".join(f"l_{c}" for c in SENT_CLASSES) + ")"
    # sequential sum in sorted class order (neg, neu, pos) = Python fold
    den = " + ".join(f"e_{c}" for c in sorted(SENT_CLASSES))
    exps = ", ".join(f"exp(l_{c} - {mx}) AS e_{c}" for c in SENT_CLASSES)
    return f"""WITH {_lm_common_ctes()},
       logits AS (SELECT doc_id, {logits} FROM ctx),
       expd AS (SELECT doc_id, {exps} FROM logits)
       SELECT doc_id,
              round_even(e_neg / ({den}), 6) AS sent_neg,
              round_even(e_neu / ({den}), 6) AS sent_neu,
              round_even(e_pos / ({den}), 6) AS sent_pos
       FROM expd"""


@query("encoder_sentiment", _encoder_sentiment_sql())
def q_encoder_sentiment(spark, sf_dir):
    """BertSentimentExtractor surface (pliers/extractors/text.py:767-831):
    softmax over class logits against the document context, emitted as
    per-class probabilities — vector ops inside the iterator-batched
    encoder UDF on the deterministic stand-in weights."""
    from pliers_spark.functions.encoder import sentiment_softmax

    return sentiment_softmax(_docs(spark, sf_dir), "text", "doc_id")


def _spacy_attrs_sql() -> str:
    from pliers_spark.functions.pos import TAG_TO_UNIVERSAL
    from pliers_spark.functions.stemming import TAG_TO_WORDNET, morphy_sql

    wn_case = "CASE " + " ".join(
        f"WHEN tag = '{t}' THEN '{p}'" for t, p in TAG_TO_WORDNET.items()
    ) + " ELSE 'n' END"
    upos_case = "CASE " + " ".join(
        f"WHEN tag = '{t}' THEN '{p}'" for t, p in TAG_TO_UNIVERSAL.items()
    ) + " ELSE 'NOUN' END"
    sw = ", ".join(f"'{w}'" for w in T.ENGLISH_STOPWORDS)
    upper = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    lower = "abcdefghijklmnopqrstuvwxyz"
    shape = f"translate(token, '{upper}{lower}0123456789', '{'X'*26}{'x'*26}{'d'*10}')"
    for c in "Xxd":
        shape = f"regexp_replace({shape}, '{c}{{5,}}', '{c*4}', 'g')"
    return f"""WITH toks AS (
         SELECT doc_id,
                unnest(range(len(string_split(trim(text), ' '))))::BIGINT AS pos,
                unnest(string_split(trim(text), ' ')) AS token
         FROM documents),
       ctx AS (
         SELECT doc_id, pos, token, lower(token) AS w,
                lower(lag(token) OVER (PARTITION BY doc_id ORDER BY pos)) AS prev_w
         FROM toks),
       tagged AS (SELECT doc_id, pos, token, w, {_tag_case_sql()} AS tag FROM ctx),
       d AS (SELECT *, {wn_case} AS wnp,
                    min(CASE WHEN tag IN ('VB','VBG','VBD') THEN pos END)
                      OVER (PARTITION BY doc_id) AS fv
             FROM tagged)
       SELECT doc_id, pos, token,
              {morphy_sql('w', 'wnp')} AS lemma,
              tag,
              {upos_case} AS upos,
              CASE WHEN pos = fv THEN 'ROOT' ELSE 'dep' END AS dep,
              list_contains([{sw}], w) AS is_stop,
              regexp_full_match(token, '[A-Za-z]+') AS is_alpha,
              regexp_full_match(replace(replace(w, '.', ''), ',', ''), '[0-9]+') AS like_num,
              {shape} AS shape
       FROM d"""


@query("spacy_attrs", _spacy_attrs_sql())
def q_spacy_attrs(spark, sf_dir):
    """SpaCyExtractor-equivalent per-token linguistic attributes
    (pliers/extractors/text.py:339-409, features='token'): token, lemma,
    tag, universal pos, dep proxy (first verb = ROOT; documented
    heuristic), is_stop, is_alpha, like_num, spaCy-style shape. One
    window pass per doc, all-Column expressions."""
    from pliers_spark.functions.pos import token_attributes

    return token_attributes(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# batch 8 (round 2): named librosa-style audio features over STFT frames
# (VERDICT item 6) + non-numeric merge clash aggfunc 'first' (item 9)


def _shape_sql() -> str:
    from pliers_spark.functions.audio_features import spectral_shape_sql
    from pliers_spark.functions.spectral import stft_power_sql

    return spectral_shape_sql(stft_power_sql())


@query("spectral_shape", _shape_sql())
def q_spectral_shape(spark, sf_dir):
    """SpectralCentroid/Bandwidth/Rolloff/Flatness extractors
    (pliers/extractors/audio.py:224-284) over this engine's STFT power
    frames. The FFT is the only Python stage; every named feature is a
    pure Column expression (whole-stage codegen) whose arithmetic text
    is shared verbatim with the DuckDB oracle."""
    from pliers_spark.functions.audio_features import spectral_shape
    from pliers_spark.functions.spectral import stft_power_frames

    frames = stft_power_frames(
        _events(spark, sf_dir), "user_id", "ts", "value",
        order_cols=["ts", "event_id"],
    )
    return spectral_shape(frames)


def _flux_sql() -> str:
    from pliers_spark.functions.audio_features import spectral_flux_sql
    from pliers_spark.functions.spectral import stft_power_sql

    return spectral_flux_sql(stft_power_sql())


@query("spectral_flux", _flux_sql())
def q_spectral_flux(spark, sf_dir):
    """Onset-strength / spectral flux (OnsetStrengthMultiExtractor role,
    pliers/extractors/audio.py:347-356): per-entity positive magnitude
    delta vs the previous frame — one lag window over the frame table,
    then a shared-text Column expression. First frame dropped (no
    synthetic t-1: zero-leakage rule)."""
    from pliers_spark.functions.audio_features import spectral_flux
    from pliers_spark.functions.spectral import stft_power_frames

    frames = stft_power_frames(
        _events(spark, sf_dir), "user_id", "ts", "value",
        order_cols=["ts", "event_id"],
    )
    return spectral_flux(frames)


def _rms_zcr_sql() -> str:
    from pliers_spark.functions.audio_features import rms_zcr_sql

    return rms_zcr_sql()


@query("rms_zcr", _rms_zcr_sql())
def q_rms_zcr(spark, sf_dir):
    """RMSExtractor + ZeroCrossingRateExtractor
    (pliers/extractors/audio.py:303-312,358-366) with STFT framing but
    NO FFT and NO UDF: window (row index + first difference) → bounded
    frame explode (≤ frame/hop copies per row) → hash agg. 100%
    built-in plan — the scale path for waveform stats at 100 TB."""
    from pliers_spark.functions.audio_features import rms_zcr

    return rms_zcr(_events(spark, sf_dir), "user_id", "ts", "value", "event_id")


def _mfcc_sql() -> str:
    from pliers_spark.functions.audio_features import mel_mfcc_sql
    from pliers_spark.functions.spectral import stft_power_sql

    return mel_mfcc_sql(stft_power_sql())


@query("mel_mfcc", _mfcc_sql())
def q_mel_mfcc(spark, sf_dir):
    """Melspectrogram + MFCC extractors (pliers/extractors/audio.py:
    421-454): HTK triangular mel filterbank and orthonormal DCT-II
    rendered as constant-folded literal weights (computed once
    driver-side, repr-emitted into both engines), log-mel and
    cepstra as pure Column expressions over the STFT frames."""
    from pliers_spark.functions.audio_features import mel_mfcc
    from pliers_spark.functions.spectral import stft_power_frames

    frames = stft_power_frames(
        _events(spark, sf_dir), "user_id", "ts", "value",
        order_cols=["ts", "event_id"],
    )
    return mel_mfcc(frames)


@query(
    "merge_wide_first",
    """WITH toks AS (
         SELECT doc_id,
                unnest(range(len(string_split(trim(text), ' '))))::BIGINT AS ord,
                unnest(string_split(trim(text), ' ')) AS token
         FROM documents),
       long AS (
         SELECT doc_id, ord, 'tok' AS feature, token AS value FROM toks
         UNION ALL
         SELECT doc_id, ord, 'shape' AS feature, upper(token) AS value FROM toks)
       SELECT doc_id,
              arg_min(value, ord) FILTER (WHERE feature = 'shape') AS shape,
              arg_min(value, ord) FILTER (WHERE feature = 'tok') AS tok
       FROM long GROUP BY doc_id""",
)
def q_merge_wide_first(spark, sf_dir):
    """merge_results wide pivot with the reference's NON-numeric clash
    aggfunc 'first' (pliers/extractors/base.py:324-326): a string-valued
    long frame pivots to one column per feature taking the first value
    in frame order — recast deterministically as min_by(value, ord)
    (pandas row order ≡ the explicit ord column)."""
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.posexplode(T.tokenize(F.col("text"))).alias("ord", "token")
    ).withColumn("ord", F.col("ord").cast("long"))
    long = toks.select(
        "doc_id", "ord", F.lit("tok").alias("feature"), F.col("token").alias("value")
    ).unionByName(
        toks.select(
            "doc_id", "ord", F.lit("shape").alias("feature"), F.upper("token").alias("value")
        )
    )
    return R.to_wide(
        long, ["doc_id"], aggfunc="first", order_col="ord",
        feature_values=["shape", "tok"],
    )


def _poly_sql() -> str:
    from pliers_spark.functions.audio_features import poly_features_sql
    from pliers_spark.functions.spectral import stft_power_sql

    return poly_features_sql(stft_power_sql())


@query("poly_features", _poly_sql())
def q_poly_features(spark, sf_dir):
    """PolyFeaturesExtractor order=1 (pliers/extractors/audio.py:286-300):
    closed-form least-squares line fit over each frame's magnitude
    spectrum — frequency sums constant-folded to literals, shared-text
    Column expressions over the STFT frames."""
    from pliers_spark.functions.audio_features import poly_features
    from pliers_spark.functions.spectral import stft_power_frames

    frames = stft_power_frames(
        _events(spark, sf_dir), "user_id", "ts", "value",
        order_cols=["ts", "event_id"],
    )
    return poly_features(frames)


def _onset_sql() -> str:
    from pliers_spark.functions.audio_features import onset_detect_sql
    from pliers_spark.functions.spectral import stft_power_sql

    return onset_detect_sql(stft_power_sql())


@query("onset_detect", _onset_sql())
def q_onset_detect(spark, sf_dir):
    """OnsetDetectExtractor role (pliers/extractors/audio.py:314-322):
    peak-pick the onset-strength envelope — local max over ±1 frames AND
    above the trailing 3-frame mean + delta. Window comparisons only;
    the sole emitted float is the already-rounded flux."""
    from pliers_spark.functions.audio_features import onset_detect
    from pliers_spark.functions.spectral import stft_power_frames

    frames = stft_power_frames(
        _events(spark, sf_dir), "user_id", "ts", "value",
        order_cols=["ts", "event_id"],
    )
    return onset_detect(frames)


def _tempo_sql() -> str:
    from pliers_spark.functions.audio_features import tempo_autocorr_sql
    from pliers_spark.functions.spectral import stft_power_sql

    return tempo_autocorr_sql(stft_power_sql())


@query("tempo", _tempo_sql())
def q_tempo(spark, sf_dir):
    """TempoExtractor role (pliers/extractors/audio.py:325-333):
    dominant periodicity of the onset envelope via per-entity
    autocorrelation over lags 1..6, argmax (smallest lag on ties),
    tempo_bpm = 60·sr/(hop·lag)."""
    from pliers_spark.functions.audio_features import tempo_autocorr
    from pliers_spark.functions.spectral import stft_power_frames

    frames = stft_power_frames(
        _events(spark, sf_dir), "user_id", "ts", "value",
        order_cols=["ts", "event_id"],
    )
    return tempo_autocorr(frames)


def _hpss_sql() -> str:
    from pliers_spark.functions.audio_features import hpss_energy_sql
    from pliers_spark.functions.spectral import stft_power_sql

    return hpss_energy_sql(stft_power_sql())


@query("hpss_energy", _hpss_sql())
def q_hpss_energy(spark, sf_dir):
    """Harmonic/Percussive separation energies (HarmonicExtractor /
    PercussiveExtractor, pliers/extractors/audio.py:488-506; Fitzgerald
    2010 median-filter HPSS): per-bin time-median vs per-frame
    freq-median soft masks over the STFT frames — ±2-frame lags share
    one window spec (one Sort), masks are shared-text expressions."""
    from pliers_spark.functions.audio_features import hpss_energy
    from pliers_spark.functions.spectral import stft_power_frames

    frames = stft_power_frames(
        _events(spark, sf_dir), "user_id", "ts", "value",
        order_cols=["ts", "event_id"],
    )
    return hpss_energy(frames)


def _repetition_sql() -> str:
    from pliers_spark.operators.quality import repetition_signals_sql

    return repetition_signals_sql()


@query("repetition_signals", _repetition_sql())
def q_repetition_signals(spark, sf_dir):
    """Gopher/RefinedWeb-style repetition quality signals (training-data
    curation): duplicate-token fraction, top-token share, top-bigram
    share — exact integer ppm, two co-partitioned aggregations."""
    from pliers_spark.operators.quality import repetition_signals

    return repetition_signals(_docs(spark, sf_dir), "text", "doc_id")


@query(
    "char_entropy",
    """WITH chars AS (
         SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS ch
         FROM documents),
       cc AS (
         SELECT doc_id, ch, count(*)::BIGINT AS c FROM chars GROUP BY 1, 2),
       w AS (
         SELECT doc_id, c,
                sum(c) OVER (PARTITION BY doc_id) AS n
         FROM cc),
       terms AS (
         SELECT doc_id, n,
                c * CAST(round(ln(c::DOUBLE / n::DOUBLE) * 1e6) AS BIGINT) AS t
         FROM w)
       SELECT doc_id, max(n)::BIGINT AS n_chars,
              (-sum(t))::BIGINT AS entropy_sum_unats,
              round((-sum(t)::DOUBLE / max(n)) / 1000000.0, 6) AS entropy_nats
       FROM terms GROUP BY doc_id""",
)
def q_char_entropy(spark, sf_dir):
    """Character-level Shannon entropy per document — the classic
    gibberish/encoding-junk detector a curation pipeline runs on web
    text (low entropy = repeated filler, high = binary soup). Each
    char class contributes c·round(ln(c/n)·1e6) integer micro-nats
    (the bigram-LM rounding convention) so the per-doc sum is an
    order-free exact integer; the convenience nats column divides
    once at the end. One explode → (doc,char) count → windowed total
    → doc aggregation, all JVM-side."""
    from pyspark.sql import Window as W

    chars = _docs(spark, sf_dir).select(
        "doc_id",
        F.explode(F.expr("regexp_extract_all(text, '(?s).', 0)")).alias("ch"),
    )
    cc = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    w = cc.select(
        "doc_id", "c", F.sum("c").over(W.partitionBy("doc_id")).alias("n")
    )
    terms = w.select(
        "doc_id",
        "n",
        (F.col("c") * F.round(F.log(F.col("c") / F.col("n")) * 1e6, 0).cast("long")).alias("t"),
    )
    return terms.groupBy("doc_id").agg(
        F.max("n").cast("long").alias("n_chars"),
        (-F.sum("t")).cast("long").alias("entropy_sum_unats"),
        F.round((-F.sum("t").cast("double") / F.max("n")) / 1e6, 6).alias("entropy_nats"),
    )


@query(
    "feature_histogram",
    """WITH stats AS (
         SELECT event_type, min(value) AS mn, max(value) AS mx
         FROM events GROUP BY event_type),
       binned AS (
         SELECT e.event_type,
                CASE WHEN s.mx = s.mn THEN 0
                     ELSE least(CAST(floor((e.value - s.mn) * 16 / (s.mx - s.mn)) AS BIGINT), 15)
                END AS bin,
                s.mn, s.mx
         FROM events e JOIN stats s USING (event_type))
       SELECT event_type, bin, count(*)::BIGINT AS n,
              round(mn + bin * (mx - mn) / 16, 6) AS lo,
              round(mn + (bin + 1) * (mx - mn) / 16, 6) AS hi
       FROM binned GROUP BY event_type, bin, mn, mx""",
)
def q_feature_histogram(spark, sf_dir):
    """Equi-width histogram per feature group (16 bins over the
    group's [min,max]) — the distribution-profiling diagnostic run
    before choosing clipping/normalization constants. Two passes: a
    tiny per-group stats dimension (broadcast back), then one binned
    count; bin indices are floor of the same IEEE expression on both
    engines."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    binned = e.join(F.broadcast(stats), "event_type").select(
        "event_type",
        F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.floor((F.col("value") - F.col("mn")) * 16 / (F.col("mx") - F.col("mn"))).cast("long"),
                F.lit(15).cast("long"),
            )
        )
        .alias("bin"),
        "mn",
        "mx",
    )
    return binned.groupBy("event_type", "bin", "mn", "mx").agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        "event_type",
        "bin",
        "n",
        F.round(F.col("mn") + F.col("bin") * (F.col("mx") - F.col("mn")) / 16, 6).alias("lo"),
        F.round(F.col("mn") + (F.col("bin") + 1) * (F.col("mx") - F.col("mn")) / 16, 6).alias("hi"),
    )


def _winnow_sql() -> str:
    from pliers_spark.operators.dedup import winnowing_fingerprints_sql

    return winnowing_fingerprints_sql()


@query("winnowing", _winnow_sql())
def q_winnowing(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer et al. 2003, the
    MOSS algorithm): min hash of every full sliding window of
    consecutive shingle hashes — guaranteed to catch any sufficiently
    long shared substring while keeping ~2/(w+1) of hashes. One
    windowed min over the exploded grams (rows frame, single per-doc
    shuffle) + distinct; complements MinHash (global similarity) with
    LOCAL overlap detection."""
    from pliers_spark.operators.dedup import winnowing_fingerprints

    return winnowing_fingerprints(_docs(spark, sf_dir))


def _editdist_sql() -> str:
    from pliers_spark.operators.dedup import edit_distance_dups_sql

    return edit_distance_dups_sql()


@query("edit_distance_dups", _editdist_sql())
def q_edit_distance_dups(spark, sf_dir):
    """Fuzzy dedup by exact edit distance: winnowing-fingerprint
    candidate gating (df-capped inverted index, >= 2 shared
    fingerprints) then Levenshtein over bounded 256-char prefixes —
    O(prefix^2) per pair at any corpus size, never full-text
    quadratic. `levenshtein` is a JVM/DuckDB built-in with identical
    standard semantics, so distances are integer-exact cross-engine."""
    from pliers_spark.operators.dedup import edit_distance_dups

    return edit_distance_dups(_docs(spark, sf_dir))


def _bloom_sql() -> str:
    from pliers_spark.operators.dedup import bloom_dedup_sql

    union = (
        "(SELECT doc_id, text, (doc_id % 5 <> 0) AS hist0 FROM documents "
        "UNION ALL "
        "SELECT doc_id + 1000000, text, false FROM documents "
        "WHERE doc_id % 7 = 0 AND doc_id % 5 <> 0) AS u"
    )
    return bloom_dedup_sql("hist0", table=union)


@query("bloom_dedup", _bloom_sql())
def q_bloom_dedup(spark, sf_dir):
    """Bloom-filter ingestion dedup gate (the Dolma/CCNet constant-
    memory membership pattern): history = 4/5 of the corpus; delta =
    the remaining fifth (genuinely new) plus re-ingested COPIES of
    every 7th history doc under fresh ids — so the dup path is a
    checked behaviour, not dead code. k=3 seeded 60-bit md5 positions
    mod 2^20, represented as the distinct position set (the exact
    semantics of the bit array — the dense bitmap is the executor-
    local encoding); each delta row reports maybe_dup, the exact-hash
    truth, and the resulting false_positive flag the operator watches
    when sizing m/k."""
    from pliers_spark.operators.dedup import bloom_dedup

    d = _docs(spark, sf_dir)
    hist = d.select("doc_id", "text", (F.col("doc_id") % 5 != 0).alias("_hist"))
    reingest = (
        d.where((F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 5 != 0))
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            "text",
            F.lit(False).alias("_hist"),
        )
    )
    return bloom_dedup(hist.unionByName(reingest), F.col("_hist"))


def _gopher_sql() -> str:
    from pliers_spark.operators.quality import gopher_rules_sql

    return gopher_rules_sql()


@query("gopher_rules", _gopher_sql())
def q_gopher_rules(spark, sf_dir):
    """The FULL published Gopher quality-filter ruleset (Rae et al.
    2021, Table A1) as one per-doc boolean gate: word-count bounds,
    mean-word-length bounds, symbol-to-word ratio, bullet-line and
    ellipsis-line shares, alphabetic-word share, required-word
    presence. All thresholds via integer cross-multiplication — the
    emitted booleans are bit-stable across engines. Complements the
    distribution-relative quality_filter and the repetition_signals
    family with the absolute-rule gate real curation pipelines run
    first."""
    from pliers_spark.operators.quality import gopher_rules

    return gopher_rules(_docs(spark, sf_dir), "text", "doc_id")


# --------------------------------------------------------------------------
# batch 9 (round 2): curation ops — BPE-style token counting, PII scrub,
# cross-corpus boilerplate line removal

_BPE_RE = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9']+|\s+"


@query(
    "token_count_bpe",
    f"""SELECT doc_id,
              len(regexp_extract_all(text, '{_BPE_RE.replace("'", "''")}'))::BIGINT AS n_bpe_tokens,
              len(string_split(trim(text), ' '))::BIGINT AS n_ws_tokens
       FROM documents""",
)
def q_token_count_bpe(spark, sf_dir):
    """Token accounting with a GPT-2-style pre-tokenizer regex
    (contractions | space-word | space-number | space-punct-run |
    whitespace-run; clean-room ASCII recast of the published gpt-2
    pattern) next to the whitespace count — the budget estimator a
    training pipeline runs corpus-wide. Pure regexp_extract_all, RE2-
    and Java-regex-compatible subset, integer outputs."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(text, \"{_BPE_RE}\", 0)")).cast("long").alias("n_bpe_tokens"),
        F.size(T.tokenize(F.col("text"))).cast("long").alias("n_ws_tokens"),
    )


@query(
    "token_fertility",
    f"""WITH per_doc AS (
         SELECT lang,
                len(regexp_extract_all(text, '{_BPE_RE.replace("'", "''")}'))::BIGINT AS n_bpe,
                len(string_split(trim(text), ' '))::BIGINT AS n_ws,
                strlen(text)::BIGINT AS n_bytes
         FROM documents)
       SELECT lang, count(*)::BIGINT AS n_docs,
              sum(n_bpe)::BIGINT AS sum_bpe,
              sum(n_ws)::BIGINT AS sum_ws,
              sum(n_bytes)::BIGINT AS sum_bytes,
              ((sum(n_bpe) * 1000000) // sum(n_ws))::BIGINT AS fertility_ppm,
              ((sum(n_bytes) * 1000000) // sum(n_bpe))::BIGINT AS bytes_per_token_ppm
       FROM per_doc GROUP BY lang""",
)
def q_token_fertility(spark, sf_dir):
    """Tokenizer fertility accounting per language — the go/no-go
    diagnostic a multilingual pipeline runs before committing to a
    tokenizer: BPE-pretokens per whitespace word (fertility) and UTF-8
    bytes per BPE pretoken, as exact integer ppm (BIGINT multiply
    before integer divide — no float at any corpus size). One narrow
    regexp projection + one groupBy(lang) with map-side partial aggs;
    the lang dimension is tiny so the shuffle is a few rows per
    partition."""
    d = _docs(spark, sf_dir)
    per_doc = d.select(
        "lang",
        F.size(F.expr(f"regexp_extract_all(text, \"{_BPE_RE}\", 0)")).cast("long").alias("n_bpe"),
        F.size(T.tokenize(F.col("text"))).cast("long").alias("n_ws"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bpe").alias("sum_bpe"),
        F.sum("n_ws").alias("sum_ws"),
        F.sum("n_bytes").alias("sum_bytes"),
        F.expr("sum(n_bpe) * 1000000 div sum(n_ws)").alias("fertility_ppm"),
        F.expr("sum(n_bytes) * 1000000 div sum(n_bpe)").alias("bytes_per_token_ppm"),
    )


_EDU_WEIGHTS = [  # (feature, milli-weight) — deterministic stand-in model
    ("alpha_ppm", 1),
    ("stop_ppm", 2),
    ("uniq_ppm", 1),
    ("bias", 300),
]
_EDU_W_SQL = ", ".join(f"('{f}', {w})" for f, w in _EDU_WEIGHTS)


@query(
    "edu_classifier",
    f"""WITH toks AS (
         SELECT doc_id, lower(unnest(string_split(trim(text), ' '))) AS t
         FROM documents),
       agg AS (
         SELECT doc_id, count(*)::BIGINT AS n_words,
                sum(CASE WHEN regexp_matches(t, '[a-z]') THEN 1 ELSE 0 END)::BIGINT AS n_alpha,
                sum(CASE WHEN t IN ({_STOPWORD_SQL_LIST}) THEN 1 ELSE 0 END)::BIGINT AS n_stop,
                count(DISTINCT t)::BIGINT AS n_uniq
         FROM toks GROUP BY doc_id),
       feats AS (
         SELECT doc_id, 'alpha_ppm' AS feat, (n_alpha * 1000000) // n_words AS v FROM agg
         UNION ALL
         SELECT doc_id, 'stop_ppm', (n_stop * 1000000) // n_words FROM agg
         UNION ALL
         SELECT doc_id, 'uniq_ppm', (n_uniq * 1000000) // n_words FROM agg
         UNION ALL
         SELECT doc_id, 'bias', 1000 FROM agg),
       w(feat, w_milli) AS (VALUES {_EDU_W_SQL}),
       scored AS (
         SELECT f.doc_id, sum(f.v * w.w_milli)::BIGINT AS score_u
         FROM feats f JOIN w USING (feat) GROUP BY f.doc_id)
       SELECT doc_id, score_u,
              least(greatest(score_u, 0) // 700000, 5)::BIGINT AS edu_bucket
       FROM scored""",
)
def q_edu_classifier(spark, sf_dir):
    """FineWeb-Edu-style classifier-score bucketing, execution-pattern
    real / weights stand-in: per-doc integer features (alphabetic,
    stopword, distinct-token shares in exact ppm) are melted to long
    form and scored against a BROADCAST weight dimension — the linear-
    classifier-at-scale shape where swapping in trained weights (or
    more features) changes the dimension table, not the plan. Integer
    dot product and fixed bucket thresholds → bit-stable 0-5 buckets
    (the published FineWeb-Edu int-score convention). One token
    aggregation + one broadcast join + one groupBy(doc)."""
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.explode(T.tokenize(F.col("text"))).alias("t0")
    ).select("doc_id", F.lower("t0").alias("t"))
    agg = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.when(F.col("t").rlike("[a-z]"), 1).otherwise(0)).alias("n_alpha"),
        F.sum(F.when(F.col("t").isin(*T.ENGLISH_STOPWORDS), 1).otherwise(0)).alias("n_stop"),
        F.count_distinct("t").alias("n_uniq"),
    )
    feats = None
    for name, expr in [
        ("alpha_ppm", F.expr("n_alpha * 1000000 div n_words")),
        ("stop_ppm", F.expr("n_stop * 1000000 div n_words")),
        ("uniq_ppm", F.expr("n_uniq * 1000000 div n_words")),
        ("bias", F.lit(1000).cast("long")),
    ]:
        part = agg.select("doc_id", F.lit(name).alias("feat"), expr.alias("v"))
        feats = part if feats is None else feats.unionByName(part)
    w = spark.createDataFrame(_EDU_WEIGHTS, "feat string, w_milli long")
    scored = (
        feats.join(F.broadcast(w), "feat")
        .groupBy("doc_id")
        .agg(F.sum(F.col("v") * F.col("w_milli")).cast("long").alias("score_u"))
    )
    return scored.select(
        "doc_id",
        "score_u",
        F.least(
            F.expr("greatest(score_u, 0) div 700000"), F.lit(5).cast("long")
        ).cast("long").alias("edu_bucket"),
    )


_PII_RULES = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d().-]{7,}\d", "<PHONE>"),
]


@query(
    "pii_scrub",
    "SELECT doc_id, "
    + "".join(
        f"regexp_replace(" for _ in _PII_RULES
    )
    + "text"
    + "".join(
        f", '{pat.replace(chr(39), chr(39)*2)}', '{rep}', 'g')" for pat, rep in _PII_RULES
    )
    + " AS clean_text FROM documents",
)
def q_pii_scrub(spark, sf_dir):
    """PII redaction (emails → <EMAIL>, IPv4 → <IP>, phone-like runs →
    <PHONE>): the standard pre-training scrub pass, as a fixed-order
    regexp_replace chain in the RE2/Java-compatible regex subset —
    narrow map stage, no shuffle, byte-comparable across engines."""
    c = F.col("text")
    for pat, rep in _PII_RULES:
        c = F.regexp_replace(c, pat, rep)
    return _docs(spark, sf_dir).select("doc_id", c.alias("clean_text"))


@query(
    "boilerplate_removal",
    """WITH marked AS (
         SELECT doc_id, regexp_replace(text, '\\bthe\\b', 'the.', 'g') AS mtext
         FROM documents),
       sents AS (
         SELECT doc_id,
                unnest(range(len(string_split(regexp_replace(trim(mtext), '([.!?]) +', '\\1' || chr(10), 'g'), chr(10)))))::BIGINT AS pos,
                unnest(list_transform(string_split(regexp_replace(trim(mtext), '([.!?]) +', '\\1' || chr(10), 'g'), chr(10)), s -> trim(s))) AS sentence
         FROM marked),
       sents2 AS (SELECT * FROM sents WHERE sentence != ''),
       df_t AS (
         SELECT sentence, count(DISTINCT doc_id) AS df FROM sents2 GROUP BY 1),
       kept AS (
         SELECT s.doc_id, s.pos, s.sentence
         FROM sents2 s JOIN df_t USING (sentence) WHERE df_t.df < 40),
       agg AS (
         SELECT doc_id, string_agg(sentence, ' ' ORDER BY pos) AS clean_text,
                count(*) AS n_kept
         FROM kept GROUP BY doc_id)
       SELECT m.doc_id, coalesce(a.clean_text, '') AS clean_text,
              coalesce(a.n_kept, 0)::BIGINT AS n_kept
       FROM marked m LEFT JOIN agg a USING (doc_id)""",
)
def q_boilerplate_removal(spark, sf_dir):
    """Cross-corpus boilerplate line removal (CCNet-style: drop lines
    whose document frequency ≥ threshold — nav bars, cookie banners):
    sentence-split (same marker rule as sentence_split), global
    line-DF census (map-side partial agg over (line, doc) pairs), drop
    hot lines, reassemble each doc in original order. The census keys
    on the line text — Zipf-skewed, but the agg is algebraic (count
    distinct per line via two-level agg) so it partial-aggregates;
    reassembly sorts inside each doc's array, not globally."""
    d = _docs(spark, sf_dir)
    marked = F.regexp_replace(F.col("text"), r"\bthe\b", "the.")
    sents = d.select(
        "doc_id", F.posexplode(T.split_sentences(marked)).alias("pos", "sentence")
    ).withColumn("pos", F.col("pos").cast("long"))
    df_t = sents.groupBy("sentence").agg(F.countDistinct("doc_id").alias("df"))
    kept = sents.join(df_t.where(F.col("df") < 40), "sentence")
    agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "sentence"))),
                lambda s: s["sentence"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    return d.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
    )


def _yin_sql() -> str:
    from pliers_spark.functions.audio_features import yin_f0_sql

    return yin_f0_sql()


@query("yin_f0", _yin_sql())
def q_yin_f0(spark, sf_dir):
    """FundamentalFrequencyExtractor role (pliers/extractors/audio.py:
    508-521): the YIN difference-function pitch estimator, 100% built-in
    — window framing, bounded explode, conditional-agg position pivot,
    then shared-text CMND/threshold/argmin expressions. No UDF at all,
    not even for the framing."""
    from pliers_spark.functions.audio_features import yin_f0

    return yin_f0(_events(spark, sf_dir), "user_id", "ts", "value", "event_id")


def _chroma_sql() -> str:
    from pliers_spark.functions.audio_features import chroma_stft_sql
    from pliers_spark.functions.spectral import stft_power_sql

    return chroma_stft_sql(stft_power_sql())


@query("chroma_stft", _chroma_sql())
def q_chroma_stft(spark, sf_dir):
    """ChromaSTFTExtractor role (pliers/extractors/audio.py:368-384):
    per-frame pitch-class energy profile — the A440 class map is folded
    driver-side into literal per-class sums, max-normalized."""
    from pliers_spark.functions.audio_features import chroma_stft
    from pliers_spark.functions.spectral import stft_power_frames

    frames = stft_power_frames(
        _events(spark, sf_dir), "user_id", "ts", "value",
        order_cols=["ts", "event_id"],
    )
    return chroma_stft(frames)


def _curation_pipeline_sql() -> str:
    from pliers_spark.functions.hashing import md5_int_sql

    pii = "text"
    for pat, rep in _PII_RULES:
        pii = f"regexp_replace({pii}, '{pat.replace(chr(39), chr(39)*2)}', '{rep}', 'g')"
    return f"""WITH hashed AS (
         SELECT doc_id, lang, text,
                row_number() OVER (PARTITION BY {md5_int_sql('text')}
                                   ORDER BY doc_id) AS rn
         FROM documents),
       reps AS (SELECT doc_id, lang, text FROM hashed WHERE rn = 1),
       ranked AS (
         SELECT doc_id, lang, text,
                percent_rank() OVER (PARTITION BY lang
                                     ORDER BY length(trim(text)), doc_id) AS pr
         FROM reps),
       kept AS (SELECT * FROM ranked WHERE pr >= 0.1)
       SELECT doc_id, lang, round(pr, 6) AS pr,
              CASE WHEN {md5_int_sql('text', seed=13)} % 100 < 80 THEN 'train'
                   WHEN {md5_int_sql('text', seed=13)} % 100 < 90 THEN 'val'
                   ELSE 'test' END AS split,
              length({pii})::BIGINT AS clean_len
       FROM kept"""


@query("curation_pipeline", _curation_pipeline_sql())
def q_curation_pipeline(spark, sf_dir):
    """End-to-end curation composition as ONE optimized DAG: exact-dedup
    representative selection (content-hash window) -> per-language
    percentile quality gate -> PII scrub -> leak-proof content-hash
    split assignment. Catalyst pipelines the scrub/split projections
    into the rank filter; two window shuffles (hash, lang) total -- the
    shape a 100 TB cleaning pass actually runs."""
    from pliers_spark.queries import _PII_RULES  # self-import safe at call time

    d = _docs(spark, sf_dir)
    w_rep = Window.partitionBy(md5_int(F.col("text"))).orderBy("doc_id")
    reps = d.withColumn("rn", F.row_number().over(w_rep)).where(F.col("rn") == 1)
    w_rank = Window.partitionBy("lang").orderBy(F.length(F.trim(F.col("text"))), F.col("doc_id"))
    ranked = reps.withColumn("pr", F.percent_rank().over(w_rank)).where(F.col("pr") >= 0.1)
    clean = F.col("text")
    for pat, rep in _PII_RULES:
        clean = F.regexp_replace(clean, pat, rep)
    b = F.pmod(md5_int(F.col("text"), seed=13), F.lit(100))
    split = F.when(b < 80, F.lit("train")).when(b < 90, F.lit("val")).otherwise(F.lit("test"))
    return ranked.select(
        "doc_id", "lang", F.round("pr", 6).alias("pr"), split.alias("split"),
        F.length(clean).cast("long").alias("clean_len"),
    )


def _mfcc_energy_sql() -> str:
    from pliers_spark.functions.audio_features import mfcc_energy_sql
    from pliers_spark.functions.spectral import stft_power_sql

    return mfcc_energy_sql(stft_power_sql())


@query("mfcc_energy", _mfcc_energy_sql())
def q_mfcc_energy(spark, sf_dir):
    """MFCCEnergyExtractor (pliers/extractors/audio.py:645-703): low-
    and high-quefrency mel-spectrum reconstructions — select cepstral
    coefficients, inverse-DCT back to mel bands; the orthonormal DCT is
    literal so the whole reconstruction folds into linear shared-text
    expressions over the log-mel values."""
    from pliers_spark.functions.audio_features import mfcc_energy
    from pliers_spark.functions.spectral import stft_power_frames

    frames = stft_power_frames(
        _events(spark, sf_dir), "user_id", "ts", "value",
        order_cols=["ts", "event_id"],
    )
    return mfcc_energy(frames)


def _tempogram_sql() -> str:
    from pliers_spark.functions.audio_features import tempogram_sql
    from pliers_spark.functions.spectral import stft_power_sql

    return tempogram_sql(stft_power_sql())


@query("tempogram", _tempogram_sql())
def q_tempogram(spark, sf_dir):
    """TempogramExtractor role (pliers/extractors/audio.py:470-486):
    local autocorrelation of the onset envelope per (frame, lag) — lag
    products + trailing rolling sums, two pipelined Window passes over
    one Sort, no UDF."""
    from pliers_spark.functions.audio_features import tempogram
    from pliers_spark.functions.spectral import stft_power_frames

    frames = stft_power_frames(
        _events(spark, sf_dir), "user_id", "ts", "value",
        order_cols=["ts", "event_id"],
    )
    return tempogram(frames)


# --------------------------------------------------------------------------
# batch 12: corpus curation — benchmark decontamination and
# quality-weighted importance sampling (operators/curation.py)


def _decontaminate_sql() -> str:
    from pliers_spark.operators.curation import decontaminate_sql

    return decontaminate_sql()


@query("decontaminate", _decontaminate_sql())
def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (the GPT-2/GPT-3/Pile n-gram-overlap
    protocol): flag training docs sharing any word 5-gram with the eval
    split. The eval n-gram set is a broadcast dimension — the corpus
    scan is one narrow shingle map + broadcast hash join, no shuffle of
    the big side (the reason this stays O(corpus) at 100 TB)."""
    from pliers_spark.operators.curation import decontaminate

    return decontaminate(_docs(spark, sf_dir))


def _qws_sql() -> str:
    from pliers_spark.operators.curation import quality_weighted_sample_sql

    return quality_weighted_sample_sql(_QUALITY_ORACLE)


@query("quality_weighted_sample", _qws_sql())
def q_quality_weighted_sample(spark, sf_dir):
    """Quality-bucketed importance resampling (DCLM/FineWeb-style soft
    curation): keep-rate rises with the quality bucket, decided by a
    deterministic content hash (retry-stable, duplicate-consistent),
    kept rows carry 1/rate weights for unbiased downstream aggregates.
    Narrow map + filter — zero shuffle."""
    from pliers_spark.operators.curation import quality_weighted_sample

    return quality_weighted_sample(_docs(spark, sf_dir))


def _dsir_sql() -> str:
    from pliers_spark.operators.curation import dsir_weights_sql

    return dsir_weights_sql("lang = 'en'")


@query("dsir_weights", _dsir_sql())
def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023): hashed word-bigram
    bag features, add-one-smoothed target (lang='en') vs raw unigram
    bucket models, per-doc log likelihood ratio in exact integer
    micro-nats (the bigram-LM rounding convention). The bucket model
    is a bounded broadcast dimension; composes with the hash-lottery
    sampler for the actual resampling step."""
    from pliers_spark.operators.curation import dsir_weights

    return dsir_weights(_docs(spark, sf_dir), F.col("lang") == "en")


def _pack_sql() -> str:
    from pliers_spark.operators.packing import pack_sequences_sql

    return pack_sequences_sql()


@query("sequence_pack", _pack_sql())
def q_sequence_pack(spark, sf_dir):
    """GPT-style sequence packing: every doc's placement in the
    concatenate-and-chunk token stream. The global prefix sum runs as a
    two-level distributed scan (bucket-local cumsum + broadcast bucket
    prefixes) — never a single-task global Window — while the oracle is
    the literal one-window global cumsum it must equal
    (operators/packing.py)."""
    from pliers_spark.operators.packing import pack_sequences

    return pack_sequences(_docs(spark, sf_dir))


def _mixture_sql() -> str:
    from pliers_spark.operators.curation import mixture_sample_sql

    return mixture_sample_sql()


def _temperature_sql() -> str:
    from pliers_spark.operators.curation import temperature_sample_sql

    return temperature_sample_sql()


@query("temperature_sample", _temperature_sql())
def q_temperature_sample(spark, sf_dir):
    """Temperature mixture sampling at α=1/2 (Conneau et al. 2020 /
    Xue et al. 2021): output mixture ∝ sqrt(group size) — flattens the
    source head without equalizing. Keep rule is the squared pure-
    integer gate ticket²·n_s < SCALE²·n_min in DECIMAL/HUGEINT, exact
    at any corpus size."""
    from pliers_spark.operators.curation import temperature_sample

    return temperature_sample(_docs(spark, sf_dir))


def _bm25_sql() -> str:
    from pliers_spark.operators.ir import bm25_topk_sql

    return f"""WITH seeds AS (
         SELECT doc_id, string_split(trim(text), ' ') AS t
         FROM documents ORDER BY doc_id LIMIT 8),
       queries AS (
         SELECT doc_id AS q_id, unnest(t[1:6]) AS term FROM seeds),
       {bm25_topk_sql()}"""


@query("bm25_topk", _bm25_sql())
def q_bm25_topk(spark, sf_dir):
    """Okapi BM25 seed-document retrieval: top-5 corpus documents per
    seed query (8 smallest doc_ids, first 6 tokens each). Inverted-
    index-shaped plan with no materialized index: one (doc,term) tf
    aggregation, broadcast query-term semi-join, integer micro-unit
    score sum (operators/ir.bm25_topk)."""
    from pliers_spark.operators.ir import bm25_topk

    docs = _docs(spark, sf_dir)
    seeds = (
        docs.orderBy("doc_id")
        .limit(8)
        .select(
            F.col("doc_id").alias("q_id"),
            F.explode(F.slice(T.tokenize(F.col("text")), 1, 6)).alias("term"),
        )
    )
    return bm25_topk(docs, seeds, k=5)


def _pmi_sql() -> str:
    from pliers_spark.operators.ir import pmi_collocations_sql

    return pmi_collocations_sql()


@query("pmi_collocations", _pmi_sql())
def q_pmi_collocations(spark, sf_dir):
    """Top-50 bigram collocations by pointwise mutual information
    (Church & Hanks 1990), min count 5: two partial-agg censuses, word-
    key joins (vocab is NOT broadcast — it is corpus-vocabulary-sized at
    scale), integer micro-nat PMI, TakeOrderedAndProject top-k
    (operators/ir.pmi_collocations)."""
    from pliers_spark.operators.ir import pmi_collocations

    return pmi_collocations(_docs(spark, sf_dir))


def _readability_sql() -> str:
    from pliers_spark.operators.ir import readability_sql

    return readability_sql()


@query("readability", _readability_sql())
def q_readability(spark, sf_dir):
    """Flesch reading ease + Flesch–Kincaid grade per document in
    integer micro-units — a pure narrow projection (sentence counting
    and vowel-group syllables as Column algebra over the token array;
    zero shuffle, no UDF) (operators/ir.readability)."""
    from pliers_spark.operators.ir import readability

    return readability(_docs(spark, sf_dir))


def _bm25_rerank_sql() -> str:
    from pliers_spark.operators.ir import bm25_rerank_sql

    return f"""WITH seeds AS (
         SELECT doc_id, string_split(trim(text), ' ') AS t
         FROM documents ORDER BY doc_id LIMIT 8),
       queries AS (
         SELECT doc_id AS q_id, unnest(t[1:6]) AS term FROM seeds),
       {bm25_rerank_sql(k1=20, k=5)}"""


@query("bm25_rerank", _bm25_rerank_sql())
def q_bm25_rerank(spark, sf_dir):
    """Two-stage hybrid retrieval funnel: BM25 lexical recall (top-20)
    → semantic cosine rerank (top-5) against the embedding sidecar
    table. The corpus-sized embedding table is touched only through a
    broadcast semi-join against the tiny candidate set — no dense pass
    (operators/ir.bm25_rerank)."""
    from pliers_spark.operators.ir import bm25_rerank

    docs = _docs(spark, sf_dir)
    seeds = (
        docs.orderBy("doc_id")
        .limit(8)
        .select(
            F.col("doc_id").alias("q_id"),
            F.explode(F.slice(T.tokenize(F.col("text")), 1, 6)).alias("term"),
        )
    )
    emb = load_table(spark, sf_dir, "embeddings")
    return bm25_rerank(docs, seeds, emb, k1=20, k=5)


def _pq_codes_sql() -> str:
    from pliers_spark.operators.similarity import pq_encode_sql

    return pq_encode_sql()


@query("pq_codes", _pq_codes_sql())
def q_pq_codes(spark, sf_dir):
    """Product-quantization encoding (Jégou et al. 2011): 64-float
    vectors → 8 sub-codes against a deterministic seed codebook —
    exact int64 micro-unit distances, smaller-code ties, one
    zero-shuffle Arrow matmul pass (operators/similarity.pq_encode)."""
    from pliers_spark.operators.similarity import pq_encode

    return pq_encode(load_table(spark, sf_dir, "embeddings"))


def _pq_adc_sql() -> str:
    from pliers_spark.operators.similarity import pq_adc_topk_sql

    return pq_adc_topk_sql()


@query("pq_adc_topk", _pq_adc_sql())
def q_pq_adc_topk(spark, sf_dir):
    """Asymmetric-distance ANN over PQ codes: per-query (m × ksub)
    integer distance tables, candidate distance = m table lookups
    summed in int64 — query time never reads a full-precision corpus
    vector (operators/similarity.pq_adc_topk)."""
    from pliers_spark.operators.similarity import pq_adc_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(emb, emb.where(F.col("vec_id") < 8), k=5)


def _ivfpq_sql() -> str:
    from pliers_spark.operators.similarity import ivfpq_topk_sql

    return ivfpq_topk_sql()


@query("ivfpq_topk", _ivfpq_sql())
def q_ivfpq_topk(spark, sf_dir):
    """IVF-PQ (FAISS IndexIVFPQ shape): coarse k-means inverted-file
    gate — only clusters containing a query are encoded-scored — times
    PQ asymmetric-distance scoring; both stages exact int64, the whole
    index bit-reproducible (operators/similarity.ivfpq_topk)."""
    from pliers_spark.operators.similarity import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_topk(emb, emb.where(F.col("vec_id") < 8), kc=8, k=5)


def _pq_recall_sql() -> str:
    from pliers_spark.operators.similarity import pq_recall_sql

    return pq_recall_sql()


@query("pq_recall", _pq_recall_sql())
def q_pq_recall(spark, sf_dir):
    """Recall@5 audit of the PQ ADC index against the exact int64 L2
    truth — the PQ analog of `lsh_recall`: the realized (not
    theoretical) miss rate a deployment must publish before trusting
    compressed search. The synthetic corpus is PQ's worst case
    (near-orthogonal random vectors carry no subspace structure, and
    the codebook is an untrained 16-seed sample), so recall@5 lands
    around 0.15 — which is exactly the point of shipping the audit:
    it is the gate that tells you to train the codebook
    (operators/similarity.pq_recall)."""
    from pliers_spark.operators.similarity import pq_recall

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_recall(emb, emb.where(F.col("vec_id") < 8), k=5)


def _rollup_sql() -> str:
    from pliers_spark.operators.rollup import multires_rollup_sql

    return multires_rollup_sql()


@query(
    "tpch_q6",
    """SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100.0) AS BIGINT)) AS BIGINT)
              AS revenue_cents
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24""",
)
def q_tpch_q6(spark, sf_dir):
    """Forecasting-revenue-change scan (TPC-H Q6): every predicate
    pushes to the parquet scan, one map-side partial sum, no shuffle of
    data rows. Per-row product rounded ONCE to integer cents so the
    global sum is order-independent (cross-engine bit-stable)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .select(
            F.round(F.col("l_extendedprice") * F.col("l_discount") * F.lit(100.0), 0)
            .cast("long")
            .alias("cents")
        )
        .agg(F.sum("cents").cast("long").alias("revenue_cents"))
    )


@query(
    "rolling_multi",
    """WITH base AS (
         SELECT user_id, ts, CAST(round(value * 1000000.0) AS BIGINT) AS v_fp
         FROM events)
       SELECT user_id, ts,
              count(*) OVER w1::BIGINT AS cnt_1h,
              sum(v_fp) OVER w1::BIGINT AS sum_1h_fp,
              count(*) OVER w2::BIGINT AS cnt_24h,
              sum(v_fp) OVER w2::BIGINT AS sum_24h_fp,
              count(*) OVER w3::BIGINT AS cnt_7d,
              sum(v_fp) OVER w3::BIGINT AS sum_7d_fp
       FROM base
       WINDOW
         w1 AS (PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW),
         w2 AS (PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW),
         w3 AS (PARTITION BY user_id ORDER BY ts
                RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)""",
)
def q_rolling_multi(spark, sf_dir):
    """Multi-horizon trailing features (1h/24h/7d count+sum) in ONE
    sorted pass: all six frames share the (user_id, ts) partition+order,
    so Spark plans a single Exchange and a single Sort — the
    several-horizons-per-entity shape every feature store materializes.
    Leakage-safe (frames end at the current row); int64 micro-unit sums
    (tests/test_plans.py pins the 1-Exchange/1-Sort plan)."""
    ev = _events(spark, sf_dir)
    from pliers_spark.operators._util import epoch_micros

    base = ev.select(
        "user_id",
        "ts",
        epoch_micros(ev, "ts").alias("u"),
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("v_fp"),
    )
    out = base
    for name, hours in (("1h", 1), ("24h", 24), ("7d", 168)):
        w = (
            Window.partitionBy("user_id")
            .orderBy("u")
            .rangeBetween(-hours * 3_600_000_000, 0)
        )
        out = out.withColumn(f"cnt_{name}", F.count(F.lit(1)).over(w).cast("long"))
        out = out.withColumn(f"sum_{name}_fp", F.sum("v_fp").over(w).cast("long"))
    return out.select(
        "user_id", "ts",
        "cnt_1h", "sum_1h_fp", "cnt_24h", "sum_24h_fp", "cnt_7d", "sum_7d_fp",
    )


@query(
    "interarrival_stats",
    """WITH g AS (
         SELECT user_id,
                epoch_us(ts) - lag(epoch_us(ts)) OVER
                  (PARTITION BY user_id ORDER BY ts) AS gap_us
         FROM events)
       SELECT user_id, count(gap_us)::BIGINT AS n_gaps,
              min(gap_us)::BIGINT AS min_gap_us,
              max(gap_us)::BIGINT AS max_gap_us,
              CAST(round(sum(gap_us)::DOUBLE / count(gap_us)) AS BIGINT) AS mean_gap_us
       FROM g WHERE gap_us IS NOT NULL GROUP BY user_id""",
)
def q_interarrival_stats(spark, sf_dir):
    """Per-entity inter-arrival cadence (crawl-revisit scheduling
    signal): lag over the entity timeline → exact integer gap
    microseconds → min/max/mean per entity. Equal-timestamp ties leave
    the gap MULTISET invariant, so the aggregates are deterministic
    without a tiebreak column. One shuffle on the entity key."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts")
    u = epoch_micros(ev, "ts")
    g = ev.select(
        "user_id", (u - F.lag(u).over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
        F.round(F.sum("gap_us").cast("double") / F.count(F.lit(1)), 0)
        .cast("long")
        .alias("mean_gap_us"),
    )


@query(
    "quantile_bins",
    """WITH f AS (
         SELECT doc_id, lang, length(trim(text))::BIGINT AS ql FROM documents)
       SELECT doc_id, lang, ql,
              ntile(10) OVER (PARTITION BY lang ORDER BY ql, doc_id)::BIGINT AS decile
       FROM f""",
)
def q_quantile_bins(spark, sf_dir):
    """Per-language decile binning of a quality proxy (feature
    discretization before bucketed training mixes): ntile over the
    language-keyed window with a doc_id tiebreak — deterministic, and
    keyed windows keep the sort partition-sized at corpus scale (the
    same shape as `quality_filter`'s percentile gate)."""
    d = _docs(spark, sf_dir)
    f = d.select("doc_id", "lang", T.text_length("text").cast("long").alias("ql"))
    w = Window.partitionBy("lang").orderBy("ql", "doc_id")
    return f.select("*", F.ntile(10).over(w).cast("long").alias("decile"))


@query(
    "training_matrix",
    """WITH vts AS (
         SELECT user_id, ts,
                sum(CAST(round(value * 1000000.0) AS BIGINT)) AS v_ts
         FROM events GROUP BY 1, 2),
       f1 AS (
         SELECT user_id, ts,
                sum(v_ts) OVER (PARTITION BY user_id ORDER BY ts)::BIGINT AS cum_v_fp
         FROM vts),
       f2 AS (SELECT user_id, ts, max(event_type) AS last_type
              FROM events GROUP BY 1, 2),
       labels AS (
         SELECT user_id, ts AS label_ts,
                max(CASE WHEN value > 0 THEN 1 ELSE 0 END)::BIGINT AS label
         FROM events WHERE event_id % 10 = 0 GROUP BY 1, 2)
       SELECT l.user_id, l.label_ts, l.label, a.cum_v_fp, b.last_type
       FROM labels l
       ASOF LEFT JOIN f1 a ON l.user_id = a.user_id AND l.label_ts >= a.ts
       ASOF LEFT JOIN f2 b ON l.user_id = b.user_id AND l.label_ts >= b.ts""",
)
def q_training_matrix(spark, sf_dir):
    """Point-in-time training-set assembly — the north-rule showcase:
    a label spine as-of joined to TWO feature tables at different
    semantics (cumulative micro-unit value; latest categorical state),
    each via the one-shuffle union+window as-of strategy, so no feature
    cell ever reads past its label_ts (backward-inclusive, pliers'
    step-fill convention). Feature tables are deduped to unique
    (entity, ts) keys first, which makes the as-of match deterministic.
    This is the feature-store read path every training pipeline runs."""
    ev = _events(spark, sf_dir)
    v_fp = F.round(F.col("value") * F.lit(1e6), 0).cast("long")
    vts = ev.select("user_id", "ts", v_fp.alias("v_fp")).groupBy("user_id", "ts").agg(
        F.sum("v_fp").alias("v_ts")
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    f1 = vts.select("user_id", "ts", F.sum("v_ts").over(w).cast("long").alias("cum_v_fp"))
    f2 = ev.groupBy("user_id", "ts").agg(F.max("event_type").alias("last_type"))
    labels = (
        ev.where(F.col("event_id") % 10 == 0)
        .select(
            "user_id",
            F.col("ts").alias("label_ts"),
            F.when(F.col("value") > 0, 1).otherwise(0).alias("l"),
        )
        .groupBy("user_id", "label_ts")
        .agg(F.max("l").cast("long").alias("label"))
    )
    m1 = A.asof_join(
        labels, f1, ["user_id"], "label_ts", "ts", ["cum_v_fp"], matched_ts_col=None
    )
    m2 = A.asof_join(
        m1, f2, ["user_id"], "label_ts", "ts", ["last_type"], matched_ts_col=None
    )
    return m2.select("user_id", "label_ts", "label", "cum_v_fp", "last_type")


@query(
    "target_encode_pit",
    """WITH base AS (
         SELECT event_id, event_type, ts, epoch_us(ts) AS u,
                CASE WHEN value > 34.0 THEN 1 ELSE 0 END AS label
         FROM events)
       SELECT event_id, event_type, ts, label::BIGINT AS label,
              (count(label) OVER w)::BIGINT AS cnt_past,
              CASE WHEN (count(label) OVER w) = 0 THEN NULL
                   ELSE CAST(round((sum(label) OVER w)::DOUBLE * 1000000.0
                                   / (count(label) OVER w)) AS BIGINT)
              END AS enc_fp
       FROM base
       WINDOW w AS (PARTITION BY event_type ORDER BY u
                    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)""",
)
def q_target_encode_pit(spark, sf_dir):
    """Point-in-time target encoding — the leakage-SAFE variant of the
    classic categorical encoder: each row's encoding is the mean label
    of STRICTLY-PAST rows in its category (expanding frame ending 1µs
    before the current key), so the feature never sees its own or any
    future label — train-serve-consistent by construction and exactly
    the north rule's zero-leakage contract. Equal-timestamp rows share
    identical frames (deterministic without a tiebreak). First
    occurrence per category encodes NULL (the explicit cold-start
    signal, not a silent prior)."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_id",
        "event_type",
        "ts",
        epoch_micros(ev, "ts").alias("u"),
        F.when(F.col("value") > 34.0, 1).otherwise(0).alias("label"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("u")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    cnt = F.count("label").over(w)
    s = F.sum("label").over(w)
    return base.select(
        "event_id",
        "event_type",
        "ts",
        F.col("label").cast("long").alias("label"),
        cnt.cast("long").alias("cnt_past"),
        F.when(
            cnt == 0, F.lit(None).cast("long")
        ).otherwise(
            F.round(s.cast("double") * F.lit(1e6) / cnt, 0).cast("long")
        ).alias("enc_fp"),
    )


_PSI_BINS = 8


@query(
    "feature_psi",
    f"""WITH f AS (
         SELECT doc_id, length(trim(text))::BIGINT AS ql,
                doc_id < 250 AS is_ref
         FROM documents),
       rstats AS (
         SELECT min(ql) AS rmin, max(ql) AS rmax FROM f WHERE is_ref),
       binned AS (
         SELECT CAST(greatest(least(floor((ql - rstats.rmin) * {_PSI_BINS}
                                          / (rstats.rmax - rstats.rmin + 1)),
                                    {_PSI_BINS - 1}), 0) AS BIGINT) AS bin,
                is_ref
         FROM f CROSS JOIN rstats),
       cnts AS (
         SELECT b.bin,
                coalesce(sum(CASE WHEN binned.is_ref THEN 1 END), 0)::BIGINT AS ref_cnt,
                coalesce(sum(CASE WHEN NOT binned.is_ref THEN 1 END), 0)::BIGINT AS cur_cnt
         FROM (SELECT unnest(range({_PSI_BINS}))::BIGINT AS bin) b
         LEFT JOIN binned ON binned.bin = b.bin
         GROUP BY 1),
       tot AS (SELECT sum(ref_cnt) AS n_ref, sum(cur_cnt) AS n_cur FROM cnts),
       terms AS (
         SELECT bin, ref_cnt, cur_cnt,
                CAST(round(
                  ((ref_cnt + 1)::DOUBLE / (tot.n_ref + {_PSI_BINS})
                   - (cur_cnt + 1)::DOUBLE / (tot.n_cur + {_PSI_BINS}))
                  * ln(((ref_cnt + 1)::DOUBLE / (tot.n_ref + {_PSI_BINS}))
                       / ((cur_cnt + 1)::DOUBLE / (tot.n_cur + {_PSI_BINS})))
                  * 1000000.0) AS BIGINT) AS term_fp
         FROM cnts CROSS JOIN tot)
       SELECT bin, ref_cnt, cur_cnt, term_fp,
              sum(term_fp) OVER ()::BIGINT AS psi_total_fp
       FROM terms""",
)
def q_feature_psi(spark, sf_dir):
    """Population-stability-index drift monitor between a reference
    corpus slice and the current one (the alarm a feature store raises
    before a model silently degrades on a new crawl): reference-anchored
    equal-width integer bins (exact int64 arithmetic, clamped), Laplace-
    smoothed bin shares, each PSI term rounded ONCE to integer
    micro-nats then summed exactly — per-bin evidence plus the headline
    total on every row. Two partial-agg passes, 1-row broadcast stats;
    nothing here breaks at 10^12 rows."""
    d = _docs(spark, sf_dir)
    f = d.select(
        T.text_length("text").cast("long").alias("ql"),
        (F.col("doc_id") < 250).alias("is_ref"),
    )
    rstats = f.where("is_ref").agg(
        F.min("ql").alias("rmin"), F.max("ql").alias("rmax")
    )
    binned = f.crossJoin(F.broadcast(rstats)).select(
        F.greatest(
            F.least(
                (F.col("ql") - F.col("rmin")) * _PSI_BINS
                / (F.col("rmax") - F.col("rmin") + 1),
                F.lit(_PSI_BINS - 1),
            ),
            F.lit(0),
        ).cast("long").alias("bin"),
        "is_ref",
    )
    # aggregate to bin grain BEFORE touching the spine: the corpus
    # collapses map-side to ≤ _PSI_BINS rows; joining the raw binned
    # rows against an 8-row spine first would be an 8-key skewed join
    # (and unbroadcastable at corpus scale)
    agg0 = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0))
        .cast("long").alias("ref_cnt"),
        F.sum(F.when(~F.col("is_ref"), 1).otherwise(0))
        .cast("long").alias("cur_cnt"),
    )
    cnts = (
        spark.range(_PSI_BINS).select(F.col("id").alias("bin"))
        .join(F.broadcast(agg0), "bin", "left")
        .select(
            "bin",
            F.coalesce(F.col("ref_cnt"), F.lit(0)).cast("long").alias("ref_cnt"),
            F.coalesce(F.col("cur_cnt"), F.lit(0)).cast("long").alias("cur_cnt"),
        )
    )
    tot = cnts.agg(
        F.sum("ref_cnt").alias("n_ref"), F.sum("cur_cnt").alias("n_cur")
    )
    p = (F.col("ref_cnt") + 1).cast("double") / (F.col("n_ref") + _PSI_BINS)
    q = (F.col("cur_cnt") + 1).cast("double") / (F.col("n_cur") + _PSI_BINS)
    terms = cnts.crossJoin(F.broadcast(tot)).select(
        "bin",
        "ref_cnt",
        "cur_cnt",
        F.round((p - q) * F.log(p / q) * F.lit(1e6), 0).cast("long").alias("term_fp"),
    )
    wall = Window.partitionBy()
    return terms.select(
        "*", F.sum("term_fp").over(wall).cast("long").alias("psi_total_fp")
    )


_DECAY_TIERS = 6
_DECAY_H_US = 3_600_000_000  # 1h tier width in µs


def _decay_tiers_sql() -> str:
    cols, wins = [], []
    for k in range(_DECAY_TIERS):
        lo = (k + 1) * _DECAY_H_US - 1
        hi = max(k * _DECAY_H_US, 1)
        wins.append(
            f"w{k} AS (PARTITION BY user_id ORDER BY u "
            f"RANGE BETWEEN {lo} PRECEDING AND {hi} PRECEDING)"
        )
        cols.append(f"(count(*) OVER w{k})::BIGINT AS cnt_t{k}")
    decayed = " + ".join(
        f"count(*) OVER w{k} * {2 ** (_DECAY_TIERS - 1 - k)}"
        for k in range(_DECAY_TIERS)
    )
    return (
        "WITH base AS (SELECT event_id, user_id, ts, epoch_us(ts) AS u FROM events)\n"
        "SELECT event_id, user_id, ts,\n  "
        + ",\n  ".join(cols)
        + f",\n  ({decayed})::BIGINT AS decayed_fp\nFROM base\nWINDOW "
        + ",\n  ".join(wins)
    )


@query("decay_tiers", _decay_tiers_sql())
def q_decay_tiers(spark, sf_dir):
    """Tiered geometric time-decay counts — the feature store's EWMA
    recency signal in EXACT integer arithmetic: the strictly-past hour
    axis is cut into 6 half-open 1h tiers (t-(k+1)h, t-kh], tier k
    weighted 2^(5-k), so decayed_fp halves per hour of age with no
    float accumulation and no cross-engine drift. All 6 frames share
    one (user_id, u) partition+order → a single Exchange and a single
    Sort regardless of tier count (same 1-pass shape as rolling_multi).
    Frames end at 1µs before the row: same-timestamp neighbours and the
    row itself are excluded — zero leakage AND tie-determinism."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    out = ev.select(
        "event_id", "user_id", "ts", epoch_micros(ev, "ts").alias("u")
    )
    decayed = F.lit(0)
    for k in range(_DECAY_TIERS):
        lo = -((k + 1) * _DECAY_H_US - 1)
        hi = -max(k * _DECAY_H_US, 1)
        w = Window.partitionBy("user_id").orderBy("u").rangeBetween(lo, hi)
        cnt = F.count(F.lit(1)).over(w)
        out = out.withColumn(f"cnt_t{k}", cnt.cast("long"))
        decayed = decayed + F.col(f"cnt_t{k}") * F.lit(2 ** (_DECAY_TIERS - 1 - k))
    return out.withColumn("decayed_fp", decayed.cast("long")).drop("u")


@query(
    "session_position",
    f"""WITH flagged AS (
         SELECT event_id, user_id, ts, epoch_us(ts) AS u,
                CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch(ts) - epoch(lag(ts) OVER w) > {_SESSION_GAP_S}
                     THEN 1 ELSE 0 END AS is_new,
                epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       sess AS (
         SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         FROM flagged)
       SELECT event_id, user_id, ts, session_id::BIGINT AS session_id,
              row_number() OVER (PARTITION BY user_id, session_id
                                 ORDER BY ts, event_id)::BIGINT AS pos_in_session,
              (u - min(u) OVER (PARTITION BY user_id, session_id))::BIGINT
                AS t_into_session_us,
              gap_us::BIGINT AS gap_us
       FROM sess""",
)
def q_session_position(spark, sf_dir):
    """Event-grain within-session features that are leakage-safe by
    construction: position-in-session, µs since session start, and gap
    to the previous event all derive from the CURRENT and EARLIER rows
    only (session start is the first event's own timestamp — known the
    moment it happens, unlike session end/duration which are future
    facts and belong in session-grain offline rollups like `sessionize`).
    Session assignment reuses temporal.sessionize's running-flag-sum;
    both window layers share the user_id shuffle. Ties broken by
    event_id so row_number is deterministic."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir).select("event_id", "user_id", "ts")
    u = epoch_micros(ev, "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = ev.select("event_id", "user_id", "ts", u.alias("u"))
    prev_u = F.lag("u").over(w)
    flagged = base.select(
        "*",
        F.when(
            prev_u.isNull()
            | ((F.col("u") - prev_u) > _SESSION_GAP_S * 1_000_000),
            1,
        ).otherwise(0).alias("is_new"),
        (F.col("u") - prev_u).alias("gap_us"),
    )
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn("session_id", F.sum("is_new").over(wc))
    ws = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    wall = Window.partitionBy("user_id", "session_id")
    return sess.select(
        "event_id",
        "user_id",
        "ts",
        F.col("session_id").cast("long").alias("session_id"),
        F.row_number().over(ws).cast("long").alias("pos_in_session"),
        (F.col("u") - F.min("u").over(wall)).cast("long").alias("t_into_session_us"),
        F.col("gap_us").cast("long").alias("gap_us"),
    )


@query(
    "label_horizon",
    """WITH base AS (
         SELECT event_id, user_id, ts, epoch_us(ts) AS u, event_type,
                CAST(round(value * 1000000.0) AS BIGINT) AS v_fp
         FROM events)
       SELECT event_id, user_id, ts,
              (count(*) OVER w1)::BIGINT AS future_cnt_1h,
              coalesce(sum(v_fp) OVER w1, 0)::BIGINT AS future_sum_1h_fp,
              coalesce(max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                         OVER w24, 0)::BIGINT AS label_error_24h
       FROM base
       WINDOW
         w1 AS (PARTITION BY user_id ORDER BY u
                RANGE BETWEEN 1 FOLLOWING AND 3600000000 FOLLOWING),
         w24 AS (PARTITION BY user_id ORDER BY u
                 RANGE BETWEEN 1 FOLLOWING AND 86400000000 FOLLOWING)""",
)
def q_label_horizon(spark, sf_dir):
    """Forward-horizon label construction — the ONE place future rows
    are legal: supervision targets. For each event, activity count/sum
    over (t, t+1h] and a binary did-an-error-occur flag over (t, t+24h],
    as strictly-FORWARD range frames (offset 1 excludes the row itself
    and its same-timestamp peers, so labels are tie-deterministic and
    never self-referential). Paired with target_encode_pit /
    training_matrix this completes the leakage discipline: features
    look strictly back, labels strictly forward, same single per-entity
    shuffle either way."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_id",
        "user_id",
        "ts",
        epoch_micros(ev, "ts").alias("u"),
        "event_type",
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("v_fp"),
    )
    w1 = Window.partitionBy("user_id").orderBy("u").rangeBetween(1, 3_600_000_000)
    w24 = Window.partitionBy("user_id").orderBy("u").rangeBetween(1, 86_400_000_000)
    return base.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w1).cast("long").alias("future_cnt_1h"),
        F.coalesce(F.sum("v_fp").over(w1), F.lit(0)).cast("long")
        .alias("future_sum_1h_fp"),
        F.coalesce(
            F.max(F.when(F.col("event_type") == "error", 1).otherwise(0)).over(w24),
            F.lit(0),
        ).cast("long").alias("label_error_24h"),
    )


_MI_MIN_DF = 5
_MI_LABEL_LEN = 300


@query(
    "token_label_mi",
    f"""WITH docs2 AS (
         SELECT doc_id,
                CASE WHEN length(trim(text)) > {_MI_LABEL_LEN} THEN 1 ELSE 0 END AS label,
                list_distinct({_tok_sql()}) AS toks
         FROM documents),
       tot AS (SELECT sum(label) AS n_pos, count(*) - sum(label) AS n_neg FROM docs2),
       tl AS (
         SELECT unnest(toks) AS token, label FROM docs2),
       cnt AS (
         SELECT token,
                sum(label)::BIGINT AS n11,
                (count(*) - sum(label))::BIGINT AS n10
         FROM tl GROUP BY token HAVING count(*) >= {_MI_MIN_DF}),
       cells AS (
         SELECT token, n11, n10,
                (tot.n_pos - n11)::BIGINT AS n01,
                (tot.n_neg - n10)::BIGINT AS n00,
                (tot.n_pos + tot.n_neg)::BIGINT AS n
         FROM cnt CROSS JOIN tot),
       mi AS (
         SELECT token, n11, n10, n01, n00,
                (CAST(round(((n11 + 1.0) / (n + 4)) * ln((n11 + 1.0) * (n + 4)
                     / ((n11 + n10 + 2.0) * (n11 + n01 + 2.0))) * 1000000.0) AS BIGINT)
               + CAST(round(((n10 + 1.0) / (n + 4)) * ln((n10 + 1.0) * (n + 4)
                     / ((n11 + n10 + 2.0) * (n10 + n00 + 2.0))) * 1000000.0) AS BIGINT)
               + CAST(round(((n01 + 1.0) / (n + 4)) * ln((n01 + 1.0) * (n + 4)
                     / ((n01 + n00 + 2.0) * (n11 + n01 + 2.0))) * 1000000.0) AS BIGINT)
               + CAST(round(((n00 + 1.0) / (n + 4)) * ln((n00 + 1.0) * (n + 4)
                     / ((n01 + n00 + 2.0) * (n10 + n00 + 2.0))) * 1000000.0) AS BIGINT)
                ) AS mi_fp
         FROM cells)
       SELECT token, n11, n10, n01, n00, mi_fp
       FROM mi ORDER BY mi_fp DESC, token LIMIT 100""",
)
def q_token_label_mi(spark, sf_dir):
    """Mutual-information feature selection (token presence vs a doc
    label): per-token 2x2 contingency from ONE explode+groupBy of
    distinct tokens (map-side partial agg; the label marginals are a
    1-row broadcast), Laplace-smoothed pointwise terms each rounded
    ONCE to integer micro-nats (the feature_psi determinism recipe),
    min_df gate, top-100 by (mi_fp, token) — deterministic under ties.
    This is the supervised cousin of tfidf: the standard cheap filter
    before training a quality/edu classifier at corpus scale."""
    d = _docs(spark, sf_dir)
    docs2 = d.select(
        F.when(T.text_length("text") > _MI_LABEL_LEN, 1).otherwise(0).alias("label"),
        F.array_distinct(T.tokenize(F.col("text"))).alias("toks"),
    )
    tot = docs2.agg(
        F.sum("label").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("label")).alias("n_neg"),
    )
    cnt = (
        docs2.select(F.explode("toks").alias("token"), "label")
        .groupBy("token")
        .agg(
            F.sum("label").cast("long").alias("n11"),
            (F.count(F.lit(1)) - F.sum("label")).cast("long").alias("n10"),
        )
        .where(F.col("n11") + F.col("n10") >= _MI_MIN_DF)
    )
    cells = cnt.crossJoin(F.broadcast(tot)).select(
        "token",
        "n11",
        "n10",
        (F.col("n_pos") - F.col("n11")).cast("long").alias("n01"),
        (F.col("n_neg") - F.col("n10")).cast("long").alias("n00"),
        (F.col("n_pos") + F.col("n_neg")).cast("long").alias("n"),
    )

    def term(nij, row_m, col_m):
        p = (nij + F.lit(1.0)) / (F.col("n") + 4)
        lift = (nij + F.lit(1.0)) * (F.col("n") + 4) / ((row_m + F.lit(2.0)) * (col_m + F.lit(2.0)))
        return F.round(p * F.log(lift) * F.lit(1e6), 0).cast("long")

    n11, n10, n01, n00 = (F.col(c) for c in ("n11", "n10", "n01", "n00"))
    mi = cells.select(
        "token", "n11", "n10", "n01", "n00",
        (
            term(n11, n11 + n10, n11 + n01)
            + term(n10, n11 + n10, n10 + n00)
            + term(n01, n01 + n00, n11 + n01)
            + term(n00, n01 + n00, n10 + n00)
        ).alias("mi_fp"),
    )
    return mi.orderBy(F.desc("mi_fp"), "token").limit(100)


_CROSS_BUCKETS = 64


@query(
    "hashed_cross",
    f"""WITH pairs AS (
         SELECT event_type || '|' || CAST(hour(ts) AS VARCHAR) AS cross_key
         FROM events)
       SELECT CAST({md5_int_sql('cross_key')} % {_CROSS_BUCKETS} AS BIGINT) AS bucket,
              count(*)::BIGINT AS n_events,
              count(DISTINCT cross_key)::BIGINT AS n_crosses
       FROM pairs GROUP BY 1""",
)
def q_hashed_cross(spark, sf_dir):
    """Feature-hashing trick over a categorical cross (event_type x
    hour-of-day → fixed 64-bucket space): the md5-derived bucket is a
    pure per-row map (no vocabulary build, no second pass — the whole
    point of hashing features at 10^12 rows), then one groupBy with
    map-side partial agg; n_crosses per bucket surfaces the collision
    rate the dimensionality trade bought. Bit-identical across engines
    because the hash is md5-prefix arithmetic (functions/hashing.py)."""
    ev = _events(spark, sf_dir)
    pairs = ev.select(
        F.concat(
            F.col("event_type"), F.lit("|"), F.hour("ts").cast("string")
        ).alias("cross_key")
    )
    return (
        pairs.withColumn(
            "bucket", (md5_int(F.col("cross_key")) % _CROSS_BUCKETS).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("cross_key").cast("long").alias("n_crosses"),
        )
    )


@query(
    "scd2_build",
    """WITH ordered AS (
         SELECT user_id, ts, event_id, event_type,
                lag(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev_type
         FROM events),
       changes AS (
         SELECT user_id, ts AS valid_from, event_type AS state
         FROM ordered WHERE prev_type IS NULL OR prev_type <> event_type)
       SELECT user_id, state, valid_from,
              lead(valid_from) OVER w AS valid_to,
              row_number() OVER w::BIGINT AS version,
              (lead(valid_from) OVER w IS NULL) AS is_current
       FROM changes
       WINDOW w AS (PARTITION BY user_id ORDER BY valid_from)""",
)
def q_scd2_build(spark, sf_dir):
    """Slowly-changing-dimension type-2 build from an event log: keep
    only rows where the tracked state CHANGES (lag compare), then
    lead() closes each interval — (user, state, valid_from, valid_to,
    version, is_current). This is the dimension table the as-of join /
    training_matrix reads for point-in-time categorical state, produced
    in one entity shuffle shared by both window layers (change rows are
    a subset, so the second Sort is intra-partition). Ties broken by
    event_id; valid_to is exclusive and NULL on the open interval."""
    ev = _events(spark, sf_dir)
    w0 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.lag("event_type").over(w0).alias("prev_type"),
    )
    changes = ordered.where(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select("user_id", F.col("ts").alias("valid_from"),
             F.col("event_type").alias("state"))
    w = Window.partitionBy("user_id").orderBy("valid_from")
    return changes.select(
        "user_id", "state", "valid_from",
        F.lead("valid_from").over(w).alias("valid_to"),
        F.row_number().over(w).cast("long").alias("version"),
        F.lead("valid_from").over(w).isNull().alias("is_current"),
    )


@query(
    "funnel_steps",
    """WITH base AS (
         SELECT user_id, event_id, event_type, epoch_us(ts) AS u FROM events),
       scanned AS (
         SELECT user_id, event_type, u,
                min(CASE WHEN event_type = 'view' THEN u END) OVER w AS v_min
         FROM base WINDOW w AS (PARTITION BY user_id ORDER BY u, event_id
                                ROWS UNBOUNDED PRECEDING)),
       s2 AS (
         SELECT user_id, event_type, u, v_min,
                min(CASE WHEN event_type = 'click' AND v_min < u THEN u END)
                  OVER w AS c_min
         FROM scanned WINDOW w AS (PARTITION BY user_id ORDER BY u
                                   ROWS UNBOUNDED PRECEDING))
       SELECT user_id,
              min(v_min)::BIGINT AS view_u,
              min(c_min)::BIGINT AS click_u,
              min(CASE WHEN event_type = 'purchase' AND c_min < u THEN u END)
                ::BIGINT AS purchase_u,
              (CASE WHEN min(CASE WHEN event_type = 'purchase' AND c_min < u
                                  THEN u END) IS NOT NULL THEN 3
                    WHEN min(c_min) IS NOT NULL THEN 2
                    WHEN min(v_min) IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS depth
       FROM s2 GROUP BY user_id""",
)
def q_funnel_steps(spark, sf_dir):
    """Ordered-funnel analysis (view → click → purchase) in ONE sorted
    scan per entity — no self-joins, no per-step passes: a running min
    of qualifying-step timestamps makes step k's predicate 'after the
    earliest step-(k-1) completion so far' a plain window expression,
    so the classic product-analytics sequence match costs exactly one
    (user_id, u) Exchange+Sort however deep the funnel. Strict '<'
    keeps one event from serving two steps; final per-user agg reports
    each step's completion time and the funnel depth reached."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    base = ev.select(
        "user_id", "event_id", "event_type", epoch_micros(ev, "ts").alias("u")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("u", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = F.col("u")
    v_min = F.min(F.when(F.col("event_type") == "view", u)).over(w)
    scanned = base.select("user_id", "event_type", "u", v_min.alias("v_min"))
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("u")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c_min = F.min(
        F.when((F.col("event_type") == "click") & (F.col("v_min") < u), u)
    ).over(w2)
    s2 = scanned.select("user_id", "event_type", "u", "v_min", c_min.alias("c_min"))
    p_u = F.min(
        F.when((F.col("event_type") == "purchase") & (F.col("c_min") < u), u)
    )
    return s2.groupBy("user_id").agg(
        F.min("v_min").cast("long").alias("view_u"),
        F.min("c_min").cast("long").alias("click_u"),
        p_u.cast("long").alias("purchase_u"),
        F.when(p_u.isNotNull(), 3)
        .when(F.min("c_min").isNotNull(), 2)
        .when(F.min("v_min").isNotNull(), 1)
        .otherwise(0)
        .cast("long")
        .alias("depth"),
    )


_WEEK_US = 7 * 86_400_000_000


@query(
    "retention_cohorts",
    f"""WITH uw AS (
         SELECT user_id, epoch_us(ts) // {_WEEK_US} AS week_idx FROM events),
       firsts AS (
         SELECT user_id, min(week_idx) AS cohort_w FROM uw GROUP BY user_id),
       active AS (SELECT DISTINCT user_id, week_idx FROM uw)
       SELECT f.cohort_w::BIGINT AS cohort_w,
              (a.week_idx - f.cohort_w)::BIGINT AS week_offset,
              count(*)::BIGINT AS n_users
       FROM active a JOIN firsts f USING (user_id)
       GROUP BY 1, 2""",
)
def q_retention_cohorts(spark, sf_dir):
    """Retention-cohort matrix (the crawl-revisit loyalty table): epoch
    weeks (integer µs division — no calendar/timezone semantics to
    disagree on across engines), first-week cohort per entity, distinct
    active (entity, week) pairs, then cohort x offset user counts. The
    cohort table is entity-grain (small) so the join broadcasts at any
    corpus scale; both aggs are map-side partial."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    uw = ev.select(
        "user_id", F.floor(epoch_micros(ev, "ts") / _WEEK_US).alias("week_idx")
    )
    firsts = uw.groupBy("user_id").agg(F.min("week_idx").alias("cohort_w"))
    active = uw.distinct()
    return (
        active.join(F.broadcast(firsts), "user_id")
        .groupBy(
            F.col("cohort_w").cast("long").alias("cohort_w"),
            (F.col("week_idx") - F.col("cohort_w")).cast("long").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


@query(
    "cdc_merge",
    """WITH base AS (
         SELECT event_id AS key, CAST(round(value * 1000000.0) AS BIGINT) AS v_fp
         FROM events WHERE event_id < 5000),
       ch AS (
         SELECT event_id - 5000 AS key,
                CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
                CAST(round(value * 1000000.0) AS BIGINT) AS new_v
         FROM events WHERE event_id >= 5000)
       SELECT coalesce(b.key, c.key)::BIGINT AS key,
              (CASE WHEN c.op = 'U' THEN c.new_v ELSE b.v_fp END)::BIGINT AS v_fp,
              CASE WHEN c.op IS NULL THEN 'kept'
                   WHEN b.key IS NULL THEN 'inserted'
                   ELSE 'updated' END AS action
       FROM base b FULL JOIN ch c ON b.key = c.key
       WHERE c.op IS NULL OR c.op <> 'D'""",
)
def q_cdc_merge(spark, sf_dir):
    """MERGE INTO semantics (the lakehouse CDC apply step) as one full
    outer join on the key: unmatched base rows are kept, 'U' changes
    update-or-insert, 'D' changes delete — all resolved with plain
    conditional projection, no per-row Python and exactly one key
    shuffle (AQE splits skewed keys at scale; a real run would write
    copy-on-write files like sources/snapshots.delete_rows). The change
    feed here is derived deterministically from the events table so the
    oracle replays the identical merge."""
    ev = _events(spark, sf_dir)
    v_fp = F.round(F.col("value") * F.lit(1e6), 0).cast("long")
    base = ev.where(F.col("event_id") < 5000).select(
        F.col("event_id").alias("key"), v_fp.alias("v_fp")
    )
    ch = ev.where(F.col("event_id") >= 5000).select(
        (F.col("event_id") - 5000).alias("key"),
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        v_fp.alias("new_v"),
    )
    j = base.join(ch, "key", "full")
    return (
        j.where(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            F.col("key").cast("long").alias("key"),
            F.when(F.col("op") == "U", F.col("new_v"))
            .otherwise(F.col("v_fp"))
            .cast("long")
            .alias("v_fp"),
            F.when(F.col("op").isNull(), "kept")
            .when(F.col("v_fp").isNull(), "inserted")
            .otherwise("updated")
            .alias("action"),
        )
    )


_CV_FOLDS = 4
_CV_EMBARGO_US = 3_600_000_000  # 1h purge gap between train end and test start


@query(
    "walk_forward_cv",
    f"""WITH base AS (SELECT event_id, epoch_us(ts) AS u FROM events),
       bounds AS (SELECT min(u) AS u0,
                         (max(u) - min(u)) // {_CV_FOLDS} AS span FROM base),
       folds AS (
         SELECT f.fold, bounds.u0 + f.fold * bounds.span AS test_start,
                bounds.u0 + (f.fold + 1) * bounds.span AS test_end
         FROM (SELECT unnest(range({_CV_FOLDS}))::BIGINT AS fold) f
         CROSS JOIN bounds)
       SELECT b.event_id, f.fold,
              CASE WHEN b.u >= f.test_start AND b.u < f.test_end THEN 'test'
                   ELSE 'train' END AS role
       FROM base b CROSS JOIN folds f
       WHERE (b.u >= f.test_start AND b.u < f.test_end)
          OR b.u < f.test_start - {_CV_EMBARGO_US}""",
)
def q_walk_forward_cv(spark, sf_dir):
    """Walk-forward (purged) cross-validation assignment — the
    time-series CV that respects the zero-leakage rule: fold k tests on
    window k and trains ONLY on rows ending an embargo gap before the
    test window starts (rows inside the gap are excluded entirely, so
    rolling features computed near the boundary can't smuggle test-set
    information into training). Fold boundaries are integer-µs
    arithmetic off a 1-row broadcast bounds agg; assignment is a
    broadcast cross with a 4-row fold spec — a pure per-row map at any
    corpus scale. Ordinary k-fold on time-series data leaks; this is
    the standard fix (cf. combinatorial purged CV in the quant ML
    literature)."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    base = ev.select("event_id", epoch_micros(ev, "ts").alias("u"))
    bounds = base.agg(
        F.min("u").alias("u0"),
        F.floor((F.max("u") - F.min("u")) / _CV_FOLDS).alias("span"),
    )
    folds = (
        spark.range(_CV_FOLDS)
        .select(F.col("id").alias("fold"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "fold",
            (F.col("u0") + F.col("fold") * F.col("span")).alias("test_start"),
            (F.col("u0") + (F.col("fold") + 1) * F.col("span")).alias("test_end"),
        )
    )
    j = base.crossJoin(F.broadcast(folds))
    in_test = (F.col("u") >= F.col("test_start")) & (F.col("u") < F.col("test_end"))
    in_train = F.col("u") < F.col("test_start") - _CV_EMBARGO_US
    return j.where(in_test | in_train).select(
        "event_id",
        F.col("fold").cast("long").alias("fold"),
        F.when(in_test, "test").otherwise("train").alias("role"),
    )


_ANOM_WIN = 100
_ANOM_MIN_N = 20


@query(
    "rolling_anomaly",
    f"""WITH base AS (
         SELECT event_id, user_id, epoch_us(ts) AS u,
                CAST(round(value * 100.0) AS BIGINT) AS c
         FROM events),
       stats AS (
         SELECT event_id, user_id, c,
                count(*) OVER w::BIGINT AS n_win,
                sum(c) OVER w AS s,
                sum(c * c) OVER w AS ss
         FROM base
         WINDOW w AS (PARTITION BY user_id ORDER BY u, event_id
                      ROWS BETWEEN {_ANOM_WIN} PRECEDING AND 1 PRECEDING))
       SELECT event_id, user_id, n_win,
              CASE WHEN n_win >= {_ANOM_MIN_N} AND n_win * ss - s * s > 0
                   THEN CAST(round(
                     (c - s::DOUBLE / n_win)
                     / sqrt((n_win * ss - s * s)::DOUBLE / (n_win * (n_win - 1)))
                     * 1000000.0) AS BIGINT)
              END AS z_fp,
              coalesce(abs(CASE WHEN n_win >= {_ANOM_MIN_N}
                                     AND n_win * ss - s * s > 0
                   THEN CAST(round(
                     (c - s::DOUBLE / n_win)
                     / sqrt((n_win * ss - s * s)::DOUBLE / (n_win * (n_win - 1)))
                     * 1000000.0) AS BIGINT) END) > 3000000, FALSE) AS is_anomaly
       FROM stats""",
)
def q_rolling_anomaly(spark, sf_dir):
    """Trailing z-score anomaly flag with EXACT sufficient statistics:
    the strictly-past {_ANOM_WIN}-row frame carries int64 sum and
    sum-of-squares of centi-scaled values (bounded frame ⇒ bounded
    magnitude at ANY corpus size), variance comes from the integer
    identity n·Σx² − (Σx)², and the only float ops are IEEE-exact
    divide/sqrt rounded ONCE to micro-z — bit-stable across engines.
    One (user_id) shuffle; NULL z below {_ANOM_MIN_N} warm-up rows or
    on zero variance (explicit cold-start signal, mirroring
    target_encode_pit)."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_id",
        "user_id",
        epoch_micros(ev, "ts").alias("u"),
        F.round(F.col("value") * F.lit(100.0), 0).cast("long").alias("c"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("u", "event_id")
        .rowsBetween(-_ANOM_WIN, -1)
    )
    stats = base.select(
        "event_id",
        "user_id",
        "c",
        F.count(F.lit(1)).over(w).cast("long").alias("n_win"),
        F.sum("c").over(w).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("ss"),
    )
    n, s, ss = F.col("n_win"), F.col("s"), F.col("ss")
    var_num = n * ss - s * s
    z = F.round(
        (F.col("c") - s.cast("double") / n)
        / F.sqrt(var_num.cast("double") / (n * (n - 1)))
        * F.lit(1e6),
        0,
    ).cast("long")
    z_col = F.when((n >= _ANOM_MIN_N) & (var_num > 0), z)
    return stats.select(
        "event_id",
        "user_id",
        "n_win",
        z_col.alias("z_fp"),
        F.coalesce(F.abs(z_col) > 3_000_000, F.lit(False)).alias("is_anomaly"),
    )


@query(
    "winsorize",
    """WITH f AS (
         SELECT doc_id, lang, length(trim(text))::BIGINT AS ql FROM documents),
       ranked AS (
         SELECT doc_id, lang, ql,
                row_number() OVER (PARTITION BY lang ORDER BY ql, doc_id) AS rn,
                count(*) OVER (PARTITION BY lang) AS n
         FROM f),
       cut AS (
         SELECT *,
                max(CASE WHEN rn = (5 * n + 99) // 100 THEN ql END)
                  OVER (PARTITION BY lang) AS lo,
                max(CASE WHEN rn = (95 * n + 99) // 100 THEN ql END)
                  OVER (PARTITION BY lang) AS hi
         FROM ranked)
       SELECT doc_id, lang, ql, lo::BIGINT AS lo, hi::BIGINT AS hi,
              greatest(least(ql, hi), lo)::BIGINT AS ql_w
       FROM cut""",
)
def q_winsorize(spark, sf_dir):
    """Per-group winsorization at the exact p5/p95 ORDER STATISTICS —
    rank selection (row_number = ceil(p·n)) instead of interpolated
    percentiles, so the cut points are actual data values in pure
    integer arithmetic: no interpolation formula to disagree on across
    engines and no approx-percentile sketch error. Rank pass and
    cut-broadcast pass share one lang shuffle (the second window is an
    unbounded frame over the same partition — no new Exchange); clamp
    is a narrow map. The standard heavy-tail guard before z-scoring a
    feature (pairs with feature_zscore / rolling_anomaly)."""
    d = _docs(spark, sf_dir)
    f = d.select("doc_id", "lang", T.text_length("text").cast("long").alias("ql"))
    wr = Window.partitionBy("lang").orderBy("ql", "doc_id")
    wall = Window.partitionBy("lang")
    ranked = f.select(
        "*",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    lo_rank = F.floor((5 * F.col("n") + 99) / 100)
    hi_rank = F.floor((95 * F.col("n") + 99) / 100)
    cut = ranked.select(
        "*",
        F.max(F.when(F.col("rn") == lo_rank, F.col("ql"))).over(wall).alias("lo"),
        F.max(F.when(F.col("rn") == hi_rank, F.col("ql"))).over(wall).alias("hi"),
    )
    return cut.select(
        "doc_id", "lang", "ql",
        F.col("lo").cast("long").alias("lo"),
        F.col("hi").cast("long").alias("hi"),
        F.greatest(F.least(F.col("ql"), F.col("hi")), F.col("lo"))
        .cast("long").alias("ql_w"),
    )


_BOOT_B = 64


@query(
    "bootstrap_ci",
    f"""WITH reps AS (
         SELECT b.b, d.doc_id, length(trim(d.text))::BIGINT AS ql
         FROM documents d
         CROSS JOIN (SELECT unnest(range({_BOOT_B}))::BIGINT AS b) b
         WHERE {md5_int_sql("concat(CAST(b.b AS VARCHAR), ':', CAST(d.doc_id AS VARCHAR))")} % 2 = 0),
       means AS (
         SELECT b, count(*)::BIGINT AS n_docs,
                CAST(round(sum(ql)::DOUBLE * 1000000.0 / count(*)) AS BIGINT)
                  AS mean_fp
         FROM reps GROUP BY b),
       ranked AS (
         SELECT *, row_number() OVER (ORDER BY mean_fp, b) AS rn FROM means)
       SELECT b, n_docs, mean_fp,
              max(CASE WHEN rn = {max(1, (25 * _BOOT_B + 999) // 1000)} THEN mean_fp END)
                OVER ()::BIGINT AS ci_lo_fp,
              max(CASE WHEN rn = {(975 * _BOOT_B + 999) // 1000} THEN mean_fp END)
                OVER ()::BIGINT AS ci_hi_fp
       FROM ranked""",
)
def q_bootstrap_ci(spark, sf_dir):
    """Deterministic subsample-bootstrap confidence interval for a
    corpus metric (mean doc length): replicate b keeps a doc iff
    md5(b:doc_id) is even — reproducible across retries/executors, no
    rand() — so each of the {_BOOT_B} half-samples is a fixed function
    of the data. Replicate means are exact int64 micro-units rounded
    once; the 2.5/97.5 CI endpoints are ORDER STATISTICS over the
    {_BOOT_B}-row replicate table (tiny, single partition by
    construction). Scale shape: one corpus scan fanned out ×B with
    map-side partial aggs — only B rows ever shuffle, the textbook
    distributed-bootstrap plan."""
    d = _docs(spark, sf_dir)
    reps = (
        d.select("doc_id", T.text_length("text").cast("long").alias("ql"))
        .crossJoin(
            F.broadcast(spark.range(_BOOT_B).select(F.col("id").alias("b")))
        )
        .where(
            md5_int(
                F.concat(
                    F.col("b").cast("string"), F.lit(":"),
                    F.col("doc_id").cast("string"),
                )
            ) % 2
            == 0
        )
    )
    means = reps.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.sum("ql").cast("double") * F.lit(1e6) / F.count(F.lit(1)), 0)
        .cast("long").alias("mean_fp"),
    )
    wr = Window.orderBy("mean_fp", "b")
    wall = Window.partitionBy()
    lo_rank = max(1, (25 * _BOOT_B + 999) // 1000)
    hi_rank = (975 * _BOOT_B + 999) // 1000
    ranked = means.select("*", F.row_number().over(wr).alias("rn"))
    return ranked.select(
        "b", "n_docs", "mean_fp",
        F.max(F.when(F.col("rn") == lo_rank, F.col("mean_fp"))).over(wall)
        .cast("long").alias("ci_lo_fp"),
        F.max(F.when(F.col("rn") == hi_rank, F.col("mean_fp"))).over(wall)
        .cast("long").alias("ci_hi_fp"),
    )


@query(
    "dq_checks",
    """SELECT 'pk_unique_orders' AS check_name,
              (count(*) - count(DISTINCT o_orderkey))::BIGINT AS n_violations
       FROM orders
       UNION ALL
       SELECT 'fk_orders_customer',
              count(*)::BIGINT
       FROM orders o WHERE o.o_custkey IS NOT NULL
         AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
       UNION ALL
       SELECT 'fk_lineitem_orders',
              count(*)::BIGINT
       FROM lineitem l
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
       UNION ALL
       SELECT 'discount_in_unit_range',
              sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
                ::BIGINT
       FROM lineitem
       UNION ALL
       SELECT 'quantity_positive',
              sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)::BIGINT
       FROM lineitem
       UNION ALL
       SELECT 'custkey_not_null',
              sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
       FROM orders""",
)
def q_dq_checks(spark, sf_dir):
    """Deequ-style declarative data-quality audit — one row per
    constraint with its violation count: primary-key uniqueness,
    two referential-integrity checks as LEFT ANTI joins (customer
    broadcasts — it's the dimension; lineitem→orders shuffles on the
    key like any fact-fact join), and three scalar range/null checks
    that are pure map-side conditional sums. Each check is a 1-row
    aggregate, so the union ships six rows total no matter the corpus
    size — the audit you run before promoting a snapshot (pairs with
    sources/snapshots lineage)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")

    def one(name, df_cnt):
        return df_cnt.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("long").alias("n_violations"),
        )

    pk = orders.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("n")
    )
    fk1 = (
        orders.where(F.col("o_custkey").isNotNull())
        .join(
            F.broadcast(customer.select(F.col("c_custkey").alias("o_custkey"))),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    fk2 = (
        lineitem.select(F.col("l_orderkey").alias("k"))
        .join(orders.select(F.col("o_orderkey").alias("k")), "k", "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rng = lineitem.agg(
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
            .otherwise(0)
        ).alias("n")
    )
    pos = lineitem.agg(
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)).alias("n")
    )
    nn = orders.agg(
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("n")
    )
    return (
        one("pk_unique_orders", pk)
        .unionAll(one("fk_orders_customer", fk1))
        .unionAll(one("fk_lineitem_orders", fk2))
        .unionAll(one("discount_in_unit_range", rng))
        .unionAll(one("quantity_positive", pos))
        .unionAll(one("custkey_not_null", nn))
    )


@query(
    "table_profile",
    """WITH s AS (
         SELECT count(*) AS n,
                count(*) - count(event_id) AS null_event_id,
                count(DISTINCT event_id) AS d_event_id,
                min(event_id) AS min_event_id, max(event_id) AS max_event_id,
                count(*) - count(user_id) AS null_user_id,
                count(DISTINCT user_id) AS d_user_id,
                min(user_id) AS min_user_id, max(user_id) AS max_user_id,
                count(*) - count(ts) AS null_ts,
                count(DISTINCT ts) AS d_ts,
                min(epoch_us(ts)) AS min_ts, max(epoch_us(ts)) AS max_ts,
                count(*) - count(value) AS null_value,
                count(DISTINCT value) AS d_value,
                min(CAST(round(value * 1000000.0) AS BIGINT)) AS min_value,
                max(CAST(round(value * 1000000.0) AS BIGINT)) AS max_value,
                count(*) - count(event_type) AS null_event_type,
                count(DISTINCT event_type) AS d_event_type
         FROM events)
       SELECT 'event_id' AS col_name, n::BIGINT AS n_rows,
              null_event_id::BIGINT AS n_null, d_event_id::BIGINT AS n_distinct,
              min_event_id::BIGINT AS min_fp, max_event_id::BIGINT AS max_fp
       FROM s
       UNION ALL
       SELECT 'user_id', n, null_user_id, d_user_id, min_user_id, max_user_id FROM s
       UNION ALL
       SELECT 'ts', n, null_ts, d_ts, min_ts, max_ts FROM s
       UNION ALL
       SELECT 'value_fp', n, null_value, d_value, min_value, max_value FROM s
       UNION ALL
       SELECT 'event_type', n, null_event_type, d_event_type, NULL, NULL FROM s""",
)
def q_table_profile(spark, sf_dir):
    """Single-pass column profiler (the deequ/dbt-docs summary stats
    table): null counts, distinct cardinalities, and numeric/timestamp
    min-max for five columns computed in ONE aggregate over ONE scan —
    then unpivoted to a row-per-column report with a narrow stack().
    Non-numeric columns report NULL extrema rather than lexicographic
    fakes. countDistinct on several columns in one agg expands via
    Spark's expand operator — still a single source scan, which is the
    whole game when the source is 100 TB."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    v_fp = F.round(F.col("value") * F.lit(1e6), 0).cast("long")
    n = F.count(F.lit(1))
    s = ev.agg(
        n.alias("n"),
        (n - F.count("event_id")).alias("null_event_id"),
        F.countDistinct("event_id").alias("d_event_id"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
        (n - F.count("user_id")).alias("null_user_id"),
        F.countDistinct("user_id").alias("d_user_id"),
        F.min("user_id").alias("min_user_id"),
        F.max("user_id").alias("max_user_id"),
        (n - F.count("ts")).alias("null_ts"),
        F.countDistinct("ts").alias("d_ts"),
        F.min(epoch_micros(ev, "ts")).alias("min_ts"),
        F.max(epoch_micros(ev, "ts")).alias("max_ts"),
        (n - F.count("value")).alias("null_value"),
        F.countDistinct("value").alias("d_value"),
        F.min(v_fp).alias("min_value"),
        F.max(v_fp).alias("max_value"),
        (n - F.count("event_type")).alias("null_event_type"),
        F.countDistinct("event_type").alias("d_event_type"),
    )
    stacked = s.select(
        F.expr(
            """stack(5,
                 'event_id',  null_event_id,  d_event_id,  min_event_id, max_event_id,
                 'user_id',   null_user_id,   d_user_id,   min_user_id,  max_user_id,
                 'ts',        null_ts,        d_ts,        min_ts,       max_ts,
                 'value_fp',  null_value,     d_value,     min_value,    max_value,
                 'event_type',null_event_type,d_event_type,
                              CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
               ) AS (col_name, n_null, n_distinct, min_fp, max_fp)"""
        ),
        F.col("n"),
    )
    return stacked.select(
        "col_name",
        F.col("n").cast("long").alias("n_rows"),
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("min_fp").cast("long").alias("min_fp"),
        F.col("max_fp").cast("long").alias("max_fp"),
    )


@query(
    "seasonal_profile",
    """WITH base AS (
         SELECT event_id, hour(ts) AS hod,
                CAST(round(value * 1000000.0) AS BIGINT) AS v_fp
         FROM events),
       prof AS (
         SELECT hod, count(*)::BIGINT AS n,
                CAST(round(sum(v_fp)::DOUBLE / count(*)) AS BIGINT) AS hour_mean_fp
         FROM base GROUP BY hod)
       SELECT b.event_id, b.hod::BIGINT AS hod, b.v_fp,
              p.hour_mean_fp, (b.v_fp - p.hour_mean_fp)::BIGINT AS resid_fp
       FROM base b JOIN prof p USING (hod)""",
)
def q_seasonal_profile(spark, sf_dir):
    """Seasonal (hour-of-day) profile + residual features — the
    de-seasonalization step before anomaly scoring or forecasting:
    a 24-row mean profile from one map-side partial agg, broadcast back
    onto the events so the residual is a pure per-row map (no second
    shuffle of the fact table, ever). Means are int64 micro-units
    rounded once; residuals are exact integer differences. hour() is
    UTC-deterministic on both engines."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_id",
        F.hour("ts").alias("hod"),
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("v_fp"),
    )
    prof = base.groupBy("hod").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("v_fp").cast("double") / F.count(F.lit(1)), 0)
        .cast("long").alias("hour_mean_fp"),
    )
    return (
        base.join(F.broadcast(prof.select("hod", "hour_mean_fp")), "hod")
        .select(
            "event_id",
            F.col("hod").cast("long").alias("hod"),
            "v_fp",
            "hour_mean_fp",
            (F.col("v_fp") - F.col("hour_mean_fp")).cast("long").alias("resid_fp"),
        )
    )


@query(
    "transition_matrix",
    """WITH pairs AS (
         SELECT lag(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev_type,
                event_type AS next_type
         FROM events),
       cnt AS (
         SELECT prev_type, next_type, count(*)::BIGINT AS n
         FROM pairs WHERE prev_type IS NOT NULL GROUP BY 1, 2)
       SELECT prev_type, next_type, n,
              CAST(round(n::DOUBLE * 1000000.0 / sum(n) OVER
                         (PARTITION BY prev_type)) AS BIGINT) AS p_fp
       FROM cnt""",
)
def q_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over per-entity event
    sequences (the behavioral-prior table for session models and
    next-event prediction): lag pairs from one entity-sorted window
    pass, bigram counts with map-side partial agg, then row-normalized
    probabilities where the denominator is a window sum over the
    TYPE×TYPE matrix (≤25 rows here — never the fact table). Integer
    micro-probabilities rounded once."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    cnt = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wrow = Window.partitionBy("prev_type")
    return cnt.select(
        "prev_type", "next_type", "n",
        F.round(F.col("n").cast("double") * F.lit(1e6) / F.sum("n").over(wrow), 0)
        .cast("long").alias("p_fp"),
    )


_AC_MIN_N = 10


@query(
    "autocorr_lag1",
    f"""WITH base AS (
         SELECT user_id, CAST(round(value * 100.0) AS BIGINT) AS y,
                lag(CAST(round(value * 100.0) AS BIGINT)) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id) AS x
         FROM events),
       s AS (
         SELECT user_id, count(*)::BIGINT AS n,
                sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                sum(x * x) AS sxx, sum(y * y) AS syy
         FROM base WHERE x IS NOT NULL GROUP BY user_id)
       SELECT user_id, n,
              CASE WHEN n >= {_AC_MIN_N}
                        AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                   THEN CAST(round(
                     (n * sxy - sx * sy)::DOUBLE
                     / (sqrt((n * sxx - sx * sx)::DOUBLE)
                        * sqrt((n * syy - sy * sy)::DOUBLE))
                     * 1000000.0) AS BIGINT)
              END AS r1_fp
       FROM s""",
)
def q_autocorr_lag1(spark, sf_dir):
    """Lag-1 autocorrelation per entity — the persistence/burstiness
    feature for crawl-value series: lag pairs from one sorted window
    pass, then Pearson r from EXACT int64 sufficient statistics
    (centi-scaled values bound every sum; the two variance terms stay
    under separate sqrt() calls so nothing exceeds int64 — the
    expression is mirrored verbatim in the oracle, and IEEE
    divide/sqrt make it bit-stable). NULL below {_AC_MIN_N} pairs or on
    constant series. Window and groupBy share the entity shuffle."""
    ev = _events(spark, sf_dir)
    c = F.round(F.col("value") * F.lit(100.0), 0).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = ev.select(
        "user_id", c.alias("y"), F.lag(c).over(w).alias("x")
    ).where(F.col("x").isNotNull())
    s = base.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    vx = n * F.col("sxx") - sx * sx
    vy = n * F.col("syy") - sy * sy
    r = F.round(
        (n * F.col("sxy") - sx * sy).cast("double")
        / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
        * F.lit(1e6),
        0,
    ).cast("long")
    return s.select(
        "user_id", "n",
        F.when((n >= _AC_MIN_N) & (vx > 0) & (vy > 0), r).alias("r1_fp"),
    )


@query(
    "cusum_drawdown",
    """WITH base AS (
         SELECT event_id, user_id, ts,
                CAST(round(value * 1000000.0) AS BIGINT) AS v_fp
         FROM events),
       m AS (
         SELECT *, CAST(round(avg(v_fp) OVER (PARTITION BY user_id)) AS BIGINT)
                     AS mean_fp
         FROM base),
       c AS (
         SELECT event_id, user_id, ts,
                sum(v_fp - mean_fp) OVER (PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS cusum_fp
         FROM m)
       SELECT event_id, user_id, cusum_fp::BIGINT AS cusum_fp,
              (max(cusum_fp) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) - cusum_fp)::BIGINT AS drawdown_fp
       FROM c""",
)
def q_cusum_drawdown(spark, sf_dir):
    """CUSUM chart + running drawdown per entity — the classic
    change-point / regression-detection pair: cumulative sum of exact
    integer deviations from the entity mean (mean itself rounded ONCE
    to µ-units, so every later op is int64), and drawdown = running
    peak minus current CUSUM. Three window layers (unordered mean,
    ordered cumsum, ordered running max) all key on user_id — ONE
    Exchange; a sustained level shift shows up as a monotone CUSUM
    ramp, a regression as a growing drawdown."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_id", "user_id", "ts",
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("v_fp"),
    )
    wall = Window.partitionBy("user_id")
    m = base.withColumn(
        "mean_fp", F.round(F.avg("v_fp").over(wall), 0).cast("long")
    )
    wo = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = m.select(
        "event_id", "user_id", "ts",
        F.sum(F.col("v_fp") - F.col("mean_fp")).over(wo).alias("cusum_fp"),
    )
    return c.select(
        "event_id", "user_id",
        F.col("cusum_fp").cast("long").alias("cusum_fp"),
        (F.max("cusum_fp").over(wo) - F.col("cusum_fp"))
        .cast("long").alias("drawdown_fp"),
    )


@query(
    "gini_tokens",
    f"""WITH freq AS (
         SELECT token, count(*)::BIGINT AS f
         FROM (SELECT unnest({_tok_sql()}) AS token FROM documents)
         GROUP BY token),
       ranked AS (
         SELECT f, row_number() OVER (ORDER BY f, token) AS rn,
                count(*) OVER () AS n, sum(f) OVER () AS tot
         FROM freq)
       SELECT n::BIGINT AS n_tokens, tot::BIGINT AS total_count,
              CAST(round(sum((2 * rn - n - 1) * f)::DOUBLE
                         / (n * tot) * 1000000.0) AS BIGINT) AS gini_fp
       FROM ranked GROUP BY n, tot""",
)
def q_gini_tokens(spark, sf_dir):
    """Gini coefficient of the token-frequency distribution — the
    one-number concentration summary behind Zipf plots (how much of
    the corpus a handful of tokens own): exact integer rank-weighted
    sum Σ(2i−n−1)fᵢ over the VOCABULARY (corpus-sized data never sorts
    globally — only the post-agg vocab does, the same concession zipf
    top-k makes), divided once and rounded once. Deterministic rank
    ties broken by token."""
    d = _docs(spark, sf_dir)
    freq = (
        d.select(F.explode(T.tokenize(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    wr = Window.orderBy("f", "token")
    wall = Window.partitionBy()
    ranked = freq.select(
        "f",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("f").over(wall).alias("tot"),
    )
    return ranked.groupBy("n", "tot").agg(
        F.round(
            F.sum((2 * F.col("rn") - F.col("n") - 1) * F.col("f")).cast("double")
            / (F.col("n") * F.col("tot"))
            * F.lit(1e6),
            0,
        ).cast("long").alias("gini_fp"),
    ).select(
        F.col("n").cast("long").alias("n_tokens"),
        F.col("tot").cast("long").alias("total_count"),
        "gini_fp",
    )


@query(
    "ab_test_stats",
    f"""WITH per_user AS (
         SELECT user_id, {md5_int_sql("concat('ab:', CAST(user_id AS VARCHAR))")} % 2
                  AS variant,
                sum(CAST(round(value * 100.0) AS BIGINT)) AS x
         FROM events GROUP BY user_id),
       s AS (
         SELECT variant, count(*)::BIGINT AS n, sum(x) AS sx, sum(x * x) AS sxx
         FROM per_user GROUP BY variant),
       wide AS (
         SELECT
           max(CASE WHEN variant = 0 THEN n END) AS n_a,
           max(CASE WHEN variant = 0 THEN sx END) AS sx_a,
           max(CASE WHEN variant = 0 THEN sxx END) AS sxx_a,
           max(CASE WHEN variant = 1 THEN n END) AS n_b,
           max(CASE WHEN variant = 1 THEN sx END) AS sx_b,
           max(CASE WHEN variant = 1 THEN sxx END) AS sxx_b
         FROM s)
       SELECT n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
              CAST(round(sx_a::DOUBLE / n_a * 10000.0) AS BIGINT) AS mean_a_fp,
              CAST(round(sx_b::DOUBLE / n_b * 10000.0) AS BIGINT) AS mean_b_fp,
              CAST(round((sx_a::DOUBLE / n_a - sx_b::DOUBLE / n_b) * 10000.0)
                   AS BIGINT) AS diff_fp,
              CAST(round(
                (sx_a::DOUBLE / n_a - sx_b::DOUBLE / n_b)
                / sqrt(((n_a * sxx_a - sx_a * sx_a)::DOUBLE / (n_a * (n_a - 1)))
                         / n_a
                       + ((n_b * sxx_b - sx_b * sx_b)::DOUBLE / (n_b * (n_b - 1)))
                         / n_b)
                * 1000000.0) AS BIGINT) AS welch_t_fp
       FROM wide""",
)
def q_ab_test_stats(spark, sf_dir):
    """A/B experiment readout with deterministic assignment and exact
    sufficient statistics: variant = md5(user) % 2 — assignment at the
    ENTITY grain (assigning at event grain would correlate a user's own
    events across arms, the classic interference bug) and reproducible
    across retries, no rand(). Per-user centi-scaled totals roll into
    int64 (n, Σx, Σx²) per arm, and the Welch t statistic is one
    mirrored IEEE expression rounded once. Two partial-agg passes on
    shrinking data; the final 2-row pivot is driver-trivial."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * F.lit(100.0), 0).cast("long")).alias("x")
    ).select(
        (md5_int(F.concat(F.lit("ab:"), F.col("user_id").cast("string"))) % 2)
        .alias("variant"),
        "x",
    )
    s = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    wide = s.agg(
        *[
            F.max(F.when(F.col("variant") == v, F.col(c))).alias(f"{c}_{a}")
            for v, a in ((0, "a"), (1, "b"))
            for c in ("n", "sx", "sxx")
        ]
    )
    mean = lambda a: F.col(f"sx_{a}").cast("double") / F.col(f"n_{a}")
    var = lambda a: (
        F.col(f"n_{a}") * F.col(f"sxx_{a}") - F.col(f"sx_{a}") * F.col(f"sx_{a}")
    ).cast("double") / (F.col(f"n_{a}") * (F.col(f"n_{a}") - 1))
    t = (mean("a") - mean("b")) / F.sqrt(
        var("a") / F.col("n_a") + var("b") / F.col("n_b")
    )
    return wide.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(mean("a") * 1e4, 0).cast("long").alias("mean_a_fp"),
        F.round(mean("b") * 1e4, 0).cast("long").alias("mean_b_fp"),
        F.round((mean("a") - mean("b")) * 1e4, 0).cast("long").alias("diff_fp"),
        F.round(t * 1e6, 0).cast("long").alias("welch_t_fp"),
    )


@query(
    "roc_auc",
    """WITH base AS (
         SELECT CAST(round(value * 1000000.0) AS BIGINT) AS score,
                CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS label
         FROM events),
       ranked AS (
         SELECT label,
                2 * rank() OVER (ORDER BY score)
                  + count(*) OVER (PARTITION BY score) - 1 AS avg_rank2
         FROM base)
       SELECT sum(label)::BIGINT AS n_pos,
              (count(*) - sum(label))::BIGINT AS n_neg,
              CAST(round(
                (sum(CASE WHEN label = 1 THEN avg_rank2 END)
                   - sum(label) * (sum(label) + 1))::DOUBLE
                / (2.0 * sum(label) * (count(*) - sum(label)))
                * 1000000.0) AS BIGINT) AS auc_fp
       FROM ranked""",
)
def q_roc_auc(spark, sf_dir):
    """EXACT ROC AUC via the Mann-Whitney rank identity — no threshold
    sweep, no trapezoids, and ties handled exactly: 2×(average tie
    rank) = 2·min_rank + tie_count − 1 stays integer, so the positive
    rank-sum is int64 and AUC is one rational rounded once. The global
    sort is over the EVAL set (the one table a global window is honest
    for — docstring contract: this is an evaluation operator, not a
    corpus pass; at corpus scale use sampled eval slices). Score:
    does `value` predict an error event."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("score"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("label"),
    )
    wr = Window.orderBy("score")
    wt = Window.partitionBy("score")
    ranked = base.select(
        "label",
        (2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1).alias("avg_rank2"),
    )
    n_pos = F.sum("label")
    n_all = F.count(F.lit(1))
    pos_rank2 = F.sum(F.when(F.col("label") == 1, F.col("avg_rank2")))
    return ranked.agg(
        n_pos.cast("long").alias("n_pos"),
        (n_all - n_pos).cast("long").alias("n_neg"),
        F.round(
            (pos_rank2 - n_pos * (n_pos + 1)).cast("double")
            / (F.lit(2.0) * n_pos * (n_all - n_pos))
            * F.lit(1e6),
            0,
        ).cast("long").alias("auc_fp"),
    )


@query(
    "ks_drift",
    """WITH tagged AS (
         SELECT CAST(round(value * 1000000.0) AS BIGINT) AS v_fp,
                user_id % 2 AS grp
         FROM events),
       per_v AS (
         SELECT v_fp,
                sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS a_cnt,
                sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS b_cnt
         FROM tagged GROUP BY v_fp),
       cum AS (
         SELECT sum(a_cnt) OVER (ORDER BY v_fp
                  ROWS UNBOUNDED PRECEDING) AS ca,
                sum(b_cnt) OVER (ORDER BY v_fp
                  ROWS UNBOUNDED PRECEDING) AS cb,
                sum(a_cnt) OVER () AS na, sum(b_cnt) OVER () AS nb
         FROM per_v)
       SELECT max(na)::BIGINT AS n_a, max(nb)::BIGINT AS n_b,
              max(abs(nb * ca - na * cb))::BIGINT AS d_num,
              CAST(round(max(abs(nb * ca - na * cb))::DOUBLE
                         / (max(na) * max(nb)) * 1000000.0) AS BIGINT) AS ks_fp
       FROM cum""",
)
def q_ks_drift(spark, sf_dir):
    """EXACT two-sample Kolmogorov-Smirnov drift statistic: per-value
    counts for both samples (one partial agg collapses the corpus to
    distinct values), cumulative counts give both ECDFs at every jump
    point, and the sup-distance is max |n_b·F_a − n_a·F_b| in pure
    int64 — the D statistic is a rational, rounded once. Only the
    post-agg DISTINCT-VALUE table sorts globally (the zipf/gini
    concession); the corpus itself never does. The distribution-drift
    alarm that complements feature_psi's binned version with an exact,
    bin-free answer."""
    ev = _events(spark, sf_dir)
    tagged = ev.select(
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("v_fp"),
        (F.col("user_id") % 2).alias("grp"),
    )
    per_v = tagged.groupBy("v_fp").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("a_cnt"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("b_cnt"),
    )
    wc = Window.orderBy("v_fp").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = per_v.select(
        F.sum("a_cnt").over(wc).alias("ca"),
        F.sum("b_cnt").over(wc).alias("cb"),
        F.sum("a_cnt").over(wall).alias("na"),
        F.sum("b_cnt").over(wall).alias("nb"),
    )
    d_num = F.max(F.abs(F.col("nb") * F.col("ca") - F.col("na") * F.col("cb")))
    return cum.agg(
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        d_num.cast("long").alias("d_num"),
        F.round(
            d_num.cast("double") / (F.max("na") * F.max("nb")) * F.lit(1e6), 0
        ).cast("long").alias("ks_fp"),
    )


@query(
    "calibration_bins",
    """WITH base AS (
         SELECT event_type,
                CAST(round(value * 1000000.0) AS BIGINT) AS score_fp,
                CASE WHEN json_extract_string(props, '$.k')::BIGINT > 50
                     THEN 1 ELSE 0 END AS label,
                event_id
         FROM events),
       binned AS (
         SELECT *, ntile(10) OVER (PARTITION BY event_type
                                   ORDER BY score_fp, event_id) AS decile
         FROM base)
       SELECT event_type, decile::BIGINT AS decile, count(*)::BIGINT AS n,
              CAST(round(avg(score_fp)) AS BIGINT) AS mean_score_fp,
              CAST(round(sum(label)::DOUBLE * 1000000.0 / count(*)) AS BIGINT)
                AS pos_rate_fp
       FROM binned GROUP BY 1, 2""",
)
def q_calibration_bins(spark, sf_dir):
    """Reliability / calibration table per segment: keyed decile
    binning of the score (ntile over the event_type partition — sorts
    stay partition-sized, the quantile_bins discipline) then observed
    positive rate and mean score per bin, both integer-rounded once.
    Where the curve bends away from the diagonal is where a model's
    scores need recalibrating — the standard post-training audit,
    here with the label pulled from the JSON payload (JVM-side
    get_json_object, no Python)."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_type",
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("score_fp"),
        F.when(
            F.get_json_object(F.col("props"), "$.k").cast("long") > 50, 1
        ).otherwise(0).alias("label"),
        "event_id",
    )
    wb = Window.partitionBy("event_type").orderBy("score_fp", "event_id")
    binned = base.select("*", F.ntile(10).over(wb).alias("decile"))
    return binned.groupBy(
        "event_type", F.col("decile").cast("long").alias("decile")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("score_fp"), 0).cast("long").alias("mean_score_fp"),
        F.round(
            F.sum("label").cast("double") * F.lit(1e6) / F.count(F.lit(1)), 0
        ).cast("long").alias("pos_rate_fp"),
    )


_HEAPS_STEP = 50


@query(
    "heaps_law",
    f"""WITH tok AS (
         SELECT doc_id, unnest({_tok_sql()}) AS token FROM documents),
       first_seen AS (
         SELECT token, min(doc_id) AS fs FROM tok GROUP BY token),
       doc_tokens AS (
         SELECT doc_id, count(*)::BIGINT AS n_tok FROM tok GROUP BY doc_id),
       new_at AS (
         SELECT fs AS doc_id, count(*)::BIGINT AS n_new
         FROM first_seen GROUP BY fs),
       curve AS (
         SELECT d.doc_id,
                sum(d.n_tok) OVER w AS cum_tokens,
                sum(coalesce(n.n_new, 0)) OVER w AS vocab_size
         FROM doc_tokens d LEFT JOIN new_at n USING (doc_id)
         WINDOW w AS (ORDER BY d.doc_id ROWS UNBOUNDED PRECEDING))
       SELECT doc_id, cum_tokens::BIGINT AS cum_tokens,
              vocab_size::BIGINT AS vocab_size
       FROM curve WHERE (doc_id + 1) % {_HEAPS_STEP} = 0""",
)
def q_heaps_law(spark, sf_dir):
    """Heaps-law vocabulary-growth curve WITHOUT sequential scanning:
    running-distinct is inherently serial, but 'vocabulary size after
    doc d' equals the count of tokens whose FIRST occurrence is ≤ d —
    so one token census (min doc_id per token, map-side partial agg)
    plus a cumulative sum over the doc-grain table gives the whole
    curve. Only doc-grain/vocab-grain rows ever sort; checkpointed
    every {_HEAPS_STEP} docs. The curve's flattening is the
    diminishing-returns signal for corpus growth decisions."""
    d = _docs(spark, sf_dir)
    tok = d.select("doc_id", F.explode(T.tokenize(F.col("text"))).alias("token"))
    first_seen = tok.groupBy("token").agg(F.min("doc_id").alias("fs"))
    doc_tokens = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok")
    )
    new_at = first_seen.groupBy(F.col("fs").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    curve = doc_tokens.join(new_at, "doc_id", "left").select(
        "doc_id",
        F.sum("n_tok").over(w).alias("cum_tokens"),
        F.sum(F.coalesce(F.col("n_new"), F.lit(0))).over(w).alias("vocab_size"),
    )
    return curve.where((F.col("doc_id") + 1) % _HEAPS_STEP == 0).select(
        "doc_id",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
        F.col("vocab_size").cast("long").alias("vocab_size"),
    )


_TREND_MIN_N = 10


@query(
    "trend_slope",
    f"""WITH base AS (
         SELECT user_id,
                (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id))
                  // 1000000 AS t,
                CAST(round(value * 100.0) AS BIGINT) AS y
         FROM events),
       s AS (
         SELECT user_id, count(*)::BIGINT AS n, sum(t) AS st, sum(y) AS sy,
                sum(t * y) AS sty, sum(t * t) AS stt
         FROM base GROUP BY user_id)
       SELECT user_id, n,
              CASE WHEN n >= {_TREND_MIN_N} AND n * stt - st * st > 0
                   THEN CAST(round((n * sty - st * sy)::DOUBLE
                                   / (n * stt - st * st)::DOUBLE
                                   * 1000000000.0) AS BIGINT)
              END AS slope_fp
       FROM s""",
)
def q_trend_slope(spark, sf_dir):
    """Per-entity linear trend via closed-form OLS on EXACT integer
    sufficient statistics: time re-based to seconds since the entity's
    own first event (bounds Σt·y and Σt² in int64 — absolute epochs
    would overflow), centi-scaled values, slope = the one float
    division rounded once (nano-units/sec). The drift/ramp feature for
    revisit scheduling and degradation detection; window (entity min)
    and groupBy share one shuffle. NULL below {_TREND_MIN_N} points or
    on a single-instant entity."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    wall = Window.partitionBy("user_id")
    u = epoch_micros(ev, "ts")
    base = ev.select(
        "user_id",
        F.floor((u - F.min(u).over(wall)) / F.lit(1_000_000)).alias("t"),
        F.round(F.col("value") * F.lit(100.0), 0).cast("long").alias("y"),
    )
    s = base.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("t").alias("st"),
        F.sum("y").alias("sy"),
        F.sum(F.col("t") * F.col("y")).alias("sty"),
        F.sum(F.col("t") * F.col("t")).alias("stt"),
    )
    n, st, sy = F.col("n"), F.col("st"), F.col("sy")
    den = n * F.col("stt") - st * st
    slope = F.round(
        (n * F.col("sty") - st * sy).cast("double") / den.cast("double")
        * F.lit(1e9),
        0,
    ).cast("long")
    return s.select(
        "user_id", "n",
        F.when((n >= _TREND_MIN_N) & (den > 0), slope).alias("slope_fp"),
    )


@query(
    "activity_halflife",
    """WITH base AS (
         SELECT user_id, epoch_us(ts) AS u,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS rn,
                count(*) OVER (PARTITION BY user_id) AS n
         FROM events)
       SELECT user_id, max(n)::BIGINT AS n_events,
              min(u)::BIGINT AS first_u, max(u)::BIGINT AS last_u,
              min(CASE WHEN 2 * rn >= n THEN u END)::BIGINT AS half_u,
              CAST(round((min(CASE WHEN 2 * rn >= n THEN u END) - min(u))
                         * 1000000.0
                         / nullif(max(u) - min(u), 0)) AS BIGINT)
                AS half_frac_fp
       FROM base GROUP BY user_id""",
)
def q_activity_halflife(spark, sf_dir):
    """Activity half-life per entity — when did the FIRST half of an
    entity's lifetime events happen: the timestamp where the running
    event count crosses 50% of the total, plus its position as a
    fraction of the entity's observed lifespan (front-loaded ≈ 0,
    uniform ≈ 0.5, late-bursting ≈ 1). Rank and partition count come
    from one window pass; the crossing point is a conditional min —
    exact integer µs throughout, one rational rounded once. An offline
    lifecycle descriptor (uses the full history by design — not a
    point-in-time feature)."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    wr = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wall = Window.partitionBy("user_id")
    base = ev.select(
        "user_id",
        epoch_micros(ev, "ts").alias("u"),
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    half_u = F.min(F.when(2 * F.col("rn") >= F.col("n"), F.col("u")))
    span = F.max("u") - F.min("u")
    return base.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_events"),
        F.min("u").cast("long").alias("first_u"),
        F.max("u").cast("long").alias("last_u"),
        half_u.cast("long").alias("half_u"),
        F.round(
            (half_u - F.min("u")) * F.lit(1e6)
            / F.nullif(span, F.lit(0)).cast("double"),
            0,
        ).cast("long").alias("half_frac_fp"),
    )


_N_PREFIX_RULES = 12


@query(
    "robots_prefix_match",
    f"""WITH u AS (
         SELECT doc_id, {_URL_SYNTH_SQL} AS url FROM documents),
       parsed AS (
         SELECT doc_id, url, {_URL_PATH_SQL} AS path FROM u),
       rules AS (
         SELECT r, CASE WHEN r < 5 THEN '/sec' || CAST(r % 5 AS VARCHAR)
                        ELSE '/sec' || CAST(r % 5 AS VARCHAR)
                             || '/page' || CAST(r % 11 AS VARCHAR) END AS rule_path,
                CASE WHEN r % 2 = 0 THEN 'deny' ELSE 'allow' END AS decision
         FROM (SELECT unnest(range({_N_PREFIX_RULES}))::BIGINT AS r)),
       cand AS (
         SELECT p.doc_id, p.url, pfx.pfx
         FROM parsed p
         CROSS JOIN LATERAL (
           SELECT unnest([regexp_extract(p.path, '^(/[^/]+)', 1), p.path]) AS pfx
         ) pfx),
       matched AS (
         SELECT c.doc_id, c.url, r.rule_path, r.decision, r.r,
                row_number() OVER (PARTITION BY c.doc_id
                  ORDER BY length(r.rule_path) DESC, r.r) AS rnk
         FROM cand c JOIN rules r ON c.pfx = r.rule_path)
       SELECT p.doc_id, p.url,
              m.rule_path AS matched_rule,
              coalesce(m.decision, 'allow') AS decision
       FROM parsed p LEFT JOIN (SELECT * FROM matched WHERE rnk = 1) m
         USING (doc_id)""",
)
def q_robots_prefix_match(spark, sf_dir):
    """Longest-prefix-match against a path rule table — robots.txt /
    routing semantics at corpus scale: each url explodes into its
    (bounded-depth) path prefixes, joins the BROADCAST rule dimension
    on exact prefix equality (never a LIKE scan per rule — prefix
    explosion turns the scan×rules product into an equi-join), and the
    winner is the longest matching rule with a deterministic rule-id
    tiebreak. Unmatched urls default-allow. The decision column is the
    crawl-compliance gate in front of every ingestion pipeline."""
    d = _docs(spark, sf_dir).select("doc_id")
    did = F.col("doc_id")
    url = F.concat(
        F.when(did % 2 == 1, F.lit("https://")).otherwise(F.lit("http://")),
        F.lit("www.site"), (did % 50).cast("string"),
        F.lit(".example"), (did % 7).cast("string"),
        F.lit(".com/sec"), (did % 5).cast("string"),
        F.lit("/page"), (did % 11).cast("string"),
        F.when(did % 3 == 0, F.lit("?q=spark")).otherwise(F.lit("")),
    )
    parsed = d.select(
        "doc_id", url.alias("url"),
        F.regexp_extract(url, r"^[a-z]+://[^/]+(/[^?]*)", 1).alias("path"),
    )
    parts = F.split(F.col("path"), "/")
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(parts) - 1),
        lambda i: F.array_join(F.slice(parts, 1, i + 1), "/"),
    )
    cand = parsed.select(
        "doc_id", "url", F.explode(prefixes).alias("pfx")
    )
    r = F.col("r")
    rules = spark.range(_N_PREFIX_RULES).select(
        F.col("id").alias("r"),
        F.when(
            r < 5, F.concat(F.lit("/sec"), (r % 5).cast("string"))
        ).otherwise(
            F.concat(
                F.lit("/sec"), (r % 5).cast("string"),
                F.lit("/page"), (r % 11).cast("string"),
            )
        ).alias("rule_path"),
        F.when(r % 2 == 0, "deny").otherwise("allow").alias("decision"),
    )
    matched = cand.join(
        F.broadcast(rules), cand.pfx == rules.rule_path
    )
    wm = Window.partitionBy("doc_id").orderBy(
        F.length("rule_path").desc(), "r"
    )
    best = matched.select(
        "doc_id", "rule_path", "decision", F.row_number().over(wm).alias("rnk")
    ).where(F.col("rnk") == 1)
    return parsed.join(best, "doc_id", "left").select(
        "doc_id", "url",
        F.col("rule_path").alias("matched_rule"),
        F.coalesce(F.col("decision"), F.lit("allow")).alias("decision"),
    )


@query(
    "ecdf_normalize",
    """WITH f AS (
         SELECT doc_id, lang, length(trim(text))::BIGINT AS ql FROM documents)
       SELECT doc_id, lang, ql,
              CAST(round(percent_rank() OVER (PARTITION BY lang ORDER BY ql)
                         * 1000000.0) AS BIGINT) AS pr_fp
       FROM f""",
)
def q_ecdf_normalize(spark, sf_dir):
    """Quantile (ECDF) feature transform — rank-normalize a skewed
    feature into [0,1] per group, the robust alternative to z-scoring
    when the distribution is heavy-tailed: percent_rank = (min-rank−1)
    / (n−1) is an exact rational of integers (tied values share the
    min rank on BOTH engines — no tiebreak column needed, unlike
    ntile), rounded once to micro-units. Keyed window keeps sorts
    partition-sized; pairs with winsorize/feature_zscore as the third
    standard scaler."""
    d = _docs(spark, sf_dir)
    f = d.select("doc_id", "lang", T.text_length("text").cast("long").alias("ql"))
    w = Window.partitionBy("lang").orderBy("ql")
    return f.select(
        "doc_id", "lang", "ql",
        F.round(F.percent_rank().over(w) * F.lit(1e6), 0)
        .cast("long").alias("pr_fp"),
    )


_NEG_K = 4


@query(
    "negative_sample",
    f"""WITH anchors AS (
         SELECT doc_id AS anchor_id FROM documents WHERE doc_id < 50),
       n AS (SELECT count(*) AS n_docs FROM documents),
       cand AS (
         SELECT a.anchor_id, k.k,
                {md5_int_sql("concat('neg:', CAST(k.k AS VARCHAR), ':', CAST(a.anchor_id AS VARCHAR))")}
                  % n.n_docs AS neg_id
         FROM anchors a
         CROSS JOIN (SELECT unnest(range({_NEG_K}))::BIGINT AS k) k
         CROSS JOIN n)
       SELECT c.anchor_id, c.k, c.neg_id::BIGINT AS neg_id,
              length(trim(d.text))::BIGINT AS neg_len
       FROM cand c JOIN documents d ON d.doc_id = c.neg_id
       WHERE c.neg_id <> c.anchor_id""",
)
def q_negative_sample(spark, sf_dir):
    """Deterministic random negative sampling for contrastive training
    pairs: negative k for an anchor is md5('neg:k:anchor') mod corpus
    size — reproducible across retries and executors (a rand()-based
    sampler breaks resume and the oracle), self-pairs dropped
    explicitly. The candidate ids then JOIN the corpus to materialize
    the negatives' features — at scale that's a shuffle join on the id
    (anchors×K is the small side and broadcasts). The standard data
    prep for embedding/contrastive objectives."""
    d = _docs(spark, sf_dir)
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    anchors = d.where(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("anchor_id")
    )
    cand = (
        anchors.crossJoin(
            F.broadcast(spark.range(_NEG_K).select(F.col("id").alias("k")))
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "anchor_id", "k",
            (
                md5_int(
                    F.concat(
                        F.lit("neg:"), F.col("k").cast("string"),
                        F.lit(":"), F.col("anchor_id").cast("string"),
                    )
                ) % F.col("n_docs")
            ).alias("neg_id"),
        )
        .where(F.col("neg_id") != F.col("anchor_id"))
    )
    corpus = d.select(
        F.col("doc_id").alias("neg_id"),
        T.text_length("text").cast("long").alias("neg_len"),
    )
    return cand.join(corpus, "neg_id").select(
        "anchor_id", "k",
        F.col("neg_id").cast("long").alias("neg_id"),
        "neg_len",
    )


@query(
    "rake_keywords",
    f"""WITH tok AS (
         SELECT doc_id, pos, token,
                CASE WHEN lower(token) IN ({_STOPWORD_SQL_LIST})
                     THEN 1 ELSE 0 END AS is_stop
         FROM (SELECT doc_id,
                      unnest(range(len(string_split(trim(text), ' '))))::BIGINT AS pos,
                      unnest(string_split(trim(text), ' ')) AS token
               FROM documents)),
       seg AS (
         SELECT *, sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS UNBOUNDED PRECEDING) AS phrase_id
         FROM tok),
       words AS (SELECT doc_id, phrase_id, pos, lower(token) AS w
                 FROM seg WHERE is_stop = 0),
       plen AS (
         SELECT doc_id, phrase_id, count(*)::BIGINT AS phrase_len
         FROM words GROUP BY 1, 2),
       wstat AS (
         SELECT w, count(*)::BIGINT AS freq, sum(p.phrase_len)::BIGINT AS deg,
                CAST(round(sum(p.phrase_len)::DOUBLE * 1000000.0 / count(*))
                     AS BIGINT) AS wscore_fp
         FROM words JOIN plen p USING (doc_id, phrase_id)
         GROUP BY w),
       phrases AS (
         SELECT wo.doc_id, wo.phrase_id,
                string_agg(wo.w, ' ' ORDER BY wo.pos) AS phrase,
                sum(ws.wscore_fp)::BIGINT AS score_fp
         FROM words wo JOIN wstat ws USING (w)
         GROUP BY 1, 2),
       top AS (
         SELECT doc_id, phrase, score_fp,
                row_number() OVER (PARTITION BY doc_id
                  ORDER BY score_fp DESC, phrase) AS rnk
         FROM phrases)
       SELECT doc_id, rnk::BIGINT AS rnk, phrase, score_fp
       FROM top WHERE rnk <= 3""",
)
def q_rake_keywords(spark, sf_dir):
    """RAKE keyword extraction (Rose et al. 2010) — stopword-delimited
    candidate phrases scored by summed word degree/frequency ratios:
    phrase segmentation is the SESSIONIZE pattern transplanted to token
    streams (running sum of stopword flags = phrase id, one doc-keyed
    window pass), word degree/frequency is a corpus census with
    map-side partial aggs, and each word score is rounded ONCE to
    micro-units so phrase scores are exact integer sums. Top-3 phrases
    per doc with a lexicographic tiebreak."""
    stop_arr = F.array(*[F.lit(w) for w in T.ENGLISH_STOPWORDS])
    d = _docs(spark, sf_dir)
    tok = d.select(
        "doc_id", F.posexplode(T.tokenize(F.col("text"))).alias("pos", "token")
    ).select(
        "doc_id", "pos", "token",
        F.when(F.array_contains(stop_arr, F.lower(F.col("token"))), 1)
        .otherwise(0).alias("is_stop"),
    )
    wseg = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    words = (
        tok.withColumn("phrase_id", F.sum("is_stop").over(wseg))
        .where(F.col("is_stop") == 0)
        .select("doc_id", "phrase_id", "pos", F.lower(F.col("token")).alias("w"))
    )
    plen = words.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).cast("long").alias("phrase_len")
    )
    wstat = (
        words.join(plen, ["doc_id", "phrase_id"])
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum("phrase_len").cast("long").alias("deg"),
        )
        .select(
            "w",
            F.round(F.col("deg").cast("double") * F.lit(1e6) / F.col("freq"), 0)
            .cast("long").alias("wscore_fp"),
        )
    )
    phrases = (
        words.join(wstat, "w")
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("w")))
                    ),
                    lambda s: s.w,
                ),
                " ",
            ).alias("phrase"),
            F.sum("wscore_fp").cast("long").alias("score_fp"),
        )
    )
    wt = Window.partitionBy("doc_id").orderBy(F.desc("score_fp"), "phrase")
    return (
        phrases.withColumn("rnk", F.row_number().over(wt))
        .where(F.col("rnk") <= 3)
        .select("doc_id", F.col("rnk").cast("long").alias("rnk"),
                "phrase", "score_fp")
    )


@query(
    "circadian_entropy",
    """WITH hcnt AS (
         SELECT user_id, hour(ts) AS hod, count(*)::BIGINT AS c
         FROM events GROUP BY 1, 2),
       tot AS (
         SELECT user_id, sum(c) AS n, count(*)::BIGINT AS n_active_hours
         FROM hcnt GROUP BY user_id)
       SELECT h.user_id, t.n::BIGINT AS n_events, t.n_active_hours,
              sum(CAST(round(-(h.c::DOUBLE / t.n) * ln(h.c::DOUBLE / t.n)
                             * 1000000.0) AS BIGINT))::BIGINT AS entropy_fp
       FROM hcnt h JOIN tot t USING (user_id)
       GROUP BY h.user_id, t.n, t.n_active_hours""",
)
def q_circadian_entropy(spark, sf_dir):
    """Circadian regularity per entity: Shannon entropy of the
    hour-of-day histogram (0 = always the same hour, ln 24 ≈ 3.178 =
    uniform) — the bot-vs-human / scheduled-vs-organic signal for
    crawl sources. Hour counts are one partial agg; each entropy term
    is rounded ONCE to micro-nats (the feature_psi recipe) so the
    per-entity sum is an exact integer sum. The totals join is
    entity-grain on both sides — co-partitioned by the same key,
    no extra fact shuffle."""
    ev = _events(spark, sf_dir)
    hcnt = ev.groupBy("user_id", F.hour("ts").alias("hod")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = hcnt.groupBy("user_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_active_hours"),
    )
    p = F.col("c").cast("double") / F.col("n")
    term = F.round(-p * F.log(p) * F.lit(1e6), 0).cast("long")
    return (
        hcnt.join(tot, "user_id")
        .groupBy("user_id", "n", "n_active_hours")
        .agg(F.sum(term).cast("long").alias("entropy_fp"))
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_events"),
            "n_active_hours",
            "entropy_fp",
        )
    )


@query(
    "semi_join_returns",
    """SELECT o_orderpriority, count(*)::BIGINT AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1995-07-01'
         AND o_orderdate < TIMESTAMP '1996-07-01'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND l_returnflag = 'R')
       GROUP BY o_orderpriority""",
)
def q_semi_join_returns(spark, sf_dir):
    """TPC-H Q4's LEFT SEMI join shape (order-priority checking,
    adapted to this schema's columns): existence of a returned
    lineitem, never materializing match multiplicity (a plain join
    would double-count orders with several returned lines and force a
    distinct). The date filter pushes to the orders scan; the semi
    join shuffles both sides on the key once and AQE handles any hot
    order. Complements dq_checks' ANTI joins — both existence
    polarities covered."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    late = lineitem.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        orders.where(
            (F.col("o_orderdate") >= F.lit("1995-07-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
        )
        .join(late, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


@query(
    "custdist_hist",
    """WITH c_orders AS (
         SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
         FROM customer c LEFT JOIN orders o
           ON c.c_custkey = o.o_custkey
          AND o.o_orderpriority <> '1-URGENT'
         GROUP BY c.c_custkey)
       SELECT c_count, count(*)::BIGINT AS custdist
       FROM c_orders GROUP BY c_count""",
)
def q_custdist_hist(spark, sf_dir):
    """Customer distribution (TPC-H Q13 shape) — the left-outer join
    with a JOIN-TIME predicate (the priority filter must sit in the ON
    clause, not a WHERE, or zero-order customers silently vanish from
    the histogram) followed by two-level re-aggregation:
    orders-per-customer, then the histogram of that. The second
    groupBy runs over customer-grain data — already tiny — and the
    first gets map-side partial counts. The classic 'distribution of
    engagement' report shape."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    o = orders.where(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    c_orders = (
        customer.select("c_custkey")
        .join(o, customer.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


_CHURN_T1 = "2024-01-15 00:00:00"
_CHURN_T2 = "2024-01-30 00:00:00"


@query(
    "state_churn",
    f"""WITH s1 AS (
         SELECT user_id, event_type AS state_t1 FROM (
           SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
           FROM events WHERE ts <= TIMESTAMP '{_CHURN_T1}') WHERE rn = 1),
       s2 AS (
         SELECT user_id, event_type AS state_t2 FROM (
           SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
           FROM events WHERE ts <= TIMESTAMP '{_CHURN_T2}') WHERE rn = 1)
       SELECT s2.user_id, s1.state_t1, s2.state_t2,
              (s1.state_t1 IS NOT NULL
               AND s1.state_t1 <> s2.state_t2) AS changed
       FROM s2 LEFT JOIN s1 USING (user_id)""",
)
def q_state_churn(spark, sf_dir):
    """State churn between two snapshot cutoffs — how volatile is the
    latest-known state per entity (the crawl-freshness planning
    signal: high churn → revisit often): latest state as-of T1 and
    as-of T2 via max-by-(ts, id) structs (argmax with a deterministic
    tiebreak, NO window sort — one partial-aggregable max per cutoff),
    then an entity-grain compare. Both aggs and the join share the
    entity key; entities born after T1 report NULL→state (not
    'changed')."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    u = epoch_micros(ev, "ts")

    def latest_before(cutoff, out):
        return (
            ev.where(F.col("ts") <= F.lit(cutoff).cast("timestamp"))
            .groupBy("user_id")
            .agg(
                F.max(
                    F.struct(
                        u.alias("u"),
                        F.col("event_id").alias("eid"),
                        F.col("event_type").alias("state"),
                    )
                ).getField("state").alias(out)
            )
        )

    s1 = latest_before(_CHURN_T1, "state_t1")
    s2 = latest_before(_CHURN_T2, "state_t2")
    return s2.join(s1, "user_id", "left").select(
        "user_id", "state_t1", "state_t2",
        (
            F.col("state_t1").isNotNull()
            & (F.col("state_t1") != F.col("state_t2"))
        ).alias("changed"),
    )


_ATTR_WIN_US = 7 * 86_400_000_000


@query(
    "attribution",
    f"""WITH base AS (
         SELECT event_id, user_id, event_type, epoch_us(ts) AS u FROM events),
       scanned AS (
         SELECT *,
                min(CASE WHEN event_type = 'click' THEN u END) OVER w
                  AS first_click_u,
                max(CASE WHEN event_type = 'click' THEN u END) OVER w
                  AS last_click_u
         FROM base
         WINDOW w AS (PARTITION BY user_id ORDER BY u
                      RANGE BETWEEN {_ATTR_WIN_US} PRECEDING AND 1 PRECEDING))
       SELECT event_id, user_id,
              first_click_u::BIGINT AS first_click_u,
              last_click_u::BIGINT AS last_click_u,
              (u - last_click_u)::BIGINT AS gap_to_last_click_us
       FROM scanned WHERE event_type = 'purchase'""",
)
def q_attribution(spark, sf_dir):
    """First-touch / last-touch attribution — for every conversion,
    the earliest and latest preceding click inside a 7-day lookback:
    two conditional extremes over ONE strictly-past range frame (the
    same single (user, u) Exchange+Sort as every other windowed
    feature; frames end 1µs before the purchase so a same-instant
    click never self-attributes). NULL when no click is in window —
    the 'organic conversion' signal. The revenue-assignment primitive
    behind every marketing-mix table."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_id", "user_id", "event_type", epoch_micros(ev, "ts").alias("u")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("u")
        .rangeBetween(-_ATTR_WIN_US, -1)
    )
    click_u = F.when(F.col("event_type") == "click", F.col("u"))
    scanned = base.select(
        "*",
        F.min(click_u).over(w).alias("first_click_u"),
        F.max(click_u).over(w).alias("last_click_u"),
    )
    return scanned.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id",
        F.col("first_click_u").cast("long").alias("first_click_u"),
        F.col("last_click_u").cast("long").alias("last_click_u"),
        (F.col("u") - F.col("last_click_u")).cast("long")
        .alias("gap_to_last_click_us"),
    )


@query(
    "stickiness",
    f"""WITH uw AS (
         SELECT DISTINCT user_id, epoch_us(ts) // {_WEEK_US} AS w FROM events),
       weeks AS (SELECT DISTINCT w FROM uw),
       wau AS (SELECT w, count(*)::BIGINT AS n_wau FROM uw GROUP BY w),
       m4 AS (
         SELECT wk.w, count(DISTINCT u.user_id)::BIGINT AS n_m4
         FROM weeks wk JOIN uw u ON u.w BETWEEN wk.w - 3 AND wk.w
         GROUP BY wk.w)
       SELECT w::BIGINT AS w, wau.n_wau, m4.n_m4,
              CAST(round(wau.n_wau::DOUBLE * 1000000.0 / m4.n_m4) AS BIGINT)
                AS stickiness_fp
       FROM wau JOIN m4 USING (w)""",
)
def q_stickiness(spark, sf_dir):
    """WAU / 4-week-AU stickiness ratio (the DAU/MAU engagement metric
    at week grain): the fact table collapses ONCE to distinct
    (entity, epoch-week) pairs — everything after runs on that tiny
    entity-week grain, including the sliding 4-week distinct, which is
    a self-range-join of the small table against its own week spine
    (never a sliding distinct over raw events). Integer micro-ratios
    rounded once."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    uw = ev.select(
        "user_id", F.floor(epoch_micros(ev, "ts") / _WEEK_US).alias("w")
    ).distinct()
    weeks = uw.select("w").distinct()
    wau = uw.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("n_wau"))
    u2 = uw.select(F.col("user_id"), F.col("w").alias("uw_w"))
    m4 = (
        weeks.join(
            u2,
            (F.col("uw_w") >= F.col("w") - 3) & (F.col("uw_w") <= F.col("w")),
        )
        .groupBy("w")
        .agg(F.countDistinct("user_id").cast("long").alias("n_m4"))
    )
    return (
        wau.join(m4, "w")
        .select(
            F.col("w").cast("long").alias("w"),
            "n_wau",
            "n_m4",
            F.round(
                F.col("n_wau").cast("double") * F.lit(1e6) / F.col("n_m4"), 0
            ).cast("long").alias("stickiness_fp"),
        )
    )


_XCORR_MAX_LAG = 6


@query(
    "lead_lag_corr",
    f"""WITH hc AS (
         SELECT epoch_us(ts) // 3600000000 AS h,
                sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS x,
                sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS y
         FROM events GROUP BY h),
       lags AS (SELECT unnest(range({_XCORR_MAX_LAG + 1}))::BIGINT AS lag),
       pairs AS (
         SELECT l.lag, a.x, b.y
         FROM lags l
         JOIN hc a ON TRUE
         JOIN hc b ON b.h = a.h + l.lag),
       s AS (
         SELECT lag, count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
                sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
         FROM pairs GROUP BY lag)
       SELECT lag, n,
              CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                   THEN CAST(round((n * sxy - sx * sy)::DOUBLE
                     / (sqrt((n * sxx - sx * sx)::DOUBLE)
                        * sqrt((n * syy - sy * sy)::DOUBLE))
                     * 1000000.0) AS BIGINT)
              END AS r_fp
       FROM s""",
)
def q_lead_lag_corr(spark, sf_dir):
    """Lead-lag cross-correlation between two event streams (do clicks
    lead purchases, and by how many hours): the fact table collapses
    ONCE to an hourly two-series table, every lag then correlates that
    tiny series against its own shifted self (equi-join on h = h+lag —
    never a window per lag, never the fact table again). Pearson r per
    lag from exact int64 sufficient statistics, the autocorr_lag1
    recipe; the argmax lag is the actionable lead time."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    hc = ev.groupBy(
        F.floor(epoch_micros(ev, "ts") / F.lit(3_600_000_000)).alias("h")
    ).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long").alias("x"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long").alias("y"),
    )
    lags = spark.range(_XCORR_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = hc.select("h", "x")
    b = hc.select(F.col("h").alias("hb"), "y")
    pairs = (
        F.broadcast(lags)
        .crossJoin(a)
        .join(b, F.col("hb") == F.col("h") + F.col("lag"))
    )
    s = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    vx = n * F.col("sxx") - sx * sx
    vy = n * F.col("syy") - sy * sy
    r = F.round(
        (n * F.col("sxy") - sx * sy).cast("double")
        / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
        * F.lit(1e6),
        0,
    ).cast("long")
    return s.select(
        "lag", "n", F.when((vx > 0) & (vy > 0), r).alias("r_fp")
    )


@query(
    "cube_events",
    """SELECT coalesce(event_type, 'ALL') AS event_type,
              coalesce(hod, -1)::BIGINT AS hod,
              grouping(event_type)::BIGINT + 2 * grouping(hod)::BIGINT
                AS grouping_id,
              count(*)::BIGINT AS n,
              sum(CAST(round(value * 1000000.0) AS BIGINT))::BIGINT AS sum_fp
       FROM (SELECT event_type, hour(ts)::BIGINT AS hod, value FROM events)
       GROUP BY CUBE (event_type, hod)""",
)
def q_cube_events(spark, sf_dir):
    """OLAP CUBE over (event_type, hour-of-day) — all four grouping
    sets (detail, each one-way rollup, grand total) in ONE aggregation:
    Spark's Expand operator fans each row into its grouping
    combinations map-side and the partial aggs still combine before
    the single shuffle — at 10^12 rows that beats four separate
    groupBys by 4× on scan cost alone. grouping() flags disambiguate
    the NULL-as-total rows (coalesced to sentinels so the hash compare
    has no NULL/total ambiguity)."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("hod"),
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("v_fp"),
    )
    out = base.cube("event_type", "hod").agg(
        (
            F.grouping("event_type").cast("long")
            + 2 * F.grouping("hod").cast("long")
        ).alias("grouping_id"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v_fp").cast("long").alias("sum_fp"),
    )
    return out.select(
        F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
        F.coalesce(F.col("hod"), F.lit(-1)).cast("long").alias("hod"),
        "grouping_id",
        "n",
        "sum_fp",
    )


@query(
    "source_vocab_overlap",
    f"""WITH st AS (
         SELECT DISTINCT source, unnest({_tok_sql()}) AS token FROM documents),
       sizes AS (SELECT source, count(*)::BIGINT AS n FROM st GROUP BY source),
       inter AS (
         SELECT a.source AS src_a, b.source AS src_b, count(*)::BIGINT AS n_inter
         FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
         GROUP BY 1, 2)
       SELECT i.src_a, i.src_b, sa.n AS n_a, sb.n AS n_b, i.n_inter,
              CAST(round(i.n_inter::DOUBLE * 1000000.0
                         / (sa.n + sb.n - i.n_inter)) AS BIGINT) AS jaccard_fp
       FROM inter i
       JOIN sizes sa ON sa.source = i.src_a
       JOIN sizes sb ON sb.source = i.src_b""",
)
def q_source_vocab_overlap(spark, sf_dir):
    """Vocabulary overlap between corpus sources (the diversity audit
    before mixing: near-identical vocabularies mean the 'new' source
    adds little): the corpus collapses ONCE to distinct (source, token)
    pairs, the token-keyed self-join counts intersections (source
    cardinality is tiny, so pair fan-out per token is bounded by
    |sources|² — and the ordered predicate halves it), and Jaccard is
    exact integer |∩| / (|A|+|B|−|∩|) rounded once. Size dims broadcast
    back onto the pair table."""
    d = _docs(spark, sf_dir)
    st = d.select(
        "source", F.explode(T.tokenize(F.col("text"))).alias("token")
    ).distinct()
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = st.select(F.col("source").alias("src_a"), "token")
    b = st.select(F.col("source").alias("src_b"), "token")
    inter = (
        a.join(b, "token")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a", "src_b", "n_a", "n_b", "n_inter",
            F.round(
                F.col("n_inter").cast("double") * F.lit(1e6)
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                0,
            ).cast("long").alias("jaccard_fp"),
        )
    )


_SHRINK_K = 20


@query(
    "shrunk_means",
    f"""WITH base AS (
         SELECT event_type, CAST(round(value * 1000000.0) AS BIGINT) AS v_fp
         FROM events),
       g AS (SELECT sum(v_fp) AS gs, count(*) AS gn FROM base),
       c AS (
         SELECT event_type, count(*)::BIGINT AS n, sum(v_fp) AS s
         FROM base GROUP BY event_type)
       SELECT c.event_type, c.n,
              CAST(round(c.s::DOUBLE / c.n) AS BIGINT) AS raw_mean_fp,
              CAST(round(g.gs::DOUBLE / g.gn) AS BIGINT) AS prior_mean_fp,
              CAST(round((c.s::DOUBLE + {_SHRINK_K}.0 * (g.gs::DOUBLE / g.gn))
                         / (c.n + {_SHRINK_K})) AS BIGINT) AS shrunk_mean_fp
       FROM c CROSS JOIN g""",
)
def q_shrunk_means(spark, sf_dir):
    """Empirical-Bayes (James-Stein-style) shrunk category means — the
    production form of mean/target encoding: rare categories pull
    toward the global prior with pseudo-count k={_SHRINK_K}, so a
    category seen 3 times can't memorize its 3 labels (the
    regularization target_encode_pit's strictly-past frame still
    needs when categories are sparse). Two partial aggs — category
    sums and a 1-row broadcast prior — and one mirrored IEEE
    expression per category, rounded once."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_type",
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("v_fp"),
    )
    g = base.agg(
        F.sum("v_fp").alias("gs"), F.count(F.lit(1)).alias("gn")
    )
    c = base.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("v_fp").alias("s")
    )
    prior = F.col("gs").cast("double") / F.col("gn")
    return c.crossJoin(F.broadcast(g)).select(
        "event_type",
        "n",
        F.round(F.col("s").cast("double") / F.col("n"), 0)
        .cast("long").alias("raw_mean_fp"),
        F.round(prior, 0).cast("long").alias("prior_mean_fp"),
        F.round(
            (F.col("s").cast("double") + _SHRINK_K * prior)
            / (F.col("n") + _SHRINK_K),
            0,
        ).cast("long").alias("shrunk_mean_fp"),
    )


@query(
    "share_shift",
    f"""WITH wk AS (
         SELECT epoch_us(ts) // {_WEEK_US} AS w, event_type,
                count(*)::BIGINT AS n
         FROM events GROUP BY 1, 2),
       tot AS (SELECT w, sum(n) AS wn FROM wk GROUP BY w),
       shares AS (
         SELECT wk.w, wk.event_type, wk.n,
                CAST(round(wk.n::DOUBLE * 1000000.0 / tot.wn) AS BIGINT)
                  AS share_fp
         FROM wk JOIN tot USING (w))
       SELECT w::BIGINT AS w, event_type, n, share_fp,
              (share_fp - lag(share_fp) OVER
                 (PARTITION BY event_type ORDER BY w))::BIGINT
                AS share_delta_fp
       FROM shares""",
)
def q_share_shift(spark, sf_dir):
    """Share-of-total per week + week-over-week share shift (the mix
    drift report: which event type is gaining share): weekly counts
    are one partial agg, the weekly totals join runs at week grain,
    shares are single-rounded micro-fractions, and the WoW delta is a
    lag over the tiny (type, week) table — the fact table is touched
    exactly once. Integer epoch weeks, no calendar ambiguity."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    wk = ev.groupBy(
        F.floor(epoch_micros(ev, "ts") / _WEEK_US).alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = wk.groupBy("w").agg(F.sum("n").alias("wn"))
    shares = wk.join(tot, "w").select(
        "w", "event_type", "n",
        F.round(F.col("n").cast("double") * F.lit(1e6) / F.col("wn"), 0)
        .cast("long").alias("share_fp"),
    )
    wl = Window.partitionBy("event_type").orderBy("w")
    return shares.select(
        F.col("w").cast("long").alias("w"),
        "event_type",
        "n",
        "share_fp",
        (F.col("share_fp") - F.lag("share_fp").over(wl)).cast("long")
        .alias("share_delta_fp"),
    )


@query(
    "transition_entropy",
    """WITH pairs AS (
         SELECT user_id,
                lag(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS prev_type,
                event_type AS next_type
         FROM events),
       cnt AS (
         SELECT user_id, prev_type, next_type, count(*)::BIGINT AS c
         FROM pairs WHERE prev_type IS NOT NULL GROUP BY 1, 2, 3),
       rowtot AS (
         SELECT user_id, prev_type, sum(c) AS rn FROM cnt GROUP BY 1, 2),
       terms AS (
         SELECT c.user_id, c.prev_type, r.rn, c.c,
                CAST(round(-(c.c::DOUBLE / r.rn) * ln(c.c::DOUBLE / r.rn)
                           * 1000000.0) AS BIGINT) AS term_fp
         FROM cnt c JOIN rowtot r USING (user_id, prev_type)),
       hrow AS (
         SELECT user_id, prev_type, max(rn) AS rn,
                sum(term_fp)::BIGINT AS h_fp
         FROM terms GROUP BY 1, 2),
       utot AS (SELECT user_id, sum(rn) AS un FROM hrow GROUP BY user_id)
       SELECT h.user_id,
              CAST(round(sum(h.h_fp * h.rn)::DOUBLE / u.un) AS BIGINT)
                AS entropy_rate_fp
       FROM hrow h JOIN utot u USING (user_id)
       GROUP BY h.user_id, u.un""",
)
def q_transition_entropy(spark, sf_dir):
    """Per-entity Markov entropy RATE — how predictable is each
    entity's next event given its current one: H(next|prev) = Σ_prev
    p(prev)·H(next|prev=s), the sequence-predictability feature that
    separates scripted agents (≈0) from organic users. Bigram counts
    from one sorted lag pass; per-row entropies use the micro-nat
    single-rounding recipe; the p(prev) mixture weights are exact
    count ratios applied as an EXACT int64 weighted sum (Σ h_fp·rn,
    divided once at the end — a double-valued sum would be
    accumulation-order-dependent across engines). Every join after the
    lag runs on (entity, type) grain — never the fact table twice."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    cnt = pairs.groupBy("user_id", "prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    rowtot = cnt.groupBy("user_id", "prev_type").agg(F.sum("c").alias("rn"))
    p = F.col("c").cast("double") / F.col("rn")
    terms = cnt.join(rowtot, ["user_id", "prev_type"]).select(
        "user_id", "prev_type", "rn", "c",
        F.round(-p * F.log(p) * F.lit(1e6), 0).cast("long").alias("term_fp"),
    )
    hrow = terms.groupBy("user_id", "prev_type").agg(
        F.max("rn").alias("rn"), F.sum("term_fp").cast("long").alias("h_fp")
    )
    utot = hrow.groupBy("user_id").agg(F.sum("rn").alias("un"))
    return (
        hrow.join(utot, "user_id")
        .groupBy("user_id", "un")
        .agg(F.sum(F.col("h_fp") * F.col("rn")).alias("wsum"))
        .select(
            "user_id",
            F.round(F.col("wsum").cast("double") / F.col("un"), 0)
            .cast("long").alias("entropy_rate_fp"),
        )
    )


@query(
    "group_quantiles",
    """WITH base AS (
         SELECT event_type, CAST(round(value * 1000000.0) AS BIGINT) AS v_fp,
                event_id
         FROM events),
       ranked AS (
         SELECT event_type, v_fp,
                row_number() OVER (PARTITION BY event_type
                                   ORDER BY v_fp, event_id) AS rn,
                count(*) OVER (PARTITION BY event_type) AS n
         FROM base)
       SELECT event_type, max(n)::BIGINT AS n,
              max(CASE WHEN rn = (10 * n + 99) // 100 THEN v_fp END)::BIGINT
                AS p10_fp,
              max(CASE WHEN rn = (50 * n + 99) // 100 THEN v_fp END)::BIGINT
                AS p50_fp,
              max(CASE WHEN rn = (90 * n + 99) // 100 THEN v_fp END)::BIGINT
                AS p90_fp
       FROM ranked GROUP BY event_type""",
)
def q_group_quantiles(spark, sf_dir):
    """Exact per-group quantiles as ORDER STATISTICS (p10/p50/p90 via
    rank = ceil(p·n)) — actual data values selected by integer rank,
    the winsorize discipline generalized to a quantile report: no
    interpolation formula, no approx-percentile sketch error, nothing
    for two engines to disagree on. One keyed rank window + one
    conditional-max agg sharing the group shuffle; at corpus scale the
    sort is partition-sized per group."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_type",
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("v_fp"),
        "event_id",
    )
    wr = Window.partitionBy("event_type").orderBy("v_fp", "event_id")
    wall = Window.partitionBy("event_type")
    ranked = base.select(
        "event_type", "v_fp",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )

    def at(p):
        rank = F.floor((p * F.col("n") + 99) / 100)
        return F.max(F.when(F.col("rn") == rank, F.col("v_fp"))).cast("long")

    return ranked.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        at(10).alias("p10_fp"),
        at(50).alias("p50_fp"),
        at(90).alias("p90_fp"),
    )


@query(
    "basket_lift",
    f"""WITH flagged AS (
         SELECT user_id, ts, event_id, event_type,
                CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch(ts) - epoch(lag(ts) OVER w) > {_SESSION_GAP_S}
                     THEN 1 ELSE 0 END AS is_new
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       sess AS (
         SELECT user_id, event_type,
                sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_id
         FROM flagged),
       baskets AS (SELECT DISTINCT user_id, session_id, event_type FROM sess),
       nb AS (SELECT count(DISTINCT (user_id, session_id)) AS n FROM baskets),
       item AS (
         SELECT event_type, count(*)::BIGINT AS c FROM baskets GROUP BY 1),
       pair AS (
         SELECT a.event_type AS item_a, b.event_type AS item_b,
                count(*)::BIGINT AS c_ab
         FROM baskets a JOIN baskets b
           ON a.user_id = b.user_id AND a.session_id = b.session_id
          AND a.event_type < b.event_type
         GROUP BY 1, 2)
       SELECT p.item_a, p.item_b, p.c_ab, ia.c AS c_a, ib.c AS c_b,
              CAST(round(p.c_ab::DOUBLE * 1000000.0 / ia.c) AS BIGINT)
                AS confidence_fp,
              CAST(round(p.c_ab::DOUBLE * nb.n / (ia.c::DOUBLE * ib.c)
                         * 1000000.0) AS BIGINT) AS lift_fp
       FROM pair p
       JOIN item ia ON ia.event_type = p.item_a
       JOIN item ib ON ib.event_type = p.item_b
       CROSS JOIN nb""",
)
def q_basket_lift(spark, sf_dir):
    """Market-basket association mining over SESSIONS as baskets:
    support, confidence, and lift for every event-type pair that
    co-occurs inside a gap-session. The basket table is distinct
    (entity, session, type) — tiny — so the pair self-join fans out by
    at most |types|² per basket, never by raw events; item supports
    and the basket count are broadcast dims. Lift > 1e6 (micro-units)
    = genuinely associated behaviors, the recommender/bundling
    primitive. Reuses temporal.sessionize's running-flag pattern."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    s = TP.sessionize(ev, ["user_id"], "ts", gap_seconds=_SESSION_GAP_S)
    baskets = s.select("user_id", "session_id", "event_type").distinct()
    nb = baskets.select("user_id", "session_id").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    item = baskets.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    a = baskets.select("user_id", "session_id", F.col("event_type").alias("item_a"))
    b = baskets.select("user_id", "session_id", F.col("event_type").alias("item_b"))
    pair = (
        a.join(b, ["user_id", "session_id"])
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
    )
    ia = item.select(F.col("event_type").alias("item_a"), F.col("c").alias("c_a"))
    ib = item.select(F.col("event_type").alias("item_b"), F.col("c").alias("c_b"))
    return (
        pair.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a", "item_b", "c_ab", "c_a", "c_b",
            F.round(F.col("c_ab").cast("double") * F.lit(1e6) / F.col("c_a"), 0)
            .cast("long").alias("confidence_fp"),
            F.round(
                F.col("c_ab").cast("double") * F.col("n")
                / (F.col("c_a").cast("double") * F.col("c_b"))
                * F.lit(1e6),
                0,
            ).cast("long").alias("lift_fp"),
        )
    )


@query(
    "longest_streak",
    """WITH flagged AS (
         SELECT user_id, ts, event_id, event_type,
                CASE WHEN lag(event_type) OVER w IS NULL
                          OR lag(event_type) OVER w <> event_type
                     THEN 1 ELSE 0 END AS is_new
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       runs AS (
         SELECT user_id, event_type,
                sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS run_id
         FROM flagged),
       runlen AS (
         SELECT user_id, event_type, run_id, count(*)::BIGINT AS len
         FROM runs GROUP BY 1, 2, 3)
       SELECT user_id, len::BIGINT AS max_streak, event_type AS streak_type
       FROM (SELECT *, row_number() OVER (PARTITION BY user_id
               ORDER BY len DESC, event_type DESC) AS rnk FROM runlen)
       WHERE rnk = 1""",
)
def q_longest_streak(spark, sf_dir):
    """Longest same-type run per entity — the gaps-and-islands pattern
    on VALUE changes rather than time gaps (sessionize's sibling):
    change flags from one lag pass, run ids from the running flag sum,
    run lengths from a grain-reduced groupBy, then max-with-tiebreak
    (longest run, lexicographically-LAST type on equal lengths — the
    struct-max convention both engines share, fully deterministic). Burst/monotony signal: a 40-event 'error' streak
    is an incident, a 40-event 'click' streak is a bot."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    flagged = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(prev.isNull() | (prev != F.col("event_type")), 1)
        .otherwise(0).alias("is_new"),
    )
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs = flagged.withColumn("run_id", F.sum("is_new").over(wc))
    runlen = runs.groupBy("user_id", "event_type", "run_id").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    best = F.max(
        F.struct(F.col("len"), F.col("event_type").alias("t"))
    )
    return runlen.groupBy("user_id").agg(
        F.max("len").cast("long").alias("max_streak"),
        best.getField("t").alias("streak_type"),
    )


@query(
    "spearman_rho",
    """WITH f AS (
         SELECT doc_id, length(trim(text))::BIGINT AS a,
                len(string_split(trim(text), ' '))::BIGINT AS b
         FROM documents),
       ranked AS (
         SELECT doc_id,
                2 * rank() OVER (ORDER BY a) + count(*) OVER (PARTITION BY a)
                  - 1 AS ra2,
                2 * rank() OVER (ORDER BY b) + count(*) OVER (PARTITION BY b)
                  - 1 AS rb2
         FROM f)
       SELECT count(*)::BIGINT AS n,
              CAST(round(
                (count(*) * sum(ra2 * rb2) - sum(ra2) * sum(rb2))::DOUBLE
                / (sqrt((count(*) * sum(ra2 * ra2) - sum(ra2) * sum(ra2))::DOUBLE)
                   * sqrt((count(*) * sum(rb2 * rb2) - sum(rb2) * sum(rb2))::DOUBLE))
                * 1000000.0) AS BIGINT) AS rho_fp
       FROM ranked""",
)
def q_spearman_rho(spark, sf_dir):
    """EXACT Spearman rank correlation between two features (doc
    length vs token count): tie-averaged ranks stay INTEGER via the
    2×rank + tie_count − 1 identity (the roc_auc trick), so Pearson on
    the doubled ranks runs on exact int64 sufficient statistics with
    separate sqrt terms and ONE final rounding. The robust dependence
    measure feature selection uses when the relationship is monotone
    but not linear. Global rank windows = eval-table concession (same
    contract as roc_auc)."""
    d = _docs(spark, sf_dir)
    f = d.select(
        T.text_length("text").cast("long").alias("a"),
        F.size(T.tokenize(F.col("text"))).cast("long").alias("b"),
    )
    ra2 = (
        2 * F.rank().over(Window.orderBy("a"))
        + F.count(F.lit(1)).over(Window.partitionBy("a"))
        - 1
    )
    rb2 = (
        2 * F.rank().over(Window.orderBy("b"))
        + F.count(F.lit(1)).over(Window.partitionBy("b"))
        - 1
    )
    ranked = f.select(ra2.alias("ra2"), rb2.alias("rb2"))
    n = F.count(F.lit(1))
    sa, sb = F.sum("ra2"), F.sum("rb2")
    sab = F.sum(F.col("ra2") * F.col("rb2"))
    saa = F.sum(F.col("ra2") * F.col("ra2"))
    sbb = F.sum(F.col("rb2") * F.col("rb2"))
    return ranked.agg(
        n.cast("long").alias("n"),
        F.round(
            (n * sab - sa * sb).cast("double")
            / (
                F.sqrt((n * saa - sa * sa).cast("double"))
                * F.sqrt((n * sbb - sb * sb).cast("double"))
            )
            * F.lit(1e6),
            0,
        ).cast("long").alias("rho_fp"),
    )


@query(
    "benford_audit",
    """WITH d1 AS (
         SELECT CAST(substr(CAST(CAST(round(value * 100.0) AS BIGINT)
                            AS VARCHAR), 1, 1) AS BIGINT) AS digit
         FROM events WHERE value >= 0.01),
       cnt AS (SELECT digit, count(*)::BIGINT AS n FROM d1 GROUP BY digit),
       tot AS (SELECT sum(n) AS t FROM cnt)
       SELECT c.digit, c.n,
              CAST(round(c.n::DOUBLE * 1000000.0 / tot.t) AS BIGINT)
                AS observed_fp,
              CAST(round(ln(1.0 + 1.0 / c.digit) / ln(10.0) * 1000000.0)
                   AS BIGINT) AS benford_fp,
              (CAST(round(c.n::DOUBLE * 1000000.0 / tot.t) AS BIGINT)
               - CAST(round(ln(1.0 + 1.0 / c.digit) / ln(10.0) * 1000000.0)
                      AS BIGINT))::BIGINT AS dev_fp
       FROM cnt c CROSS JOIN tot""",
)
def q_benford_audit(spark, sf_dir):
    """Benford's-law first-digit audit — the forensic data-quality
    check for fabricated or truncated numeric columns: first
    significant digit of the centi-scaled value (string head of the
    exact integer — no float log10 needed for extraction), observed
    share vs the log10(1+1/d) expectation, both micro-rounded once,
    and the signed deviation. One digit census with map-side partial
    agg + a 1-row broadcast total; a synthetic uniform column shows
    flat ~111,111 shares, flagging itself."""
    ev = _events(spark, sf_dir)
    c = F.round(F.col("value") * F.lit(100.0), 0).cast("long")
    d1 = ev.where(F.col("value") >= 0.01).select(
        F.substring(c.cast("string"), 1, 1).cast("long").alias("digit")
    )
    cnt = d1.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = cnt.agg(F.sum("n").alias("t"))
    observed = F.round(
        F.col("n").cast("double") * F.lit(1e6) / F.col("t"), 0
    ).cast("long")
    benford = F.round(
        F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0)) * F.lit(1e6), 0
    ).cast("long")
    return cnt.crossJoin(F.broadcast(tot)).select(
        "digit", "n",
        observed.alias("observed_fp"),
        benford.alias("benford_fp"),
        (observed - benford).cast("long").alias("dev_fp"),
    )


_PATH_CAP = 8


@query(
    "session_paths",
    f"""WITH flagged AS (
         SELECT user_id, ts, event_id, event_type,
                CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch(ts) - epoch(lag(ts) OVER w) > {_SESSION_GAP_S}
                     THEN 1 ELSE 0 END AS is_new
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       sess AS (
         SELECT user_id, ts, event_id, event_type,
                sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_id
         FROM flagged),
       stepped AS (
         SELECT user_id, session_id, event_type,
                row_number() OVER (PARTITION BY user_id, session_id
                  ORDER BY ts, event_id) AS step
         FROM sess),
       paths AS (
         SELECT user_id, session_id,
                string_agg(event_type, '>' ORDER BY step) AS path
         FROM stepped WHERE step <= {_PATH_CAP}
         GROUP BY 1, 2),
       pcnt AS (SELECT path, count(*)::BIGINT AS n FROM paths GROUP BY path)
       SELECT path, n FROM pcnt ORDER BY n DESC, path LIMIT 25""",
)
def q_session_paths(spark, sf_dir):
    """Top session paths — the most common event-type sequences per
    gap-session (the UX/behavior-flow report): sessions from the
    running-flag pattern, per-session paths truncated to the first
    {_PATH_CAP} steps (unbounded concat of a pathological session
    would make one unbounded string — the same cap discipline as
    minhash_lsh's bucket gate), then a path census and deterministic
    top-25. Path assembly is sort-within-group + join, never a
    driver-side collect."""
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    s = TP.sessionize(ev, ["user_id"], "ts", gap_seconds=_SESSION_GAP_S)
    ws = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    stepped = s.select(
        "user_id", "session_id", "event_type",
        F.row_number().over(ws).alias("step"),
    ).where(F.col("step") <= _PATH_CAP)
    paths = stepped.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("step"), F.col("event_type")))
                ),
                lambda x: x.event_type,
            ),
            ">",
        ).alias("path")
    )
    pcnt = paths.groupBy("path").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return pcnt.orderBy(F.desc("n"), "path").limit(25)


@query(
    "hazard_table",
    """WITH firsts AS (
         SELECT user_id,
                min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v_u,
                min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p_u,
                max(epoch_us(ts)) AS last_u
         FROM events GROUP BY user_id),
       spans AS (
         SELECT user_id,
                CASE WHEN p_u IS NOT NULL AND p_u > v_u
                     THEN (p_u - v_u) // 86400000000 END AS conv_day,
                (last_u - v_u) // 86400000000 AS censor_day
         FROM firsts WHERE v_u IS NOT NULL),
       days AS (SELECT unnest(range(30))::BIGINT AS day),
       tbl AS (
         SELECT d.day,
                sum(CASE WHEN coalesce(s.conv_day, s.censor_day) >= d.day
                         THEN 1 ELSE 0 END)::BIGINT AS n_at_risk,
                sum(CASE WHEN s.conv_day = d.day THEN 1 ELSE 0 END)::BIGINT
                  AS n_converted
         FROM days d CROSS JOIN spans s GROUP BY d.day)
       SELECT day, n_at_risk, n_converted,
              CASE WHEN n_at_risk > 0
                   THEN CAST(round(n_converted::DOUBLE * 1000000.0 / n_at_risk)
                             AS BIGINT) END AS hazard_fp
       FROM tbl WHERE n_at_risk > 0""",
)
def q_hazard_table(spark, sf_dir):
    """Discrete-time hazard table for time-to-conversion (first view →
    first purchase) with right-censoring at the entity's last observed
    event — the survival-analysis primitive behind 'how long until a
    crawled page converts/changes': risk sets and conversion counts
    are EXACT integer sums (a Kaplan-Meier cumulative product would
    need an order-dependent float product — the hazard table carries
    the same information exactly), hazard = d/n rounded once per day.
    The entity table collapses to one row each before the 30-row day
    spine fans it out (broadcast), so the fact table is scanned
    once."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    u = epoch_micros(ev, "ts")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", u)).alias("v_u"),
        F.min(F.when(F.col("event_type") == "purchase", u)).alias("p_u"),
        F.max(u).alias("last_u"),
    )
    day_us = 86_400_000_000
    spans = firsts.where(F.col("v_u").isNotNull()).select(
        "user_id",
        F.when(
            F.col("p_u").isNotNull() & (F.col("p_u") > F.col("v_u")),
            F.floor((F.col("p_u") - F.col("v_u")) / day_us),
        ).alias("conv_day"),
        F.floor((F.col("last_u") - F.col("v_u")) / day_us).alias("censor_day"),
    )
    days = spark.range(30).select(F.col("id").alias("day"))
    tbl = (
        F.broadcast(days)
        .crossJoin(spans)
        .groupBy("day")
        .agg(
            F.sum(
                F.when(
                    F.coalesce(F.col("conv_day"), F.col("censor_day"))
                    >= F.col("day"),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_at_risk"),
            F.sum(
                F.when(F.col("conv_day") == F.col("day"), 1).otherwise(0)
            ).cast("long").alias("n_converted"),
        )
    )
    return tbl.where(F.col("n_at_risk") > 0).select(
        "day", "n_at_risk", "n_converted",
        F.when(
            F.col("n_at_risk") > 0,
            F.round(
                F.col("n_converted").cast("double") * F.lit(1e6)
                / F.col("n_at_risk"),
                0,
            ).cast("long"),
        ).alias("hazard_fp"),
    )


@query(
    "key_skew_report",
    """WITH kc AS (
         SELECT l_orderkey AS key, count(*)::BIGINT AS c
         FROM lineitem GROUP BY l_orderkey),
       tot AS (SELECT sum(c) AS t, count(*) AS nk FROM kc),
       ranked AS (
         SELECT key, c, row_number() OVER (ORDER BY c DESC, key) AS rnk,
                row_number() OVER (ORDER BY c, key) AS rn_asc
         FROM kc),
       gini AS (
         SELECT CAST(round(sum((2 * rn_asc - tot.nk - 1) * c)::DOUBLE
                           / (tot.nk * tot.t) * 1000000.0) AS BIGINT) AS g_fp
         FROM ranked CROSS JOIN tot GROUP BY tot.nk, tot.t)
       SELECT r.rnk AS rnk, r.key, r.c,
              CAST(round(r.c::DOUBLE * 1000000.0 / tot.t) AS BIGINT) AS share_fp,
              gini.g_fp AS key_gini_fp
       FROM ranked r CROSS JOIN tot CROSS JOIN gini
       WHERE r.rnk <= 10""",
)
def q_key_skew_report(spark, sf_dir):
    """Join-key skew diagnostic — the report you read BEFORE choosing
    salting factors or AQE thresholds: per-key census (map-side
    partial agg collapses the fact table to key grain), top-10 heavy
    hitters with their traffic share, plus the Gini concentration of
    the whole key distribution (gini_tokens' exact rank-weighted
    integer sum, reused on keys). Only the key-grain table ever sorts.
    Pairs with operators/asof.detect_heavy_hitters — this is its
    offline, human-readable face."""
    li = load_table(spark, sf_dir, "lineitem")
    kc = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    tot = kc.agg(F.sum("c").alias("t"), F.count(F.lit(1)).alias("nk"))
    wd = Window.orderBy(F.desc("c"), "key")
    wa = Window.orderBy("c", "key")
    ranked = kc.select(
        "key", "c",
        F.row_number().over(wd).alias("rnk"),
        F.row_number().over(wa).alias("rn_asc"),
    )
    gini = (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy("nk", "t")
        .agg(
            F.round(
                F.sum((2 * F.col("rn_asc") - F.col("nk") - 1) * F.col("c"))
                .cast("double")
                / (F.col("nk") * F.col("t"))
                * F.lit(1e6),
                0,
            ).cast("long").alias("g_fp")
        )
        .select("g_fp")
    )
    return (
        ranked.where(F.col("rnk") <= 10)
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(gini))
        .select(
            "rnk", "key", "c",
            F.round(F.col("c").cast("double") * F.lit(1e6) / F.col("t"), 0)
            .cast("long").alias("share_fp"),
            F.col("g_fp").alias("key_gini_fp"),
        )
    )


def _khop_sql(hops: int = 3, n_hosts: int = 50, links: int = 3) -> str:
    def dst(j: int) -> str:
        h = md5_int_sql(f"concat(doc_id::VARCHAR, ':{j}')")
        return f"({h} % {n_hosts})::BIGINT"

    link_union = " UNION ALL ".join(
        f"SELECT (doc_id % {n_hosts})::BIGINT AS src, {dst(j)} AS dst FROM documents"
        for j in range(links)
    )
    ctes = [
        f"edges AS (SELECT DISTINCT src, dst FROM ({link_union}) WHERE src != dst)",
        "s0 AS (SELECT unnest([0, 1])::BIGINT AS node)",
    ]
    for k in range(1, hops + 1):
        ctes.append(
            f"s{k} AS (SELECT DISTINCT node FROM (SELECT node FROM s{k-1} "
            f"UNION ALL SELECT e.dst FROM edges e JOIN s{k-1} p ON e.src = p.node))"
        )
    dist = "CASE " + " ".join(
        f"WHEN node IN (SELECT node FROM s{k}) THEN {k}"
        for k in range(hops + 1)
    ) + " END"
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, ({dist})::BIGINT AS dist FROM s{hops}"
    )


@query("khop_reach", _khop_sql())
def q_khop_reach(spark, sf_dir):
    """k-hop BFS reachability over the host link graph (seed hosts
    {0,1}, 3 hops) — the frontier-expansion primitive behind crawl
    scheduling and influence radius: each round joins the CURRENT
    frontier (small) against the edge table and anti-joins out the
    already-reached set, so per-round shuffle cost is frontier-sized,
    never graph-sized; distances are the round at which a node first
    appears (exact min-hop by construction). The oracle unrolls the
    same rounds as chained CTEs — same DAG, declarative form."""
    from .operators.graph import host_link_edges

    edges = host_link_edges(_docs(spark, sf_dir))
    reached = spark.createDataFrame(
        [(0, 0), (1, 0)], "node long, dist long"
    )
    frontier = reached.select("node")
    for k in range(1, 4):
        nxt = (
            edges.join(
                frontier.select(F.col("node").alias("src")), "src"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(reached.select("node"), "node", "left_anti")
            .select("node", F.lit(k).cast("long").alias("dist"))
        )
        nxt = nxt.localCheckpoint()
        reached = reached.unionAll(nxt)
        frontier = nxt.select("node")
    return reached.select("node", "dist")


@query(
    "mad_scale",
    """WITH f AS (
         SELECT doc_id, lang, length(trim(text))::BIGINT AS ql FROM documents),
       ranked AS (
         SELECT lang, ql,
                row_number() OVER (PARTITION BY lang ORDER BY ql, doc_id) AS rn,
                count(*) OVER (PARTITION BY lang) AS n
         FROM f),
       med AS (
         SELECT lang, max(n)::BIGINT AS n,
                max(CASE WHEN rn = (50 * n + 99) // 100 THEN ql END)::BIGINT
                  AS median_ql
         FROM ranked GROUP BY lang),
       dev AS (
         SELECT f.lang, abs(f.ql - m.median_ql) AS d, f.doc_id
         FROM f JOIN med m USING (lang)),
       dranked AS (
         SELECT lang, d,
                row_number() OVER (PARTITION BY lang ORDER BY d, doc_id) AS rn,
                count(*) OVER (PARTITION BY lang) AS n
         FROM dev)
       SELECT m.lang, m.n, m.median_ql,
              max(CASE WHEN dr.rn = (50 * dr.n + 99) // 100 THEN dr.d END)
                ::BIGINT AS mad
       FROM dranked dr JOIN med m USING (lang)
       GROUP BY m.lang, m.n, m.median_ql""",
)
def q_mad_scale(spark, sf_dir):
    """Median absolute deviation per group — the robust scale estimate
    that (unlike stddev) one outlier can't poison: median by exact
    rank selection (the winsorize/group_quantiles discipline), absolute
    deviations against the broadcast group medians, then a second rank
    selection for the MAD — all integer order statistics, nothing to
    interpolate. Both rank passes are keyed windows; the med dim is
    group-grain and broadcasts. Completes the robust trio: winsorize
    (clip), ecdf_normalize (rank transform), mad_scale (scale)."""
    d = _docs(spark, sf_dir)
    f = d.select("doc_id", "lang", T.text_length("text").cast("long").alias("ql"))
    wr = Window.partitionBy("lang").orderBy("ql", "doc_id")
    wall = Window.partitionBy("lang")
    ranked = f.select(
        "lang", "ql",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    med_rank = F.floor((50 * F.col("n") + 99) / 100)
    med = ranked.groupBy("lang").agg(
        F.max("n").cast("long").alias("n"),
        F.max(F.when(F.col("rn") == med_rank, F.col("ql")))
        .cast("long").alias("median_ql"),
    )
    dev = f.join(F.broadcast(med), "lang").select(
        "lang", "doc_id", F.abs(F.col("ql") - F.col("median_ql")).alias("d")
    )
    wd = Window.partitionBy("lang").orderBy("d", "doc_id")
    dranked = dev.select(
        "lang", "d",
        F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    mad_rank = F.floor((50 * F.col("n") + 99) / 100)
    mad = dranked.groupBy("lang").agg(
        F.max(F.when(F.col("rn") == mad_rank, F.col("d")))
        .cast("long").alias("mad")
    )
    return med.join(mad, "lang").select("lang", "n", "median_ql", "mad")


@query(
    "time_weighted_avg",
    """WITH base AS (
         SELECT user_id, epoch_us(ts) AS u, event_id,
                CAST(round(value * 100.0) AS BIGINT) AS c
         FROM events),
       held AS (
         SELECT user_id, c,
                (lead(u) OVER (PARTITION BY user_id ORDER BY u, event_id) - u)
                  // 1000000 AS dur_s
         FROM base)
       SELECT user_id, count(*)::BIGINT AS n_intervals,
              sum(dur_s)::BIGINT AS total_s,
              CAST(round(sum(c * dur_s)::DOUBLE * 10000.0 / sum(dur_s))
                   AS BIGINT) AS twap_fp
       FROM held WHERE dur_s IS NOT NULL AND dur_s > 0
       GROUP BY user_id""",
)
def q_time_weighted_avg(spark, sf_dir):
    """Time-weighted average (TWAP) per entity — the state's integral
    over time, not the per-event mean (an entity that held value 100
    for a month and 0 for a second should read ≈100): each observation
    is held until the next one (lead), weights are whole-second
    durations and values centi-scaled so Σ value·duration stays in
    int64 at any realistic per-entity history, one division rounded
    once. Zero-duration intervals (same-second bursts) drop —
    documented whole-second granularity. One sorted window pass +
    groupBy on the shared entity shuffle."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    base = ev.select(
        "user_id",
        epoch_micros(ev, "ts").alias("u"),
        "event_id",
        F.round(F.col("value") * F.lit(100.0), 0).cast("long").alias("c"),
    )
    w = Window.partitionBy("user_id").orderBy("u", "event_id")
    held = base.select(
        "user_id", "c",
        F.floor((F.lead("u").over(w) - F.col("u")) / F.lit(1_000_000))
        .alias("dur_s"),
    ).where(F.col("dur_s").isNotNull() & (F.col("dur_s") > 0))
    return held.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum("dur_s").cast("long").alias("total_s"),
        F.round(
            F.sum(F.col("c") * F.col("dur_s")).cast("double")
            * F.lit(1e4)
            / F.sum("dur_s"),
            0,
        ).cast("long").alias("twap_fp"),
    )


@query(
    "dense_counts",
    """WITH days AS (
         SELECT DISTINCT epoch_us(ts) // 86400000000 AS day FROM events),
       types AS (SELECT DISTINCT event_type FROM events),
       grid AS (SELECT d.day, t.event_type FROM days d CROSS JOIN types t),
       cnt AS (
         SELECT epoch_us(ts) // 86400000000 AS day, event_type,
                count(*)::BIGINT AS n
         FROM events GROUP BY 1, 2)
       SELECT g.day::BIGINT AS day, g.event_type,
              coalesce(c.n, 0)::BIGINT AS n
       FROM grid g LEFT JOIN cnt c
         ON c.day = g.day AND c.event_type = g.event_type""",
)
def q_dense_counts(spark, sf_dir):
    """Sparse→dense densification: the complete (day × type) grid with
    explicit zeros — what every charting/forecasting consumer needs
    (a missing combination is a ZERO, not an absent row; models
    trained on sparse counts silently skip the zeros that matter
    most). The spine is the cross product of two DISTINCT dims (tiny),
    the left join back fills gaps, and the fact table aggregates once
    map-side. Integer epoch days."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    day = F.floor(epoch_micros(ev, "ts") / F.lit(86_400_000_000)).alias("day")
    days = ev.select(day).distinct()
    types = ev.select("event_type").distinct()
    grid = days.crossJoin(F.broadcast(types))
    cnt = ev.groupBy(day, "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return grid.join(cnt, ["day", "event_type"], "left").select(
        F.col("day").cast("long").alias("day"),
        "event_type",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
    )


@query(
    "naive_bayes_lang",
    f"""WITH docs2 AS (
         SELECT doc_id, lang, list_distinct({_tok_sql()}) AS toks
         FROM documents),
       train AS (SELECT * FROM docs2 WHERE doc_id % 5 <> 0),
       test  AS (SELECT * FROM docs2 WHERE doc_id % 5 = 0),
       classes AS (
         SELECT lang AS c, count(*)::BIGINT AS n_docs FROM train GROUP BY lang),
       ntr AS (SELECT sum(n_docs) AS n FROM classes),
       tokc AS (
         SELECT t.token, tr.lang AS c, count(*)::BIGINT AS df
         FROM (SELECT doc_id, unnest(toks) AS token FROM train) t
         JOIN train tr USING (doc_id) GROUP BY 1, 2),
       vocab AS (SELECT count(DISTINCT token) AS v FROM tokc),
       llik AS (
         SELECT tok.token, cl.c,
                CAST(round(ln((coalesce(tc.df, 0) + 1.0)
                              / (cl.n_docs + 2.0)) * 1000000.0) AS BIGINT)
                  AS lp_fp
         FROM (SELECT DISTINCT token FROM tokc) tok
         CROSS JOIN classes cl
         LEFT JOIN tokc tc ON tc.token = tok.token AND tc.c = cl.c),
       scored AS (
         SELECT te.doc_id, te.lang, cl.c,
                CAST(round(ln(cl.n_docs::DOUBLE / ntr.n) * 1000000.0) AS BIGINT)
                + coalesce(sum(l.lp_fp), 0) AS score_fp
         FROM test te
         CROSS JOIN classes cl CROSS JOIN ntr
         LEFT JOIN (SELECT DISTINCT doc_id, unnest(toks) AS token FROM test) tt
           ON tt.doc_id = te.doc_id
         LEFT JOIN llik l ON l.token = tt.token AND l.c = cl.c
         GROUP BY te.doc_id, te.lang, cl.c, cl.n_docs, ntr.n),
       pred AS (
         SELECT doc_id, lang, c AS pred_lang, score_fp::BIGINT AS best_score_fp
         FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                 ORDER BY score_fp DESC, c DESC) AS rnk FROM scored)
         WHERE rnk = 1)
       SELECT doc_id, lang, pred_lang, best_score_fp,
              (lang = pred_lang) AS correct
       FROM pred""",
)
def q_naive_bayes_lang(spark, sf_dir):
    """Bernoulli Naive Bayes trained AND scored in one DAG with fully
    EXACT arithmetic: per-(token, class) Laplace log-likelihoods are
    rounded ONCE corpus-side to integer micro-nats, so every document
    score is an exact int64 SUM of small integers (float log-prob
    accumulation would be order-dependent — the whole reason NB is
    usually hard to bit-reproduce distributed). 80/20 hash split,
    class priors from a broadcast dim, prediction = argmax with a
    deterministic class tiebreak, per-doc correctness against truth.
    The trainable-classifier pattern (edu_classifier's learned cousin):
    token census → broadcast model → per-doc exact additive scoring."""
    d = _docs(spark, sf_dir)
    docs2 = d.select(
        "doc_id", "lang", F.array_distinct(T.tokenize(F.col("text"))).alias("toks")
    )
    train = docs2.where(F.col("doc_id") % 5 != 0)
    test = docs2.where(F.col("doc_id") % 5 == 0)
    classes = train.groupBy(F.col("lang").alias("c")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    ntr = classes.agg(F.sum("n_docs").alias("n"))
    tokc = (
        train.select("doc_id", F.col("lang").alias("c"), F.explode("toks").alias("token"))
        .groupBy("token", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    vocab_toks = tokc.select("token").distinct()
    llik = (
        vocab_toks.crossJoin(F.broadcast(classes))
        .join(tokc, ["token", "c"], "left")
        .select(
            "token", "c",
            F.round(
                F.log(
                    (F.coalesce(F.col("df"), F.lit(0)) + F.lit(1.0))
                    / (F.col("n_docs") + F.lit(2.0))
                )
                * F.lit(1e6),
                0,
            ).cast("long").alias("lp_fp"),
        )
    )
    tt = test.select("doc_id", F.explode("toks").alias("token")).distinct()
    prior = F.round(
        F.log(F.col("n_docs").cast("double") / F.col("n")) * F.lit(1e6), 0
    ).cast("long")
    scored = (
        test.select("doc_id", "lang")
        .crossJoin(F.broadcast(classes))
        .crossJoin(F.broadcast(ntr))
        .join(tt, "doc_id", "left")
        .join(llik, ["token", "c"], "left")
        .groupBy("doc_id", "lang", "c", "n_docs", "n")
        .agg(F.coalesce(F.sum("lp_fp"), F.lit(0)).alias("tok_fp"))
        .select(
            "doc_id", "lang", "c",
            (prior + F.col("tok_fp")).cast("long").alias("score_fp"),
        )
    )
    best = F.max(F.struct(F.col("score_fp"), F.col("c")))
    pred = scored.groupBy("doc_id", "lang").agg(
        best.getField("c").alias("pred_lang"),
        F.max("score_fp").cast("long").alias("best_score_fp"),
    )
    return pred.select(
        "doc_id", "lang", "pred_lang", "best_score_fp",
        (F.col("lang") == F.col("pred_lang")).alias("correct"),
    )


_SKIP_WIN = 2


@query(
    "skipgram_counts",
    f"""WITH toks AS (
         SELECT doc_id, {_tok_sql()} AS t FROM documents),
       pos AS (
         SELECT doc_id, t, unnest(range(len(t)))::BIGINT AS p FROM toks),
       pairs AS (
         SELECT lower(t[p + 1]) AS w, lower(t[p + 1 + o]) AS c
         FROM pos
         CROSS JOIN (SELECT unnest(range(1, {_SKIP_WIN + 1}))::BIGINT AS o)
         WHERE p + 1 + o <= len(t)),
       cnt AS (SELECT w, c, count(*)::BIGINT AS n FROM pairs GROUP BY 1, 2)
       SELECT w, c, n FROM cnt ORDER BY n DESC, w, c LIMIT 100""",
)
def q_skipgram_counts(spark, sf_dir):
    """Skip-gram co-occurrence census (window +{_SKIP_WIN}, the
    word2vec/GloVe preprocessing): context pairs come from ARRAY
    offsets — element_at against the token array per (position,
    offset), no self-join of an exploded table on doc & position
    (which would shuffle the corpus against itself); one groupBy with
    map-side partial counts, deterministic top-100. Directional pairs
    (left→right) so each unordered co-occurrence is counted exactly
    once per offset."""
    d = _docs(spark, sf_dir)
    toks = d.select(T.tokenize(F.col("text")).alias("t"))
    pos = toks.select(
        "t", F.posexplode(F.col("t")).alias("p", "_w")
    )
    offs = spark.range(1, _SKIP_WIN + 1).select(F.col("id").alias("o"))
    pairs = (
        pos.crossJoin(F.broadcast(offs))
        .where(F.col("p") + 1 + F.col("o") <= F.size("t"))
        .select(
            F.lower(F.element_at("t", (F.col("p") + 1).cast("int"))).alias("w"),
            F.lower(
                F.element_at("t", (F.col("p") + 1 + F.col("o")).cast("int"))
            ).alias("c"),
        )
    )
    cnt = pairs.groupBy("w", "c").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return cnt.orderBy(F.desc("n"), "w", "c").limit(100)


@query(
    "quantile_normalize",
    """WITH f AS (
         SELECT doc_id, lang, length(trim(text))::BIGINT AS ql FROM documents),
       grp AS (
         SELECT doc_id, lang, ql,
                row_number() OVER (PARTITION BY lang ORDER BY ql, doc_id) AS rn,
                count(*) OVER (PARTITION BY lang) AS n
         FROM f),
       pooled AS (
         SELECT ql AS pooled_ql,
                row_number() OVER (ORDER BY ql, doc_id) AS pr
         FROM f),
       ptot AS (SELECT count(*) AS pn FROM f),
       target AS (
         SELECT g.doc_id, g.lang, g.ql,
                greatest(1, (g.rn * ptot.pn + g.n - 1) // g.n) AS want
         FROM grp g CROSS JOIN ptot)
       SELECT t.doc_id, t.lang, t.ql, p.pooled_ql AS ql_qnorm
       FROM target t JOIN pooled p ON p.pr = t.want""",
)
def q_quantile_normalize(spark, sf_dir):
    """Quantile normalization — remap every group's values onto the
    POOLED distribution's order statistics (rank i of n in a group →
    the pooled value at ceil(i·N/n)), the microarray-era technique
    that makes per-source feature distributions directly comparable
    before mixing corpora: all integer rank arithmetic (the winsorize
    discipline), two rank passes plus an equi-join on the target rank
    — no interpolation, no float quantiles. The pooled rank table is
    value-grain; the global sort is the eval-table concession shared
    with ecdf/roc_auc."""
    d = _docs(spark, sf_dir)
    f = d.select("doc_id", "lang", T.text_length("text").cast("long").alias("ql"))
    wg = Window.partitionBy("lang").orderBy("ql", "doc_id")
    wng = Window.partitionBy("lang")
    grp = f.select(
        "doc_id", "lang", "ql",
        F.row_number().over(wg).alias("rn"),
        F.count(F.lit(1)).over(wng).alias("n"),
    )
    wp = Window.orderBy("ql", "doc_id")
    pooled = f.select(
        F.col("ql").alias("pooled_ql"), F.row_number().over(wp).alias("pr")
    )
    ptot = f.agg(F.count(F.lit(1)).alias("pn"))
    target = grp.crossJoin(F.broadcast(ptot)).select(
        "doc_id", "lang", "ql",
        F.greatest(
            F.lit(1),
            F.floor((F.col("rn") * F.col("pn") + F.col("n") - 1) / F.col("n")),
        ).alias("want"),
    )
    return target.join(pooled, target.want == pooled.pr).select(
        "doc_id", "lang", "ql", F.col("pooled_ql").alias("ql_qnorm")
    )


@query(
    "seasonality_strength",
    """WITH base AS (
         SELECT hour(ts) AS hod, CAST(round(value * 100.0) AS BIGINT) AS c
         FROM events),
       h AS (
         SELECT hod, count(*)::BIGINT AS n, sum(c) AS s, sum(c * c) AS ss
         FROM base GROUP BY hod),
       terms AS (
         SELECT CAST(round(s * s / n::DOUBLE) AS BIGINT) AS t_fp, n, s, ss
         FROM h),
       tot AS (
         SELECT sum(n) AS tn, sum(s) AS ts, sum(ss) AS tss,
                sum(t_fp) AS bsum_fp
         FROM terms)
       SELECT tn::BIGINT AS n,
              CAST(round(
                (bsum_fp - CAST(round(ts * ts / tn::DOUBLE) AS BIGINT))::DOUBLE
                / (tss - CAST(round(ts * ts / tn::DOUBLE) AS BIGINT))
                * 1000000.0) AS BIGINT) AS strength_fp
       FROM tot""",
)
def q_seasonality_strength(spark, sf_dir):
    """Seasonality strength = between-hour variance share of total
    variance (the one-way ANOVA R²): how much of the signal the
    hour-of-day profile explains — ≈0 means seasonal_profile's
    residuals carry everything, ≈1 means the clock IS the signal.
    Sufficient statistics per hour (count, Σc, Σc²) are exact int64;
    each s²/n term is rounded ONCE to an integer before summing (a
    float sum of the 24 terms would be accumulation-order-dependent
    across engines — the PSI/MI recipe applies to variance terms too),
    then the R² ratio is one rounded expression."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        F.hour("ts").alias("hod"),
        F.round(F.col("value") * F.lit(100.0), 0).cast("long").alias("c"),
    )
    h = base.groupBy("hod").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    terms = h.select(
        "n", "s", "ss",
        F.round(F.col("s") * F.col("s") / F.col("n").cast("double"), 0)
        .cast("long").alias("t_fp"),
    )
    tot = terms.agg(
        F.sum("n").alias("tn"),
        F.sum("s").alias("ts"),
        F.sum("ss").alias("tss"),
        F.sum("t_fp").alias("bsum_fp"),
    )
    grand = F.round(
        F.col("ts") * F.col("ts") / F.col("tn").cast("double"), 0
    ).cast("long")
    return tot.select(
        F.col("tn").cast("long").alias("n"),
        F.round(
            (F.col("bsum_fp") - grand).cast("double")
            / (F.col("tss") - grand)
            * F.lit(1e6),
            0,
        ).cast("long").alias("strength_fp"),
    )


@query(
    "revenue_hierarchy",
    """WITH rev AS (
         SELECT c.c_nationkey,
                sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) AS cents
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY c.c_nationkey),
       nat AS (
         SELECT n.n_name AS nation, r.r_name AS region, rev.cents
         FROM rev
         JOIN nation n ON n.n_nationkey = rev.c_nationkey
         JOIN region r ON r.r_regionkey = n.n_regionkey)
       SELECT region, nation, cents::BIGINT AS revenue_cents,
              CAST(round(cents::DOUBLE * 1000000.0
                         / sum(cents) OVER (PARTITION BY region)) AS BIGINT)
                AS share_of_region_fp,
              CAST(round(sum(cents) OVER (PARTITION BY region) * 1000000.0
                         / sum(cents) OVER ()) AS BIGINT)
                AS region_share_fp
       FROM nat""",
)
def q_revenue_hierarchy(spark, sf_dir):
    """Percent-of-parent hierarchy rollup (region → nation revenue
    shares, the drill-down report every BI layer renders): the fact
    join aggregates to nation grain FIRST (map-side partial sums of
    integer cents), then both share levels are window sums over the
    ≤25-row nation table — the dimension joins broadcast, the fact
    table shuffles once on the join key, and no percent is computed
    against un-aggregated data. Exact integer cents; shares rounded
    once."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cents = F.round(F.col("o_totalprice") * F.lit(100.0), 0).cast("long")
    rev = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == customer.c_custkey,
        )
        .groupBy("c_nationkey")
        .agg(F.sum(cents).alias("cents"))
    )
    nat = (
        rev.join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            rev.c_nationkey == nation.n_nationkey,
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            "cents",
        )
    )
    wr = Window.partitionBy("region")
    wall = Window.partitionBy()
    return nat.select(
        "region", "nation",
        F.col("cents").cast("long").alias("revenue_cents"),
        F.round(
            F.col("cents").cast("double") * F.lit(1e6) / F.sum("cents").over(wr), 0
        ).cast("long").alias("share_of_region_fp"),
        F.round(
            F.sum("cents").over(wr) * F.lit(1e6) / F.sum("cents").over(wall), 0
        ).cast("long").alias("region_share_fp"),
    )


@query(
    "median_impute",
    """WITH base AS (
         SELECT event_id, event_type,
                CASE WHEN event_id % 7 = 0 THEN NULL
                     ELSE CAST(round(value * 1000000.0) AS BIGINT) END AS v_fp
         FROM events),
       present AS (
         SELECT event_type, v_fp,
                row_number() OVER (PARTITION BY event_type
                                   ORDER BY v_fp, event_id) AS rn,
                count(*) OVER (PARTITION BY event_type) AS n
         FROM base WHERE v_fp IS NOT NULL),
       med AS (
         SELECT event_type,
                max(CASE WHEN rn = (50 * n + 99) // 100 THEN v_fp END)::BIGINT
                  AS med_fp
         FROM present GROUP BY event_type)
       SELECT b.event_id, b.event_type,
              coalesce(b.v_fp, m.med_fp)::BIGINT AS v_imputed_fp,
              (b.v_fp IS NULL) AS was_imputed
       FROM base b JOIN med m USING (event_type)""",
)
def q_median_impute(spark, sf_dir):
    """Group-median imputation with an explicit provenance flag — the
    standard missing-value fill that (unlike mean-fill) a skewed tail
    can't distort, and (unlike silent fills) downstream models can
    condition on `was_imputed`: medians by exact rank selection over
    the PRESENT values only (the winsorize discipline), broadcast back
    as a group-grain dim so imputation is a pure per-row map.
    Missingness is synthesized deterministically (event_id % 7) so
    the oracle replays the identical holes."""
    ev = _events(spark, sf_dir)
    v_fp = F.round(F.col("value") * F.lit(1e6), 0).cast("long")
    base = ev.select(
        "event_id", "event_type",
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("long"))
        .otherwise(v_fp).alias("v_fp"),
    )
    present = base.where(F.col("v_fp").isNotNull())
    wr = Window.partitionBy("event_type").orderBy("v_fp", "event_id")
    wall = Window.partitionBy("event_type")
    ranked = present.select(
        "event_type", "v_fp",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    med_rank = F.floor((50 * F.col("n") + 99) / 100)
    med = ranked.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == med_rank, F.col("v_fp")))
        .cast("long").alias("med_fp")
    )
    return base.join(F.broadcast(med), "event_type").select(
        "event_id", "event_type",
        F.coalesce(F.col("v_fp"), F.col("med_fp")).cast("long")
        .alias("v_imputed_fp"),
        F.col("v_fp").isNull().alias("was_imputed"),
    )


@query("rollup_multires", _rollup_sql())
def q_rollup_multires(spark, sf_dir):
    """Hour→day→week event rollup where every coarser level re-aggregates
    the level below it (raw scanned ONCE, DAG cut at the hour partials);
    the oracle computes all three levels directly from raw, so green
    equality proves the int64 partial-merge is exact
    (operators/rollup.multires_rollup)."""
    from pliers_spark.operators.rollup import multires_rollup

    return multires_rollup(_events(spark, sf_dir))


def _hash_split_sql() -> str:
    from pliers_spark.operators.sampling import hash_split_sql

    return hash_split_sql("documents", "doc_id", "doc_id, lang")


@query("hash_split", _hash_split_sql())
def q_hash_split(spark, sf_dir):
    """Deterministic train/valid/test split (98/1/1) by id hash — the
    reproducible-corpus-construction split convention (C4/The Pile): a
    pure projection (zero shuffle, no RNG), every row's split
    recomputable from its id alone (operators/sampling.hash_split)."""
    from pliers_spark.operators.sampling import hash_split

    return hash_split(_docs(spark, sf_dir).select("doc_id", "lang"), "doc_id")


def _rate_sample_sql() -> str:
    from pliers_spark.operators.sampling import rate_sample_sql

    return f"""WITH s AS ({rate_sample_sql('documents', 'doc_id', 250000, seed=3)})
       SELECT doc_id, lang, source FROM s"""


@query("rate_sample", _rate_sample_sql())
def q_rate_sample(spark, sf_dir):
    """Seeded Bernoulli-by-hash down-sampling gate (keep 25%): a plain
    deterministic filter that pushes below wide operators and is stable
    under task retries — the smoke-slice / ablation-corpus sampler
    (operators/sampling.rate_sample)."""
    from pliers_spark.operators.sampling import rate_sample

    return rate_sample(
        _docs(spark, sf_dir).select("doc_id", "lang", "source"), "doc_id", 250000, seed=3
    )


def _stratified_sql() -> str:
    from pliers_spark.operators.sampling import stratified_sample_sql

    return stratified_sample_sql("documents", ["lang", "source"], "doc_id", 5)


@query("stratified_sample", _stratified_sql())
def q_stratified_sample(spark, sf_dir):
    """Exact-k-per-stratum sample (5 per lang×source), winners = the k
    smallest (hash(id), id) per stratum — deterministic and
    layout-independent, unlike 'first k seen'. One shuffle on the
    strata key (operators/sampling.stratified_sample)."""
    from pliers_spark.operators.sampling import stratified_sample

    return stratified_sample(_docs(spark, sf_dir), ["lang", "source"], "doc_id", 5)


@query("mixture_sample", _mixture_sql())
def q_mixture_sample(spark, sf_dir):
    """Data-mixture balancing across the `source` column (equalize to
    the smallest group): group census → broadcast rates → narrow
    integer-hash filter; kept rows carry group/min weights. The corpus
    scan itself never shuffles (operators/curation.mixture_sample)."""
    from pliers_spark.operators.curation import mixture_sample

    return mixture_sample(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# batch 13: statistical-LM corpus scoring and repeated-span removal
# (operators/lm.py)


def _lm_score_sql() -> str:
    from pliers_spark.operators.lm import bigram_lm_score_sql

    return bigram_lm_score_sql()


@query("lm_score", _lm_score_sql())
def q_lm_score(spark, sf_dir):
    """CCNet-style statistical-LM document scoring: add-one-smoothed
    bigram LM trained on the corpus itself, per-doc average log-prob in
    exact integer micro-nats. Vocab is a distributed top-k (never a
    single-partition rank window), the model is a broadcast dimension,
    and the corpus shuffles only for the model agg and the per-doc
    reduction (operators/lm.py)."""
    from pliers_spark.operators.lm import bigram_lm_score

    return bigram_lm_score(_docs(spark, sf_dir))


def _ccnet_sql() -> str:
    from pliers_spark.operators.lm import ccnet_buckets_sql

    return ccnet_buckets_sql()


@query("ccnet_buckets", _ccnet_sql())
def q_ccnet_buckets(spark, sf_dir):
    """CCNet head/middle/tail corpus partitioning: per-language
    percent-rank over the bigram-LM score, thirds labeled
    head/middle/tail. The rank orders by the EXACT integer micro-nat
    sum (ties broken on doc_id), so bucket boundaries are deterministic
    across engines (operators/lm.py)."""
    from pliers_spark.operators.lm import ccnet_buckets

    return ccnet_buckets(_docs(spark, sf_dir))


def _chunk_dedup_sql() -> str:
    from pliers_spark.operators.lm import chunk_dedup_sql

    return chunk_dedup_sql()


@query("chunk_dedup", _chunk_dedup_sql())
def q_chunk_dedup(spark, sf_dir):
    """C4/Gopher-style repeated-span removal: census every 8-token span,
    drop spans occurring in >2 distinct docs (boilerplate), reassemble
    surviving spans in order. Census → small dropped set → broadcast
    LEFT ANTI join: the corpus never shuffles for the filter, only for
    the ordered per-doc reassembly (operators/lm.py)."""
    from pliers_spark.operators.lm import chunk_dedup

    return chunk_dedup(_docs(spark, sf_dir))


def _source_kl_sql() -> str:
    from pliers_spark.operators.curation import source_kl_sql

    return source_kl_sql()


@query("source_kl", _source_kl_sql())
def q_source_kl(spark, sf_dir):
    """Mixture diagnostics: per-source unigram KL divergence from the
    corpus distribution in exact integer micro-nats — the statistic
    data-mixture reweighting reads. One (source, word) census shuffle
    touches the corpus; everything downstream runs on the checkpointed
    census (operators/curation.py)."""
    from pliers_spark.operators.curation import source_kl

    return source_kl(_docs(spark, sf_dir))


def _kmeans_sql() -> str:
    from pliers_spark.operators.similarity import kmeans_assign_sql

    return kmeans_assign_sql()


@query("kmeans_assign", _kmeans_sql())
def q_kmeans_assign(spark, sf_dir):
    """IVF coarse-quantizer training primitive: one Lloyd assignment
    step over the embedding table with EXACT int64 micro-unit
    distances (no float accumulation — bit-stable by construction).
    Seeds broadcast; one Arrow-batched integer-matmul pass over the
    corpus, zero shuffle (operators/similarity.py)."""
    from pliers_spark.operators.similarity import kmeans_assign

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_assign(emb)


def _normalize_sql() -> str:
    from pliers_spark.operators.curation import normalize_text_sql

    return normalize_text_sql()


@query("text_normalize", _normalize_sql())
def q_text_normalize(spark, sf_dir):
    """Unicode/whitespace normalization — the entry pass of a crawl
    curation pipeline: NFC compose (Arrow-batched unicodedata, exactly
    DuckDB's nfc_normalize tables), control-char strip + horizontal
    whitespace collapse in JVM codegen. Narrow map, zero shuffle
    (operators/curation.py)."""
    from pliers_spark.operators.curation import normalize_text

    return normalize_text(_docs(spark, sf_dir))


def _kmeans_fit_sql() -> str:
    from pliers_spark.operators.similarity import kmeans_fit_sql

    return kmeans_fit_sql()


@query("kmeans_fit", _kmeans_fit_sql())
def q_kmeans_fit(spark, sf_dir):
    """Full IVF coarse-quantizer TRAINING: 3 Lloyd rounds in the MLlib
    shape — per-batch partial sums inside the Arrow worker (the shuffle
    carries k·(D+2)-row partials, never vectors), k×D centroid array on
    the driver between rounds, exact int64 micro-unit arithmetic
    throughout. The oracle replays the entire fit as UNROLLED
    relational algebra (operators/similarity.kmeans_fit_sql)."""
    from pliers_spark.operators.similarity import kmeans_fit

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_fit(emb)


def _bpe_sql() -> str:
    from pliers_spark.operators.bpe import bpe_learn_sql

    return bpe_learn_sql()


@query("bpe_learn", _bpe_sql())
def q_bpe_learn(spark, sf_dir):
    """Distributed BPE merge-rule TRAINING (Sennrich 2016): the corpus
    contributes one word-census shuffle; five merge rounds run entirely
    on the distinct-word symbol relation (pair census weighted by word
    frequency -> deterministic argmax -> greedy in-word merge via
    gaps-and-islands windows). All integers and strings - the oracle
    replays the whole fit as unrolled CTEs (operators/bpe.py)."""
    from pliers_spark.operators.bpe import bpe_learn

    return bpe_learn(_docs(spark, sf_dir))


def _bpe_encode_sql() -> str:
    from pliers_spark.operators.bpe import bpe_encode_counts_sql

    return bpe_encode_counts_sql()


@query("bpe_encode", _bpe_encode_sql())
def q_bpe_encode(spark, sf_dir):
    """Train-then-encode round trip: learn 5 BPE merges, then count
    every document's subword tokens under the learned tokenizer. The
    per-word subword count is a broadcast dimension, so encoding is a
    narrow explode + broadcast join + per-doc reduction — the token
    budget that feeds sequence_pack (operators/bpe.py)."""
    from pliers_spark.operators.bpe import bpe_encode_counts

    return bpe_encode_counts(_docs(spark, sf_dir))


def _ivf_mp_sql() -> str:
    from pliers_spark.operators.similarity import ivf_multiprobe_topk_sql

    return ivf_multiprobe_topk_sql()


@query("ivf_multiprobe", _ivf_mp_sql())
def q_ivf_multiprobe(spark, sf_dir):
    """End-to-end IVF ANN over the TRAINED coarse quantizer: corpus
    bucketed by kmeans_assign, each query probes its 2 nearest
    centroids (exact int64 centroid ranking), cosine top-5 over the
    probed buckets only — candidates shrink ~k/nprobe vs brute force
    (operators/similarity.ivf_multiprobe_topk)."""
    from pliers_spark.operators.similarity import ivf_multiprobe_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_multiprobe_topk(emb)


@query(
    "domain_cap",
    f"""WITH r AS (
         SELECT doc_id, source,
                row_number() OVER (
                  PARTITION BY source
                  ORDER BY {md5_int_sql('text', seed=31)} % 1000000, doc_id) AS rk
         FROM documents)
       SELECT doc_id, source, rk::BIGINT AS rank_in_domain FROM r WHERE rk <= 50""",
)
def q_domain_cap(spark, sf_dir):
    """FineWeb-style per-domain cap: keep at most 50 docs per source,
    chosen by a deterministic content-hash lottery (retry-stable, no
    rand()) with id tie-break — the anti-overrepresentation pass that
    stops one boilerplate-heavy domain from dominating the mixture.
    One rank window per domain partition."""
    d = _docs(spark, sf_dir)
    ticket = F.pmod(md5_int(F.col("text"), seed=31), F.lit(1_000_000))
    w = Window.partitionBy("source").orderBy(ticket, "doc_id")
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rank_in_domain"))
        .where(F.col("rank_in_domain") <= 50)
        .select("doc_id", "source", F.col("rank_in_domain").cast("long").alias("rank_in_domain"))
    )


def _lang_confusion_sql() -> str:
    return f"""WITH li AS ({_langid_sql()})
       SELECT d.lang, li.lang_pred, count(*)::BIGINT AS n
       FROM li JOIN documents d USING (doc_id)
       GROUP BY d.lang, li.lang_pred"""


@query("lang_confusion", _lang_confusion_sql())
def q_lang_confusion(spark, sf_dir):
    """Language-ID quality evaluation: confusion matrix of the labeled
    lang column vs the heuristic predictor — the acceptance gate a
    curation pipeline runs before trusting langid-based filtering.
    Reuses the langid stage; one small groupBy after a narrow map."""
    li = q_langid(spark, sf_dir).select("doc_id", "lang_pred")
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    return d.join(li, "doc_id").groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).alias("n")
    )


# --------------------------------------------------------------------------
# §2.1 multimodal binary payloads: REAL codec round trips, driver-oracled
#
# The testdata tables carry no binary column, so each query synthesises
# its payloads from doc_id with a closed-form pixel/sample formula,
# encodes them with the real container codec (pliers_spark.codecs),
# and runs the production decode → feature stage on the bytes. The
# DuckDB oracle recomputes the same features from the generating
# formula directly — so a green row certifies the encode → decode →
# extract path end-to-end (any codec bug breaks the match). In
# production the payload column comes off the table scan instead; the
# mapInPandas stages are identical.


def _synth_payloads(spark, sf_dir, build):
    """(doc_id → bytes) over documents as an `id, payload` DataFrame.

    Deterministic per-row generation inside mapInPandas — distributed,
    no driver materialisation, stand-in for a real binary column scan."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"id": pdf["doc_id"].astype("int64"),
                 "payload": [build(int(d)) for d in pdf["doc_id"]]}
            )

    return (
        _docs(spark, sf_dir)
        .select("doc_id")
        .mapInPandas(fn, schema="id long, payload binary")
    )


def _synth_image(did: int, h: int = 8, w: int = 8, fk: int = 0) -> "np.ndarray":
    """pixel(r,c,ch) = (did*131 + fk*101 + r*17 + c*5 + ch*29) % 256."""
    import numpy as np

    r = np.arange(h)[:, None, None]
    c = np.arange(w)[None, :, None]
    ch = np.arange(3)[None, None, :]
    return ((did * 131 + fk * 101 + r * 17 + c * 5 + ch * 29) % 256).astype(np.uint8)


_IMG_PX = "(doc_id*131 + r.r*17 + c.c*5 + {ch})"


@query(
    "image_decode_stats",
    f"""WITH px AS (
         SELECT d.doc_id,
                GREATEST({_IMG_PX.format(ch=0)} % 256,
                         {_IMG_PX.format(ch=29)} % 256,
                         {_IMG_PX.format(ch=58)} % 256) AS mx
         FROM documents d, generate_series(0,7) r(r), generate_series(0,7) c(c))
       SELECT doc_id, CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
              CAST(3 AS INTEGER) AS channels,
              (SUM(mx)::DOUBLE / 64) / 255 AS mean_brightness
       FROM px GROUP BY doc_id""",
)
def q_image_decode_stats(spark, sf_dir):
    """BrightnessExtractor over a REAL PPM encode→decode round trip
    (pliers/extractors/image.py:26-38; decode = pliers_spark.codecs):
    8x8 formula images → P6 bytes → production image_stats stage.
    mean_brightness = mean(max over channels)/255 is exact: integer
    pixel sums, then /64 (power of two) and one /255 — bit-identical
    on both engines. Arrow-batched, payloads never leave executors."""
    from pliers_spark import codecs, multimodal

    payloads = _synth_payloads(
        spark, sf_dir, lambda did: codecs.encode_ppm(_synth_image(did))
    )
    return multimodal.image_stats(payloads).withColumnRenamed("id", "doc_id")


_PNG_PX = "(doc_id*173 + r.r*19 + c.c*7 + {ch})"


@query(
    "png_decode_stats",
    f"""WITH px AS (
         SELECT d.doc_id,
                GREATEST({_PNG_PX.format(ch=0)} % 256,
                         {_PNG_PX.format(ch=31)} % 256,
                         {_PNG_PX.format(ch=62)} % 256) AS mx
         FROM documents d, generate_series(0,8) r(r), generate_series(0,6) c(c))
       SELECT doc_id, CAST(7 AS INTEGER) AS width, CAST(9 AS INTEGER) AS height,
              CAST(3 AS INTEGER) AS channels,
              (SUM(mx)::DOUBLE / 63) / 255 AS mean_brightness
       FROM px GROUP BY doc_id""",
)
def q_png_decode_stats(spark, sf_dir):
    """BrightnessExtractor over a REAL PNG encode→decode round trip
    (pliers/extractors/image.py:26-38; pliers loads PNGs via imageio —
    here the engine's own stdlib-zlib codec, pliers_spark.codecs
    encode_png/decode_png): 9x7 formula images → DEFLATE-compressed,
    Up-filtered scanlines → production image_stats stage. A green row
    certifies chunk framing, zlib round trip, and filter reconstruction
    end-to-end: any codec bug changes the pixels and breaks the exact
    integer pixel-sum the oracle recomputes relationally. 63 pixels →
    one int-sum / 63 / 255 double division chain, identical on both
    engines (numpy integer mean is an exact int sum, then the same two
    IEEE divisions)."""
    import numpy as np

    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        r = np.arange(9)[:, None, None]
        c = np.arange(7)[None, :, None]
        ch = np.arange(3)[None, None, :]
        img = ((did * 173 + r * 19 + c * 7 + ch * 31) % 256).astype(np.uint8)
        return codecs.encode_png(img)

    payloads = _synth_payloads(spark, sf_dir, build)
    return multimodal.image_stats(payloads).withColumnRenamed("id", "doc_id")


def _video_motion_sql() -> str:
    """Relational replay of block-matching motion over the formula
    frames: gray(r,c) for a frame with cyclic shift (sy,sx) is the sum
    of the three channel formulas at the unshifted coordinates; the
    argmin over the 25 candidate displacements uses the same
    (sad, dy, dx) tie order as the engine."""

    def gray(r: str, c: str, shift_k: str) -> str:
        # frame shift: sy = ((doc_id + 2*k)%3) - 1, sx = ((doc_id + k)%3) - 1
        rr = f"(({r}) - ((doc_id + 2*({shift_k})) % 3) + 1 + 32) % 8"
        cc = f"(({c}) - ((doc_id + ({shift_k})) % 3) + 1 + 32) % 8"
        return " + ".join(
            f"((doc_id*131 + ({rr})*17 + ({cc})*5 + {ch}) % 256)" for ch in (0, 29, 58)
        )

    g1 = gray("r.r", "c.c", "k.k")
    g0 = gray("r.r - dy.dy", "c.c - dx.dx", "k.k - 1")
    return f"""WITH sad AS (
  SELECT d.doc_id, k.k, dy.dy, dx.dx,
         SUM(ABS(({g1}) - ({g0})))::BIGINT AS sad
  FROM documents d,
       generate_series(1,3) k(k),
       generate_series(-2,2) dy(dy), generate_series(-2,2) dx(dx),
       generate_series(0,7) r(r), generate_series(0,7) c(c)
  GROUP BY 1, 2, 3, 4),
best AS (
  SELECT doc_id, k, dy, dx, sad,
         row_number() OVER (PARTITION BY doc_id, k ORDER BY sad, dy, dx) AS rn
  FROM sad)
SELECT doc_id, k::INTEGER AS frame, dy::BIGINT AS dy, dx::BIGINT AS dx, sad
FROM best WHERE rn = 1"""


@query("video_motion", _video_motion_sql())
def q_video_motion(spark, sf_dir):
    """Motion estimation per consecutive frame pair — the
    FarnebackOpticalFlowExtractor role (pliers/extractors/video.py:
    21-87) recast as exhaustive block matching (argmin-SAD over
    ±2-pixel cyclic displacements, integer grayscale R+G+B): 4
    formula frames per doc, each a cyclically shifted copy of the
    doc's base image with a known per-frame shift, encoded as REAL
    PPM bytes → production multimodal.video_motion stage. The oracle
    replays the full 25-candidate argmin relationally, so a green row
    certifies decode + displacement search end-to-end; the recovered
    (dy, dx) equals the known inter-frame shift wherever the shifted
    images are unambiguous."""
    import numpy as np

    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        base = _synth_image(did)
        out = []
        for k in range(4):
            sy = ((did + 2 * k) % 3) - 1
            sx = ((did + k) % 3) - 1
            out.append(codecs.encode_ppm(np.roll(base, (sy, sx), axis=(0, 1))))
        return b"".join(out)

    frame_bytes = len("P6\n8 8\n255\n") + 8 * 8 * 3
    payloads = _synth_payloads(spark, sf_dir, build)
    return multimodal.video_motion(
        payloads, frame_bytes=frame_bytes, search=2
    ).withColumnRenamed("id", "doc_id")


_WAV_S = "((d.doc_id*7919 + (k.k*64+t.t)*104729) % 65536) - 32768"


@query(
    "wav_frame_stats",
    f"""WITH s AS (
         SELECT d.doc_id, k.k, t.t, {_WAV_S} AS v
         FROM documents d, generate_series(0,2) k(k), generate_series(0,127) t(t)),
       w AS (
         SELECT doc_id, k, t, v,
                lag(v) OVER (PARTITION BY doc_id, k ORDER BY t) AS pv
         FROM s)
       SELECT doc_id, k::INTEGER AS frame,
              (k*64)/8000.0 AS onset, 128/8000.0 AS duration,
              SUM(v*v)::BIGINT AS sum_sq,
              SUM(abs(v))::BIGINT AS sum_abs,
              SUM(CASE WHEN pv IS NOT NULL AND ((pv >= 0) <> (v >= 0))
                       THEN 1 ELSE 0 END)::BIGINT AS n_crossings
       FROM w GROUP BY doc_id, k""",
)
def q_wav_frame_stats(spark, sf_dir):
    """Framed RMS-energy/ZCR over a REAL RIFF/WAVE round trip
    (pliers/extractors/audio.py:216-265 surface): 300 formula PCM16
    samples per doc → WAV bytes → production wav_frame_stats stage
    (frame=128, hop=64 → 3 overlapping frames/doc). All features are
    exact integers; onset/duration are single int/int divisions —
    bit-identical on both engines."""
    import numpy as np

    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        i = np.arange(300, dtype=np.int64)
        v = ((did * 7919 + i * 104729) % 65536) - 32768
        return codecs.encode_wav_int16(v, sr=8000)

    payloads = _synth_payloads(spark, sf_dir, build)
    return multimodal.wav_frame_stats(
        payloads, frame=128, hop=64
    ).withColumnRenamed("id", "doc_id")


_VID_PX = "(doc_id*131 + k.k*101 + r.r*17 + c.c*5 + {ch})"


@query(
    "video_frame_sample",
    f"""WITH px AS (
         SELECT d.doc_id, k.k,
                GREATEST({_VID_PX.format(ch=0)} % 256,
                         {_VID_PX.format(ch=29)} % 256,
                         {_VID_PX.format(ch=58)} % 256) AS mx
         FROM documents d, generate_series(0,9) k(k),
              generate_series(0,3) r(r), generate_series(0,3) c(c)
         WHERE k.k % 3 = 0)
       SELECT doc_id, k::BIGINT AS frame, k/30.0 AS onset,
              CAST(4 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
              (SUM(mx)::DOUBLE / 16) / 255 AS mean_brightness
       FROM px GROUP BY doc_id, k""",
)
def q_video_frame_sample(spark, sf_dir):
    """FrameSamplingFilter(every=3) + per-frame brightness over a REAL
    multi-frame binary payload (pliers/filters/video.py:19-53,
    pliers/stimuli/video.py:12-37): 10 fixed-size 4x4 P6 frame records
    per doc (59 bytes each) → production video_frame_sample stage,
    which decodes ONLY the sampled offsets (selective decode, the lazy
    get_frame contract). onset = k/30.0 and the exact-integer
    brightness match bit-for-bit."""
    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        return b"".join(
            codecs.encode_ppm(_synth_image(did, h=4, w=4, fk=k)) for k in range(10)
        )

    payloads = _synth_payloads(spark, sf_dir, build)
    return multimodal.video_frame_sample(
        payloads, every=3, fps=30.0, frame_bytes=59
    ).withColumnRenamed("id", "doc_id")


_RS_PX = "(doc_id*131 + ((ty.ty*8)//3)*17 + ((tx.tx*8)//5)*5 + {ch})"


@query(
    "image_resize",
    f"""WITH px AS (
         SELECT d.doc_id,
                GREATEST({_RS_PX.format(ch=0)} % 256,
                         {_RS_PX.format(ch=29)} % 256,
                         {_RS_PX.format(ch=58)} % 256) AS mx
         FROM documents d, generate_series(0,2) ty(ty), generate_series(0,4) tx(tx))
       SELECT doc_id, CAST(5 AS INTEGER) AS width, CAST(3 AS INTEGER) AS height,
              CAST(3 AS INTEGER) AS channels,
              (SUM(mx)::DOUBLE / 15) / 255 AS mean_brightness
       FROM px GROUP BY doc_id""",
)
def q_image_resize(spark, sf_dir):
    """ImageResizingFilter (pliers/filters/image.py:46) over a REAL BMP
    encode→decode round trip: 8x8 formula images → 24bpp BI_RGB bytes →
    production image_resize_stats stage (nearest-neighbor to 5x3). The
    oracle recomputes the sampled source indices relationally
    (r = ty*8//3, c = tx*8//5) — a green row certifies the BMP codec
    (bottom-up BGR rows, 4-byte padding) and the resampling index math
    bit-for-bit."""
    from pliers_spark import codecs, multimodal

    payloads = _synth_payloads(
        spark, sf_dir, lambda did: codecs.encode_bmp(_synth_image(did))
    )
    return multimodal.image_resize_stats(
        payloads, target_w=5, target_h=3
    ).withColumnRenamed("id", "doc_id")


_CR_PX = "((doc_id*131 + r.r*17 + c.c*5 + {ch}) % 255) + 1"


@query(
    "image_autocrop",
    f"""WITH px AS (
         SELECT d.doc_id, (d.doc_id % 3) AS b,
                GREATEST({_CR_PX.format(ch=0)},
                         {_CR_PX.format(ch=29)},
                         {_CR_PX.format(ch=58)}) AS mx
         FROM documents d, generate_series(0,7) r(r), generate_series(0,7) c(c)
         WHERE r.r >= (d.doc_id % 3) AND r.r < 8 - (d.doc_id % 3)
           AND c.c >= (d.doc_id % 3) AND c.c < 8 - (d.doc_id % 3))
       SELECT doc_id,
              CAST(8 - 2*b AS INTEGER) AS width, CAST(8 - 2*b AS INTEGER) AS height,
              CAST(b AS INTEGER) AS x0, CAST(b AS INTEGER) AS y0,
              CAST(8 - b AS INTEGER) AS x1, CAST(8 - b AS INTEGER) AS y1,
              (SUM(mx)::DOUBLE / ((8 - 2*b) * (8 - 2*b))) / 255 AS mean_brightness
       FROM px GROUP BY doc_id, b""",
)
def q_image_autocrop(spark, sf_dir):
    """ImageCroppingFilter auto-trim (pliers/filters/image.py:18-43, the
    PIL getbbox recast): formula images with a doc_id%3-wide black
    border and strictly nonzero interior (pixel = f%255 + 1) → PPM →
    production image_crop_stats(box=None). The oracle derives the
    exclusive-right/lower bbox and post-crop brightness from the border
    formula directly — certifying the nonzero-scan, the PIL bbox
    convention, and the crop slice bit-for-bit."""
    import numpy as np

    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        # raw formula % 255 + 1 (NOT the %256-reduced _synth_image pixel:
        # (x % 256) % 255 differs from x % 255 — the oracle uses the latter)
        r = np.arange(8)[:, None, None]
        c = np.arange(8)[None, :, None]
        ch = np.arange(3)[None, None, :]
        img = (((did * 131 + r * 17 + c * 5 + ch * 29) % 255) + 1).astype(np.uint8)
        b = did % 3
        full = np.zeros((8, 8, 3), dtype=np.uint8)
        if b == 0:
            full = img
        else:
            full[b:-b, b:-b] = img[b:-b, b:-b]
        return codecs.encode_ppm(full)

    payloads = _synth_payloads(spark, sf_dir, build)
    return multimodal.image_crop_stats(payloads, box=None).withColumnRenamed("id", "doc_id")


_DH_BASE = "(((d.doc_id % 37)*131 + ((ty.ty*8)//7)*17 + ((tx.tx*8)//9)*5 + {ch}) % 200)"


@query(
    "image_dhash_dups",
    f"""WITH lum AS (
         SELECT d.doc_id, ty.ty AS r, tx.tx AS c,
                299*{_DH_BASE.format(ch=0)} + 587*{_DH_BASE.format(ch=29)}
              + 114*{_DH_BASE.format(ch=58)} AS lum
         FROM documents d, generate_series(0,6) ty(ty), generate_series(0,8) tx(tx)),
       bits AS (
         SELECT doc_id, r, c,
                CASE WHEN lum > lead(lum) OVER (PARTITION BY doc_id, r ORDER BY c)
                     THEN 1 ELSE 0 END AS b
         FROM lum),
       h AS (
         SELECT doc_id,
                SUM(b * (1::BIGINT << (r*8 + c)))::BIGINT AS dhash
         FROM bits WHERE c < 8 GROUP BY doc_id)
       SELECT doc_id, dhash,
              CAST(count(*) OVER (PARTITION BY dhash) AS BIGINT) AS group_size,
              CAST(CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY dhash)
                        THEN 1 ELSE 0 END AS BIGINT) AS keep
       FROM h""",
)
def q_image_dhash_dups(spark, sf_dir):
    """Perceptual image dedup over a REAL PPM round trip: each doc's
    payload is a brightness-shifted copy of one of 37 base patterns
    (pixel = base(doc_id % 37) + (doc_id*7) % 50, clip-free), so dHash
    — invariant to the uniform shift — collides exactly the docs that
    share a base image even though their payload BYTES all differ.
    Production image_dhash stage (decode → 9×7 resample → integer luma
    → 56 packed comparison bits), then one window over the hash for
    group_size + min-id keep flag — the image twin of dedup_exact
    (pliers has no image dedup; the decode surface is
    pliers/stimuli/image.py:10-40). The oracle recomputes luma
    relationally WITHOUT the per-doc offset — it cancels in every
    adjacent comparison, which is exactly the invariance the hash
    claims; bits and packing are exact integers, bit-identical on both
    engines."""
    import numpy as np

    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        r = np.arange(8)[:, None, None]
        c = np.arange(8)[None, :, None]
        ch = np.arange(3)[None, None, :]
        base = ((did % 37) * 131 + r * 17 + c * 5 + ch * 29) % 200
        return codecs.encode_ppm((base + (did * 7) % 50).astype(np.uint8))

    payloads = _synth_payloads(spark, sf_dir, build)
    h = multimodal.image_dhash(payloads).withColumnRenamed("id", "doc_id")
    w = Window.partitionBy("dhash")
    return h.select(
        "doc_id",
        "dhash",
        F.count(F.lit(1)).over(w).cast("long").alias("group_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).cast("long").alias("keep"),
    )


_SB_PX = "(doc_id*131 + (k.k//4)*101 + r.r*17 + c.c*5 + {ch})"


@query(
    "shot_boundaries",
    f"""WITH px AS (
         SELECT d.doc_id, k.k,
                GREATEST({_SB_PX.format(ch=0)} % 256,
                         {_SB_PX.format(ch=29)} % 256,
                         {_SB_PX.format(ch=58)} % 256) AS mx
         FROM documents d, generate_series(0,11) k(k),
              generate_series(0,3) r(r), generate_series(0,3) c(c)),
       b AS (
         SELECT doc_id, k, (SUM(mx)::DOUBLE / 16) / 255 AS br
         FROM px GROUP BY doc_id, k)
       SELECT doc_id, k::BIGINT AS frame, k/30.0 AS onset,
              CAST(CASE WHEN lag(br) OVER (PARTITION BY doc_id ORDER BY k) IS NOT NULL
                         AND br <> lag(br) OVER (PARTITION BY doc_id ORDER BY k)
                        THEN 1 ELSE 0 END AS BIGINT) AS is_cut
       FROM b""",
)
def q_shot_boundaries(spark, sf_dir):
    """Shot-boundary (scene-cut) detection over a REAL multi-frame
    binary payload: 12 fixed-size 4×4 P6 frames per doc in 3 scenes of
    4 (frame k's pixels keyed by k//4), production video_frame_sample
    stage decoding EVERY frame (every=1), then one lag window per doc
    comparing consecutive frame brightness — a cut is any change. This
    is the frame-differencing core of scene detection feeding
    FrameSamplingFilter-style curation (pliers/filters/video.py:19-53
    samples; here we detect). Brightness is the exact-integer
    Σmax/16/255 double on both engines, so the equality comparison is
    deterministic; cuts land at k=4 and k=8 wherever the scene sums
    differ. One narrow mapInPandas + one window shuffle on doc_id."""
    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        return b"".join(
            codecs.encode_ppm(_synth_image(did, h=4, w=4, fk=k // 4)) for k in range(12)
        )

    payloads = _synth_payloads(spark, sf_dir, build)
    vs = multimodal.video_frame_sample(payloads, every=1, fps=30.0, frame_bytes=59)
    w = Window.partitionBy("id").orderBy("frame")
    prev = F.lag("mean_brightness").over(w)
    return vs.select(
        F.col("id").alias("doc_id"),
        "frame",
        "onset",
        F.when(prev.isNotNull() & (F.col("mean_brightness") != prev), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_cut"),
    )


@query(
    "audio_fp_dups",
    """WITH s AS (
         SELECT d.doc_id, k.k, t.t,
                ((((d.doc_id % 41)*7919 + (k.k*32 + t.t)*104729) % 200) - 100)
                * (1 + (d.doc_id % 4)) AS v
         FROM documents d, generate_series(0,16) k(k), generate_series(0,63) t(t)),
       e AS (
         SELECT doc_id, k, SUM(v*v)::BIGINT AS e
         FROM s GROUP BY doc_id, k),
       b AS (
         SELECT doc_id, k,
                CASE WHEN e > lag(e) OVER (PARTITION BY doc_id ORDER BY k)
                     THEN 1 ELSE 0 END AS bit
         FROM e),
       h AS (
         SELECT doc_id, SUM(bit * (1::BIGINT << (k - 1)))::BIGINT AS afp
         FROM b WHERE k >= 1 GROUP BY doc_id)
       SELECT doc_id, afp,
              CAST(count(*) OVER (PARTITION BY afp) AS BIGINT) AS group_size,
              CAST(CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY afp)
                        THEN 1 ELSE 0 END AS BIGINT) AS keep
       FROM h""",
)
def q_audio_fp_dups(spark, sf_dir):
    """Audio-level dedup over a REAL RIFF/WAVE round trip: each doc's
    clip is one of 41 base recordings under a per-doc integer gain
    (sample = base(doc_id % 41) · (1 + doc_id % 4), |v| ≤ 400 so PCM16
    never clips), so the gain-invariant energy fingerprint collides
    exactly the docs that share a recording even though their payload
    BYTES differ. Production audio_fingerprint stage (decode → 17
    overlapping frame energies, frame=64/hop=32 → 16 packed
    comparison bits), then one window over the hash — the audio twin
    of dedup_exact / image_dhash_dups. All integers; bit-identical on
    both engines."""
    import numpy as np

    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        i = np.arange(600, dtype=np.int64)
        v = ((((did % 41) * 7919 + i * 104729) % 200) - 100) * (1 + did % 4)
        return codecs.encode_wav_int16(v, sr=8000)

    payloads = _synth_payloads(spark, sf_dir, build)
    h = multimodal.audio_fingerprint(payloads, frame=64, hop=32).withColumnRenamed("id", "doc_id")
    w = Window.partitionBy("afp")
    return h.select(
        "doc_id",
        "afp",
        F.count(F.lit(1)).over(w).cast("long").alias("group_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).cast("long").alias("keep"),
    )


def _chroma_cqt_sql() -> str:
    from pliers_spark.functions.audio_features import chroma_cqt_sql

    return chroma_cqt_sql()


@query("chroma_cqt", _chroma_cqt_sql())
def q_chroma_cqt(spark, sf_dir):
    """ChromaCQTExtractor role (pliers/extractors/audio.py:386-397):
    log-spaced constant-Q kernel projections (literal Hann·cos/sin
    weights, equal-temperament centers) folded onto pitch classes,
    max-normalized per frame. 100% built-in: shared position-pivot
    framing, then fused multiply-adds in whole-stage codegen — no FFT,
    no UDF."""
    from pliers_spark.functions.audio_features import chroma_cqt

    return chroma_cqt(_events(spark, sf_dir))


def _chroma_cens_sql() -> str:
    from pliers_spark.functions.audio_features import chroma_cens_sql

    return chroma_cens_sql()


@query("chroma_cens", _chroma_cens_sql())
def q_chroma_cens(spark, sf_dir):
    """ChromaCENSExtractor role (pliers/extractors/audio.py:386-397
    variant; Müller & Ewert 2011): CQT chroma → L1-normalize → published
    0.25-step quantization → ±1-frame smoothing (zero-padded window SUM
    / 3) → per-frame L2 normalization. Quantized values are exact
    multiples of 0.25, so the smoothing sums are order-independent —
    the window stage reuses the pivot agg's (entity, frame) shuffle."""
    from pliers_spark.functions.audio_features import chroma_cens

    return chroma_cens(_events(spark, sf_dir))


def _tonnetz_sql() -> str:
    from pliers_spark.functions.audio_features import tonnetz_sql

    return tonnetz_sql()


@query("tonnetz", _tonnetz_sql())
def q_tonnetz(spark, sf_dir):
    """TonnetzExtractor (pliers/extractors/audio.py:399-407): 6-D tonal
    centroid projection (circles of fifths / minor thirds / major
    thirds, literal sin/cos basis) of the L1-normalized CQT chroma —
    one more Column stage over the same framing, still zero UDFs."""
    from pliers_spark.functions.audio_features import tonnetz

    return tonnetz(_events(spark, sf_dir))


def _beat_track_sql() -> str:
    from pliers_spark.functions.audio_features import spectral_flux_sql
    from pliers_spark.functions.spectral import stft_power_sql
    from pliers_spark.operators.beat import beat_track_sql

    return beat_track_sql(spectral_flux_sql(stft_power_sql()))


@query("beat_track", _beat_track_sql())
def q_beat_track(spark, sf_dir):
    """BeatTrackExtractor (pliers/extractors/audio.py:286-301; Ellis
    2007 DP) in the exact-integer variant: onset strength = spectral
    flux in micro-units, forward DP with a quadratic integer penalty,
    deterministic-tie backtrack. Per-entity grouped map — parallel
    across series, O(T*W) within one; the oracle replays the identical
    DP as a DuckDB recursive CTE."""
    from pliers_spark.functions.audio_features import spectral_flux
    from pliers_spark.functions.spectral import stft_power_frames
    from pliers_spark.operators.beat import beat_track

    frames = stft_power_frames(
        _events(spark, sf_dir), "user_id", "ts", "value",
        order_cols=["ts", "event_id"],
    )
    return beat_track(spectral_flux(frames))


# (_URL_*_SQL constants are defined near _tok_sql, used by several queries)


@query(
    "url_features",
    f"""WITH u AS (
         SELECT doc_id, {_URL_SYNTH_SQL} AS url FROM documents)
       SELECT doc_id, url,
              {_URL_HOST_SQL} AS host,
              regexp_extract({_URL_HOST_SQL}, '([^.]+\\.[^.]+)$', 1) AS domain,
              {_URL_PATH_SQL} AS path,
              (len(string_split({_URL_PATH_SQL}, '/')) - 1)::BIGINT AS path_depth,
              (url LIKE 'https://%') AS is_https
       FROM u""",
)
def q_url_features(spark, sf_dir):
    """URL structure features (crawl-partitioning input; SURVEY §2.1
    url row): host/domain/path-depth/https over JVM ``parse_url`` —
    whole-stage codegen, zero Python, URL synthesis itself is pure
    Column concat over doc_id so the oracle regenerates identical
    strings and parses them relationally."""
    from pliers_spark.pages_pipeline import url_features

    d = _docs(spark, sf_dir).select("doc_id")
    did = F.col("doc_id")
    url = F.concat(
        F.when(did % 2 == 1, F.lit("https://")).otherwise(F.lit("http://")),
        F.lit("www.site"), (did % 50).cast("string"),
        F.lit(".example"), (did % 7).cast("string"),
        F.lit(".com/sec"), (did % 5).cast("string"),
        F.lit("/page"), (did % 11).cast("string"),
        F.when(did % 3 == 0, F.lit("?q=spark")).otherwise(F.lit("")),
    )
    return url_features(d.withColumn("url", url), key_cols=("doc_id",))


def _url_canon_sql() -> str:
    from pliers_spark.pages_pipeline import canonical_url_sql

    synth = """CASE WHEN doc_id % 4 = 0 THEN 'HTTP://'
                    WHEN doc_id % 2 = 1 THEN 'https://' ELSE 'http://' END
  || CASE WHEN doc_id % 5 = 0 THEN 'WWW.Site' ELSE 'www.site' END
  || (doc_id % 40)::VARCHAR || '.example.com'
  || CASE WHEN doc_id % 6 = 0 AND doc_id % 2 = 0 THEN ':80'
          WHEN doc_id % 6 = 3 THEN ':443' ELSE '' END
  || '/Sec' || (doc_id % 5)::VARCHAR || '/page' || (doc_id % 11)::VARCHAR
  || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
  || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&q=spark'
          WHEN doc_id % 3 = 1 THEN '?q=spark&utm_campaign=x&fbclid=1'
          ELSE '?q=spark' END
  || CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END"""
    return f"""WITH u AS (
  SELECT doc_id, {canonical_url_sql(synth)} AS canon_url FROM documents),
g AS (
  SELECT canon_url, count(*)::BIGINT AS n_dups, min(doc_id) AS keeper
  FROM u GROUP BY canon_url)
SELECT u.doc_id, u.canon_url, g.n_dups, (u.doc_id = g.keeper) AS keep
FROM u JOIN g USING (canon_url)"""


@query("url_canonical_dups", _url_canon_sql())
def q_url_canonical_dups(spark, sf_dir):
    """URL canonicalization + URL-keyed dedup (crawl-ingest entry op):
    messy synthetic URLs (mixed-case scheme/host, default ports,
    fragments, utm/fbclid tracking params, trailing slashes — all pure
    Column concat over doc_id so the oracle regenerates identical
    strings) → ``pages_pipeline.canonical_url`` (codegen regex chain)
    → group on the canonical form, count duplicates, keep the smallest
    doc_id. One shuffle on the canonical key; at crawl scale this is
    the same hash-groupBy shape as exact content dedup."""
    from pliers_spark.pages_pipeline import canonical_url

    did = F.col("doc_id")
    url = F.concat(
        F.when(did % 4 == 0, F.lit("HTTP://"))
        .when(did % 2 == 1, F.lit("https://"))
        .otherwise(F.lit("http://")),
        F.when(did % 5 == 0, F.lit("WWW.Site")).otherwise(F.lit("www.site")),
        (did % 40).cast("string"),
        F.lit(".example.com"),
        F.when((did % 6 == 0) & (did % 2 == 0), F.lit(":80"))
        .when(did % 6 == 3, F.lit(":443"))
        .otherwise(F.lit("")),
        F.lit("/Sec"),
        (did % 5).cast("string"),
        F.lit("/page"),
        (did % 11).cast("string"),
        F.when(did % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(did % 3 == 0, F.lit("?utm_source=feed&q=spark"))
        .when(did % 3 == 1, F.lit("?q=spark&utm_campaign=x&fbclid=1"))
        .otherwise(F.lit("?q=spark")),
        F.when(did % 7 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    u = _docs(spark, sf_dir).select("doc_id", canonical_url(url).alias("canon_url"))
    g = u.groupBy("canon_url").agg(
        F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keeper")
    )
    return u.join(g, "canon_url").select(
        "doc_id",
        "canon_url",
        "n_dups",
        (F.col("doc_id") == F.col("keeper")).alias("keep"),
    )


_BLOCKLIST = ("slow", "dup", "leak")
_BL_SQL = ", ".join(f"'{w}'" for w in _BLOCKLIST)


@query(
    "blocklist_filter",
    f"""WITH toks AS (
         SELECT doc_id, lower(unnest(string_split(trim(text), ' '))) AS token
         FROM documents)
       SELECT doc_id,
              SUM(CASE WHEN token IN ({_BL_SQL}) THEN 1 ELSE 0 END)::BIGINT AS n_hits,
              (SUM(CASE WHEN token IN ({_BL_SQL}) THEN 1 ELSE 0 END) = 0) AS keep
       FROM toks GROUP BY doc_id""",
)
def q_blocklist_filter(spark, sf_dir):
    """C4-style bad-word blocklist gate (Raffel et al. 2020 §2.2: drop
    any page containing a blocklisted word): explode tokens → literal
    IN-list predicate (no join — the list constant-folds into codegen)
    → per-doc hit count with map-side partial agg; keep = zero hits.
    At 100 TB the plan is a narrow map + one hash agg on doc_id — the
    same shape as token_stats; a large real blocklist would swap the
    IN-list for a broadcast left-semi join, same single shuffle."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(T.tokenize(F.col("text"))).alias("token"))
    hit = F.when(F.lower(F.col("token")).isin(*_BLOCKLIST), F.lit(1)).otherwise(F.lit(0))
    return toks.groupBy("doc_id").agg(
        F.sum(hit).alias("n_hits"),
        (F.sum(hit) == 0).alias("keep"),
    )


@query(
    "chunk_windows",
    """WITH n AS (
         SELECT doc_id, len(string_split(trim(text), ' '))::BIGINT AS n_tokens
         FROM documents),
       k AS (
         SELECT doc_id, n_tokens,
                (CASE WHEN n_tokens <= 32 THEN 1
                      ELSE (n_tokens - 32 + 15) // 16 + 1 END) AS n_chunks
         FROM n)
       SELECT doc_id,
              unnest(generate_series(0, n_chunks - 1))::BIGINT AS chunk_id,
              (unnest(generate_series(0, n_chunks - 1)) * 16)::BIGINT AS start_tok,
              least(unnest(generate_series(0, n_chunks - 1)) * 16 + 32,
                    n_tokens)::BIGINT AS end_tok
       FROM k""",
)
def q_chunk_windows(spark, sf_dir):
    """Sliding-window chunking for context-window training (the
    BERT/GPT overlapping-stride split: window 32 tokens, stride 16):
    per doc, emit (chunk_id, start_tok, end_tok) covering the token
    sequence with 50% overlap, final chunk clipped. Narrow map + a
    bounded sequence explode (≤ n/stride rows per doc) — no shuffle at
    all; at 100 TB this is a pure map stage that pipelines into
    sequence_pack."""
    d = _docs(spark, sf_dir)
    n = d.select("doc_id", F.size(T.tokenize(F.col("text"))).cast("long").alias("n_tokens"))
    k = n.withColumn(
        "n_chunks",
        F.expr("CASE WHEN n_tokens <= 32 THEN 1 ELSE (n_tokens - 32 + 15) div 16 + 1 END"),
    )
    out = k.select(
        "doc_id", "n_tokens",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1)).alias("chunk_id"),
    )
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (F.col("chunk_id") * 16).cast("long").alias("start_tok"),
        F.least(F.col("chunk_id") * 16 + 32, F.col("n_tokens")).cast("long").alias("end_tok"),
    )


@query(
    "mixture_epochs",
    """WITH tot AS (
         SELECT source, SUM(len(string_split(trim(text), ' ')))::BIGINT AS src_tokens
         FROM documents GROUP BY source),
       mx AS (SELECT MAX(src_tokens) AS max_tokens FROM tot),
       fac AS (
         SELECT source, src_tokens,
                ((SELECT max_tokens FROM mx) + src_tokens - 1) // src_tokens AS n_epochs
         FROM tot)
       SELECT d.doc_id, d.source,
              unnest(generate_series(1, f.n_epochs))::BIGINT AS epoch,
              f.n_epochs::BIGINT AS n_epochs
       FROM documents d JOIN fac f USING (source)""",
)
def q_mixture_epochs(spark, sf_dir):
    """Epoch-based source up-sampling (the data-mixing repetition rule
    behind LLaMA/Gopher mixture tables): each source repeats
    ceil(max_source_tokens / source_tokens) times so every source
    contributes a comparable token budget; docs are emitted once per
    epoch with the epoch index. The per-source factor is a tiny
    aggregate broadcast back onto the corpus — the big side sees one
    narrow map + a bounded explode, no skew (factor is per-source, not
    per-key)."""
    d = _docs(spark, sf_dir)
    tot = d.groupBy("source").agg(
        F.sum(F.size(T.tokenize(F.col("text"))).cast("long")).alias("src_tokens")
    )
    mx = tot.agg(F.max("src_tokens").alias("max_tokens"))
    fac = tot.crossJoin(F.broadcast(mx)).select(
        "source",
        F.expr("(max_tokens + src_tokens - 1) div src_tokens").alias("n_epochs"),
    )
    return (
        d.select("doc_id", "source")
        .join(F.broadcast(fac), "source")
        .select(
            "doc_id", "source",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_epochs"))).alias("epoch"),
            F.col("n_epochs").cast("long").alias("n_epochs"),
        )
    )


# --------------------------------------------------------------------------
# batch 21: hybrid rank fusion, containment dedup, TPC-H Q18

def _rrf_sql() -> str:
    from pliers_spark.operators.ir import rrf_fuse_sql

    return f"""WITH seeds AS (
         SELECT doc_id, string_split(trim(text), ' ') AS t
         FROM documents ORDER BY doc_id LIMIT 8),
       queries AS (
         SELECT doc_id AS q_id, unnest(t[1:6]) AS term FROM seeds),
       {rrf_fuse_sql(k1=20, k=10, rrf_k=60)}"""


@query("rrf_fusion", _rrf_sql())
def q_rrf_fusion(spark, sf_dir):
    """Hybrid-search reciprocal-rank fusion (Cormack et al. SIGIR'09 —
    the Elasticsearch/Vespa hybrid merge): BM25 top-20 and dense-cosine
    top-20 rankings per seed query, fused by Σ 1/(60+rank) in integer
    micro-units. Lexical side reuses the broadcast-gated BM25 postings
    plan; dense side is the exact brute-force baseline (IVF/LSH swap in
    at scale); fusion is a full-outer join of two tiny (q×k1) rankings
    (operators/ir.rrf_fuse)."""
    from pliers_spark.operators.ir import rrf_fuse

    docs = _docs(spark, sf_dir)
    seeds = (
        docs.orderBy("doc_id")
        .limit(8)
        .select(
            F.col("doc_id").alias("q_id"),
            F.explode(F.slice(T.tokenize(F.col("text")), 1, 6)).alias("term"),
        )
    )
    emb = load_table(spark, sf_dir, "embeddings")
    return rrf_fuse(docs, seeds, emb, k1=20, k=10, rrf_k=60)


def _containment_sql() -> str:
    from pliers_spark.operators.dedup import containment_pairs_sql

    return containment_pairs_sql(n=3, threshold_num=4, threshold_den=5, max_df=50)


@query("containment_dedup", _containment_sql())
def q_containment_dedup(spark, sf_dir):
    """Shingle-set CONTAINMENT near-dup join (Broder 1997 §2): pairs
    where ≥80% of the smaller doc's 3-gram shingles appear in the
    larger — catches quote/inclusion duplicates that Jaccard scores
    near zero. Inverted-index join over distinct shingles with a
    max_df=50 stop-shingle cap; the threshold gate is the pure-integer
    cross product 5·∩ ≥ 4·min(|A|,|B|) (operators/dedup.containment_pairs)."""
    from pliers_spark.operators.dedup import containment_pairs

    return containment_pairs(
        _docs(spark, sf_dir), "text", "doc_id", n=3, threshold_num=4, threshold_den=5, max_df=50
    )


@query(
    "tpch_q18",
    """WITH big AS (
         SELECT l_orderkey, sum(l_quantity) AS total_qty
         FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
       SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
              round(b.total_qty, 6) AS total_qty
       FROM big b
       JOIN orders o ON o.o_orderkey = b.l_orderkey
       JOIN customer c ON c.c_custkey = o.o_custkey
       ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
       LIMIT 100""",
)
def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 (large-volume customer): HAVING-gated order census →
    join back to orders + customer → global top-100. The quantity
    census is one map-side-combined shuffle on l_orderkey; the gated
    set is a tiny fraction of orders (AQE broadcasts it into the
    orders join at runtime); the top-100 with a full (price, date,
    orderkey) tiebreak runs as TakeOrderedAndProject — per-partition
    heaps, no global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            F.round("total_qty", 6).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# batch 22: incremental crawl-batch dedup, n-gram novelty, burst detection

def _dedup_incremental_sql() -> str:
    bands = ", ".join(_band_key_sql(b, _ROWS_PER_BAND) for b in range(_MH_BANDS))
    return (
        _minhash_cte()
        + f""",
       banded AS (
         SELECT doc_id, unnest([{bands}]) AS band_key FROM sigs),
       bf AS (
         SELECT doc_id, (doc_id % 5 = 0) AS is_delta, band_key
         FROM banded WHERE band_key IS NOT NULL),
       cand AS (
         SELECT DISTINCT p.doc_id AS new_id, o.doc_id AS old_id
         FROM bf p JOIN bf o USING (band_key)
         WHERE p.is_delta
           AND ((NOT o.is_delta AND o.doc_id != p.doc_id)
                OR (o.is_delta AND o.doc_id < p.doc_id))),
       m AS (
         SELECT new_id, count(*)::BIGINT AS n_matches,
                min(old_id)::BIGINT AS first_match
         FROM cand GROUP BY 1)
       SELECT d.doc_id, coalesce(m.n_matches, 0)::BIGINT AS n_matches,
              m.first_match, (m.new_id IS NULL) AS keep
       FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
       LEFT JOIN m ON m.new_id = d.doc_id"""
    )


@query("dedup_incremental", _dedup_incremental_sql())
def q_dedup_incremental(spark, sf_dir):
    """Incremental near-dup gate: the NEWEST crawl batch (doc_id%5=0
    plays the incoming dump) LSH-probed against the indexed corpus +
    earlier batch members — keep-first semantics, index always wins.
    Only the delta side drives the band-key equi-join; in production
    the index postings are a materialized snapshot table, so each
    ingest shuffles just the delta (operators/dedup.incremental_lsh_dedup)."""
    from pliers_spark.operators.dedup import incremental_lsh_dedup

    d = _docs(spark, sf_dir).withColumn("is_delta", F.col("doc_id") % 5 == 0)
    return incremental_lsh_dedup(
        d, "text", "doc_id", "is_delta",
        num_hashes=_MH_K, bands=_MH_BANDS, shingle_n=_MH_SHINGLE,
    )


@query(
    "ngram_novelty",
    """WITH base AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
       sh AS (
         SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, len(t) - 1),
                                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
         FROM base WHERE len(t) >= 3),
       first AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s)
       SELECT sh.doc_id,
              count(*)::BIGINT AS n_shingles,
              SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_novel,
              CAST(round(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                         * 1000000.0 / count(*)) AS BIGINT) AS novelty_ppm
       FROM sh JOIN first f USING (s)
       GROUP BY sh.doc_id""",
)
def q_ngram_novelty(spark, sf_dir):
    """Cross-corpus n-gram novelty (the memorization/contamination
    statistic of Lee et al. 2022 §5: how much of a doc is new text vs
    already-seen shingles): per doc, the fraction of its distinct
    3-gram shingles whose FIRST corpus occurrence (min doc_id owning
    the shingle) is this doc. One shingle census (map-side combined
    min), one join back on the shingle key, one per-doc re-agg — the
    novelty twin of the dedup inverted index, never all-pairs."""
    d = _docs(spark, sf_dir)
    from pliers_spark.functions.hashing import shingles

    sh = d.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(T.tokenize(F.col("text")), 3))).alias("s"),
    )
    first = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), F.lit(1)).otherwise(F.lit(0))
    return (
        sh.join(first, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(novel).cast("long").alias("n_novel"),
            F.round(F.sum(novel) * F.lit(1e6) / F.count(F.lit(1)), 0)
            .cast("long")
            .alias("novelty_ppm"),
        )
    )


@query(
    "event_bursts",
    """WITH daily AS (
         SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS day,
                count(*)::BIGINT AS n_events
         FROM events GROUP BY 1, 2),
       stats AS (
         SELECT event_type, count(*)::BIGINT AS n_days,
                sum(n_events)::BIGINT AS s, sum(n_events * n_events)::BIGINT AS q
         FROM daily GROUP BY 1)
       SELECT d.event_type, d.day, d.n_events,
              (s.n_days * d.n_events - s.s)::BIGINT AS dev_num,
              (s.n_days * d.n_events - s.s > 0
               AND (s.n_days * d.n_events - s.s) * (s.n_days * d.n_events - s.s)
                   > 9 * (s.n_days * s.q - s.s * s.s)) AS is_burst
       FROM daily d JOIN stats s USING (event_type)""",
)
def q_event_bursts(spark, sf_dir):
    """Burst / trending-day detection per event stream (the 3σ spike
    rule behind ops alerting and trending-topic feeds), entirely in
    EXACT integer algebra: a day is a burst iff n·c − S > 0 and
    (n·c − S)² > 9·(nQ − S²) — the squared z-score test cleared of
    division and sqrt, so both engines compare identical int64s. Two
    stacked aggregations (day grain → stream grain, both map-side
    combined) + a broadcast of the per-stream stats; the fact table is
    scanned once."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("n_events").cast("long").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("long").alias("q"),
    )
    dev = F.col("n_days") * F.col("n_events") - F.col("s")
    return daily.join(F.broadcast(stats), "event_type").select(
        "event_type", "day", "n_events",
        dev.cast("long").alias("dev_num"),
        ((dev > 0) & (dev * dev > 9 * (F.col("n_days") * F.col("q") - F.col("s") * F.col("s"))))
        .alias("is_burst"),
    )


# --------------------------------------------------------------------------
# batch 23: SIF embedding pooling, c-TF-IDF cluster terms, SAX symbols

def _sif_sql() -> str:
    from pliers_spark.functions.embeddings import hash_embedding_dim_ppm_sql

    dims = ", ".join(
        f"round(sum({hash_embedding_dim_ppm_sql('token', d)} * w_ppm)"
        f" / (1000000.0 * sum(w_ppm)), 6) AS emb_{d}"
        for d in range(_EMB_DIM)
    )
    return f"""WITH toks AS (
         SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents),
       tot AS (SELECT count(*)::BIGINT AS t FROM toks),
       cnt AS (SELECT token, count(*)::BIGINT AS c FROM toks GROUP BY token),
       w AS (
         SELECT token, CAST(round(1000000.0 * t / (t + 1000 * c)) AS BIGINT) AS w_ppm
         FROM cnt CROSS JOIN tot)
       SELECT doc_id, {dims}
       FROM toks JOIN w USING (token)
       GROUP BY doc_id"""


@query("sif_embedding", _sif_sql())
def q_sif_embedding(spark, sf_dir):
    """SIF-weighted document embedding pooling (Arora, Liang & Ma, ICLR
    2017 — 'a simple but tough-to-beat baseline'): each token weighted
    by a/(a+p(w)) before averaging, so Zipf-head words stop dominating
    the mean. With a = 1/1000 the weight is EXACTLY T/(T + 1000·c) —
    one rounding to integer ppm per vocab word, so the weighted sums
    are order-independent int64s and the single final division is
    bit-identical cross-engine. Plan: token census (one shuffle) →
    weight dim joined back on the token key (vocab-sized, NOT broadcast
    at corpus scale) → per-doc weighted reduction. The common-component
    (first-PC) removal step of the paper is a KxK driver-side PCA at
    corpus scale — out of scope here, as in most production uses."""
    d = _docs(spark, sf_dir)
    from pliers_spark.functions.embeddings import hash_embedding_dim_ppm

    toks = d.select("doc_id", F.explode(T.tokenize(F.col("text"))).alias("token"))
    tot = toks.agg(F.count(F.lit(1)).cast("long").alias("t"))
    cnt = toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = cnt.crossJoin(F.broadcast(tot)).select(
        "token",
        F.round(F.lit(1e6) * F.col("t") / (F.col("t") + 1000 * F.col("c")), 0)
        .cast("long")
        .alias("w_ppm"),
    )
    weighted = toks.join(w, "token")
    return weighted.groupBy("doc_id").agg(
        *[
            F.round(
                F.sum(hash_embedding_dim_ppm(F.col("token"), dd) * F.col("w_ppm"))
                / (F.lit(1e6) * F.sum("w_ppm")),
                6,
            ).alias(f"emb_{dd}")
            for dd in range(_EMB_DIM)
        ]
    )


def _ctfidf_sql(k: int = 8, topk: int = 5) -> str:
    from pliers_spark.operators.similarity import kmeans_assign_sql

    return f"""WITH assign AS ({kmeans_assign_sql(k=k)}),
       toks AS (
         SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents),
       joined AS (
         SELECT a.cluster_id, t.token
         FROM toks t JOIN assign a ON a.vec_id = t.doc_id),
       tf AS (SELECT cluster_id, token, count(*)::BIGINT AS tf FROM joined GROUP BY 1, 2),
       ft AS (SELECT token, sum(tf)::BIGINT AS f_t FROM tf GROUP BY token),
       sc AS (
         SELECT (SELECT sum(tf) FROM tf)::BIGINT AS total_tokens,
                (SELECT count(DISTINCT cluster_id) FROM tf)::BIGINT AS n_clusters),
       scored AS (
         SELECT tf.cluster_id, tf.token, tf.tf,
                tf.tf * CAST(round(ln(1.0 + total_tokens::DOUBLE
                                       / (n_clusters::DOUBLE * f_t::DOUBLE))
                                   * 1000000.0) AS BIGINT) AS score_fp
         FROM tf JOIN ft USING (token) CROSS JOIN sc)
       SELECT cluster_id, token, tf, score_fp,
              row_number() OVER (PARTITION BY cluster_id
                                 ORDER BY score_fp DESC, token)::BIGINT AS rank
       FROM scored QUALIFY rank <= {topk}"""


@query("ctfidf_terms", _ctfidf_sql())
def q_ctfidf_terms(spark, sf_dir):
    """c-TF-IDF cluster labeling (Grootendorst 2022, BERTopic §3.3):
    top-5 characteristic terms per embedding k-means cluster, scored
    tf_{t,c} · ln(1 + A/f_t) with A = average tokens per class. The
    cluster assignment is the exact-int64 Lloyd step (kmeans_assign);
    the term side is two stacked censuses on (cluster, token) / token
    keys — the idf factor rounds ONCE to integer micro-nats, so the
    int64 product ordering is total and cross-engine identical. This
    is the topic-labeling readout every embedding-cluster curation
    pipeline runs after `kmeans_assign`/`semantic_dedup`."""
    from pliers_spark.operators.similarity import kmeans_assign

    emb = load_table(spark, sf_dir, "embeddings")
    assign = kmeans_assign(emb, k=8).select(
        F.col("vec_id").alias("doc_id"), "cluster_id"
    )
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.explode(T.tokenize(F.col("text"))).alias("token")
    )
    joined = toks.join(assign, "doc_id")
    tf = joined.groupBy("cluster_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    ft = tf.groupBy("token").agg(F.sum("tf").cast("long").alias("f_t"))
    sc = tf.agg(
        F.sum("tf").cast("long").alias("total_tokens"),
        F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
    )
    scored = (
        tf.join(ft, "token")
        .crossJoin(F.broadcast(sc))
        .select(
            "cluster_id", "token", "tf",
            (
                F.col("tf")
                * F.round(
                    F.log(
                        F.lit(1.0)
                        + F.col("total_tokens").cast("double")
                        / (F.col("n_clusters").cast("double") * F.col("f_t").cast("double"))
                    )
                    * F.lit(1e6),
                    0,
                ).cast("long")
            ).alias("score_fp"),
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("score_fp"), F.col("token"))
    return (
        scored.select("*", F.row_number().over(w).cast("long").alias("rank"))
        .where(F.col("rank") <= 5)
    )


_SAX_B2_NUM = 45_495_025  # 0.6745² · 1e8 (exactly: 0.45495025)
_SAX_B2_DEN = 100_000_000


@query(
    "sax_symbols",
    f"""WITH v AS (
         SELECT user_id, event_id,
                CAST(round(value * 1000000.0) AS BIGINT) AS v_fp,
                row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         FROM events),
       st AS (
         SELECT user_id, count(*)::BIGINT AS n,
                sum(v_fp)::BIGINT AS s,
                sum(v_fp::HUGEINT * v_fp::HUGEINT) AS q
         FROM v GROUP BY user_id),
       paa AS (
         SELECT user_id, ((rn - 1) // 8)::BIGINT AS window_id,
                count(*)::BIGINT AS cn, sum(v_fp)::BIGINT AS cs
         FROM v GROUP BY 1, 2),
       j AS (
         SELECT p.user_id, p.window_id, p.cn,
                CAST(round(p.cs::DOUBLE / p.cn) AS BIGINT) AS paa_fp,
                (s.n::HUGEINT * p.cs::HUGEINT - p.cn::HUGEINT * s.s::HUGEINT) AS dev,
                (s.n::HUGEINT * s.q - s.s::HUGEINT * s.s::HUGEINT) AS m,
                p.cn::HUGEINT AS cnh
         FROM paa p JOIN st s USING (user_id))
       SELECT user_id, window_id, cn, paa_fp,
              CASE
                WHEN dev < 0 AND {_SAX_B2_DEN}::HUGEINT * dev * dev
                                 > {_SAX_B2_NUM}::HUGEINT * cnh * cnh * m THEN 'a'
                WHEN dev < 0 THEN 'b'
                WHEN {_SAX_B2_DEN}::HUGEINT * dev * dev
                     <= {_SAX_B2_NUM}::HUGEINT * cnh * cnh * m THEN 'c'
                ELSE 'd'
              END AS symbol
       FROM j""",
)
def q_sax_symbols(spark, sf_dir):
    """SAX symbolic time-series approximation (Lin et al., DMKD 2007):
    per user, the event-value sequence is PAA-averaged over chunks of 8
    and each chunk mapped to a 4-letter alphabet by the Gaussian
    breakpoints (−0.6745, 0, +0.6745) of the per-user z-distribution —
    the front door to motif discovery / symbolic indexing over raw
    series. The z-comparison never touches a float: PAA-mean vs
    μ + b·σ is cross-multiplied and squared into
    1e8·dev² ≷ 45495025·cn²·(nQ−S²) with dev = n·cs − cn·S, evaluated
    in DECIMAL(38,0)/HUGEINT (the temperature_sample discipline), so
    the symbol boundaries are bit-identical on both engines. Plan: one
    per-user sequence window (single shuffle on user_id), two stacked
    aggregations, broadcast per-user stats back onto chunk grain."""
    ev = _events(spark, sf_dir)
    dec = "decimal(38,0)"
    v_fp = F.round(F.col("value") * F.lit(1e6), 0).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = ev.select(
        "user_id", "event_id", v_fp.alias("v_fp"), F.row_number().over(w).alias("rn")
    )
    st = v.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v_fp").cast("long").alias("s"),
        F.sum(F.col("v_fp").cast(dec) * F.col("v_fp").cast(dec)).cast(dec).alias("q"),
    )
    paa = v.groupBy(
        "user_id", F.floor((F.col("rn") - 1) / 8).cast("long").alias("window_id")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("cn"),
        F.sum("v_fp").cast("long").alias("cs"),
    )
    j = paa.join(st, "user_id").select(
        "user_id", "window_id", "cn",
        F.round(F.col("cs").cast("double") / F.col("cn"), 0).cast("long").alias("paa_fp"),
        (F.col("n").cast(dec) * F.col("cs").cast(dec) - F.col("cn").cast(dec) * F.col("s").cast(dec)).alias("dev"),
        (F.col("n").cast(dec) * F.col("q") - F.col("s").cast(dec) * F.col("s").cast(dec)).alias("m"),
        F.col("cn").cast(dec).alias("cnh"),
    )
    lhs = F.lit(_SAX_B2_DEN).cast(dec) * F.col("dev") * F.col("dev")
    rhs = F.lit(_SAX_B2_NUM).cast(dec) * F.col("cnh") * F.col("cnh") * F.col("m")
    symbol = (
        F.when((F.col("dev") < 0) & (lhs > rhs), F.lit("a"))
        .when(F.col("dev") < 0, F.lit("b"))
        .when(lhs <= rhs, F.lit("c"))
        .otherwise(F.lit("d"))
    )
    return j.select("user_id", "window_id", "cn", "paa_fp", symbol.alias("symbol"))


# --------------------------------------------------------------------------
# batch 24: NDCG ranking evaluation, Dunning keyness, WOE/IV binning

# exact integer discount weights round(1e6 / log2(1+r)) for ranks 1..5 —
# computed once in Python and shared verbatim by BOTH engines so the DCG
# sums are pure int64 arithmetic (see tools/golden_hashes.py discipline)
_NDCG_W = {1: 1_000_000, 2: 630_930, 3: 500_000, 4: 430_677, 5: 386_853}
_NDCG_GAIN = {r: 2**r - 1 for r in range(0, 7)}  # graded gain 2^rel - 1


def _ndcg_sql(k: int = 5) -> str:
    from pliers_spark.operators.ir import bm25_topk_sql

    w_case = " ".join(f"WHEN {r} THEN {w}" for r, w in _NDCG_W.items())
    g_case = " ".join(f"WHEN {r} THEN {g}" for r, g in _NDCG_GAIN.items())
    tail = f""", rel AS (
  SELECT b.q_id, b.doc_id, b.rank, count(tf.term)::BIGINT AS rel
  FROM bm25 b
  JOIN qt ON qt.q_id = b.q_id
  LEFT JOIN tf ON tf.doc_id = b.doc_id AND tf.term = qt.term
  GROUP BY 1, 2, 3),
gains AS (
  SELECT q_id, doc_id, rank,
         (CASE rel {g_case} END)::BIGINT AS gain,
         row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, doc_id)::BIGINT AS irank
  FROM rel),
agg AS (
  SELECT q_id,
         sum(gain * (CASE rank {w_case} END))::BIGINT AS dcg_fp,
         sum(gain * (CASE irank {w_case} END))::BIGINT AS idcg_fp
  FROM gains GROUP BY q_id)
SELECT q_id, dcg_fp, idcg_fp,
       CASE WHEN idcg_fp = 0 THEN 0.0
            ELSE round(dcg_fp::DOUBLE / idcg_fp::DOUBLE, 6) END AS ndcg
FROM agg"""
    return f"""WITH seeds AS (
         SELECT doc_id, string_split(trim(text), ' ') AS t
         FROM documents ORDER BY doc_id LIMIT 8),
       queries AS (
         SELECT doc_id AS q_id, unnest(t[1:6]) AS term FROM seeds),
       {bm25_topk_sql(k=k, tail=tail)}"""


@query("ndcg_at_k", _ndcg_sql())
def q_ndcg_at_k(spark, sf_dir):
    """NDCG@5 ranking evaluation (Järvelin & Kekäläinen, TOIS 2002) of
    the engine's own BM25 retrieval: graded relevance = number of the
    query's terms the candidate actually contains (0..6), gain 2^rel−1,
    discount 1/log2(1+rank) as ONCE-rounded integer micro-weights shared
    verbatim by both engines — so DCG and ideal-DCG are exact int64 sums
    and the single final division is bit-identical. Plan: the corpus is
    touched only by the BM25 postings pass; relevance grading joins the
    (queries × k)-sized candidate set back to doc term sets through a
    broadcast gate, so the evaluation stage never shuffles the corpus.
    This is the eval loop every retrieval/curation pipeline runs over
    its ranker."""
    from pliers_spark.operators.ir import bm25_topk

    docs = _docs(spark, sf_dir)
    seeds = (
        docs.orderBy("doc_id")
        .limit(8)
        .select(
            F.col("doc_id").alias("q_id"),
            F.explode(F.slice(T.tokenize(F.col("text")), 1, 6)).alias("term"),
        )
    )
    # both frames are tiny (queries×k rows) but feed MULTIPLE branches
    # (relevance grading, ideal re-rank, final join) — checkpoint so the
    # BM25 postings pass and the seed scan run ONCE, not per branch
    cand = bm25_topk(docs, seeds, k=5).localCheckpoint(eager=True)
    qt = seeds.distinct().localCheckpoint(eager=True)
    cand_docs = cand.select("doc_id").distinct()
    # distinct (doc, term) postings of candidate docs only — broadcast-gated
    doc_terms = (
        docs.join(F.broadcast(cand_docs), "doc_id")
        .select("doc_id", F.explode(T.tokenize(F.col("text"))).alias("term"))
        .distinct()
    )
    matched = (
        doc_terms.join(F.broadcast(qt), "term")
        .groupBy("q_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("rel"))
    )
    rel = cand.join(matched, ["q_id", "doc_id"], "left").select(
        "q_id", "doc_id", "rank", F.coalesce(F.col("rel"), F.lit(0)).alias("rel")
    )
    gain = F.create_map(
        *[F.lit(x) for kv in _NDCG_GAIN.items() for x in kv]
    )[F.col("rel")].cast("long")
    wmap = F.create_map(*[F.lit(x) for kv in _NDCG_W.items() for x in kv])
    iw = Window.partitionBy("q_id").orderBy(F.desc("rel"), "doc_id")
    gains = rel.select(
        "q_id",
        gain.alias("gain"),
        wmap[F.col("rank")].cast("long").alias("w"),
        wmap[F.row_number().over(iw).cast("long")].cast("long").alias("iw"),
    )
    agg = gains.groupBy("q_id").agg(
        F.sum(F.col("gain") * F.col("w")).cast("long").alias("dcg_fp"),
        F.sum(F.col("gain") * F.col("iw")).cast("long").alias("idcg_fp"),
    )
    return agg.select(
        "q_id", "dcg_fp", "idcg_fp",
        F.when(F.col("idcg_fp") == 0, F.lit(0.0))
        .otherwise(
            F.round(F.col("dcg_fp").cast("double") / F.col("idcg_fp").cast("double"), 6)
        )
        .alias("ndcg"),
    )


def _keyness_sql(min_count: int = 10, topk: int = 20) -> str:
    return f"""WITH toks AS (
         SELECT source, unnest(string_split(trim(text), ' ')) AS token FROM documents),
       st AS (SELECT source, token, count(*)::BIGINT AS a FROM toks GROUP BY 1, 2),
       tt AS (SELECT token, sum(a)::BIGINT AS c FROM st GROUP BY token),
       src AS (SELECT source, sum(a)::BIGINT AS n1 FROM st GROUP BY source),
       tot AS (SELECT sum(a)::BIGINT AS n FROM st),
       j AS (
         SELECT st.source, st.token, st.a, tt.c - st.a AS b,
                src.n1, tot.n - src.n1 AS n2, tt.c, tot.n
         FROM st JOIN tt USING (token) JOIN src USING (source) CROSS JOIN tot
         WHERE tt.c >= {min_count}),
       g AS (
         SELECT source, token, a, b,
                2 * (a * CAST(round(1000000.0 * ln((a::DOUBLE * n::DOUBLE)
                                                   / (n1::DOUBLE * c::DOUBLE))) AS BIGINT)
                     + CASE WHEN b = 0 THEN 0
                            ELSE b * CAST(round(1000000.0 * ln((b::DOUBLE * n::DOUBLE)
                                                               / (n2::DOUBLE * c::DOUBLE))) AS BIGINT)
                       END) AS g2_fp,
                (a::DOUBLE * n::DOUBLE > n1::DOUBLE * c::DOUBLE) AS overused
         FROM j)
       SELECT source, token, a AS cnt_focus, b AS cnt_rest, g2_fp, overused,
              row_number() OVER (PARTITION BY source
                                 ORDER BY g2_fp DESC, token)::BIGINT AS rank
       FROM g QUALIFY rank <= {topk}"""


@query("dunning_keyness", _keyness_sql())
def q_dunning_keyness(spark, sf_dir):
    """Log-likelihood keyness (Dunning, CL 1993 G²): for every source,
    the 20 tokens whose frequency most defies the corpus-wide rate —
    the standard corpus-linguistics answer to 'what is distinctive
    about this slice', and the readout behind domain-mix debugging in
    pretraining curation. G² = 2Σ Oᵢ·ln(Oᵢ/Eᵢ) with each ln computed on
    one double ratio of exact int64 counts and rounded ONCE to integer
    micro-nats before the count multiplier, so both engines sum
    identical int64s (b=0 term is the 0·ln0 = 0 limit). Plan: one
    (source, token) census shuffle, a token-grain join for corpus
    counts (vocab-sized — NOT broadcast at web scale), per-source
    totals broadcast, top-k per source via TakeOrdered-style window."""
    d = _docs(spark, sf_dir)
    toks = d.select("source", F.explode(T.tokenize(F.col("text"))).alias("token"))
    st = toks.groupBy("source", "token").agg(F.count(F.lit(1)).cast("long").alias("a"))
    tt = st.groupBy("token").agg(F.sum("a").cast("long").alias("c"))
    src = st.groupBy("source").agg(F.sum("a").cast("long").alias("n1"))
    tot = st.agg(F.sum("a").cast("long").alias("n"))
    j = (
        st.join(tt, "token")
        .where(F.col("c") >= 10)
        .join(F.broadcast(src), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source", "token", "a", (F.col("c") - F.col("a")).alias("b"),
            "n1", (F.col("n") - F.col("n1")).alias("n2"), "c", "n",
        )
    )
    d_ = lambda col: F.col(col).cast("double")  # noqa: E731
    lg1 = F.round(
        F.lit(1e6) * F.log((d_("a") * d_("n")) / (d_("n1") * d_("c"))), 0
    ).cast("long")
    lg2 = F.round(
        F.lit(1e6) * F.log((d_("b") * d_("n")) / (d_("n2") * d_("c"))), 0
    ).cast("long")
    g2 = 2 * (
        F.col("a") * lg1
        + F.when(F.col("b") == 0, F.lit(0)).otherwise(F.col("b") * lg2)
    )
    scored = j.select(
        "source", "token", F.col("a").alias("cnt_focus"), F.col("b").alias("cnt_rest"),
        g2.alias("g2_fp"),
        (d_("a") * d_("n") > d_("n1") * d_("c")).alias("overused"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("g2_fp"), "token")
    return scored.select(
        "*", F.row_number().over(w).cast("long").alias("rank")
    ).where(F.col("rank") <= 20)


def _woe_sql(bins: int = 10) -> str:
    return f"""WITH v AS (
         SELECT o_orderkey,
                CAST(round(o_totalprice * 100.0) AS BIGINT) AS v_fp,
                (o_orderstatus = 'F')::INT AS bad
         FROM orders),
       r AS (
         SELECT v_fp, bad,
                row_number() OVER (ORDER BY v_fp, o_orderkey) AS rn,
                count(*) OVER () AS nn
         FROM v),
       b AS (
         SELECT ((rn - 1) * {bins} // nn)::BIGINT AS bin,
                count(*)::BIGINT AS n,
                sum(1 - bad)::BIGINT AS goods,
                sum(bad)::BIGINT AS bads
         FROM r GROUP BY 1),
       t AS (SELECT sum(goods)::BIGINT AS g, sum(bads)::BIGINT AS bb FROM b),
       s AS (
         SELECT bin, n, goods, bads,
                CAST(round(1000000.0 * ln((goods::DOUBLE * bb::DOUBLE)
                                          / (bads::DOUBLE * g::DOUBLE))) AS BIGINT) AS woe_fp,
                (goods::DOUBLE * bb::DOUBLE - bads::DOUBLE * g::DOUBLE) AS diff,
                g::DOUBLE * bb::DOUBLE AS gb
         FROM b CROSS JOIN t
         WHERE goods > 0 AND bads > 0)
       SELECT bin, n, goods, bads, woe_fp,
              round(diff * woe_fp::DOUBLE / (gb * 1000000.0), 6) AS iv_part
       FROM s"""


@query("woe_iv", _woe_sql())
def q_woe_iv(spark, sf_dir):
    """Weight-of-evidence / information-value binning (the credit-
    scoring feature-screening standard; Siddiqi 2006): o_totalprice is
    exact-rank-deciled (integer rank arithmetic — no ntile remainder
    ambiguity), per-bin WOE = ln(good-share / bad-share) rounded ONCE
    to integer micro-nats from a single double ratio of exact int64
    counts, and the IV contribution (gᵢ/G − bᵢ/B)·WOE evaluated in the
    identical double-expression shape on both engines. Plan: global
    rank is ONE total-order sort (the same exact-quantile discipline as
    group_quantiles — at corpus scale swap in the two-pass rank
    histogram); everything after is bin-grain (10 rows) with the class
    totals broadcast."""
    o = load_table(spark, sf_dir, "orders")
    v = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100.0, 0).cast("long").alias("v_fp"),
        (F.col("o_orderstatus") == "F").cast("int").alias("bad"),
    )
    wr = Window.orderBy("v_fp", "o_orderkey")
    n = v.count()
    r = v.select("v_fp", "bad", F.row_number().over(wr).alias("rn"))
    b = r.groupBy(
        F.floor((F.col("rn") - 1) * 10 / F.lit(n)).cast("long").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(1 - F.col("bad")).cast("long").alias("goods"),
        F.sum("bad").cast("long").alias("bads"),
    )
    t = b.agg(
        F.sum("goods").cast("long").alias("g"), F.sum("bads").cast("long").alias("bb")
    )
    d_ = lambda col: F.col(col).cast("double")  # noqa: E731
    s = (
        b.crossJoin(F.broadcast(t))
        .where((F.col("goods") > 0) & (F.col("bads") > 0))
        .select(
            "bin", "n", "goods", "bads",
            F.round(
                F.lit(1e6) * F.log((d_("goods") * d_("bb")) / (d_("bads") * d_("g"))), 0
            ).cast("long").alias("woe_fp"),
            (d_("goods") * d_("bb") - d_("bads") * d_("g")).alias("diff"),
            (d_("g") * d_("bb")).alias("gb"),
        )
    )
    return s.select(
        "bin", "n", "goods", "bads", "woe_fp",
        F.round(F.col("diff") * F.col("woe_fp").cast("double") / (F.col("gb") * F.lit(1e6)), 6).alias("iv_part"),
    )


# --------------------------------------------------------------------------
# batch 25: Kneser-Ney LM scoring, Burrows' Delta stylometry, item-item cosine

def _kn_sql() -> str:
    from pliers_spark.operators.lm import kneser_ney_score_sql

    return kneser_ney_score_sql()


@query("kn_perplexity", _kn_sql())
def q_kn_perplexity(spark, sf_dir):
    """Interpolated Kneser-Ney bigram LM scoring + perplexity — the
    KenLM smoothing family, i.e. the model class CCNet's actual quality
    filter uses (operators/lm.kneser_ney_score; Kneser & Ney 1995,
    Chen & Goodman 1999). Same shuffle structure as `lm_score` (vocab
    top-k, ONE bigram-grain model agg — the continuation-type counts
    ride the same grain — broadcast model, per-doc reduction); per-type
    log-probs in once-rounded integer micro-nats."""
    from pliers_spark.operators.lm import kneser_ney_score

    return kneser_ney_score(_docs(spark, sf_dir))


_DELTA_TOPM = 50


def _burrows_sql(top_m: int = _DELTA_TOPM) -> str:
    return f"""WITH toks AS (
         SELECT source, unnest(string_split(trim(text), ' ')) AS token FROM documents),
       st AS (SELECT source, token, count(*)::BIGINT AS c FROM toks GROUP BY 1, 2),
       topm AS (
         SELECT token FROM (SELECT token, sum(c) AS tc FROM st GROUP BY token)
         ORDER BY tc DESC, token LIMIT {top_m}),
       ns AS (SELECT source, sum(c)::BIGINT AS n FROM st GROUP BY source),
       cells AS (
         SELECT ns.source, topm.token,
                CAST(round(1000000000.0 * coalesce(st.c, 0) / ns.n) AS BIGINT) AS f_ppb
         FROM ns CROSS JOIN topm
         LEFT JOIN st ON st.source = ns.source AND st.token = topm.token),
       stats AS (
         SELECT token, count(*)::BIGINT AS s,
                sum(f_ppb)::BIGINT AS t,
                sum(f_ppb::HUGEINT * f_ppb::HUGEINT) AS q
         FROM cells GROUP BY token),
       pairs AS (
         SELECT a.source AS source_a, b.source AS source_b, a.token,
                CAST(round(1000000.0
                           * (st.s * abs(a.f_ppb - b.f_ppb))::DOUBLE
                           / sqrt((st.s::HUGEINT * st.q
                                   - st.t::HUGEINT * st.t::HUGEINT)::DOUBLE))
                     AS BIGINT) AS zdiff_fp
         FROM cells a
         JOIN cells b ON a.token = b.token AND a.source < b.source
         JOIN stats st ON st.token = a.token
         WHERE st.s::HUGEINT * st.q - st.t::HUGEINT * st.t::HUGEINT > 0)
       SELECT source_a, source_b, count(*)::BIGINT AS n_terms,
              round(sum(zdiff_fp)::DOUBLE / (count(*) * 1000000.0), 6) AS delta
       FROM pairs GROUP BY 1, 2"""


@query("burrows_delta", _burrows_sql())
def q_burrows_delta(spark, sf_dir):
    """Burrows' Delta stylometric distance between sources (Burrows,
    LLC 2002; the standard authorship-attribution measure): mean |Δz|
    over the top-50 corpus function words, where z is each source's
    token rate standardized across the source population. The z
    difference is computed EXACTLY as S·|f_A − f_B|/√(S·Q − T²) on
    integer-ppb rates (the (f−μ)/σ cancellation), with S·Q − T² in
    DECIMAL(38,0) — one correctly-rounded sqrt and one once-rounded
    micro-unit per (pair, term), so the per-pair integer sums are
    cross-engine identical. Plan: ONE corpus census shuffle on
    (source, token); everything after lives at the S×50 dimension
    grain. This is the source-style drift monitor for corpus mixing."""
    d = _docs(spark, sf_dir)
    dec = "decimal(38,0)"
    toks = d.select("source", F.explode(T.tokenize(F.col("text"))).alias("token"))
    st = toks.groupBy("source", "token").agg(F.count(F.lit(1)).cast("long").alias("c"))
    topm = (
        st.groupBy("token").agg(F.sum("c").alias("tc"))
        .orderBy(F.desc("tc"), "token").limit(_DELTA_TOPM).select("token")
    )
    ns = st.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    cells = (
        ns.crossJoin(F.broadcast(topm))
        .join(st, ["source", "token"], "left")
        .select(
            "source", "token",
            F.round(F.lit(1e9) * F.coalesce(F.col("c"), F.lit(0)) / F.col("n"), 0)
            .cast("long")
            .alias("f_ppb"),
        )
        .localCheckpoint(eager=True)  # feeds stats AND both pair sides
    )
    stats = cells.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("s"),
        F.sum("f_ppb").cast("long").alias("t"),
        F.sum(F.col("f_ppb").cast(dec) * F.col("f_ppb").cast(dec)).cast(dec).alias("q"),
    )
    a = cells.select(F.col("source").alias("source_a"), "token", F.col("f_ppb").alias("fa"))
    b = cells.select(F.col("source").alias("source_b"), "token", F.col("f_ppb").alias("fb"))
    var = F.col("s").cast(dec) * F.col("q") - F.col("t").cast(dec) * F.col("t").cast(dec)
    pairs = (
        a.join(b, "token")
        .where(F.col("source_a") < F.col("source_b"))
        .join(F.broadcast(stats), "token")
        .where(var > 0)
        .select(
            "source_a", "source_b",
            F.round(
                F.lit(1e6)
                * (F.col("s") * F.abs(F.col("fa") - F.col("fb"))).cast("double")
                / F.sqrt(var.cast("double")),
                0,
            ).cast("long").alias("zdiff_fp"),
        )
    )
    return pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.round(
            F.sum("zdiff_fp").cast("double") / (F.count(F.lit(1)) * F.lit(1e6)), 6
        ).alias("delta"),
    )


def _item_cosine_sql(topk: int = 5, basket_cap: int = 20) -> str:
    return f"""WITH op AS (
         SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       sized AS (
         SELECT l_orderkey FROM op GROUP BY l_orderkey
         HAVING count(*) BETWEEN 2 AND {basket_cap}),
       b AS (SELECT op.* FROM op JOIN sized USING (l_orderkey)),
       ci AS (SELECT l_partkey, count(*)::BIGINT AS c FROM b GROUP BY l_partkey),
       co AS (
         SELECT a.l_partkey AS p1, bb.l_partkey AS p2, count(*)::BIGINT AS c_co
         FROM b a JOIN b bb ON a.l_orderkey = bb.l_orderkey
                           AND a.l_partkey < bb.l_partkey
         GROUP BY 1, 2),
       sym AS (
         SELECT p1 AS part_id, p2 AS neighbor_id, c_co FROM co
         UNION ALL
         SELECT p2, p1, c_co FROM co),
       scored AS (
         SELECT s.part_id, s.neighbor_id, s.c_co,
                round(s.c_co::DOUBLE / sqrt(c1.c::DOUBLE * c2.c::DOUBLE), 6) AS cosine
         FROM sym s JOIN ci c1 ON c1.l_partkey = s.part_id
                    JOIN ci c2 ON c2.l_partkey = s.neighbor_id)
       SELECT part_id, neighbor_id, c_co, cosine,
              row_number() OVER (PARTITION BY part_id
                                 ORDER BY cosine DESC, neighbor_id)::BIGINT AS rank
       FROM scored QUALIFY rank <= {topk}"""


@query("item_cosine", _item_cosine_sql())
def q_item_cosine(spark, sf_dir):
    """Item-item co-occurrence cosine (Sarwar et al., WWW 2001 — the
    classic collaborative-filtering neighborhood model): top-5 nearest
    parts per part by co-purchase cosine c_ij/√(c_i·c_j) over order
    baskets. The within-basket pair expansion is quadratic in basket
    size, so baskets above a cap (20; TPC-H max is 7) are EXCLUDED
    up front — the standard defense that keeps the self-join bounded at
    web scale (a mega-basket bot order would otherwise dominate one
    task). Plan: distinct (order, part) census → size-gated self-join
    co-census on the order key (ONE shuffle each) → item-count joins on
    the part key → per-item top-k window. Cosine rounds once from
    exact int64 counts."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        op.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("bs"))
        .where((F.col("bs") >= 2) & (F.col("bs") <= 20))
        .select("l_orderkey")
    )
    b = op.join(sized, "l_orderkey").localCheckpoint(eager=True)
    ci = b.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("c"))
    a1 = b.select("l_orderkey", F.col("l_partkey").alias("p1"))
    a2 = b.select("l_orderkey", F.col("l_partkey").alias("p2"))
    co = (
        a1.join(a2, "l_orderkey")
        .where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("long").alias("c_co"))
    )
    sym = co.select(
        F.col("p1").alias("part_id"), F.col("p2").alias("neighbor_id"), "c_co"
    ).unionAll(
        co.select(
            F.col("p2").alias("part_id"), F.col("p1").alias("neighbor_id"), "c_co"
        )
    )
    scored = (
        sym.join(ci.withColumnRenamed("l_partkey", "part_id").withColumnRenamed("c", "c1"), "part_id")
        .join(ci.withColumnRenamed("l_partkey", "neighbor_id").withColumnRenamed("c", "c2"), "neighbor_id")
        .select(
            "part_id", "neighbor_id", "c_co",
            F.round(
                F.col("c_co").cast("double")
                / F.sqrt(F.col("c1").cast("double") * F.col("c2").cast("double")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("part_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.select(
        "*", F.row_number().over(w).cast("long").alias("rank")
    ).where(F.col("rank") <= 5)


# --------------------------------------------------------------------------
# batch 26: content-defined chunking, UCB1 bandit replay, grid DBSCAN

def _cdc_sql(mod: int = 16) -> str:
    from pliers_spark.functions.hashing import md5_int_sql

    return f"""WITH toks AS (
         SELECT doc_id, t.token, t.pos::BIGINT AS pos
         FROM (SELECT doc_id,
                      unnest(string_split(trim(text), ' ')) AS token,
                      generate_subscripts(string_split(trim(text), ' '), 1) - 1 AS pos
               FROM documents) t(doc_id, token, pos)),
       flagged AS (
         SELECT doc_id, token, pos,
                ({md5_int_sql('token')} % {mod} = 0)::INT AS boundary
         FROM toks),
       chunks AS (
         SELECT doc_id, token, pos,
                coalesce(sum(boundary) OVER (PARTITION BY doc_id ORDER BY pos
                                             ROWS BETWEEN UNBOUNDED PRECEDING
                                                      AND 1 PRECEDING), 0) AS chunk_id
         FROM flagged),
       ch AS (
         SELECT doc_id, chunk_id,
                md5(string_agg(token, ' ' ORDER BY pos)) AS chash,
                count(*)::BIGINT AS c_toks
         FROM chunks GROUP BY doc_id, chunk_id),
       census AS (
         SELECT chash, count(DISTINCT doc_id)::BIGINT AS n_docs FROM ch GROUP BY chash)
       SELECT ch.doc_id,
              count(*)::BIGINT AS n_chunks,
              sum(c_toks)::BIGINT AS n_tokens,
              sum((census.n_docs >= 2)::INT)::BIGINT AS dup_chunks,
              sum(CASE WHEN census.n_docs >= 2 THEN c_toks ELSE 0 END)::BIGINT AS dup_tokens,
              round(sum(CASE WHEN census.n_docs >= 2 THEN c_toks ELSE 0 END)::DOUBLE
                    / sum(c_toks), 6) AS dup_token_share
       FROM ch JOIN census USING (chash)
       GROUP BY ch.doc_id"""


@query("cdc_chunks", _cdc_sql())
def q_cdc_chunks(spark, sf_dir):
    """Content-defined chunking dedup census (LBFS, Muthitacharoen et
    al. SOSP 2001 — the rsync/storage-dedup primitive, here at token
    grain): a chunk boundary falls AFTER any token whose 60-bit md5
    hash ≡ 0 (mod 16) — boundaries depend only on LOCAL content, so an
    insertion early in a page reshuffles ONE chunk instead of every
    fixed-width window (the failure mode of `chunk_dedup`'s K-token
    spans). Per doc: chunk count and the share of tokens living in
    chunks seen in ≥2 documents. Plan: posexplode → one per-doc window
    cumsum (doc-key shuffle) → chunk grouping on the SAME key (no extra
    exchange) → chunk-hash census shuffle → hash-key join back +
    doc-grain agg. All hashing is md5 inside codegen; no Python."""
    from pliers_spark.functions.hashing import md5_int

    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.posexplode(T.tokenize(F.col("text"))).alias("pos", "token")
    )
    flagged = toks.select(
        "doc_id", "token", F.col("pos").cast("long").alias("pos"),
        (md5_int(F.col("token")) % 16 == 0).cast("int").alias("boundary"),
    )
    wc = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunks = flagged.select(
        "doc_id", "token", "pos",
        F.coalesce(F.sum("boundary").over(wc), F.lit(0)).alias("chunk_id"),
    )
    ch = chunks.groupBy("doc_id", "chunk_id").agg(
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "token"))),
                    lambda s: s["token"],
                ),
            )
        ).alias("chash"),
        F.count(F.lit(1)).cast("long").alias("c_toks"),
    )
    census = ch.groupBy("chash").agg(
        F.count_distinct(F.col("doc_id")).cast("long").alias("n_docs")
    )
    j = ch.join(census, "chash")
    dup_t = F.when(F.col("n_docs") >= 2, F.col("c_toks")).otherwise(F.lit(0))
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("c_toks").cast("long").alias("n_tokens"),
        F.sum((F.col("n_docs") >= 2).cast("int")).cast("long").alias("dup_chunks"),
        F.sum(dup_t).cast("long").alias("dup_tokens"),
        F.round(F.sum(dup_t).cast("double") / F.sum("c_toks"), 6).alias("dup_token_share"),
    )


@query(
    "ucb_arms",
    """WITH v AS (
         SELECT event_id, event_type,
                CAST(round(value * 1000000.0) AS BIGINT) AS v_fp
         FROM events),
       r AS (SELECT *, row_number() OVER (ORDER BY v_fp, event_id) AS rn,
                    count(*) OVER () AS nn FROM v),
       med AS (SELECT max(v_fp) AS m FROM r WHERE rn <= (nn + 1) // 2),
       arms AS (
         SELECT event_type, count(*)::BIGINT AS n,
                sum((v_fp >= med.m)::INT)::BIGINT AS s
         FROM v CROSS JOIN med GROUP BY event_type),
       tot AS (SELECT sum(n)::BIGINT AS nn FROM arms),
       scored AS (
         SELECT event_type AS arm, n, s,
                round(s::DOUBLE / n, 6) AS mean_reward,
                round(s::DOUBLE / n + sqrt(2.0 * ln(tot.nn::DOUBLE) / n::DOUBLE), 6) AS ucb
         FROM arms CROSS JOIN tot)
       SELECT arm, n, s, mean_reward, ucb,
              row_number() OVER (ORDER BY ucb DESC, arm)::BIGINT AS rank
       FROM scored""",
)
def q_ucb_arms(spark, sf_dir):
    """UCB1 bandit replay scoring (Auer, Cesa-Bianchi & Fischer, MLJ
    2002): treat each event_type as an arm, reward = value above the
    EXACT global lower median (integer-rank median — no interpolation
    ambiguity), and rank arms by mean + √(2·ln N / n). This is the
    offline-replay readout behind every explore/exploit rollout
    analysis. Plan: one global rank pass for the median (at corpus
    scale swap in the two-pass rank histogram, as group_quantiles
    documents), one arm census with map-side partial agg, then
    arm-grain math (a handful of rows); the transcendentals touch only
    the final once-rounded arm-grain expression."""
    ev = _events(spark, sf_dir)
    v = ev.select(
        "event_id", "event_type",
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("v_fp"),
    )
    n_all = v.count()
    wr = Window.orderBy("v_fp", "event_id")
    med = (
        v.select("v_fp", F.row_number().over(wr).alias("rn"))
        .where(F.col("rn") <= (n_all + 1) // 2)
        .agg(F.max("v_fp").alias("m"))
    )
    arms = (
        v.crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((F.col("v_fp") >= F.col("m")).cast("int")).cast("long").alias("s"),
        )
    )
    scored = arms.select(
        F.col("event_type").alias("arm"), "n", "s",
        F.round(F.col("s").cast("double") / F.col("n"), 6).alias("mean_reward"),
        F.round(
            F.col("s").cast("double") / F.col("n")
            + F.sqrt(F.lit(2.0) * F.log(F.lit(float(n_all))) / F.col("n").cast("double")),
            6,
        ).alias("ucb"),
    )
    w = Window.orderBy(F.desc("ucb"), "arm")
    return scored.select("*", F.row_number().over(w).cast("long").alias("rank"))


_DBSCAN_EPS = 3       # Euclidean radius in (token-count, avg-wordlen·100) space
_DBSCAN_MINNB = 4     # neighbors excluding self, i.e. classic minPts = 5


def _dbscan_sql(eps: int = _DBSCAN_EPS, min_nb: int = _DBSCAN_MINNB) -> str:
    return f"""WITH RECURSIVE f AS (
         SELECT doc_id,
                len(string_split(trim(text), ' '))::BIGINT AS x,
                round(100.0 * (length(trim(text)) - len(string_split(trim(text), ' ')) + 1)
                      / len(string_split(trim(text), ' ')))::BIGINT AS y
         FROM documents
         WHERE len(string_split(trim(text), ' ')) > 0),
       pairs AS (
         SELECT a.doc_id AS ia, b.doc_id AS ib
         FROM f a JOIN f b
           ON a.doc_id < b.doc_id
          AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {eps * eps}),
       sym AS (SELECT ia AS a, ib AS b FROM pairs
               UNION ALL SELECT ib, ia FROM pairs),
       deg AS (SELECT a AS doc_id, count(*)::BIGINT AS nb FROM sym GROUP BY a),
       core AS (SELECT doc_id FROM deg WHERE nb >= {min_nb}),
       cedges AS (
         SELECT s.a, s.b FROM sym s
         JOIN core ca ON ca.doc_id = s.a
         JOIN core cb ON cb.doc_id = s.b),
       reach(node, peer) AS (
         SELECT a, a FROM cedges
         UNION
         SELECT r.node, e.b FROM reach r JOIN cedges e ON r.peer = e.a),
       cc AS (SELECT node, min(peer)::BIGINT AS cluster_id FROM reach GROUP BY node),
       corec AS (
         SELECT core.doc_id, coalesce(cc.cluster_id, core.doc_id) AS cluster_id
         FROM core LEFT JOIN cc ON cc.node = core.doc_id),
       border AS (
         SELECT s.a AS doc_id, min(k.cluster_id)::BIGINT AS cluster_id
         FROM sym s
         JOIN corec k ON k.doc_id = s.b
         LEFT JOIN core c ON c.doc_id = s.a
         WHERE c.doc_id IS NULL
         GROUP BY s.a)
       SELECT f.doc_id, f.x, f.y,
              CASE WHEN corec.doc_id IS NOT NULL THEN 'core'
                   WHEN border.doc_id IS NOT NULL THEN 'border'
                   ELSE 'noise' END AS role,
              coalesce(corec.cluster_id, border.cluster_id) AS cluster_id
       FROM f
       LEFT JOIN corec ON corec.doc_id = f.doc_id
       LEFT JOIN border ON border.doc_id = f.doc_id"""


@query("dbscan_clusters", _dbscan_sql())
def q_dbscan_clusters(spark, sf_dir):
    """Grid-accelerated DBSCAN (Ester et al., KDD 1996) over the
    document (token-count, avg-word-length) plane: core = ≥4 neighbors
    within Euclidean eps=3 (minPts 5 counting self), clusters =
    connected components over core-core adjacency (reusing the dedup
    CC operator's min-label propagation), border points adopt the min
    cluster id of an adjacent core, the rest is noise. The neighbor
    search is the textbook scale shape: cell = eps-sized grid square,
    each point probes its 9 adjacent cells (equi-join on the cell key
    — NEVER an all-pairs distance join; with cell size = eps the grid
    candidates provably cover every true neighbor pair), then the
    exact integer distance filter. Density clustering like this is how
    curation pipelines find coherent document populations / outlier
    bands without a k guess. All coordinates and distances are exact
    int64; roles and labels are bit-deterministic."""
    eps, min_nb = _DBSCAN_EPS, _DBSCAN_MINNB
    d = _docs(spark, sf_dir)
    n_t = F.size(T.tokenize(F.col("text")))
    f = (
        d.where(n_t > 0)
        .select(
            "doc_id",
            n_t.cast("long").alias("x"),
            F.round(
                F.lit(100.0) * (F.length(F.trim(F.col("text"))) - n_t + 1) / n_t, 0
            ).cast("long").alias("y"),
        )
        .withColumn("cx", F.floor(F.col("x") / eps))
        .withColumn("cy", F.floor(F.col("y") / eps))
        .localCheckpoint(eager=True)  # feeds probe side, build side, final join
    )
    offs = F.explode(
        F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                  for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    )
    probe = f.select(
        F.col("doc_id").alias("ia"), F.col("x").alias("xa"), F.col("y").alias("ya"),
        "cx", "cy", offs.alias("o"),
    ).select(
        "ia", "xa", "ya",
        (F.col("cx") + F.col("o.dx")).alias("pcx"),
        (F.col("cy") + F.col("o.dy")).alias("pcy"),
    )
    build = f.select(
        F.col("doc_id").alias("ib"), F.col("x").alias("xb"), F.col("y").alias("yb"),
        F.col("cx").alias("pcx"), F.col("cy").alias("pcy"),
    )
    dist2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    pairs = (
        probe.join(build, ["pcx", "pcy"])
        .where((F.col("ia") < F.col("ib")) & (dist2 <= eps * eps))
        .select("ia", "ib")
        .localCheckpoint(eager=True)  # feeds degree census, CC edges, border join
    )
    sym = pairs.unionAll(pairs.select(F.col("ib").alias("ia"), F.col("ia").alias("ib")))
    deg = sym.groupBy("ia").agg(F.count(F.lit(1)).alias("nb"))
    core = deg.where(F.col("nb") >= min_nb).select(F.col("ia").alias("doc_id"))
    cedges = (
        sym.join(core.select(F.col("doc_id").alias("ia")), "ia")
        .join(core.select(F.col("doc_id").alias("ib")), "ib")
        .select(F.col("ia").alias("id_a"), F.col("ib").alias("id_b"))
    )
    cc = D.connected_components(cedges).select(
        F.col("doc_id"), F.col("cluster_id").cast("long").alias("cluster_id")
    )
    corec = core.join(cc, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )
    border = (
        sym.join(corec.select(F.col("doc_id").alias("ib"), "cluster_id"), "ib")
        .join(core.select(F.col("doc_id").alias("ia"), F.lit(1).alias("is_core")), "ia", "left")
        .where(F.col("is_core").isNull())
        .groupBy(F.col("ia").alias("doc_id"))
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    return (
        f.select("doc_id", "x", "y")
        .join(corec.withColumnRenamed("cluster_id", "c_core"), "doc_id", "left")
        .join(border.withColumnRenamed("cluster_id", "c_border"), "doc_id", "left")
        .select(
            "doc_id", "x", "y",
            F.when(F.col("c_core").isNotNull(), F.lit("core"))
            .when(F.col("c_border").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce("c_core", "c_border").alias("cluster_id"),
        )
    )


# --------------------------------------------------------------------------
# batch 27: clustering agreement (ARI/NMI), triangle counting, SMD balance

def _ari_sql(k: int = 8) -> str:
    from pliers_spark.operators.similarity import kmeans_assign_sql

    return f"""WITH assign AS ({kmeans_assign_sql(k=k)}),
       pairs AS (
         SELECT a.cluster_id AS ci, e.label::BIGINT AS lj
         FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id),
       ct AS (SELECT ci, lj, count(*)::BIGINT AS nij FROM pairs GROUP BY 1, 2),
       ra AS (SELECT ci, sum(nij)::BIGINT AS ai FROM ct GROUP BY ci),
       rb AS (SELECT lj, sum(nij)::BIGINT AS bj FROM ct GROUP BY lj),
       sums AS (
         SELECT (SELECT sum(nij * (nij - 1) / 2) FROM ct)::HUGEINT AS sij,
                (SELECT sum(ai * (ai - 1) / 2) FROM ra)::HUGEINT AS sa,
                (SELECT sum(bj * (bj - 1) / 2) FROM rb)::HUGEINT AS sb,
                (SELECT sum(nij) FROM ct)::HUGEINT AS n),
       mi AS (
         SELECT sum(ct.nij * CAST(round(1000000.0
                     * ln((ct.nij::DOUBLE * s.n::DOUBLE)
                          / (ra.ai::DOUBLE * rb.bj::DOUBLE))) AS BIGINT))::BIGINT AS mi_fp
         FROM ct JOIN ra USING (ci) JOIN rb USING (lj) CROSS JOIN sums s),
       ha AS (
         SELECT -sum(ai * CAST(round(1000000.0 * ln(ai::DOUBLE / s.n::DOUBLE)) AS BIGINT))::BIGINT AS ha_fp
         FROM ra CROSS JOIN sums s),
       hb AS (
         SELECT -sum(bj * CAST(round(1000000.0 * ln(bj::DOUBLE / s.n::DOUBLE)) AS BIGINT))::BIGINT AS hb_fp
         FROM rb CROSS JOIN sums s)
       SELECT
         round((s.n * (s.n - 1) / 2 * s.sij - s.sa * s.sb)::DOUBLE
               / ((s.n * (s.n - 1) / 2)::DOUBLE * ((s.sa + s.sb)::DOUBLE / 2.0)
                  - (s.sa * s.sb)::DOUBLE), 6) AS ari,
         round(mi.mi_fp::DOUBLE / sqrt(ha.ha_fp::DOUBLE * hb.hb_fp::DOUBLE), 6) AS nmi,
         s.sij::BIGINT AS pair_agree, s.sa::BIGINT AS pairs_pred,
         s.sb::BIGINT AS pairs_true, s.n::BIGINT AS n
       FROM sums s CROSS JOIN mi CROSS JOIN ha CROSS JOIN hb"""


@query("ari_nmi", _ari_sql())
def q_ari_nmi(spark, sf_dir):
    """Clustering-agreement evaluation: Adjusted Rand Index (Hubert &
    Arabie 1985) and Normalized Mutual Information between the exact
    int64 k-means assignment and the embeddings' ground-truth labels —
    the standard pair of external clustering metrics. ARI is pure pair
    combinatorics: ΣC(nᵢⱼ,2), ΣC(aᵢ,2), ΣC(bⱼ,2) as exact integers
    (DECIMAL(38,0)/HUGEINT headroom), ONE final double division. NMI's
    per-cell logs round once to integer micro-nats so MI and the two
    entropies are exact int sums; the 1e6·n scale cancels in the ratio.
    Plan: one contingency census (the only corpus shuffle), everything
    after is k×L-grain."""
    from pliers_spark.operators.similarity import kmeans_assign

    dec = "decimal(38,0)"
    emb = load_table(spark, sf_dir, "embeddings")
    assign = kmeans_assign(emb, k=8).select("vec_id", "cluster_id")
    ct = (
        assign.join(emb.select("vec_id", F.col("label").cast("long").alias("lj")), "vec_id")
        .groupBy(F.col("cluster_id").alias("ci"), "lj")
        .agg(F.count(F.lit(1)).cast("long").alias("nij"))
        .localCheckpoint(eager=True)  # feeds row sums, col sums, MI
    )
    ra = ct.groupBy("ci").agg(F.sum("nij").cast("long").alias("ai"))
    rb = ct.groupBy("lj").agg(F.sum("nij").cast("long").alias("bj"))
    c2 = lambda c: (F.col(c).cast(dec) * (F.col(c) - 1).cast(dec) / 2).cast(dec)  # noqa: E731
    sums = (
        ct.agg(F.sum(c2("nij")).cast(dec).alias("sij"), F.sum("nij").cast(dec).alias("n"))
        .crossJoin(ra.agg(F.sum(c2("ai")).cast(dec).alias("sa")))
        .crossJoin(rb.agg(F.sum(c2("bj")).cast(dec).alias("sb")))
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    mi = (
        ct.join(ra, "ci").join(rb, "lj").crossJoin(F.broadcast(sums))
        .select(
            (
                F.col("nij")
                * F.round(
                    F.lit(1e6) * F.log((d_("nij") * d_("n")) / (d_("ai") * d_("bj"))), 0
                ).cast("long")
            ).alias("term")
        )
        .agg(F.sum("term").cast("long").alias("mi_fp"))
    )
    ha = (
        ra.crossJoin(F.broadcast(sums))
        .select((F.col("ai") * F.round(F.lit(1e6) * F.log(d_("ai") / d_("n")), 0).cast("long")).alias("t"))
        .agg((-F.sum("t")).cast("long").alias("ha_fp"))
    )
    hb = (
        rb.crossJoin(F.broadcast(sums))
        .select((F.col("bj") * F.round(F.lit(1e6) * F.log(d_("bj") / d_("n")), 0).cast("long")).alias("t"))
        .agg((-F.sum("t")).cast("long").alias("hb_fp"))
    )
    cn2 = (F.col("n") * (F.col("n") - F.lit(1).cast(dec)) / 2).cast(dec)
    return (
        sums.crossJoin(mi).crossJoin(ha).crossJoin(hb)
        .select(
            F.round(
                (cn2 * F.col("sij") - F.col("sa") * F.col("sb")).cast("double")
                / (
                    cn2.cast("double") * ((F.col("sa") + F.col("sb")).cast("double") / F.lit(2.0))
                    - (F.col("sa") * F.col("sb")).cast("double")
                ),
                6,
            ).alias("ari"),
            F.round(
                F.col("mi_fp").cast("double")
                / F.sqrt(F.col("ha_fp").cast("double") * F.col("hb_fp").cast("double")),
                6,
            ).alias("nmi"),
            F.col("sij").cast("long").alias("pair_agree"),
            F.col("sa").cast("long").alias("pairs_pred"),
            F.col("sb").cast("long").alias("pairs_true"),
            F.col("n").cast("long").alias("n"),
        )
    )


def _tri_sql(basket_cap: int = 20) -> str:
    return f"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       sized AS (SELECT l_orderkey FROM op GROUP BY l_orderkey
                 HAVING count(*) BETWEEN 2 AND {basket_cap}),
       b AS (SELECT op.* FROM op JOIN sized USING (l_orderkey)),
       e AS (
         SELECT DISTINCT a.l_partkey AS u, bb.l_partkey AS v
         FROM b a JOIN b bb ON a.l_orderkey = bb.l_orderkey
                           AND a.l_partkey < bb.l_partkey),
       sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
       deg AS (SELECT a AS node, count(*)::BIGINT AS d FROM sym GROUP BY a),
       o AS (
         SELECT s.a AS src, s.b AS dst
         FROM sym s JOIN deg da ON da.node = s.a JOIN deg db ON db.node = s.b
         WHERE (da.d, s.a) < (db.d, s.b)),
       tri AS (
         SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
         FROM o e1 JOIN o e2 ON e1.src = e2.src AND e1.dst <> e2.dst
         JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst),
       pert AS (
         SELECT node, count(*)::BIGINT AS t FROM (
           SELECT u AS node FROM tri
           UNION ALL SELECT v FROM tri
           UNION ALL SELECT w FROM tri) GROUP BY node)
       SELECT deg.node AS part_id, deg.d AS degree,
              coalesce(pert.t, 0)::BIGINT AS triangles,
              CASE WHEN deg.d >= 2
                   THEN round(2.0 * coalesce(pert.t, 0) / (deg.d * (deg.d - 1)), 6)
                   ELSE 0.0 END AS clustering_coeff
       FROM deg LEFT JOIN pert ON pert.node = deg.node"""


@query("triangle_coeffs", _tri_sql())
def q_triangle_coeffs(spark, sf_dir):
    """Per-node triangle counts and local clustering coefficient over
    the co-purchase graph, via DEGREE-ORDERED edge orientation (the
    Schank-Wagner/Cohen MapReduce trick): each undirected edge points
    from its lower-(degree, id) endpoint to the higher one, so every
    triangle is enumerated exactly once from its lowest vertex and the
    wedge-join fan-out is bounded by out-degree ≤ O(√m) (graph
    arboricity) instead of max raw degree — THE difference between a
    plan that survives a power-law graph at 100× and one hot task
    materializing a celebrity node's d² wedges. Plan: basket-capped
    distinct edge census, degree census, two self-joins on the
    oriented edge key. Everything integer; coefficient rounds once."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        op.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("bs"))
        .where((F.col("bs") >= 2) & (F.col("bs") <= 20)).select("l_orderkey")
    )
    b = op.join(sized, "l_orderkey")
    e = (
        b.alias("x").join(b.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("u"), F.col("y.l_partkey").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)  # feeds degree census + orientation
    )
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d")).withColumnRenamed("u", "node")
    o = (
        sym.join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
        .where(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select(F.col("u").alias("src"), F.col("v").alias("dst"), F.col("dv").alias("dd"))
        .localCheckpoint(eager=True)  # feeds wedge join twice + closing probe
    )
    # enumerate each wedge ONCE in orientation order: the closing edge
    # v->w exists only with (deg_v, v) < (deg_w, w), so generating the
    # (w, v) ordering doubles the shuffle for rows that can never match
    # (this halved the sf0.1 wall time of the wedge join)
    e1 = o.select(F.col("src"), F.col("dst").alias("v"), F.col("dd").alias("dv_"))
    e2 = o.select(F.col("src"), F.col("dst").alias("w"), F.col("dd").alias("dw_"))
    wedges = e1.join(e2, "src").where(
        (F.col("dv_") < F.col("dw_"))
        | ((F.col("dv_") == F.col("dw_")) & (F.col("v") < F.col("w")))
    )
    closing = o.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedges.join(closing, ["v", "w"]).select(
        F.col("src").alias("u"), "v", "w"
    )
    pert = (
        tri.select(F.col("u").alias("node"))
        .unionAll(tri.select(F.col("v").alias("node")))
        .unionAll(tri.select(F.col("w").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
    )
    return deg.join(pert, "node", "left").select(
        F.col("node").alias("part_id"),
        F.col("d").alias("degree"),
        F.coalesce("t", F.lit(0)).cast("long").alias("triangles"),
        F.when(
            F.col("d") >= 2,
            F.round(
                F.lit(2.0) * F.coalesce("t", F.lit(0)) / (F.col("d") * (F.col("d") - 1)),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("clustering_coeff"),
    )


@query(
    "covariate_balance",
    """WITH base AS (
         SELECT (o_orderpriority = '1-URGENT')::INT AS treat,
                CAST(round(o_totalprice * 100.0) AS BIGINT) AS price_fp,
                dayofweek(o_orderdate)::BIGINT AS dow,
                month(o_orderdate)::BIGINT AS mon
         FROM orders),
       stacked AS (
         SELECT treat, 'price_fp' AS covariate, price_fp AS v FROM base
         UNION ALL SELECT treat, 'dow', dow FROM base
         UNION ALL SELECT treat, 'mon', mon FROM base),
       g AS (
         SELECT covariate, treat, count(*)::BIGINT AS n,
                sum(v)::BIGINT AS s, sum(v::HUGEINT * v::HUGEINT) AS q
         FROM stacked GROUP BY 1, 2),
       wide AS (
         SELECT covariate,
                max(CASE WHEN treat = 1 THEN n END) AS n1,
                max(CASE WHEN treat = 1 THEN s END) AS s1,
                max(CASE WHEN treat = 1 THEN q END) AS q1,
                max(CASE WHEN treat = 0 THEN n END) AS n0,
                max(CASE WHEN treat = 0 THEN s END) AS s0,
                max(CASE WHEN treat = 0 THEN q END) AS q0
         FROM g GROUP BY covariate)
       SELECT covariate, n1::BIGINT AS n1, n0::BIGINT AS n0,
              CASE WHEN (q1::DOUBLE / n1 - (s1::DOUBLE / n1) * (s1::DOUBLE / n1))
                        + (q0::DOUBLE / n0 - (s0::DOUBLE / n0) * (s0::DOUBLE / n0)) > 0
                   THEN round((s1::DOUBLE / n1 - s0::DOUBLE / n0)
                    / sqrt(((q1::DOUBLE / n1 - (s1::DOUBLE / n1) * (s1::DOUBLE / n1))
                            + (q0::DOUBLE / n0 - (s0::DOUBLE / n0) * (s0::DOUBLE / n0))) / 2.0),
                    6) END AS smd
       FROM wide""",
)
def q_covariate_balance(spark, sf_dir):
    """Covariate-balance table (standardized mean difference — the
    causal-inference / A-B-assignment health check; |SMD| ≤ 0.1 is the
    conventional balance bar): treatment = urgent order priority,
    covariates stacked long so ONE census shuffle covers all of them.
    Sufficient stats (n, Σv, Σv²) are exact int64/HUGEINT; the SMD
    expression is the identical double shape on both engines with one
    final rounding. The stack-then-census shape is how a real pipeline
    checks dozens of covariates without dozens of passes."""
    o = load_table(spark, sf_dir, "orders")
    dec = "decimal(38,0)"
    base = o.select(
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("treat"),
        F.round(F.col("o_totalprice") * 100.0, 0).cast("long").alias("price_fp"),
        F.dayofweek(F.col("o_orderdate")).cast("long").alias("dow"),
        F.month(F.col("o_orderdate")).cast("long").alias("mon"),
    )
    stacked = base.select(
        "treat",
        F.explode(
            F.array(
                F.struct(F.lit("price_fp").alias("covariate"), F.col("price_fp").alias("v")),
                F.struct(F.lit("dow").alias("covariate"), F.col("dow").alias("v")),
                F.struct(F.lit("mon").alias("covariate"), F.col("mon").alias("v")),
            )
        ).alias("cv"),
    ).select("treat", "cv.covariate", "cv.v")
    g = stacked.groupBy("covariate", "treat").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
        F.sum(F.col("v").cast(dec) * F.col("v").cast(dec)).cast(dec).alias("q"),
    )
    wide = g.groupBy("covariate").agg(
        F.max(F.when(F.col("treat") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("treat") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("treat") == 1, F.col("q"))).alias("q1"),
        F.max(F.when(F.col("treat") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("treat") == 0, F.col("s"))).alias("s0"),
        F.max(F.when(F.col("treat") == 0, F.col("q"))).alias("q0"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    m1, m0 = d_("s1") / d_("n1"), d_("s0") / d_("n0")
    v1 = d_("q1") / d_("n1") - m1 * m1
    v0 = d_("q0") / d_("n0") - m0 * m0
    return wide.select(
        "covariate",
        F.col("n1").cast("long").alias("n1"),
        F.col("n0").cast("long").alias("n0"),
        # zero pooled variance (constant covariate) -> NULL, not a 0/0:
        # Spark ANSI mode rightly refuses the division
        F.when(
            v1 + v0 > 0, F.round((m1 - m0) / F.sqrt((v1 + v0) / F.lit(2.0)), 6)
        ).alias("smd"),
    )


# --------------------------------------------------------------------------
# batch 28: 1-D Wasserstein drift, TextTiling gaps, degree assortativity

@query(
    "wasserstein_1d",
    """WITH c AS (
         SELECT source, n_chars::BIGINT AS v, count(*)::BIGINT AS cnt
         FROM documents GROUP BY 1, 2),
       ns AS (SELECT source, sum(cnt)::BIGINT AS n FROM c GROUP BY source),
       pr AS (
         SELECT a.source AS src_a, a.n AS na, b.source AS src_b, b.n AS nb
         FROM ns a JOIN ns b ON a.source < b.source),
       vals AS (SELECT DISTINCT v FROM c),
       grid AS (
         SELECT pr.src_a, pr.src_b, pr.na, pr.nb, vals.v,
                coalesce(ca.cnt, 0) AS ca, coalesce(cb.cnt, 0) AS cb
         FROM pr CROSS JOIN vals
         LEFT JOIN c ca ON ca.source = pr.src_a AND ca.v = vals.v
         LEFT JOIN c cb ON cb.source = pr.src_b AND cb.v = vals.v),
       cum AS (
         SELECT src_a, src_b, na, nb, v,
                sum(ca) OVER (PARTITION BY src_a, src_b ORDER BY v) AS cua,
                sum(cb) OVER (PARTITION BY src_a, src_b ORDER BY v) AS cub,
                lead(v) OVER (PARTITION BY src_a, src_b ORDER BY v) AS nxt
         FROM grid)
       SELECT src_a, src_b,
              round(sum(abs(cua * nb - cub * na) * (nxt - v))::DOUBLE
                    / (na::DOUBLE * nb::DOUBLE), 6) AS w1
       FROM cum WHERE nxt IS NOT NULL
       GROUP BY src_a, src_b, na, nb""",
)
def q_wasserstein_1d(spark, sf_dir):
    """Exact 1-D Wasserstein-1 (earth-mover) distance between every
    source pair's document-length distribution — the drift metric that,
    unlike KS (`ks_drift`), measures HOW FAR mass moved, not just the
    max ECDF gap: W1 = ∫|F_A − F_B| = Σ_segments |cumA·nB − cumB·nA|·gap
    / (nA·nB), all integer until ONE final division. Plan: one
    (source, value) census, the segment grid lives at (pairs × distinct
    values) grain with a single window cumsum per pair — the corpus is
    never re-scanned per pair. The shared global value grid adds only
    zero-count segments, which contribute the same |diff|·gap as the
    merged-support formulation."""
    d = _docs(spark, sf_dir)
    c = d.groupBy("source", F.col("n_chars").cast("long").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    ).localCheckpoint(eager=True)  # feeds per-source totals + both grid sides
    ns = c.groupBy("source").agg(F.sum("cnt").cast("long").alias("n"))
    a = ns.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    b = ns.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    pr = a.join(b, F.col("src_a") < F.col("src_b"))
    vals = c.select("v").distinct()
    grid = (
        pr.crossJoin(vals)
        .join(
            c.select(F.col("source").alias("src_a"), "v", F.col("cnt").alias("ca")),
            ["src_a", "v"], "left",
        )
        .join(
            c.select(F.col("source").alias("src_b"), "v", F.col("cnt").alias("cb")),
            ["src_b", "v"], "left",
        )
        .select(
            "src_a", "src_b", "na", "nb", "v",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    w = Window.partitionBy("src_a", "src_b").orderBy("v")
    cum = grid.select(
        "src_a", "src_b", "na", "nb", "v",
        F.sum("ca").over(w).alias("cua"),
        F.sum("cb").over(w).alias("cub"),
        F.lead("v").over(w).alias("nxt"),
    )
    return (
        cum.where(F.col("nxt").isNotNull())
        .groupBy("src_a", "src_b", "na", "nb")
        .agg(
            F.round(
                F.sum(
                    F.abs(F.col("cua") * F.col("nb") - F.col("cub") * F.col("na"))
                    * (F.col("nxt") - F.col("v"))
                ).cast("double")
                / (F.col("na").cast("double") * F.col("nb").cast("double")),
                6,
            ).alias("w1")
        )
        .select("src_a", "src_b", "w1")
    )


_TILE_W = 10  # tokens per TextTiling block


def _texttiling_sql(w: int = _TILE_W) -> str:
    return f"""WITH toks AS (
         SELECT doc_id, t.token, t.pos::BIGINT AS pos
         FROM (SELECT doc_id,
                      unnest(string_split(trim(text), ' ')) AS token,
                      generate_subscripts(string_split(trim(text), ' '), 1) - 1 AS pos
               FROM documents) t(doc_id, token, pos)),
       tf AS (
         SELECT doc_id, (pos // {w})::BIGINT AS blk, token, count(*)::BIGINT AS c
         FROM toks GROUP BY 1, 2, 3),
       nrm AS (SELECT doc_id, blk, sum(c * c)::BIGINT AS n2 FROM tf GROUP BY 1, 2),
       dots AS (
         SELECT a.doc_id, a.blk AS gap_idx, sum(a.c * b.c)::BIGINT AS dot
         FROM tf a JOIN tf b ON a.doc_id = b.doc_id AND b.blk = a.blk + 1
                            AND a.token = b.token
         GROUP BY 1, 2),
       gaps AS (
         SELECT n1.doc_id, n1.blk AS gap_idx,
                round(coalesce(d.dot, 0)::DOUBLE
                      / sqrt(n1.n2::DOUBLE * n2.n2::DOUBLE), 6) AS cosine
         FROM nrm n1 JOIN nrm n2 ON n1.doc_id = n2.doc_id AND n2.blk = n1.blk + 1
         LEFT JOIN dots d ON d.doc_id = n1.doc_id AND d.gap_idx = n1.blk)
       SELECT doc_id, gap_idx, cosine,
              (cosine < coalesce(lag(cosine) OVER dw, 1e9)
               AND cosine < coalesce(lead(cosine) OVER dw, 1e9)) AS is_valley
       FROM gaps
       WINDOW dw AS (PARTITION BY doc_id ORDER BY gap_idx)"""


@query("texttiling_gaps", _texttiling_sql())
def q_texttiling_gaps(spark, sf_dir):
    """TextTiling topic-segmentation signal (Hearst, CL 1997): cosine
    lexical cohesion between adjacent {_TILE_W}-token blocks of each
    document; a strict local minimum (valley) marks a candidate topic
    boundary — the pre-chunking step for retrieval indexing that
    respects topic structure instead of fixed windows. Dot products
    and norms are exact int64 token-count sums (ONE rounding at the
    cosine); blocks with no shared vocabulary coalesce to dot 0. Plan:
    posexplode → (doc, block, token) census → adjacent-block self-join
    on the SAME (doc, token) key + one per-doc window for the valley
    flag — every shuffle is doc-keyed, so partitions stay aligned."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.posexplode(T.tokenize(F.col("text"))).alias("pos", "token")
    )
    tf = toks.groupBy(
        "doc_id",
        F.floor(F.col("pos") / _TILE_W).cast("long").alias("blk"),
        "token",
    ).agg(F.count(F.lit(1)).cast("long").alias("c")).localCheckpoint(eager=True)
    nrm = tf.groupBy("doc_id", "blk").agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("n2")
    )
    a = tf.select("doc_id", F.col("blk").alias("gap_idx"), "token", F.col("c").alias("ca"))
    bb = tf.select("doc_id", (F.col("blk") - 1).alias("gap_idx"), "token", F.col("c").alias("cb"))
    dots = (
        a.join(bb, ["doc_id", "gap_idx", "token"])
        .groupBy("doc_id", "gap_idx")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("dot"))
    )
    n1 = nrm.select("doc_id", F.col("blk").alias("gap_idx"), F.col("n2").alias("n2a"))
    n2 = nrm.select("doc_id", (F.col("blk") - 1).alias("gap_idx"), F.col("n2").alias("n2b"))
    gaps = (
        n1.join(n2, ["doc_id", "gap_idx"])
        .join(dots, ["doc_id", "gap_idx"], "left")
        .select(
            "doc_id", "gap_idx",
            F.round(
                F.coalesce("dot", F.lit(0)).cast("double")
                / F.sqrt(F.col("n2a").cast("double") * F.col("n2b").cast("double")),
                6,
            ).alias("cosine"),
        )
    )
    dw = Window.partitionBy("doc_id").orderBy("gap_idx")
    big = F.lit(1e9)
    return gaps.select(
        "doc_id", "gap_idx", "cosine",
        (
            (F.col("cosine") < F.coalesce(F.lag("cosine").over(dw), big))
            & (F.col("cosine") < F.coalesce(F.lead("cosine").over(dw), big))
        ).alias("is_valley"),
    )


@query(
    "degree_assortativity",
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       sized AS (SELECT l_orderkey FROM op GROUP BY l_orderkey
                 HAVING count(*) BETWEEN 2 AND 20),
       b AS (SELECT op.* FROM op JOIN sized USING (l_orderkey)),
       e AS (
         SELECT DISTINCT a.l_partkey AS u, bb.l_partkey AS v
         FROM b a JOIN b bb ON a.l_orderkey = bb.l_orderkey
                           AND a.l_partkey < bb.l_partkey),
       sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
       deg AS (SELECT a AS node, count(*)::BIGINT AS d FROM sym GROUP BY a),
       ed AS (
         SELECT da.d AS du, db.d AS dv
         FROM sym s JOIN deg da ON da.node = s.a JOIN deg db ON db.node = s.b),
       st AS (
         SELECT count(*)::HUGEINT AS m, sum(du)::HUGEINT AS sx,
                sum(du::HUGEINT * du::HUGEINT) AS sxx,
                sum(du::HUGEINT * dv::HUGEINT) AS sxy
         FROM ed)
       SELECT (m / 2)::BIGINT AS n_edges,
              CASE WHEN m * sxx - sx * sx > 0
                   THEN round((m * sxy - sx * sx)::DOUBLE
                              / (m * sxx - sx * sx)::DOUBLE, 6) END AS assortativity
       FROM st""",
)
def q_degree_assortativity(spark, sf_dir):
    """Degree assortativity coefficient (Newman, PRL 2002): the Pearson
    correlation of endpoint degrees over the symmetrized co-purchase
    edge list — positive means hubs link hubs (social-style), negative
    means hub-spoke (web/retail-style); the one-number summary that
    predicts whether skew defenses will be needed downstream. The
    symmetric edge orientation makes Sx = Sy and Sxx = Syy, so
    r = (m·Sxy − Sx²)/(m·Sxx − Sx²) with every sufficient statistic an
    exact DECIMAL(38,0) sum and ONE final rounded division (NULL on a
    degree-regular graph). Plan: edge census, degree census, two
    degree joins, one global agg — no window, no driver math."""
    dec = "decimal(38,0)"
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        op.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("bs"))
        .where((F.col("bs") >= 2) & (F.col("bs") <= 20)).select("l_orderkey")
    )
    b = op.join(sized, "l_orderkey")
    e = (
        b.alias("x").join(b.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("u"), F.col("y.l_partkey").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d")).withColumnRenamed("u", "node")
    ed = (
        sym.join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
        .select("du", "dv")
    )
    st = ed.agg(
        F.count(F.lit(1)).cast(dec).alias("m"),
        F.sum("du").cast(dec).alias("sx"),
        F.sum(F.col("du").cast(dec) * F.col("du").cast(dec)).cast(dec).alias("sxx"),
        F.sum(F.col("du").cast(dec) * F.col("dv").cast(dec)).cast(dec).alias("sxy"),
    )
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sx")
    den = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    return st.select(
        (F.col("m") / 2).cast("long").alias("n_edges"),
        F.when(den > 0, F.round(num.cast("double") / den.cast("double"), 6)).alias(
            "assortativity"
        ),
    )


# --------------------------------------------------------------------------
# batch 29: Mann-Kendall + Sen slope, Kruskal-Wallis, CMH stratified odds

_MK_MIN_N = 5
_MK_CAP = 500  # series longer than this are excluded (quadratic pair guard)


def _mk_sql(min_n: int = _MK_MIN_N, cap: int = _MK_CAP) -> str:
    return f"""WITH v AS (
         SELECT user_id, epoch_us(ts)::BIGINT AS t_us,
                CAST(round(value * 1000000.0) AS BIGINT) AS v_fp,
                row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                count(*) OVER (PARTITION BY user_id) AS n
         FROM events),
       g AS (SELECT * FROM v WHERE n BETWEEN {min_n} AND {cap}),
       p AS (
         SELECT a.user_id, a.n,
                CASE WHEN b.v_fp > a.v_fp THEN 1
                     WHEN b.v_fp < a.v_fp THEN -1 ELSE 0 END AS sgn,
                CASE WHEN b.t_us <> a.t_us
                     THEN CAST(round(1000000.0 * (b.v_fp - a.v_fp)::DOUBLE
                                     / (b.t_us - a.t_us)::DOUBLE) AS BIGINT)
                END AS slope_fp
         FROM g a JOIN g b ON a.user_id = b.user_id AND a.rn < b.rn),
       s AS (
         SELECT user_id, any_value(n)::BIGINT AS n, sum(sgn)::BIGINT AS mk_s
         FROM p GROUP BY user_id),
       sl AS (
         SELECT user_id, slope_fp,
                row_number() OVER (PARTITION BY user_id ORDER BY slope_fp) AS srn,
                count(*) OVER (PARTITION BY user_id) AS m
         FROM p WHERE slope_fp IS NOT NULL),
       sen AS (
         SELECT user_id, max(slope_fp)::BIGINT AS sen_slope_fp
         FROM sl WHERE srn <= (m + 1) // 2 GROUP BY user_id)
       SELECT s.user_id, s.n, s.mk_s,
              round(2.0 * s.mk_s / (s.n * (s.n - 1)), 6) AS tau,
              sen.sen_slope_fp
       FROM s LEFT JOIN sen USING (user_id)"""


@query("mann_kendall_sen", _mk_sql())
def q_mann_kendall_sen(spark, sf_dir):
    """Mann-Kendall trend test + Sen's slope per user series (Mann 1945,
    Kendall 1975; Sen, JASA 1968) — the standard nonparametric
    monotone-trend pair for noisy series: S = Σ sign(vⱼ−vᵢ) over
    time-ordered pairs (exact int), τ-a = 2S/n(n−1) (one rounded
    division), Sen slope = EXACT lower median of the pairwise
    micro-unit slopes (integer rank, no interpolation; same-timestamp
    pairs excluded). The O(n²) per-series pair join is gated to
    {_MK_MIN_N} ≤ n ≤ {_MK_CAP} — at crawl scale a bot user with 10⁶
    events would otherwise put 10¹² pairs on one task (the item_cosine
    basket-cap discipline). Plan: one user-key window pass, one
    user-key self-join (co-partitioned — no second shuffle), two
    user-grain aggs."""
    ev = _events(spark, sf_dir)
    from pliers_spark.operators._util import epoch_micros

    wu = Window.partitionBy("user_id")
    v = ev.select(
        "user_id",
        epoch_micros(ev, "ts").cast("long").alias("t_us"),
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("v_fp"),
        F.row_number().over(wu.orderBy("ts", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wu).alias("n"),
    )
    g = v.where((F.col("n") >= _MK_MIN_N) & (F.col("n") <= _MK_CAP)).localCheckpoint(
        eager=True
    )
    a = g.select("user_id", "n", F.col("rn").alias("ra"), F.col("t_us").alias("ta"), F.col("v_fp").alias("va"))
    b = g.select("user_id", F.col("rn").alias("rb"), F.col("t_us").alias("tb"), F.col("v_fp").alias("vb"))
    p = (
        a.join(b, "user_id")
        .where(F.col("ra") < F.col("rb"))
        .select(
            "user_id", "n",
            F.when(F.col("vb") > F.col("va"), 1)
            .when(F.col("vb") < F.col("va"), -1)
            .otherwise(0)
            .alias("sgn"),
            F.when(
                F.col("tb") != F.col("ta"),
                F.round(
                    F.lit(1e6) * (F.col("vb") - F.col("va")).cast("double")
                    / (F.col("tb") - F.col("ta")).cast("double"),
                    0,
                ).cast("long"),
            ).alias("slope_fp"),
        )
        .localCheckpoint(eager=True)  # feeds S agg and the slope median
    )
    s = p.groupBy("user_id").agg(
        F.first("n").cast("long").alias("n"), F.sum("sgn").cast("long").alias("mk_s")
    )
    ws = Window.partitionBy("user_id").orderBy("slope_fp")
    sl = p.where(F.col("slope_fp").isNotNull()).select(
        "user_id", "slope_fp",
        F.row_number().over(ws).alias("srn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("m"),
    )
    sen = (
        sl.where(F.col("srn") <= (F.col("m") + 1) / 2)
        .groupBy("user_id")
        .agg(F.max("slope_fp").cast("long").alias("sen_slope_fp"))
    )
    return s.join(sen, "user_id", "left").select(
        "user_id", "n", "mk_s",
        F.round(F.lit(2.0) * F.col("mk_s") / (F.col("n") * (F.col("n") - 1)), 6).alias("tau"),
        "sen_slope_fp",
    )


@query(
    "kruskal_wallis",
    """WITH v AS (
         SELECT event_type, CAST(round(value * 1000000.0) AS BIGINT) AS v_fp
         FROM events),
       dist AS (SELECT v_fp, count(*)::BIGINT AS eq FROM v GROUP BY v_fp),
       rk AS (
         SELECT v_fp, eq,
                2 * (sum(eq) OVER (ORDER BY v_fp) - eq) + eq + 1 AS r2
         FROM dist),
       per_g AS (
         SELECT v.event_type, count(*)::BIGINT AS ni, sum(rk.r2)::BIGINT AS r2i
         FROM v JOIN rk USING (v_fp) GROUP BY v.event_type),
       tot AS (
         SELECT sum(ni)::BIGINT AS n,
                (SELECT sum(eq * eq * eq - eq) FROM dist)::BIGINT AS tie3
         FROM per_g),
       h AS (
         SELECT (SELECT count(*) FROM per_g)::BIGINT AS k, tot.n, tot.tie3,
                12.0 / (tot.n::DOUBLE * (tot.n + 1)::DOUBLE)
                  * (SELECT sum((r2i::DOUBLE / 2.0) * (r2i::DOUBLE / 2.0) / ni::DOUBLE)
                     FROM per_g)
                  - 3.0 * (tot.n + 1)::DOUBLE AS h_raw
         FROM tot)
       SELECT k, n, round(h_raw, 6) AS h,
              CASE WHEN tie3 < n * n * n - n
                   THEN round(h_raw / (1.0 - tie3::DOUBLE / (n::DOUBLE * n::DOUBLE * n::DOUBLE - n::DOUBLE)), 6)
              END AS h_tie_corrected
       FROM h""",
)
def q_kruskal_wallis(spark, sf_dir):
    """Kruskal-Wallis rank one-way ANOVA across event types (Kruskal &
    Wallis, JASA 1952) — the nonparametric twin of
    `seasonality_strength`'s parametric R²: H = 12/(N(N+1))·ΣRᵢ²/nᵢ −
    3(N+1) with average-rank ties and the Σ(t³−t) tie correction.
    Ranks never touch a float: the DOUBLED average rank of a value is
    2·|{<v}| + |{=v}| + 1 — an exact integer from the value census —
    so per-group rank sums are exact int64 and H is one identical
    double expression on both engines. Plan: value census (one
    shuffle), a value-grain running-sum window, one join back on the
    value key, group-grain math."""
    ev = _events(spark, sf_dir)
    v = ev.select(
        "event_type", F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("v_fp")
    )
    dist = v.groupBy("v_fp").agg(F.count(F.lit(1)).cast("long").alias("eq"))
    wv = Window.orderBy("v_fp").rowsBetween(Window.unboundedPreceding, 0)
    rk = dist.select(
        "v_fp", "eq",
        (2 * (F.sum("eq").over(wv) - F.col("eq")) + F.col("eq") + 1).alias("r2"),
    )
    per_g = (
        v.join(rk, "v_fp")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("ni"), F.sum("r2").cast("long").alias("r2i"))
    )
    tot = per_g.agg(
        F.count(F.lit(1)).cast("long").alias("k"), F.sum("ni").cast("long").alias("n")
    ).crossJoin(
        dist.agg(
            F.sum(F.col("eq") * F.col("eq") * F.col("eq") - F.col("eq"))
            .cast("long")
            .alias("tie3")
        )
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    ssum = per_g.agg(
        F.sum(
            (d_("r2i") / F.lit(2.0)) * (d_("r2i") / F.lit(2.0)) / d_("ni")
        ).alias("ss")
    )
    j = tot.crossJoin(ssum)
    h_raw = (
        F.lit(12.0) / (d_("n") * (F.col("n") + 1).cast("double")) * F.col("ss")
        - F.lit(3.0) * (F.col("n") + 1).cast("double")
    )
    nnn = d_("n") * d_("n") * d_("n") - d_("n")
    return j.select(
        "k", "n",
        F.round(h_raw, 6).alias("h"),
        F.when(
            F.col("tie3") < F.col("n") * F.col("n") * F.col("n") - F.col("n"),
            F.round(h_raw / (F.lit(1.0) - d_("tie3") / nnn), 6),
        ).alias("h_tie_corrected"),
    )


@query(
    "cmh_odds",
    """WITH b AS (
         SELECT month(o_orderdate)::BIGINT AS stratum,
                (o_orderpriority = '1-URGENT')::INT AS t,
                (o_orderstatus = 'F')::INT AS y
         FROM orders),
       s AS (
         SELECT stratum,
                sum((t = 1 AND y = 1)::INT)::BIGINT AS a,
                sum((t = 1 AND y = 0)::INT)::BIGINT AS bb,
                sum((t = 0 AND y = 1)::INT)::BIGINT AS c,
                sum((t = 0 AND y = 0)::INT)::BIGINT AS d,
                count(*)::BIGINT AS n
         FROM b GROUP BY stratum),
       fp AS (
         SELECT sum(CAST(round(1000000.0 * a * d / n) AS BIGINT))::BIGINT AS num_fp,
                sum(CAST(round(1000000.0 * bb * c / n) AS BIGINT))::BIGINT AS den_fp,
                count(*)::BIGINT AS n_strata,
                sum(a)::BIGINT AS a_tot, sum(bb)::BIGINT AS b_tot,
                sum(c)::BIGINT AS c_tot, sum(d)::BIGINT AS d_tot
         FROM s)
       SELECT n_strata,
              round(num_fp::DOUBLE / den_fp::DOUBLE, 6) AS or_cmh,
              round((a_tot * d_tot)::DOUBLE / (b_tot * c_tot)::DOUBLE, 6) AS or_pooled,
              round(ln(num_fp::DOUBLE / den_fp::DOUBLE), 6) AS log_or_cmh
       FROM fp""",
)
def q_cmh_odds(spark, sf_dir):
    """Cochran-Mantel-Haenszel stratified odds ratio (Mantel & Haenszel,
    JNCI 1959): the Simpson's-paradox-safe pooled effect of urgent
    priority on order-failure odds, stratified by order month —
    OR_CMH = Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ), reported next to the crude
    pooled OR so confounding is visible as their gap. Each stratum's
    ratio rounds ONCE to integer micro-units before the cross-strata
    sum (float-accumulation-order-proof, the same discipline as every
    *_fp sum in this file). Plan: one stratum census with map-side
    partial agg; stratum grain (12 rows) afterwards."""
    o = load_table(spark, sf_dir, "orders")
    b = o.select(
        F.month("o_orderdate").cast("long").alias("stratum"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("t"),
        (F.col("o_orderstatus") == "F").cast("int").alias("y"),
    )
    s = b.groupBy("stratum").agg(
        F.sum(((F.col("t") == 1) & (F.col("y") == 1)).cast("int")).cast("long").alias("a"),
        F.sum(((F.col("t") == 1) & (F.col("y") == 0)).cast("int")).cast("long").alias("bb"),
        F.sum(((F.col("t") == 0) & (F.col("y") == 1)).cast("int")).cast("long").alias("c"),
        F.sum(((F.col("t") == 0) & (F.col("y") == 0)).cast("int")).cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    fp = s.agg(
        F.sum(
            F.round(F.lit(1e6) * F.col("a") * F.col("d") / F.col("n"), 0).cast("long")
        ).cast("long").alias("num_fp"),
        F.sum(
            F.round(F.lit(1e6) * F.col("bb") * F.col("c") / F.col("n"), 0).cast("long")
        ).cast("long").alias("den_fp"),
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("a").cast("long").alias("a_tot"),
        F.sum("bb").cast("long").alias("b_tot"),
        F.sum("c").cast("long").alias("c_tot"),
        F.sum("d").cast("long").alias("d_tot"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    return fp.select(
        "n_strata",
        F.round(d_("num_fp") / d_("den_fp"), 6).alias("or_cmh"),
        F.round((F.col("a_tot") * F.col("d_tot")).cast("double")
                / (F.col("b_tot") * F.col("c_tot")).cast("double"), 6).alias("or_pooled"),
        F.round(F.log(d_("num_fp") / d_("den_fp")), 6).alias("log_or_cmh"),
    )


# --------------------------------------------------------------------------
# batch 30: DoReMi reweighting step, ANN hubness diagnostic, padding waste

_DOREMI_ETA = 4.0


def _doremi_sql(eta: float = _DOREMI_ETA) -> str:
    return f"""WITH q AS (SELECT * FROM ({_QUALITY_ORACLE}) t),
       qs AS (
         SELECT d.source, CAST(round(q.quality * 1000000.0) AS BIGINT) AS q_fp
         FROM documents d JOIN q ON q.doc_id = d.doc_id),
       per AS (
         SELECT source, count(*)::BIGINT AS n, sum(q_fp)::BIGINT AS sq
         FROM qs GROUP BY source),
       tot AS (SELECT sum(n)::BIGINT AS nn, sum(sq)::BIGINT AS sqq FROM per),
       f AS (
         SELECT source, n,
                CAST(round(1000000.0 * n / tot.nn) AS BIGINT) AS share_ppm,
                round((sq::DOUBLE / n - tot.sqq::DOUBLE / tot.nn) / 1000000.0, 6)
                  AS excess,
                CAST(round(1000000.0
                     * exp({eta} * ((sq::DOUBLE / n - tot.sqq::DOUBLE / tot.nn)
                                    / 1000000.0))) AS BIGINT) AS factor_ppm
         FROM per CROSS JOIN tot),
       raw AS (SELECT *, share_ppm * factor_ppm AS raw_w FROM f),
       z AS (SELECT sum(raw_w)::BIGINT AS zz FROM raw)
       SELECT source, n AS n_docs, share_ppm, excess,
              round(raw_w::DOUBLE / z.zz::DOUBLE, 6) AS weight_new
       FROM raw CROSS JOIN z"""


@query("doremi_step", _doremi_sql())
def q_doremi_step(spark, sf_dir):
    """One DoReMi-style exponentiated-gradient domain-reweighting step
    (Xie et al., NeurIPS 2023): each source's mixture weight is its
    corpus share multiplied by exp(η · excess), where excess is the
    source's mean quality above the corpus mean (the proxy for the
    reference-vs-proxy loss gap), then renormalized — the update every
    mixture-tuning loop runs between training epochs. The per-doc
    quality is already a 6dp-rounded value, so its micro-unit int is
    exact; the single exp() per SOURCE rounds once to ppm; the raw
    weights are int64 products; normalization is one division. Plan:
    doc-grain quality map (narrow) → source census → source-grain
    math. Composes with `mixture_sample`/`mixture_epochs` for the
    actual resample."""
    d = _docs(spark, sf_dir)
    qs = d.select(
        "source", F.round(T.quality_score("text") * F.lit(1e6), 0).cast("long").alias("q_fp")
    )
    per = qs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("q_fp").cast("long").alias("sq")
    )
    tot = per.agg(F.sum("n").cast("long").alias("nn"), F.sum("sq").cast("long").alias("sqq"))
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    excess = (d_("sq") / d_("n") - d_("sqq") / d_("nn")) / F.lit(1e6)
    f = per.crossJoin(F.broadcast(tot)).select(
        "source", "n",
        F.round(F.lit(1e6) * F.col("n") / F.col("nn"), 0).cast("long").alias("share_ppm"),
        F.round(excess, 6).alias("excess"),
        F.round(F.lit(1e6) * F.exp(F.lit(_DOREMI_ETA) * excess), 0).cast("long").alias("factor_ppm"),
    )
    raw = f.select("*", (F.col("share_ppm") * F.col("factor_ppm")).alias("raw_w"))
    z = raw.agg(F.sum("raw_w").cast("long").alias("zz"))
    return raw.crossJoin(F.broadcast(z)).select(
        "source", F.col("n").alias("n_docs"), "share_ppm", "excess",
        F.round(d_("raw_w") / d_("zz"), 6).alias("weight_new"),
    )


def _hubness_sql(k: int = 5) -> str:
    return f"""WITH scored AS (
         SELECT q.vec_id AS q_id, a.vec_id AS c_id,
                round({_DOT_SQL} / ({_NORM_A} * {_NORM_Q}), 6) AS cosine
         FROM embeddings a JOIN embeddings q
           ON a.label = q.label AND a.vec_id <> q.vec_id),
       topk AS (
         SELECT c_id FROM (
           SELECT q_id, c_id,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY cosine DESC, c_id) AS rank
           FROM scored) WHERE rank <= {k}),
       occ AS (SELECT c_id, count(*)::BIGINT AS nk FROM topk GROUP BY c_id),
       alln AS (
         SELECT e.vec_id, coalesce(occ.nk, 0)::BIGINT AS nk
         FROM embeddings e LEFT JOIN occ ON occ.c_id = e.vec_id),
       st AS (
         SELECT count(*)::BIGINT AS n, sum(nk)::BIGINT AS s1,
                sum(nk::HUGEINT * nk::HUGEINT) AS s2,
                sum(nk::HUGEINT * nk::HUGEINT * nk::HUGEINT) AS s3,
                max(nk)::BIGINT AS max_occ,
                sum((nk = 0)::INT)::BIGINT AS never
         FROM alln)
       SELECT n, {k}::BIGINT AS k, max_occ,
              round(never::DOUBLE / n, 6) AS pct_never,
              CASE WHEN s2::DOUBLE / n - (s1::DOUBLE / n) * (s1::DOUBLE / n) > 0
                   THEN round((s3::DOUBLE / n
                               - 3.0 * (s1::DOUBLE / n) * (s2::DOUBLE / n)
                               + 2.0 * (s1::DOUBLE / n) * (s1::DOUBLE / n) * (s1::DOUBLE / n))
                              / pow(s2::DOUBLE / n - (s1::DOUBLE / n) * (s1::DOUBLE / n), 1.5), 6)
              END AS skewness
       FROM st"""


@query("ann_hubness", _hubness_sql())
def q_ann_hubness(spark, sf_dir):
    """Hubness diagnostic of the ANN neighborhood graph (Radovanović,
    Nanopoulos & Ivanović, JMLR 2010): the k-occurrence distribution —
    how often each vector appears in others' IVF-gated top-k — and its
    skewness. High positive skew (a few hub vectors in everyone's
    neighbor list, many never retrieved) is THE symptom of
    concentrated / low-quality embedding spaces and silently poisons
    kNN dedup and retrieval; pct_never is the orphan share. Plan: the
    bucket-gated scoring join of `ann_ivf_topk` with every vector as a
    query (never all-pairs across buckets), one per-query top-k
    window, one occurrence census, moment math on exact int64/HUGEINT
    sufficient stats with ONE rounded division chain."""
    from pliers_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    topk = ivf_topk(emb, emb, "vec_id", "embedding", "vec_id", "embedding", "label", k=5)
    occ = topk.groupBy("c_id").agg(F.count(F.lit(1)).cast("long").alias("nk"))
    alln = emb.select("vec_id").join(
        occ.withColumnRenamed("c_id", "vec_id"), "vec_id", "left"
    ).select("vec_id", F.coalesce("nk", F.lit(0)).cast("long").alias("nk"))
    dec = "decimal(38,0)"
    st = alln.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("nk").cast("long").alias("s1"),
        F.sum(F.col("nk").cast(dec) * F.col("nk").cast(dec)).cast(dec).alias("s2"),
        F.sum(F.col("nk").cast(dec) * F.col("nk").cast(dec) * F.col("nk").cast(dec)).cast(dec).alias("s3"),
        F.max("nk").cast("long").alias("max_occ"),
        F.sum((F.col("nk") == 0).cast("int")).cast("long").alias("never"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    m1 = d_("s1") / d_("n")
    var = d_("s2") / d_("n") - m1 * m1
    skew = (
        d_("s3") / d_("n") - F.lit(3.0) * m1 * (d_("s2") / d_("n")) + F.lit(2.0) * m1 * m1 * m1
    ) / F.pow(var, 1.5)
    return st.select(
        "n", F.lit(5).cast("long").alias("k"), "max_occ",
        F.round(d_("never") / d_("n"), 6).alias("pct_never"),
        F.when(var > 0, F.round(skew, 6)).alias("skewness"),
    )


@query(
    "padding_waste",
    """WITH t AS (
         SELECT doc_id, len(string_split(trim(text), ' '))::BIGINT AS n
         FROM documents),
       b AS (
         SELECT doc_id, n,
                greatest(16, CAST(power(2, ceil(log2(n::DOUBLE))) AS BIGINT)) AS bucket
         FROM t WHERE n > 0)
       SELECT bucket, count(*)::BIGINT AS n_docs,
              sum(n)::BIGINT AS tokens,
              sum(bucket - n)::BIGINT AS padding,
              round(sum(bucket - n)::DOUBLE / (bucket::DOUBLE * count(*)), 6)
                AS waste_share
       FROM b GROUP BY bucket""",
)
def q_padding_waste(spark, sf_dir):
    """Padding-waste accounting for power-of-2 length-bucketed batching
    (the alternative to `sequence_pack`'s concat-and-chunk): each doc
    rounds up to the nearest 2^⌈log2 n⌉ bucket (floor 16) and the per-
    bucket waste share says what fraction of batch FLOPs would burn on
    pad tokens — the number that decides bucketed-batching vs packing
    for a fine-tuning corpus. log2 of an exact power of two is exact in
    IEEE, so the ceil never mis-rounds at bucket boundaries; everything
    else is integer. Plan: one narrow map + one bucket census."""
    d = _docs(spark, sf_dir)
    n = F.size(T.tokenize(F.col("text"))).cast("long")
    b = d.select("doc_id", n.alias("n")).where(F.col("n") > 0).select(
        "doc_id", "n",
        F.greatest(
            F.lit(16).cast("long"),
            F.pow(F.lit(2.0), F.ceil(F.log2(F.col("n").cast("double")))).cast("long"),
        ).alias("bucket"),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("tokens"),
        F.sum(F.col("bucket") - F.col("n")).cast("long").alias("padding"),
        F.round(
            F.sum(F.col("bucket") - F.col("n")).cast("double")
            / (F.col("bucket").cast("double") * F.count(F.lit(1))),
            6,
        ).alias("waste_share"),
    )


# --------------------------------------------------------------------------
# batch 31: KWIC concordance, Zipf tail exponent, dup cluster-size histogram

_KWIC_CTX = 3
_KWIC_MIN_LEN = 4


def _kwic_sql(ctx: int = _KWIC_CTX) -> str:
    return f"""WITH toks AS (
         SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
       census AS (
         SELECT u AS token, count(*)::BIGINT AS c
         FROM (SELECT unnest(t) AS u FROM toks)
         WHERE length(u) >= {_KWIC_MIN_LEN} GROUP BY u),
       term AS (SELECT token FROM census ORDER BY c DESC, token LIMIT 1),
       hits AS (
         SELECT toks.doc_id, gs.p::BIGINT AS pos, toks.t
         FROM toks CROSS JOIN term,
              LATERAL (SELECT unnest(generate_series(1, len(toks.t))) AS p) gs
         WHERE toks.t[gs.p] = term.token)
       SELECT doc_id, pos,
              coalesce(array_to_string(t[greatest(pos - {ctx}, 1):pos - 1], ' '), '') AS left_ctx,
              t[pos] AS term,
              coalesce(array_to_string(t[pos + 1:least(pos + {ctx}, len(t))], ' '), '') AS right_ctx
       FROM hits"""


@query("kwic_concordance", _kwic_sql())
def q_kwic_concordance(spark, sf_dir):
    """KWIC (keyword-in-context) concordance — the corpus-linguistics
    workhorse readout (and the human-audit view every curation pipeline
    ships next to its filters): every occurrence of the corpus's most
    frequent ≥4-char token with {_KWIC_CTX} tokens of context either
    side. The term is picked by a global census (deterministic
    count-then-token order); occurrences come from one posexplode
    filter; contexts are per-row array slices — the corpus never
    shuffles except the census. At scale the term is a broadcast
    1-row dimension."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", T.tokenize(F.col("text")).alias("t"))
    census = (
        toks.select(F.explode("t").alias("token"))
        .where(F.length("token") >= _KWIC_MIN_LEN)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    term = census.orderBy(F.desc("c"), "token").limit(1).select("token")
    hits = (
        toks.crossJoin(F.broadcast(term))
        .select("doc_id", "t", F.posexplode("t").alias("p0", "tok"), F.col("token"))
        .where(F.col("tok") == F.col("token"))
        .select("doc_id", "t", (F.col("p0") + 1).alias("pos"))
    )
    left_start = F.greatest(F.col("pos") - _KWIC_CTX, F.lit(1))
    left_len = F.col("pos") - left_start
    right_len = F.least(F.col("pos") + _KWIC_CTX, F.size("t")) - F.col("pos")
    return hits.select(
        "doc_id", F.col("pos").cast("long").alias("pos"),
        F.concat_ws(" ", F.slice(F.col("t"), left_start, F.greatest(left_len, F.lit(0)))).alias("left_ctx"),
        F.element_at(F.col("t"), F.col("pos").cast("int")).alias("term"),
        F.concat_ws(" ", F.slice(F.col("t"), F.col("pos") + 1, F.greatest(right_len, F.lit(0)))).alias("right_ctx"),
    )


_HILL_K = 100


@query(
    "zipf_alpha",
    f"""WITH census AS (
         SELECT u AS token, count(*)::BIGINT AS c
         FROM (SELECT unnest(string_split(trim(text), ' ')) AS u FROM documents)
         GROUP BY u),
       topk AS (
         SELECT token, c, row_number() OVER (ORDER BY c DESC, token) AS rnk
         FROM census QUALIFY rnk <= {_HILL_K}),
       fk AS (SELECT c AS f_k FROM topk WHERE rnk = (SELECT max(rnk) FROM topk)),
       s AS (
         SELECT count(*)::BIGINT AS k, min(f_k)::BIGINT AS f_k,
                sum(CAST(round(1000000.0 * ln(topk.c::DOUBLE / fk.f_k::DOUBLE))
                         AS BIGINT))::BIGINT AS lsum_fp
         FROM topk CROSS JOIN fk)
       SELECT k, f_k,
              CASE WHEN lsum_fp > 0
                   THEN round(1.0 + k::DOUBLE * 1000000.0 / lsum_fp::DOUBLE, 6)
              END AS alpha_hill
       FROM s""",
)
def q_zipf_alpha(spark, sf_dir):
    """Zipf tail-exponent estimate via the Hill estimator (Hill, Annals
    of Statistics 1975) over the top-{_HILL_K} token frequencies:
    α̂ = 1 + k / Σ ln(fᵢ/f_k) — the one-number heavy-tail summary that
    (with `heaps_law`) characterizes a corpus's vocabulary shape and
    flags template/bot corpora (α drifts far from ~2). Per-rank logs
    round once to micro-nats so the sum is exact int64; one final
    division. Plan: token census (one shuffle) → distributed top-k →
    k-grain math; NULL if the top-k plateau is flat (all counts equal
    f_k)."""
    d = _docs(spark, sf_dir)
    census = (
        d.select(F.explode(T.tokenize(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    topk = census.orderBy(F.desc("c"), "token").limit(_HILL_K).localCheckpoint(eager=True)
    fk = topk.agg(F.min("c").alias("f_k"))
    s = topk.crossJoin(F.broadcast(fk)).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.min("f_k").cast("long").alias("f_k"),
        F.sum(
            F.round(
                F.lit(1e6) * F.log(F.col("c").cast("double") / F.col("f_k").cast("double")), 0
            ).cast("long")
        ).cast("long").alias("lsum_fp"),
    )
    return s.select(
        "k", "f_k",
        F.when(
            F.col("lsum_fp") > 0,
            F.round(F.lit(1.0) + F.col("k").cast("double") * F.lit(1e6) / F.col("lsum_fp").cast("double"), 6),
        ).alias("alpha_hill"),
    )


def _dup_hist_sql() -> str:
    return f"""WITH RECURSIVE {_simhash_pairs_cte()},
       edges AS (
         SELECT id_a AS src, id_b AS dst FROM nd_pairs
         UNION
         SELECT id_b AS src, id_a AS dst FROM nd_pairs),
       reach(node, peer) AS (
         SELECT src, src FROM edges
         UNION
         SELECT r.node, e.dst FROM reach r JOIN edges e ON r.peer = e.src),
       cc AS (SELECT node, min(peer)::BIGINT AS cluster_id FROM reach GROUP BY node),
       sizes AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size FROM cc GROUP BY cluster_id),
       hist AS (
         SELECT cluster_size, count(*)::BIGINT AS n_clusters
         FROM sizes GROUP BY cluster_size),
       singles AS (
         SELECT 1::BIGINT AS cluster_size,
                ((SELECT count(*) FROM documents) - (SELECT count(*) FROM cc))::BIGINT AS n_clusters)
       SELECT cluster_size, n_clusters FROM hist
       UNION ALL
       SELECT cluster_size, n_clusters FROM singles WHERE n_clusters > 0"""


@query("dup_size_histogram", _dup_hist_sql())
def q_dup_size_histogram(spark, sf_dir):
    """Duplicate-cluster size distribution — the report every dedup run
    publishes (how much is pairwise noise vs boilerplate mega-clusters,
    and what the keep-one-per-cluster reduction will be): connected
    components over the SimHash near-dup graph (reusing the banded pair
    generation + iterative CC of `dup_clusters`), cluster-size census,
    plus the singleton mass (docs in no pair) as size 1. The histogram
    grain is tiny; the only corpus work is the banding pass and the CC
    rounds, both already bounded."""
    docs = _docs(spark, sf_dir)
    pairs = D.simhash_near_dup_pairs(
        docs, "text", "doc_id", bits=_SIMHASH_BITS, bands=4, max_hamming=3
    ).select("id_a", "id_b")
    cc = D.connected_components(pairs)
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).cast("long").alias("cluster_size"))
    hist = sizes.groupBy("cluster_size").agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
    n_docs = docs.count()
    n_clustered = cc.count()
    singles = spark.createDataFrame(
        [(1, n_docs - n_clustered)], "cluster_size long, n_clusters long"
    ).where(F.col("n_clusters") > 0)
    return hist.unionAll(singles)


# --------------------------------------------------------------------------
# batch 32: KMV distinct sketch, KMV Jaccard, Bloom FPR audit — the
# "sketch accuracy audit" family: at 100 TB these sketches ARE the plan;
# auditing them against exact truth at small scale is how you size them.

_KMV_K = 64
_H60 = 1 << 60  # md5_int range


def _kmv_sql(k: int = _KMV_K) -> str:
    from pliers_spark.functions.hashing import md5_int_sql

    return f"""WITH th AS (
         SELECT DISTINCT source, {md5_int_sql('u')}::BIGINT AS h
         FROM (SELECT source, unnest(string_split(trim(text), ' ')) AS u FROM documents)),
       ranked AS (
         SELECT source, h,
                row_number() OVER (PARTITION BY source ORDER BY h) AS rnk,
                count(*) OVER (PARTITION BY source) AS n_exact
         FROM th),
       sk AS (
         SELECT source, max(n_exact)::BIGINT AS exact_distinct,
                count(*)::BIGINT AS in_sketch,
                max(CASE WHEN rnk = {k} THEN h END)::BIGINT AS v_k
         FROM ranked WHERE rnk <= {k} GROUP BY source)
       SELECT source, exact_distinct,
              CASE WHEN in_sketch < {k} THEN exact_distinct::DOUBLE
                   ELSE round(({k} - 1)::DOUBLE * {_H60}::DOUBLE / v_k::DOUBLE, 4)
              END AS est_distinct,
              CASE WHEN in_sketch < {k} THEN 0.0
                   ELSE round((({k} - 1)::DOUBLE * {_H60}::DOUBLE / v_k::DOUBLE
                               - exact_distinct::DOUBLE) / exact_distinct::DOUBLE, 6)
              END AS rel_err
       FROM sk"""


@query("kmv_distinct", _kmv_sql())
def q_kmv_distinct(spark, sf_dir):
    """KMV (k-minimum-values / bottom-k) distinct-count sketch audit
    (Bar-Yossef et al., RANDOM 2002): per source, the estimate
    (k−1)·H/v_k from the k smallest 60-bit token hashes next to the
    exact distinct count and the relative error. Unlike HLL the KMV
    sketch is EXACTLY reproducible cross-engine (it is just an order
    statistic of md5 values), fully mergeable (union = k smallest of
    concatenated sketches), and collapses to exact below k — so it is
    the sketch this engine recommends where approx_count_distinct
    can't be oracle-checked. Plan: distinct (source, hash) census, one
    per-source bottom-k window, source-grain math."""
    from pliers_spark.functions.hashing import md5_int

    d = _docs(spark, sf_dir)
    th = (
        d.select("source", F.explode(T.tokenize(F.col("text"))).alias("tok"))
        .select("source", md5_int(F.col("tok")).alias("h"))
        .distinct()
    )
    ws = Window.partitionBy("source")
    ranked = th.select(
        "source", "h",
        F.row_number().over(ws.orderBy("h")).alias("rnk"),
        F.count(F.lit(1)).over(ws).alias("n_exact"),
    )
    sk = ranked.where(F.col("rnk") <= _KMV_K).groupBy("source").agg(
        F.max("n_exact").cast("long").alias("exact_distinct"),
        F.count(F.lit(1)).cast("long").alias("in_sketch"),
        F.max(F.when(F.col("rnk") == _KMV_K, F.col("h"))).cast("long").alias("v_k"),
    )
    est = (F.lit(float(_KMV_K - 1)) * F.lit(float(_H60))) / F.col("v_k").cast("double")
    return sk.select(
        "source", "exact_distinct",
        F.when(F.col("in_sketch") < _KMV_K, F.col("exact_distinct").cast("double"))
        .otherwise(F.round(est, 4))
        .alias("est_distinct"),
        F.when(F.col("in_sketch") < _KMV_K, F.lit(0.0))
        .otherwise(
            F.round((est - F.col("exact_distinct").cast("double")) / F.col("exact_distinct").cast("double"), 6)
        )
        .alias("rel_err"),
    )


def _kmv_overlap_sql(k: int = _KMV_K) -> str:
    from pliers_spark.functions.hashing import md5_int_sql

    return f"""WITH th AS (
         SELECT DISTINCT source, {md5_int_sql('u')}::BIGINT AS h
         FROM (SELECT source, unnest(string_split(trim(text), ' ')) AS u FROM documents)),
       srcs AS (SELECT DISTINCT source FROM th),
       pairs AS (
         SELECT a.source AS src_a, b.source AS src_b
         FROM srcs a JOIN srcs b ON a.source < b.source),
       tagged AS (
         SELECT p.src_a, p.src_b, t.h,
                max((t.source = p.src_a)::INT) AS ina,
                max((t.source = p.src_b)::INT) AS inb
         FROM pairs p JOIN th t ON t.source IN (p.src_a, p.src_b)
         GROUP BY 1, 2, 3),
       ranked AS (
         SELECT *, row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rnk,
                count(*) OVER (PARTITION BY src_a, src_b) AS n_union
         FROM tagged),
       sk AS (
         SELECT src_a, src_b,
                least(max(n_union), {k})::BIGINT AS k_eff,
                sum((ina = 1 AND inb = 1)::INT)::BIGINT AS both_in_sketch
         FROM ranked WHERE rnk <= {k} GROUP BY 1, 2),
       ex AS (
         SELECT src_a, src_b,
                sum((ina = 1 AND inb = 1)::INT)::BIGINT AS inter,
                count(*)::BIGINT AS uni
         FROM tagged GROUP BY 1, 2)
       SELECT sk.src_a, sk.src_b,
              round(sk.both_in_sketch::DOUBLE / sk.k_eff::DOUBLE, 6) AS j_est,
              round(ex.inter::DOUBLE / ex.uni::DOUBLE, 6) AS j_exact,
              round(abs(sk.both_in_sketch::DOUBLE / sk.k_eff::DOUBLE
                        - ex.inter::DOUBLE / ex.uni::DOUBLE), 6) AS abs_err
       FROM sk JOIN ex USING (src_a, src_b)"""


@query("kmv_overlap", _kmv_overlap_sql())
def q_kmv_overlap(spark, sf_dir):
    """KMV Jaccard estimation between source vocabularies (Beyer et al.,
    SIGMOD 2007): the union's bottom-k hash sketch doubles as a uniform
    sample of A∪B, so |sketch ∩ A ∩ B| / k estimates J(A,B) — audited
    against the exact Jaccard (`source_vocab_overlap`'s quantity). This
    is the mergeable scale path for pairwise corpus-overlap matrices
    where exact set intersection would shuffle the full vocabulary per
    pair. Plan: one distinct (source, hash) census; pair tagging joins
    the census to the S² pair dimension; bottom-k is a per-pair window
    over union-grain rows."""
    from pliers_spark.functions.hashing import md5_int

    d = _docs(spark, sf_dir)
    th = (
        d.select("source", F.explode(T.tokenize(F.col("text"))).alias("tok"))
        .select("source", md5_int(F.col("tok")).alias("h"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    srcs = th.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("src_a"))
        .join(srcs.select(F.col("source").alias("src_b")), F.col("src_a") < F.col("src_b"))
    )
    tagged = (
        pairs.join(
            th, (F.col("source") == F.col("src_a")) | (F.col("source") == F.col("src_b"))
        )
        .groupBy("src_a", "src_b", "h")
        .agg(
            F.max((F.col("source") == F.col("src_a")).cast("int")).alias("ina"),
            F.max((F.col("source") == F.col("src_b")).cast("int")).alias("inb"),
        )
        .localCheckpoint(eager=True)  # feeds sketch ranking AND exact truth
    )
    wp = Window.partitionBy("src_a", "src_b")
    ranked = tagged.select(
        "*",
        F.row_number().over(wp.orderBy("h")).alias("rnk"),
        F.count(F.lit(1)).over(wp).alias("n_union"),
    )
    sk = ranked.where(F.col("rnk") <= _KMV_K).groupBy("src_a", "src_b").agg(
        F.least(F.max("n_union"), F.lit(_KMV_K)).cast("long").alias("k_eff"),
        F.sum(((F.col("ina") == 1) & (F.col("inb") == 1)).cast("int")).cast("long").alias("both_in_sketch"),
    )
    ex = tagged.groupBy("src_a", "src_b").agg(
        F.sum(((F.col("ina") == 1) & (F.col("inb") == 1)).cast("int")).cast("long").alias("inter"),
        F.count(F.lit(1)).cast("long").alias("uni"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    j_est = d_("both_in_sketch") / d_("k_eff")
    j_ex = d_("inter") / d_("uni")
    return sk.join(ex, ["src_a", "src_b"]).select(
        "src_a", "src_b",
        F.round(j_est, 6).alias("j_est"),
        F.round(j_ex, 6).alias("j_exact"),
        F.round(F.abs(j_est - j_ex), 6).alias("abs_err"),
    )


_BLOOM_M = 1024
_BLOOM_K = 3


def _bloom_fpr_sql(m: int = _BLOOM_M, k: int = _BLOOM_K) -> str:
    from pliers_spark.functions.hashing import md5_int_sql

    poss = ", ".join(
        f"(({md5_int_sql('text', seed=s)}) % {m})::BIGINT" for s in range(k)
    )
    return f"""WITH hist AS (
         SELECT DISTINCT text FROM documents WHERE doc_id % 2 = 0),
       probe AS (
         SELECT DISTINCT d.text FROM documents d
         WHERE d.doc_id % 2 = 1
           AND NOT EXISTS (SELECT 1 FROM hist h WHERE h.text = d.text)),
       hp AS (
         SELECT DISTINCT p FROM (SELECT unnest([{poss}]) AS p FROM hist)),
       probe_pos AS (SELECT text, unnest([{poss}]) AS p FROM probe),
       hits AS (
         SELECT text, count(*)::BIGINT AS nhit
         FROM probe_pos JOIN hp USING (p) GROUP BY text),
       st AS (
         SELECT (SELECT count(*) FROM hist)::BIGINT AS n_inserted,
                (SELECT count(*) FROM probe)::BIGINT AS n_probes,
                (SELECT count(*) FROM hits WHERE nhit = {k})::BIGINT AS n_fp)
       SELECT n_inserted, n_probes, n_fp,
              CASE WHEN n_probes > 0
                   THEN round(n_fp::DOUBLE / n_probes::DOUBLE, 6) END AS fpr_observed,
              round(pow(1.0 - exp(-({k}.0 * n_inserted::DOUBLE) / {m}.0), {k}.0), 6)
                AS fpr_theory
       FROM st"""


@query("bloom_fpr_audit", _bloom_fpr_sql())
def q_bloom_fpr_audit(spark, sf_dir):
    """Bloom-filter false-positive-rate audit: insert the even-half
    document contents into an (m=1024, k=3) position-set Bloom filter
    (the `bloom_dedup` representation), probe with contents PROVABLY
    absent (odd-half, anti-joined on exact text), and report observed
    FPR against the (1 − e^(−kn/m))^k theory line — the sizing check an
    operator runs before trusting a constant-memory gate at ingest
    scale. The deliberately small m puts the filter in its loaded
    regime (kn/m ≈ 0.7) so the audit exercises real collisions. All
    counts exact; the two transcendentals touch one final row."""
    from pliers_spark.functions.hashing import md5_int

    d = _docs(spark, sf_dir)
    hist = (
        d.where(F.col("doc_id") % 2 == 0).select("text").distinct().localCheckpoint(eager=True)
    )
    probe = (
        d.where(F.col("doc_id") % 2 == 1)
        .select("text")
        .distinct()
        .join(hist, "text", "left_anti")
        .localCheckpoint(eager=True)
    )
    pos = lambda s: F.pmod(md5_int(F.col("text"), seed=s), F.lit(_BLOOM_M))  # noqa: E731
    hp = hist.select(
        F.explode(F.array(*[pos(s) for s in range(_BLOOM_K)])).alias("p")
    ).distinct()
    probe_pos = probe.select(
        "text", F.explode(F.array(*[pos(s) for s in range(_BLOOM_K)])).alias("p")
    )
    hits = probe_pos.join(hp, "p").groupBy("text").agg(F.count(F.lit(1)).alias("nhit"))
    n_fp = hits.where(F.col("nhit") == _BLOOM_K).count()
    n_ins = hist.count()
    n_pr = probe.count()
    import math as _m

    theory = round((1.0 - _m.exp(-(_BLOOM_K * n_ins) / _BLOOM_M)) ** _BLOOM_K, 6)
    return spark.createDataFrame(
        [(n_ins, n_pr, n_fp, round(n_fp / n_pr, 6) if n_pr else None, theory)],
        "n_inserted long, n_probes long, n_fp long, fpr_observed double, fpr_theory double",
    )


# --------------------------------------------------------------------------
# batch 33: priority sampling, rendezvous sharding, Neyman allocation

_PRIO_K = 64


def _priority_sql(k: int = _PRIO_K) -> str:
    from pliers_spark.functions.hashing import md5_int_sql

    h = md5_int_sql("CAST(doc_id AS VARCHAR)")
    return f"""WITH w AS (
         SELECT doc_id, source,
                len(string_split(trim(text), ' '))::BIGINT AS wt,
                ({h} + 1)::BIGINT AS hu
         FROM documents),
       q AS (
         SELECT *, wt::DOUBLE * {_H60}::DOUBLE / hu::DOUBLE AS prio,
                row_number() OVER (ORDER BY wt::DOUBLE * {_H60}::DOUBLE / hu::DOUBLE DESC,
                                   doc_id) AS rnk
         FROM w),
       tau AS (SELECT prio AS t FROM q WHERE rnk = {k} + 1),
       est AS (
         SELECT source,
                sum(CAST(round(CASE WHEN wt::DOUBLE > tau.t THEN wt::DOUBLE
                                    ELSE tau.t END) AS BIGINT))::BIGINT AS est_tokens
         FROM q CROSS JOIN tau WHERE rnk <= {k} GROUP BY source),
       exact AS (SELECT source, sum(wt)::BIGINT AS exact_tokens FROM w GROUP BY source)
       SELECT exact.source, exact.exact_tokens,
              coalesce(est.est_tokens, 0)::BIGINT AS est_tokens,
              round((coalesce(est.est_tokens, 0) - exact.exact_tokens)::DOUBLE
                    / exact.exact_tokens, 6) AS rel_err
       FROM exact LEFT JOIN est USING (source)"""


@query("priority_sample", _priority_sql())
def q_priority_sample(spark, sf_dir):
    """Priority sampling subset-sum audit (Duffield, Lund & Thorup,
    JACM 2007): weight = doc token count, priority = w/u with u the
    deterministic 60-bit hash uniform, keep the top-k priorities, and
    estimate each source's TOTAL tokens as Σ max(wᵢ, τ) over its
    sampled docs (τ = the (k+1)-th priority) — the provably
    near-optimal weighted sample for answering arbitrary subset-sum
    questions later from k rows instead of the corpus. Estimates round
    to integer tokens per item before summing (order-proof). Plan: one
    narrow weight/priority map, a distributed top-(k+1), source-grain
    joins of a k-row frame against the exact census."""
    from pliers_spark.functions.hashing import md5_int

    d = _docs(spark, sf_dir)
    w = d.select(
        "doc_id", "source",
        F.size(T.tokenize(F.col("text"))).cast("long").alias("wt"),
        (md5_int(F.col("doc_id").cast("string")) + 1).alias("hu"),
    ).localCheckpoint(eager=True)  # feeds sample AND exact census
    prio = F.col("wt").cast("double") * F.lit(float(_H60)) / F.col("hu").cast("double")
    q = w.select("*", prio.alias("prio"), F.row_number().over(
        Window.orderBy(F.desc(prio), "doc_id")
    ).alias("rnk"))
    topk1 = q.where(F.col("rnk") <= _PRIO_K + 1).localCheckpoint(eager=True)
    tau = topk1.where(F.col("rnk") == _PRIO_K + 1).select(F.col("prio").alias("t"))
    est = (
        topk1.where(F.col("rnk") <= _PRIO_K)
        .crossJoin(F.broadcast(tau))
        .groupBy("source")
        .agg(
            F.sum(
                F.round(
                    F.when(F.col("wt").cast("double") > F.col("t"), F.col("wt").cast("double"))
                    .otherwise(F.col("t")),
                    0,
                ).cast("long")
            ).cast("long").alias("est_tokens")
        )
    )
    exact = w.groupBy("source").agg(F.sum("wt").cast("long").alias("exact_tokens"))
    return exact.join(est, "source", "left").select(
        "source", "exact_tokens",
        F.coalesce("est_tokens", F.lit(0)).cast("long").alias("est_tokens"),
        F.round(
            (F.coalesce("est_tokens", F.lit(0)) - F.col("exact_tokens")).cast("double")
            / F.col("exact_tokens").cast("double"),
            6,
        ).alias("rel_err"),
    )


_RDV_SHARDS = 16


def _rendezvous_sql(n_shards: int = _RDV_SHARDS) -> str:
    from pliers_spark.functions.hashing import md5_int_sql

    def argmax(n):
        items = ", ".join(
            f"{{'h': {md5_int_sql('CAST(doc_id AS VARCHAR)', seed=s)}, 's': {s}}}"
            for s in range(n)
        )
        return f"list_max([{items}]).s"

    return f"""WITH a AS (
         SELECT doc_id, {argmax(n_shards)}::BIGINT AS shard,
                {argmax(n_shards + 1)}::BIGINT AS shard_plus
         FROM documents)
       SELECT shard, count(*)::BIGINT AS n_docs,
              sum((shard <> shard_plus)::INT)::BIGINT AS n_moved,
              sum((shard <> shard_plus AND shard_plus <> {n_shards})::INT)::BIGINT
                AS n_moved_elsewhere
       FROM a GROUP BY shard"""


@query("rendezvous_shards", _rendezvous_sql())
def q_rendezvous_shards(spark, sf_dir):
    """Rendezvous (highest-random-weight) shard assignment audit
    (Thaler & Ravishankar, ToN 1998 — the consistent-placement scheme
    behind cache rings and shard maps): each doc goes to the shard with
    the highest seeded hash; per shard, the doc count (balance) and how
    many docs MOVE when a {_RDV_SHARDS + 1}th shard joins. HRW's
    guarantee — relocations land ONLY on the new shard — is emitted as
    n_moved_elsewhere (must be 0), and expected movement is
    n/{_RDV_SHARDS + 1}. The argmax is a per-row array-of-struct max
    (lexicographic, hash-then-shard) — zero shuffle besides the final
    16-row census; exactly how a reshard cost estimate runs over a
    10^12-row table."""
    from pliers_spark.functions.hashing import md5_int

    d = _docs(spark, sf_dir)

    def argmax(n):
        return F.array_max(
            F.array(
                *[
                    F.struct(
                        md5_int(F.col("doc_id").cast("string"), seed=s).alias("h"),
                        F.lit(s).alias("s"),
                    )
                    for s in range(n)
                ]
            )
        )["s"]

    a = d.select(
        "doc_id",
        argmax(_RDV_SHARDS).cast("long").alias("shard"),
        argmax(_RDV_SHARDS + 1).cast("long").alias("shard_plus"),
    )
    return a.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("shard") != F.col("shard_plus")).cast("int")).cast("long").alias("n_moved"),
        F.sum(
            ((F.col("shard") != F.col("shard_plus")) & (F.col("shard_plus") != _RDV_SHARDS)).cast("int")
        ).cast("long").alias("n_moved_elsewhere"),
    )


_NEYMAN_BUDGET = 1000


@query(
    "neyman_allocation",
    f"""WITH s AS (
         SELECT source, count(*)::BIGINT AS n,
                sum(n_chars)::BIGINT AS sv,
                sum(n_chars::HUGEINT * n_chars::HUGEINT) AS q
         FROM documents GROUP BY source),
       w AS (
         SELECT source, n,
                CAST(round(1000000.0 * sqrt((n::DOUBLE * q::DOUBLE
                                             - sv::DOUBLE * sv::DOUBLE))
                           / n::DOUBLE) AS BIGINT) AS sigma_fp
         FROM s),
       ww AS (SELECT *, n * sigma_fp AS wgt FROM w),
       z AS (SELECT sum(wgt)::BIGINT AS zw, sum(n)::BIGINT AS zn FROM ww)
       SELECT source, n AS n_docs,
              round(sigma_fp / 1000000.0, 6) AS sigma,
              CAST(round({_NEYMAN_BUDGET}.0 * wgt::DOUBLE / z.zw::DOUBLE) AS BIGINT)
                AS alloc_neyman,
              CAST(round({_NEYMAN_BUDGET}.0 * n::DOUBLE / z.zn::DOUBLE) AS BIGINT)
                AS alloc_proportional
       FROM ww CROSS JOIN z""",
)
def q_neyman_allocation(spark, sf_dir):
    """Neyman optimal stratified-sample allocation (Neyman, JRSS 1934):
    a {_NEYMAN_BUDGET}-row audit budget is split across sources
    ∝ N_h·σ_h (population std of doc length) — minimizing estimator
    variance — next to the naive proportional split, so the gap shows
    which strata are over/under-sampled by uniform auditing. σ_h comes
    from exact int64/HUGEINT sufficient stats via √(nQ−S²)/n rounded
    ONCE to micro-units; weights are exact int64 products; the two
    normalizing divisions are the only further floats. Plan: one
    stratum census; everything after is S-grain. Composes with
    `stratified_sample` for the actual draw."""
    dec = "decimal(38,0)"
    d = _docs(spark, sf_dir)
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("sv"),
        F.sum(F.col("n_chars").cast(dec) * F.col("n_chars").cast(dec)).cast(dec).alias("q"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    w = s.select(
        "source", "n",
        F.round(
            F.lit(1e6)
            * F.sqrt(d_("n") * d_("q") - d_("sv") * d_("sv"))
            / d_("n"),
            0,
        ).cast("long").alias("sigma_fp"),
    )
    ww = w.select("*", (F.col("n") * F.col("sigma_fp")).alias("wgt"))
    z = ww.agg(F.sum("wgt").cast("long").alias("zw"), F.sum("n").cast("long").alias("zn"))
    return ww.crossJoin(F.broadcast(z)).select(
        "source", F.col("n").alias("n_docs"),
        F.round(F.col("sigma_fp") / F.lit(1e6), 6).alias("sigma"),
        F.round(F.lit(float(_NEYMAN_BUDGET)) * d_("wgt") / d_("zw"), 0).cast("long").alias("alloc_neyman"),
        F.round(F.lit(float(_NEYMAN_BUDGET)) * d_("n") / d_("zn"), 0).cast("long").alias("alloc_proportional"),
    )


# --------------------------------------------------------------------------
# batch 34: mergeable KMV rollup, difference-in-differences, Markov eval

_KMVR_K = 32


def _kmv_rollup_sql(k: int = _KMVR_K) -> str:
    from pliers_spark.functions.hashing import md5_int_sql

    h = md5_int_sql("CAST(user_id AS VARCHAR)")
    return f"""WITH uh AS (
         SELECT DISTINCT date_trunc('day', ts)::TIMESTAMP AS day,
                date_trunc('week', ts)::TIMESTAMP AS week,
                {h}::BIGINT AS h
         FROM events),
       daily AS (
         SELECT day, week, h,
                row_number() OVER (PARTITION BY day ORDER BY h) AS rnk
         FROM uh),
       dsk AS (SELECT day, week, h FROM daily WHERE rnk <= {k}),
       merged AS (
         SELECT week, h, row_number() OVER (PARTITION BY week ORDER BY h) AS rnk
         FROM (SELECT DISTINCT week, h FROM dsk)),
       wsk AS (
         SELECT week, count(*)::BIGINT AS in_sketch,
                max(CASE WHEN rnk = {k} THEN h END)::BIGINT AS v_k
         FROM merged WHERE rnk <= {k} GROUP BY week),
       exact AS (
         SELECT week, count(DISTINCT h)::BIGINT AS exact_users,
                count(DISTINCT day)::BIGINT AS n_days
         FROM uh GROUP BY week)
       SELECT exact.week, exact.n_days, exact.exact_users,
              CASE WHEN wsk.in_sketch < {k} THEN wsk.in_sketch::DOUBLE
                   ELSE round(({k} - 1)::DOUBLE * {_H60}::DOUBLE / wsk.v_k::DOUBLE, 4)
              END AS est_users,
              round((CASE WHEN wsk.in_sketch < {k} THEN wsk.in_sketch::DOUBLE
                          ELSE round(({k} - 1)::DOUBLE * {_H60}::DOUBLE / wsk.v_k::DOUBLE, 4)
                     END - exact_users::DOUBLE) / exact_users::DOUBLE, 6) AS rel_err
       FROM exact JOIN wsk USING (week)"""


@query("kmv_rollup", _kmv_rollup_sql())
def q_kmv_rollup(spark, sf_dir):
    """Mergeable distinct-count rollup: per-DAY KMV bottom-k sketches of
    active users, merged day→week by taking the k smallest of the
    unioned sketch values — the weekly estimate touches ONLY k×7 sketch
    rows, never the raw events again (the `rollup_multires` pattern for
    COUNT DISTINCT, which plain partial sums can't roll up). Audited
    against the exact weekly distinct count; if every constituent day
    stayed under k the merged sketch is provably exact and the estimate
    collapses to it. Plan: one distinct (day, user-hash) census, two
    bottom-k windows at day and week grain — at 100 TB the daily sketch
    table is the only thing the weekly/monthly/yearly jobs read."""
    from pliers_spark.functions.hashing import md5_int

    ev = _events(spark, sf_dir)
    uh = ev.select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("week", F.col("ts")).alias("week"),
        md5_int(F.col("user_id").cast("string")).alias("h"),
    ).distinct().localCheckpoint(eager=True)  # feeds sketches AND exact truth
    wd = Window.partitionBy("day").orderBy("h")
    dsk = uh.select("day", "week", "h", F.row_number().over(wd).alias("rnk")).where(
        F.col("rnk") <= _KMVR_K
    )
    ww = Window.partitionBy("week").orderBy("h")
    merged = (
        dsk.select("week", "h").distinct()
        .select("week", "h", F.row_number().over(ww).alias("rnk"))
        .where(F.col("rnk") <= _KMVR_K)
    )
    wsk = merged.groupBy("week").agg(
        F.count(F.lit(1)).cast("long").alias("in_sketch"),
        F.max(F.when(F.col("rnk") == _KMVR_K, F.col("h"))).cast("long").alias("v_k"),
    )
    exact = uh.groupBy("week").agg(
        F.count_distinct("h").cast("long").alias("exact_users"),
        F.count_distinct("day").cast("long").alias("n_days"),
    )
    est = F.when(
        F.col("in_sketch") < _KMVR_K, F.col("in_sketch").cast("double")
    ).otherwise(
        F.round(F.lit(float(_KMVR_K - 1)) * F.lit(float(_H60)) / F.col("v_k").cast("double"), 4)
    )
    return exact.join(wsk, "week").select(
        "week", "n_days", "exact_users",
        est.alias("est_users"),
        F.round((est - F.col("exact_users").cast("double")) / F.col("exact_users").cast("double"), 6).alias("rel_err"),
    )


@query(
    "diff_in_diff",
    """WITH v AS (
         SELECT (user_id % 2 = 0) AS treat, epoch_us(ts)::BIGINT AS t_us,
                CAST(round(value * 1000000.0) AS BIGINT) AS v_fp,
                event_id
         FROM events),
       r AS (SELECT *, row_number() OVER (ORDER BY t_us, event_id) AS rn,
                    count(*) OVER () AS nn FROM v),
       med AS (SELECT max(t_us) AS m FROM r WHERE rn <= (nn + 1) // 2),
       cells AS (
         SELECT treat, (t_us > med.m) AS post,
                count(*)::BIGINT AS n, sum(v_fp)::BIGINT AS s
         FROM v CROSS JOIN med GROUP BY 1, 2),
       wide AS (
         SELECT
           max(CASE WHEN treat AND post THEN s END)::BIGINT AS s11,
           max(CASE WHEN treat AND post THEN n END)::BIGINT AS n11,
           max(CASE WHEN treat AND NOT post THEN s END)::BIGINT AS s10,
           max(CASE WHEN treat AND NOT post THEN n END)::BIGINT AS n10,
           max(CASE WHEN NOT treat AND post THEN s END)::BIGINT AS s01,
           max(CASE WHEN NOT treat AND post THEN n END)::BIGINT AS n01,
           max(CASE WHEN NOT treat AND NOT post THEN s END)::BIGINT AS s00,
           max(CASE WHEN NOT treat AND NOT post THEN n END)::BIGINT AS n00
         FROM cells)
       SELECT n11, n10, n01, n00,
              round(((s11::DOUBLE / n11 - s10::DOUBLE / n10)
                     - (s01::DOUBLE / n01 - s00::DOUBLE / n00)) / 1000000.0, 6) AS did
       FROM wide""",
)
def q_diff_in_diff(spark, sf_dir):
    """Difference-in-differences estimator (the Card-Krueger design):
    treatment = even user ids, post = events after the EXACT global
    median timestamp (integer-rank median, deterministic cutoff), DiD =
    (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre) — the
    parallel-trends causal readout every experimentation platform
    reports next to the naive post-mean gap. Four cell means from exact
    int64 sufficient stats; ONE identical double expression both
    engines. Plan: global rank for the cutoff (two-pass histogram at
    scale, as documented in group_quantiles), one 4-cell census."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    v = ev.select(
        (F.col("user_id") % 2 == 0).alias("treat"),
        epoch_micros(ev, "ts").cast("long").alias("t_us"),
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("v_fp"),
        "event_id",
    )
    n_all = v.count()
    wr = Window.orderBy("t_us", "event_id")
    med = (
        v.select("t_us", F.row_number().over(wr).alias("rn"))
        .where(F.col("rn") <= (n_all + 1) // 2)
        .agg(F.max("t_us").alias("m"))
    )
    cells = (
        v.crossJoin(F.broadcast(med))
        .groupBy("treat", (F.col("t_us") > F.col("m")).alias("post"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"), F.sum("v_fp").cast("long").alias("s"))
    )
    def cell(t, p, c):
        return F.max(F.when((F.col("treat") == t) & (F.col("post") == p), F.col(c))).cast("long")
    wide = cells.agg(
        cell(True, True, "s").alias("s11"), cell(True, True, "n").alias("n11"),
        cell(True, False, "s").alias("s10"), cell(True, False, "n").alias("n10"),
        cell(False, True, "s").alias("s01"), cell(False, True, "n").alias("n01"),
        cell(False, False, "s").alias("s00"), cell(False, False, "n").alias("n00"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    did = (
        (d_("s11") / d_("n11") - d_("s10") / d_("n10"))
        - (d_("s01") / d_("n01") - d_("s00") / d_("n00"))
    ) / F.lit(1e6)
    return wide.select("n11", "n10", "n01", "n00", F.round(did, 6).alias("did"))


@query(
    "markov_accuracy",
    """WITH r AS (
         SELECT user_id, event_type,
                row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         FROM events),
       tr AS (
         SELECT a.event_type AS prev, b.event_type AS nxt, b.rn AS nrn
         FROM r a JOIN r b ON a.user_id = b.user_id AND b.rn = a.rn + 1),
       train AS (SELECT prev, nxt FROM tr WHERE nrn % 2 = 0),
       test AS (SELECT prev, nxt FROM tr WHERE nrn % 2 = 1),
       model AS (
         SELECT prev, nxt AS pred FROM (
           SELECT prev, nxt, count(*) AS c,
                  row_number() OVER (PARTITION BY prev ORDER BY count(*) DESC, nxt) AS rk
           FROM train GROUP BY prev, nxt) WHERE rk = 1),
       maj AS (
         SELECT nxt AS pred FROM (
           SELECT nxt, count(*) AS c,
                  row_number() OVER (ORDER BY count(*) DESC, nxt) AS rk
           FROM train GROUP BY nxt) WHERE rk = 1),
       sc AS (
         SELECT count(*)::BIGINT AS n_test,
                sum((t.nxt = m.pred)::INT)::BIGINT AS hit_markov,
                sum((t.nxt = maj.pred)::INT)::BIGINT AS hit_majority
         FROM test t LEFT JOIN model m ON m.prev = t.prev CROSS JOIN maj)
       SELECT (SELECT count(*) FROM train)::BIGINT AS n_train, n_test,
              round(hit_markov::DOUBLE / n_test, 6) AS acc_markov,
              round(hit_majority::DOUBLE / n_test, 6) AS acc_majority
       FROM sc""",
)
def q_markov_accuracy(spark, sf_dir):
    """Held-out next-event prediction accuracy of the first-order
    Markov model vs the majority-class baseline: transitions split by
    parity of their target position (a deterministic interleaved
    train/test split that can't leak a user's whole series into one
    side), the model is argmax of the train transition census (count
    then type tiebreak), and the lift of acc_markov over acc_majority
    is the standard 'is sequence structure real?' check before anyone
    ships a session-based recommender. All counts exact; two final
    divisions. Plan: one user-key window, a self-join on the SAME key
    (co-partitioned), two tiny censuses, broadcast model join."""
    ev = _events(spark, sf_dir)
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    r = ev.select("user_id", "event_type", F.row_number().over(wu).alias("rn")).localCheckpoint(eager=True)
    a = r.select("user_id", F.col("event_type").alias("prev"), F.col("rn").alias("ra"))
    b = r.select("user_id", F.col("event_type").alias("nxt"), F.col("rn").alias("nrn"))
    tr = a.join(b, "user_id").where(F.col("nrn") == F.col("ra") + 1).select(
        "prev", "nxt", "nrn"
    ).localCheckpoint(eager=True)
    train = tr.where(F.col("nrn") % 2 == 0).select("prev", "nxt")
    test = tr.where(F.col("nrn") % 2 == 1).select("prev", "nxt")
    tc = train.groupBy("prev", "nxt").agg(F.count(F.lit(1)).alias("c"))
    wm = Window.partitionBy("prev").orderBy(F.desc("c"), "nxt")
    model = tc.select("prev", F.col("nxt").alias("pred"), F.row_number().over(wm).alias("rk")).where(
        F.col("rk") == 1
    ).drop("rk")
    mj = tc.groupBy("nxt").agg(F.sum("c").alias("c"))
    maj = mj.orderBy(F.desc("c"), "nxt").limit(1).select(F.col("nxt").alias("mpred"))
    sc = (
        test.join(F.broadcast(model), "prev", "left")
        .crossJoin(F.broadcast(maj))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum((F.col("nxt") == F.col("pred")).cast("int")).cast("long").alias("hit_markov"),
            F.sum((F.col("nxt") == F.col("mpred")).cast("int")).cast("long").alias("hit_majority"),
        )
    )
    n_train = train.count()
    return sc.select(
        F.lit(n_train).cast("long").alias("n_train"),
        "n_test",
        F.round(F.col("hit_markov").cast("double") / F.col("n_test"), 6).alias("acc_markov"),
        F.round(F.col("hit_majority").cast("double") / F.col("n_test"), 6).alias("acc_majority"),
    )


# --------------------------------------------------------------------------
# batch 35: MDE power analysis, CUPED variance reduction, SPRT crossing

_Z_ALPHA2 = 1.959964  # two-sided 5%
_Z_BETA = 0.841621    # 80% power


@query(
    "mde_power",
    f"""WITH v AS (
         SELECT (user_id % 2 = 0) AS arm_a,
                CAST(round(value * 1000000.0) AS BIGINT) AS v_fp
         FROM events),
       g AS (
         SELECT count(*)::BIGINT AS n, sum(v_fp)::BIGINT AS s,
                sum(v_fp::HUGEINT * v_fp::HUGEINT) AS q,
                sum(CASE WHEN arm_a THEN 1 ELSE 0 END)::BIGINT AS n_a
         FROM v)
       SELECT n_a, (n - n_a)::BIGINT AS n_b,
              round(sqrt(q::DOUBLE / n - (s::DOUBLE / n) * (s::DOUBLE / n))
                    / 1000000.0, 6) AS sigma,
              round(({_Z_ALPHA2} + {_Z_BETA})
                    * sqrt(q::DOUBLE / n - (s::DOUBLE / n) * (s::DOUBLE / n))
                    * sqrt(2.0 / least(n_a, n - n_a)::DOUBLE) / 1000000.0, 6) AS mde_abs,
              round(({_Z_ALPHA2} + {_Z_BETA})
                    * sqrt(q::DOUBLE / n - (s::DOUBLE / n) * (s::DOUBLE / n))
                    * sqrt(2.0 / least(n_a, n - n_a)::DOUBLE) / (s::DOUBLE / n), 6)
                AS mde_rel
       FROM g""",
)
def q_mde_power(spark, sf_dir):
    """Minimum detectable effect at 80% power / 5% two-sided α for the
    even-vs-odd-user experiment split: MDE = (z_{{α/2}}+z_β)·σ·√(2/n)
    with n the smaller arm — the pre-registration number every A/B
    design doc states before launch (complements `ab_test_stats`'s
    post-hoc read). σ comes from exact int64/HUGEINT sufficient stats;
    the z constants are shared literals so both engines evaluate the
    identical expression. Plan: ONE corpus census row; no shuffle
    beyond the partial agg."""
    ev = _events(spark, sf_dir)
    v = ev.select(
        (F.col("user_id") % 2 == 0).alias("arm_a"),
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("v_fp"),
    )
    dec = "decimal(38,0)"
    g = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v_fp").cast("long").alias("s"),
        F.sum(F.col("v_fp").cast(dec) * F.col("v_fp").cast(dec)).cast(dec).alias("q"),
        F.sum(F.when(F.col("arm_a"), 1).otherwise(0)).cast("long").alias("n_a"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    sig = F.sqrt(d_("q") / d_("n") - (d_("s") / d_("n")) * (d_("s") / d_("n")))
    nmin = F.least(F.col("n_a"), F.col("n") - F.col("n_a")).cast("double")
    mde = F.lit(_Z_ALPHA2 + _Z_BETA) * sig * F.sqrt(F.lit(2.0) / nmin)
    return g.select(
        "n_a", (F.col("n") - F.col("n_a")).cast("long").alias("n_b"),
        F.round(sig / F.lit(1e6), 6).alias("sigma"),
        F.round(mde / F.lit(1e6), 6).alias("mde_abs"),
        F.round(mde / (d_("s") / d_("n")), 6).alias("mde_rel"),
    )


@query(
    "cuped_adjustment",
    """WITH v AS (
         SELECT user_id, epoch_us(ts)::BIGINT AS t_us,
                CAST(round(value * 1000000.0) AS BIGINT) AS v_fp, event_id
         FROM events),
       r AS (SELECT *, row_number() OVER (ORDER BY t_us, event_id) AS rn,
                    count(*) OVER () AS nn FROM v),
       med AS (SELECT max(t_us) AS m FROM r WHERE rn <= (nn + 1) // 2),
       per_u AS (
         SELECT user_id,
                CAST(round(sum(CASE WHEN t_us <= med.m THEN v_fp END)::DOUBLE
                           / count(CASE WHEN t_us <= med.m THEN 1 END)) AS BIGINT) AS x_fp,
                CAST(round(sum(CASE WHEN t_us > med.m THEN v_fp END)::DOUBLE
                           / count(CASE WHEN t_us > med.m THEN 1 END)) AS BIGINT) AS y_fp
         FROM v CROSS JOIN med GROUP BY user_id
         HAVING count(CASE WHEN t_us <= med.m THEN 1 END) > 0
            AND count(CASE WHEN t_us > med.m THEN 1 END) > 0),
       st AS (
         SELECT count(*)::BIGINT AS n,
                sum(x_fp)::BIGINT AS sx, sum(y_fp)::BIGINT AS sy,
                sum(x_fp::HUGEINT * x_fp::HUGEINT) AS qx,
                sum(y_fp::HUGEINT * y_fp::HUGEINT) AS qy,
                sum(x_fp::HUGEINT * y_fp::HUGEINT) AS qxy
         FROM per_u)
       SELECT n,
              CASE WHEN n::DOUBLE * qx::DOUBLE - sx::DOUBLE * sx::DOUBLE > 0
                   THEN round((n::DOUBLE * qxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                              / (n::DOUBLE * qx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6)
              END AS theta,
              CASE WHEN (n::DOUBLE * qx::DOUBLE - sx::DOUBLE * sx::DOUBLE) > 0
                    AND (n::DOUBLE * qy::DOUBLE - sy::DOUBLE * sy::DOUBLE) > 0
                   THEN round((n::DOUBLE * qxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                              * (n::DOUBLE * qxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                              / ((n::DOUBLE * qx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                                 * (n::DOUBLE * qy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 6)
              END AS var_reduction
       FROM st""",
)
def q_cuped_adjustment(spark, sf_dir):
    """CUPED pre-period covariate adjustment (Deng, Xu, Kohavi & Walker,
    WSDM 2013): per user, pre-period mean (before the exact global
    median timestamp) as covariate X and post-period mean as metric Y;
    θ = cov(X,Y)/var(X) and the guaranteed variance reduction
    var(Y−θX)/var(Y) − 1 = −ρ² — the single highest-leverage trick in
    industrial A/B testing (same metric, ρ²-fraction less sample
    needed). Per-user means round once to micro-units; moments are
    exact int64/HUGEINT; θ and ρ² are identical double expressions.
    Plan: global-median rank pass + one user census + one moment row."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    v = ev.select(
        "user_id", epoch_micros(ev, "ts").cast("long").alias("t_us"),
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("v_fp"),
        "event_id",
    )
    n_all = v.count()
    wr = Window.orderBy("t_us", "event_id")
    med = (
        v.select("t_us", F.row_number().over(wr).alias("rn"))
        .where(F.col("rn") <= (n_all + 1) // 2)
        .agg(F.max("t_us").alias("m"))
    )
    pre = F.when(F.col("t_us") <= F.col("m"), F.col("v_fp"))
    post = F.when(F.col("t_us") > F.col("m"), F.col("v_fp"))
    per_u = (
        v.crossJoin(F.broadcast(med))
        .groupBy("user_id")
        .agg(
            F.round(F.sum(pre).cast("double") / F.count(pre), 0).cast("long").alias("x_fp"),
            F.round(F.sum(post).cast("double") / F.count(post), 0).cast("long").alias("y_fp"),
            F.count(pre).alias("n_pre"),
            F.count(post).alias("n_post"),
        )
        .where((F.col("n_pre") > 0) & (F.col("n_post") > 0))
    )
    dec = "decimal(38,0)"
    st = per_u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x_fp").cast("long").alias("sx"),
        F.sum("y_fp").cast("long").alias("sy"),
        F.sum(F.col("x_fp").cast(dec) * F.col("x_fp").cast(dec)).cast(dec).alias("qx"),
        F.sum(F.col("y_fp").cast(dec) * F.col("y_fp").cast(dec)).cast(dec).alias("qy"),
        F.sum(F.col("x_fp").cast(dec) * F.col("y_fp").cast(dec)).cast(dec).alias("qxy"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    vx = d_("n") * d_("qx") - d_("sx") * d_("sx")
    vy = d_("n") * d_("qy") - d_("sy") * d_("sy")
    cv = d_("n") * d_("qxy") - d_("sx") * d_("sy")
    return st.select(
        "n",
        F.when(vx > 0, F.round(cv / vx, 6)).alias("theta"),
        F.when((vx > 0) & (vy > 0), F.round(cv * cv / (vx * vy), 6)).alias("var_reduction"),
    )


_SPRT_LLR1 = 182_322    # round(1e6·ln(0.6/0.5))
_SPRT_LLR0 = -223_144   # round(1e6·ln(0.4/0.5))
_SPRT_BOUND = 2_944_439  # round(1e6·ln(19)) — α = β = 0.05


@query(
    "sprt_crossing",
    f"""WITH v AS (
         SELECT event_id, epoch_us(ts)::BIGINT AS t_us,
                CAST(round(value * 1000000.0) AS BIGINT) AS v_fp
         FROM events),
       r AS (SELECT *, row_number() OVER (ORDER BY t_us, event_id) AS rn,
                    count(*) OVER () AS nn FROM v),
       med AS (SELECT max(v_fp) AS m
               FROM (SELECT v_fp, row_number() OVER (ORDER BY v_fp, event_id) AS vr,
                            count(*) OVER () AS vn FROM v)
               WHERE vr <= (vn + 1) // 2),
       llr AS (
         SELECT r.rn,
                sum(CASE WHEN r.v_fp >= med.m THEN {_SPRT_LLR1}
                         ELSE {_SPRT_LLR0} END)
                  OVER (ORDER BY r.rn)::BIGINT AS cum
         FROM r CROSS JOIN med),
       crossing AS (
         SELECT rn, cum,
                CASE WHEN cum >= {_SPRT_BOUND} THEN 'h1'
                     WHEN cum <= -{_SPRT_BOUND} THEN 'h0' END AS hit
         FROM llr),
       first_hit AS (
         SELECT rn, hit FROM crossing WHERE hit IS NOT NULL
         ORDER BY rn LIMIT 1)
       SELECT (SELECT max(rn) FROM llr)::BIGINT AS n,
              coalesce((SELECT rn FROM first_hit), 0)::BIGINT AS first_cross,
              coalesce((SELECT hit FROM first_hit), 'none') AS decision,
              (SELECT cum FROM llr WHERE rn = (SELECT max(rn) FROM llr))::BIGINT
                AS llr_final_fp""",
)
def q_sprt_crossing(spark, sf_dir):
    """Wald sequential probability ratio test replay (Wald 1945): the
    time-ordered stream of above-median indicators accumulates
    log-likelihood ratio for p=0.6 vs p=0.5 in once-rounded integer
    micro-nats; the FIRST crossing of ±ln(19) (α=β=0.05) is the early-
    stopping decision every sequential experimentation / monitoring
    system implements — the replay says when the experiment COULD have
    stopped. Integer cumsum = order-proof; the global ordered scan is
    one window (two-pass range partitioning at scale, as documented in
    sequence_pack). Reward threshold is the exact integer-rank median
    so the replay is self-contained and deterministic."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    v = ev.select(
        "event_id", epoch_micros(ev, "ts").cast("long").alias("t_us"),
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("v_fp"),
    ).localCheckpoint(eager=True)  # feeds median rank AND the ordered scan
    n_all = v.count()
    wv = Window.orderBy("v_fp", "event_id")
    med = (
        v.select("v_fp", F.row_number().over(wv).alias("vr"))
        .where(F.col("vr") <= (n_all + 1) // 2)
        .agg(F.max("v_fp").alias("m"))
    )
    wr = Window.orderBy("t_us", "event_id")
    wc = Window.orderBy("rn").rowsBetween(Window.unboundedPreceding, 0)
    llr = (
        v.crossJoin(F.broadcast(med))
        .select(
            F.row_number().over(wr).alias("rn"),
            F.when(F.col("v_fp") >= F.col("m"), F.lit(_SPRT_LLR1))
            .otherwise(F.lit(_SPRT_LLR0))
            .alias("step"),
        )
        .select("rn", F.sum("step").over(wc).cast("long").alias("cum"))
        .localCheckpoint(eager=True)  # feeds first-hit scan AND final row
    )
    hit = F.when(F.col("cum") >= _SPRT_BOUND, F.lit("h1")).when(
        F.col("cum") <= -_SPRT_BOUND, F.lit("h0")
    )
    first = (
        llr.select("rn", "cum", hit.alias("hit"))
        .where(F.col("hit").isNotNull())
        .orderBy("rn")
        .limit(1)
        .select(F.col("rn").alias("first_cross"), F.col("hit").alias("decision"))
    )
    final = llr.orderBy(F.desc("rn")).limit(1).select(
        F.col("rn").alias("n"), F.col("cum").alias("llr_final_fp")
    )
    return (
        final.crossJoin(
            first.unionAll(
                spark.createDataFrame([(0, "none")], "first_cross long, decision string")
            ).limit(1)
        )
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("first_cross").cast("long").alias("first_cross"),
            "decision",
            F.col("llr_final_fp").cast("long").alias("llr_final_fp"),
        )
    )


# --------------------------------------------------------------------------
# batch 36: Jensen-Shannon source drift, conformal coverage, budget curation

_JSD_V = 100


def _jsd_sql(v: int = _JSD_V) -> str:
    return f"""WITH toks AS (
         SELECT source, unnest(string_split(trim(text), ' ')) AS token FROM documents),
       cnt AS (SELECT source, token, count(*)::BIGINT AS c FROM toks GROUP BY 1, 2),
       topv AS (
         SELECT token FROM (SELECT token, sum(c) AS tc FROM cnt GROUP BY token)
         ORDER BY tc DESC, token LIMIT {v}),
       mapped AS (
         SELECT cnt.source,
                CASE WHEN topv.token IS NOT NULL THEN cnt.token ELSE '<other>' END AS tok,
                sum(cnt.c)::BIGINT AS c
         FROM cnt LEFT JOIN topv ON topv.token = cnt.token
         GROUP BY 1, 2),
       ns AS (SELECT source, sum(c)::BIGINT AS n FROM mapped GROUP BY source),
       pr AS (SELECT a.source AS src_a, a.n AS na, b.source AS src_b, b.n AS nb
              FROM ns a JOIN ns b ON a.source < b.source),
       cells AS (
         SELECT pr.src_a, pr.src_b, pr.na, pr.nb, t.tok,
                coalesce(ca.c, 0) AS a, coalesce(cb.c, 0) AS b
         FROM pr CROSS JOIN (SELECT DISTINCT tok FROM mapped) t
         LEFT JOIN mapped ca ON ca.source = pr.src_a AND ca.tok = t.tok
         LEFT JOIN mapped cb ON cb.source = pr.src_b AND cb.tok = t.tok),
       terms AS (
         SELECT src_a, src_b, na, nb,
                CASE WHEN a > 0
                     THEN a * CAST(round(1000000.0 * ln(2.0 * a::DOUBLE * nb::DOUBLE
                                   / (a::DOUBLE * nb::DOUBLE + b::DOUBLE * na::DOUBLE)))
                              AS BIGINT) ELSE 0 END AS ta,
                CASE WHEN b > 0
                     THEN b * CAST(round(1000000.0 * ln(2.0 * b::DOUBLE * na::DOUBLE
                                   / (a::DOUBLE * nb::DOUBLE + b::DOUBLE * na::DOUBLE)))
                              AS BIGINT) ELSE 0 END AS tb
         FROM cells)
       SELECT src_a, src_b,
              round((sum(ta)::DOUBLE / na + sum(tb)::DOUBLE / nb) / 2000000.0, 6) AS jsd
       FROM terms GROUP BY src_a, src_b, na, nb"""


@query("source_jsd", _jsd_sql())
def q_source_jsd(spark, sf_dir):
    """Jensen-Shannon divergence between source token distributions
    (Lin, IEEE-IT 1991): the symmetric, bounded (≤ ln 2) drift metric —
    unlike `source_kl` it tolerates zero-frequency tokens without
    smoothing, and unlike `wasserstein_1d` it compares CATEGORY
    distributions. Vocabulary is the global top-{_JSD_V} plus an
    '<other>' bucket so the cell grid stays bounded at any corpus
    size. Each cell's ln rounds once to micro-nats against its exact
    integer count; the two per-source sums divide by their totals at
    the very end. Plan: one census shuffle, pair×vocab dimension grid."""
    d = _docs(spark, sf_dir)
    toks = d.select("source", F.explode(T.tokenize(F.col("text"))).alias("token"))
    cnt = toks.groupBy("source", "token").agg(F.count(F.lit(1)).cast("long").alias("c"))
    topv = (
        cnt.groupBy("token").agg(F.sum("c").alias("tc"))
        .orderBy(F.desc("tc"), "token").limit(_JSD_V).select("token", F.lit(1).alias("keep"))
    )
    mapped = (
        cnt.join(F.broadcast(topv), "token", "left")
        .select(
            "source",
            F.when(F.col("keep") == 1, F.col("token")).otherwise(F.lit("<other>")).alias("tok"),
            "c",
        )
        .groupBy("source", "tok")
        .agg(F.sum("c").cast("long").alias("c"))
        .localCheckpoint(eager=True)  # feeds totals, vocab dim, and both cell sides
    )
    ns = mapped.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    pr = (
        ns.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
        .join(
            ns.select(F.col("source").alias("src_b"), F.col("n").alias("nb")),
            F.col("src_a") < F.col("src_b"),
        )
    )
    vocab = mapped.select("tok").distinct()
    cells = (
        pr.crossJoin(vocab)
        .join(
            mapped.select(F.col("source").alias("src_a"), "tok", F.col("c").alias("a")),
            ["src_a", "tok"], "left",
        )
        .join(
            mapped.select(F.col("source").alias("src_b"), "tok", F.col("c").alias("b")),
            ["src_b", "tok"], "left",
        )
        .select(
            "src_a", "src_b", "na", "nb",
            F.coalesce("a", F.lit(0)).alias("a"), F.coalesce("b", F.lit(0)).alias("b"),
        )
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    den = d_("a") * d_("nb") + d_("b") * d_("na")
    ta = F.when(
        F.col("a") > 0,
        F.col("a") * F.round(F.lit(1e6) * F.log(F.lit(2.0) * d_("a") * d_("nb") / den), 0).cast("long"),
    ).otherwise(F.lit(0))
    tb = F.when(
        F.col("b") > 0,
        F.col("b") * F.round(F.lit(1e6) * F.log(F.lit(2.0) * d_("b") * d_("na") / den), 0).cast("long"),
    ).otherwise(F.lit(0))
    return (
        cells.select("src_a", "src_b", "na", "nb", ta.alias("ta"), tb.alias("tb"))
        .groupBy("src_a", "src_b", "na", "nb")
        .agg(
            F.round(
                (F.sum("ta").cast("double") / F.col("na") + F.sum("tb").cast("double") / F.col("nb"))
                / F.lit(2e6),
                6,
            ).alias("jsd")
        )
        .select("src_a", "src_b", "jsd")
    )


@query(
    "conformal_coverage",
    """WITH v AS (
         SELECT event_id, event_type,
                CAST(round(value * 1000000.0) AS BIGINT) AS v_fp,
                event_id % 3 AS fold
         FROM events),
       model AS (
         SELECT event_type,
                CAST(round(sum(v_fp)::DOUBLE / count(*)) AS BIGINT) AS pred
         FROM v WHERE fold = 0 GROUP BY event_type),
       cal AS (
         SELECT abs(v.v_fp - m.pred)::BIGINT AS r
         FROM v JOIN model m USING (event_type) WHERE fold = 1),
       qh AS (
         SELECT max(r)::BIGINT AS q_hat, max(n)::BIGINT AS n_cal FROM (
           SELECT r, row_number() OVER (ORDER BY r) AS rn, count(*) OVER () AS n
           FROM cal) WHERE rn <= CAST(ceil(0.9 * (n + 1)) AS BIGINT)),
       test AS (
         SELECT abs(v.v_fp - m.pred)::BIGINT AS r
         FROM v JOIN model m USING (event_type) WHERE fold = 2)
       SELECT qh.n_cal, count(*)::BIGINT AS n_test, qh.q_hat,
              round(sum((test.r <= qh.q_hat)::INT)::DOUBLE / count(*), 6) AS coverage
       FROM test CROSS JOIN qh GROUP BY qh.n_cal, qh.q_hat""",
)
def q_conformal_coverage(spark, sf_dir):
    """Split-conformal prediction-interval calibration (Vovk 2005;
    Angelopoulos & Bates 2023 tutorial): train a per-event-type mean
    predictor on fold 0, take q̂ = the ⌈0.9(n+1)⌉-th smallest absolute
    residual on calibration fold 1, and report empirical coverage of
    |y−ŷ| ≤ q̂ on held-out fold 2 — the distribution-free guarantee
    check that modern ML-deployment pipelines run on every model. The
    deterministic event_id%3 folds make the audit reproducible;
    residuals and the rank quantile are exact integers; coverage is
    one division. Plan: one fold census for the model (broadcast dim),
    one rank window on the calibration residuals (cal-fold-sized)."""
    ev = _events(spark, sf_dir)
    v = ev.select(
        "event_id", "event_type",
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("v_fp"),
        (F.col("event_id") % 3).alias("fold"),
    ).localCheckpoint(eager=True)
    model = (
        v.where(F.col("fold") == 0)
        .groupBy("event_type")
        .agg(F.round(F.sum("v_fp").cast("double") / F.count(F.lit(1)), 0).cast("long").alias("pred"))
    )
    cal = v.where(F.col("fold") == 1).join(F.broadcast(model), "event_type").select(
        F.abs(F.col("v_fp") - F.col("pred")).cast("long").alias("r")
    )
    wr = Window.orderBy("r")
    ranked = cal.select(
        "r", F.row_number().over(wr).alias("rn"), F.count(F.lit(1)).over(Window.partitionBy()).alias("n")
    )
    qh = ranked.where(
        F.col("rn") <= F.ceil(F.lit(0.9) * (F.col("n") + 1)).cast("long")
    ).agg(F.max("r").cast("long").alias("q_hat"), F.max("n").cast("long").alias("n_cal"))
    test = v.where(F.col("fold") == 2).join(F.broadcast(model), "event_type").select(
        F.abs(F.col("v_fp") - F.col("pred")).cast("long").alias("r")
    )
    return (
        test.crossJoin(F.broadcast(qh))
        .groupBy("n_cal", "q_hat")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.round(
                F.sum((F.col("r") <= F.col("q_hat")).cast("int")).cast("double") / F.count(F.lit(1)), 6
            ).alias("coverage"),
        )
        .select("n_cal", "n_test", "q_hat", "coverage")
    )


def _budget_sql() -> str:
    return f"""WITH q AS (SELECT * FROM ({_QUALITY_ORACLE}) t),
       w AS (
         SELECT d.doc_id,
                len(string_split(trim(d.text), ' '))::BIGINT AS toks,
                CAST(round(q.quality * 1000000.0) AS BIGINT) AS q_fp
         FROM documents d JOIN q ON q.doc_id = d.doc_id
         WHERE len(string_split(trim(d.text), ' ')) > 0),
       tot AS (SELECT (sum(toks) // 5)::BIGINT AS budget FROM w),
       ranked AS (
         SELECT *, CAST(round(1000000000.0 * q_fp / toks) AS BIGINT) AS ratio_fp
         FROM w),
       cum AS (
         SELECT *, sum(toks) OVER (ORDER BY ratio_fp DESC, doc_id) AS cum_toks
         FROM ranked),
       flagged AS (SELECT cum.*, (cum_toks <= tot.budget) AS kept FROM cum CROSS JOIN tot)
       SELECT max(tot.budget)::BIGINT AS budget,
              sum(kept::INT)::BIGINT AS n_kept,
              sum(CASE WHEN kept THEN toks ELSE 0 END)::BIGINT AS tokens_kept,
              round(sum(CASE WHEN kept THEN q_fp ELSE 0 END)::DOUBLE
                    / (1000000.0 * sum(kept::INT)), 6) AS avg_q_kept,
              round(sum(CASE WHEN NOT kept THEN q_fp ELSE 0 END)::DOUBLE
                    / (1000000.0 * sum((NOT kept)::INT)), 6) AS avg_q_dropped
       FROM flagged CROSS JOIN tot GROUP BY tot.budget"""


@query("budget_select", _budget_sql())
def q_budget_select(spark, sf_dir):
    """Budget-constrained greedy curation (the fractional-knapsack
    ratio rule): rank documents by quality-per-token and keep the
    prefix that fits a 20%-of-corpus token budget — the selection move
    every 'train on the best X tokens' pipeline makes, reported as
    kept/dropped quality separation. Ratios round once to integer
    nano-units (total order, deterministic ties by doc id); the
    running token total is one global ordered window (two-pass range
    partitioning at scale, as documented in sequence_pack). Output is
    a single audit row."""
    d = _docs(spark, sf_dir)
    n_t = F.size(T.tokenize(F.col("text"))).cast("long")
    w = d.select(
        "doc_id", n_t.alias("toks"),
        F.round(T.quality_score("text") * F.lit(1e6), 0).cast("long").alias("q_fp"),
    ).where(F.col("toks") > 0).localCheckpoint(eager=True)
    budget = w.agg((F.floor(F.sum("toks") / 5)).cast("long").alias("budget"))
    ranked = w.select(
        "*", F.round(F.lit(1e9) * F.col("q_fp") / F.col("toks"), 0).cast("long").alias("ratio_fp")
    )
    wo = Window.orderBy(F.desc("ratio_fp"), "doc_id").rowsBetween(Window.unboundedPreceding, 0)
    cum = ranked.select("*", F.sum("toks").over(wo).alias("cum_toks"))
    flagged = cum.crossJoin(F.broadcast(budget)).select(
        "*", (F.col("cum_toks") <= F.col("budget")).alias("kept")
    )
    return flagged.groupBy("budget").agg(
        F.sum(F.col("kept").cast("int")).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("kept"), F.col("toks")).otherwise(0)).cast("long").alias("tokens_kept"),
        F.round(
            F.sum(F.when(F.col("kept"), F.col("q_fp")).otherwise(0)).cast("double")
            / (F.lit(1e6) * F.sum(F.col("kept").cast("int"))),
            6,
        ).alias("avg_q_kept"),
        F.round(
            F.sum(F.when(~F.col("kept"), F.col("q_fp")).otherwise(0)).cast("double")
            / (F.lit(1e6) * F.sum((~F.col("kept")).cast("int"))),
            6,
        ).alias("avg_q_dropped"),
    ).select("budget", "n_kept", "tokens_kept", "avg_q_kept", "avg_q_dropped")


# --------------------------------------------------------------------------
# batch 37: LSH band-tuning sweep, recommender coverage, missing mass

_SWEEP_CFGS = [(1, 8), (2, 4), (4, 2), (8, 1)]  # (bands, rows) over K=8
_SWEEP_S = (0.5, 0.8, 0.9)


def _sweep_theory(b: int, r: int) -> tuple[float, float, float]:
    return tuple(round(1.0 - (1.0 - s**r) ** b, 6) for s in _SWEEP_S)


def _sweep_band_sql(cfg_i: int, b: int, rows: int) -> str:
    concat = " || '|' || ".join(
        f"CAST(mh_{b * rows + j} AS VARCHAR)" for j in range(rows)
    )
    return md5_int_sql(f"({concat})", seed=20_000 + cfg_i * 16 + b)


def _lsh_sweep_sql() -> str:
    parts = []
    for i, (nb, rows) in enumerate(_SWEEP_CFGS):
        keys = ", ".join(_sweep_band_sql(i, b, rows) for b in range(nb))
        p50, p80, p90 = _sweep_theory(nb, rows)
        parts.append(f"""(
          SELECT {nb}::BIGINT AS bands, {rows}::BIGINT AS rows_per_band,
                 (SELECT count(*) FROM (
                    SELECT DISTINCT a.doc_id, b.doc_id
                    FROM (SELECT doc_id, unnest([{keys}]) AS bk FROM sigs) a
                    JOIN (SELECT doc_id, unnest([{keys}]) AS bk FROM sigs) b
                      USING (bk)
                    WHERE a.doc_id < b.doc_id))::BIGINT AS n_candidates,
                 {p50}::DOUBLE AS p_at_s50, {p80}::DOUBLE AS p_at_s80,
                 {p90}::DOUBLE AS p_at_s90)""")
    return _minhash_cte() + " " + "\nUNION ALL\n".join(parts)


@query("lsh_band_sweep", _lsh_sweep_sql())
def q_lsh_band_sweep(spark, sf_dir):
    """LSH banding-parameter sweep over the SAME K=8 MinHash signature:
    for each (bands, rows) split, the realized candidate-pair count next
    to the theoretical capture probability 1−(1−s^r)^b at similarity
    0.5/0.8/0.9 — the tuning table every LSH deployment derives before
    fixing its S-curve (more bands = higher recall AND more candidate
    volume; this query shows both sides on real data). Signatures are
    computed ONCE (checkpointed) and each config is a banded explode +
    bucket self-join — the sweep never rescans the corpus. Theory
    values are Python-computed shared literals."""
    sigs = D.minhash_signatures(
        _docs(spark, sf_dir), "text", "doc_id", _MH_K, _MH_SHINGLE
    ).localCheckpoint(eager=True)
    rows_out = []
    for i, (nb, rows) in enumerate(_SWEEP_CFGS):
        keys = F.array(
            *[
                md5_int(
                    F.concat_ws("|", *[F.col(f"mh_{b * rows + j}").cast("string") for j in range(rows)]),
                    seed=20_000 + i * 16 + b,
                )
                for b in range(nb)
            ]
        )
        banded = sigs.select("doc_id", F.explode(keys).alias("bk"))
        a = banded.select(F.col("doc_id").alias("ia"), "bk")
        bb = banded.select(F.col("doc_id").alias("ib"), "bk")
        n_cand = (
            a.join(bb, "bk").where(F.col("ia") < F.col("ib")).select("ia", "ib").distinct().count()
        )
        p50, p80, p90 = _sweep_theory(nb, rows)
        rows_out.append((nb, rows, n_cand, p50, p80, p90))
    return spark.createDataFrame(
        rows_out,
        "bands long, rows_per_band long, n_candidates long, "
        "p_at_s50 double, p_at_s80 double, p_at_s90 double",
    )


@query(
    "rec_coverage",
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       sized AS (SELECT l_orderkey FROM op GROUP BY l_orderkey
                 HAVING count(*) BETWEEN 2 AND 20),
       b AS (SELECT op.* FROM op JOIN sized USING (l_orderkey)),
       ci AS (SELECT l_partkey, count(*)::BIGINT AS c FROM b GROUP BY l_partkey),
       co AS (
         SELECT a.l_partkey AS p1, bb.l_partkey AS p2, count(*)::BIGINT AS c_co
         FROM b a JOIN b bb ON a.l_orderkey = bb.l_orderkey
                           AND a.l_partkey < bb.l_partkey
         GROUP BY 1, 2),
       sym AS (SELECT p1 AS part_id, p2 AS neighbor_id, c_co FROM co
               UNION ALL SELECT p2, p1, c_co FROM co),
       scored AS (
         SELECT s.part_id, s.neighbor_id,
                round(s.c_co::DOUBLE / sqrt(c1.c::DOUBLE * c2.c::DOUBLE), 6) AS cosine
         FROM sym s JOIN ci c1 ON c1.l_partkey = s.part_id
                    JOIN ci c2 ON c2.l_partkey = s.neighbor_id),
       recs AS (
         SELECT neighbor_id FROM (
           SELECT part_id, neighbor_id,
                  row_number() OVER (PARTITION BY part_id
                                     ORDER BY cosine DESC, neighbor_id) AS rank
           FROM scored) WHERE rank <= 5),
       rc AS (
         SELECT ci.l_partkey, count(recs.neighbor_id)::BIGINT AS nrec
         FROM ci LEFT JOIN recs ON recs.neighbor_id = ci.l_partkey
         GROUP BY ci.l_partkey),
       lorenz AS (
         SELECT nrec, row_number() OVER (ORDER BY nrec, l_partkey) AS i,
                count(*) OVER () AS n, sum(nrec) OVER () AS tot
         FROM rc)
       SELECT max(n)::BIGINT AS catalog,
              sum((nrec > 0)::INT)::BIGINT AS recommended,
              round(sum((nrec > 0)::INT)::DOUBLE / max(n), 6) AS coverage,
              round(2.0 * sum(i::HUGEINT * nrec::HUGEINT)::DOUBLE
                    / (max(n)::DOUBLE * max(tot)::DOUBLE)
                    - (max(n) + 1)::DOUBLE / max(n)::DOUBLE, 6) AS gini
       FROM lorenz""",
)
def q_rec_coverage(spark, sf_dir):
    """Catalog coverage and popularity-bias Gini of the `item_cosine`
    recommender's top-5 lists — the aggregate-diversity health check
    (Adomavicius & Kwon, TKDE 2012): what share of the catalog is ever
    recommended, and how concentrated recommendation slots are (Gini
    over per-item recommendation counts, zeros included — the
    long-tail starvation number a marketplace watches). Gini comes
    from the exact Lorenz identity 2Σi·xᵢ/(n·Σx) − (n+1)/n with one
    global rank window on the item-grain table; everything upstream is
    the item_cosine plan."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        op.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("bs"))
        .where((F.col("bs") >= 2) & (F.col("bs") <= 20)).select("l_orderkey")
    )
    b = op.join(sized, "l_orderkey").localCheckpoint(eager=True)
    ci = b.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("c")).localCheckpoint(eager=True)
    a1 = b.select("l_orderkey", F.col("l_partkey").alias("p1"))
    a2 = b.select("l_orderkey", F.col("l_partkey").alias("p2"))
    co = (
        a1.join(a2, "l_orderkey").where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2").agg(F.count(F.lit(1)).cast("long").alias("c_co"))
    )
    sym = co.select(F.col("p1").alias("part_id"), F.col("p2").alias("neighbor_id"), "c_co").unionAll(
        co.select(F.col("p2").alias("part_id"), F.col("p1").alias("neighbor_id"), "c_co")
    )
    scored = (
        sym.join(ci.withColumnRenamed("l_partkey", "part_id").withColumnRenamed("c", "c1"), "part_id")
        .join(ci.withColumnRenamed("l_partkey", "neighbor_id").withColumnRenamed("c", "c2"), "neighbor_id")
        .select(
            "part_id", "neighbor_id",
            F.round(
                F.col("c_co").cast("double")
                / F.sqrt(F.col("c1").cast("double") * F.col("c2").cast("double")), 6
            ).alias("cosine"),
        )
    )
    wr = Window.partitionBy("part_id").orderBy(F.desc("cosine"), "neighbor_id")
    recs = scored.select("neighbor_id", F.row_number().over(wr).alias("rank")).where(
        F.col("rank") <= 5
    )
    rc = (
        ci.select("l_partkey")
        .join(recs.groupBy("neighbor_id").agg(F.count(F.lit(1)).alias("nrec")),
              ci.l_partkey == F.col("neighbor_id"), "left")
        .select("l_partkey", F.coalesce("nrec", F.lit(0)).cast("long").alias("nrec"))
    )
    dec = "decimal(38,0)"
    wl = Window.orderBy("nrec", "l_partkey")
    lorenz = rc.select(
        "nrec", F.row_number().over(wl).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        F.sum("nrec").over(Window.partitionBy()).alias("tot"),
    )
    return lorenz.agg(
        F.max("n").cast("long").alias("catalog"),
        F.sum((F.col("nrec") > 0).cast("int")).cast("long").alias("recommended"),
        F.round(F.sum((F.col("nrec") > 0).cast("int")).cast("double") / F.max("n"), 6).alias("coverage"),
        F.round(
            F.lit(2.0) * F.sum(F.col("i").cast(dec) * F.col("nrec").cast(dec)).cast("double")
            / (F.max("n").cast("double") * F.max("tot").cast("double"))
            - (F.max("n") + 1).cast("double") / F.max("n").cast("double"),
            6,
        ).alias("gini"),
    )


@query(
    "missing_mass",
    """WITH toks AS (
         SELECT source, unnest(string_split(trim(text), ' ')) AS token FROM documents),
       cnt AS (SELECT source, token, count(*)::BIGINT AS c FROM toks GROUP BY 1, 2)
       SELECT source,
              sum(c)::BIGINT AS n_tokens,
              count(*)::BIGINT AS s_obs,
              sum((c = 1)::INT)::BIGINT AS hapax,
              sum((c = 2)::INT)::BIGINT AS doubletons,
              round(sum((c = 1)::INT)::DOUBLE / sum(c), 6) AS missing_mass,
              round(count(*)::DOUBLE
                    + sum((c = 1)::INT)::DOUBLE * (sum((c = 1)::INT) - 1)::DOUBLE
                      / (2.0 * (sum((c = 2)::INT) + 1)::DOUBLE), 6) AS chao1
       FROM cnt GROUP BY source""",
)
def q_missing_mass(spark, sf_dir):
    """Good-Turing missing mass and bias-corrected Chao1 richness per
    source (Good 1953; Chao 1984): the hapax share N₁/N estimates the
    probability the NEXT token is unseen, and Chao1 = S + N₁(N₁−1)/
    (2(N₂+1)) estimates total vocabulary including the unobserved tail
    — the pair of numbers that says whether a source's vocabulary is
    exhausted or barely sampled (drives crawl-more-vs-enough
    decisions). All counts exact from one (source, token) census; two
    final divisions. The bias-corrected Chao1 form stays defined when
    no doubletons exist."""
    d = _docs(spark, sf_dir)
    cnt = (
        d.select("source", F.explode(T.tokenize(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    n1 = F.sum((F.col("c") == 1).cast("int")).cast("long")
    n2 = F.sum((F.col("c") == 2).cast("int")).cast("long")
    return cnt.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("s_obs"),
        n1.alias("hapax"),
        n2.alias("doubletons"),
        F.round(n1.cast("double") / F.sum("c"), 6).alias("missing_mass"),
        F.round(
            F.count(F.lit(1)).cast("double")
            + n1.cast("double") * (n1 - 1).cast("double") / (F.lit(2.0) * (n2 + 1).cast("double")),
            6,
        ).alias("chao1"),
    )


# --------------------------------------------------------------------------
# batch 38: snapshot time travel, Cohen's kappa, posting-list compression

@query(
    "snapshot_asof",
    """SELECT 'asof_s1' AS snapshot_label,
              count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars
       FROM documents WHERE doc_id % 3 = 0
       UNION ALL
       SELECT 'current', count(*)::BIGINT, sum(n_chars)::BIGINT
       FROM documents WHERE doc_id % 3 IN (0, 1)
       UNION ALL
       SELECT 'delta_s2', count(*)::BIGINT, sum(n_chars)::BIGINT
       FROM documents WHERE doc_id % 3 = 1""",
)
def q_snapshot_asof(spark, sf_dir):
    """Iceberg-style snapshot isolation exercised end-to-end (north
    rule: versioned input with time travel): commit docs with
    doc_id%3==0 as snapshot 1, append doc_id%3==1 as snapshot 2, then
    read (a) AS OF snapshot 1 — later commits must be invisible,
    (b) the current table, and (c) the INCREMENTAL delta (s1, s2] —
    only snapshot 2's files are scanned. The oracle is the pure
    relational meaning of each read, so a stale manifest, a leaked
    file, or a wrong delta walk all hash-mismatch. The table lives
    under spark-warehouse/ and is rebuilt idempotently per run
    (sources/snapshots.py; reference anchor: pliers has no versioned
    store — this is the engine-level Iceberg contract the 10^12-page
    crawl table needs)."""
    import os
    import shutil

    from pliers_spark.sources.snapshots import SnapshotTable

    tag = os.path.basename(sf_dir.rstrip("/"))
    root = os.path.join("/root/repo/spark-warehouse", f"_asof_demo_{tag}")
    shutil.rmtree(root, ignore_errors=True)
    t = SnapshotTable(root)
    d = _docs(spark, sf_dir).select("doc_id", "n_chars")
    s1 = t.commit(d.where(F.col("doc_id") % 3 == 0), "append")
    s2 = t.commit(d.where(F.col("doc_id") % 3 == 1), "append")

    def summarize(df, label):
        return df.agg(
            F.lit(label).alias("snapshot_label"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        ).select("snapshot_label", "n_docs", "sum_chars")

    asof = summarize(t.read(spark, s1), "asof_s1")
    cur = summarize(t.read(spark), "current")
    delta = summarize(t.read_incremental(spark, s1, s2), "delta_s2")
    return asof.unionAll(cur).unionAll(delta)


@query(
    "classifier_kappa",
    f"""WITH q AS (SELECT * FROM ({_QUALITY_ORACLE}) t),
       j AS (
         SELECT (q.quality >= 0.5)::INT AS a,
                (len(string_split(trim(d.text), ' ')) >= 30)::INT AS b
         FROM documents d JOIN q ON q.doc_id = d.doc_id),
       s AS (
         SELECT count(*)::BIGINT AS n,
                sum((a = b)::INT)::BIGINT AS agree,
                sum(a)::BIGINT AS a_yes, sum(b)::BIGINT AS b_yes
         FROM j)
       SELECT n, agree, a_yes, b_yes,
              round((n::DOUBLE * agree::DOUBLE
                     - (a_yes::DOUBLE * b_yes::DOUBLE
                        + (n - a_yes)::DOUBLE * (n - b_yes)::DOUBLE))
                    / (n::DOUBLE * n::DOUBLE
                       - (a_yes::DOUBLE * b_yes::DOUBLE
                          + (n - a_yes)::DOUBLE * (n - b_yes)::DOUBLE)), 6) AS kappa
       FROM s""",
)
def q_classifier_kappa(spark, sf_dir):
    """Cohen's kappa agreement (Cohen 1960) between two in-repo quality
    signals — the composite quality score ≥ 0.5 vs a plain ≥30-token
    length gate: κ = (p_o − p_e)/(1 − p_e) with chance agreement from
    the marginals. This is the annotator/classifier-agreement audit a
    curation team runs before trusting cheap heuristic labels as
    training signal for a learned filter. Everything is one 2×2 census
    in exact int64; κ is a single identical double expression (the
    n·agree − (a·b + a'·b') cross-multiplied form avoids intermediate
    ratios)."""
    d = _docs(spark, sf_dir)
    j = d.select(
        (T.quality_score("text") >= 0.5).cast("int").alias("a"),
        (F.size(T.tokenize(F.col("text"))) >= 30).cast("int").alias("b"),
    )
    s = j.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("a") == F.col("b")).cast("int")).cast("long").alias("agree"),
        F.sum("a").cast("long").alias("a_yes"),
        F.sum("b").cast("long").alias("b_yes"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    pe_num = d_("a_yes") * d_("b_yes") + (F.col("n") - F.col("a_yes")).cast("double") * (
        F.col("n") - F.col("b_yes")
    ).cast("double")
    return s.select(
        "n", "agree", "a_yes", "b_yes",
        F.round(
            (d_("n") * d_("agree") - pe_num) / (d_("n") * d_("n") - pe_num), 6
        ).alias("kappa"),
    )


@query(
    "posting_compression",
    """WITH toks AS (
         SELECT DISTINCT doc_id,
                unnest(string_split(trim(text), ' ')) AS token
         FROM documents),
       g AS (
         SELECT token, doc_id,
                doc_id - lag(doc_id) OVER (PARTITION BY token ORDER BY doc_id) AS gap
         FROM toks),
       bits AS (
         SELECT token,
                count(*)::BIGINT AS df,
                sum(CASE WHEN gap IS NULL THEN 2 * CAST(floor(log2(doc_id + 1)) AS BIGINT) + 1
                         ELSE 2 * CAST(floor(log2(gap)) AS BIGINT) + 1 END)::BIGINT
                  AS gamma_bits
         FROM g GROUP BY token HAVING count(*) >= 2)
       SELECT token, df, gamma_bits, (64 * df)::BIGINT AS raw_bits,
              round(gamma_bits::DOUBLE / (64.0 * df), 6) AS ratio,
              row_number() OVER (ORDER BY (64 * df - gamma_bits) DESC, token)::BIGINT
                AS rank
       FROM bits QUALIFY rank <= 20""",
)
def q_posting_compression(spark, sf_dir):
    """Elias-γ posting-list compression planning (Witten/Moffat/Bell,
    'Managing Gigabytes'): per frequent token, the delta-gap-encoded
    index size (Σ 2⌊log2 gap⌋+1 bits; first posting encodes doc_id+1)
    against the raw 64-bit layout, top-20 by absolute savings — the
    back-of-envelope every inverted-index/storage design doc runs
    before choosing an encoding. Gaps come from ONE per-token window
    over the distinct postings census (token-key shuffle); ⌊log2⌋ of an
    exact integer never mis-rounds at power-of-2 boundaries. All bit
    counts are exact int64."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.explode(T.tokenize(F.col("text"))).alias("token")
    ).distinct()
    wt = Window.partitionBy("token").orderBy("doc_id")
    g = toks.select(
        "token", "doc_id", (F.col("doc_id") - F.lag("doc_id").over(wt)).alias("gap")
    )
    bit = F.when(
        F.col("gap").isNull(),
        2 * F.floor(F.log2((F.col("doc_id") + 1).cast("double"))).cast("long") + 1,
    ).otherwise(2 * F.floor(F.log2(F.col("gap").cast("double"))).cast("long") + 1)
    bits = (
        g.groupBy("token")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum(bit).cast("long").alias("gamma_bits"),
        )
        .where(F.col("df") >= 2)
    )
    wr = Window.orderBy(F.desc(64 * F.col("df") - F.col("gamma_bits")), "token")
    return (
        bits.select(
            "token", "df", "gamma_bits",
            (64 * F.col("df")).cast("long").alias("raw_bits"),
            F.round(F.col("gamma_bits").cast("double") / (F.lit(64.0) * F.col("df")), 6).alias("ratio"),
            F.row_number().over(wr).cast("long").alias("rank"),
        )
        .where(F.col("rank") <= 20)
    )


# --------------------------------------------------------------------------
# batch 39: k-anonymity audit, mutual kNN mining, stopword induction

@query(
    "k_anonymity",
    """WITH g AS (
         SELECT source, (n_chars // 100)::BIGINT AS len_bucket,
                count(*)::BIGINT AS grp,
                count(DISTINCT lang)::BIGINT AS l_div
         FROM documents GROUP BY 1, 2)
       SELECT count(*)::BIGINT AS n_groups,
              sum(grp)::BIGINT AS n_rows,
              sum(CASE WHEN grp < 5 THEN grp ELSE 0 END)::BIGINT AS rows_at_risk,
              round(sum(CASE WHEN grp < 5 THEN grp ELSE 0 END)::DOUBLE / sum(grp), 6)
                AS risk_share,
              min(grp)::BIGINT AS min_group_size,
              min(l_div)::BIGINT AS min_l_diversity
       FROM g""",
)
def q_k_anonymity(spark, sf_dir):
    """k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    2007) over the quasi-identifier (source, 100-char length bucket):
    how many rows sit in groups smaller than k=5 (re-identifiable), the
    smallest group, and the minimum l-diversity of the sensitive
    attribute (lang) within any group — the privacy readout a data-
    release pipeline runs before publishing web-derived corpora with
    metadata columns. One census shuffle; group-grain math; all exact
    integers plus one share division."""
    d = _docs(spark, sf_dir)
    g = d.groupBy(
        "source", F.floor(F.col("n_chars") / 100).cast("long").alias("len_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("grp"),
        F.count_distinct("lang").cast("long").alias("l_div"),
    )
    risk = F.sum(F.when(F.col("grp") < 5, F.col("grp")).otherwise(0))
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("grp").cast("long").alias("n_rows"),
        risk.cast("long").alias("rows_at_risk"),
        F.round(risk.cast("double") / F.sum("grp"), 6).alias("risk_share"),
        F.min("grp").cast("long").alias("min_group_size"),
        F.min("l_div").cast("long").alias("min_l_diversity"),
    )


def _mutual_sql(k: int = 4) -> str:
    # two-step rounding (6dp double, then micro-int) mirrors the Spark
    # path exactly — ivf_topk emits the 6dp-rounded cosine first
    return f"""WITH scored AS (
         SELECT q.vec_id AS q_id, a.vec_id AS c_id,
                CAST(round(round({_DOT_SQL} / ({_NORM_A} * {_NORM_Q}), 6) * 1000000.0)
                     AS BIGINT) AS cos_fp
         FROM embeddings a JOIN embeddings q
           ON a.label = q.label AND a.vec_id <> q.vec_id),
       topk AS (
         SELECT q_id, c_id, cos_fp,
                row_number() OVER (PARTITION BY q_id ORDER BY cos_fp DESC, c_id) AS rank
         FROM scored QUALIFY rank <= {k}),
       agg AS (
         SELECT q_id,
                max(CASE WHEN rank = 1 THEN c_id END)::BIGINT AS top1,
                max(CASE WHEN rank = 1 THEN cos_fp END)::BIGINT AS cos1_fp,
                sum(cos_fp)::BIGINT AS sum_fp, count(*)::BIGINT AS kk
         FROM topk GROUP BY q_id)
       SELECT a.q_id AS id_a, a.top1 AS id_b,
              round(a.cos1_fp / 1000000.0, 6) AS cosine,
              round(a.kk::DOUBLE * a.cos1_fp::DOUBLE / a.sum_fp::DOUBLE, 4) AS margin_a,
              round(b.kk::DOUBLE * b.cos1_fp::DOUBLE / b.sum_fp::DOUBLE, 4) AS margin_b
       FROM agg a JOIN agg b ON b.q_id = a.top1 AND b.top1 = a.q_id
       WHERE a.q_id < b.q_id"""


@query("mutual_knn", _mutual_sql())
def q_mutual_knn(spark, sf_dir):
    """Margin-based mutual-nearest-neighbor pair mining (Artetxe &
    Schwenk, ACL 2019 — the method behind CCMatrix/LASER bitext
    mining): keep (a, b) only when each is the other's top-1 IVF-gated
    neighbor, scored by the margin cos(a,b) / mean(top-k cosines) —
    the ratio criterion that suppresses hub matches a raw threshold
    lets through. Cosines round once to integer micro-units so the
    per-query top-k sums are exact; margins are one division each.
    Plan: the bucket-gated scoring join, one per-query top-k window, a
    self-join of the QUERY-GRAIN aggregate with itself (tiny)."""
    from pliers_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    topk = ivf_topk(emb, emb, "vec_id", "embedding", "vec_id", "embedding", "label", k=4)
    t = topk.select(
        "q_id", "c_id", "rank",
        F.round(F.col("cosine") * F.lit(1e6), 0).cast("long").alias("cos_fp"),
    )
    agg = t.groupBy("q_id").agg(
        F.max(F.when(F.col("rank") == 1, F.col("c_id"))).cast("long").alias("top1"),
        F.max(F.when(F.col("rank") == 1, F.col("cos_fp"))).cast("long").alias("cos1_fp"),
        F.sum("cos_fp").cast("long").alias("sum_fp"),
        F.count(F.lit(1)).cast("long").alias("kk"),
    ).localCheckpoint(eager=True)  # both sides of the mutual self-join
    a = agg
    b = agg.select(
        F.col("q_id").alias("b_q"), F.col("top1").alias("b_top1"),
        F.col("cos1_fp").alias("b_cos1"), F.col("sum_fp").alias("b_sum"),
        F.col("kk").alias("b_kk"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        a.join(b, (F.col("b_q") == F.col("top1")) & (F.col("b_top1") == F.col("q_id")))
        .where(F.col("q_id") < F.col("b_q"))
        .select(
            F.col("q_id").alias("id_a"), F.col("top1").alias("id_b"),
            F.round(F.col("cos1_fp") / F.lit(1e6), 6).alias("cosine"),
            # 4dp, not 6: a last-ulp dot-product difference can flip one
            # constituent cosine's 6dp rounding and shift sum_fp by 1 —
            # the margin quotient amplifies that past 1e-6 (see verify
            # skill note on near-collinear quotients)
            F.round(d_("kk") * d_("cos1_fp") / d_("sum_fp"), 4).alias("margin_a"),
            F.round(d_("b_kk") * d_("b_cos1") / d_("b_sum"), 4).alias("margin_b"),
        )
    )


_SW_MIN_SHARE_PPM = 100_000  # token must appear in >=10% of EVERY source's docs


@query(
    "stopword_discovery",
    f"""WITH dt AS (
         SELECT DISTINCT source, doc_id,
                unnest(string_split(trim(text), ' ')) AS token
         FROM documents),
       nd AS (SELECT source, count(DISTINCT doc_id)::BIGINT AS n_docs
              FROM documents GROUP BY source),
       df AS (SELECT source, token, count(*)::BIGINT AS df FROM dt GROUP BY 1, 2),
       shares AS (
         SELECT df.token,
                min(CAST(round(1000000.0 * df.df / nd.n_docs) AS BIGINT)) AS min_share_ppm,
                count(*)::BIGINT AS n_sources
         FROM df JOIN nd USING (source)
         GROUP BY df.token),
       ns AS (SELECT count(DISTINCT source)::BIGINT AS s FROM documents)
       SELECT token, min_share_ppm,
              row_number() OVER (ORDER BY min_share_ppm DESC, token)::BIGINT AS rank
       FROM shares CROSS JOIN ns
       WHERE n_sources = ns.s AND min_share_ppm >= {_SW_MIN_SHARE_PPM}
       QUALIFY rank <= 20""",
)
def q_stopword_discovery(spark, sf_dir):
    """Corpus-driven stopword induction: tokens whose document-frequency
    share clears 10% in EVERY source, ranked by the MINIMUM share —
    the min-across-slices criterion keeps domain jargon (frequent in
    one source only) out, which is how stopword lists are bootstrapped
    for new languages/domains before any curated list exists (feeds
    `remove_stopwords` / the max_df gates in the dedup family). One
    distinct (source, doc, token) census, a token-grain min-aggregate,
    a broadcast source count; shares round once to ppm integers."""
    d = _docs(spark, sf_dir)
    dt = d.select(
        "source", "doc_id", F.explode(T.tokenize(F.col("text"))).alias("token")
    ).distinct()
    nd = d.groupBy("source").agg(F.count_distinct("doc_id").cast("long").alias("n_docs"))
    df = dt.groupBy("source", "token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    shares = (
        df.join(F.broadcast(nd), "source")
        .groupBy("token")
        .agg(
            F.min(
                F.round(F.lit(1e6) * F.col("df") / F.col("n_docs"), 0).cast("long")
            ).alias("min_share_ppm"),
            F.count(F.lit(1)).cast("long").alias("n_sources"),
        )
    )
    ns = d.select("source").distinct().count()
    w = Window.orderBy(F.desc("min_share_ppm"), "token")
    return (
        shares.where((F.col("n_sources") == ns) & (F.col("min_share_ppm") >= _SW_MIN_SHARE_PPM))
        .select("token", "min_share_ppm", F.row_number().over(w).cast("long").alias("rank"))
        .where(F.col("rank") <= 20)
    )


# --------------------------------------------------------------------------
# batch 40: RFM segmentation, passage-level BM25, linkage threshold profile

@query(
    "rfm_scores",
    """WITH per_c AS (
         SELECT o_custkey,
                max(epoch_us(o_orderdate))::BIGINT AS last_us,
                count(*)::BIGINT AS freq,
                CAST(round(sum(o_totalprice) * 100.0) AS BIGINT) AS mon_fp
         FROM orders GROUP BY o_custkey),
       ranked AS (
         SELECT *, count(*) OVER () AS n,
                row_number() OVER (ORDER BY last_us, o_custkey) AS rr,
                row_number() OVER (ORDER BY freq, o_custkey) AS rf,
                row_number() OVER (ORDER BY mon_fp, o_custkey) AS rm
         FROM per_c)
       SELECT o_custkey,
              ((rr - 1) * 5 // n + 1)::BIGINT AS r_score,
              ((rf - 1) * 5 // n + 1)::BIGINT AS f_score,
              ((rm - 1) * 5 // n + 1)::BIGINT AS m_score,
              (((rr - 1) * 5 // n + 1) * 100
               + ((rf - 1) * 5 // n + 1) * 10
               + ((rm - 1) * 5 // n + 1))::BIGINT AS rfm_code
       FROM ranked""",
)
def q_rfm_scores(spark, sf_dir):
    """RFM customer segmentation (Hughes 1994 — the classic marketing
    feature triple): recency (latest order date), frequency (order
    count), monetary (total spend), each exact-rank-quintiled
    (integer rank arithmetic, custkey tiebreak — no ntile remainder
    ambiguity) into 1..5 and packed as the familiar 3-digit segment
    code (555 = best). Per-customer grain after one census; the three
    rank windows run on the customer-grain table, not the fact table.
    This is the feature every churn/LTV model starts from."""
    o = load_table(spark, sf_dir, "orders")
    from pliers_spark.operators._util import epoch_micros

    per_c = o.groupBy("o_custkey").agg(
        F.max(epoch_micros(o, "o_orderdate")).cast("long").alias("last_us"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.round(F.sum("o_totalprice") * 100.0, 0).cast("long").alias("mon_fp"),
    ).localCheckpoint(eager=True)  # three rank windows + final projection
    n = per_c.count()
    rr = F.row_number().over(Window.orderBy("last_us", "o_custkey"))
    rf = F.row_number().over(Window.orderBy("freq", "o_custkey"))
    rm = F.row_number().over(Window.orderBy("mon_fp", "o_custkey"))
    ranked = per_c.select(
        "o_custkey", rr.alias("rr"), rf.alias("rf"), rm.alias("rm")
    )
    sc = lambda c: (F.floor((F.col(c) - 1) * 5 / F.lit(n)) + 1).cast("long")  # noqa: E731
    return ranked.select(
        "o_custkey",
        sc("rr").alias("r_score"),
        sc("rf").alias("f_score"),
        sc("rm").alias("m_score"),
        (sc("rr") * 100 + sc("rf") * 10 + sc("rm")).cast("long").alias("rfm_code"),
    )


_PASSAGE_W = 32


def _passage_bm25_sql(w: int = _PASSAGE_W, k: int = 3) -> str:
    from pliers_spark.operators.ir import bm25_topk_sql

    return f"""WITH seeds AS (
         SELECT doc_id, string_split(trim(text), ' ') AS t
         FROM documents ORDER BY doc_id LIMIT 8),
       queries AS (
         SELECT doc_id AS q_id, unnest(t[1:6]) AS term FROM seeds),
       ptoks AS (
         SELECT doc_id, t.token, t.pos::BIGINT AS pos
         FROM (SELECT doc_id,
                      unnest(string_split(trim(text), ' ')) AS token,
                      generate_subscripts(string_split(trim(text), ' '), 1) - 1 AS pos
               FROM documents) t(doc_id, token, pos)),
       passages AS (
         SELECT (doc_id * 10000 + pos // {w})::BIGINT AS pid,
                string_agg(token, ' ' ORDER BY pos) AS ptext
         FROM ptoks GROUP BY doc_id, pos // {w}),
       {bm25_topk_sql(table="passages", text_col="ptext", id_col="pid", k=k,
                      tail=f"SELECT q_id, pid // 10000 AS doc_id, pid % 10000 AS passage_idx, score_fp, rank FROM bm25")}"""


@query("passage_bm25", _passage_bm25_sql())
def q_passage_bm25(spark, sf_dir):
    """Passage-level BM25 retrieval: documents split into {_PASSAGE_W}-
    token passages (the retrieve-then-read granularity RAG stacks
    index), each passage scored as its own BM25 unit against the seed
    queries, top-3 passages returned with (doc, passage index) — finer
    than `bm25_topk`'s whole-doc ranking and the direct feeder for
    `chunk_windows`-style context assembly. The passage table reuses
    the content-defined ordering census (posexplode → per-passage
    concat); the scoring plan is exactly operators/ir.bm25_topk with
    passages as the corpus — no new shuffle shapes."""
    from pliers_spark.operators.ir import bm25_topk

    d = _docs(spark, sf_dir)
    seeds = (
        d.orderBy("doc_id").limit(8)
        .select(
            F.col("doc_id").alias("q_id"),
            F.explode(F.slice(T.tokenize(F.col("text")), 1, 6)).alias("term"),
        )
    )
    toks = d.select("doc_id", F.posexplode(T.tokenize(F.col("text"))).alias("pos", "token"))
    passages = (
        toks.groupBy("doc_id", F.floor(F.col("pos") / _PASSAGE_W).cast("long").alias("blk"))
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "token"))),
                    lambda s: s["token"],
                ),
            ).alias("ptext")
        )
        .select((F.col("doc_id") * 10000 + F.col("blk")).alias("pid"), "ptext")
    )
    out = bm25_topk(passages, seeds, text_col="ptext", id_col="pid", k=3)
    return out.select(
        "q_id",
        (F.col("pid") / 10000).cast("long").alias("doc_id"),
        (F.col("pid") % 10000).cast("long").alias("passage_idx"),
        "score_fp",
        F.col("rank").cast("long").alias("rank"),
    )


def _linkage_sql() -> str:
    reaches = []
    for t in (1, 2, 3):
        reaches.append(f"""
       e{t} AS (SELECT id_a AS src, id_b AS dst FROM nd_pairs WHERE hamming <= {t}
                UNION SELECT id_b, id_a FROM nd_pairs WHERE hamming <= {t}),
       reach{t}(node, peer) AS (
         SELECT src, src FROM e{t}
         UNION
         SELECT r.node, e.dst FROM reach{t} r JOIN e{t} e ON r.peer = e.src),
       cc{t} AS (SELECT node, min(peer) AS cid FROM reach{t} GROUP BY node),
       row{t} AS (
         SELECT {t}::BIGINT AS max_hamming,
                (SELECT count(*) FROM nd_pairs WHERE hamming <= {t})::BIGINT AS n_pairs,
                (SELECT count(*) FROM cc{t})::BIGINT AS n_nodes,
                (SELECT count(DISTINCT cid) FROM cc{t})::BIGINT AS n_clusters)""")
    return (
        f"WITH RECURSIVE {_simhash_pairs_cte()}," + ",".join(reaches)
        + " SELECT * FROM row1 UNION ALL SELECT * FROM row2 UNION ALL SELECT * FROM row3"
    )


@query("linkage_profile", _linkage_sql())
def q_linkage_profile(spark, sf_dir):
    """Dedup-threshold sensitivity profile: the SimHash near-dup graph
    is banded ONCE at the loosest threshold (Hamming ≤ 3 carries the
    distance), then single-linkage components are computed at Hamming
    ≤ 1, ≤ 2, ≤ 3 by filtering the SAME pair list — pairs, touched
    nodes, and cluster counts per threshold. This is the dial-setting
    report (how much mass each notch of fuzziness merges) a dedup
    owner reads before fixing the production threshold; the expensive
    corpus banding never re-runs per threshold.

    Plan: the three per-threshold single-linkage problems are FUSED
    into one connected-components run by lifting each node into a
    threshold-tagged id (t·2⁴² + doc_id) and unioning the ≤t edge
    slices — components never span thresholds because every edge stays
    inside its slice. One iterative CC loop (the expensive part: a
    driver-round loop of join+agg jobs) instead of three, and all
    per-threshold pair counts come from a single conditional agg over
    the checkpointed pair list."""
    docs = _docs(spark, sf_dir)
    pairs = D.simhash_near_dup_pairs(
        docs, "text", "doc_id", bits=_SIMHASH_BITS, bands=4, max_hamming=3
    ).localCheckpoint(eager=True)
    big = F.lit(1 << 42)
    aug = None
    for t in (1, 2, 3):
        sl = pairs.where(F.col("hamming") <= t).select(
            (F.col("id_a") + big * t).alias("id_a"),
            (F.col("id_b") + big * t).alias("id_b"),
        )
        aug = sl if aug is None else aug.unionByName(sl)
    cc = D.connected_components(aug)
    per_t = cc.groupBy(
        F.floor(F.col("doc_id") / big).cast("long").alias("max_hamming")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.count_distinct("cluster_id").cast("long").alias("n_clusters"),
    )
    n_pairs = pairs.groupBy(
        F.col("hamming").cast("long").alias("h")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    thresholds = spark.range(1, 4).select(F.col("id").alias("max_hamming"))
    counts = (
        thresholds.join(F.broadcast(n_pairs), F.col("h") <= F.col("max_hamming"), "left")
        .groupBy("max_hamming")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_pairs"))
    )
    return (
        counts.join(F.broadcast(per_t), "max_hamming", "left")
        .select(
            "max_hamming",
            "n_pairs",
            F.coalesce("n_nodes", F.lit(0)).cast("long").alias("n_nodes"),
            F.coalesce("n_clusters", F.lit(0)).cast("long").alias("n_clusters"),
        )
        .orderBy("max_hamming")
    )


# --------------------------------------------------------------------------
# batch 41: deleted-interpolation lambdas, RMST, PR-AUC

@query(
    "deleted_interpolation",
    """WITH base AS (
         SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
       bi AS (
         SELECT unnest(toks[1:len(toks)-1]) AS w1,
                unnest(toks[2:len(toks)]) AS w2
         FROM base),
       c2 AS (SELECT w1, w2, count(*)::BIGINT AS c FROM bi GROUP BY 1, 2),
       c1 AS (SELECT w1, sum(c)::BIGINT AS cw1 FROM c2 GROUP BY w1),
       u AS (SELECT w2, sum(c)::BIGINT AS cw2 FROM c2 GROUP BY w2),
       nn AS (SELECT sum(c)::BIGINT AS n FROM c2),
       votes AS (
         SELECT
           sum(CASE WHEN (c2.c - 1) * (nn.n - 1) > (u.cw2 - 1) * (c1.cw1 - 1)
                    THEN c2.c ELSE 0 END)::BIGINT AS v_bi,
           sum(CASE WHEN (c2.c - 1) * (nn.n - 1) <= (u.cw2 - 1) * (c1.cw1 - 1)
                    THEN c2.c ELSE 0 END)::BIGINT AS v_uni
         FROM c2 JOIN c1 USING (w1) JOIN u USING (w2) CROSS JOIN nn)
       SELECT v_uni, v_bi,
              round(v_uni::DOUBLE / (v_uni + v_bi), 6) AS lambda_uni,
              round(v_bi::DOUBLE / (v_uni + v_bi), 6) AS lambda_bi
       FROM votes""",
)
def q_deleted_interpolation(spark, sf_dir):
    """Deleted-interpolation smoothing weights (Brants, ANLP 2000 — the
    TnT tagger's λ estimation): every bigram token votes its count for
    the bigram or unigram model depending on which deleted estimate is
    larger, (c₂−1)/(c(w₁)−1) vs (c(w₂)−1)/(N−1) — compared EXACTLY by
    integer cross-multiplication (ties, including the c=1 singleton
    mass, fall to the unigram back-off as TnT's safer default). The
    normalized λs are the interpolation weights `lm_score`-family
    models would use. Plan: one bigram census, two marginal aggs on
    its grain, a single vote row."""
    d = _docs(spark, sf_dir)
    toks = d.select(T.tokenize(F.col("text")).alias("toks"))
    bi = toks.select(
        F.explode(
            F.arrays_zip(
                F.slice("toks", 1, F.greatest(F.size("toks") - 1, F.lit(0))).alias("a"),
                F.slice("toks", 2, F.greatest(F.size("toks") - 1, F.lit(0))).alias("b"),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("w1"), F.col("p.b").alias("w2"))
    c2 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c")).localCheckpoint(eager=True)
    c1 = c2.groupBy("w1").agg(F.sum("c").cast("long").alias("cw1"))
    u = c2.groupBy("w2").agg(F.sum("c").cast("long").alias("cw2"))
    nn = c2.agg(F.sum("c").cast("long").alias("n"))
    j = c2.join(c1, "w1").join(u, "w2").crossJoin(F.broadcast(nn))
    bi_wins = (F.col("c") - 1) * (F.col("n") - 1) > (F.col("cw2") - 1) * (F.col("cw1") - 1)
    votes = j.agg(
        F.sum(F.when(bi_wins, F.col("c")).otherwise(0)).cast("long").alias("v_bi"),
        F.sum(F.when(~bi_wins, F.col("c")).otherwise(0)).cast("long").alias("v_uni"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    return votes.select(
        "v_uni", "v_bi",
        F.round(d_("v_uni") / (F.col("v_uni") + F.col("v_bi")), 6).alias("lambda_uni"),
        F.round(d_("v_bi") / (F.col("v_uni") + F.col("v_bi")), 6).alias("lambda_bi"),
    )


@query(
    "rmst",
    """WITH firsts AS (
         SELECT user_id,
                min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v_u,
                min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p_u,
                max(epoch_us(ts)) AS last_u
         FROM events GROUP BY user_id),
       spans AS (
         SELECT user_id,
                CASE WHEN p_u IS NOT NULL AND p_u > v_u
                     THEN (p_u - v_u) // 86400000000 END AS conv_day,
                (last_u - v_u) // 86400000000 AS censor_day
         FROM firsts WHERE v_u IS NOT NULL),
       days AS (SELECT unnest(range(30))::BIGINT AS day),
       tbl AS (
         SELECT d.day,
                sum(CASE WHEN coalesce(s.conv_day, s.censor_day) >= d.day
                         THEN 1 ELSE 0 END)::BIGINT AS n,
                coalesce(sum(CASE WHEN s.conv_day = d.day THEN 1 ELSE 0 END), 0)::BIGINT AS dd
         FROM days d CROSS JOIN spans s GROUP BY d.day),
       lg AS (
         SELECT day, n, dd,
                CASE WHEN n = 0 THEN 0
                     WHEN n > dd
                     THEN CAST(round(1000000.0 * ln(1.0 - dd::DOUBLE / n::DOUBLE))
                               AS BIGINT) END AS l_fp
         FROM tbl),
       surv AS (
         SELECT day,
                coalesce(sum(l_fp) OVER (ORDER BY day
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND 1 PRECEDING), 0) AS cum_l,
                min(CASE WHEN l_fp IS NULL THEN day END)
                  OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING) AS dead_at
         FROM lg),
       s_fp AS (
         SELECT day,
                CASE WHEN dead_at IS NOT NULL THEN 0
                     ELSE CAST(round(1000000.0 * exp(cum_l / 1000000.0)) AS BIGINT)
                END AS s
         FROM surv)
       SELECT count(*)::BIGINT AS horizon_days,
              (SELECT count(*) FROM spans)::BIGINT AS n_entities,
              round(sum(s)::DOUBLE / 1000000.0, 6) AS rmst_days,
              round(min(s)::DOUBLE / 1000000.0, 6) AS survival_end
       FROM s_fp""",
)
def q_rmst(spark, sf_dir):
    """Restricted mean survival time over a 30-day window (Royston &
    Parmar 2013 — the clinically preferred KM summary, here 'expected
    days until first purchase'): survival is the KM product computed in
    LOG space — per-day ln(1−hazard) rounds once to integer micro-nats,
    the cumulative sum is exact int64 (order-proof, unlike a float
    product), each day's survival exp()s the rounded cumsum once, and
    RMST sums the per-day micro-unit survivals exactly. A day with
    hazard 1 zeroes survival from then on. Reuses `hazard_table`'s
    risk-set construction (entities collapse to one row before the
    30-row spine fans out)."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    uu = epoch_micros(ev, "ts")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", uu)).alias("v_u"),
        F.min(F.when(F.col("event_type") == "purchase", uu)).alias("p_u"),
        F.max(uu).alias("last_u"),
    )
    spans = firsts.where(F.col("v_u").isNotNull()).select(
        F.when(
            F.col("p_u").isNotNull() & (F.col("p_u") > F.col("v_u")),
            F.floor((F.col("p_u") - F.col("v_u")) / 86_400_000_000),
        ).alias("conv_day"),
        F.floor((F.col("last_u") - F.col("v_u")) / 86_400_000_000).alias("censor_day"),
    ).localCheckpoint(eager=True)
    n_entities = spans.count()
    days = spark.range(30).select(F.col("id").alias("day"))
    tbl = (
        days.crossJoin(spans)
        .groupBy("day")
        .agg(
            F.sum(
                (F.coalesce("conv_day", "censor_day") >= F.col("day")).cast("int")
            ).cast("long").alias("n"),
            F.coalesce(
                F.sum((F.col("conv_day") == F.col("day")).cast("int")), F.lit(0)
            ).cast("long").alias("dd"),
        )
    )
    # n = 0 (risk set exhausted by censoring): KM is flat — carry survival
    # with a zero log-step; n = dd (> 0) is a real death day -> NULL marks it
    l_fp = F.when(F.col("n") == 0, F.lit(0)).when(
        F.col("n") > F.col("dd"),
        F.round(F.lit(1e6) * F.log(F.lit(1.0) - F.col("dd").cast("double") / F.col("n").cast("double")), 0).cast("long"),
    )
    lg = tbl.select("day", "n", "dd", l_fp.alias("l_fp"))
    wprev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    surv = lg.select(
        "day",
        F.coalesce(F.sum("l_fp").over(wprev), F.lit(0)).alias("cum_l"),
        F.min(F.when(F.col("l_fp").isNull(), F.col("day"))).over(wprev).alias("dead_at"),
    )
    s = F.when(F.col("dead_at").isNotNull(), F.lit(0)).otherwise(
        F.round(F.lit(1e6) * F.exp(F.col("cum_l") / F.lit(1e6)), 0).cast("long")
    )
    return surv.select(s.alias("s")).agg(
        F.count(F.lit(1)).cast("long").alias("horizon_days"),
        F.lit(n_entities).cast("long").alias("n_entities"),
        F.round(F.sum("s").cast("double") / F.lit(1e6), 6).alias("rmst_days"),
        F.round(F.min("s").cast("double") / F.lit(1e6), 6).alias("survival_end"),
    )


@query(
    "pr_auc",
    """WITH base AS (
         SELECT event_id,
                CAST(round(value * 1000000.0) AS BIGINT) AS score,
                CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS label
         FROM events),
       ranked AS (
         SELECT label,
                row_number() OVER (ORDER BY score DESC, event_id) AS i,
                sum(label) OVER (ORDER BY score DESC, event_id) AS cum_pos
         FROM base),
       terms AS (
         SELECT label,
                CASE WHEN label = 1
                     THEN CAST(round(1000000000.0 * cum_pos / i) AS BIGINT)
                     ELSE 0 END AS t_fp
         FROM ranked)
       SELECT sum(label)::BIGINT AS n_pos,
              count(*)::BIGINT AS n,
              round(sum(t_fp)::DOUBLE / (sum(label)::DOUBLE * 1000000000.0), 6)
                AS average_precision
       FROM terms""",
)
def q_pr_auc(spark, sf_dir):
    """Average precision / PR-AUC (the imbalanced-class companion to
    `roc_auc`): AP = mean over positives of precision-at-their-rank,
    under the deterministic total order (score desc, event_id) — each
    positive's precision rounds once to integer nano-units so the sum
    is exact and tie handling is reproducible, not library-dependent.
    Same score/label framing as roc_auc (does `value` predict an
    error event). The global rank window is an EVAL-set pass, per the
    roc_auc docstring contract."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_id",
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("score"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("label"),
    )
    wr = Window.orderBy(F.desc("score"), "event_id")
    ranked = base.select(
        "label",
        F.row_number().over(wr).alias("i"),
        F.sum("label").over(wr.rowsBetween(Window.unboundedPreceding, 0)).alias("cum_pos"),
    )
    t_fp = F.when(
        F.col("label") == 1,
        F.round(F.lit(1e9) * F.col("cum_pos") / F.col("i"), 0).cast("long"),
    ).otherwise(F.lit(0))
    return ranked.select("label", t_fp.alias("t_fp")).agg(
        F.sum("label").cast("long").alias("n_pos"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum("t_fp").cast("double") / (F.sum("label").cast("double") * F.lit(1e9)), 6
        ).alias("average_precision"),
    )


# --------------------------------------------------------------------------
# batch 42: Qini uplift curve, filter operating points, MRR + recall@k

@query(
    "qini_curve",
    """WITH u AS (
         SELECT user_id, (user_id % 2 = 0)::INT AS treat,
                max((event_type = 'error')::INT)::BIGINT AS y,
                CAST(round(avg(value) * 1000000.0) AS BIGINT) AS score
         FROM events GROUP BY user_id),
       r AS (
         SELECT *, row_number() OVER (ORDER BY score DESC, user_id) AS rn,
                count(*) OVER () AS nn
         FROM u),
       d AS (
         SELECT ((rn - 1) * 10 // nn)::BIGINT AS decile,
                sum(treat)::BIGINT AS nt, sum(1 - treat)::BIGINT AS nc,
                sum(CASE WHEN treat = 1 THEN y ELSE 0 END)::BIGINT AS rt,
                sum(CASE WHEN treat = 0 THEN y ELSE 0 END)::BIGINT AS rc
         FROM r GROUP BY 1),
       c AS (
         SELECT decile,
                sum(nt) OVER w AS cnt, sum(nc) OVER w AS cnc,
                sum(rt) OVER w AS crt, sum(rc) OVER w AS crc
         FROM d WINDOW w AS (ORDER BY decile))
       SELECT decile, cnt::BIGINT AS n_treat, cnc::BIGINT AS n_ctrl,
              crt::BIGINT AS resp_treat, crc::BIGINT AS resp_ctrl,
              round(crt::DOUBLE - crc::DOUBLE * cnt::DOUBLE / cnc::DOUBLE, 6) AS qini
       FROM c""",
)
def q_qini_curve(spark, sf_dir):
    """Qini curve for uplift evaluation (Radcliffe 2007 — the standard
    'did targeting by this score find the persuadables' readout): users
    ranked by predicted responsiveness (mean event value), cumulative
    incremental responses qini(d) = Rt − Rc·Nt/Nc per score decile,
    treatment = even user ids. Deciles come from exact integer rank
    arithmetic; the cumulative window runs on the 10-row decile grain;
    the single ratio per decile rounds once. Pairs with `diff_in_diff`
    (effect) and `cuped_adjustment` (variance) as the experimentation
    triptych."""
    ev = _events(spark, sf_dir)
    u = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "error").cast("int")).cast("long").alias("y"),
        F.round(F.avg("value") * F.lit(1e6), 0).cast("long").alias("score"),
    ).select(
        "user_id", (F.col("user_id") % 2 == 0).cast("int").alias("treat"), "y", "score"
    )
    n = u.count()
    rn = F.row_number().over(Window.orderBy(F.desc("score"), "user_id"))
    r = u.select("*", rn.alias("rn"))
    d = r.groupBy(F.floor((F.col("rn") - 1) * 10 / F.lit(n)).cast("long").alias("decile")).agg(
        F.sum("treat").cast("long").alias("nt"),
        F.sum(1 - F.col("treat")).cast("long").alias("nc"),
        F.sum(F.when(F.col("treat") == 1, F.col("y")).otherwise(0)).cast("long").alias("rt"),
        F.sum(F.when(F.col("treat") == 0, F.col("y")).otherwise(0)).cast("long").alias("rc"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    c = d.select(
        "decile",
        F.sum("nt").over(wc).alias("cnt"), F.sum("nc").over(wc).alias("cnc"),
        F.sum("rt").over(wc).alias("crt"), F.sum("rc").over(wc).alias("crc"),
    )
    d_ = lambda col: F.col(col).cast("double")  # noqa: E731
    return c.select(
        "decile",
        F.col("cnt").cast("long").alias("n_treat"),
        F.col("cnc").cast("long").alias("n_ctrl"),
        F.col("crt").cast("long").alias("resp_treat"),
        F.col("crc").cast("long").alias("resp_ctrl"),
        F.round(d_("crt") - d_("crc") * d_("cnt") / d_("cnc"), 6).alias("qini"),
    )


def _tradeoff_sql() -> str:
    rows = []
    for t in (0.4, 0.5, 0.6):
        rows.append(f"""(
          SELECT {t}::DOUBLE AS threshold,
                 sum((quality >= {t})::INT)::BIGINT AS n_kept,
                 round(sum((quality >= {t})::INT)::DOUBLE / count(*), 6) AS keep_rate,
                 round(sum((quality >= {t} AND lang = 'en')::INT)::DOUBLE
                       / sum((lang = 'en')::INT), 6) AS good_recall,
                 CASE WHEN sum((quality >= {t})::INT) > 0
                      THEN round(sum((quality >= {t} AND lang = 'en')::INT)::DOUBLE
                                 / sum((quality >= {t})::INT), 6) END AS good_precision
          FROM j)""")
    return (
        f"""WITH q AS (SELECT * FROM ({_QUALITY_ORACLE}) t),
       j AS (SELECT q.quality, d.lang FROM documents d JOIN q ON q.doc_id = d.doc_id)
       """
        + " UNION ALL ".join(rows)
    )


@query("filter_tradeoff", _tradeoff_sql())
def q_filter_tradeoff(spark, sf_dir):
    """Quality-filter operating-point table: for thresholds 0.4/0.5/0.6
    of the composite quality score, the kept volume, the recall of the
    proxy-good class (lang='en' stands in for the labeled slice a team
    actually audits), and the precision of the kept set — the three
    numbers that pick a production filter threshold (`quality_filter`
    applies one; this query is how it gets chosen). One doc-grain
    quality map feeds all thresholds; each operating point is a single
    census row."""
    d = _docs(spark, sf_dir)
    j = d.select(
        T.quality_score("text").alias("quality"), "lang"
    ).localCheckpoint(eager=True)  # one quality pass, three thresholds
    outs = []
    for t in (0.4, 0.5, 0.6):
        kept = (F.col("quality") >= t).cast("int")
        good = (F.col("lang") == "en").cast("int")
        outs.append(
            j.agg(
                F.lit(float(t)).alias("threshold"),
                F.sum(kept).cast("long").alias("n_kept"),
                F.round(F.sum(kept).cast("double") / F.count(F.lit(1)), 6).alias("keep_rate"),
                F.round(
                    F.sum(kept * good).cast("double") / F.sum(good), 6
                ).alias("good_recall"),
                F.when(
                    F.sum(kept) > 0,
                    F.round(F.sum(kept * good).cast("double") / F.sum(kept), 6),
                ).alias("good_precision"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def _mrr_sql(k: int = 5, rel_min: int = 3) -> str:
    from pliers_spark.operators.ir import bm25_topk_sql

    tail = f""", rel AS (
  SELECT qt.q_id, tf.doc_id, count(tf.term)::BIGINT AS rel
  FROM qt JOIN tf ON tf.term = qt.term
  GROUP BY 1, 2),
relevant AS (SELECT q_id, doc_id FROM rel WHERE rel >= {rel_min}),
hits AS (
  SELECT b.q_id, b.rank,
         (r.doc_id IS NOT NULL)::INT AS is_rel
  FROM bm25 b LEFT JOIN relevant r ON r.q_id = b.q_id AND r.doc_id = b.doc_id),
mq AS (
  SELECT q_id,
         min(CASE WHEN is_rel = 1 THEN rank END)::BIGINT AS first_rel_rank,
         sum(is_rel)::BIGINT AS n_rel_at_k
  FROM hits GROUP BY q_id),
tot AS (SELECT q_id, count(*)::BIGINT AS n_rel_total FROM relevant GROUP BY q_id)
SELECT t.q_id,
       p.first_rel_rank,
       coalesce(CAST(round(1000000.0 / p.first_rel_rank) AS BIGINT), 0)::BIGINT AS rr_fp,
       t.n_rel_total,
       coalesce(p.n_rel_at_k, 0)::BIGINT AS n_rel_at_k,
       round(coalesce(p.n_rel_at_k, 0)::DOUBLE / t.n_rel_total, 6) AS recall_at_k
FROM tot t LEFT JOIN mq p USING (q_id)"""
    return f"""WITH seeds AS (
         SELECT doc_id, string_split(trim(text), ' ') AS t
         FROM documents ORDER BY doc_id LIMIT 8),
       queries AS (
         SELECT doc_id AS q_id, unnest(t[1:6]) AS term FROM seeds),
       {bm25_topk_sql(k=k, tail=tail)}"""


@query("mrr_recall", _mrr_sql())
def q_mrr_recall(spark, sf_dir):
    """MRR and recall@5 of the BM25 retriever against term-containment
    relevance (a doc is relevant to a query iff it contains ≥3 of the
    query's 6 terms — the same grading basis as `ndcg_at_k`): per
    query, the reciprocal rank of the first relevant hit (integer
    micro-units; 0 when none in the top-5) and the share of ALL
    relevant corpus docs captured in the top-5. Completes the ranking-
    eval suite (NDCG = graded order, MRR = first-hit latency, recall =
    capture). The corpus-wide relevance census is one broadcast
    term-join over the SAME tf table the scorer builds."""
    from pliers_spark.operators.ir import bm25_topk

    docs = _docs(spark, sf_dir)
    seeds = (
        docs.orderBy("doc_id").limit(8)
        .select(
            F.col("doc_id").alias("q_id"),
            F.explode(F.slice(T.tokenize(F.col("text")), 1, 6)).alias("term"),
        )
    )
    cand = bm25_topk(docs, seeds, k=5).localCheckpoint(eager=True)
    qt = seeds.distinct().localCheckpoint(eager=True)
    tf = (
        docs.select("doc_id", F.explode(T.tokenize(F.col("text"))).alias("term"))
        .distinct()
    )
    rel = (
        tf.join(F.broadcast(qt), "term")
        .groupBy("q_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("rel"))
        .where(F.col("rel") >= 3)
        .select("q_id", "doc_id")
        .localCheckpoint(eager=True)  # feeds totals AND the top-k join
    )
    hits = cand.join(
        rel.withColumn("is_rel", F.lit(1)), ["q_id", "doc_id"], "left"
    ).select("q_id", "rank", F.coalesce("is_rel", F.lit(0)).alias("is_rel"))
    per_q = hits.groupBy("q_id").agg(
        F.min(F.when(F.col("is_rel") == 1, F.col("rank"))).cast("long").alias("first_rel_rank"),
        F.sum("is_rel").cast("long").alias("n_rel_at_k"),
    )
    tot = rel.groupBy("q_id").agg(F.count(F.lit(1)).cast("long").alias("n_rel_total"))
    return tot.join(per_q, "q_id", "left").select(
        "q_id", "first_rel_rank",
        F.coalesce(
            F.round(F.lit(1e6) / F.col("first_rel_rank"), 0).cast("long"), F.lit(0)
        ).alias("rr_fp"),
        "n_rel_total",
        F.coalesce("n_rel_at_k", F.lit(0)).cast("long").alias("n_rel_at_k"),
        F.round(
            F.coalesce("n_rel_at_k", F.lit(0)).cast("double") / F.col("n_rel_total"), 6
        ).alias("recall_at_k"),
    )


# --------------------------------------------------------------------------
# batch 43: capture-recapture sizing, JSD contributors, dispersion index

@query(
    "capture_recapture",
    """WITH a AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 2 = 0),
       b AS (SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 2 = 1),
       s AS (
         SELECT (SELECT count(*) FROM a)::BIGINT AS n1,
                (SELECT count(*) FROM b)::BIGINT AS n2,
                (SELECT count(*) FROM a JOIN b USING (h))::BIGINT AS m,
                (SELECT count(DISTINCT md5(text)) FROM documents)::BIGINT AS true_distinct)
       SELECT n1, n2, m, true_distinct,
              round((n1 + 1)::DOUBLE * (n2 + 1)::DOUBLE / (m + 1)::DOUBLE - 1.0, 6)
                AS chapman_estimate,
              CASE WHEN m > 0
                   THEN round(((n1 + 1)::DOUBLE * (n2 + 1)::DOUBLE / (m + 1)::DOUBLE
                               - 1.0 - true_distinct::DOUBLE)
                              / true_distinct::DOUBLE, 6) END AS rel_err
       FROM s""",
)
def q_capture_recapture(spark, sf_dir):
    """Capture-recapture corpus-size estimation (Lincoln-Petersen with
    the Chapman bias correction, Chapman 1951): treat the even- and
    odd-id halves as two independent crawls, mark-recapture on exact
    content hash, and estimate the TRUE distinct-document population
    N̂ = (n₁+1)(n₂+1)/(m+1) − 1 — how crawl teams estimate 'how much of
    the web (or of a dark corpus) are we seeing' from two overlapping
    passes, audited here against the known distinct count. All counts
    are exact censuses on the content-hash key; one rounded estimate."""
    d = _docs(spark, sf_dir)
    a = d.where(F.col("doc_id") % 2 == 0).select(F.md5("text").alias("h")).distinct().localCheckpoint(eager=True)
    b = d.where(F.col("doc_id") % 2 == 1).select(F.md5("text").alias("h")).distinct().localCheckpoint(eager=True)
    n1 = a.count()
    n2 = b.count()
    m = a.join(b, "h").count()
    true_distinct = d.select(F.md5("text")).distinct().count()
    chapman = round((n1 + 1) * (n2 + 1) / (m + 1) - 1.0, 6)
    rel = round((chapman - true_distinct) / true_distinct, 6) if m > 0 else None
    return spark.createDataFrame(
        [(n1, n2, m, true_distinct, chapman, rel)],
        "n1 long, n2 long, m long, true_distinct long, "
        "chapman_estimate double, rel_err double",
    )


@query(
    "jsd_contributors",
    f"""WITH toks AS (
         SELECT source, unnest(string_split(trim(text), ' ')) AS token FROM documents),
       cnt AS (SELECT source, token, count(*)::BIGINT AS c FROM toks GROUP BY 1, 2),
       topv AS (
         SELECT token FROM (SELECT token, sum(c) AS tc FROM cnt GROUP BY token)
         ORDER BY tc DESC, token LIMIT {_JSD_V}),
       mapped AS (
         SELECT cnt.source,
                CASE WHEN topv.token IS NOT NULL THEN cnt.token ELSE '<other>' END AS tok,
                sum(cnt.c)::BIGINT AS c
         FROM cnt LEFT JOIN topv ON topv.token = cnt.token
         GROUP BY 1, 2),
       ns AS (SELECT source, sum(c)::BIGINT AS n FROM mapped GROUP BY source),
       pr AS (SELECT a.source AS src_a, a.n AS na, b.source AS src_b, b.n AS nb
              FROM ns a JOIN ns b ON a.source < b.source),
       cells AS (
         SELECT pr.src_a, pr.src_b, pr.na, pr.nb, t.tok,
                coalesce(ca.c, 0) AS a, coalesce(cb.c, 0) AS b
         FROM pr CROSS JOIN (SELECT DISTINCT tok FROM mapped) t
         LEFT JOIN mapped ca ON ca.source = pr.src_a AND ca.tok = t.tok
         LEFT JOIN mapped cb ON cb.source = pr.src_b AND cb.tok = t.tok),
       terms AS (
         SELECT src_a, src_b, tok,
                (CASE WHEN a > 0
                      THEN a * CAST(round(1000000.0 * ln(2.0 * a::DOUBLE * nb::DOUBLE
                                    / (a::DOUBLE * nb::DOUBLE + b::DOUBLE * na::DOUBLE)))
                               AS BIGINT) ELSE 0 END)::DOUBLE / na
                + (CASE WHEN b > 0
                        THEN b * CAST(round(1000000.0 * ln(2.0 * b::DOUBLE * na::DOUBLE
                                      / (a::DOUBLE * nb::DOUBLE + b::DOUBLE * na::DOUBLE)))
                                 AS BIGINT) ELSE 0 END)::DOUBLE / nb AS raw
         FROM cells WHERE a > 0 OR b > 0)
       SELECT src_a, src_b, tok,
              round(raw / 2000000.0, 6) AS contribution,
              row_number() OVER (PARTITION BY src_a, src_b
                                 ORDER BY round(raw / 2000000.0, 6) DESC, tok)::BIGINT
                AS rank
       FROM terms QUALIFY rank <= 10""",
)
def q_jsd_contributors(spark, sf_dir):
    """Per-token decomposition of the Jensen-Shannon divergence (the
    shifterator/word-shift-graph readout, Gallagher et al. 2021): for
    every source pair, the 10 tokens contributing most to `source_jsd`
    — pointwise JSD terms are nonnegative, so the head of this list IS
    the explanation of the drift ('why do these sources differ').
    Identical cell construction and micro-nat rounding as source_jsd
    (the decomposition provably sums to it); ranking on the
    once-rounded contribution with token tiebreak."""
    d = _docs(spark, sf_dir)
    toks = d.select("source", F.explode(T.tokenize(F.col("text"))).alias("token"))
    cnt = toks.groupBy("source", "token").agg(F.count(F.lit(1)).cast("long").alias("c"))
    topv = (
        cnt.groupBy("token").agg(F.sum("c").alias("tc"))
        .orderBy(F.desc("tc"), "token").limit(_JSD_V).select("token", F.lit(1).alias("keep"))
    )
    mapped = (
        cnt.join(F.broadcast(topv), "token", "left")
        .select(
            "source",
            F.when(F.col("keep") == 1, F.col("token")).otherwise(F.lit("<other>")).alias("tok"),
            "c",
        )
        .groupBy("source", "tok")
        .agg(F.sum("c").cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    ns = mapped.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    pr = (
        ns.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
        .join(ns.select(F.col("source").alias("src_b"), F.col("n").alias("nb")),
              F.col("src_a") < F.col("src_b"))
    )
    vocab = mapped.select("tok").distinct()
    cells = (
        pr.crossJoin(vocab)
        .join(mapped.select(F.col("source").alias("src_a"), "tok", F.col("c").alias("a")),
              ["src_a", "tok"], "left")
        .join(mapped.select(F.col("source").alias("src_b"), "tok", F.col("c").alias("b")),
              ["src_b", "tok"], "left")
        .select(
            "src_a", "src_b", "na", "nb", "tok",
            F.coalesce("a", F.lit(0)).alias("a"), F.coalesce("b", F.lit(0)).alias("b"),
        )
        .where((F.col("a") > 0) | (F.col("b") > 0))
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    den = d_("a") * d_("nb") + d_("b") * d_("na")
    ta = F.when(
        F.col("a") > 0,
        F.col("a") * F.round(F.lit(1e6) * F.log(F.lit(2.0) * d_("a") * d_("nb") / den), 0).cast("long"),
    ).otherwise(F.lit(0))
    tb = F.when(
        F.col("b") > 0,
        F.col("b") * F.round(F.lit(1e6) * F.log(F.lit(2.0) * d_("b") * d_("na") / den), 0).cast("long"),
    ).otherwise(F.lit(0))
    terms = cells.select(
        "src_a", "src_b", "tok",
        (ta.cast("double") / F.col("na") + tb.cast("double") / F.col("nb")).alias("raw"),
    )
    contrib = F.round(F.col("raw") / F.lit(2e6), 6)
    w = Window.partitionBy("src_a", "src_b").orderBy(F.desc(contrib), "tok")
    return terms.select(
        "src_a", "src_b", "tok", contrib.alias("contribution"),
        F.row_number().over(w).cast("long").alias("rank"),
    ).where(F.col("rank") <= 10)


@query(
    "dispersion_index",
    """WITH users AS (SELECT DISTINCT user_id FROM events),
       types AS (SELECT DISTINCT event_type FROM events),
       cnt AS (
         SELECT user_id, event_type, count(*)::BIGINT AS c
         FROM events GROUP BY 1, 2),
       dense AS (
         SELECT t.event_type, coalesce(cnt.c, 0)::BIGINT AS c
         FROM users u CROSS JOIN types t
         LEFT JOIN cnt ON cnt.user_id = u.user_id AND cnt.event_type = t.event_type),
       st AS (
         SELECT event_type, count(*)::BIGINT AS n, sum(c)::BIGINT AS s,
                sum(c::HUGEINT * c::HUGEINT) AS q
         FROM dense GROUP BY event_type)
       SELECT event_type, n AS n_users,
              round(s::DOUBLE / n, 6) AS mean_count,
              CASE WHEN s > 0
                   THEN round((q::DOUBLE / n - (s::DOUBLE / n) * (s::DOUBLE / n))
                              / (s::DOUBLE / n), 6) END AS dispersion,
              CASE WHEN s > 0
                   THEN (q::DOUBLE / n - (s::DOUBLE / n) * (s::DOUBLE / n))
                        / (s::DOUBLE / n) > 1.0 END AS overdispersed
       FROM st""",
)
def q_dispersion_index(spark, sf_dir):
    """Index of dispersion (variance-to-mean ratio) of per-user event
    counts, per event type — the count-data diagnostic that decides
    Poisson vs negative-binomial modeling and flags bursty/bot-like
    behavior (D ≫ 1 = a few users generate most events; the
    `token_burstiness` idea at the behavioral grain). The user×type
    grid is densified with explicit zeros (the dense_counts spine
    pattern) so absent combinations count; sufficient stats are exact
    int64/HUGEINT; one ratio per type."""
    ev = _events(spark, sf_dir)
    users = ev.select("user_id").distinct()
    types = ev.select("event_type").distinct()
    cnt = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).cast("long").alias("c"))
    dense = (
        users.crossJoin(F.broadcast(types))
        .join(cnt, ["user_id", "event_type"], "left")
        .select("event_type", F.coalesce("c", F.lit(0)).cast("long").alias("c"))
    )
    dec = "decimal(38,0)"
    st = dense.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c").cast(dec) * F.col("c").cast(dec)).cast(dec).alias("q"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    mean = d_("s") / d_("n")
    disp = (d_("q") / d_("n") - mean * mean) / mean
    return st.select(
        "event_type", F.col("n").alias("n_users"),
        F.round(mean, 6).alias("mean_count"),
        F.when(F.col("s") > 0, F.round(disp, 6)).alias("dispersion"),
        F.when(F.col("s") > 0, disp > 1.0).alias("overdispersed"),
    )


# --------------------------------------------------------------------------
# batch 44: price indices, self-excitation lift, triangle null model

@query(
    "price_index",
    """WITH m AS (
         SELECT date_trunc('month', l_shipdate)::TIMESTAMP AS month, l_partkey,
                CAST(round(sum(l_extendedprice) * 100.0) AS BIGINT) AS v_fp,
                CAST(sum(l_quantity) AS BIGINT) AS q
         FROM lineitem GROUP BY 1, 2),
       p AS (
         SELECT month, l_partkey, q,
                CAST(round(10000.0 * v_fp / q) AS BIGINT) AS p_fp
         FROM m),
       base AS (
         SELECT l_partkey, q AS q0, p_fp AS p0
         FROM p WHERE month = (SELECT min(month) FROM p)),
       j AS (
         SELECT p.month, p.l_partkey, p.p_fp, p.q, base.q0, base.p0
         FROM p JOIN base USING (l_partkey)
         WHERE p.month > (SELECT min(month) FROM p)),
       agg AS (
         SELECT month, count(*)::BIGINT AS n_parts,
                sum(p_fp::HUGEINT * q0::HUGEINT) AS l_num,
                sum(p0::HUGEINT * q0::HUGEINT) AS l_den,
                sum(p_fp::HUGEINT * q::HUGEINT) AS pa_num,
                sum(p0::HUGEINT * q::HUGEINT) AS pa_den
         FROM j GROUP BY month)
       SELECT month, n_parts,
              round(l_num::DOUBLE / l_den::DOUBLE, 6) AS laspeyres,
              round(pa_num::DOUBLE / pa_den::DOUBLE, 6) AS paasche,
              round(sqrt((l_num::DOUBLE / l_den::DOUBLE)
                         * (pa_num::DOUBLE / pa_den::DOUBLE)), 6) AS fisher
       FROM agg""",
)
def q_price_index(spark, sf_dir):
    """Laspeyres / Paasche / Fisher price indices per ship month against
    the first month as base (the national-accounts formulas; Fisher =
    the 'ideal' geometric mean) over parts transacted in BOTH periods —
    the longitudinal price-level readout an OLAP commerce stack
    publishes. Unit prices are once-rounded integer micro-cent rates
    per (month, part); index numerators/denominators are exact
    DECIMAL(38,0) sums of int products; the two divisions and one sqrt
    happen on the month grain. Plan: one fact census, a broadcast base-
    month dimension join, month-grain math."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = "decimal(38,0)"
    m = li.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).alias("month"), "l_partkey"
    ).agg(
        F.round(F.sum("l_extendedprice") * 100.0, 0).cast("long").alias("v_fp"),
        F.sum("l_quantity").cast("long").alias("q"),
    )
    p = m.select(
        "month", "l_partkey", "q",
        F.round(F.lit(1e4) * F.col("v_fp") / F.col("q"), 0).cast("long").alias("p_fp"),
    ).localCheckpoint(eager=True)  # feeds base dim + fact side
    min_month = p.agg(F.min("month").alias("mm"))
    base = p.join(F.broadcast(min_month), p.month == F.col("mm")).select(
        "l_partkey", F.col("q").alias("q0"), F.col("p_fp").alias("p0")
    )
    j = (
        p.crossJoin(F.broadcast(min_month))
        .where(F.col("month") > F.col("mm"))
        .join(F.broadcast(base), "l_partkey")
    )
    agg = j.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.col("p_fp").cast(dec) * F.col("q0").cast(dec)).cast(dec).alias("l_num"),
        F.sum(F.col("p0").cast(dec) * F.col("q0").cast(dec)).cast(dec).alias("l_den"),
        F.sum(F.col("p_fp").cast(dec) * F.col("q").cast(dec)).cast(dec).alias("pa_num"),
        F.sum(F.col("p0").cast(dec) * F.col("q").cast(dec)).cast(dec).alias("pa_den"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    las = d_("l_num") / d_("l_den")
    paa = d_("pa_num") / d_("pa_den")
    return agg.select(
        "month", "n_parts",
        F.round(las, 6).alias("laspeyres"),
        F.round(paa, 6).alias("paasche"),
        F.round(F.sqrt(las * paa), 6).alias("fisher"),
    )


@query(
    "self_excitation",
    """WITH r AS (
         SELECT user_id, event_type, epoch_us(ts)::BIGINT AS t_us,
                lead(event_type) OVER w AS nxt,
                lead(epoch_us(ts)::BIGINT) OVER w AS nxt_us
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       v AS (SELECT * FROM r WHERE nxt IS NOT NULL),
       marg AS (
         SELECT nxt AS event_type, count(*)::BIGINT AS as_next
         FROM v GROUP BY nxt),
       tot AS (SELECT count(*)::BIGINT AS n_trans FROM v),
       per AS (
         SELECT event_type,
                count(*)::BIGINT AS n_from,
                sum((nxt = event_type AND nxt_us - t_us <= 300000000)::INT)::BIGINT
                  AS same_soon
         FROM v GROUP BY event_type)
       SELECT per.event_type, per.n_from, per.same_soon, marg.as_next, tot.n_trans,
              round(per.same_soon::DOUBLE / per.n_from, 6) AS p_observed,
              round(marg.as_next::DOUBLE / tot.n_trans, 6) AS p_marginal,
              CASE WHEN per.same_soon > 0
                   THEN round((per.same_soon::DOUBLE / per.n_from)
                              / (marg.as_next::DOUBLE / tot.n_trans), 6) END AS lift
       FROM per JOIN marg USING (event_type) CROSS JOIN tot""",
)
def q_self_excitation(spark, sf_dir):
    """Self-excitation lift per event type (the Hawkes-process
    diagnostic in census form): P(the NEXT event is the same type AND
    arrives within 5 minutes | current type) against the marginal
    next-event share of that type — lift ≫ 1 means the type clusters
    in time (retry storms, scraping bursts, doomscrolling), which is
    what decides whether a Poisson rate model is honest. One user-key
    window pass for transitions; type-grain censuses; two divisions
    and a ratio rounded once. NULL lift when the type never
    self-follows."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = epoch_micros(ev, "ts").cast("long")
    r = ev.select(
        "event_type", t_us.alias("t_us"),
        F.lead("event_type").over(wu).alias("nxt"),
        F.lead(t_us).over(wu).alias("nxt_us"),
    ).where(F.col("nxt").isNotNull()).localCheckpoint(eager=True)
    marg = r.groupBy(F.col("nxt").alias("event_type")).agg(
        F.count(F.lit(1)).cast("long").alias("as_next")
    )
    n_trans = r.count()
    per = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_from"),
        F.sum(
            ((F.col("nxt") == F.col("event_type")) & (F.col("nxt_us") - F.col("t_us") <= 300_000_000)).cast("int")
        ).cast("long").alias("same_soon"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    p_obs = d_("same_soon") / d_("n_from")
    p_marg = d_("as_next") / F.lit(float(n_trans))
    return per.join(marg, "event_type").select(
        "event_type", "n_from", "same_soon", "as_next",
        F.lit(n_trans).cast("long").alias("n_trans"),
        F.round(p_obs, 6).alias("p_observed"),
        F.round(p_marg, 6).alias("p_marginal"),
        F.when(F.col("same_soon") > 0, F.round(p_obs / p_marg, 6)).alias("lift"),
    )


@query(
    "triangle_nullmodel",
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       sized AS (SELECT l_orderkey FROM op GROUP BY l_orderkey
                 HAVING count(*) BETWEEN 2 AND 20),
       b AS (SELECT op.* FROM op JOIN sized USING (l_orderkey)),
       e AS (
         SELECT DISTINCT a.l_partkey AS u, bb.l_partkey AS v
         FROM b a JOIN b bb ON a.l_orderkey = bb.l_orderkey
                           AND a.l_partkey < bb.l_partkey),
       sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
       deg AS (SELECT a AS node, count(*)::BIGINT AS d FROM sym GROUP BY a),
       o AS (
         SELECT s.a AS src, s.b AS dst
         FROM sym s JOIN deg da ON da.node = s.a JOIN deg db ON db.node = s.b
         WHERE (da.d, s.a) < (db.d, s.b)),
       tri AS (
         SELECT count(*)::BIGINT AS t FROM (
           SELECT e1.src, e1.dst AS v, e2.dst AS w
           FROM o e1 JOIN o e2 ON e1.src = e2.src AND e1.dst <> e2.dst
           JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst)),
       st AS (
         SELECT count(*)::BIGINT AS n, sum(d)::HUGEINT AS sd,
                sum(d::HUGEINT * (d - 1)::HUGEINT) AS sd2
         FROM deg)
       SELECT st.n AS n_nodes, (st.sd / 2)::BIGINT AS n_edges, tri.t AS triangles,
              round(pow(st.sd2::DOUBLE / st.sd::DOUBLE, 3.0) / 6.0, 6)
                AS expected_null,
              CASE WHEN st.sd2 > 0
                   THEN round(tri.t::DOUBLE
                              / (pow(st.sd2::DOUBLE / st.sd::DOUBLE, 3.0) / 6.0), 4)
              END AS clustering_ratio
       FROM st CROSS JOIN tri""",
)
def q_triangle_nullmodel(spark, sf_dir):
    """Triangle count vs the configuration-model null (Newman 2003,
    eq. for E[T] ≈ (Σd(d−1)/Σd)³/6): is the co-purchase graph's
    clustering REAL structure or just what its degree sequence forces?
    clustering_ratio ≫ 1 = genuine community structure (worth running
    community detection); ≈ 1 = degree artifact. Reuses the degree-
    ordered triangle enumeration of `triangle_coeffs` for the exact
    count; the null expectation needs only the degree census's
    DECIMAL sufficient stats. Ratio rounds at 4dp (cube of a ratio of
    near-collinear sums amplifies cross-engine ulps)."""
    dec = "decimal(38,0)"
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        op.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("bs"))
        .where((F.col("bs") >= 2) & (F.col("bs") <= 20)).select("l_orderkey")
    )
    b = op.join(sized, "l_orderkey")
    e = (
        b.alias("x").join(b.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("u"), F.col("y.l_partkey").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d")).withColumnRenamed("u", "node").localCheckpoint(eager=True)
    o = (
        sym.join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
        .where(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select(F.col("u").alias("src"), F.col("v").alias("dst"), F.col("dv").alias("dd"))
        .localCheckpoint(eager=True)
    )
    # orientation-ordered wedges only (see triangle_coeffs note)
    e1 = o.select("src", F.col("dst").alias("v"), F.col("dd").alias("dv_"))
    e2 = o.select("src", F.col("dst").alias("w"), F.col("dd").alias("dw_"))
    wedges = e1.join(e2, "src").where(
        (F.col("dv_") < F.col("dw_"))
        | ((F.col("dv_") == F.col("dw_")) & (F.col("v") < F.col("w")))
    )
    closing = o.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    t = wedges.join(closing, ["v", "w"]).count()
    st = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d").cast(dec).alias("sd"),
        F.sum(F.col("d").cast(dec) * (F.col("d") - 1).cast(dec)).cast(dec).alias("sd2"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    exp_null = F.pow(d_("sd2") / d_("sd"), F.lit(3.0)) / F.lit(6.0)
    return st.select(
        F.col("n").alias("n_nodes"),
        (F.col("sd") / 2).cast("long").alias("n_edges"),
        F.lit(t).cast("long").alias("triangles"),
        F.round(exp_null, 6).alias("expected_null"),
        F.when(F.col("sd2") > 0, F.round(F.lit(float(t)) / exp_null, 4)).alias("clustering_ratio"),
    )


# --------------------------------------------------------------------------
# batch 45: butterfly counting, weighted Jaccard, log-rank test

@query(
    "butterfly_count",
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       sized AS (SELECT l_orderkey FROM op GROUP BY l_orderkey
                 HAVING count(*) BETWEEN 2 AND 20),
       b AS (SELECT op.* FROM op JOIN sized USING (l_orderkey)),
       do_ AS (SELECT l_orderkey, count(*)::BIGINT AS d FROM b GROUP BY 1),
       dp AS (SELECT l_partkey, count(*)::BIGINT AS d FROM b GROUP BY 1),
       co AS (
         SELECT a.l_partkey AS p1, bb.l_partkey AS p2, count(*)::BIGINT AS c_co
         FROM b a JOIN b bb ON a.l_orderkey = bb.l_orderkey
                           AND a.l_partkey < bb.l_partkey
         GROUP BY 1, 2),
       bf AS (SELECT sum(c_co * (c_co - 1) / 2)::HUGEINT AS butterflies FROM co),
       l3 AS (
         SELECT sum((do_.d - 1)::HUGEINT * (dp.d - 1)::HUGEINT) AS paths3
         FROM b JOIN do_ USING (l_orderkey) JOIN dp USING (l_partkey))
       SELECT (SELECT count(*) FROM b)::BIGINT AS n_edges,
              bf.butterflies::BIGINT AS butterflies,
              l3.paths3::BIGINT AS paths3,
              CASE WHEN l3.paths3 > 0
                   THEN round(4.0 * bf.butterflies::DOUBLE / l3.paths3::DOUBLE, 6)
              END AS bipartite_cc
       FROM bf CROSS JOIN l3""",
)
def q_butterfly_count(spark, sf_dir):
    """Butterfly (2×2 biclique) counting and the Robins-Alexander
    bipartite clustering coefficient 4·B/L₃ (Robins & Alexander 2004;
    Wang et al., VLDB 2019 for the counting shape) over the order-part
    bipartite graph — bipartite graphs have NO triangles, so this is
    the correct cohesion measure for user-item / crawl-link data, and
    the butterfly census is the workhorse behind bipartite community
    detection. B = Σ C(co_{p1,p2}, 2) from the SAME co-occurrence
    census item_cosine builds; L₃ (3-paths) = Σ_edges (d_o−1)(d_p−1)
    from two degree joins. All exact int64/HUGEINT; one ratio."""
    dec = "decimal(38,0)"
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        op.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("bs"))
        .where((F.col("bs") >= 2) & (F.col("bs") <= 20)).select("l_orderkey")
    )
    b = op.join(sized, "l_orderkey").localCheckpoint(eager=True)
    do_ = b.groupBy("l_orderkey").agg(F.count(F.lit(1)).cast("long").alias("d_o"))
    dp = b.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("d_p"))
    a1 = b.select("l_orderkey", F.col("l_partkey").alias("p1"))
    a2 = b.select("l_orderkey", F.col("l_partkey").alias("p2"))
    co = (
        a1.join(a2, "l_orderkey").where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2").agg(F.count(F.lit(1)).cast("long").alias("c_co"))
    )
    bf = co.agg(
        F.sum((F.col("c_co").cast(dec) * (F.col("c_co") - 1).cast(dec) / 2).cast(dec))
        .cast(dec).alias("butterflies")
    )
    l3 = (
        b.join(do_, "l_orderkey").join(dp, "l_partkey")
        .agg(
            F.sum((F.col("d_o") - 1).cast(dec) * (F.col("d_p") - 1).cast(dec))
            .cast(dec).alias("paths3")
        )
    )
    n_edges = b.count()
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    return bf.crossJoin(l3).select(
        F.lit(n_edges).cast("long").alias("n_edges"),
        F.col("butterflies").cast("long").alias("butterflies"),
        F.col("paths3").cast("long").alias("paths3"),
        F.when(
            F.col("paths3") > 0,
            F.round(F.lit(4.0) * d_("butterflies") / d_("paths3"), 6),
        ).alias("bipartite_cc"),
    )


@query(
    "weighted_jaccard",
    f"""WITH toks AS (
         SELECT source, unnest(string_split(trim(text), ' ')) AS token FROM documents),
       cnt AS (SELECT source, token, count(*)::BIGINT AS c FROM toks GROUP BY 1, 2),
       srcs AS (SELECT DISTINCT source FROM cnt),
       pairs AS (SELECT a.source AS src_a, b.source AS src_b
                 FROM srcs a JOIN srcs b ON a.source < b.source),
       cells AS (
         SELECT p.src_a, p.src_b, t.token,
                coalesce(ca.c, 0) AS a, coalesce(cb.c, 0) AS b
         FROM pairs p CROSS JOIN (SELECT DISTINCT token FROM cnt) t
         LEFT JOIN cnt ca ON ca.source = p.src_a AND ca.token = t.token
         LEFT JOIN cnt cb ON cb.source = p.src_b AND cb.token = t.token
         WHERE coalesce(ca.c, 0) > 0 OR coalesce(cb.c, 0) > 0)
       SELECT src_a, src_b,
              round(sum(least(a, b))::DOUBLE / sum(greatest(a, b)), 6)
                AS weighted_jaccard
       FROM cells GROUP BY src_a, src_b""",
)
def q_weighted_jaccard(spark, sf_dir):
    """Weighted (multiset) Jaccard similarity between source token
    frequency vectors: Σ min(fₐ, f_b) / Σ max(fₐ, f_b) — the quantity
    weighted-MinHash sketches (Ioffe 2010) estimate, computed exactly
    here as the ground truth those sketches would be audited against;
    unlike set Jaccard it is sensitive to HOW OFTEN shared vocabulary
    is used. Everything is exact integer min/max sums from one census;
    one division per pair. At web scale the cell grid caps to a top-V
    vocabulary exactly as source_jsd documents."""
    d = _docs(spark, sf_dir)
    cnt = (
        d.select("source", F.explode(T.tokenize(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    srcs = cnt.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("src_a"))
        .join(srcs.select(F.col("source").alias("src_b")), F.col("src_a") < F.col("src_b"))
    )
    vocab = cnt.select("token").distinct()
    cells = (
        pairs.crossJoin(vocab)
        .join(cnt.select(F.col("source").alias("src_a"), "token", F.col("c").alias("a")),
              ["src_a", "token"], "left")
        .join(cnt.select(F.col("source").alias("src_b"), "token", F.col("c").alias("b")),
              ["src_b", "token"], "left")
        .select(
            "src_a", "src_b",
            F.coalesce("a", F.lit(0)).alias("a"), F.coalesce("b", F.lit(0)).alias("b"),
        )
        .where((F.col("a") > 0) | (F.col("b") > 0))
    )
    return cells.groupBy("src_a", "src_b").agg(
        F.round(
            F.sum(F.least("a", "b")).cast("double") / F.sum(F.greatest("a", "b")), 6
        ).alias("weighted_jaccard")
    )


@query(
    "logrank_test",
    """WITH firsts AS (
         SELECT user_id, (user_id % 2 = 0) AS treat,
                min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v_u,
                min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p_u,
                max(epoch_us(ts)) AS last_u
         FROM events GROUP BY user_id, (user_id % 2 = 0)),
       spans AS (
         SELECT treat,
                CASE WHEN p_u IS NOT NULL AND p_u > v_u
                     THEN (p_u - v_u) // 86400000000 END AS conv_day,
                (last_u - v_u) // 86400000000 AS censor_day
         FROM firsts WHERE v_u IS NOT NULL),
       days AS (SELECT unnest(range(30))::BIGINT AS day),
       tbl AS (
         SELECT d.day,
                sum(CASE WHEN s.treat AND coalesce(s.conv_day, s.censor_day) >= d.day
                         THEN 1 ELSE 0 END)::BIGINT AS n1,
                sum(CASE WHEN NOT s.treat AND coalesce(s.conv_day, s.censor_day) >= d.day
                         THEN 1 ELSE 0 END)::BIGINT AS n2,
                sum(CASE WHEN s.treat AND s.conv_day = d.day THEN 1 ELSE 0 END)::BIGINT AS d1,
                sum(CASE WHEN NOT s.treat AND s.conv_day = d.day THEN 1 ELSE 0 END)::BIGINT AS d2
         FROM days d CROSS JOIN spans s GROUP BY d.day),
       terms AS (
         SELECT day, n1, n2, d1, d2,
                CAST(round(1000000.0 * (d1::DOUBLE - (d1 + d2)::DOUBLE * n1::DOUBLE
                                        / (n1 + n2)::DOUBLE)) AS BIGINT) AS ome_fp,
                CASE WHEN n1 + n2 > 1
                     THEN CAST(round(1000000.0 * (d1 + d2)::DOUBLE
                          * (n1::DOUBLE / (n1 + n2)::DOUBLE)
                          * (n2::DOUBLE / (n1 + n2)::DOUBLE)
                          * ((n1 + n2 - d1 - d2)::DOUBLE / (n1 + n2 - 1)::DOUBLE))
                          AS BIGINT)
                     ELSE 0 END AS v_fp
         FROM tbl WHERE n1 + n2 > 0 AND d1 + d2 > 0)
       SELECT count(*)::BIGINT AS event_days,
              sum(d1)::BIGINT AS events_treat, sum(d2)::BIGINT AS events_ctrl,
              round(sum(ome_fp)::DOUBLE / 1000000.0, 6) AS o_minus_e,
              CASE WHEN sum(v_fp) > 0
                   THEN round((sum(ome_fp)::DOUBLE / 1000000.0)
                              * (sum(ome_fp)::DOUBLE / 1000000.0)
                              / (sum(v_fp)::DOUBLE / 1000000.0), 4) END AS chi2_logrank
       FROM terms""",
)
def q_logrank_test(spark, sf_dir):
    """Log-rank (Mantel-Cox) test comparing time-to-purchase between
    even- and odd-id users: per event day the hypergeometric O−E and
    variance terms round ONCE to integer micro-units (exact sums across
    days — the same order-proofing as every *_fp column), and
    χ² = (Σ(O−E))²/ΣV rounds at 4dp (a squared quotient amplifies
    ulps). This is THE standard two-group survival comparison —
    completing the family: `hazard_table` (shape), `rmst` (magnitude),
    log-rank (significance). Plan identical to hazard_table with a
    group column."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    uu = epoch_micros(ev, "ts")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", uu)).alias("v_u"),
        F.min(F.when(F.col("event_type") == "purchase", uu)).alias("p_u"),
        F.max(uu).alias("last_u"),
    ).select("*", (F.col("user_id") % 2 == 0).alias("treat"))
    spans = firsts.where(F.col("v_u").isNotNull()).select(
        "treat",
        F.when(
            F.col("p_u").isNotNull() & (F.col("p_u") > F.col("v_u")),
            F.floor((F.col("p_u") - F.col("v_u")) / 86_400_000_000),
        ).alias("conv_day"),
        F.floor((F.col("last_u") - F.col("v_u")) / 86_400_000_000).alias("censor_day"),
    )
    days = spark.range(30).select(F.col("id").alias("day"))
    at_risk = F.coalesce("conv_day", "censor_day") >= F.col("day")
    conv = F.col("conv_day") == F.col("day")
    tbl = (
        F.broadcast(days).crossJoin(spans)
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("treat") & at_risk, 1).otherwise(0)).cast("long").alias("n1"),
            F.sum(F.when(~F.col("treat") & at_risk, 1).otherwise(0)).cast("long").alias("n2"),
            F.sum(F.when(F.col("treat") & conv, 1).otherwise(0)).cast("long").alias("d1"),
            F.sum(F.when(~F.col("treat") & conv, 1).otherwise(0)).cast("long").alias("d2"),
        )
        .where((F.col("n1") + F.col("n2") > 0) & (F.col("d1") + F.col("d2") > 0))
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    nn = (F.col("n1") + F.col("n2")).cast("double")
    dd = (F.col("d1") + F.col("d2")).cast("double")
    ome = F.round(F.lit(1e6) * (d_("d1") - dd * d_("n1") / nn), 0).cast("long")
    v = F.when(
        F.col("n1") + F.col("n2") > 1,
        F.round(
            F.lit(1e6) * dd * (d_("n1") / nn) * (d_("n2") / nn) * ((nn - dd) / (nn - 1)), 0
        ).cast("long"),
    ).otherwise(F.lit(0))
    terms = tbl.select("d1", "d2", ome.alias("ome_fp"), v.alias("v_fp"))
    return terms.agg(
        F.count(F.lit(1)).cast("long").alias("event_days"),
        F.sum("d1").cast("long").alias("events_treat"),
        F.sum("d2").cast("long").alias("events_ctrl"),
        F.round(F.sum("ome_fp").cast("double") / F.lit(1e6), 6).alias("o_minus_e"),
        F.when(
            F.sum("v_fp") > 0,
            F.round(
                (F.sum("ome_fp").cast("double") / F.lit(1e6))
                * (F.sum("ome_fp").cast("double") / F.lit(1e6))
                / (F.sum("v_fp").cast("double") / F.lit(1e6)),
                4,
            ),
        ).alias("chi2_logrank"),
    )


# --------------------------------------------------------------------------
# batch 46: MASE forecast backtest, FK orphan audit, novelty decay curve

@query(
    "mase_backtest",
    """WITH daily AS (
         SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS day,
                count(*)::BIGINT AS c
         FROM events GROUP BY 1, 2),
       lagged AS (
         SELECT event_type, day, c,
                lag(c, 1) OVER w AS l1,
                lag(c, 7) OVER w AS l7
         FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
       scored AS (SELECT * FROM lagged WHERE l1 IS NOT NULL AND l7 IS NOT NULL)
       SELECT event_type,
              count(*)::BIGINT AS n_days,
              sum(abs(c - l7))::BIGINT AS abs_err_seasonal,
              sum(abs(c - l1))::BIGINT AS abs_err_naive,
              CASE WHEN sum(abs(c - l1)) > 0
                   THEN round(sum(abs(c - l7))::DOUBLE / sum(abs(c - l1)), 6)
              END AS mase
       FROM scored GROUP BY event_type""",
)
def q_mase_backtest(spark, sf_dir):
    """MASE forecast backtest (Hyndman & Koehler 2006 — the scale-free
    forecast-accuracy standard): per event type's daily count series,
    the seasonal-naive forecast (value 7 days ago) scored against the
    one-step naive (yesterday) on the SAME days — MASE < 1 means weekly
    seasonality genuinely helps, the go/no-go before any fancier
    forecaster ships. Lag positions come from calendar-ordered rows per
    type; absolute errors are exact int64 sums; one ratio (the shared
    day count cancels). Plan: one daily census, one type-key window."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type", "c",
        F.lag("c", 1).over(w).alias("l1"),
        F.lag("c", 7).over(w).alias("l7"),
    ).where(F.col("l1").isNotNull() & F.col("l7").isNotNull())
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.abs(F.col("c") - F.col("l7"))).cast("long").alias("abs_err_seasonal"),
        F.sum(F.abs(F.col("c") - F.col("l1"))).cast("long").alias("abs_err_naive"),
        F.when(
            F.sum(F.abs(F.col("c") - F.col("l1"))) > 0,
            F.round(
                F.sum(F.abs(F.col("c") - F.col("l7"))).cast("double")
                / F.sum(F.abs(F.col("c") - F.col("l1"))),
                6,
            ),
        ).alias("mase"),
    )


def _fk_sql() -> str:
    edges = [
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ]
    parts = []
    for name, child, fk, parent, pk in edges:
        parts.append(f"""(
          SELECT '{name}' AS relation,
                 (SELECT count(*) FROM {child})::BIGINT AS child_rows,
                 (SELECT count(*) FROM {child} c
                  WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                                    WHERE p.{pk} = c.{fk}))::BIGINT AS orphans)""")
    return " UNION ALL ".join(parts)


@query("fk_orphans", _fk_sql())
def q_fk_orphans(spark, sf_dir):
    """Referential-integrity audit across the star schema's five FK
    edges: orphan child rows (FK value with no parent) per relation —
    the first data-quality gate any warehouse load runs (the FK cousin
    of `dq_checks`' column rules). Each edge is one LEFT ANTI join
    (never a full outer) against the parent's key projection; counts
    are exact. At scale each parent side is a broadcast of just the
    key column."""
    edges = [
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ]
    rows = []
    for name, child, fk, parent, pk in edges:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(F.col(pk).alias(fk)).distinct()
        rows.append((name, c.count(), c.join(p, fk, "left_anti").count()))
    return spark.createDataFrame(rows, "relation string, child_rows long, orphans long")


@query(
    "novelty_decay",
    """WITH d AS (
         SELECT doc_id, string_split(trim(text), ' ') AS t,
                row_number() OVER (ORDER BY doc_id) AS rn,
                count(*) OVER () AS nn
         FROM documents),
       sh AS (
         SELECT doc_id, rn, nn,
                t[i] || ' ' || t[i + 1] AS shingle
         FROM d, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
         WHERE len(t) >= 2),
       firsts AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle),
       per_doc AS (
         SELECT sh.doc_id, sh.rn, sh.nn,
                count(*)::BIGINT AS n_shingles,
                sum((f.first_doc = sh.doc_id)::INT)::BIGINT AS n_first
         FROM sh JOIN firsts f USING (shingle)
         GROUP BY sh.doc_id, sh.rn, sh.nn)
       SELECT ((rn - 1) * 10 // nn)::BIGINT AS decile,
              count(*)::BIGINT AS docs,
              sum(n_shingles)::BIGINT AS shingles,
              sum(n_first)::BIGINT AS first_seen,
              round(sum(n_first)::DOUBLE / sum(n_shingles), 6) AS novelty_rate
       FROM per_doc GROUP BY 1""",
)
def q_novelty_decay(spark, sf_dir):
    """Novelty-decay curve (the diminishing-returns-of-more-data
    readout; Lee et al. 2022's dedup rationale at corpus grain): docs
    ordered by ingestion id, split into deciles, and each decile's
    share of word-bigram shingle OCCURRENCES whose shingle first
    appears there — early deciles are nearly all novel, late deciles
    show how much the marginal crawl batch still contributes. One
    shingle census with a min-doc aggregate (the `ngram_novelty`
    machinery at curve grain); exact counts, one division per
    decile."""
    d = _docs(spark, sf_dir)
    from pliers_spark.functions.hashing import shingles

    n = d.count()
    dd = d.select(
        "doc_id",
        F.explode(shingles(T.tokenize(F.col("text")), 2)).alias("shingle"),
    )
    rn = F.row_number().over(Window.orderBy("doc_id"))
    ranked_docs = d.select("doc_id").select("doc_id", rn.alias("rn"))
    firsts = dd.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        dd.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("int")).cast("long").alias("n_first"),
        )
        .join(ranked_docs, "doc_id")
    )
    return per_doc.groupBy(
        F.floor((F.col("rn") - 1) * 10 / F.lit(n)).cast("long").alias("decile")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.sum("n_shingles").cast("long").alias("shingles"),
        F.sum("n_first").cast("long").alias("first_seen"),
        F.round(F.sum("n_first").cast("double") / F.sum("n_shingles"), 6).alias("novelty_rate"),
    )


# --------------------------------------------------------------------------
# batch 47: greedy max-coverage selection, rich-club coefficient, SRM check

_MAXCOV_K = 5


def _maxcov_sql(k: int = _MAXCOV_K) -> str:
    parts = ["""sh AS (
         SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] AS s
         FROM (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents) d,
              LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
         WHERE len(t) >= 2)"""]
    prev_cov = None
    rows = []
    for i in range(1, k + 1):
        uncov = "sh" if prev_cov is None else (
            f"(SELECT sh.* FROM sh WHERE NOT EXISTS "
            f"(SELECT 1 FROM {prev_cov} c WHERE c.s = sh.s))"
        )
        parts.append(f"""r{i} AS (
         SELECT doc_id, count(*)::BIGINT AS gain
         FROM {uncov} u GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1)""")
        cov_body = f"SELECT s FROM sh WHERE doc_id = (SELECT doc_id FROM r{i})"
        if prev_cov is not None:
            cov_body = f"SELECT s FROM {prev_cov} UNION {cov_body}"
        parts.append(f"c{i} AS ({cov_body})")
        rows.append(
            f"SELECT {i}::BIGINT AS round, doc_id, gain, "
            f"(SELECT count(*) FROM c{i})::BIGINT AS covered_total FROM r{i}"
        )
        prev_cov = f"c{i}"
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(rows)


@query("max_coverage", _maxcov_sql())
def q_max_coverage(spark, sf_dir):
    """Greedy maximum-coverage document selection (the (1−1/e)-optimal
    submodular greedy; Nemhauser 1978): pick {_MAXCOV_K} documents that
    together cover the most distinct word-bigram shingles — the
    'diverse exemplar subset' move behind seed-set curation, eval-set
    construction, and coverage-driven dedup retention. Each round is
    one anti-join of the shingle census against the covered set plus a
    distributed argmax (count desc, doc_id tie); the covered set is
    checkpointed per round so the census never recomputes. The driver
    loop is K iterations — the idiomatic Spark shape for greedy
    submodular selection (same structure as the CC operator)."""
    from pliers_spark.functions.hashing import shingles

    d = _docs(spark, sf_dir)
    sh = d.select(
        "doc_id", F.explode(shingles(T.tokenize(F.col("text")), 2)).alias("s")
    ).distinct().localCheckpoint(eager=True)
    covered = None
    out = []
    for rnd in range(1, _MAXCOV_K + 1):
        uncov = sh if covered is None else sh.join(covered, "s", "left_anti")
        picks = (
            uncov.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("gain"))
            .orderBy(F.desc("gain"), "doc_id").limit(1).collect()
        )
        if not picks:  # coverage exhausted — later rounds have no argmax row
            break
        pick = picks[0]
        new_cov = sh.where(F.col("doc_id") == pick.doc_id).select("s")
        covered = (
            new_cov if covered is None else covered.unionAll(new_cov).distinct()
        ).distinct().localCheckpoint(eager=True)
        out.append((rnd, pick.doc_id, pick.gain, covered.count()))
    return spark.createDataFrame(
        out, "round long, doc_id long, gain long, covered_total long"
    )


def _rich_club_sql() -> str:
    parts = []
    for k in (2, 4, 8):
        parts.append(f"""(
          SELECT {k}::BIGINT AS k,
                 (SELECT count(*) FROM deg WHERE d > {k})::BIGINT AS n_rich,
                 (SELECT count(*) FROM e
                  JOIN deg da ON da.node = e.u AND da.d > {k}
                  JOIN deg db ON db.node = e.v AND db.d > {k})::BIGINT AS rich_edges,
                 CASE WHEN (SELECT count(*) FROM deg WHERE d > {k}) >= 2
                      THEN round(2.0 * (SELECT count(*) FROM e
                                        JOIN deg da ON da.node = e.u AND da.d > {k}
                                        JOIN deg db ON db.node = e.v AND db.d > {k})::DOUBLE
                                 / ((SELECT count(*) FROM deg WHERE d > {k})::DOUBLE
                                    * ((SELECT count(*) FROM deg WHERE d > {k}) - 1)::DOUBLE), 6)
                 END AS phi)""")
    return (
        """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       sized AS (SELECT l_orderkey FROM op GROUP BY l_orderkey
                 HAVING count(*) BETWEEN 2 AND 20),
       b AS (SELECT op.* FROM op JOIN sized USING (l_orderkey)),
       e AS (
         SELECT DISTINCT a.l_partkey AS u, bb.l_partkey AS v
         FROM b a JOIN b bb ON a.l_orderkey = bb.l_orderkey
                           AND a.l_partkey < bb.l_partkey),
       sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
       deg AS (SELECT a AS node, count(*)::BIGINT AS d FROM sym GROUP BY a)
       """
        + " UNION ALL ".join(parts)
    )


@query("rich_club", _rich_club_sql())
def q_rich_club(spark, sf_dir):
    """Rich-club coefficient φ(k) (Zhou & Mondragón 2004): the edge
    density among nodes of degree > k, for k ∈ {2,4,8} — rising φ(k)
    means hubs preferentially interconnect (an elite core that
    dominates mixing and makes hub-failure catastrophic); flat/falling
    φ means hubs spread out. Companion to `degree_assortativity` (one
    number) with the k-resolved view. Degree census once; per-k the
    rich subgraph is two broadcast-size degree joins; exact counts,
    one density ratio per k."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        op.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("bs"))
        .where((F.col("bs") >= 2) & (F.col("bs") <= 20)).select("l_orderkey")
    )
    b = op.join(sized, "l_orderkey")
    e = (
        b.alias("x").join(b.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("u"), F.col("y.l_partkey").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d")).withColumnRenamed("u", "node").localCheckpoint(eager=True)
    rows = []
    for k in (2, 4, 8):
        rich = deg.where(F.col("d") > k).select("node")
        n_rich = rich.count()
        rich_edges = (
            e.join(rich.withColumnRenamed("node", "u"), "u")
            .join(rich.withColumnRenamed("node", "v"), "v")
            .count()
        )
        phi = (
            round(2.0 * rich_edges / (n_rich * (n_rich - 1)), 6) if n_rich >= 2 else None
        )
        rows.append((k, n_rich, rich_edges, phi))
    return spark.createDataFrame(
        rows, "k long, n_rich long, rich_edges long, phi double"
    )


@query(
    "srm_check",
    """WITH v AS (
         SELECT (user_id % 2 = 0) AS arm_a FROM events),
       s AS (
         SELECT sum(arm_a::INT)::BIGINT AS n_a,
                sum((NOT arm_a)::INT)::BIGINT AS n_b
         FROM v)
       SELECT n_a, n_b,
              round((n_a - n_b)::DOUBLE * (n_a - n_b)::DOUBLE
                    / (n_a + n_b)::DOUBLE, 6) AS chi2,
              (n_a - n_b)::DOUBLE * (n_a - n_b)::DOUBLE / (n_a + n_b)::DOUBLE
                > 3.841459 AS srm_flag
       FROM s""",
)
def q_srm_check(spark, sf_dir):
    """Sample-ratio-mismatch check (Kohavi's #1 A/B validity gate): the
    even/odd user split should route ~50% of EVENTS to each arm; the
    1-df chi-square (n_a−n_b)²/(n_a+n_b) against the 0.05 critical
    value 3.841459 flags exposure imbalance (activity skew, logging
    loss, assignment bugs) before anyone reads the metric movement.
    Users are assigned deterministically but their ACTIVITY is not, so
    this genuinely tests traffic balance. One census row; one ratio."""
    ev = _events(spark, sf_dir)
    s = ev.select((F.col("user_id") % 2 == 0).cast("int").alias("a")).agg(
        F.sum("a").cast("long").alias("n_a"),
        F.sum(1 - F.col("a")).cast("long").alias("n_b"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    chi2 = (d_("n_a") - d_("n_b")) * (d_("n_a") - d_("n_b")) / (d_("n_a") + d_("n_b"))
    return s.select(
        "n_a", "n_b",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > F.lit(3.841459)).alias("srm_flag"),
    )


# --------------------------------------------------------------------------
# batch 48: 2-D skyline, Youden threshold, event debouncing

@query(
    "skyline_2d",
    """WITH p AS (
         SELECT p_partkey,
                CAST(round(p_retailprice * 100.0) AS BIGINT) AS price_fp,
                p_size::BIGINT AS size
         FROM part),
       w AS (
         SELECT *,
                max(size) OVER (ORDER BY price_fp
                                RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS max_size_cheaper,
                max(size) OVER (PARTITION BY price_fp) AS max_size_same
         FROM p)
       SELECT p_partkey, price_fp, size
       FROM w
       WHERE (max_size_cheaper IS NULL OR max_size_cheaper < size)
         AND max_size_same <= size""",
)
def q_skyline_2d(spark, sf_dir):
    """2-D skyline / Pareto-front extraction (Börzsönyi, Kossmann &
    Stocker, ICDE 2001): parts not dominated on (cheaper price, larger
    size) — the classic multi-criteria shortlist operator ('show me
    options where nothing is both cheaper AND bigger'). In 2-D the
    skyline needs NO pairwise dominance join: one sort by price with a
    running-max-of-size RANGE window (strictly-cheaper frame) plus a
    same-price max handles ties exactly — the O(n log n) sweep-line as
    a window plan. Points tied on both dims don't dominate each other
    and all stay. Integer cents/sizes; no floats at all."""
    pt = load_table(spark, sf_dir, "part")
    p = pt.select(
        "p_partkey",
        F.round(F.col("p_retailprice") * 100.0, 0).cast("long").alias("price_fp"),
        F.col("p_size").cast("long").alias("size"),
    )
    w_lt = Window.orderBy("price_fp").rangeBetween(Window.unboundedPreceding, -1)
    w_eq = Window.partitionBy("price_fp")
    w = p.select(
        "*",
        F.max("size").over(w_lt).alias("max_size_cheaper"),
        F.max("size").over(w_eq).alias("max_size_same"),
    )
    return w.where(
        (F.col("max_size_cheaper").isNull() | (F.col("max_size_cheaper") < F.col("size")))
        & (F.col("max_size_same") <= F.col("size"))
    ).select("p_partkey", "price_fp", "size")


@query(
    "youden_threshold",
    """WITH base AS (
         SELECT CAST(round(value * 1000000.0) AS BIGINT) AS score,
                CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS label
         FROM events),
       tot AS (SELECT sum(label)::BIGINT AS pos,
                      sum(1 - label)::BIGINT AS neg FROM base),
       per_s AS (
         SELECT score, sum(label)::BIGINT AS p, sum(1 - label)::BIGINT AS n
         FROM base GROUP BY score),
       cum AS (
         SELECT score,
                sum(p) OVER (ORDER BY score DESC) AS ctp,
                sum(n) OVER (ORDER BY score DESC) AS cfp
         FROM per_s),
       j AS (
         SELECT score, ctp, cfp,
                ctp::HUGEINT * tot.neg::HUGEINT - cfp::HUGEINT * tot.pos::HUGEINT
                  AS j_num,
                tot.pos, tot.neg
         FROM cum CROSS JOIN tot),
       best AS (
         SELECT * FROM j ORDER BY j_num DESC, score DESC LIMIT 1)
       SELECT score AS threshold_fp, ctp::BIGINT AS tp, cfp::BIGINT AS fp,
              round(ctp::DOUBLE / pos, 6) AS tpr,
              round(cfp::DOUBLE / neg, 6) AS fpr,
              round(ctp::DOUBLE / pos - cfp::DOUBLE / neg, 6) AS youden_j
       FROM best""",
)
def q_youden_threshold(spark, sf_dir):
    """Optimal classification threshold by Youden's J = TPR − FPR
    (Youden 1950): sweep every distinct score as 'predict positive if
    value ≥ t' and return the maximizer — how `quality_filter`-style
    gates get their cutoff from labeled data (the argmax point of the
    `roc_auc` curve; `filter_tradeoff` shows fixed points, this finds
    the best one). The sweep is a cumulative window on the DISTINCT-
    score grain, and the argmax compares the EXACT integer
    ctp·N − cfp·P (no ratio rounding can reorder candidates); ties
    break to the higher threshold (fewer kept). Two divisions at the
    end for the report."""
    dec = "decimal(38,0)"
    ev = _events(spark, sf_dir)
    base = ev.select(
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("score"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("label"),
    )
    tot = base.agg(
        F.sum("label").cast("long").alias("pos"),
        F.sum(1 - F.col("label")).cast("long").alias("neg"),
    )
    per_s = base.groupBy("score").agg(
        F.sum("label").cast("long").alias("p"),
        F.sum(1 - F.col("label")).cast("long").alias("n"),
    )
    wc = Window.orderBy(F.desc("score")).rowsBetween(Window.unboundedPreceding, 0)
    cum = per_s.select(
        "score", F.sum("p").over(wc).alias("ctp"), F.sum("n").over(wc).alias("cfp")
    )
    j = cum.crossJoin(F.broadcast(tot)).select(
        "*",
        (F.col("ctp").cast(dec) * F.col("neg").cast(dec)
         - F.col("cfp").cast(dec) * F.col("pos").cast(dec)).alias("j_num"),
    )
    best = j.orderBy(F.desc("j_num"), F.desc("score")).limit(1)
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    return best.select(
        F.col("score").alias("threshold_fp"),
        F.col("ctp").cast("long").alias("tp"),
        F.col("cfp").cast("long").alias("fp"),
        F.round(d_("ctp") / d_("pos"), 6).alias("tpr"),
        F.round(d_("cfp") / d_("neg"), 6).alias("fpr"),
        F.round(d_("ctp") / d_("pos") - d_("cfp") / d_("neg"), 6).alias("youden_j"),
    )


_DEBOUNCE_US = 5_000_000  # 5 s


@query(
    "debounce_events",
    f"""WITH r AS (
         SELECT user_id, event_type, event_id, epoch_us(ts)::BIGINT AS t_us,
                lag(epoch_us(ts)::BIGINT) OVER w AS prev_us
         FROM events
         WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
       flagged AS (
         SELECT *, (prev_us IS NULL OR t_us - prev_us > {_DEBOUNCE_US})::INT AS new_burst
         FROM r),
       bursts AS (
         SELECT *, sum(new_burst) OVER (PARTITION BY user_id, event_type
                                        ORDER BY t_us, event_id) AS burst_id
         FROM flagged)
       SELECT user_id, event_type, burst_id::BIGINT AS burst_id,
              min(t_us)::BIGINT AS burst_start_us,
              count(*)::BIGINT AS n_events,
              (max(t_us) - min(t_us))::BIGINT AS span_us
       FROM bursts GROUP BY user_id, event_type, burst_id""",
)
def q_debounce_events(spark, sf_dir):
    """Event debouncing: collapse rapid-fire repeats of the same
    (user, event_type) within 5 s into one burst row (first timestamp,
    size, span) — the telemetry-hygiene step that kills double-clicks,
    retry storms and scraper bursts before counting anything (the
    sessionize gaps-and-islands machinery at the action grain, feeding
    `self_excitation`'s diagnosis with the actual fix). One composite-
    key window; burst ids are exact integer cumsums; grouping stays on
    the SAME key — no extra exchange."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    wk = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    t_us = epoch_micros(ev, "ts").cast("long")
    r = ev.select(
        "user_id", "event_type", "event_id", t_us.alias("t_us"),
        F.lag(t_us).over(wk).alias("prev_us"),
    )
    flagged = r.select(
        "*",
        (
            F.col("prev_us").isNull()
            | (F.col("t_us") - F.col("prev_us") > _DEBOUNCE_US)
        ).cast("int").alias("new_burst"),
    )
    wb = Window.partitionBy("user_id", "event_type").orderBy("t_us", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    bursts = flagged.select("*", F.sum("new_burst").over(wb).alias("burst_id"))
    return bursts.groupBy("user_id", "event_type", F.col("burst_id").cast("long").alias("burst_id")).agg(
        F.min("t_us").cast("long").alias("burst_start_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max("t_us") - F.min("t_us")).cast("long").alias("span_us"),
    )


# --------------------------------------------------------------------------
# batch 49: peak concurrency, interarrival burstiness, Pareto 80/20

_CONC_SPAN_US = 300_000_000  # each event holds a 5-minute slot


@query(
    "peak_concurrency",
    f"""WITH iv AS (
         SELECT epoch_us(ts)::BIGINT AS s,
                epoch_us(ts)::BIGINT + {_CONC_SPAN_US} AS e,
                event_id
         FROM events),
       pts AS (
         SELECT s AS t, 1 AS delta, event_id FROM iv
         UNION ALL
         SELECT e, -1, event_id FROM iv),
       sweep AS (
         SELECT t, delta,
                sum(delta) OVER (ORDER BY t, delta, event_id) AS conc
         FROM pts),
       best AS (SELECT t, conc FROM sweep ORDER BY conc DESC, t LIMIT 1)
       SELECT (SELECT count(*) FROM iv)::BIGINT AS n_intervals,
              best.conc::BIGINT AS peak_concurrency,
              best.t::BIGINT AS peak_at_us
       FROM best""",
)
def q_peak_concurrency(spark, sf_dir):
    """Peak concurrency via the sweep-line (+1/−1) scan: each event
    holds a 5-minute slot; the maximum of the running delta sum is the
    highest number of simultaneously open slots — the capacity-planning
    number (max concurrent sessions/connections) every ops dashboard
    needs and naive per-minute bucketing under-counts. Half-open
    interval semantics: an end at instant t sorts BEFORE a start at t
    (delta asc in the order), so touching intervals don't overlap. One
    global ordered window (two-pass range partitioning at scale, per
    the sequence_pack note); all integers."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    t_us = epoch_micros(ev, "ts").cast("long")
    iv = ev.select(t_us.alias("s"), (t_us + _CONC_SPAN_US).alias("e"), "event_id")
    n_iv = iv.count()
    pts = iv.select(F.col("s").alias("t"), F.lit(1).alias("delta"), "event_id").unionAll(
        iv.select(F.col("e").alias("t"), F.lit(-1).alias("delta"), "event_id")
    )
    w = Window.orderBy("t", "delta", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    sweep = pts.select("t", F.sum("delta").over(w).alias("conc"))
    best = sweep.orderBy(F.desc("conc"), "t").limit(1)
    return best.select(
        F.lit(n_iv).cast("long").alias("n_intervals"),
        F.col("conc").cast("long").alias("peak_concurrency"),
        F.col("t").cast("long").alias("peak_at_us"),
    )


@query(
    "interarrival_burstiness",
    """WITH r AS (
         SELECT user_id, epoch_us(ts)::BIGINT AS t_us,
                lag(epoch_us(ts)::BIGINT) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id) AS prev
         FROM events),
       g AS (SELECT user_id, (t_us - prev)::BIGINT AS gap
             FROM r WHERE prev IS NOT NULL),
       st AS (
         SELECT user_id, count(*)::BIGINT AS n, sum(gap)::BIGINT AS s,
                sum(gap::HUGEINT * gap::HUGEINT) AS q
         FROM g GROUP BY user_id HAVING count(*) >= 5)
       SELECT user_id, n AS n_gaps,
              CAST(round(s::DOUBLE / n) AS BIGINT) AS mean_gap_us,
              round((sqrt(q::DOUBLE / n - (s::DOUBLE / n) * (s::DOUBLE / n))
                     - s::DOUBLE / n)
                    / (sqrt(q::DOUBLE / n - (s::DOUBLE / n) * (s::DOUBLE / n))
                       + s::DOUBLE / n), 6) AS burstiness_b
       FROM st""",
)
def q_interarrival_burstiness(spark, sf_dir):
    """Goh-Barabási burstiness B = (σ−μ)/(σ+μ) of per-user interarrival
    gaps (EPL 2008): −1 = metronome, 0 = Poisson, →1 = heavy bursts —
    the one-number temporal twin of `dispersion_index` (which measures
    WHO concentrates activity; this measures WHEN), feeding the same
    bot/scraper triage as `self_excitation`. Gaps from one user-key
    window; σ and μ from exact int64/HUGEINT sufficient stats in ONE
    identical double expression; users need ≥5 gaps."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = epoch_micros(ev, "ts").cast("long")
    g = ev.select(
        "user_id", (t_us - F.lag(t_us).over(wu)).alias("gap")
    ).where(F.col("gap").isNotNull())
    dec = "decimal(38,0)"
    st = g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("gap").cast("long").alias("s"),
        F.sum(F.col("gap").cast(dec) * F.col("gap").cast(dec)).cast(dec).alias("q"),
    ).where(F.col("n") >= 5)
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    mu = d_("s") / d_("n")
    sig = F.sqrt(d_("q") / d_("n") - mu * mu)
    return st.select(
        "user_id", F.col("n").alias("n_gaps"),
        F.round(mu, 0).cast("long").alias("mean_gap_us"),
        F.round((sig - mu) / (sig + mu), 6).alias("burstiness_b"),
    )


@query(
    "pareto_8020",
    """WITH c AS (
         SELECT o_custkey,
                CAST(round(sum(o_totalprice) * 100.0) AS BIGINT) AS rev_fp
         FROM orders GROUP BY o_custkey),
       r AS (
         SELECT *, row_number() OVER (ORDER BY rev_fp DESC, o_custkey) AS rn,
                count(*) OVER () AS nn, sum(rev_fp) OVER () AS tot,
                sum(rev_fp) OVER (ORDER BY rev_fp DESC, o_custkey) AS cum
         FROM c)
       SELECT max(nn)::BIGINT AS n_customers,
              round(sum(CASE WHEN rn <= CAST(ceil(nn / 5.0) AS BIGINT)
                             THEN rev_fp ELSE 0 END)::DOUBLE / max(tot), 6)
                AS top20_revenue_share,
              min(CASE WHEN 5 * cum >= 4 * tot THEN rn END)::BIGINT
                AS customers_for_80pct
       FROM r""",
)
def q_pareto_8020(spark, sf_dir):
    """Pareto concentration audit: the revenue share of the top-20% of
    customers AND the exact head count needed to reach 80% of revenue
    — the 80/20 readout behind account tiering and (for corpora) 'how
    few domains produce most tokens' (`key_skew_report`'s business
    twin). One customer census, one rank/cumsum window on the
    customer grain; the 80% crossing uses the exact integer inequality
    5·cum ≥ 4·total (no ratio rounding); one division for the share."""
    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice") * 100.0, 0).cast("long").alias("rev_fp")
    )
    n = c.count()
    wr = Window.orderBy(F.desc("rev_fp"), "o_custkey")
    r = c.select(
        "rev_fp",
        F.row_number().over(wr).alias("rn"),
        F.sum("rev_fp").over(wr.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("rev_fp").over(Window.partitionBy()).alias("tot"),
    )
    top_k = -(-n // 5)  # ceil(n/5)
    return r.agg(
        F.lit(n).cast("long").alias("n_customers"),
        F.round(
            F.sum(F.when(F.col("rn") <= top_k, F.col("rev_fp")).otherwise(0)).cast("double")
            / F.max("tot"),
            6,
        ).alias("top20_revenue_share"),
        F.min(F.when(5 * F.col("cum") >= 4 * F.col("tot"), F.col("rn"))).cast("long").alias("customers_for_80pct"),
    )


# --------------------------------------------------------------------------
# batch 50: graph modularity, demand-pattern classes, RBO rank agreement

@query(
    "modularity_q",
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       sized AS (SELECT l_orderkey FROM op GROUP BY l_orderkey
                 HAVING count(*) BETWEEN 2 AND 20),
       b AS (SELECT op.* FROM op JOIN sized USING (l_orderkey)),
       e AS (
         SELECT DISTINCT a.l_partkey AS u, bb.l_partkey AS v
         FROM b a JOIN b bb ON a.l_orderkey = bb.l_orderkey
                           AND a.l_partkey < bb.l_partkey),
       pe AS (
         SELECT pu.p_brand AS bu, pv.p_brand AS bv
         FROM e JOIN part pu ON pu.p_partkey = e.u
                JOIN part pv ON pv.p_partkey = e.v),
       m AS (SELECT count(*)::BIGINT AS m,
                    sum((bu = bv)::INT)::BIGINT AS intra FROM pe),
       dc AS (
         SELECT brand, sum(d)::HUGEINT AS d_c FROM (
           SELECT bu AS brand, 1 AS d FROM pe
           UNION ALL SELECT bv, 1 FROM pe) GROUP BY brand),
       expct AS (
         SELECT sum(d_c * d_c)::HUGEINT AS sum_dc2,
                count(*)::BIGINT AS n_comm FROM dc)
       SELECT m.m AS n_edges, expct.n_comm AS n_communities, m.intra AS intra_edges,
              round(m.intra::DOUBLE / m.m
                    - expct.sum_dc2::DOUBLE / (4.0 * m.m::DOUBLE * m.m::DOUBLE), 6)
                AS modularity
       FROM m CROSS JOIN expct""",
)
def q_modularity_q(spark, sf_dir):
    """Newman-Girvan modularity Q of the brand partition over the
    co-purchase graph (Newman & Girvan 2004): Q = Σ_c (e_c/m −
    (d_c/2m)²) — does 'brand' behave as real community structure
    (Q ≫ 0) or do purchases ignore it (Q ≈ 0)? The evaluation every
    community-detection run needs, here scoring a GIVEN labeling, so
    no iteration at all: one edge census joined to the part dimension,
    per-community degree sums, exact int64/HUGEINT stats, one double
    expression."""
    dec = "decimal(38,0)"
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        op.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("bs"))
        .where((F.col("bs") >= 2) & (F.col("bs") <= 20)).select("l_orderkey")
    )
    b = op.join(sized, "l_orderkey")
    e = (
        b.alias("x").join(b.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("u"), F.col("y.l_partkey").alias("v"))
        .distinct()
    )
    pe = (
        e.join(F.broadcast(pt.select(F.col("p_partkey").alias("u"), F.col("p_brand").alias("bu"))), "u")
        .join(F.broadcast(pt.select(F.col("p_partkey").alias("v"), F.col("p_brand").alias("bv"))), "v")
        .select("bu", "bv")
        .localCheckpoint(eager=True)  # feeds edge census + degree sums
    )
    m = pe.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum((F.col("bu") == F.col("bv")).cast("int")).cast("long").alias("intra"),
    )
    dc = (
        pe.select(F.col("bu").alias("brand"))
        .unionAll(pe.select(F.col("bv").alias("brand")))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).cast(dec).alias("d_c"))
    )
    ex = dc.agg(
        F.sum(F.col("d_c") * F.col("d_c")).cast(dec).alias("sum_dc2"),
        F.count(F.lit(1)).cast("long").alias("n_comm"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    return m.crossJoin(ex).select(
        F.col("m").alias("n_edges"),
        F.col("n_comm").alias("n_communities"),
        F.col("intra").alias("intra_edges"),
        F.round(
            d_("intra") / d_("m") - d_("sum_dc2") / (F.lit(4.0) * d_("m") * d_("m")), 6
        ).alias("modularity"),
    )


@query(
    "demand_classes",
    """WITH months AS (
         SELECT (SELECT count(DISTINCT date_trunc('month', l_shipdate))
                 FROM lineitem)::BIGINT AS t),
       md AS (
         SELECT l_partkey, date_trunc('month', l_shipdate) AS month,
                CAST(sum(l_quantity) AS BIGINT) AS q
         FROM lineitem GROUP BY 1, 2),
       st AS (
         SELECT l_partkey, count(*)::BIGINT AS n_d, sum(q)::BIGINT AS s,
                sum(q::HUGEINT * q::HUGEINT) AS qq
         FROM md GROUP BY l_partkey),
       cls AS (
         SELECT l_partkey,
                CASE
                  WHEN 100 * months.t < 132 * n_d
                       AND 100 * (n_d::HUGEINT * qq - s::HUGEINT * s::HUGEINT)
                           < 49 * s::HUGEINT * s::HUGEINT THEN 'smooth'
                  WHEN 100 * months.t >= 132 * n_d
                       AND 100 * (n_d::HUGEINT * qq - s::HUGEINT * s::HUGEINT)
                           < 49 * s::HUGEINT * s::HUGEINT THEN 'intermittent'
                  WHEN 100 * months.t < 132 * n_d THEN 'erratic'
                  ELSE 'lumpy'
                END AS demand_class
         FROM st CROSS JOIN months)
       SELECT demand_class, count(*)::BIGINT AS n_parts
       FROM cls GROUP BY demand_class""",
)
def q_demand_classes(spark, sf_dir):
    """Syntetos-Boylan demand-pattern classification (IJF 2005): each
    part's monthly demand lands in the smooth / intermittent / erratic
    / lumpy quadrant by ADI (average inter-demand interval, months per
    demand-month) vs CV² of nonzero demand, with the canonical 1.32 /
    0.49 cutoffs — the router that decides Croston-style vs standard
    forecasting per SKU. BOTH boundary tests are exact integer
    cross-multiplications (100·T ≷ 132·n and 100(nQ−S²) ≷ 49·S²), so
    the quadrant assignment is bit-deterministic. One fact census, one
    part-grain pass, a 4-row class census."""
    dec = "decimal(38,0)"
    li = load_table(spark, sf_dir, "lineitem")
    t = li.select(F.date_trunc("month", "l_shipdate")).distinct().count()
    md = li.groupBy(
        "l_partkey", F.date_trunc("month", "l_shipdate").alias("month")
    ).agg(F.sum("l_quantity").cast("long").alias("q"))
    st = md.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_d"),
        F.sum("q").cast("long").alias("s"),
        F.sum(F.col("q").cast(dec) * F.col("q").cast(dec)).cast(dec).alias("qq"),
    )
    var_num = F.lit(100).cast(dec) * (
        F.col("n_d").cast(dec) * F.col("qq") - F.col("s").cast(dec) * F.col("s").cast(dec)
    )
    cv2_small = var_num < F.lit(49).cast(dec) * F.col("s").cast(dec) * F.col("s").cast(dec)
    adi_small = F.lit(100 * t) < 132 * F.col("n_d")
    cls = st.select(
        F.when(adi_small & cv2_small, "smooth")
        .when(~adi_small & cv2_small, "intermittent")
        .when(adi_small, "erratic")
        .otherwise("lumpy")
        .alias("demand_class")
    )
    return cls.groupBy("demand_class").agg(F.count(F.lit(1)).cast("long").alias("n_parts"))


_RBO_W = (0.1, 0.045, 0.027, 0.018225, 0.013122)  # (1-p)·p^(d-1)/d, p=0.9


def _rbo_sql() -> str:
    from pliers_spark.operators.ir import bm25_rerank_sql, bm25_topk_sql

    seeds = """seeds AS (
         SELECT doc_id, string_split(trim(text), ' ') AS t
         FROM documents ORDER BY doc_id LIMIT 8),
       queries AS (
         SELECT doc_id AS q_id, unnest(t[1:6]) AS term FROM seeds)"""
    xs = ", ".join(
        f"sum((ra <= {d} AND rb <= {d})::INT)::BIGINT AS x{d}" for d in range(1, 6)
    )
    ao = "(60 * x1 + 30 * x2 + 20 * x3 + 15 * x4 + 12 * x5)"
    rbo = " + ".join(f"{w} * x{d}" for d, w in enumerate(_RBO_W, 1))
    return f"""WITH la AS (
         SELECT q_id, doc_id, rank AS ra FROM (
           WITH {seeds}, {bm25_topk_sql(k=5)})),
       lb AS (
         SELECT q_id, doc_id, rank AS rb FROM (
           WITH {seeds}, {bm25_rerank_sql(k1=20, k=5)})),
       j AS (
         SELECT coalesce(la.q_id, lb.q_id) AS q_id,
                coalesce(la.ra, 99) AS ra, coalesce(lb.rb, 99) AS rb
         FROM la FULL JOIN lb ON la.q_id = lb.q_id AND la.doc_id = lb.doc_id),
       x AS (SELECT q_id, {xs} FROM j GROUP BY q_id)
       SELECT q_id, x5 AS overlap_at_5,
              round({ao}::DOUBLE / 300.0, 6) AS avg_overlap,
              round(({rbo})::DOUBLE, 6) AS rbo_min5
       FROM x"""


@query("rbo_rankings", _rbo_sql())
def q_rbo_rankings(spark, sf_dir):
    """Rank-biased overlap (depth-5 partial sum, p=0.9; Webber, Moffat
    & Zobel, TOIS 2010) plus Fagin average overlap between the LEXICAL
    BM25 top-5 and the SEMANTIC rerank top-5 for the same queries —
    the rank-agreement audit that says how much the dense stage
    actually changes the lexical ordering (RBO ≈ 1 means the reranker
    is a no-op; low RBO + good `mrr_recall` means it genuinely adds
    signal). Overlap counts X_d are exact ints per query; average
    overlap uses the exact common-denominator-60 integer sum; the RBO
    weights are shared Python literals applied in fixed expression
    order."""
    from pliers_spark.operators.ir import bm25_rerank, bm25_topk

    docs = _docs(spark, sf_dir)
    seeds = (
        docs.orderBy("doc_id").limit(8)
        .select(
            F.col("doc_id").alias("q_id"),
            F.explode(F.slice(T.tokenize(F.col("text")), 1, 6)).alias("term"),
        )
    )
    emb = load_table(spark, sf_dir, "embeddings")
    la = bm25_topk(docs, seeds, k=5).select("q_id", "doc_id", F.col("rank").alias("ra"))
    lb = bm25_rerank(docs, seeds, emb, k1=20, k=5).select(
        "q_id", "doc_id", F.col("rank").alias("rb")
    )
    j = la.join(lb, ["q_id", "doc_id"], "full").select(
        "q_id",
        F.coalesce("ra", F.lit(99)).alias("ra"),
        F.coalesce("rb", F.lit(99)).alias("rb"),
    )
    xs = [
        F.sum(((F.col("ra") <= d) & (F.col("rb") <= d)).cast("int")).cast("long").alias(f"x{d}")
        for d in range(1, 6)
    ]
    x = j.groupBy("q_id").agg(*xs)
    ao = (
        60 * F.col("x1") + 30 * F.col("x2") + 20 * F.col("x3")
        + 15 * F.col("x4") + 12 * F.col("x5")
    )
    rbo = sum(
        (F.lit(w) * F.col(f"x{d}") for d, w in enumerate(_RBO_W, 1)), F.lit(0.0)
    )
    return x.select(
        "q_id", F.col("x5").alias("overlap_at_5"),
        F.round(ao.cast("double") / F.lit(300.0), 6).alias("avg_overlap"),
        F.round(rbo, 6).alias("rbo_min5"),
    )


# --------------------------------------------------------------------------
# batch 51: Hurst exponent (R/S), Shapley channel attribution

_HURST_SCALES = (4, 8, 16)
import math as _math  # noqa: E402

_LN_SCALES = {s: round(_math.log(s), 9) for s in _HURST_SCALES}


def _hurst_sql() -> str:
    scale_rows = []
    blocks = []
    daily_bs = []
    for sc in _HURST_SCALES:
        daily_bs.append(
            f"daily_b_{sc} AS (SELECT ((rn - 1) // {sc})::BIGINT AS blk, rn, c FROM daily)"
        )
        blocks.append(f"""blk_{sc} AS (
         SELECT blk, c,
                sum(c) OVER (PARTITION BY blk ORDER BY rn) AS cum,
                row_number() OVER (PARTITION BY blk ORDER BY rn) AS t
         FROM daily_b_{sc}),
       st_{sc} AS (
         SELECT blk, count(*)::BIGINT AS n, sum(c)::BIGINT AS sm,
                sum(c::HUGEINT * c::HUGEINT) AS q
         FROM daily_b_{sc} GROUP BY blk),
       y_{sc} AS (
         SELECT b.blk, st.n, st.sm, st.q,
                st.n::HUGEINT * b.cum::HUGEINT - b.t::HUGEINT * st.sm::HUGEINT AS yn
         FROM blk_{sc} b JOIN st_{sc} st USING (blk) WHERE st.n = {sc}),
       rs_{sc} AS (
         SELECT blk,
                CAST(round(1000000.0 * (max(yn) - min(yn))::DOUBLE
                           / sqrt((max(n)::HUGEINT * max(q)
                                   - max(sm)::HUGEINT * max(sm)::HUGEINT)::DOUBLE))
                     AS BIGINT) AS rs_fp
         FROM y_{sc}
         GROUP BY blk
         HAVING max(n)::HUGEINT * max(q) - max(sm)::HUGEINT * max(sm)::HUGEINT > 0)""")
        scale_rows.append(f"""(
          SELECT {sc}::BIGINT AS scale, {_LN_SCALES[sc]}::DOUBLE AS ln_s,
                 count(*)::BIGINT AS n_blocks,
                 avg(rs_fp)::DOUBLE AS rs_mean_fp
          FROM rs_{sc})""")
    return (
        """WITH daily AS (
         SELECT date_trunc('day', ts)::TIMESTAMP AS day, count(*)::BIGINT AS c,
                row_number() OVER (ORDER BY date_trunc('day', ts)) AS rn
         FROM events GROUP BY date_trunc('day', ts)),
       """
        + ",\n       ".join(daily_bs)
        + ",\n       "
        + ",\n       ".join(blocks)
        + ",\n       pts AS ("
        + " UNION ALL ".join(scale_rows)
        + """),
       valid AS (SELECT * FROM pts WHERE n_blocks > 0 AND rs_mean_fp > 0),
       reg AS (
         SELECT count(*)::BIGINT AS k,
                sum(ln_s) AS sx, sum(ln(rs_mean_fp / 1000000.0)) AS sy,
                sum(ln_s * ln_s) AS sxx,
                sum(ln_s * ln(rs_mean_fp / 1000000.0)) AS sxy
         FROM valid)
       SELECT (SELECT count(*) FROM daily)::BIGINT AS n_days, reg.k AS n_scales,
              CASE WHEN reg.k >= 2 AND reg.k * sxx - sx * sx > 0
                   THEN round((reg.k * sxy - sx * sy) / (reg.k * sxx - sx * sx), 4)
              END AS hurst_h
       FROM reg"""
    )


@query("hurst_exponent", _hurst_sql())
def q_hurst_exponent(spark, sf_dir):
    """Hurst exponent via rescaled-range analysis (Hurst 1951;
    Mandelbrot & Wallis 1969): the global daily event-count series is
    cut into complete blocks at scales {4, 8, 16} days; per block,
    R/S = (max−min of cumulative deviations) / std — computed as the
    EXACT integer numerator n·cum − t·S over √(nQ−S²) so both engines
    produce identical micro-unit values — and H is the log-log OLS
    slope of mean R/S vs scale (literal ln-scale x values; 4dp — a
    3-point regression slope amplifies ulps). H ≈ 0.5 = memoryless,
    H > 0.5 = persistent trends (capacity forecasts must widen), the
    classic long-memory diagnostic. One daily census; per-scale block
    windows on the (tiny) day grain."""
    from pliers_spark.operators._util import epoch_micros  # noqa: F401

    ev = _events(spark, sf_dir)
    dec = "decimal(38,0)"
    daily = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .select("*", F.row_number().over(Window.orderBy("day")).alias("rn"))
        .localCheckpoint(eager=True)
    )
    n_days = daily.count()
    pts = []
    for s in _HURST_SCALES:
        blk = F.floor((F.col("rn") - 1) / s).cast("long").alias("blk")
        b = daily.select(blk, "rn", "c")
        wb = Window.partitionBy("blk").orderBy("rn")
        bb = b.select(
            "blk", "c",
            F.sum("c").over(wb.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
            F.row_number().over(wb).alias("t"),
        )
        st = b.groupBy("blk").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("c").cast("long").alias("sm"),
            F.sum(F.col("c").cast(dec) * F.col("c").cast(dec)).cast(dec).alias("q"),
        )
        y = bb.join(st, "blk").where(F.col("n") == s).select(
            "blk", "n", "sm", "q",
            (
                F.col("n").cast(dec) * F.col("cum").cast(dec)
                - F.col("t").cast(dec) * F.col("sm").cast(dec)
            ).alias("yn"),
        )
        var = F.max(F.col("n").cast(dec) * F.col("q") - F.col("sm").cast(dec) * F.col("sm").cast(dec))
        rs = (
            y.groupBy("blk")
            .agg(
                F.round(
                    F.lit(1e6)
                    * (F.max("yn") - F.min("yn")).cast("double")
                    / F.sqrt(var.cast("double")),
                    0,
                ).cast("long").alias("rs_fp"),
                var.alias("v"),
            )
            .where(F.col("v") > 0)
        )
        agg = rs.agg(
            F.lit(s).cast("long").alias("scale"),
            F.lit(_LN_SCALES[s]).alias("ln_s"),
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.avg("rs_fp").alias("rs_mean_fp"),
        )
        pts.append(agg)
    all_pts = pts[0]
    for p in pts[1:]:
        all_pts = all_pts.unionAll(p)
    valid = all_pts.where((F.col("n_blocks") > 0) & (F.col("rs_mean_fp") > 0))
    reg = valid.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ln_s").alias("sx"),
        F.sum(F.log(F.col("rs_mean_fp") / F.lit(1e6))).alias("sy"),
        F.sum(F.col("ln_s") * F.col("ln_s")).alias("sxx"),
        F.sum(F.col("ln_s") * F.log(F.col("rs_mean_fp") / F.lit(1e6))).alias("sxy"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    den = d_("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    return reg.select(
        F.lit(n_days).cast("long").alias("n_days"),
        F.col("k").alias("n_scales"),
        F.when(
            (F.col("k") >= 2) & (den > 0),
            F.round((d_("k") * F.col("sxy") - F.col("sx") * F.col("sy")) / den, 4),
        ).alias("hurst_h"),
    )


_FACT_SQL = "CASE {v} WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 6 WHEN 4 THEN 24 WHEN 5 THEN 120 WHEN 6 THEN 720 WHEN 7 THEN 5040 ELSE 40320 END"


@query(
    "shapley_attribution",
    f"""WITH fp AS (
         SELECT user_id, min(CASE WHEN event_type = 'purchase'
                                  THEN epoch_us(ts) END) AS p_u
         FROM events GROUP BY user_id),
       path AS (
         SELECT e.user_id,
                list_sort(list_distinct(list(e.event_type))) AS chans,
                max((fp.p_u IS NOT NULL)::INT)::INT AS converted
         FROM events e JOIN fp ON fp.user_id = e.user_id
         WHERE e.event_type <> 'purchase'
           AND (fp.p_u IS NULL OR epoch_us(e.ts) < fp.p_u)
         GROUP BY e.user_id),
       subsets AS (
         SELECT array_to_string(chans, ',') AS skey, len(chans)::BIGINT AS sz,
                chans,
                count(*)::BIGINT AS n_paths, sum(converted)::BIGINT AS n_conv
         FROM path GROUP BY chans),
       v AS (SELECT skey, sz, chans,
                    CAST(round(1000000.0 * n_conv / n_paths) AS BIGINT) AS v_fp
             FROM subsets),
       kk AS (SELECT count(DISTINCT event_type)::BIGINT AS k
              FROM events WHERE event_type <> 'purchase'),
       exploded AS (
         SELECT skey, sz, v_fp, unnest(chans) AS chan, chans FROM v),
       keyed AS (
         SELECT chan, sz, v_fp,
                array_to_string(list_sort(list_filter(chans, c -> c <> chan)), ',')
                  AS skey_minus
         FROM exploded),
       contrib AS (
         SELECT k2.chan, k2.sz,
                CAST(round(1000000.0
                     * (CASE (k2.sz - 1)::INT WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 6 WHEN 4 THEN 24 WHEN 5 THEN 120 WHEN 6 THEN 720 WHEN 7 THEN 5040 ELSE 40320 END)::DOUBLE
                     * (CASE (kk.k - k2.sz)::INT WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 6 WHEN 4 THEN 24 WHEN 5 THEN 120 WHEN 6 THEN 720 WHEN 7 THEN 5040 ELSE 40320 END)::DOUBLE
                     / (CASE kk.k::INT WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 6 WHEN 4 THEN 24 WHEN 5 THEN 120 WHEN 6 THEN 720 WHEN 7 THEN 5040 ELSE 40320 END)::DOUBLE) AS BIGINT) AS w_ppm,
                k2.v_fp - coalesce(vm.v_fp, 0) AS dv_fp
         FROM keyed k2
         LEFT JOIN v vm ON vm.skey = k2.skey_minus
         CROSS JOIN kk)
       SELECT chan AS channel,
              round(sum(w_ppm::HUGEINT * dv_fp::HUGEINT)::DOUBLE
                    / 1000000000000.0, 6) AS shapley_value
       FROM contrib GROUP BY chan""",
)
def q_shapley_attribution(spark, sf_dir):
    """Shapley-value channel attribution (Dalessandro et al. 2012 /
    Zhao, Mahboobi & Bagheri 2018): each user's pre-purchase channel
    SET is a coalition; v(S) = observed conversion rate of paths with
    exactly that set (0 for unobserved coalitions — the standard
    data-driven convention); each channel's credit is the exact
    Shapley sum Σ w(|S|)·(v(S) − v(S∖{{i}})) with w = (s−1)!(k−s)!/k!
    from a literal factorial table. Coalition values round once to ppm
    ints, weights round once to ppm ints, and the per-channel sum is
    exact integer arithmetic — the fair-division answer to 'which
    touchpoint deserves the conversion', replacing first/last-touch
    heuristics (`attribution`). The subset census is tiny (≤ 2^k rows
    for k event types) after one user-grain pass."""
    from pliers_spark.operators._util import epoch_micros

    ev = _events(spark, sf_dir)
    u = epoch_micros(ev, "ts")
    fp = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "purchase", u)).alias("p_u")
    )
    path = (
        ev.select("user_id", "event_type", u.alias("t_us"))
        .join(fp, "user_id")
        .where(
            (F.col("event_type") != "purchase")
            & (F.col("p_u").isNull() | (F.col("t_us") < F.col("p_u")))
        )
        .groupBy("user_id")
        .agg(
            F.array_sort(F.array_distinct(F.collect_list("event_type"))).alias("chans"),
            F.max(F.col("p_u").isNotNull().cast("int")).alias("converted"),
        )
    )
    subsets = path.groupBy("chans").agg(
        F.count(F.lit(1)).cast("long").alias("n_paths"),
        F.sum("converted").cast("long").alias("n_conv"),
    )
    v = subsets.select(
        F.concat_ws(",", "chans").alias("skey"),
        F.size("chans").cast("long").alias("sz"),
        "chans",
        F.round(F.lit(1e6) * F.col("n_conv") / F.col("n_paths"), 0).cast("long").alias("v_fp"),
    ).localCheckpoint(eager=True)  # both sides of the coalition lookup
    k = (
        ev.where(F.col("event_type") != "purchase")
        .select("event_type").distinct().count()
    )
    fact = [1, 1, 2, 6, 24, 120, 720, 5040, 40320]

    def w_ppm(sz: int) -> int:
        return round(1e6 * fact[sz - 1] * fact[k - sz] / fact[k])

    wmap = F.create_map(*[F.lit(x) for s in range(1, k + 1) for x in (s, w_ppm(s))])
    exploded = v.select(
        "skey", "sz", "v_fp", F.explode("chans").alias("chan"), "chans"
    ).select(
        "chan", "sz", "v_fp",
        F.concat_ws(
            ",", F.filter("chans", lambda c: c != F.col("chan"))
        ).alias("skey_minus"),
    )
    vm = v.select(F.col("skey").alias("skey_minus"), F.col("v_fp").alias("vm_fp"))
    dec = "decimal(38,0)"
    contrib = exploded.join(vm, "skey_minus", "left").select(
        "chan",
        wmap[F.col("sz")].cast("long").alias("w_ppm"),
        (F.col("v_fp") - F.coalesce("vm_fp", F.lit(0))).alias("dv_fp"),
    )
    return contrib.groupBy(F.col("chan").alias("channel")).agg(
        F.round(
            F.sum(F.col("w_ppm").cast(dec) * F.col("dv_fp").cast(dec)).cast("double")
            / F.lit(1e12),
            6,
        ).alias("shapley_value")
    )


# --------------------------------------------------------------------------
# batch 52: hub-removal resilience, split leakage audit, Breusch-Pagan

@query(
    "hub_resilience",
    """WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       sized AS (SELECT l_orderkey FROM op GROUP BY l_orderkey
                 HAVING count(*) BETWEEN 2 AND 20),
       b AS (SELECT op.* FROM op JOIN sized USING (l_orderkey)),
       e AS (
         SELECT DISTINCT a.l_partkey AS u, bb.l_partkey AS v
         FROM b a JOIN b bb ON a.l_orderkey = bb.l_orderkey
                           AND a.l_partkey < bb.l_partkey),
       sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
       deg AS (SELECT a AS node, count(*)::BIGINT AS d FROM sym GROUP BY a),
       hubs AS (SELECT node FROM deg ORDER BY d DESC, node LIMIT 10),
       e2 AS (
         SELECT e.u, e.v FROM e
         WHERE NOT EXISTS (SELECT 1 FROM hubs h WHERE h.node = e.u)
           AND NOT EXISTS (SELECT 1 FROM hubs h WHERE h.node = e.v)),
       edges1 AS (SELECT u AS src, v AS dst FROM e
                  UNION SELECT v, u FROM e),
       r1(node, peer) AS (
         SELECT src, src FROM edges1
         UNION SELECT r.node, g.dst FROM r1 r JOIN edges1 g ON r.peer = g.src),
       cc1 AS (SELECT node, min(peer) AS cid FROM r1 GROUP BY node),
       g1 AS (SELECT max(cnt)::BIGINT AS giant FROM
              (SELECT cid, count(*) AS cnt FROM cc1 GROUP BY cid)),
       edges2 AS (SELECT u AS src, v AS dst FROM e2
                  UNION SELECT v, u FROM e2),
       r2(node, peer) AS (
         SELECT src, src FROM edges2
         UNION SELECT r.node, g.dst FROM r2 r JOIN edges2 g ON r.peer = g.src),
       cc2 AS (SELECT node, min(peer) AS cid FROM r2 GROUP BY node),
       g2 AS (SELECT coalesce(max(cnt), 0)::BIGINT AS giant FROM
              (SELECT cid, count(*) AS cnt FROM cc2 GROUP BY cid))
       SELECT (SELECT count(*) FROM deg)::BIGINT AS n_nodes,
              (SELECT count(*) FROM e)::BIGINT AS n_edges,
              g1.giant AS giant_before,
              (SELECT count(*) FROM e2)::BIGINT AS edges_after,
              g2.giant AS giant_after,
              round(g2.giant::DOUBLE / g1.giant::DOUBLE, 6) AS giant_retention
       FROM g1 CROSS JOIN g2""",
)
def q_hub_resilience(spark, sf_dir):
    """Attack-tolerance audit (Albert, Jeong & Barabási, Nature 2000):
    delete the 10 highest-degree hubs from the co-purchase graph and
    measure how much of the giant connected component survives —
    scale-free graphs shatter under targeted hub removal while staying
    robust to random failure, and giant_retention is the one number
    that says which regime this graph is in (and how exposed any
    hub-dependent pipeline is). Two CC runs (pointer-jumping operator)
    on the full and hub-removed edge lists; hub selection is a
    distributed top-k; all counts exact."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        op.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("bs"))
        .where((F.col("bs") >= 2) & (F.col("bs") <= 20)).select("l_orderkey")
    )
    b = op.join(sized, "l_orderkey")
    e = (
        b.alias("x").join(b.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("u"), F.col("y.l_partkey").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d")).withColumnRenamed("u", "node")
    hubs = deg.orderBy(F.desc("d"), "node").limit(10).select("node").localCheckpoint(eager=True)
    e2 = (
        e.join(hubs.withColumnRenamed("node", "u"), "u", "left_anti")
        .join(hubs.withColumnRenamed("node", "v"), "v", "left_anti")
        .select("u", "v")
        .localCheckpoint(eager=True)
    )
    def giant(edges_df):
        if edges_df.limit(1).count() == 0:
            return 0
        cc = D.connected_components(edges_df.select(F.col("u").alias("id_a"), F.col("v").alias("id_b")))
        return (
            cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("c"))
            .agg(F.max("c")).collect()[0][0]
        )
    g1 = giant(e)
    g2 = giant(e2)
    n_nodes = deg.count()
    n_edges = e.count()
    edges_after = e2.count()
    return spark.createDataFrame(
        [(n_nodes, n_edges, g1, edges_after, g2, round(g2 / g1, 6) if g1 else None)],
        "n_nodes long, n_edges long, giant_before long, edges_after long, "
        "giant_after long, giant_retention double",
    )


def _split_leak_sql() -> str:
    return f"""WITH {_simhash_pairs_cte()},
       assign AS (
         SELECT doc_id,
                CASE WHEN ({md5_int_sql('text', seed=13)}) % 100 < 80 THEN 'train'
                     WHEN ({md5_int_sql('text', seed=13)}) % 100 < 90 THEN 'val'
                     ELSE 'test' END AS split_content,
                CASE WHEN ({md5_int_sql('CAST(doc_id AS VARCHAR)', seed=13)}) % 100 < 80
                          THEN 'train'
                     WHEN ({md5_int_sql('CAST(doc_id AS VARCHAR)', seed=13)}) % 100 < 90
                          THEN 'val'
                     ELSE 'test' END AS split_id
         FROM documents),
       j AS (
         SELECT p.id_a, p.id_b,
                a.split_content AS ca, b.split_content AS cb,
                a.split_id AS ia, b.split_id AS ib
         FROM nd_pairs p
         JOIN assign a ON a.doc_id = p.id_a
         JOIN assign b ON b.doc_id = p.id_b)
       SELECT 'content_hash' AS scheme, count(*)::BIGINT AS n_pairs,
              sum((ca <> cb)::INT)::BIGINT AS n_straddle,
              round(sum((ca <> cb)::INT)::DOUBLE / count(*), 6) AS straddle_rate
       FROM j
       UNION ALL
       SELECT 'id_hash', count(*)::BIGINT,
              sum((ia <> ib)::INT)::BIGINT,
              round(sum((ia <> ib)::INT)::DOUBLE / count(*), 6)
       FROM j"""


@query("split_leakage_audit", _split_leak_sql())
def q_split_leakage_audit(spark, sf_dir):
    """Train/test leakage audit over NEAR-duplicate pairs: for every
    SimHash near-dup pair, does the pair straddle splits under (a) the
    engine's content-hash assignment (`split_assign` — exact dups
    provably co-located, near-dups mostly so since identical text
    hashes identically) vs (b) a naive id-hash split (near-dups land
    independently ⇒ ≈2·p(1−p) straddle). The side-by-side rate is the
    evidence that the leak-proof split discipline actually buys leak
    reduction — the audit Lee et al. 2022 argue every dedup-aware
    eval needs. One pair list (banded, never all-pairs) joined twice
    to the doc-grain assignment."""
    docs = _docs(spark, sf_dir)
    pairs = D.simhash_near_dup_pairs(
        docs, "text", "doc_id", bits=_SIMHASH_BITS, bands=4, max_hamming=3
    ).select("id_a", "id_b")
    bc = F.pmod(md5_int(F.col("text"), seed=13), F.lit(100))
    bi = F.pmod(md5_int(F.col("doc_id").cast("string"), seed=13), F.lit(100))
    def split(b):
        return F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    assign = docs.select(
        "doc_id", split(bc).alias("sc"), split(bi).alias("si")
    ).localCheckpoint(eager=True)
    j = (
        pairs.join(assign.select(F.col("doc_id").alias("id_a"),
                                 F.col("sc").alias("ca"), F.col("si").alias("ia")), "id_a")
        .join(assign.select(F.col("doc_id").alias("id_b"),
                            F.col("sc").alias("cb"), F.col("si").alias("ib")), "id_b")
        .localCheckpoint(eager=True)
    )
    def row(scheme, a, bcol):
        return j.agg(
            F.lit(scheme).alias("scheme"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum((F.col(a) != F.col(bcol)).cast("int")).cast("long").alias("n_straddle"),
            F.round(
                F.sum((F.col(a) != F.col(bcol)).cast("int")).cast("double") / F.count(F.lit(1)), 6
            ).alias("straddle_rate"),
        ).select("scheme", "n_pairs", "n_straddle", "straddle_rate")
    return row("content_hash", "ca", "cb").unionAll(row("id_hash", "ia", "ib"))


@query(
    "heteroscedasticity_bp",
    """WITH f AS (
         SELECT len(string_split(trim(text), ' '))::BIGINT AS x,
                n_chars::BIGINT AS y
         FROM documents),
       s1 AS (
         SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                sum(x::HUGEINT * x::HUGEINT) AS sxx,
                sum(x::HUGEINT * y::HUGEINT) AS sxy
         FROM f),
       coef AS (
         SELECT n, sx, sxx,
                (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                  / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) AS b,
                (sy::DOUBLE - (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                              / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                              * sx::DOUBLE) / n::DOUBLE AS a
         FROM s1),
       e2 AS (
         SELECT f.x,
                CAST(round((f.y::DOUBLE - coef.a - coef.b * f.x::DOUBLE)
                           * (f.y::DOUBLE - coef.a - coef.b * f.x::DOUBLE)) AS BIGINT)
                  AS e2_fp
         FROM f CROSS JOIN coef),
       s2 AS (
         SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                sum(e2_fp)::HUGEINT AS sy,
                sum(x::HUGEINT * x::HUGEINT) AS sxx,
                sum(x::HUGEINT * e2_fp::HUGEINT) AS sxy,
                sum(e2_fp::HUGEINT * e2_fp::HUGEINT) AS syy
         FROM e2)
       SELECT n,
              round((SELECT b FROM coef), 6) AS slope,
              CASE WHEN (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) > 0
                    AND (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) > 0
                   THEN round(n::DOUBLE
                        * (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                        * (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                        / ((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                           * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 4)
              END AS lm_stat
       FROM s2""",
)
def q_heteroscedasticity_bp(spark, sf_dir):
    """Breusch-Pagan heteroscedasticity test (Econometrica 1979) on the
    chars ~ tokens regression: squared OLS residuals regressed on the
    predictor; LM = n·R² ~ χ²(1) under homoscedasticity — the audit
    that says whether per-group variance modeling (or robust SEs) is
    needed before trusting the fit's intervals. First-pass sufficient
    stats are exact ints; residual squares round ONCE per row to
    integer units (the doubles a, b are the identical expression on
    both engines) so second-pass sums are exact; LM rounds at 4dp
    (quotient of near-collinear moments)."""
    d = _docs(spark, sf_dir)
    dec = "decimal(38,0)"
    f = d.select(
        F.size(T.tokenize(F.col("text"))).cast("long").alias("x"),
        F.col("n_chars").cast("long").alias("y"),
    ).localCheckpoint(eager=True)  # two passes
    s1 = f.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).cast(dec).alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).cast(dec).alias("sxy"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    bnum = d_("n") * d_("sxy") - d_("sx") * d_("sy")
    bden = d_("n") * d_("sxx") - d_("sx") * d_("sx")
    coef = s1.select(
        "n", (bnum / bden).alias("b"),
        ((d_("sy") - bnum / bden * d_("sx")) / d_("n")).alias("a"),
    )
    e2 = f.crossJoin(F.broadcast(coef)).select(
        "x",
        F.round(
            (d_("y") - F.col("a") - F.col("b") * d_("x"))
            * (d_("y") - F.col("a") - F.col("b") * d_("x")),
            0,
        ).cast("long").alias("e2_fp"),
        "b",
    )
    s2 = e2.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("e2_fp").cast(dec).alias("sy2"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).cast(dec).alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("e2_fp").cast(dec)).cast(dec).alias("sxy2"),
        F.sum(F.col("e2_fp").cast(dec) * F.col("e2_fp").cast(dec)).cast(dec).alias("syy"),
        F.first("b").alias("b"),
    )
    vx = d_("n") * d_("sxx") - d_("sx") * d_("sx")
    vy = d_("n") * d_("syy") - d_("sy2") * d_("sy2")
    cv = d_("n") * d_("sxy2") - d_("sx") * d_("sy2")
    return s2.select(
        "n",
        F.round(F.col("b"), 6).alias("slope"),
        F.when((vx > 0) & (vy > 0), F.round(d_("n") * cv * cv / (vx * vy), 4)).alias("lm_stat"),
    )


# --------------------------------------------------------------------------
# batch 53: leave-one-out source value, embedding isotropy, MATTR diversity

def _loo_sql() -> str:
    return f"""WITH q AS (SELECT * FROM ({_QUALITY_ORACLE}) t),
       qs AS (
         SELECT d.source, CAST(round(q.quality * 1000000.0) AS BIGINT) AS q_fp
         FROM documents d JOIN q ON q.doc_id = d.doc_id),
       per AS (SELECT source, count(*)::BIGINT AS n, sum(q_fp)::BIGINT AS s
               FROM qs GROUP BY source),
       tot AS (SELECT sum(n)::BIGINT AS nn, sum(s)::BIGINT AS ss FROM per)
       SELECT source, n AS n_docs,
              round(ss::DOUBLE / nn / 1000000.0, 6) AS mean_with,
              round((ss - s)::DOUBLE / (nn - n) / 1000000.0, 6) AS mean_without,
              round((ss::DOUBLE / nn - (ss - s)::DOUBLE / (nn - n)) / 1000000.0, 6)
                AS contribution
       FROM per CROSS JOIN tot WHERE nn > n"""


@query("loo_source_value", _loo_sql())
def q_loo_source_value(spark, sf_dir):
    """Leave-one-out source valuation (the cheapest member of the data-
    valuation family; the LOO baseline data-Shapley papers compare
    against): each source's contribution = corpus mean quality WITH it
    minus WITHOUT it — computed purely from per-source sufficient
    stats, so valuing S sources costs ONE census, not S recomputations
    (the algebraic trick that makes this viable at 100 TB). Positive
    contribution = the source pulls the corpus up; feeds the same
    decisions as `doremi_step` with an ablation framing. Quality is
    6dp-rounded per doc so the micro-unit sums are exact; two
    divisions per source row."""
    d = _docs(spark, sf_dir)
    qs = d.select(
        "source", F.round(T.quality_score("text") * F.lit(1e6), 0).cast("long").alias("q_fp")
    )
    per = qs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("q_fp").cast("long").alias("s")
    )
    tot = per.agg(F.sum("n").cast("long").alias("nn"), F.sum("s").cast("long").alias("ss"))
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    with_ = d_("ss") / d_("nn")
    without = (d_("ss") - d_("s")) / (d_("nn") - d_("n"))
    return (
        per.crossJoin(F.broadcast(tot))
        .where(F.col("nn") > F.col("n"))
        .select(
            "source", F.col("n").alias("n_docs"),
            F.round(with_ / F.lit(1e6), 6).alias("mean_with"),
            F.round(without / F.lit(1e6), 6).alias("mean_without"),
            F.round((with_ - without) / F.lit(1e6), 6).alias("contribution"),
        )
    )


@query(
    "embedding_isotropy",
    f"""WITH pairs AS (
         SELECT CAST(round(round({_DOT_SQL} / ({_NORM_A} * {_NORM_Q}), 6)
                     * 1000000.0) AS BIGINT) AS cos_fp
         FROM embeddings a JOIN embeddings q
           ON a.label = q.label AND a.vec_id < q.vec_id),
       norms AS (
         SELECT CAST(round(1000000.0 *
                sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))))
                AS BIGINT) AS nrm_fp
         FROM embeddings),
       ns AS (
         SELECT count(*)::BIGINT AS n, sum(nrm_fp)::BIGINT AS s,
                sum(nrm_fp::HUGEINT * nrm_fp::HUGEINT) AS q2
         FROM norms),
       ps AS (
         SELECT count(*)::BIGINT AS n_pairs,
                sum(cos_fp)::BIGINT AS sc, sum(abs(cos_fp))::BIGINT AS sa
         FROM pairs)
       SELECT ns.n AS n_vecs, ps.n_pairs,
              round(ps.sc::DOUBLE / ps.n_pairs / 1000000.0, 6) AS mean_cosine,
              round(ps.sa::DOUBLE / ps.n_pairs / 1000000.0, 6) AS mean_abs_cosine,
              round(sqrt(ns.q2::DOUBLE / ns.n - (ns.s::DOUBLE / ns.n) * (ns.s::DOUBLE / ns.n))
                    / (ns.s::DOUBLE / ns.n), 6) AS norm_cv
       FROM ns CROSS JOIN ps""",
)
def q_embedding_isotropy(spark, sf_dir):
    """Embedding-space isotropy audit (Ethayarajh, EMNLP 2019; Mu &
    Viswanath's common-direction observation): the mean pairwise cosine
    within buckets (≫ 0 means a dominant common direction is eating the
    representation — cosine similarities stop being informative) and
    the coefficient of variation of vector norms (hub-norm pathology).
    These two numbers decide whether to mean-center / whiten before
    `semantic_dedup`/`mutual_knn` trust cosine at all. Pair scoring is
    the bucket-gated join (never all-pairs across buckets); cosines and
    norms round once to micro-units so all sums are exact."""
    from pliers_spark.operators.similarity import _dot, _norm  # reuse exact exprs

    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"), "label")
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"), "label")
    pairs = (
        a.join(b, "label")
        .where(F.col("ia") < F.col("ib"))
        .select(
            F.round(
                F.round(_dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb"))), 6)
                * F.lit(1e6),
                0,
            ).cast("long").alias("cos_fp")
        )
    )
    norms = emb.select(
        F.round(F.lit(1e6) * _norm(F.col("embedding")), 0).cast("long").alias("nrm_fp")
    )
    dec = "decimal(38,0)"
    ns = norms.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("nrm_fp").cast("long").alias("s"),
        F.sum(F.col("nrm_fp").cast(dec) * F.col("nrm_fp").cast(dec)).cast(dec).alias("q2"),
    )
    ps = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("cos_fp").cast("long").alias("sc"),
        F.sum(F.abs("cos_fp")).cast("long").alias("sa"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    mu = d_("s") / d_("n")
    return ns.crossJoin(ps).select(
        F.col("n").alias("n_vecs"), "n_pairs",
        F.round(d_("sc") / d_("n_pairs") / F.lit(1e6), 6).alias("mean_cosine"),
        F.round(d_("sa") / d_("n_pairs") / F.lit(1e6), 6).alias("mean_abs_cosine"),
        F.round(F.sqrt(d_("q2") / d_("n") - mu * mu) / mu, 6).alias("norm_cv"),
    )


_MATTR_W = 25


@query(
    "mattr_diversity",
    f"""WITH toks AS (
         SELECT doc_id, t.token, t.pos::BIGINT AS pos,
                count(*) OVER (PARTITION BY doc_id) AS n
         FROM (SELECT doc_id,
                      unnest(string_split(trim(text), ' ')) AS token,
                      generate_subscripts(string_split(trim(text), ' '), 1) - 1 AS pos
               FROM documents) t(doc_id, token, pos)),
       eligible AS (SELECT * FROM toks WHERE n >= {_MATTR_W}),
       starts AS (
         SELECT DISTINCT doc_id, s.st::BIGINT AS st
         FROM (SELECT doc_id, max(n)::BIGINT AS n FROM eligible GROUP BY doc_id) d,
              LATERAL (SELECT unnest(range(d.n - {_MATTR_W} + 1)) AS st) s),
       win AS (
         SELECT st.doc_id, st.st, count(DISTINCT e.token)::BIGINT AS types
         FROM starts st
         JOIN eligible e ON e.doc_id = st.doc_id
                        AND e.pos >= st.st AND e.pos < st.st + {_MATTR_W}
         GROUP BY st.doc_id, st.st)
       SELECT doc_id, count(*)::BIGINT AS n_windows,
              round(sum(types)::DOUBLE / (count(*) * {_MATTR_W}.0), 6) AS mattr
       FROM win GROUP BY doc_id""",
)
def q_mattr_diversity(spark, sf_dir):
    """MATTR moving-average type-token ratio (Covington & McFall, JQL
    2010): lexical diversity per document as the mean TTR over every
    {_MATTR_W}-token sliding window — unlike raw TTR it doesn't shrink
    with document length, so it is the comparable diversity feature
    quality classifiers actually use (degenerate/repetitive text scores
    low regardless of length). Window membership is a positional
    band join per doc (bounded: ≤ n windows × w rows per doc — cap
    window count per doc at scale exactly like the mann_kendall pair
    gate); type counts and the final mean are exact, one division."""
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.posexplode(T.tokenize(F.col("text"))).alias("pos", "token")
    ).select(
        "doc_id", "token", F.col("pos").cast("long").alias("pos"),
        F.count(F.lit(1)).over(Window.partitionBy("doc_id")).alias("n"),
    )
    eligible = toks.where(F.col("n") >= _MATTR_W).localCheckpoint(eager=True)
    doc_n = eligible.groupBy("doc_id").agg(F.max("n").cast("long").alias("n"))
    starts = doc_n.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.col("n") - _MATTR_W)).alias("st"),
    )
    win = (
        starts.join(eligible, "doc_id")
        .where((F.col("pos") >= F.col("st")) & (F.col("pos") < F.col("st") + _MATTR_W))
        .groupBy("doc_id", "st")
        .agg(F.count_distinct("token").cast("long").alias("types"))
    )
    return win.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.round(F.sum("types").cast("double") / (F.count(F.lit(1)) * F.lit(float(_MATTR_W))), 6).alias("mattr"),
    )


# --------------------------------------------------------------------------
# batch 54: Moore-Lewis CED selection, OOV-rate audit

def _moore_lewis_sql(vocab_size: int = 1000) -> str:
    return f"""WITH base AS (
         SELECT doc_id, lang, string_split(trim(text), ' ') AS toks FROM documents),
       census AS (
         SELECT t AS w, count(*)::BIGINT AS c
         FROM (SELECT unnest(toks) AS t FROM base) GROUP BY t),
       vocab AS (SELECT w FROM census ORDER BY c DESC, w LIMIT {vocab_size}),
       nv AS (SELECT count(*)::BIGINT AS n_vocab FROM vocab),
       bi AS (
         SELECT b.doc_id, b.lang,
                CASE WHEN v1.w IS NULL THEN '<unk>' ELSE w1r END AS w1,
                CASE WHEN v2.w IS NULL THEN '<unk>' ELSE w2r END AS w2
         FROM (SELECT doc_id, lang,
                      unnest(toks[1:len(toks)-1]) AS w1r,
                      unnest(toks[2:len(toks)]) AS w2r
               FROM base) b
         LEFT JOIN vocab v1 ON b.w1r = v1.w
         LEFT JOIN vocab v2 ON b.w2r = v2.w),
       gen AS (SELECT w1, w2, count(*)::BIGINT AS cb FROM bi GROUP BY w1, w2),
       genc AS (SELECT w1, sum(cb)::BIGINT AS cw FROM gen GROUP BY w1),
       ind AS (SELECT w1, w2, count(*)::BIGINT AS cb FROM bi WHERE lang = 'en'
               GROUP BY w1, w2),
       indc AS (SELECT w1, sum(cb)::BIGINT AS cw FROM ind GROUP BY w1),
       scored AS (
         SELECT bi.doc_id,
                CAST(round(ln((coalesce(i.cb, 0) + 1)::DOUBLE
                              / (coalesce(ic.cw, 0) + nv.n_vocab + 1)::DOUBLE) * 1e6)
                     AS BIGINT)
                - CAST(round(ln((g.cb + 1)::DOUBLE
                                / (gc.cw + nv.n_vocab + 1)::DOUBLE) * 1e6)
                       AS BIGINT) AS ced_unats
         FROM bi
         JOIN gen g USING (w1, w2) JOIN genc gc USING (w1)
         LEFT JOIN ind i ON i.w1 = bi.w1 AND i.w2 = bi.w2
         LEFT JOIN indc ic ON ic.w1 = bi.w1
         CROSS JOIN nv)
       SELECT doc_id, count(*)::BIGINT AS n_bigrams,
              round(sum(ced_unats)::DOUBLE / count(*) / 1000000.0, 6) AS ced,
              (sum(ced_unats) > 0) AS selected
       FROM scored GROUP BY doc_id"""


@query("moore_lewis", _moore_lewis_sql())
def q_moore_lewis(spark, sf_dir):
    """Moore-Lewis cross-entropy-difference data selection (ACL 2010 —
    the canonical pick-what-looks-in-domain method, still the baseline
    every data-selection paper fights): per document, the average
    bigram log-prob under the IN-DOMAIN model (lang='en' slice) minus
    under the GENERAL model (whole corpus), both add-one-smoothed over
    a shared top-1000 vocabulary; positive CED = more in-domain-like
    than average, selected. Both models' per-TYPE log-probs round once
    to micro-nats (lm_score's discipline) so per-doc sums are exact;
    the shared mapped-bigram table is built ONCE and feeds both model
    censuses and the scoring join."""
    from pliers_spark.operators.lm import UNK, _mapped_bigrams

    d = _docs(spark, sf_dir)
    tok_census = (
        d.select(F.explode(T.tokenize(F.col("text"))).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = (
        tok_census.orderBy(F.desc("c"), F.asc("w")).limit(1000)
        .select("w").localCheckpoint(eager=True)
    )
    n_vocab = vocab.count()
    bg = (
        _mapped_bigrams(d, vocab, "text", "doc_id")
        .join(d.select("doc_id", "lang"), "doc_id")
        .localCheckpoint(eager=True)  # feeds both models AND scoring
    )
    gen = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("g_cb"))
    genc = gen.groupBy("w1").agg(F.sum("g_cb").cast("long").alias("g_cw"))
    ind = bg.where(F.col("lang") == "en").groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("i_cb")
    )
    indc = ind.groupBy("w1").agg(F.sum("i_cb").cast("long").alias("i_cw"))
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    lp_in = F.round(
        F.log(
            (F.coalesce("i_cb", F.lit(0)) + 1).cast("double")
            / (F.coalesce("i_cw", F.lit(0)) + n_vocab + 1).cast("double")
        ) * F.lit(1e6), 0,
    ).cast("long")
    lp_gen = F.round(
        F.log((F.col("g_cb") + 1).cast("double") / (F.col("g_cw") + n_vocab + 1).cast("double"))
        * F.lit(1e6), 0,
    ).cast("long")
    scored = (
        bg.join(F.broadcast(gen), ["w1", "w2"])
        .join(F.broadcast(genc), "w1")
        .join(F.broadcast(ind), ["w1", "w2"], "left")
        .join(F.broadcast(indc), "w1", "left")
        .select("doc_id", (lp_in - lp_gen).alias("ced_unats"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.sum("ced_unats").cast("double") / F.count(F.lit(1)) / F.lit(1e6), 6).alias("ced"),
        (F.sum("ced_unats") > 0).alias("selected"),
    )


@query(
    "oov_rate",
    """WITH census AS (
         SELECT u AS w, count(*)::BIGINT AS c
         FROM (SELECT unnest(string_split(trim(text), ' ')) AS u FROM documents)
         GROUP BY u),
       vocab AS (SELECT w FROM census ORDER BY c DESC, w LIMIT 1000),
       toks AS (
         SELECT source, unnest(string_split(trim(text), ' ')) AS w FROM documents)
       SELECT source, count(*)::BIGINT AS n_tokens,
              sum((vocab.w IS NULL)::INT)::BIGINT AS n_oov,
              round(sum((vocab.w IS NULL)::INT)::DOUBLE / count(*), 6) AS oov_rate
       FROM toks LEFT JOIN vocab ON vocab.w = toks.w
       GROUP BY source""",
)
def q_oov_rate(spark, sf_dir):
    """Out-of-vocabulary rate per source against the global top-1000
    vocabulary — the cheapest domain-shift alarm (a source whose OOV
    rate spikes will inflate `token_fertility`, starve `dictionary_
    lookup`, and break fixed-vocab models). One global census for the
    vocab (distributed top-k), one broadcast left join over the token
    stream, exact counts and one division per source."""
    d = _docs(spark, sf_dir)
    census = (
        d.select(F.explode(T.tokenize(F.col("text"))).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = census.orderBy(F.desc("c"), F.asc("w")).limit(1000).select(
        "w", F.lit(1).alias("in_v")
    )
    toks = d.select("source", F.explode(T.tokenize(F.col("text"))).alias("w"))
    j = toks.join(F.broadcast(vocab), "w", "left")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.col("in_v").isNull().cast("int")).cast("long").alias("n_oov"),
        F.round(F.sum(F.col("in_v").isNull().cast("int")).cast("double") / F.count(F.lit(1)), 6).alias("oov_rate"),
    )


# --------------------------------------------------------------------------
# batch 55: Haar wavelet energy, Freedman-Diaconis binning, PACF(2)

@query(
    "haar_energy",
    """WITH daily AS (
         SELECT count(*)::BIGINT AS c,
                row_number() OVER (ORDER BY date_trunc('day', ts)) AS rn
         FROM events GROUP BY date_trunc('day', ts)),
       l0 AS (SELECT rn, c FROM daily WHERE rn <= 16),
       l1 AS (
         SELECT ((rn - 1) // 2)::BIGINT AS blk,
                sum(CASE WHEN rn % 2 = 1 THEN c ELSE -c END)::BIGINT AS d,
                sum(c)::BIGINT AS s
         FROM l0 GROUP BY 1),
       l2 AS (
         SELECT (blk // 2)::BIGINT AS blk,
                sum(CASE WHEN blk % 2 = 0 THEN s ELSE -s END)::BIGINT AS d,
                sum(s)::BIGINT AS s
         FROM l1 GROUP BY 1),
       l3 AS (
         SELECT (blk // 2)::BIGINT AS blk,
                sum(CASE WHEN blk % 2 = 0 THEN s ELSE -s END)::BIGINT AS d,
                sum(s)::BIGINT AS s
         FROM l2 GROUP BY 1)
       SELECT 1::BIGINT AS level, count(*)::BIGINT AS n_coeffs,
              sum(d::HUGEINT * d::HUGEINT)::BIGINT AS energy FROM l1
       UNION ALL
       SELECT 2, count(*), sum(d::HUGEINT * d::HUGEINT)::BIGINT FROM l2
       UNION ALL
       SELECT 3, count(*), sum(d::HUGEINT * d::HUGEINT)::BIGINT FROM l3""",
)
def q_haar_energy(spark, sf_dir):
    """Haar wavelet energy spectrum over the first 16 days of the daily
    event-count series: level-ℓ detail coefficients are differences of
    adjacent 2^(ℓ−1)-day block sums, and the per-level energy Σd² says
    WHERE the variance lives — day-to-day jitter (level 1) vs weekly-ish
    swells (level 3) — the multi-resolution twin of `seasonality_
    strength` that needs no period guess. Unnormalized Haar keeps
    every coefficient an exact integer (sums and differences of
    counts), so energies are exact; each level is one tiny grouped agg
    over the previous level's 16→8→4→2 rows."""
    ev = _events(spark, sf_dir)
    daily = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .select("c", F.row_number().over(Window.orderBy("day")).alias("rn"))
        .where(F.col("rn") <= 16)
    )
    dec = "decimal(38,0)"
    l1 = daily.groupBy(F.floor((F.col("rn") - 1) / 2).cast("long").alias("blk")).agg(
        F.sum(F.when(F.col("rn") % 2 == 1, F.col("c")).otherwise(-F.col("c"))).cast("long").alias("d"),
        F.sum("c").cast("long").alias("s"),
    ).localCheckpoint(eager=True)
    def up(prev):
        return prev.groupBy(F.floor(F.col("blk") / 2).cast("long").alias("blk")).agg(
            F.sum(F.when(F.col("blk") % 2 == 0, F.col("s")).otherwise(-F.col("s"))).cast("long").alias("d"),
            F.sum("s").cast("long").alias("s"),
        ).localCheckpoint(eager=True)
    l2 = up(l1)
    l3 = up(l2)
    def row(lv, df):
        return df.agg(
            F.lit(lv).cast("long").alias("level"),
            F.count(F.lit(1)).cast("long").alias("n_coeffs"),
            F.sum(F.col("d").cast(dec) * F.col("d").cast(dec)).cast("long").alias("energy"),
        ).select("level", "n_coeffs", "energy")
    return row(1, l1).unionAll(row(2, l2)).unionAll(row(3, l3))


@query(
    "fd_binning",
    """WITH v AS (
         SELECT CAST(round(o_totalprice * 100.0) AS BIGINT) AS x, o_orderkey
         FROM orders),
       r AS (SELECT x, row_number() OVER (ORDER BY x, o_orderkey) AS rn,
                    count(*) OVER () AS n FROM v),
       qs AS (
         SELECT max(n)::BIGINT AS n,
                max(CASE WHEN rn <= CAST(ceil(0.25 * max_n) AS BIGINT) THEN x END)::BIGINT AS q1,
                max(CASE WHEN rn <= CAST(ceil(0.75 * max_n) AS BIGINT) THEN x END)::BIGINT AS q3,
                min(x)::BIGINT AS mn, max(x)::BIGINT AS mx
         FROM (SELECT *, max(n) OVER () AS max_n FROM r))
       SELECT n, (q3 - q1)::BIGINT AS iqr_fp,
              round(2.0 * (q3 - q1)::DOUBLE / pow(n::DOUBLE, 1.0 / 3.0), 4) AS width_fp,
              CAST(ceil((mx - mn)::DOUBLE
                        / (2.0 * (q3 - q1)::DOUBLE / pow(n::DOUBLE, 1.0 / 3.0)))
                   AS BIGINT) AS n_bins
       FROM qs WHERE q3 > q1""",
)
def q_fd_binning(spark, sf_dir):
    """Freedman-Diaconis histogram bin selection (1981): width =
    2·IQR/n^⅓ over order totals — the robust automatic binning rule
    `feature_histogram`-style reports should use instead of guessing a
    bucket count. Quartiles are EXACT type-1 rank statistics (value at
    rank ⌈0.25n⌉ / ⌈0.75n⌉, orderkey tiebreak — no interpolation
    ambiguity); the cube root and division touch one final row. One
    rank window on the (already value-grain) table."""
    o = load_table(spark, sf_dir, "orders")
    v = o.select(
        F.round(F.col("o_totalprice") * 100.0, 0).cast("long").alias("x"), "o_orderkey"
    )
    n = v.count()
    wr = Window.orderBy("x", "o_orderkey")
    r = v.select("x", F.row_number().over(wr).alias("rn"))
    import math as _m

    k1 = _m.ceil(0.25 * n)
    k3 = _m.ceil(0.75 * n)
    qs = r.agg(
        F.max(F.when(F.col("rn") <= k1, F.col("x"))).cast("long").alias("q1"),
        F.max(F.when(F.col("rn") <= k3, F.col("x"))).cast("long").alias("q3"),
        F.min("x").cast("long").alias("mn"),
        F.max("x").cast("long").alias("mx"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    width = F.lit(2.0) * (d_("q3") - d_("q1")) / F.pow(F.lit(float(n)), F.lit(1.0 / 3.0))
    return qs.where(F.col("q3") > F.col("q1")).select(
        F.lit(n).cast("long").alias("n"),
        (F.col("q3") - F.col("q1")).cast("long").alias("iqr_fp"),
        F.round(width, 4).alias("width_fp"),
        F.ceil((d_("mx") - d_("mn")) / width).cast("long").alias("n_bins"),
    )


@query(
    "pacf_lag2",
    """WITH daily AS (
         SELECT count(*)::BIGINT AS c,
                row_number() OVER (ORDER BY date_trunc('day', ts)) AS rn
         FROM events GROUP BY date_trunc('day', ts)),
       lagged AS (
         SELECT c, lag(c, 1) OVER (ORDER BY rn) AS c1,
                lag(c, 2) OVER (ORDER BY rn) AS c2
         FROM daily),
       st AS (
         SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS s,
                sum(c::HUGEINT * c::HUGEINT) AS q FROM daily),
       r1 AS (
         SELECT count(*)::BIGINT AS n1, sum(c)::BIGINT AS sx, sum(c1)::BIGINT AS sy,
                sum(c::HUGEINT * c1::HUGEINT) AS sxy,
                sum(c::HUGEINT * c::HUGEINT) AS sxx,
                sum(c1::HUGEINT * c1::HUGEINT) AS syy
         FROM lagged WHERE c1 IS NOT NULL),
       r2 AS (
         SELECT count(*)::BIGINT AS n2, sum(c)::BIGINT AS sx, sum(c2)::BIGINT AS sy,
                sum(c::HUGEINT * c2::HUGEINT) AS sxy,
                sum(c::HUGEINT * c::HUGEINT) AS sxx,
                sum(c2::HUGEINT * c2::HUGEINT) AS syy
         FROM lagged WHERE c2 IS NOT NULL),
       rhos AS (
         SELECT round((r1.n1::DOUBLE * r1.sxy::DOUBLE - r1.sx::DOUBLE * r1.sy::DOUBLE)
                / sqrt((r1.n1::DOUBLE * r1.sxx::DOUBLE - r1.sx::DOUBLE * r1.sx::DOUBLE)
                       * (r1.n1::DOUBLE * r1.syy::DOUBLE - r1.sy::DOUBLE * r1.sy::DOUBLE)), 6)
                  AS rho1,
                round((r2.n2::DOUBLE * r2.sxy::DOUBLE - r2.sx::DOUBLE * r2.sy::DOUBLE)
                / sqrt((r2.n2::DOUBLE * r2.sxx::DOUBLE - r2.sx::DOUBLE * r2.sx::DOUBLE)
                       * (r2.n2::DOUBLE * r2.syy::DOUBLE - r2.sy::DOUBLE * r2.sy::DOUBLE)), 6)
                  AS rho2
         FROM r1 CROSS JOIN r2)
       SELECT rho1, rho2,
              CASE WHEN 1.0 - rho1 * rho1 > 1e-12
                   THEN round((rho2 - rho1 * rho1) / (1.0 - rho1 * rho1), 4)
              END AS pacf2
       FROM rhos""",
)
def q_pacf_lag2(spark, sf_dir):
    """Partial autocorrelation at lag 2 via Durbin-Levinson:
    φ₂₂ = (ρ₂ − ρ₁²)/(1 − ρ₁²) on the daily count series — with
    `autocorr_lag1` this is the AR-order identification pair (an AR(1)
    process has φ₂₂ ≈ 0; a surviving φ₂₂ says one lag isn't enough).
    Each ρ uses exact int64/HUGEINT Pearson sufficient stats over its
    own lag-aligned support and rounds ONCE at 6dp; the φ₂₂ quotient
    rounds at 4dp (ratio of near-collinear quantities). One day-grain
    window, two moment rows."""
    ev = _events(spark, sf_dir)
    daily = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .select("c", F.row_number().over(Window.orderBy("day")).alias("rn"))
    )
    w = Window.orderBy("rn")
    lagged = daily.select(
        "c", F.lag("c", 1).over(w).alias("c1"), F.lag("c", 2).over(w).alias("c2")
    ).localCheckpoint(eager=True)
    dec = "decimal(38,0)"
    def rho(col):
        sub = lagged.where(F.col(col).isNotNull())
        st = sub.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("c").cast("long").alias("sx"),
            F.sum(col).cast("long").alias("sy"),
            F.sum(F.col("c").cast(dec) * F.col(col).cast(dec)).cast(dec).alias("sxy"),
            F.sum(F.col("c").cast(dec) * F.col("c").cast(dec)).cast(dec).alias("sxx"),
            F.sum(F.col(col).cast(dec) * F.col(col).cast(dec)).cast(dec).alias("syy"),
        )
        d_ = lambda c: F.col(c).cast("double")  # noqa: E731
        return st.select(
            F.round(
                (d_("n") * d_("sxy") - d_("sx") * d_("sy"))
                / F.sqrt(
                    (d_("n") * d_("sxx") - d_("sx") * d_("sx"))
                    * (d_("n") * d_("syy") - d_("sy") * d_("sy"))
                ),
                6,
            ).alias(f"rho_{col}")
        )
    rhos = rho("c1").crossJoin(rho("c2")).select(
        F.col("rho_c1").alias("rho1"), F.col("rho_c2").alias("rho2")
    )
    return rhos.select(
        "rho1", "rho2",
        F.when(
            F.lit(1.0) - F.col("rho1") * F.col("rho1") > 1e-12,
            F.round(
                (F.col("rho2") - F.col("rho1") * F.col("rho1"))
                / (F.lit(1.0) - F.col("rho1") * F.col("rho1")),
                4,
            ),
        ).alias("pacf2"),
    )


# --------------------------------------------------------------------------
# batch 56: AMS F2 sketch audit, negative-binomial fit, global transitivity

_AMS_K = 64
_AMS_GROUPS = 8  # median of 8 group-means (the AMS median-of-means combiner)


def _ams_sql(k: int = _AMS_K, g: int = _AMS_GROUPS) -> str:
    from pliers_spark.functions.hashing import md5_int_sql

    signs = ", ".join(
        f"sum((1 - 2 * CAST((({md5_int_sql('w', seed=100 + j)}) % 2) AS BIGINT)) * c)"
        f"::BIGINT AS z{j}" for j in range(k)
    )
    per_g = k // g
    gsums = ", ".join(
        "("
        + " + ".join(f"z{i}::HUGEINT * z{i}::HUGEINT" for i in range(gi * per_g, (gi + 1) * per_g))
        + f") AS g{gi}"
        for gi in range(g)
    )
    glist = ", ".join(f"g{gi}" for gi in range(g))
    return f"""WITH cnt AS (
         SELECT u AS w, count(*)::BIGINT AS c
         FROM (SELECT unnest(string_split(trim(text), ' ')) AS u FROM documents)
         GROUP BY u),
       f2x AS (SELECT sum(c::HUGEINT * c::HUGEINT)::BIGINT AS f2_exact FROM cnt),
       zs AS (SELECT {signs} FROM cnt),
       gs AS (SELECT {gsums} FROM zs),
       med AS (
         SELECT CAST(e AS BIGINT) AS e,
                row_number() OVER (ORDER BY e) AS rn
         FROM (SELECT unnest([{glist}]) AS e FROM gs))
       SELECT f2x.f2_exact,
              CAST(round((SELECT max(e) FROM med WHERE rn <= {(g + 1) // 2})::DOUBLE
                         / {per_g}.0) AS BIGINT) AS f2_est,
              round((round((SELECT max(e) FROM med WHERE rn <= {(g + 1) // 2})::DOUBLE
                           / {per_g}.0) - f2x.f2_exact::DOUBLE)
                    / f2x.f2_exact::DOUBLE, 6) AS rel_err
       FROM f2x"""


@query("ams_f2", _ams_sql())
def q_ams_f2(spark, sf_dir):
    """AMS second-moment (F₂) sketch audit (Alon, Matias & Szegedy,
    STOC 1996 — the Gödel-Prize streaming sketch): 64 independent
    ±1-hash estimators Z_j = Σ s_j(w)·f(w) combined by the canonical
    MEDIAN-OF-MEANS (8 groups of 8 — a plain median of single Z² values
    would be biased toward the χ² median ≈ 0.45·F₂), audited against
    the exact Σf² of the token frequency vector. F₂ drives self-join
    size estimation and skew planning; deterministic md5 sign hashes
    make the sketch fully reproducible cross-engine (every Z_j and
    group sum is exact integer arithmetic; one division by the group
    size at the end)."""
    from pliers_spark.functions.hashing import md5_int

    d = _docs(spark, sf_dir)
    cnt = (
        d.select(F.explode(T.tokenize(F.col("text"))).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    dec = "decimal(38,0)"
    f2_exact = cnt.agg(
        F.sum(F.col("c").cast(dec) * F.col("c").cast(dec)).cast("long").alias("f2")
    ).collect()[0].f2
    zs = cnt.agg(
        *[
            F.sum((1 - 2 * F.pmod(md5_int(F.col("w"), seed=100 + j), F.lit(2))) * F.col("c"))
            .cast("long").alias(f"z{j}")
            for j in range(_AMS_K)
        ]
    ).collect()[0]
    per_g = _AMS_K // _AMS_GROUPS
    gsums = sorted(
        sum(int(zs[f"z{i}"]) ** 2 for i in range(gi * per_g, (gi + 1) * per_g))
        for gi in range(_AMS_GROUPS)
    )
    med = gsums[(_AMS_GROUPS + 1) // 2 - 1]
    f2_est = round(med / per_g)
    rel = round((round(med / per_g) - f2_exact) / f2_exact, 6)
    return spark.createDataFrame(
        [(f2_exact, f2_est, rel)], "f2_exact long, f2_est long, rel_err double"
    )


@query(
    "negbin_fit",
    """WITH users AS (SELECT DISTINCT user_id FROM events),
       types AS (SELECT DISTINCT event_type FROM events),
       cnt AS (SELECT user_id, event_type, count(*)::BIGINT AS c
               FROM events GROUP BY 1, 2),
       dense AS (
         SELECT t.event_type, coalesce(cnt.c, 0)::BIGINT AS c
         FROM users u CROSS JOIN types t
         LEFT JOIN cnt ON cnt.user_id = u.user_id AND cnt.event_type = t.event_type),
       st AS (
         SELECT event_type, count(*)::BIGINT AS n, sum(c)::BIGINT AS s,
                sum(c::HUGEINT * c::HUGEINT) AS q
         FROM dense GROUP BY event_type)
       SELECT event_type, n AS n_users,
              round(s::DOUBLE / n, 6) AS mu,
              round(q::DOUBLE / n - (s::DOUBLE / n) * (s::DOUBLE / n), 6) AS var,
              CASE WHEN q::DOUBLE / n - (s::DOUBLE / n) * (s::DOUBLE / n)
                        > s::DOUBLE / n
                   THEN round((s::DOUBLE / n) * (s::DOUBLE / n)
                              / (q::DOUBLE / n - (s::DOUBLE / n) * (s::DOUBLE / n)
                                 - s::DOUBLE / n), 6) END AS nb_r,
              CASE WHEN q::DOUBLE / n - (s::DOUBLE / n) * (s::DOUBLE / n)
                        > s::DOUBLE / n
                   THEN round((s::DOUBLE / n)
                              / (q::DOUBLE / n - (s::DOUBLE / n) * (s::DOUBLE / n)), 6)
              END AS nb_p
       FROM st""",
)
def q_negbin_fit(spark, sf_dir):
    """Negative-binomial method-of-moments fit per event type
    (r = μ²/(σ²−μ), p = μ/σ²) over zero-densified per-user counts —
    the model `dispersion_index` motivates: when counts are
    overdispersed the NB(r,p) parameters drive capacity simulation and
    per-user rate modeling; NULL when σ² ≤ μ (Poisson or under-
    dispersed, NB undefined). Exact int64/HUGEINT sufficient stats;
    identical one-expression doubles both engines."""
    ev = _events(spark, sf_dir)
    users = ev.select("user_id").distinct()
    types = ev.select("event_type").distinct()
    cnt = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).cast("long").alias("c"))
    dense = (
        users.crossJoin(F.broadcast(types))
        .join(cnt, ["user_id", "event_type"], "left")
        .select("event_type", F.coalesce("c", F.lit(0)).cast("long").alias("c"))
    )
    dec = "decimal(38,0)"
    st = dense.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c").cast(dec) * F.col("c").cast(dec)).cast(dec).alias("q"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    mu = d_("s") / d_("n")
    var = d_("q") / d_("n") - mu * mu
    over = var > mu
    return st.select(
        "event_type", F.col("n").alias("n_users"),
        F.round(mu, 6).alias("mu"),
        F.round(var, 6).alias("var"),
        F.when(over, F.round(mu * mu / (var - mu), 6)).alias("nb_r"),
        F.when(over, F.round(mu / var, 6)).alias("nb_p"),
    )


@query(
    "transitivity_global",
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       sized AS (SELECT l_orderkey FROM op GROUP BY l_orderkey
                 HAVING count(*) BETWEEN 2 AND 20),
       b AS (SELECT op.* FROM op JOIN sized USING (l_orderkey)),
       e AS (
         SELECT DISTINCT a.l_partkey AS u, bb.l_partkey AS v
         FROM b a JOIN b bb ON a.l_orderkey = bb.l_orderkey
                           AND a.l_partkey < bb.l_partkey),
       sym AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
       deg AS (SELECT a AS node, count(*)::BIGINT AS d FROM sym GROUP BY a),
       o AS (
         SELECT s.a AS src, s.b AS dst, db.d AS dd
         FROM sym s JOIN deg da ON da.node = s.a JOIN deg db ON db.node = s.b
         WHERE (da.d, s.a) < (db.d, s.b)),
       tri AS (
         SELECT count(*)::BIGINT AS t FROM (
           SELECT e1.src
           FROM o e1 JOIN o e2 ON e1.src = e2.src
             AND ((e1.dd < e2.dd) OR (e1.dd = e2.dd AND e1.dst < e2.dst))
           JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst)),
       wd AS (SELECT sum(d::HUGEINT * (d - 1)::HUGEINT / 2)::BIGINT AS wedges,
                     count(*)::BIGINT AS n FROM deg)
       SELECT wd.n AS n_nodes, wd.wedges, tri.t AS triangles,
              CASE WHEN wd.wedges > 0
                   THEN round(3.0 * tri.t::DOUBLE / wd.wedges::DOUBLE, 6) END
                AS transitivity
       FROM wd CROSS JOIN tri""",
)
def q_transitivity_global(spark, sf_dir):
    """Global transitivity C = 3·triangles / wedges (the graph-level
    clustering number; Watts-Strogatz's C is its per-node mean, emitted
    by `triangle_coeffs`) — with `triangle_nullmodel` this closes the
    clustering triptych: per-node profile, global ratio, null
    expectation. Triangles reuse the orientation-ordered enumeration;
    wedges are Σ C(d,2) from the degree census — no new shuffle
    shapes, one ratio."""
    dec = "decimal(38,0)"
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        op.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("bs"))
        .where((F.col("bs") >= 2) & (F.col("bs") <= 20)).select("l_orderkey")
    )
    b = op.join(sized, "l_orderkey")
    e = (
        b.alias("x").join(b.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("u"), F.col("y.l_partkey").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d")).withColumnRenamed("u", "node").localCheckpoint(eager=True)
    o = (
        sym.join(deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
        .where(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select(F.col("u").alias("src"), F.col("v").alias("dst"), F.col("dv").alias("dd"))
        .localCheckpoint(eager=True)
    )
    e1 = o.select("src", F.col("dst").alias("v"), F.col("dd").alias("dv_"))
    e2 = o.select("src", F.col("dst").alias("w"), F.col("dd").alias("dw_"))
    wedges_j = e1.join(e2, "src").where(
        (F.col("dv_") < F.col("dw_"))
        | ((F.col("dv_") == F.col("dw_")) & (F.col("v") < F.col("w")))
    )
    closing = o.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    t = wedges_j.join(closing, ["v", "w"]).count()
    wd = deg.agg(
        F.sum((F.col("d").cast(dec) * (F.col("d") - 1).cast(dec) / 2).cast(dec))
        .cast("long").alias("wedges"),
        F.count(F.lit(1)).cast("long").alias("n"),
    ).collect()[0]
    trans = round(3.0 * t / wd.wedges, 6) if wd.wedges else None
    return spark.createDataFrame(
        [(wd.n, wd.wedges, t, trans)],
        "n_nodes long, wedges long, triangles long, transitivity double",
    )


# --------------------------------------------------------------------------
# batch 57: Adamic-Adar link prediction, binned Kendall tau-b, chi-square

_AA_MAX_DEG = 500  # hub cap: a hub z adds <= 1/ln(500) per wedge but O(d_z^2) wedges


@query(
    "adamic_adar",
    f"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       sized AS (SELECT l_orderkey FROM op GROUP BY l_orderkey
                 HAVING count(*) BETWEEN 2 AND 20),
       b AS (SELECT op.* FROM op JOIN sized USING (l_orderkey)),
       e AS (
         SELECT DISTINCT a.l_partkey AS u, bb.l_partkey AS v
         FROM b a JOIN b bb ON a.l_orderkey = bb.l_orderkey
                           AND a.l_partkey < bb.l_partkey),
       sym AS (SELECT u AS z, v AS nb FROM e UNION ALL SELECT v, u FROM e),
       deg AS (SELECT z AS node, count(*)::BIGINT AS d FROM sym GROUP BY z),
       mid AS (
         SELECT s.z, s.nb, round(1000000.0 / ln(d.d))::BIGINT AS w_micro
         FROM sym s JOIN deg d ON d.node = s.z
         WHERE d.d >= 2 AND d.d <= {_AA_MAX_DEG}),
       wedge AS (
         SELECT x.nb AS a, y.nb AS b,
                sum(x.w_micro)::BIGINT AS aa_micro, count(*)::BIGINT AS cn
         FROM mid x JOIN mid y ON x.z = y.z AND x.nb < y.nb
         GROUP BY 1, 2),
       cand AS (
         SELECT w.* FROM wedge w
         ANTI JOIN e ON e.u = w.a AND e.v = w.b)
       SELECT a, b, cn AS common_neighbors, aa_micro,
              round(aa_micro / 1000000.0, 6) AS aa_score
       FROM cand
       ORDER BY aa_micro DESC, a, b LIMIT 50""",
)
def q_adamic_adar(spark, sf_dir):
    """Adamic-Adar link prediction (Adamic & Adar, Social Networks 2003)
    over the part co-purchase graph: for each NON-adjacent pair (a,b),
    score = Σ_{z ∈ Γ(a)∩Γ(b)} 1/ln(deg z) — the classic common-neighbor
    index that down-weights promiscuous hubs. Plan: one wedge
    enumeration through the shared neighbor z (join of the symmetric
    edge list with itself on z, a<b), summed per pair, then an
    anti-join against the edge list keeps only non-edges — no all-pairs
    product anywhere. z is capped at deg ≤ {_AA_MAX_DEG} on BOTH
    engines (a hub contributes ≤ 1/ln(cap) per wedge yet O(d²) wedges;
    truncated-AA is the standard production form of this index — the
    same reasoning as `ngram_jaccard`'s max_df stop-shingle cap).
    Weights are integer micro-units (round(1e6/ln d)) so the per-pair
    sum is exact and order-independent cross-engine; top-50 by
    (score, a, b) is a deterministic TakeOrderedAndProject."""
    dec = "decimal(38,0)"
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        op.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("bs"))
        .where((F.col("bs") >= 2) & (F.col("bs") <= 20)).select("l_orderkey")
    )
    b = op.join(sized, "l_orderkey")
    e = (
        b.alias("x").join(b.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("u"), F.col("y.l_partkey").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = e.select(F.col("u").alias("z"), F.col("v").alias("nb")).unionAll(
        e.select(F.col("v").alias("z"), F.col("u").alias("nb"))
    )
    deg = sym.groupBy("z").agg(F.count(F.lit(1)).cast("long").alias("d"))
    mid = (
        sym.join(deg.where((F.col("d") >= 2) & (F.col("d") <= _AA_MAX_DEG)), "z")
        .select("z", "nb", F.round(F.lit(1e6) / F.log(F.col("d")), 0).cast("long").alias("w_micro"))
    )
    wedge = (
        mid.alias("x").join(mid.alias("y"), "z")
        .where(F.col("x.nb") < F.col("y.nb"))
        .groupBy(F.col("x.nb").alias("a"), F.col("y.nb").alias("b"))
        .agg(
            F.sum("x.w_micro").cast("long").alias("aa_micro"),
            F.count(F.lit(1)).cast("long").alias("cn"),
        )
    )
    cand = wedge.join(
        e.select(F.col("u").alias("a"), F.col("v").alias("b")), ["a", "b"], "left_anti"
    )
    return (
        cand.select(
            "a", "b", F.col("cn").alias("common_neighbors"), "aa_micro",
            F.round(F.col("aa_micro") / 1e6, 6).alias("aa_score"),
        )
        .orderBy(F.desc("aa_micro"), "a", "b")
        .limit(50)
    )


@query(
    "kendall_tau_binned",
    """WITH base AS (
         SELECT doc_id, n_chars,
                len(string_split(trim(text), ' '))::BIGINT AS n_toks
         FROM documents),
       nq AS (
         SELECT n_chars, n_toks,
                ntile(5) OVER (ORDER BY n_chars, doc_id) AS qx,
                ntile(5) OVER (ORDER BY n_toks, doc_id) AS qy
         FROM base),
       cell AS (SELECT qx, qy, count(*)::HUGEINT AS n FROM nq GROUP BY 1, 2),
       tot AS (SELECT sum(n) AS n FROM cell),
       conc AS (
         SELECT coalesce(sum(c1.n * c2.n), 0) AS c
         FROM cell c1 JOIN cell c2 ON c2.qx > c1.qx AND c2.qy > c1.qy),
       disc AS (
         SELECT coalesce(sum(c1.n * c2.n), 0) AS d
         FROM cell c1 JOIN cell c2 ON c2.qx > c1.qx AND c2.qy < c1.qy),
       tx AS (SELECT sum(s * (s - 1) / 2) AS t FROM
                (SELECT sum(n) AS s FROM cell GROUP BY qx)),
       ty AS (SELECT sum(s * (s - 1) / 2) AS t FROM
                (SELECT sum(n) AS s FROM cell GROUP BY qy))
       SELECT conc.c::BIGINT AS concordant, disc.d::BIGINT AS discordant,
              round((conc.c::DOUBLE - disc.d::DOUBLE)
                    / sqrt((tot.n * (tot.n - 1) / 2 - tx.t)::DOUBLE
                           * (tot.n * (tot.n - 1) / 2 - ty.t)::DOUBLE), 6)
                AS tau_b
       FROM conc, disc, tx, ty, tot""",
)
def q_kendall_tau_binned(spark, sf_dir):
    """Kendall τ-b rank correlation between document length in chars
    and in tokens, computed on QUINTILE-BINNED data (Kendall 1945 ties
    correction): concordant/discordant pair counts come from the 5×5
    contingency table — Σ n_ij · n_i'j' over strictly greater /
    strictly lesser cells — so the O(n²) pair space collapses to 25²
    cell pairs after one aggregation. This is the scale form of τ
    (exact for the binned ordinal variables; `spearman_rho` covers the
    continuous ranks): all counts are exact integers, one sqrt at the
    end. ntile ties are broken by doc_id on BOTH engines — without the
    total order, equal raw values straddle tile boundaries differently
    per engine and the 5×5 census drifts."""
    d = _docs(spark, sf_dir)
    base = d.select(
        "doc_id", "n_chars", F.size(T.tokenize(F.col("text"))).cast("long").alias("n_toks")
    )
    nq = base.select(
        F.ntile(5).over(Window.orderBy("n_chars", "doc_id")).alias("qx"),
        F.ntile(5).over(Window.orderBy("n_toks", "doc_id")).alias("qy"),
    )
    dec = "decimal(38,0)"
    cell = nq.groupBy("qx", "qy").agg(F.count(F.lit(1)).cast(dec).alias("n")).localCheckpoint(eager=True)
    tot = cell.agg(F.sum("n").cast(dec).alias("n"))
    conc = (
        cell.alias("c1").join(
            cell.alias("c2"),
            (F.col("c2.qx") > F.col("c1.qx")) & (F.col("c2.qy") > F.col("c1.qy")),
        )
        .agg(F.coalesce(F.sum(F.col("c1.n") * F.col("c2.n")), F.lit(0)).cast(dec).alias("c"))
    )
    disc = (
        cell.alias("c1").join(
            cell.alias("c2"),
            (F.col("c2.qx") > F.col("c1.qx")) & (F.col("c2.qy") < F.col("c1.qy")),
        )
        .agg(F.coalesce(F.sum(F.col("c1.n") * F.col("c2.n")), F.lit(0)).cast(dec).alias("d"))
    )
    tx = (
        cell.groupBy("qx").agg(F.sum("n").alias("s"))
        .agg(F.sum(F.col("s") * (F.col("s") - 1) / 2).cast(dec).alias("t"))
    )
    ty = (
        cell.groupBy("qy").agg(F.sum("n").alias("s"))
        .agg(F.sum(F.col("s") * (F.col("s") - 1) / 2).cast(dec).alias("t"))
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    half = F.col("n").cast(dec) * (F.col("n").cast(dec) - 1) / 2
    return (
        conc.crossJoin(disc).crossJoin(tx.withColumnRenamed("t", "t_x"))
        .crossJoin(ty.withColumnRenamed("t", "t_y")).crossJoin(tot)
        .select(
            F.col("c").cast("long").alias("concordant"),
            F.col("d").cast("long").alias("discordant"),
            F.round(
                (d_("c") - d_("d"))
                / F.sqrt(
                    (half - F.col("t_x")).cast("double")
                    * (half - F.col("t_y")).cast("double")
                ),
                6,
            ).alias("tau_b"),
        )
    )


@query(
    "chi2_independence",
    """WITH o AS (SELECT lang, source, count(*)::BIGINT AS o FROM documents GROUP BY 1, 2),
       r AS (SELECT lang, sum(o)::BIGINT AS r FROM o GROUP BY lang),
       c AS (SELECT source, sum(o)::BIGINT AS c FROM o GROUP BY source),
       n AS (SELECT sum(o)::BIGINT AS n FROM o),
       dense AS (
         SELECT r.lang, c.source, coalesce(o.o, 0)::BIGINT AS o, r.r, c.c, n.n
         FROM r CROSS JOIN c CROSS JOIN n
         LEFT JOIN o ON o.lang = r.lang AND o.source = c.source),
       terms AS (
         SELECT round(1e9 * ((o * n - r * c)::HUGEINT * (o * n - r * c)::HUGEINT)::DOUBLE
                      / (r::HUGEINT * c::HUGEINT * n::HUGEINT)::DOUBLE / n::DOUBLE
                )::BIGINT AS t_nano,
                r, c, n
         FROM dense),
       dims AS (SELECT count(DISTINCT lang)::BIGINT AS nr,
                       count(DISTINCT source)::BIGINT AS nc FROM o)
       SELECT sum(t_nano)::BIGINT AS chi2_nano,
              round(sum(t_nano) / 1e9, 6) AS chi2,
              (SELECT (nr - 1) * (nc - 1) FROM dims)::BIGINT AS dof,
              round(sqrt(sum(t_nano) / 1e9 / (SELECT max(n) FROM n)
                         / (SELECT least(nr - 1, nc - 1) FROM dims)), 6) AS cramers_v
       FROM terms""",
)
def q_chi2_independence(spark, sf_dir):
    """Pearson χ² test of independence on the lang × source contingency
    table plus Cramér's V effect size (the corpus-design alarm behind
    `lang_confusion`/`source_jsd`: is language mix independent of
    source?). Each cell's term uses the margin identity
    (o·n − r·c)²/(r·c·n²) — ALL-INTEGER numerator, so the only float is
    one division per cell, rounded to integer NANO-units before the
    sum (order-independent cross-engine, the `pr_auc` convention);
    zero-cells are densified via the margin cross join (χ² needs every
    expected cell). One groupBy census + two broadcast margins; V =
    sqrt(χ²/(n·min(R−1,C−1)))."""
    d = _docs(spark, sf_dir)
    o = d.groupBy("lang", "source").agg(F.count(F.lit(1)).cast("long").alias("o")).localCheckpoint(eager=True)
    r = o.groupBy("lang").agg(F.sum("o").cast("long").alias("r"))
    c = o.groupBy("source").agg(F.sum("o").cast("long").alias("c"))
    n = o.agg(F.sum("o").cast("long").alias("n"))
    dense = (
        r.crossJoin(F.broadcast(c)).crossJoin(F.broadcast(n))
        .join(o, ["lang", "source"], "left")
        .select(F.coalesce("o", F.lit(0)).cast("long").alias("o"), "r", "c", "n")
    )
    dec = "decimal(38,0)"
    diff = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast(dec)
    t_nano = F.round(
        F.lit(1e9) * (diff * diff).cast("double")
        / (F.col("r").cast(dec) * F.col("c").cast(dec) * F.col("n").cast(dec)).cast("double")
        / F.col("n").cast("double"),
        0,
    ).cast("long")
    dims = o.agg(
        F.count_distinct("lang").cast("long").alias("nr"),
        F.count_distinct("source").cast("long").alias("nc"),
    )
    agg = dense.agg(F.sum(t_nano).cast("long").alias("chi2_nano"))
    return (
        agg.crossJoin(F.broadcast(dims)).crossJoin(F.broadcast(n))
        .select(
            "chi2_nano",
            F.round(F.col("chi2_nano") / 1e9, 6).alias("chi2"),
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
            F.round(
                F.sqrt(
                    F.col("chi2_nano") / 1e9 / F.col("n").cast("double")
                    / F.least(F.col("nr") - 1, F.col("nc") - 1).cast("double")
                ),
                6,
            ).alias("cramers_v"),
        )
    )


# --------------------------------------------------------------------------
# batch 58: deterministic bootstrap CI, k-core peeling, Jaro-Winkler linkage

# Poisson(1) inverse-CDF thresholds scaled to the md5_int 60-bit hash
# range: multiplicity k iff hash < floor(P(X<=k)*2^60); tail capped at 6.
_HBOOT_THRESH = (
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
    1152236456152946176,
)
_HBOOT_B = 200


def _boot_case_sql(hv: str) -> str:
    branches = "".join(
        f" WHEN {hv} < {t} THEN {k}" for k, t in enumerate(_HBOOT_THRESH)
    )
    return f"CASE{branches} ELSE 6 END"


@query(
    "hash_bootstrap_ci",
    f"""WITH d AS (SELECT doc_id, n_chars FROM documents),
       bs AS (SELECT b, doc_id, n_chars
              FROM d CROSS JOIN (SELECT unnest(range(1, {_HBOOT_B + 1}))::BIGINT AS b)),
       h AS (SELECT b, n_chars,
                    {md5_int_sql("concat(doc_id::VARCHAR, ':', b::VARCHAR)")} AS hv
             FROM bs),
       kk AS (SELECT b, n_chars, {_boot_case_sql('hv')} AS k FROM h),
       m AS (SELECT b, sum(k * n_chars)::BIGINT AS sx, sum(k)::BIGINT AS sk
             FROM kk GROUP BY b),
       means AS (SELECT b, sx::DOUBLE / sk AS mb,
                        row_number() OVER (ORDER BY sx::DOUBLE / sk, b) AS rn
                 FROM m WHERE sk > 0),
       fl AS (SELECT count(*)::BIGINT AS n_docs,
                     round(sum(n_chars)::DOUBLE / count(*), 6) AS mean_full
              FROM d)
       SELECT fl.n_docs, fl.mean_full,
              round((SELECT mb FROM means WHERE rn = 5), 6) AS ci_lo,
              round((SELECT mb FROM means WHERE rn = {_HBOOT_B - 4}), 6) AS ci_hi,
              (SELECT count(*) FROM means)::BIGINT AS n_resamples
       FROM fl""",
)
def q_hash_bootstrap_ci(spark, sf_dir):
    """Deterministic Poissonized bootstrap 95% CI for the mean document
    length (Efron 1979; the Poisson(1) multiplicity approximation to
    multinomial resampling is the standard one-pass STREAMING bootstrap
    — Owen & Eckles 2012): resample b counts row i with multiplicity
    Poisson(1) read off a seeded md5 hash of (doc_id, b) against
    precomputed 60-bit inverse-CDF thresholds — NO rand(), so every
    resample is replan/retry-stable and identical cross-engine (the
    `hash_sample` design extended to multiplicities). B=200 resample
    means are exact-integer sums (Σk·x / Σk, one division); the CI is
    nearest-rank order statistics (ranks 5 and 196, ties broken by b).
    Scale shape: ONE explode×B pass + one groupBy — per-row work is B
    hashes, no collect, no iteration; B partial sums per partition is
    the map-side-combine form of the one-pass bootstrap."""
    d = _docs(spark, sf_dir).select("doc_id", "n_chars")
    bs = d.select(
        "doc_id", "n_chars", F.explode(F.sequence(F.lit(1), F.lit(_HBOOT_B))).alias("b")
    )
    hv = md5_int(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("b").cast("string")))
    k = F.lit(6)
    for kk in range(len(_HBOOT_THRESH) - 1, -1, -1):
        k = F.when(hv < _HBOOT_THRESH[kk], F.lit(kk)).otherwise(k)
    m = (
        bs.select("b", "n_chars", k.alias("k"))
        .groupBy("b")
        .agg(
            F.sum(F.col("k") * F.col("n_chars")).cast("long").alias("sx"),
            F.sum("k").cast("long").alias("sk"),
        )
        .where(F.col("sk") > 0)
    )
    means = m.select(
        "b", (F.col("sx").cast("double") / F.col("sk")).alias("mb")
    ).withColumn("rn", F.row_number().over(Window.orderBy("mb", "b")))
    fl = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6).alias("mean_full"),
    )
    lo = means.where(F.col("rn") == 5).select(F.round("mb", 6).alias("ci_lo"))
    hi = means.where(F.col("rn") == _HBOOT_B - 4).select(F.round("mb", 6).alias("ci_hi"))
    nb = means.agg(F.count(F.lit(1)).cast("long").alias("n_resamples"))
    return (
        fl.crossJoin(F.broadcast(lo)).crossJoin(F.broadcast(hi)).crossJoin(F.broadcast(nb))
        .select("n_docs", "mean_full", "ci_lo", "ci_hi", "n_resamples")
    )


_KCORE_K = 3
_KCORE_ROUNDS = 40


def _kcore_sql(k: int = _KCORE_K, rounds: int = _KCORE_ROUNDS) -> str:
    # every CTE is MATERIALIZED: each round references the previous one
    # three times, so default CTE inlining would expand the plan 3^rounds
    parts = [
        """op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       sized AS MATERIALIZED (SELECT l_orderkey FROM op GROUP BY l_orderkey
                 HAVING count(*) BETWEEN 2 AND 20),
       bb AS MATERIALIZED (SELECT op.* FROM op JOIN sized USING (l_orderkey)),
       e AS MATERIALIZED (
         SELECT DISTINCT a.l_partkey AS u, b2.l_partkey AS v
         FROM bb a JOIN bb b2 ON a.l_orderkey = b2.l_orderkey
                            AND a.l_partkey < b2.l_partkey),
       s0 AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v, u FROM e)"""
    ]
    prev = "s0"
    for r in range(1, rounds + 1):
        parts.append(
            f"n{r} AS MATERIALIZED (SELECT u AS node FROM {prev} "
            f"GROUP BY u HAVING count(*) >= {k})"
        )
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT s.u, s.v FROM {prev} s "
            f"JOIN n{r} na ON na.node = s.u JOIN n{r} nb ON nb.node = s.v)"
        )
        prev = f"s{r}"
    return (
        "WITH " + ",\n       ".join(parts)
        + f"\n       SELECT u AS node, count(*)::BIGINT AS core_degree "
        f"FROM {prev} GROUP BY u"
    )


@query("kcore_members", _kcore_sql())
def q_kcore_members(spark, sf_dir):
    """k-core decomposition membership (Seidman 1983; Batagelj-Zaveršnik
    peeling) for k=3 on the part co-purchase graph: repeatedly remove
    every node of degree < k until the remaining induced subgraph is
    the maximal one with min degree ≥ k — THE standard dense-nucleus
    extractor (spam-farm / community cores; `rich_club` profiles by
    degree, this peels by induced degree). Spark side is the canonical
    driver-loop peel: per round one degree census + two semi-joins,
    lineage truncated per round, terminating at the fixpoint (node set
    unchanged) with a loud guard at 40 rounds — the oracle
    unrolls the same synchronous peel 40× (idempotent once the
    fixpoint is reached, so extra rounds are harmless). Returns every
    core member with its degree inside the core."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        op.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("bs"))
        .where((F.col("bs") >= 2) & (F.col("bs") <= 20)).select("l_orderkey")
    )
    b = op.join(sized, "l_orderkey")
    e = (
        b.alias("x").join(b.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("u"), F.col("y.l_partkey").alias("v"))
        .distinct()
    )
    sym = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    prev_n = -1
    for _ in range(_KCORE_ROUNDS + 1):
        keep = (
            sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= _KCORE_K).select(F.col("u").alias("node"))
        )
        n_now = keep.count()
        if n_now == prev_n:
            break
        sym = (
            sym.join(keep.withColumnRenamed("node", "u"), "u")
            .join(keep.selectExpr("node AS v"), "v")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        prev_n = n_now
    else:
        raise RuntimeError(
            f"k-core peel did not reach a fixpoint in {_KCORE_ROUNDS} rounds"
        )
    return sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("core_degree")).withColumnRenamed("u", "node")


def _jw_sql() -> str:
    from pliers_spark.operators.dedup import jaro_winkler_blocked_sql

    return jaro_winkler_blocked_sql()


@query("jaro_winkler_dups", _jw_sql())
def q_jaro_winkler_dups(spark, sf_dir):
    """Jaro-Winkler fuzzy vocabulary matching (Winkler 1990) — typo and
    variant detection over the distinct-token vocabulary, blocked by a
    2-char prefix + length window so no all-pairs product forms (the
    record-linkage blocking discipline; same gate shape as
    `edit_distance_dups`). Scoring is one Arrow-batched pandas UDF over
    the gated pairs, semantics verified against DuckDB's built-in
    ``jaro_winkler_similarity`` (0.7 boost gate, p=0.1, prefix ≤ 4),
    which IS the oracle."""
    from pliers_spark.operators.dedup import jaro_winkler_blocked

    return jaro_winkler_blocked(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# batch 59: perceptual DCT hash, truncated EWMA, CUSUM changepoint


def _phash_sql() -> str:
    from pliers_spark.multimodal import PHASH_KERNEL

    kern = ", ".join(
        f"({u}, {x}, {kq})" for u, row in enumerate(PHASH_KERNEL) for x, kq in enumerate(row)
    )
    px = "(doc_id*131 + r.r*17 + c.c*5 + {ch})"
    return f"""WITH kern(u, x, kq) AS (VALUES {kern}),
       lum AS (
         SELECT d.doc_id, r.r, c.c,
                (299*({px.format(ch=0)} % 256)
               + 587*({px.format(ch=29)} % 256)
               + 114*({px.format(ch=58)} % 256))::BIGINT AS lum
         FROM documents d, generate_series(0,7) r(r), generate_series(0,7) c(c)),
       coeff AS (
         SELECT doc_id, ku.u AS u, kv.u AS v,
                sum(lum * ku.kq * kv.kq)::BIGINT AS cf
         FROM lum JOIN kern ku ON ku.x = lum.r JOIN kern kv ON kv.x = lum.c
         GROUP BY 1, 2, 3),
       ac AS (
         SELECT doc_id, u, v, cf,
                row_number() OVER (PARTITION BY doc_id ORDER BY cf, u, v) AS rn
         FROM coeff WHERE NOT (u = 0 AND v = 0)),
       med AS (SELECT doc_id, max(CASE WHEN rn = 32 THEN cf END) AS med
               FROM ac GROUP BY doc_id),
       bits AS (
         SELECT a.doc_id, a.u*8 + a.v - 1 AS pos,
                CASE WHEN a.cf > m.med THEN 1 ELSE 0 END AS b
         FROM ac a JOIN med m USING (doc_id))
       SELECT doc_id, sum(b * (1::BIGINT << pos))::BIGINT AS phash,
              sum(b)::BIGINT AS n_above
       FROM bits GROUP BY doc_id"""


@query("image_phash", _phash_sql())
def q_image_phash(spark, sf_dir):
    """Perceptual DCT hash (pHash) over a REAL PPM round trip: synthetic
    8×8 images (pixel formula keyed by doc_id) are encoded to P6 bytes,
    decoded by the production codec path, luma'd, and 2-D DCT'd with
    the QUANTIZED integer kernel (round(cos·2¹⁸) literals — the
    chroma_cqt discipline), so every coefficient, the 63-way AC median
    (exact 32nd-smallest order statistic), each comparison bit, and
    the packed 63-bit hash are exact int64 on both engines. pHash is
    the frequency-domain complement to `image_dhash_dups`: DCT energy
    compaction makes it robust to blur/re-encode, the standard second
    perceptual key in crawl image dedup. The oracle recomputes
    pixel → luma → DCT relationally from the same formula, certifying
    encode → decode → DCT → median → pack bit-for-bit."""
    import numpy as np

    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        return codecs.encode_ppm(_synth_image(did))

    payloads = _synth_payloads(spark, sf_dir, build)
    return multimodal.image_phash(payloads).withColumnRenamed("id", "doc_id")


_EWMA_ALPHA = 0.3
_EWMA_LAGS = 20
_EWMA_W = tuple(
    round(_EWMA_ALPHA * (1 - _EWMA_ALPHA) ** j * 1e9) for j in range(_EWMA_LAGS)
)


def _ewma_sql() -> str:
    wx = " + ".join(
        f"coalesce(lag(x, {j}) OVER w, 0) * {w}::BIGINT" for j, w in enumerate(_EWMA_W)
    )
    ww = " + ".join(
        f"CASE WHEN lag(x, {j}) OVER w IS NOT NULL THEN {w}::BIGINT ELSE 0 END"
        for j, w in enumerate(_EWMA_W)
    )
    return f"""WITH base AS (
         SELECT event_id, user_id, ts, round(value * 100)::BIGINT AS x
         FROM events),
       s AS (
         SELECT event_id, user_id,
                ({wx}) AS sum_wx,
                ({ww}) AS sum_w
         FROM base
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT event_id, user_id,
              round(sum_wx::DOUBLE / sum_w::DOUBLE / 100.0, 6) AS ewma
       FROM s"""


@query("ewma_smooth", _ewma_sql())
def q_ewma_smooth(spark, sf_dir):
    """Truncated exponential smoothing (EWMA, α=0.3) of each user's
    event-value stream — the classic online noise filter behind
    anomaly bands and `rolling_anomaly`-style monitors. The recursion
    s_t = α·x_t + (1−α)·s_{t−1} is unrolled to its 20-term window form
    with integer NANO-unit weights w_j = round(α(1−α)ʲ·10⁹) and
    cent-unit values, normalized by the weights actually present at
    the stream head — so both sums are exact int64 and the smoothed
    value is one identical double division per row. Plan: ONE window
    pass per user (20 lag() columns share a single sort/shuffle on
    user_id — whole-stage codegen, no interpreted array fold, no
    exploding (1−α)^{−t} rescale that would overflow on long
    streams)."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    x = F.round(F.col("value") * 100, 0).cast("long")
    base = ev.select("event_id", "user_id", "ts", x.alias("x"))
    sum_wx = None
    sum_w = None
    for j, wj in enumerate(_EWMA_W):
        lj = F.lag("x", j).over(w)
        term_x = F.coalesce(lj, F.lit(0)) * F.lit(wj)
        term_w = F.when(lj.isNotNull(), F.lit(wj)).otherwise(F.lit(0))
        sum_wx = term_x if sum_wx is None else sum_wx + term_x
        sum_w = term_w if sum_w is None else sum_w + term_w
    return base.select(
        "event_id", "user_id",
        F.round(
            sum_wx.cast("double") / sum_w.cast("double") / F.lit(100.0), 6
        ).alias("ewma"),
    )


@query(
    "cusum_changepoint",
    """WITH daily AS (
         SELECT date_diff('day', DATE '2024-01-01', ts::DATE)::BIGINT AS day,
                count(*)::BIGINT AS n_events
         FROM events GROUP BY 1),
       tot AS (SELECT sum(n_events)::BIGINT AS s, count(*)::BIGINT AS n FROM daily),
       p AS (
         SELECT day, n_events, s, n,
                sum(n * n_events - s) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pf
         FROM daily CROSS JOIN tot),
       sc AS (
         SELECT day, n_events, s, n,
                pf - least(0, min(pf) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS sp
         FROM p)
       SELECT day, n_events,
              round(sp::DOUBLE / n, 6) AS cusum,
              (sp::DOUBLE / n > 3.0 * sqrt(s::DOUBLE / n)) AS alarm
       FROM sc""",
)
def q_cusum_changepoint(spark, sf_dir):
    """One-sided CUSUM changepoint monitor (Page, Biometrika 1954) on
    the daily event-count series: S_t = max(0, S_{t−1} + (x_t − μ)).
    The max-reset recursion is NOT window-expressible directly, but the
    prefix identity S_t = P_t − min_{0≤j≤t} P_j (P = running sum of
    deviations, P₀ = 0 folded in via least(0, ·)) turns it into two
    stacked running windows over ONE sort — the scale shape, no
    driver recursion. Deviations are scaled by n (y' = n·x − Σx) so
    every prefix sum and running min is exact int64; the alarm fires
    when S_t > 3·√μ̂ (one identical float comparison). This is the
    formal changepoint detector behind `rolling_anomaly`'s z-score
    heuristic."""
    ev = _events(spark, sf_dir)
    daily = (
        ev.select(F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).cast("long").alias("day"))
        .groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    tot = daily.agg(
        F.sum("n_events").cast("long").alias("s"), F.count(F.lit(1)).cast("long").alias("n")
    )
    wrun = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p = daily.crossJoin(F.broadcast(tot)).withColumn(
        "pf", F.sum(F.col("n") * F.col("n_events") - F.col("s")).over(wrun)
    )
    sc = p.withColumn("sp", F.col("pf") - F.least(F.lit(0).cast("long"), F.min("pf").over(wrun)))
    return sc.select(
        "day", "n_events",
        F.round(F.col("sp").cast("double") / F.col("n"), 6).alias("cusum"),
        (
            F.col("sp").cast("double") / F.col("n")
            > F.lit(3.0) * F.sqrt(F.col("s").cast("double") / F.col("n"))
        ).alias("alarm"),
    )


# --------------------------------------------------------------------------
# batch 60: Brier calibration decomposition, BH-FDR, Theil inequality


@query(
    "brier_calibration",
    """WITH scored AS (
         SELECT round(n_chars * 1e6 / (n_chars + 500))::BIGINT AS p_micro,
                CASE WHEN lang = 'en' THEN 1 ELSE 0 END::BIGINT AS y
         FROM documents),
       binned AS (
         SELECT least(9, p_micro // 100000)::BIGINT AS bin, p_micro, y
         FROM scored),
       bins AS (
         SELECT bin, count(*)::BIGINT AS nk,
                sum(p_micro)::BIGINT AS sp, sum(y)::BIGINT AS sy
         FROM binned GROUP BY bin),
       tot AS (
         SELECT sum(nk)::BIGINT AS n, sum(sy)::BIGINT AS sy_all,
                (SELECT sum((p_micro - 1000000*y)::HUGEINT
                            * (p_micro - 1000000*y)::HUGEINT) FROM binned)
                  AS brier_num
         FROM bins),
       terms AS (
         SELECT b.bin, b.nk,
                round(b.sp::DOUBLE / b.nk / 1e6, 6) AS mean_p,
                round(b.sy::DOUBLE / b.nk, 6) AS frac_pos,
                round(1e9 * ((b.sp - 1000000*b.sy)::HUGEINT
                             * (b.sp - 1000000*b.sy)::HUGEINT)::DOUBLE
                      / b.nk / 1e12 / t.n)::BIGINT AS rel_nano,
                round(1e9 * ((b.sy * t.n - b.nk * t.sy_all)::HUGEINT
                             * (b.sy * t.n - b.nk * t.sy_all)::HUGEINT)::DOUBLE
                      / b.nk / t.n / t.n / t.n)::BIGINT AS res_nano
         FROM bins b CROSS JOIN tot t)
       SELECT (SELECT round(brier_num::DOUBLE / 1e12 / n, 6) FROM tot) AS brier,
              round(sum(rel_nano) / 1e9, 6) AS reliability,
              round(sum(res_nano) / 1e9, 6) AS resolution,
              (SELECT round(sy_all::DOUBLE / n * (n - sy_all) / n, 6) FROM tot)
                AS uncertainty,
              count(*)::BIGINT AS n_bins
       FROM terms""",
)
def q_brier_calibration(spark, sf_dir):
    """Brier score with Murphy's calibration decomposition (Murphy, JAM
    1973: Brier = reliability − resolution + uncertainty) for a
    deterministic length-based probability that a document is English
    (p = n_chars/(n_chars+500) — an exact integer-ratio score, so no
    model RNG): 10 equal-width probability bins, per-bin mean forecast
    vs observed frequency. Every sufficient statistic is an exact
    integer (micro-unit forecasts, HUGEINT squared deviations); the
    reliability/resolution bin terms round once to NANO-units before
    the 10-term sum (the `pr_auc` order-independence convention), and
    the Brier numerator is a single exact integer sum. The
    calibration-curve audit every probabilistic quality/langid scorer
    feeding `quality_weighted_sample` should pass before its scores
    are trusted as sampling weights."""
    d = _docs(spark, sf_dir)
    dec = "decimal(38,0)"
    scored = d.select(
        F.round(F.col("n_chars") * 1e6 / (F.col("n_chars") + 500), 0).cast("long").alias("p_micro"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    binned = scored.select(
        F.least(F.lit(9), F.floor(F.col("p_micro") / 100000)).cast("long").alias("bin"),
        "p_micro", "y",
    )
    bins = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("nk"),
        F.sum("p_micro").cast("long").alias("sp"),
        F.sum("y").cast("long").alias("sy"),
    ).localCheckpoint(eager=True)
    bdiff = (F.col("p_micro") - 1000000 * F.col("y")).cast(dec)
    brier_num = binned.agg(F.sum(bdiff * bdiff).cast(dec).alias("brier_num"))
    tot = (
        bins.agg(
            F.sum("nk").cast("long").alias("n"), F.sum("sy").cast("long").alias("sy_all")
        )
        .crossJoin(F.broadcast(brier_num))
    )
    t = bins.crossJoin(F.broadcast(tot))
    rdiff = (F.col("sp") - 1000000 * F.col("sy")).cast(dec)
    sdiff = (F.col("sy") * F.col("n") - F.col("nk") * F.col("sy_all")).cast(dec)
    terms = t.select(
        F.round(
            F.lit(1e9) * (rdiff * rdiff).cast("double") / F.col("nk") / 1e12 / F.col("n"), 0
        ).cast("long").alias("rel_nano"),
        F.round(
            F.lit(1e9) * (sdiff * sdiff).cast("double")
            / F.col("nk") / F.col("n") / F.col("n") / F.col("n"), 0
        ).cast("long").alias("res_nano"),
    )
    agg = terms.agg(
        F.round(F.sum("rel_nano") / 1e9, 6).alias("reliability"),
        F.round(F.sum("res_nano") / 1e9, 6).alias("resolution"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            F.round(F.col("brier_num").cast("double") / 1e12 / F.col("n"), 6).alias("brier"),
            "reliability", "resolution",
            F.round(
                F.col("sy_all").cast("double") / F.col("n")
                * (F.col("n") - F.col("sy_all")) / F.col("n"), 6
            ).alias("uncertainty"),
            "n_bins",
        )
    )


_BH_ALPHA_MICRO = 100000  # alpha = 0.10 in micro-units


@query(
    "bh_fdr",
    f"""WITH st AS (
         SELECT source, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS s,
                sum(n_chars::HUGEINT * n_chars::HUGEINT) AS q
         FROM documents GROUP BY source),
       tot AS (SELECT sum(n)::BIGINT AS tn, sum(s)::BIGINT AS ts,
                      sum(q) AS tq, count(*)::BIGINT AS m FROM st),
       z AS (
         SELECT st.source, st.n,
                (st.s::DOUBLE / st.n - (t.ts - st.s)::DOUBLE / (t.tn - st.n)) AS diff,
                (st.q::DOUBLE / st.n - (st.s::DOUBLE / st.n) * (st.s::DOUBLE / st.n))
                  / st.n
              + ((t.tq - st.q)::DOUBLE / (t.tn - st.n)
                 - ((t.ts - st.s)::DOUBLE / (t.tn - st.n))
                   * ((t.ts - st.s)::DOUBLE / (t.tn - st.n)))
                  / (t.tn - st.n) AS se2,
                t.m
         FROM st CROSS JOIN tot t),
       pv AS (
         SELECT source, m,
                round(1e6 / (1.0 + diff * diff / se2))::BIGINT AS p_micro
         FROM z),
       ranked AS (
         SELECT source, m, p_micro,
                row_number() OVER (ORDER BY p_micro, source) AS rk
         FROM pv),
       cutoff AS (
         SELECT coalesce(max(rk), 0) AS kstar
         FROM ranked WHERE p_micro * m <= {_BH_ALPHA_MICRO}::BIGINT * rk)
       SELECT r.source, round(r.p_micro / 1e6, 6) AS p_value, r.rk AS rank,
              round({_BH_ALPHA_MICRO} * r.rk / 1e6 / r.m, 6) AS bh_threshold,
              (r.rk <= c.kstar) AS rejected
       FROM ranked r CROSS JOIN cutoff c""",
)
def q_bh_fdr(spark, sf_dir):
    """Benjamini-Hochberg FDR control (JRSS-B 1995) across the m
    per-source "is this source's mean doc length shifted?" tests: each
    source gets a distribution-free Cantelli-bound p-value
    p = 1/(1+z²) from its two-sample z² (exact integer sufficient
    stats, ONE identical float expression per source — conservative by
    construction, so the procedure is honest without cross-engine
    erf), then the step-up rule rejects ranks ≤ k* = max{k : p_(k) ≤
    α·k/m} — the threshold comparison is INTEGER cross-multiplication
    (p_micro·m ≤ α_micro·k), so the rejection set is exact. THE
    standard multiple-comparisons gate when `dunning_keyness`/
    `ks_drift`-style per-source screens run at corpus scale (m sources
    → m tests → FDR, not per-test α). One census + rank window over m
    rows."""
    d = _docs(spark, sf_dir)
    dec = "decimal(38,0)"
    st = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("s"),
        F.sum(F.col("n_chars").cast(dec) * F.col("n_chars").cast(dec)).cast(dec).alias("q"),
    ).localCheckpoint(eager=True)
    tot = st.agg(
        F.sum("n").cast("long").alias("tn"), F.sum("s").cast("long").alias("ts"),
        F.sum("q").cast(dec).alias("tq"), F.count(F.lit(1)).cast("long").alias("m"),
    )
    z = st.crossJoin(F.broadcast(tot))
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    mean_in = d_("s") / d_("n")
    mean_out = (d_("ts") - d_("s")) / (d_("tn") - d_("n"))
    var_in = d_("q") / d_("n") - mean_in * mean_in
    var_out = (
        (d_("tq") - d_("q")) / (d_("tn") - d_("n")) - mean_out * mean_out
    )
    diff = mean_in - mean_out
    se2 = var_in / F.col("n") + var_out / (F.col("tn") - F.col("n"))
    pv = z.select(
        "source", "m",
        F.round(F.lit(1e6) / (F.lit(1.0) + diff * diff / se2), 0).cast("long").alias("p_micro"),
    )
    ranked = pv.withColumn("rk", F.row_number().over(Window.orderBy("p_micro", "source")))
    cutoff = ranked.where(
        F.col("p_micro") * F.col("m") <= F.lit(_BH_ALPHA_MICRO) * F.col("rk")
    ).agg(F.coalesce(F.max("rk"), F.lit(0)).alias("kstar"))
    return ranked.crossJoin(F.broadcast(cutoff)).select(
        "source",
        F.round(F.col("p_micro") / 1e6, 6).alias("p_value"),
        F.col("rk").cast("long").alias("rank"),
        F.round(F.lit(_BH_ALPHA_MICRO) * F.col("rk") / 1e6 / F.col("m"), 6).alias("bh_threshold"),
        (F.col("rk") <= F.col("kstar")).alias("rejected"),
    )


@query(
    "theil_index",
    """WITH x AS (SELECT source, n_chars::BIGINT AS x FROM documents WHERE n_chars > 0),
       tot AS (SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx FROM x),
       rows_t AS (
         SELECT source,
                round(1e6 * (x::DOUBLE * t.n / t.sx) * ln(x::DOUBLE * t.n / t.sx))::BIGINT
                  AS t_micro,
                x, t.n, t.sx
         FROM x CROSS JOIN tot t),
       grp AS (
         SELECT source, count(*)::BIGINT AS ng, sum(x)::BIGINT AS sg,
                sum(t_micro)::BIGINT AS tg_micro
         FROM rows_t GROUP BY source),
       btw AS (
         SELECT sum(round(1e6 * (g.sg::DOUBLE / t.sx)
                          * ln((g.sg::DOUBLE * t.n) / (g.ng::DOUBLE * t.sx)))::BIGINT)
                  AS tb_micro
         FROM grp g CROSS JOIN tot t)
       SELECT round((SELECT sum(tg_micro) FROM grp) / 1e6
                    / (SELECT n FROM tot), 6) AS theil_total,
              round((SELECT tb_micro FROM btw) / 1e6, 6) AS theil_between,
              round((SELECT sum(tg_micro) FROM grp) / 1e6 / (SELECT n FROM tot)
                    - (SELECT tb_micro FROM btw) / 1e6, 6) AS theil_within""",
)
def q_theil_index(spark, sf_dir):
    """Theil T inequality index of document length with its exact
    between/within-source decomposition (Theil 1967; the additive
    decomposability that Gini lacks — the reason economists reach for
    Theil when attributing inequality to groups): T = Σ (x/Σx)·
    ln(x·n/Σx), T_between from source totals, T_within = T − T_between.
    Per-row and per-group log terms round once to integer micro-units
    (ln parity across engines is already pinned by `pmi_collocations`/
    `dunning_keyness`), so every sum is exact and order-independent.
    Complements `gini_tokens`/`pareto_8020`: same concentration
    question, but attributable to sources — the corpus-curation view
    of "is length inequality a few weird sources or everyone?"."""
    d = _docs(spark, sf_dir)
    x = d.where(F.col("n_chars") > 0).select("source", F.col("n_chars").cast("long").alias("x"))
    tot = x.agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("x").cast("long").alias("sx")
    )
    rt = x.crossJoin(F.broadcast(tot))
    share = F.col("x").cast("double") * F.col("n") / F.col("sx")
    rows_t = rt.select(
        "source",
        F.round(F.lit(1e6) * share * F.log(share), 0).cast("long").alias("t_micro"),
        "x", "n", "sx",
    )
    grp = rows_t.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("x").cast("long").alias("sg"),
        F.sum("t_micro").cast("long").alias("tg_micro"),
    )
    gt = grp.crossJoin(F.broadcast(tot))
    btw_term = F.round(
        F.lit(1e6) * (F.col("sg").cast("double") / F.col("sx"))
        * F.log(
            F.col("sg").cast("double") * F.col("n")
            / (F.col("ng").cast("double") * F.col("sx"))
        ),
        0,
    ).cast("long")
    btw = gt.agg(F.sum(btw_term).cast("long").alias("tb_micro"))
    total = rows_t.agg(F.sum("t_micro").cast("long").alias("tt_micro"))
    return (
        total.crossJoin(F.broadcast(btw)).crossJoin(F.broadcast(tot))
        .select(
            F.round(F.col("tt_micro") / 1e6 / F.col("n"), 6).alias("theil_total"),
            F.round(F.col("tb_micro") / 1e6, 6).alias("theil_between"),
            F.round(
                F.col("tt_micro") / 1e6 / F.col("n") - F.col("tb_micro") / 1e6, 6
            ).alias("theil_within"),
        )
    )


# --------------------------------------------------------------------------
# batch 61: association rules (support/confidence/lift)


_AR_MIN_SUPP = 20


@query(
    "assoc_rules",
    f"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       sized AS (SELECT l_orderkey FROM op GROUP BY l_orderkey
                 HAVING count(*) BETWEEN 2 AND 20),
       b AS (SELECT op.* FROM op JOIN sized USING (l_orderkey)),
       nb AS (SELECT count(DISTINCT l_orderkey)::BIGINT AS n FROM b),
       item AS (SELECT l_partkey, count(*)::BIGINT AS c1 FROM b GROUP BY 1),
       co AS (
         SELECT x.l_partkey AS a, y.l_partkey AS bpart, count(*)::BIGINT AS c2
         FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey
                          AND x.l_partkey < y.l_partkey
         GROUP BY 1, 2 HAVING count(*) >= {_AR_MIN_SUPP}),
       rules AS (
         SELECT co.a AS antecedent, co.bpart AS consequent, co.c2,
                ia.c1 AS c_ant, ic.c1 AS c_con, nb.n
         FROM co JOIN item ia ON ia.l_partkey = co.a
                 JOIN item ic ON ic.l_partkey = co.bpart
                 CROSS JOIN nb
         UNION ALL
         SELECT co.bpart, co.a, co.c2, ic.c1, ia.c1, nb.n
         FROM co JOIN item ia ON ia.l_partkey = co.a
                 JOIN item ic ON ic.l_partkey = co.bpart
                 CROSS JOIN nb)
       SELECT antecedent, consequent, c2 AS pair_count,
              round(c2::DOUBLE / n, 6) AS support,
              round(c2::DOUBLE / c_ant, 6) AS confidence,
              round(c2::DOUBLE * n / (c_ant::DOUBLE * c_con), 6) AS lift
       FROM rules""",
)
def q_assoc_rules(spark, sf_dir):
    """Association rules over co-purchase baskets (Agrawal & Srikant,
    VLDB 1994 — Apriori's 2-itemset tier): every frequent pair
    (support ≥ 20 baskets) emits both directed rules a→b
    with support, confidence c(ab)/c(a), and lift c(ab)·n/(c(a)·c(b)).
    The pair census is the SAME bounded-basket self-join `item_cosine`
    and `butterfly_count` share (support threshold = map-side partial
    agg + HAVING, the Apriori anti-monotone prune); singleton counts
    attach by two broadcast-size joins. All counts exact; the three
    ratios are one division each. The recommender/basket workhorse on
    which `rec_coverage`'s catalogs are built."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        op.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("bs"))
        .where((F.col("bs") >= 2) & (F.col("bs") <= 20)).select("l_orderkey")
    )
    b = op.join(sized, "l_orderkey").localCheckpoint(eager=True)
    nb = b.agg(F.count_distinct("l_orderkey").cast("long").alias("n"))
    item = b.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    co = (
        b.alias("x").join(b.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .groupBy(F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("bpart"))
        .agg(F.count(F.lit(1)).cast("long").alias("c2"))
        .where(F.col("c2") >= _AR_MIN_SUPP)
    )
    base = (
        co.join(item.selectExpr("l_partkey AS a", "c1 AS c_ant"), "a")
        .join(item.selectExpr("l_partkey AS bpart", "c1 AS c_con"), "bpart")
        .crossJoin(F.broadcast(nb))
    )
    fwd = base.select(
        F.col("a").alias("antecedent"), F.col("bpart").alias("consequent"),
        "c2", "c_ant", "c_con", "n",
    )
    rev = base.select(
        F.col("bpart").alias("antecedent"), F.col("a").alias("consequent"),
        "c2", F.col("c_con").alias("c_ant"), F.col("c_ant").alias("c_con"), "n",
    )
    rules = fwd.unionByName(rev)
    return rules.select(
        "antecedent", "consequent", F.col("c2").alias("pair_count"),
        F.round(F.col("c2").cast("double") / F.col("n"), 6).alias("support"),
        F.round(F.col("c2").cast("double") / F.col("c_ant"), 6).alias("confidence"),
        F.round(
            F.col("c2").cast("double") * F.col("n")
            / (F.col("c_ant").cast("double") * F.col("c_con")), 6
        ).alias("lift"),
    )


# --------------------------------------------------------------------------
# batch 62: WL graph colors, Hill diversity numbers, Simpson's paradox audit

_WL_ROUNDS = 3


def _wl_sql(rounds: int = _WL_ROUNDS) -> str:
    parts = [
        """op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       sized AS MATERIALIZED (SELECT l_orderkey FROM op GROUP BY l_orderkey
                 HAVING count(*) BETWEEN 2 AND 20),
       bb AS MATERIALIZED (SELECT op.* FROM op JOIN sized USING (l_orderkey)),
       e AS MATERIALIZED (
         SELECT DISTINCT a.l_partkey AS u, b2.l_partkey AS v
         FROM bb a JOIN bb b2 ON a.l_orderkey = b2.l_orderkey
                            AND a.l_partkey < b2.l_partkey),
       sym AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
       c0 AS MATERIALIZED (
         SELECT u AS node, count(*)::BIGINT AS color FROM sym GROUP BY u)"""
    ]
    prev = "c0"
    for r in range(1, rounds + 1):
        sig = (
            f"concat(c.color::VARCHAR, '|', "
            f"string_agg(cn.color::VARCHAR, ',' ORDER BY cn.color::VARCHAR))"
        )
        parts.append(
            f"c{r} AS MATERIALIZED (\n"
            f"         SELECT s.u AS node, "
            f"{md5_int_sql(sig)}::BIGINT AS color\n"
            f"         FROM sym s JOIN {prev} c ON c.node = s.u\n"
            f"                    JOIN {prev} cn ON cn.node = s.v\n"
            f"         GROUP BY s.u, c.color)"
        )
        prev = f"c{r}"
    return (
        "WITH " + ",\n       ".join(parts)
        + f"\n       SELECT color, count(*)::BIGINT AS n_nodes "
        f"FROM {prev} GROUP BY color"
    )


@query("wl_colors", _wl_sql())
def q_wl_colors(spark, sf_dir):
    """1-dimensional Weisfeiler-Lehman color refinement (Weisfeiler &
    Lehman 1968; Shervashidze et al., JMLR 2011's WL graph kernel) on
    the part co-purchase graph: start from degree colors, then each
    round re-colors every node with a hash of (own color | sorted
    multiset of neighbor colors), 3 rounds. The final color histogram
    is the WL fingerprint — the structural-role census used for graph
    kernels, isomorphism screening, and role-equivalent node dedup
    (two parts with identical 3-hop neighborhood structure share a
    color). Per round: ONE join of the edge list with the color frame
    + one sorted string_agg groupBy — the same shuffle shape as a CC
    round; colors are md5-hashed to 60-bit ints (pinned cross-engine
    hash), and the neighbor-multiset string sorts LEXICOGRAPHICALLY on
    both engines (multiset-preserving; numeric vs string sort was the
    one cross-engine trap here). Oracle = the identical 3-round unroll (MATERIALIZED,
    same discipline as `kcore_members`)."""
    from pliers_spark.functions.hashing import md5_int as _mi

    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        op.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("bs"))
        .where((F.col("bs") >= 2) & (F.col("bs") <= 20)).select("l_orderkey")
    )
    b = op.join(sized, "l_orderkey")
    e = (
        b.alias("x").join(b.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("u"), F.col("y.l_partkey").alias("v"))
        .distinct()
    )
    sym = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    colors = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("color")).withColumnRenamed("u", "node")
    for _ in range(_WL_ROUNDS):
        nb = sym.join(colors.withColumnRenamed("node", "u").withColumnRenamed("color", "c_own"), "u").join(
            colors.withColumnRenamed("node", "v").withColumnRenamed("color", "c_nb"), "v"
        )
        sig = F.concat(
            F.col("c_own").cast("string"), F.lit("|"),
            F.concat_ws(",", F.sort_array(F.collect_list(F.col("c_nb").cast("string")))),
        )
        colors = (
            nb.groupBy(F.col("u").alias("node"), "c_own")
            .agg(_mi(sig).alias("color"))
            .select("node", "color")
            .localCheckpoint(eager=True)
        )
    return colors.groupBy("color").agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))


@query(
    "hill_numbers",
    """WITH cnt AS (
         SELECT source, w, count(*)::BIGINT AS c FROM (
           SELECT source, unnest(string_split(trim(text), ' ')) AS w
           FROM documents)
         GROUP BY 1, 2),
       st AS (
         SELECT source, count(*)::BIGINT AS q0, sum(c)::BIGINT AS n,
                sum(c::HUGEINT * (c - 1)::HUGEINT) AS c2
         FROM cnt GROUP BY source),
       ent AS (
         SELECT cnt.source,
                sum(round(-1e6 * (cnt.c::DOUBLE / st.n)
                          * ln(cnt.c::DOUBLE / st.n))::BIGINT) AS h_micro
         FROM cnt JOIN st USING (source) GROUP BY cnt.source)
       SELECT st.source, st.q0 AS hill_q0,
              round(ent.h_micro / 1e6, 6) AS shannon_h,
              round(exp(ent.h_micro / 1e6), 6) AS hill_q1,
              round((st.n::DOUBLE * (st.n - 1)) / c2::DOUBLE, 6) AS hill_q2
       FROM st JOIN ent USING (source)""",
)
def q_hill_numbers(spark, sf_dir):
    """Hill diversity numbers per source (Hill, Ecology 1973 — the
    unified diversity family): q=0 species richness (distinct tokens,
    exact), q=1 exp(Shannon H) with H from micro-unit −p·ln p terms
    (exact integer sum; ln/exp parity pinned by `pmi_collocations` and
    the existing exp users), q=2 inverse Simpson from the EXACT
    unbiased concentration Σc(c−1)/(N(N−1)) — all integer sufficient
    statistics, one float expression per output. The vocabulary-
    diversity profile a mixture designer reads next to `missing_mass`
    and `mattr_diversity`: q0 counts the tail, q2 weighs the head, q1
    balances — sources whose q2 ≪ q1 are head-heavy boilerplate."""
    d = _docs(spark, sf_dir)
    dec = "decimal(38,0)"
    cnt = (
        d.select("source", F.explode(T.tokenize(F.col("text"))).alias("w"))
        .groupBy("source", "w").agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    st = cnt.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("q0"),
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c").cast(dec) * (F.col("c") - 1).cast(dec)).cast(dec).alias("c2"),
    )
    p = F.col("c").cast("double") / F.col("n")
    ent = (
        cnt.join(F.broadcast(st.select("source", "n")), "source")
        .select("source", F.round(F.lit(-1e6) * p * F.log(p), 0).cast("long").alias("t"))
        .groupBy("source").agg(F.sum("t").cast("long").alias("h_micro"))
    )
    return st.join(ent, "source").select(
        "source", F.col("q0").alias("hill_q0"),
        F.round(F.col("h_micro") / 1e6, 6).alias("shannon_h"),
        F.round(F.exp(F.col("h_micro") / 1e6), 6).alias("hill_q1"),
        F.round(
            (F.col("n").cast("double") * (F.col("n") - 1)) / F.col("c2").cast("double"), 6
        ).alias("hill_q2"),
    )


@query(
    "simpsons_paradox",
    """WITH base AS (
         SELECT source, len(string_split(trim(text), ' '))::BIGINT AS x,
                n_chars::BIGINT AS y
         FROM documents),
       grp AS (
         SELECT source, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
                sum(y)::BIGINT AS sy,
                sum(x::HUGEINT * y::HUGEINT) AS sxy,
                sum(x::HUGEINT * x::HUGEINT) AS sxx
         FROM base GROUP BY source),
       pool AS (
         SELECT sum(n)::BIGINT AS n, sum(sx)::BIGINT AS sx, sum(sy)::BIGINT AS sy,
                sum(sxy) AS sxy, sum(sxx) AS sxx
         FROM grp)
       SELECT g.source, g.n AS n_docs,
              round((g.n * g.sxy - g.sx::HUGEINT * g.sy)::DOUBLE
                    / (g.n * g.sxx - g.sx::HUGEINT * g.sx)::DOUBLE, 6) AS slope,
              round((p.n * p.sxy - p.sx::HUGEINT * p.sy)::DOUBLE
                    / (p.n * p.sxx - p.sx::HUGEINT * p.sx)::DOUBLE, 6) AS pooled_slope,
              (sign((g.n * g.sxy - g.sx::HUGEINT * g.sy)::DOUBLE)
               <> sign((p.n * p.sxy - p.sx::HUGEINT * p.sy)::DOUBLE)) AS reversed
       FROM grp g CROSS JOIN pool p
       WHERE (g.n * g.sxx - g.sx::HUGEINT * g.sx) > 0""",
)
def q_simpsons_paradox(spark, sf_dir):
    """Simpson's-paradox audit (Simpson, JRSS-B 1951): per-source OLS
    slope of chars~tokens vs the pooled slope, flagging sources whose
    within-group trend REVERSES the aggregate trend — the aggregation
    bias that invalidates corpus-level regressions built on
    `heteroscedasticity_bp`'s fit when group composition confounds.
    Slope numerators/denominators are exact HUGEINT (n·Σxy − Σx·Σy),
    so the reversal flag is the sign of an exact integer — no float
    threshold anywhere; the reported slopes are one division each.
    One census per grain, pooled stats from the group census (map-side
    merge, no second scan)."""
    d = _docs(spark, sf_dir)
    dec = "decimal(38,0)"
    base = d.select(
        "source",
        F.size(T.tokenize(F.col("text"))).cast("long").alias("x"),
        F.col("n_chars").cast("long").alias("y"),
    )
    grp = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).cast(dec).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).cast(dec).alias("sxx"),
    ).localCheckpoint(eager=True)
    pool = grp.agg(
        F.sum("n").cast("long").alias("pn"), F.sum("sx").cast("long").alias("psx"),
        F.sum("sy").cast("long").alias("psy"),
        F.sum("sxy").cast(dec).alias("psxy"), F.sum("sxx").cast(dec).alias("psxx"),
    )
    j = grp.crossJoin(F.broadcast(pool))
    gnum = (F.col("n") * F.col("sxy") - F.col("sx").cast(dec) * F.col("sy")).cast(dec)
    gden = (F.col("n") * F.col("sxx") - F.col("sx").cast(dec) * F.col("sx")).cast(dec)
    pnum = (F.col("pn") * F.col("psxy") - F.col("psx").cast(dec) * F.col("psy")).cast(dec)
    pden = (F.col("pn") * F.col("psxx") - F.col("psx").cast(dec) * F.col("psx")).cast(dec)
    return (
        j.where(gden > 0)
        .select(
            "source", F.col("n").alias("n_docs"),
            F.round(gnum.cast("double") / gden.cast("double"), 6).alias("slope"),
            F.round(pnum.cast("double") / pden.cast("double"), 6).alias("pooled_slope"),
            (F.signum(gnum.cast("double")) != F.signum(pnum.cast("double"))).alias("reversed"),
        )
    )


# --------------------------------------------------------------------------
# batch 63: Z-order locality audit, Gini decision stump, CMH pooled odds


def _morton_sql(xe: str, ye: str, bits: int = 8) -> str:
    terms = []
    for j in range(bits):
        terms.append(f"((({xe} >> {j}) & 1) << {2 * j + 1})")
        terms.append(f"((({ye} >> {j}) & 1) << {2 * j})")
    return "(" + " | ".join(terms) + ")"


@query(
    "zorder_locality",
    f"""WITH cell AS (
         SELECT DISTINCT (user_id % 256)::BIGINT AS x,
                date_diff('day', DATE '2024-01-01', ts::DATE)::BIGINT AS y
         FROM events),
       keyed AS (
         SELECT x, y, {_morton_sql('x', 'y')}::BIGINT AS zkey,
                (x * 64 + y)::BIGINT AS rowmajor
         FROM cell),
       z AS (
         SELECT abs(x - lag(x) OVER (ORDER BY zkey, x, y))
              + abs(y - lag(y) OVER (ORDER BY zkey, x, y)) AS d
         FROM keyed),
       r AS (
         SELECT abs(x - lag(x) OVER (ORDER BY rowmajor))
              + abs(y - lag(y) OVER (ORDER BY rowmajor)) AS d
         FROM keyed)
       SELECT 'zorder' AS ordering, count(d)::BIGINT AS n_steps,
              sum(d)::BIGINT AS total_dist,
              round(sum(d)::DOUBLE / count(d), 6) AS avg_manhattan
       FROM z WHERE d IS NOT NULL
       UNION ALL
       SELECT 'rowmajor', count(d)::BIGINT, sum(d)::BIGINT,
              round(sum(d)::DOUBLE / count(d), 6)
       FROM r WHERE d IS NOT NULL""",
)
def q_zorder_locality(spark, sf_dir):
    """Z-order (Morton) clustering locality audit (Morton 1966; the
    multi-dimensional sort key behind Delta/Iceberg Z-ORDER table
    clustering): interleave the bits of the (user-bucket, day) cell
    coordinates into one key, then measure the average Manhattan step
    between CONSECUTIVE cells under z-order vs row-major order. Low
    z-order step distance is exactly why multi-dimensional min/max
    file pruning works when queries filter on EITHER dimension — the
    layout-design evidence behind `sources/layout.py`'s bucketing at
    10^12-row scale. Interleave is pure bit arithmetic (16 shift/mask
    terms, codegen, no UDF); step distances are exact integers, one
    division per ordering."""
    ev = _events(spark, sf_dir)
    cell = ev.select(
        (F.col("user_id") % 256).cast("long").alias("x"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).cast("long").alias("y"),
    ).distinct()
    zkey = None
    for j in range(8):
        tx = F.shiftleft(F.shiftright(F.col("x"), j).bitwiseAND(F.lit(1)), 2 * j + 1)
        ty = F.shiftleft(F.shiftright(F.col("y"), j).bitwiseAND(F.lit(1)), 2 * j)
        zkey = tx.bitwiseOR(ty) if zkey is None else zkey.bitwiseOR(tx).bitwiseOR(ty)
    keyed = cell.select(
        "x", "y", zkey.cast("long").alias("zkey"),
        (F.col("x") * 64 + F.col("y")).cast("long").alias("rowmajor"),
    ).localCheckpoint(eager=True)

    def steps(order_cols, name):
        w = Window.orderBy(*order_cols)
        d = (
            F.abs(F.col("x") - F.lag("x").over(w))
            + F.abs(F.col("y") - F.lag("y").over(w))
        )
        return (
            keyed.select(d.alias("d")).where(F.col("d").isNotNull())
            .agg(
                F.lit(name).alias("ordering"),
                F.count("d").cast("long").alias("n_steps"),
                F.sum("d").cast("long").alias("total_dist"),
                F.round(F.sum("d").cast("double") / F.count("d"), 6).alias("avg_manhattan"),
            )
            .select("ordering", "n_steps", "total_dist", "avg_manhattan")
        )

    return steps(["zkey", "x", "y"], "zorder").unionByName(steps(["rowmajor"], "rowmajor"))


@query(
    "gini_stump",
    """WITH base AS (
         SELECT n_chars::BIGINT AS x,
                CASE WHEN lang = 'en' THEN 1 ELSE 0 END::BIGINT AS y
         FROM documents),
       vals AS (
         SELECT x, count(*)::BIGINT AS n, sum(y)::BIGINT AS pos
         FROM base GROUP BY x),
       run AS (
         SELECT x,
                sum(n) OVER (ORDER BY x) AS nl,
                sum(pos) OVER (ORDER BY x) AS pl,
                sum(n) OVER () AS nt, sum(pos) OVER () AS pt
         FROM vals),
       gain AS (
         SELECT x AS threshold, nl, pl, nt, pt,
                round(1e9 * (
                  (2.0 * pt / nt) * (1.0 - pt::DOUBLE / nt)
                  - (nl::DOUBLE / nt) * (2.0 * pl / nl) * (1.0 - pl::DOUBLE / nl)
                  - ((nt - nl)::DOUBLE / nt) * (2.0 * (pt - pl) / (nt - nl))
                      * (1.0 - (pt - pl)::DOUBLE / (nt - nl))
                ))::BIGINT AS gain_nano
         FROM run WHERE nl < nt)
       SELECT threshold, nl::BIGINT AS n_left, pl::BIGINT AS pos_left,
              (nt - nl)::BIGINT AS n_right, (pt - pl)::BIGINT AS pos_right,
              round(gain_nano / 1e9, 6) AS gini_gain
       FROM gain
       ORDER BY gain_nano DESC, threshold LIMIT 1""",
)
def q_gini_stump(spark, sf_dir):
    """Optimal decision stump by Gini impurity gain (Breiman et al.,
    CART 1984): the single best threshold on document length for
    predicting lang='en' — parent Gini minus the size-weighted child
    Ginis, maximized over every distinct split point. The CART split
    search is THE inner loop of tree/GBM training; this is its
    distributed shape: one value census, running class counts from ONE
    sort window (every candidate's left/right 2×2 comes from the same
    pass — no per-candidate scan), gain rounded to nano-units for a
    deterministic argmax (ties → smallest threshold,
    TakeOrderedAndProject). All counts exact integers."""
    d = _docs(spark, sf_dir)
    base = d.select(
        F.col("n_chars").cast("long").alias("x"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    vals = base.groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("y").cast("long").alias("pos")
    )
    wrun = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    run = vals.select(
        "x",
        F.sum("n").over(wrun).alias("nl"), F.sum("pos").over(wrun).alias("pl"),
        F.sum("n").over(wall).alias("nt"), F.sum("pos").over(wall).alias("pt"),
    ).where(F.col("nl") < F.col("nt"))
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    gain = (
        (F.lit(2.0) * d_("pt") / d_("nt")) * (F.lit(1.0) - d_("pt") / d_("nt"))
        - (d_("nl") / d_("nt")) * (F.lit(2.0) * d_("pl") / d_("nl"))
          * (F.lit(1.0) - d_("pl") / d_("nl"))
        - ((d_("nt") - d_("nl")) / d_("nt"))
          * (F.lit(2.0) * (d_("pt") - d_("pl")) / (d_("nt") - d_("nl")))
          * (F.lit(1.0) - (d_("pt") - d_("pl")) / (d_("nt") - d_("nl")))
    )
    g = run.select(
        F.col("x").alias("threshold"),
        F.col("nl").cast("long").alias("n_left"),
        F.col("pl").cast("long").alias("pos_left"),
        (F.col("nt") - F.col("nl")).cast("long").alias("n_right"),
        (F.col("pt") - F.col("pl")).cast("long").alias("pos_right"),
        F.round(F.lit(1e9) * gain, 0).cast("long").alias("gain_nano"),
    )
    return (
        g.orderBy(F.desc("gain_nano"), "threshold").limit(1)
        .select(
            "threshold", "n_left", "pos_left", "n_right", "pos_right",
            F.round(F.col("gain_nano") / 1e9, 6).alias("gini_gain"),
        )
    )


# --------------------------------------------------------------------------
# batch 64: histogram quantile audit, regression influence, risk-coverage


@query(
    "histogram_quantile_audit",
    """WITH x AS (SELECT doc_id, n_chars::BIGINT AS x FROM documents),
       rng AS (SELECT min(x)::BIGINT AS mn, max(x)::BIGINT AS mx,
                      count(*)::BIGINT AS n FROM x),
       hist AS (
         SELECT least(9, ((x.x - r.mn) * 10) // (r.mx - r.mn + 1))::BIGINT AS b,
                count(*)::BIGINT AS c
         FROM x CROSS JOIN rng r GROUP BY 1),
       cum AS (
         SELECT b, c, sum(c) OVER (ORDER BY b) AS cum,
                coalesce(sum(c) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS cum_prev
         FROM hist),
       qs AS (SELECT unnest([50, 90])::BIGINT AS q),
       tgt AS (
         SELECT qs.q, ((r.n * qs.q + 99) // 100)::BIGINT AS k, r.mn, r.mx, r.n
         FROM qs CROSS JOIN rng r),
       est AS (
         SELECT t.q, t.k,
                round(t.mn + (c.b + (t.k - c.cum_prev)::DOUBLE / c.c)
                             * (t.mx - t.mn + 1) / 10.0, 6) AS hist_estimate
         FROM tgt t JOIN cum c ON c.cum >= t.k AND c.cum_prev < t.k),
       exact AS (
         SELECT t.q, min(rx.x)::BIGINT AS exact_value
         FROM tgt t JOIN (
           SELECT x, row_number() OVER (ORDER BY x, doc_id) AS rn FROM x) rx
           ON rx.rn = t.k
         GROUP BY t.q)
       SELECT e.q AS percentile, ex.exact_value, e.hist_estimate,
              round(abs(e.hist_estimate - ex.exact_value), 6) AS abs_error
       FROM est e JOIN exact ex USING (q)""",
)
def q_histogram_quantile_audit(spark, sf_dir):
    """Mergeable equi-width-histogram quantile estimation audited
    against exact order statistics (the `kmv_rollup`/`ams_f2` audit
    discipline applied to the quantile sketch every engine ships as
    column stats): 10 integer-edged buckets over doc length, p50/p90
    read off the cumulative histogram with within-bucket linear
    interpolation, vs the exact nearest-rank values. Equi-width
    histograms with shared edges merge LOSSLESSLY across partitions
    (counts add — unlike quantiles themselves), which is why they are
    the distributed-stats primitive; the audit quantifies the only
    loss (within-bucket interpolation). Bucket assignment is exact
    integer arithmetic; the interpolation is one identical float
    expression per percentile."""
    d = _docs(spark, sf_dir)
    x = d.select("doc_id", F.col("n_chars").cast("long").alias("x"))
    rng = x.agg(
        F.min("x").cast("long").alias("mn"), F.max("x").cast("long").alias("mx"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    xr = x.crossJoin(F.broadcast(rng))
    hist = xr.groupBy(
        F.least(F.lit(9), F.floor((F.col("x") - F.col("mn")) * 10 / (F.col("mx") - F.col("mn") + 1))).cast("long").alias("b")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    wb = Window.orderBy("b")
    cum = hist.select(
        "b", "c",
        F.sum("c").over(wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("cum"),
        F.coalesce(
            F.sum("c").over(wb.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
        ).alias("cum_prev"),
    )
    qs = spark.createDataFrame([(50,), (90,)], "q long")
    tgt = qs.crossJoin(F.broadcast(rng)).select(
        "q", F.floor((F.col("n") * F.col("q") + 99) / 100).cast("long").alias("k"), "mn", "mx", "n"
    )
    est = (
        tgt.join(F.broadcast(cum), (F.col("cum") >= F.col("k")) & (F.col("cum_prev") < F.col("k")))
        .select(
            "q", "k",
            F.round(
                F.col("mn")
                + (F.col("b") + (F.col("k") - F.col("cum_prev")).cast("double") / F.col("c"))
                * (F.col("mx") - F.col("mn") + 1) / 10.0,
                6,
            ).alias("hist_estimate"),
        )
    )
    rx = x.select("x", F.row_number().over(Window.orderBy("x", "doc_id")).alias("rn"))
    exact = (
        tgt.join(rx, F.col("rn") == F.col("k"))
        .groupBy("q").agg(F.min("x").cast("long").alias("exact_value"))
    )
    return est.join(exact, "q").select(
        F.col("q").alias("percentile"), "exact_value", "hist_estimate",
        F.round(F.abs(F.col("hist_estimate") - F.col("exact_value")), 6).alias("abs_error"),
    )


@query(
    "regression_influence",
    """WITH base AS (
         SELECT doc_id, len(string_split(trim(text), ' '))::BIGINT AS x,
                n_chars::BIGINT AS y
         FROM documents),
       st AS (
         SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
                sum(x::HUGEINT * x::HUGEINT) AS sxx,
                sum(x::HUGEINT * y::HUGEINT) AS sxy,
                sum(y::HUGEINT * y::HUGEINT) AS syy
         FROM base),
       fit AS (
         SELECT n, sx, sy,
                (n * sxy - sx::HUGEINT * sy)::DOUBLE
                  / (n * sxx - sx::HUGEINT * sx)::DOUBLE AS b,
                (n * sxx - sx::HUGEINT * sx)::DOUBLE / n AS sxx_c,
                ((n * syy - sy::HUGEINT * sy)::DOUBLE
                 - ((n * sxy - sx::HUGEINT * sy)::DOUBLE
                    * (n * sxy - sx::HUGEINT * sy)::DOUBLE)
                   / (n * sxx - sx::HUGEINT * sx)::DOUBLE) / n / (n - 2) AS s2
         FROM st),
       infl AS (
         SELECT b2.doc_id,
                round(1e9 * (1.0 / f.n
                     + (b2.x - f.sx::DOUBLE / f.n) * (b2.x - f.sx::DOUBLE / f.n)
                       / f.sxx_c))::BIGINT AS lev_nano,
                round(1e9 * (
                  (b2.y - (f.sy::DOUBLE / f.n - f.b * f.sx / f.n) - f.b * b2.x)
                * (b2.y - (f.sy::DOUBLE / f.n - f.b * f.sx / f.n) - f.b * b2.x)
                * (1.0 / f.n + (b2.x - f.sx::DOUBLE / f.n) * (b2.x - f.sx::DOUBLE / f.n) / f.sxx_c)
                / (2.0 * f.s2
                   * (1.0 - (1.0 / f.n + (b2.x - f.sx::DOUBLE / f.n)
                             * (b2.x - f.sx::DOUBLE / f.n) / f.sxx_c))
                   * (1.0 - (1.0 / f.n + (b2.x - f.sx::DOUBLE / f.n)
                             * (b2.x - f.sx::DOUBLE / f.n) / f.sxx_c)))
                ))::BIGINT AS cook_nano
         FROM base b2 CROSS JOIN fit f)
       SELECT doc_id, round(lev_nano / 1e9, 6) AS leverage,
              round(cook_nano / 1e9, 6) AS cooks_d
       FROM infl
       ORDER BY cook_nano DESC, doc_id LIMIT 20""",
)
def q_regression_influence(spark, sf_dir):
    """OLS influence diagnostics for the chars~tokens fit: leverage
    h_i = 1/n + (x_i−x̄)²/Sxx and Cook's distance D_i = r_i²·h_i /
    (p·s²·(1−h_i)²) (Cook, Technometrics 1977), top-20 most influential
    documents — the single-pass influence screen that says WHICH rows
    `heteroscedasticity_bp` / `simpsons_paradox` anomalies come from
    (a handful of giant boilerplate docs can steer the whole corpus
    fit). Everything derives from ONE census of exact HUGEINT
    sufficient statistics broadcast to a second narrow pass; per-row
    leverage/Cook values are single identical float expressions
    rounded to nano-units for a deterministic top-k
    (TakeOrderedAndProject, ties → doc_id)."""
    d = _docs(spark, sf_dir)
    dec = "decimal(38,0)"
    base = d.select(
        "doc_id",
        F.size(T.tokenize(F.col("text"))).cast("long").alias("x"),
        F.col("n_chars").cast("long").alias("y"),
    )
    st = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"), F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).cast(dec).alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).cast(dec).alias("sxy"),
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).cast(dec).alias("syy"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    num_b = (F.col("n") * F.col("sxy") - F.col("sx").cast(dec) * F.col("sy")).cast("double")
    den_b = (F.col("n") * F.col("sxx") - F.col("sx").cast(dec) * F.col("sx")).cast("double")
    num_y = (F.col("n") * F.col("syy") - F.col("sy").cast(dec) * F.col("sy")).cast("double")
    fit = st.select(
        "n", "sx", "sy",
        (num_b / den_b).alias("b"),
        (den_b / F.col("n")).alias("sxx_c"),
        ((num_y - num_b * num_b / den_b) / F.col("n") / (F.col("n") - 2)).alias("s2"),
    )
    j = base.crossJoin(F.broadcast(fit))
    xbar = d_("sx") / d_("n")
    lev = F.lit(1.0) / F.col("n") + (F.col("x") - xbar) * (F.col("x") - xbar) / F.col("sxx_c")
    resid = (
        F.col("y")
        - (d_("sy") / d_("n") - F.col("b") * F.col("sx") / F.col("n"))
        - F.col("b") * F.col("x")
    )
    cook = resid * resid * lev / (
        F.lit(2.0) * F.col("s2") * (F.lit(1.0) - lev) * (F.lit(1.0) - lev)
    )
    infl = j.select(
        "doc_id",
        F.round(F.lit(1e9) * lev, 0).cast("long").alias("lev_nano"),
        F.round(F.lit(1e9) * cook, 0).cast("long").alias("cook_nano"),
    )
    return (
        infl.orderBy(F.desc("cook_nano"), "doc_id").limit(20)
        .select(
            "doc_id",
            F.round(F.col("lev_nano") / 1e9, 6).alias("leverage"),
            F.round(F.col("cook_nano") / 1e9, 6).alias("cooks_d"),
        )
    )


@query(
    "risk_coverage",
    """WITH scored AS (
         SELECT doc_id,
                round(n_chars * 1e6 / (n_chars + 500))::BIGINT AS p_micro,
                CASE WHEN lang = 'en' THEN 1 ELSE 0 END::BIGINT AS y
         FROM documents),
       pred AS (
         SELECT doc_id,
                abs(p_micro - 500000)::BIGINT AS conf,
                CASE WHEN (CASE WHEN p_micro > 500000 THEN 1 ELSE 0 END) <> y
                     THEN 1 ELSE 0 END::BIGINT AS err
         FROM scored),
       ranked AS (
         SELECT err, row_number() OVER (ORDER BY conf DESC, doc_id) AS rn,
                count(*) OVER () AS n
         FROM pred),
       pfx AS (
         SELECT rn, n, sum(err) OVER (ORDER BY rn) AS e
         FROM ranked),
       aurc AS (
         SELECT sum(round(1e9 * e::DOUBLE / rn)::BIGINT) AS aurc_nano,
                max(n) AS n
         FROM pfx),
       decile AS (
         SELECT (rn * 10) // n AS dd, max(rn) AS k, max(e) AS errors
         FROM pfx WHERE (rn * 10) % n = 0 OR rn = n
         GROUP BY (rn * 10) // n)
       SELECT round(d.k::DOUBLE / a.n, 6) AS coverage, d.k::BIGINT AS n_kept,
              d.errors::BIGINT AS errors,
              round(d.errors::DOUBLE / d.k, 6) AS risk,
              round(a.aurc_nano::DOUBLE / a.n / 1e9, 6) AS aurc
       FROM decile d CROSS JOIN aurc a""",
)
def q_risk_coverage(spark, sf_dir):
    """Selective-prediction risk-coverage curve + AURC (Geifman &
    El-Yaniv, NeurIPS 2017): rank documents by the length-based
    English-classifier's confidence |p−½|, then report the error rate
    among the top-k at each coverage decile and the area under the
    full risk-coverage curve (mean prefix risk). THE abstention audit
    for any classifier whose scores gate `quality_filter`-style keep
    decisions: if risk does not drop as coverage shrinks, the
    confidence is uninformative and thresholding it is theater. All
    counts are exact prefix sums over one sorted window (conf ties →
    doc_id); per-prefix risks round to nano before the AURC sum."""
    d = _docs(spark, sf_dir)
    scored = d.select(
        "doc_id",
        F.round(F.col("n_chars") * 1e6 / (F.col("n_chars") + 500), 0).cast("long").alias("p_micro"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    pred = scored.select(
        "doc_id",
        F.abs(F.col("p_micro") - 500000).cast("long").alias("conf"),
        ((F.col("p_micro") > 500000).cast("long") != F.col("y")).cast("long").alias("err"),
    )
    wr = Window.orderBy(F.desc("conf"), "doc_id")
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = pred.select(
        "err", F.row_number().over(wr).alias("rn"), F.count(F.lit(1)).over(wall).alias("n")
    )
    pfx = ranked.select(
        "rn", "n",
        F.sum("err").over(Window.orderBy("rn").rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("e"),
    ).localCheckpoint(eager=True)
    aurc = pfx.agg(
        F.sum(F.round(F.lit(1e9) * F.col("e").cast("double") / F.col("rn"), 0).cast("long")).alias("aurc_nano"),
        F.max("n").alias("n"),
    )
    decile = (
        pfx.where(((F.col("rn") * 10) % F.col("n") == 0) | (F.col("rn") == F.col("n")))
        .groupBy(F.floor(F.col("rn") * 10 / F.col("n")).alias("dd"))
        .agg(F.max("rn").alias("k"), F.max("e").alias("errors"))
    )
    return decile.crossJoin(F.broadcast(aurc)).select(
        F.round(F.col("k").cast("double") / F.col("n"), 6).alias("coverage"),
        F.col("k").cast("long").alias("n_kept"),
        F.col("errors").cast("long").alias("errors"),
        F.round(F.col("errors").cast("double") / F.col("k"), 6).alias("risk"),
        F.round(F.col("aurc_nano").cast("double") / F.col("n") / 1e9, 6).alias("aurc"),
    )


# --------------------------------------------------------------------------
# batch 65: rolling distinct users, Hill tail index, energy distance

_RDU_W = 7


@query(
    "rolling_distinct_users",
    f"""WITH act AS (
         SELECT DISTINCT user_id,
                date_diff('day', DATE '2024-01-01', ts::DATE)::BIGINT AS d
         FROM events),
       days AS (SELECT min(d)::BIGINT AS d0, max(d)::BIGINT AS d1 FROM act),
       seg AS (
         SELECT user_id, d AS lo,
                least(d + {_RDU_W - 1},
                      coalesce(lead(d) OVER (PARTITION BY user_id ORDER BY d) - 1,
                               d + {_RDU_W - 1})) AS hi
         FROM act),
       delta AS (
         SELECT lo AS d, 1::BIGINT AS v FROM seg
         UNION ALL
         SELECT hi + 1, -1::BIGINT FROM seg),
       grid AS (
         SELECT unnest(range(d0, d1 + 1))::BIGINT AS day FROM days),
       summed AS (SELECT d, sum(v)::BIGINT AS v FROM delta GROUP BY d)
       SELECT g.day,
              sum(coalesce(s.v, 0)) OVER (ORDER BY g.day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                AS distinct_users_{_RDU_W}d
       FROM grid g LEFT JOIN summed s ON s.d = g.day""",
)
def q_rolling_distinct_users(spark, sf_dir):
    """Rolling 7-day distinct active users per day — the DAU/WAU-style
    window-distinct that is NON-algebraic (distinct can't be merged
    across window slides), recast EXACTLY as an interval sum: each
    (user, active-day) covers the window-end days [d, min(d+6,
    next_active−1)] during which it is that user's MOST RECENT
    activity; a user is in the 7-day window of day D iff exactly one
    of its activity days covers D. Emit +1/−1 at the interval bounds
    (the diff-array trick) and one running sum over the day grid
    reconstructs every window's exact distinct count — per-user lead()
    plus one prefix sum, NO per-window distinct, no 7× data blowup.
    This is the standard scale rewrite of sliding COUNT(DISTINCT) that
    exact-dedup engines use for retention dashboards."""
    ev = _events(spark, sf_dir)
    act = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).cast("long").alias("d"),
    ).distinct()
    days = act.agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    wlead = Window.partitionBy("user_id").orderBy("d")
    seg = act.select(
        F.col("d").alias("lo"),
        F.least(
            F.col("d") + (_RDU_W - 1),
            F.coalesce(F.lead("d").over(wlead) - 1, F.col("d") + (_RDU_W - 1)),
        ).alias("hi"),
    )
    delta = seg.select(F.col("lo").alias("d"), F.lit(1).cast("long").alias("v")).unionByName(
        seg.select((F.col("hi") + 1).alias("d"), F.lit(-1).cast("long").alias("v"))
    )
    summed = delta.groupBy("d").agg(F.sum("v").cast("long").alias("v"))
    grid = (
        days.select(F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"))
    )
    wrun = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        grid.join(summed.withColumnRenamed("d", "day"), "day", "left")
        .select(
            "day",
            F.sum(F.coalesce("v", F.lit(0))).over(wrun).cast("long").alias(f"distinct_users_{_RDU_W}d"),
        )
    )


_HILL_TAIL_K = 100


@query(
    "hill_tail_index",
    f"""WITH ranked AS (
         SELECT n_chars::BIGINT AS x,
                row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn
         FROM documents),
       xk AS (SELECT x AS x_k FROM ranked WHERE rn = {_HILL_TAIL_K + 1}),
       terms AS (
         SELECT round(1e6 * ln(r.x::DOUBLE / k.x_k))::BIGINT AS t
         FROM ranked r CROSS JOIN xk k WHERE r.rn <= {_HILL_TAIL_K})
       SELECT {_HILL_TAIL_K}::BIGINT AS k,
              (SELECT x_k FROM xk) AS threshold,
              sum(t)::BIGINT AS sum_log_micro,
              round({_HILL_TAIL_K} * 1e6 / sum(t), 6) AS hill_alpha
       FROM terms""",
)
def q_hill_tail_index(spark, sf_dir):
    """Hill tail-index estimator (Hill, Ann. Stat. 1975) for the
    document-length distribution: α̂ = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the
    top-k order statistics — the peaks-over-threshold answer to "how
    heavy is the long-document tail", which decides whether length
    caps (`domain_cap`-style) are cosmetic or load-bearing at 10^12
    docs (α ≤ 2 means the VARIANCE of shard sizes is infinite and
    length-stratified packing is mandatory). `zipf_alpha` fits token
    frequencies; this fits the doc-size tail. Top-k+1 selection is one
    TakeOrderedAndProject-shaped window (ties → doc_id); log ratios
    round once to micro-units so the sum is exact; one division."""
    d = _docs(spark, sf_dir)
    ranked = d.select(
        F.col("n_chars").cast("long").alias("x"),
        F.row_number().over(Window.orderBy(F.desc("n_chars"), "doc_id")).alias("rn"),
    ).where(F.col("rn") <= _HILL_TAIL_K + 1).localCheckpoint(eager=True)
    xk = ranked.where(F.col("rn") == _HILL_TAIL_K + 1).select(F.col("x").alias("x_k"))
    terms = (
        ranked.where(F.col("rn") <= _HILL_TAIL_K)
        .crossJoin(F.broadcast(xk))
        .select(
            F.round(F.lit(1e6) * F.log(F.col("x").cast("double") / F.col("x_k")), 0)
            .cast("long").alias("t"),
            "x_k",
        )
    )
    return terms.groupBy("x_k").agg(
        F.lit(_HILL_TAIL_K).cast("long").alias("k"),
        F.col("x_k").alias("threshold"),
        F.sum("t").cast("long").alias("sum_log_micro"),
        F.round(F.lit(_HILL_TAIL_K * 1e6) / F.sum("t"), 6).alias("hill_alpha"),
    ).select("k", "threshold", "sum_log_micro", "hill_alpha")


@query(
    "energy_distance",
    """WITH x AS (
         SELECT CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS g, n_chars::BIGINT AS v,
                doc_id
         FROM documents),
       cnt AS (SELECT sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)::BIGINT AS nx,
                      sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)::BIGINT AS ny
               FROM x),
       pooled AS (
         SELECT g, v,
                row_number() OVER (ORDER BY v, doc_id) AS r_all,
                row_number() OVER (PARTITION BY g ORDER BY v, doc_id) AS r_g,
                count(*) OVER () AS n
         FROM x),
       pair AS (
         -- sum of |z_i - z_j| over i<j within a sorted multiset:
         -- sum z_i * (2*rank_i - n - 1); cross-group sum = pooled - within
         SELECT
           sum(v::HUGEINT * (2 * r_all - n - 1)) AS s_all,
           sum(CASE WHEN g = 0 THEN v::HUGEINT
                      * (2 * r_g - (SELECT nx FROM cnt) - 1) END) AS s_xx,
           sum(CASE WHEN g = 1 THEN v::HUGEINT
                      * (2 * r_g - (SELECT ny FROM cnt) - 1) END) AS s_yy
         FROM pooled)
       SELECT c.nx, c.ny,
              round((p.s_all - p.s_xx - p.s_yy)::DOUBLE / (c.nx::HUGEINT * c.ny)::DOUBLE, 6)
                AS mean_cross_dist,
              round(p.s_xx::DOUBLE * 2 / (c.nx::HUGEINT * c.nx)::DOUBLE, 6)
                AS mean_within_x,
              round(p.s_yy::DOUBLE * 2 / (c.ny::HUGEINT * c.ny)::DOUBLE, 6)
                AS mean_within_y,
              round(2.0 * (p.s_all - p.s_xx - p.s_yy)::DOUBLE
                        / (c.nx::HUGEINT * c.ny)::DOUBLE
                    - p.s_xx::DOUBLE * 2 / (c.nx::HUGEINT * c.nx)::DOUBLE
                    - p.s_yy::DOUBLE * 2 / (c.ny::HUGEINT * c.ny)::DOUBLE, 6)
                AS energy_distance
       FROM pair p CROSS JOIN cnt c""",
)
def q_energy_distance(spark, sf_dir):
    """Energy distance between the English and non-English document-
    length distributions (Székely & Rizzo 2004): E = 2·E|X−Y| −
    E|X−X'| − E|Y−Y'| — zero iff the distributions are equal, the
    metric two-sample test KS can't match in power against scale
    alternatives. The O(n²) pairwise |·| sums collapse via the sorted
    identity Σ_{i<j}|z_i−z_j| = Σ z_i(2·rank_i − n − 1) — within-group
    sums from per-group ranks, the cross sum as pooled − within — so
    the whole statistic is THREE exact HUGEINT sums over one sorted
    scan (ties broken by doc_id make ranks deterministic; the identity
    itself is tie-safe since equal values contribute zero either
    way). Population V-statistic normalization (/n², /nx·ny)."""
    d = _docs(spark, sf_dir)
    dec = "decimal(38,0)"
    x = d.select(
        F.when(F.col("lang") == "en", 0).otherwise(1).alias("g"),
        F.col("n_chars").cast("long").alias("v"),
        "doc_id",
    )
    cnt = x.agg(
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).cast("long").alias("nx"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).cast("long").alias("ny"),
    )
    wall = Window.orderBy("v", "doc_id")
    wg = Window.partitionBy("g").orderBy("v", "doc_id")
    wn = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    pooled = x.select(
        "g", "v",
        F.row_number().over(wall).alias("r_all"),
        F.row_number().over(wg).alias("r_g"),
        F.count(F.lit(1)).over(wn).alias("n"),
    ).crossJoin(F.broadcast(cnt))
    pair = pooled.agg(
        F.sum(F.col("v").cast(dec) * (2 * F.col("r_all") - F.col("n") - 1)).cast(dec).alias("s_all"),
        F.sum(
            F.when(F.col("g") == 0, F.col("v").cast(dec) * (2 * F.col("r_g") - F.col("nx") - 1))
        ).cast(dec).alias("s_xx"),
        F.sum(
            F.when(F.col("g") == 1, F.col("v").cast(dec) * (2 * F.col("r_g") - F.col("ny") - 1))
        ).cast(dec).alias("s_yy"),
    )
    j = pair.crossJoin(F.broadcast(cnt))
    cross = (F.col("s_all") - F.col("s_xx") - F.col("s_yy")).cast("double") / (
        F.col("nx").cast(dec) * F.col("ny").cast(dec)
    ).cast("double")
    wx = F.col("s_xx").cast("double") * 2 / (F.col("nx").cast(dec) * F.col("nx").cast(dec)).cast("double")
    wy = F.col("s_yy").cast("double") * 2 / (F.col("ny").cast(dec) * F.col("ny").cast(dec)).cast("double")
    return j.select(
        "nx", "ny",
        F.round(cross, 6).alias("mean_cross_dist"),
        F.round(wx, 6).alias("mean_within_x"),
        F.round(wy, 6).alias("mean_within_y"),
        F.round(F.lit(2.0) * cross - wx - wy, 6).alias("energy_distance"),
    )


# --------------------------------------------------------------------------
# batch 66: Bradley-Terry ranking, McNemar test, Chao-Shen entropy

_BT_ROUNDS = 3


def _bt_base_sql() -> str:
    return """cnt AS MATERIALIZED (
         SELECT n_chars::BIGINT AS v, source AS s, count(*)::BIGINT AS c
         FROM documents GROUP BY 1, 2),
       vals AS MATERIALIZED (SELECT DISTINCT v FROM cnt),
       srcs AS MATERIALIZED (SELECT DISTINCT s FROM cnt),
       grid AS MATERIALIZED (
         SELECT va.v, sr.s, coalesce(c.c, 0)::BIGINT AS c
         FROM vals va CROSS JOIN srcs sr
         LEFT JOIN cnt c ON c.v = va.v AND c.s = sr.s),
       cum AS MATERIALIZED (
         SELECT v, s,
                coalesce(sum(c) OVER (PARTITION BY s ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
                  AS cumprev
         FROM grid),
       wins AS MATERIALIZED (
         SELECT a.s AS sa, b.s AS sb, sum(a.c * b.cumprev)::BIGINT AS w
         FROM cnt a JOIN cum b ON a.v = b.v AND a.s <> b.s
         GROUP BY 1, 2),
       pairs AS MATERIALIZED (
         SELECT w1.sa, w1.sb, w1.w AS w_ab,
                (w1.w + coalesce(w2.w, 0))::BIGINT AS n_ab
         FROM wins w1 LEFT JOIN wins w2 ON w2.sa = w1.sb AND w2.sb = w1.sa),
       wtot AS MATERIALIZED (
         SELECT sa AS s, sum(w_ab)::BIGINT AS w FROM pairs GROUP BY sa),
       pi0 AS MATERIALIZED (SELECT s, 1000000::BIGINT AS pi FROM srcs)"""


def _bt_round_sql(r: int) -> str:
    prev = f"pi{r - 1}"
    return f"""den{r} AS MATERIALIZED (
         SELECT p.sa AS s,
                sum(round(1e9 * p.n_ab * 1e6 / (pa.pi + pb.pi))::BIGINT) AS d_nano
         FROM pairs p JOIN {prev} pa ON pa.s = p.sa JOIN {prev} pb ON pb.s = p.sb
         GROUP BY p.sa),
       raw{r} AS MATERIALIZED (
         SELECT w.s, round(w.w::DOUBLE * 1e15 / d.d_nano)::BIGINT AS pi_raw
         FROM wtot w JOIN den{r} d ON d.s = w.s),
       pi{r} AS MATERIALIZED (
         SELECT s, round(pi_raw::DOUBLE * (SELECT count(*) FROM srcs) * 1e6
                         / (SELECT sum(pi_raw) FROM raw{r}))::BIGINT AS pi
         FROM raw{r})"""


def _bt_sql() -> str:
    rounds = ",\n       ".join(_bt_round_sql(r) for r in range(1, _BT_ROUNDS + 1))
    return (
        "WITH " + _bt_base_sql() + ",\n       " + rounds
        + f"""
       SELECT p.s AS source, round(p.pi / 1e6, 6) AS bt_strength, w.w AS wins
       FROM pi{_BT_ROUNDS} p JOIN wtot w ON w.s = p.s"""
    )


@query("bradley_terry", _bt_sql())
def q_bradley_terry(spark, sf_dir):
    """Bradley-Terry strength ranking of sources from pairwise "which
    doc is longer" contests (Bradley & Terry 1952; Hunter's MM updates,
    Ann. Stat. 2004 — the model behind LLM-arena Elo-style
    leaderboards): wins_ab = #{(x∈a, y∈b) : x > y} for every source
    pair, then 3 MM rounds π_a ← w_a / Σ_b n_ab/(π_a+π_b), normalized
    to Σπ = S each round. The O(n²) pairwise contest census collapses
    to one value-grid join: per-value source counts × per-source
    strictly-below cumulatives (ties excluded on both sides by
    construction — cumprev is strictly-less), so cost is V·S² grid
    rows, never doc×doc. Every MM round rounds its per-pair terms to
    NANO-units and renormalizes in integer micro-units, making the
    fixed-round iterate bit-identical cross-engine (oracle = the same
    3-round MATERIALIZED unroll)."""
    d = _docs(spark, sf_dir)
    cnt = d.groupBy(
        F.col("n_chars").cast("long").alias("v"), F.col("source").alias("s")
    ).agg(F.count(F.lit(1)).cast("long").alias("c")).localCheckpoint(eager=True)
    vals = cnt.select("v").distinct()
    srcs = cnt.select("s").distinct()
    n_src = srcs.count()
    grid = (
        vals.crossJoin(srcs)
        .join(cnt, ["v", "s"], "left")
        .select("v", "s", F.coalesce("c", F.lit(0)).cast("long").alias("c"))
    )
    wcum = Window.partitionBy("s").orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = grid.select(
        "v", "s", F.coalesce(F.sum("c").over(wcum), F.lit(0)).cast("long").alias("cumprev")
    )
    wins = (
        cnt.alias("a").join(cum.alias("b"), (F.col("a.v") == F.col("b.v")) & (F.col("a.s") != F.col("b.s")))
        .groupBy(F.col("a.s").alias("sa"), F.col("b.s").alias("sb"))
        .agg(F.sum(F.col("a.c") * F.col("b.cumprev")).cast("long").alias("w"))
        .localCheckpoint(eager=True)
    )
    pairs = (
        wins.alias("w1")
        .join(
            wins.alias("w2"),
            (F.col("w2.sa") == F.col("w1.sb")) & (F.col("w2.sb") == F.col("w1.sa")),
            "left",
        )
        .select(
            F.col("w1.sa").alias("sa"), F.col("w1.sb").alias("sb"),
            F.col("w1.w").alias("w_ab"),
            (F.col("w1.w") + F.coalesce(F.col("w2.w"), F.lit(0))).cast("long").alias("n_ab"),
        )
        .localCheckpoint(eager=True)
    )
    wtot = pairs.groupBy(F.col("sa").alias("s")).agg(F.sum("w_ab").cast("long").alias("w"))
    pi = srcs.select("s", F.lit(1000000).cast("long").alias("pi"))
    for _ in range(_BT_ROUNDS):
        den = (
            pairs.join(pi.selectExpr("s AS sa", "pi AS pa"), "sa")
            .join(pi.selectExpr("s AS sb", "pi AS pb"), "sb")
            .groupBy(F.col("sa").alias("s"))
            .agg(
                F.sum(
                    F.round(F.lit(1e9) * F.col("n_ab") * 1e6 / (F.col("pa") + F.col("pb")), 0)
                    .cast("long")
                ).alias("d_nano")
            )
        )
        raw = wtot.join(den, "s").select(
            "s",
            F.round(F.col("w").cast("double") * 1e15 / F.col("d_nano"), 0).cast("long").alias("pi_raw"),
        )
        tot_raw = raw.agg(F.sum("pi_raw").cast("long").alias("t"))
        pi = (
            raw.crossJoin(F.broadcast(tot_raw))
            .select(
                "s",
                F.round(F.col("pi_raw").cast("double") * n_src * 1e6 / F.col("t"), 0)
                .cast("long").alias("pi"),
            )
            .localCheckpoint(eager=True)
        )
    return pi.join(wtot, "s").select(
        F.col("s").alias("source"),
        F.round(F.col("pi") / 1e6, 6).alias("bt_strength"),
        F.col("w").alias("wins"),
    )


@query(
    "mcnemar_test",
    """WITH preds AS (
         SELECT CASE WHEN n_chars > 500 THEN 1 ELSE 0 END AS pa,
                CASE WHEN contains(concat(' ', lower(text), ' '), ' the ')
                     THEN 1 ELSE 0 END AS pb,
                CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         FROM documents),
       cells AS (
         SELECT sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)::BIGINT AS b,
                sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END)::BIGINT AS c,
                sum(CASE WHEN pa = y AND pb = y THEN 1 ELSE 0 END)::BIGINT AS both_right,
                sum(CASE WHEN pa <> y AND pb <> y THEN 1 ELSE 0 END)::BIGINT AS both_wrong
         FROM preds)
       SELECT b AS a_only_correct, c AS b_only_correct, both_right, both_wrong,
              CASE WHEN b + c > 0
                   THEN round((abs(b - c) - 1) * (abs(b - c) - 1)::DOUBLE / (b + c), 6)
              END AS mcnemar_chi2
       FROM cells""",
)
def q_mcnemar_test(spark, sf_dir):
    """McNemar's test with continuity correction (McNemar,
    Psychometrika 1947) comparing two English classifiers on the SAME
    documents — a length rule (n_chars > 500) vs a stopword rule
    (contains ' the ') — via the discordant cells only: χ² =
    (|b−c|−1)²/(b+c). THE paired-model comparison (accuracy deltas on
    shared eval sets are paired, so the unpaired `chi2_independence`
    over-counts shared variance); this is how quality-filter A/Bs
    should be scored before swapping `quality_filter` rules. All four
    cells are exact integers from one pass; one final expression."""
    d = _docs(spark, sf_dir)
    preds = d.select(
        (F.col("n_chars") > 500).cast("long").alias("pa"),
        F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" ")).contains(" the ").cast("long").alias("pb"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    cells = preds.agg(
        F.sum(((F.col("pa") == F.col("y")) & (F.col("pb") != F.col("y"))).cast("long")).cast("long").alias("b"),
        F.sum(((F.col("pa") != F.col("y")) & (F.col("pb") == F.col("y"))).cast("long")).cast("long").alias("c"),
        F.sum(((F.col("pa") == F.col("y")) & (F.col("pb") == F.col("y"))).cast("long")).cast("long").alias("both_right"),
        F.sum(((F.col("pa") != F.col("y")) & (F.col("pb") != F.col("y"))).cast("long")).cast("long").alias("both_wrong"),
    )
    return cells.select(
        F.col("b").alias("a_only_correct"), F.col("c").alias("b_only_correct"),
        "both_right", "both_wrong",
        F.when(
            F.col("b") + F.col("c") > 0,
            F.round(
                (F.abs(F.col("b") - F.col("c")) - 1)
                * (F.abs(F.col("b") - F.col("c")) - 1).cast("double")
                / (F.col("b") + F.col("c")),
                6,
            ),
        ).alias("mcnemar_chi2"),
    )


@query(
    "chao_shen_entropy",
    """WITH cnt AS (
         SELECT w, count(*)::BIGINT AS c FROM (
           SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents)
         GROUP BY w),
       st AS (SELECT sum(c)::BIGINT AS n,
                     sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS f1,
                     count(*)::BIGINT AS v
              FROM cnt),
       naive AS (
         SELECT sum(round(-1e6 * (c::DOUBLE / n) * ln(c::DOUBLE / n))::BIGINT)
                  AS h_naive_micro
         FROM cnt CROSS JOIN st),
       cs AS (
         SELECT sum(round(-1e6
                  * ((1.0 - f1::DOUBLE / n) * c / n)
                  * ln((1.0 - f1::DOUBLE / n) * c / n)
                  / (1.0 - pow(1.0 - (1.0 - f1::DOUBLE / n) * c / n, n::DOUBLE))
                )::BIGINT) AS h_cs_micro
         FROM cnt CROSS JOIN st)
       SELECT st.v AS vocab, st.n AS tokens, st.f1 AS singletons,
              round(1.0 - st.f1::DOUBLE / st.n, 6) AS coverage,
              round(naive.h_naive_micro / 1e6, 6) AS h_naive,
              round(cs.h_cs_micro / 1e6, 6) AS h_chao_shen
       FROM st CROSS JOIN naive CROSS JOIN cs""",
)
def q_chao_shen_entropy(spark, sf_dir):
    """Chao-Shen coverage-adjusted Shannon entropy (Chao & Shen, EEST
    2003): shrink each plug-in probability by the Good-Turing coverage
    Ĉ = 1 − f₁/N, then Horvitz-Thompson-weight every term by its
    detection probability 1 − (1−Ĉp̂)^N — the bias correction that
    makes corpus-entropy comparisons honest when vocabularies are
    undersampled (the plug-in estimator is biased LOW by ~(V−1)/2N,
    so bigger crawls look spuriously more diverse). Pairs with
    `missing_mass` (same f₁ statistic) and `hill_numbers` (whose q=1
    uses the naive H). Per-token terms round once to micro-units;
    ln/pow parity is already pinned by existing queries."""
    d = _docs(spark, sf_dir)
    cnt = (
        d.select(F.explode(T.tokenize(F.col("text"))).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    st = cnt.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum((F.col("c") == 1).cast("long")).cast("long").alias("f1"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    j = cnt.crossJoin(F.broadcast(st))
    p = F.col("c").cast("double") / F.col("n")
    naive = j.agg(
        F.sum(F.round(F.lit(-1e6) * p * F.log(p), 0).cast("long")).alias("h_naive_micro")
    )
    cov = F.lit(1.0) - F.col("f1").cast("double") / F.col("n")
    cp = cov * F.col("c") / F.col("n")
    cs = j.agg(
        F.sum(
            F.round(
                F.lit(-1e6) * cp * F.log(cp)
                / (F.lit(1.0) - F.pow(F.lit(1.0) - cp, F.col("n").cast("double"))),
                0,
            ).cast("long")
        ).alias("h_cs_micro")
    )
    return (
        st.crossJoin(F.broadcast(naive)).crossJoin(F.broadcast(cs))
        .select(
            F.col("v").alias("vocab"), F.col("n").alias("tokens"),
            F.col("f1").alias("singletons"),
            F.round(F.lit(1.0) - F.col("f1").cast("double") / F.col("n"), 6).alias("coverage"),
            F.round(F.col("h_naive_micro") / 1e6, 6).alias("h_naive"),
            F.round(F.col("h_cs_micro") / 1e6, 6).alias("h_chao_shen"),
        )
    )


# --------------------------------------------------------------------------
# batch 67: rank aggregation, Fisher LDA, Jarque-Bera


@query(
    "borda_copeland",
    """WITH m AS (
         SELECT source,
                sum(n_chars)::BIGINT AS s_len,
                count(*)::BIGINT AS n,
                count(DISTINCT lang)::BIGINT AS n_lang
         FROM documents GROUP BY source),
       v AS (
         SELECT m.source, m.n,
                len(list_distinct(flatten(list(string_split(trim(d.text), ' ')))))::BIGINT
                  AS vocab,
                max(m.s_len) AS s_len, max(m.n_lang) AS n_lang
         FROM m JOIN documents d USING (source)
         GROUP BY m.source, m.n),
       ranked AS (
         SELECT source,
                row_number() OVER (ORDER BY s_len * 1.0 / n DESC, source) AS r1,
                row_number() OVER (ORDER BY vocab DESC, source) AS r2,
                row_number() OVER (ORDER BY n_lang DESC, source) AS r3,
                count(*) OVER () AS s
         FROM v),
       borda AS (
         SELECT source, r1, r2, r3,
                (3 * s - r1 - r2 - r3)::BIGINT AS borda_score, s
         FROM ranked),
       cop AS (
         SELECT a.source,
                sum(CASE WHEN (CASE WHEN a.r1 < b.r1 THEN 1 ELSE 0 END)
                          + (CASE WHEN a.r2 < b.r2 THEN 1 ELSE 0 END)
                          + (CASE WHEN a.r3 < b.r3 THEN 1 ELSE 0 END) >= 2
                         THEN 1 ELSE 0 END)::BIGINT AS copeland_wins
         FROM borda a JOIN borda b ON a.source <> b.source
         GROUP BY a.source)
       SELECT b.source, b.r1 AS rank_len, b.r2 AS rank_vocab, b.r3 AS rank_langs,
              b.borda_score, c.copeland_wins
       FROM borda b JOIN cop c USING (source)""",
)
def q_borda_copeland(spark, sf_dir):
    """Rank aggregation across three per-source quality criteria (mean
    doc length, vocabulary size, language breadth) by Borda count
    (Borda 1781: points = Σ(S − rank)) and Copeland pairwise majority
    (Copeland 1951: wins = #opponents beaten on ≥2 of 3 criteria) —
    the social-choice machinery behind multi-metric source selection
    when no single score is trusted (`max_coverage`/`dsir_weights`
    pick by one objective; this reconciles several). All ranks are
    deterministic row_numbers (ties → source) over S rows; the
    Copeland join is S×S on the tiny rank table. Complements
    `rbo_rankings`, which MEASURES ranking agreement — this RESOLVES
    disagreement into one order."""
    d = _docs(spark, sf_dir)
    m = d.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("s_len"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_distinct("lang").cast("long").alias("n_lang"),
    )
    vocab = (
        d.select("source", F.explode(T.tokenize(F.col("text"))).alias("w"))
        .groupBy("source").agg(F.count_distinct("w").cast("long").alias("vocab"))
    )
    v = m.join(vocab, "source").localCheckpoint(eager=True)
    wn = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = v.select(
        "source",
        F.row_number().over(
            Window.orderBy(F.desc(F.col("s_len") * 1.0 / F.col("n")), "source")
        ).alias("r1"),
        F.row_number().over(Window.orderBy(F.desc("vocab"), "source")).alias("r2"),
        F.row_number().over(Window.orderBy(F.desc("n_lang"), "source")).alias("r3"),
        F.count(F.lit(1)).over(wn).alias("s"),
    )
    borda = ranked.select(
        "source", "r1", "r2", "r3",
        (3 * F.col("s") - F.col("r1") - F.col("r2") - F.col("r3")).cast("long").alias("borda_score"),
    ).localCheckpoint(eager=True)
    cop = (
        borda.alias("a").join(borda.alias("b"), F.col("a.source") != F.col("b.source"))
        .groupBy(F.col("a.source").alias("source"))
        .agg(
            F.sum(
                (
                    (F.col("a.r1") < F.col("b.r1")).cast("int")
                    + (F.col("a.r2") < F.col("b.r2")).cast("int")
                    + (F.col("a.r3") < F.col("b.r3")).cast("int")
                    >= 2
                ).cast("long")
            ).cast("long").alias("copeland_wins")
        )
    )
    return borda.join(cop, "source").select(
        "source",
        F.col("r1").cast("long").alias("rank_len"),
        F.col("r2").cast("long").alias("rank_vocab"),
        F.col("r3").cast("long").alias("rank_langs"),
        "borda_score", "copeland_wins",
    )


@query(
    "fisher_lda",
    """WITH base AS (
         SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                len(string_split(trim(text), ' '))::BIGINT AS x1,
                n_chars::BIGINT AS x2
         FROM documents),
       st AS (
         SELECT y, count(*)::BIGINT AS n,
                sum(x1)::BIGINT AS s1, sum(x2)::BIGINT AS s2,
                sum(x1::HUGEINT * x1::HUGEINT) AS s11,
                sum(x1::HUGEINT * x2::HUGEINT) AS s12,
                sum(x2::HUGEINT * x2::HUGEINT) AS s22
         FROM base GROUP BY y),
       pool AS (
         SELECT
           (SELECT (s11 - s1::HUGEINT * s1 / n)::DOUBLE FROM st WHERE y = 0)
         + (SELECT (s11 - s1::HUGEINT * s1 / n)::DOUBLE FROM st WHERE y = 1) AS w11,
           (SELECT (s12 - s1::HUGEINT * s2 / n)::DOUBLE FROM st WHERE y = 0)
         + (SELECT (s12 - s1::HUGEINT * s2 / n)::DOUBLE FROM st WHERE y = 1) AS w12,
           (SELECT (s22 - s2::HUGEINT * s2 / n)::DOUBLE FROM st WHERE y = 0)
         + (SELECT (s22 - s2::HUGEINT * s2 / n)::DOUBLE FROM st WHERE y = 1) AS w22,
           (SELECT s1::DOUBLE / n FROM st WHERE y = 1)
         - (SELECT s1::DOUBLE / n FROM st WHERE y = 0) AS d1,
           (SELECT s2::DOUBLE / n FROM st WHERE y = 1)
         - (SELECT s2::DOUBLE / n FROM st WHERE y = 0) AS d2)
       SELECT CASE WHEN w11 * w22 - w12 * w12 <> 0
                   THEN round((w22 * d1 - w12 * d2) / (w11 * w22 - w12 * w12), 6)
              END AS w_tokens,
              CASE WHEN w11 * w22 - w12 * w12 <> 0
                   THEN round((w11 * d2 - w12 * d1) / (w11 * w22 - w12 * w12), 6)
              END AS w_chars,
              CASE WHEN w11 * w22 - w12 * w12 <> 0
                   THEN round(((w22 * d1 - w12 * d2) * d1 + (w11 * d2 - w12 * d1) * d2)
                              / (w11 * w22 - w12 * w12), 6)
              END AS fisher_criterion
       FROM pool""",
)
def q_fisher_lda(spark, sf_dir):
    """Fisher linear discriminant (Fisher, Ann. Eugenics 1936) for
    en/non-en on the 2-feature vector (token count, char count):
    w = S_W⁻¹(μ₁−μ₀) with the within-class scatter inverted in CLOSED
    FORM (2×2 adjugate — no iterative solver), plus the Fisher
    criterion wᵀ(μ₁−μ₀), the separation the projection achieves. All
    scatter entries come from ONE grouped census of exact HUGEINT
    sufficient statistics; weights are single identical float
    expressions. The supervised complement to `jl_projection`
    (random) and `eigen_diagnostics` (unsupervised): which LINEAR view
    of the features separates the label."""
    d = _docs(spark, sf_dir)
    dec = "decimal(38,0)"
    base = d.select(
        (F.col("lang") == "en").cast("long").alias("y"),
        F.size(T.tokenize(F.col("text"))).cast("long").alias("x1"),
        F.col("n_chars").cast("long").alias("x2"),
    )
    st = base.groupBy("y").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x1").cast("long").alias("s1"), F.sum("x2").cast("long").alias("s2"),
        F.sum(F.col("x1").cast(dec) * F.col("x1").cast(dec)).cast(dec).alias("s11"),
        F.sum(F.col("x1").cast(dec) * F.col("x2").cast(dec)).cast(dec).alias("s12"),
        F.sum(F.col("x2").cast(dec) * F.col("x2").cast(dec)).cast(dec).alias("s22"),
    ).localCheckpoint(eager=True)
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    g0 = st.where(F.col("y") == 0).select(
        (F.col("s11") - F.col("s1").cast(dec) * F.col("s1") / F.col("n")).cast("double").alias("a11"),
        (F.col("s12") - F.col("s1").cast(dec) * F.col("s2") / F.col("n")).cast("double").alias("a12"),
        (F.col("s22") - F.col("s2").cast(dec) * F.col("s2") / F.col("n")).cast("double").alias("a22"),
        (d_("s1") / d_("n")).alias("m1_0"), (d_("s2") / d_("n")).alias("m2_0"),
    )
    g1 = st.where(F.col("y") == 1).select(
        (F.col("s11") - F.col("s1").cast(dec) * F.col("s1") / F.col("n")).cast("double").alias("b11"),
        (F.col("s12") - F.col("s1").cast(dec) * F.col("s2") / F.col("n")).cast("double").alias("b12"),
        (F.col("s22") - F.col("s2").cast(dec) * F.col("s2") / F.col("n")).cast("double").alias("b22"),
        (d_("s1") / d_("n")).alias("m1_1"), (d_("s2") / d_("n")).alias("m2_1"),
    )
    p = g0.crossJoin(g1).select(
        (F.col("a11") + F.col("b11")).alias("w11"),
        (F.col("a12") + F.col("b12")).alias("w12"),
        (F.col("a22") + F.col("b22")).alias("w22"),
        (F.col("m1_1") - F.col("m1_0")).alias("d1"),
        (F.col("m2_1") - F.col("m2_0")).alias("d2"),
    )
    det = F.col("w11") * F.col("w22") - F.col("w12") * F.col("w12")
    ok = det != 0  # singular within-class scatter (a constant feature) -> NULL
    wt = (F.col("w22") * F.col("d1") - F.col("w12") * F.col("d2")) / det
    wc = (F.col("w11") * F.col("d2") - F.col("w12") * F.col("d1")) / det
    return p.select(
        F.when(ok, F.round(wt, 6)).alias("w_tokens"),
        F.when(ok, F.round(wc, 6)).alias("w_chars"),
        F.when(
            ok,
            F.round(
                (
                    (F.col("w22") * F.col("d1") - F.col("w12") * F.col("d2")) * F.col("d1")
                    + (F.col("w11") * F.col("d2") - F.col("w12") * F.col("d1")) * F.col("d2")
                )
                / det,
                6,
            ),
        ).alias("fisher_criterion"),
    )


@query(
    "jarque_bera",
    """WITH st AS (
         SELECT count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS s1,
                sum(n_chars::HUGEINT * n_chars) AS s2,
                sum(n_chars::HUGEINT * n_chars * n_chars) AS s3,
                sum(n_chars::HUGEINT * n_chars * n_chars * n_chars) AS s4
         FROM documents),
       mo AS (
         SELECT n,
                s1::DOUBLE / n AS m,
                s2::DOUBLE / n - (s1::DOUBLE / n) * (s1::DOUBLE / n) AS m2,
                s3::DOUBLE / n - 3 * (s1::DOUBLE / n) * (s2::DOUBLE / n)
                  + 2 * (s1::DOUBLE / n) * (s1::DOUBLE / n) * (s1::DOUBLE / n) AS m3,
                s4::DOUBLE / n - 4 * (s1::DOUBLE / n) * (s3::DOUBLE / n)
                  + 6 * (s1::DOUBLE / n) * (s1::DOUBLE / n) * (s2::DOUBLE / n)
                  - 3 * (s1::DOUBLE / n) * (s1::DOUBLE / n)
                      * (s1::DOUBLE / n) * (s1::DOUBLE / n) AS m4
         FROM st)
       SELECT n,
              round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
              round(m4 / (m2 * m2) - 3, 6) AS excess_kurtosis,
              round(n / 6.0 * ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2)))
                    + (m4 / (m2 * m2) - 3) * (m4 / (m2 * m2) - 3) / 4), 6) AS jb_stat
       FROM mo""",
)
def q_jarque_bera(spark, sf_dir):
    """Jarque-Bera normality test (Jarque & Bera, Econ. Lett. 1980):
    JB = n/6·(S² + K²/4) from the skewness and excess kurtosis of the
    doc-length distribution — the moment-based gate before any
    analysis that assumes Gaussian lengths (z-score outlier fences,
    `mde_power`'s variance plug-ins). Raw power sums up to x⁴ are
    exact HUGEINT from one pass; central moments and the statistic are
    one identical float expression (the same expand-the-binomial
    discipline as `heteroscedasticity_bp`). Complements `ks_drift`
    (distribution-free shape) with the parametric moments view."""
    d = _docs(spark, sf_dir)
    dec = "decimal(38,0)"
    x = F.col("n_chars").cast(dec)
    st = d.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("s1"),
        F.sum(x * x).cast(dec).alias("s2"),
        F.sum(x * x * x).cast(dec).alias("s3"),
        F.sum(x * x * x * x).cast(dec).alias("s4"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    m = d_("s1") / d_("n")
    m2 = d_("s2") / d_("n") - m * m
    m3 = d_("s3") / d_("n") - 3 * m * (d_("s2") / d_("n")) + 2 * m * m * m
    m4 = (
        d_("s4") / d_("n") - 4 * m * (d_("s3") / d_("n"))
        + 6 * m * m * (d_("s2") / d_("n")) - 3 * m * m * m * m
    )
    skew = m3 / (m2 * F.sqrt(m2))
    kurt = m4 / (m2 * m2) - 3
    return st.select(
        "n",
        F.round(skew, 6).alias("skewness"),
        F.round(kurt, 6).alias("excess_kurtosis"),
        F.round(F.col("n") / 6.0 * (skew * skew + kurt * kurt / 4), 6).alias("jb_stat"),
    )


# --------------------------------------------------------------------------
# batch 68: attribute assortativity, word burstiness, dispersion DP


@query(
    "attribute_assortativity",
    """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       sized AS (SELECT l_orderkey FROM op GROUP BY l_orderkey
                 HAVING count(*) BETWEEN 2 AND 20),
       b AS (SELECT op.* FROM op JOIN sized USING (l_orderkey)),
       e AS (
         SELECT DISTINCT a.l_partkey AS u, bb.l_partkey AS v
         FROM b a JOIN b bb ON a.l_orderkey = bb.l_orderkey
                           AND a.l_partkey < bb.l_partkey),
       lab AS (SELECT p_partkey, p_brand FROM part),
       de AS (
         SELECT la.p_brand AS ba, lb.p_brand AS bb2
         FROM e JOIN lab la ON la.p_partkey = e.u
                JOIN lab lb ON lb.p_partkey = e.v
         UNION ALL
         SELECT lb.p_brand, la.p_brand
         FROM e JOIN lab la ON la.p_partkey = e.u
                JOIN lab lb ON lb.p_partkey = e.v),
       m AS (SELECT count(*)::BIGINT AS m2 FROM de),
       eii AS (SELECT sum(CASE WHEN ba = bb2 THEN 1 ELSE 0 END)::BIGINT AS same
               FROM de),
       marg AS (
         SELECT ba AS brand, count(*)::BIGINT AS d FROM de GROUP BY ba),
       ab AS (SELECT sum(d::HUGEINT * d) AS sum_d2 FROM marg)
       SELECT (SELECT same FROM eii) AS same_brand_ends,
              (SELECT m2 FROM m) AS directed_edges,
              round((SELECT same FROM eii)::DOUBLE / (SELECT m2 FROM m), 6) AS trace,
              round((SELECT sum_d2 FROM ab)::DOUBLE
                    / ((SELECT m2 FROM m)::HUGEINT * (SELECT m2 FROM m))::DOUBLE, 6)
                AS expected_trace,
              round(((SELECT same FROM eii)::DOUBLE / (SELECT m2 FROM m)
                     - (SELECT sum_d2 FROM ab)::DOUBLE
                       / ((SELECT m2 FROM m)::HUGEINT * (SELECT m2 FROM m))::DOUBLE)
                    / (1.0 - (SELECT sum_d2 FROM ab)::DOUBLE
                       / ((SELECT m2 FROM m)::HUGEINT * (SELECT m2 FROM m))::DOUBLE), 6)
                AS assortativity_r""",
)
def q_attribute_assortativity(spark, sf_dir):
    """Categorical (attribute) assortativity coefficient r (Newman,
    PRE 2003 eq. 2) of the co-purchase graph by part BRAND: r =
    (tr e − Σ aᵢbᵢ)/(1 − Σ aᵢbᵢ) over the brand mixing matrix — do
    same-brand parts co-occur more than their degrees force? The
    categorical complement to `degree_assortativity` (numeric) and the
    modularity numerator `modularity_q` maximizes; r ≈ 0 says brand
    is structurally irrelevant and brand-stratified negative sampling
    is safe. The mixing matrix is one groupBy over directed edge ends
    joined to the broadcast part-brand dim; trace and margins are
    exact integers, three identical float expressions."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        op.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("bs"))
        .where((F.col("bs") >= 2) & (F.col("bs") <= 20)).select("l_orderkey")
    )
    b = op.join(sized, "l_orderkey")
    e = (
        b.alias("x").join(b.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("u"), F.col("y.l_partkey").alias("v"))
        .distinct()
    )
    lab = F.broadcast(pt)
    labeled = (
        e.join(lab.selectExpr("p_partkey AS u", "p_brand AS ba"), "u")
        .join(lab.selectExpr("p_partkey AS v", "p_brand AS bb2"), "v")
        .select("ba", "bb2")
    )
    de = labeled.unionAll(labeled.select(F.col("bb2").alias("ba"), F.col("ba").alias("bb2"))).localCheckpoint(eager=True)
    dec = "decimal(38,0)"
    m = de.agg(F.count(F.lit(1)).cast("long").alias("m2"))
    eii = de.agg(F.sum((F.col("ba") == F.col("bb2")).cast("long")).cast("long").alias("same"))
    ab = (
        de.groupBy("ba").agg(F.count(F.lit(1)).cast("long").alias("d"))
        .agg(F.sum(F.col("d").cast(dec) * F.col("d").cast(dec)).cast(dec).alias("sum_d2"))
    )
    j = eii.crossJoin(F.broadcast(m)).crossJoin(F.broadcast(ab))
    tr = F.col("same").cast("double") / F.col("m2")
    exp_tr = F.col("sum_d2").cast("double") / (
        F.col("m2").cast(dec) * F.col("m2").cast(dec)
    ).cast("double")
    return j.select(
        F.col("same").alias("same_brand_ends"),
        F.col("m2").alias("directed_edges"),
        F.round(tr, 6).alias("trace"),
        F.round(exp_tr, 6).alias("expected_trace"),
        F.round((tr - exp_tr) / (F.lit(1.0) - exp_tr), 6).alias("assortativity_r"),
    )


_BURST_TOP = 50


@query(
    "word_burstiness",
    f"""WITH dc AS (
         SELECT doc_id, w, count(*)::BIGINT AS k FROM (
           SELECT doc_id, unnest(string_split(trim(text), ' ')) AS w
           FROM documents)
         GROUP BY 1, 2),
       nd AS (SELECT count(DISTINCT doc_id)::BIGINT AS nd FROM documents),
       ws AS (
         SELECT w, sum(k)::BIGINT AS cf,
                count(*)::BIGINT AS df,
                sum(CASE WHEN k >= 2 THEN 1 ELSE 0 END)::BIGINT AS df2
         FROM dc GROUP BY w
         ORDER BY sum(k) DESC, w LIMIT {_BURST_TOP})
       SELECT ws.w AS word, ws.cf, ws.df, ws.df2,
              round(ws.df2::DOUBLE / ws.df, 6) AS p_repeat,
              round(1.0 - (1.0 + ws.cf::DOUBLE / nd.nd)
                          * exp(-(ws.cf::DOUBLE / nd.nd))
                    / (1.0 - exp(-(ws.cf::DOUBLE / nd.nd))), 6) AS poisson_p_repeat,
              round(ws.df2::DOUBLE / ws.df
                    - (1.0 - (1.0 + ws.cf::DOUBLE / nd.nd)
                             * exp(-(ws.cf::DOUBLE / nd.nd))
                       / (1.0 - exp(-(ws.cf::DOUBLE / nd.nd)))), 6) AS adaptation
       FROM ws CROSS JOIN nd""",
)
def q_word_burstiness(spark, sf_dir):
    """Word burstiness / adaptation (Church, EMNLP 2000 "Empirical
    estimates of adaptation"): for the top-50 corpus words, the
    probability a word REPEATS in a document that already contains it
    — P(k≥2 | k≥1) = df₂/df — against the Poisson prediction
    1 − (1+λ)e^{−λ}/(1−e^{−λ}) at λ = cf/N_docs. Content words adapt
    (repeat far above Poisson); function words don't — the signal
    separating topical terms from glue BEFORE any stopword list
    exists, and the formal basis for `stopword_discovery`. All counts
    exact from one (doc, word) census; the Poisson benchmark is one
    identical float expression (exp parity pinned)."""
    d = _docs(spark, sf_dir)
    dc = (
        d.select("doc_id", F.explode(T.tokenize(F.col("text"))).alias("w"))
        .groupBy("doc_id", "w").agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    nd = d.agg(F.count_distinct("doc_id").cast("long").alias("nd"))
    ws = (
        dc.groupBy("w").agg(
            F.sum("k").cast("long").alias("cf"),
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum((F.col("k") >= 2).cast("long")).cast("long").alias("df2"),
        )
        .orderBy(F.desc("cf"), "w").limit(_BURST_TOP)
    )
    j = ws.crossJoin(F.broadcast(nd))
    lam = F.col("cf").cast("double") / F.col("nd")
    pois = F.lit(1.0) - (F.lit(1.0) + lam) * F.exp(-lam) / (F.lit(1.0) - F.exp(-lam))
    prep = F.col("df2").cast("double") / F.col("df")
    return j.select(
        F.col("w").alias("word"), "cf", "df", "df2",
        F.round(prep, 6).alias("p_repeat"),
        F.round(pois, 6).alias("poisson_p_repeat"),
        F.round(prep - pois, 6).alias("adaptation"),
    )


_DP_TOP = 50


@query(
    "word_dispersion_dp",
    f"""WITH toks AS (
         SELECT source, w, count(*)::BIGINT AS c FROM (
           SELECT source, unnest(string_split(trim(text), ' ')) AS w
           FROM documents)
         GROUP BY 1, 2),
       part_sz AS (SELECT source, sum(c)::BIGINT AS sz FROM toks GROUP BY source),
       tot AS (SELECT sum(sz)::BIGINT AS n FROM part_sz),
       topw AS (
         SELECT w, sum(c)::BIGINT AS cf FROM toks GROUP BY w
         ORDER BY sum(c) DESC, w LIMIT {_DP_TOP}),
       dense AS (
         SELECT tw.w, tw.cf, ps.source, ps.sz, t.n,
                coalesce(tk.c, 0)::BIGINT AS c
         FROM topw tw CROSS JOIN part_sz ps CROSS JOIN tot t
         LEFT JOIN toks tk ON tk.w = tw.w AND tk.source = ps.source)
       SELECT w AS word, max(cf) AS cf,
              round(sum(round(1e6 * abs(c::DOUBLE / cf - sz::DOUBLE / n))::BIGINT)
                    / 2e6, 6) AS dp
       FROM dense GROUP BY w""",
)
def q_word_dispersion_dp(spark, sf_dir):
    """Gries' DP dispersion measure (Gries, IJCL 2008) for the top-50
    words: DP = ½·Σ_parts |observed share in part − expected share| —
    0 means the word spreads across sources exactly proportionally to
    their sizes, →1 means it clumps in one source. The corpus-
    linguistics complement to `word_burstiness` (WITHIN-doc clumping)
    and `dispersion_index` (event-time clumping): DP is the
    ACROSS-source clumping that flags source-specific boilerplate
    masquerading as common vocabulary. One token census densified over
    the S-source grid; per-part terms round to micro-units before the
    exact sum, one halving division."""
    d = _docs(spark, sf_dir)
    toks = (
        d.select("source", F.explode(T.tokenize(F.col("text"))).alias("w"))
        .groupBy("source", "w").agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    part_sz = toks.groupBy("source").agg(F.sum("c").cast("long").alias("sz"))
    tot = part_sz.agg(F.sum("sz").cast("long").alias("n"))
    topw = (
        toks.groupBy("w").agg(F.sum("c").cast("long").alias("cf"))
        .orderBy(F.desc("cf"), "w").limit(_DP_TOP)
    )
    dense = (
        topw.crossJoin(F.broadcast(part_sz)).crossJoin(F.broadcast(tot))
        .join(toks, ["w", "source"], "left")
        .select(
            "w", "cf", "sz", "n", F.coalesce("c", F.lit(0)).cast("long").alias("c")
        )
    )
    term = F.round(
        F.lit(1e6)
        * F.abs(F.col("c").cast("double") / F.col("cf") - F.col("sz").cast("double") / F.col("n")),
        0,
    ).cast("long")
    return dense.groupBy("w").agg(
        F.max("cf").alias("cf"),
        F.round(F.sum(term) / 2e6, 6).alias("dp"),
    ).select(F.col("w").alias("word"), "cf", "dp")


# --------------------------------------------------------------------------
# batch 69: densest subgraph, label propagation, Huber location

_DSG_ROUNDS = 30
_DSG_NUM, _DSG_DEN = 3, 2  # (1+eps) = 3/2 -> O(log_{1.5} V) rounds, 3-approx


def _dsg_graph_sql() -> str:
    return """op AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       sized AS MATERIALIZED (SELECT l_orderkey FROM op GROUP BY l_orderkey
                 HAVING count(*) BETWEEN 2 AND 20),
       bb AS MATERIALIZED (SELECT op.* FROM op JOIN sized USING (l_orderkey)),
       e0 AS MATERIALIZED (
         SELECT DISTINCT a.l_partkey AS u, b2.l_partkey AS v
         FROM bb a JOIN bb b2 ON a.l_orderkey = b2.l_orderkey
                            AND a.l_partkey < b2.l_partkey)"""


def _dsg_sql(rounds: int = _DSG_ROUNDS) -> str:
    parts = [_dsg_graph_sql()]
    stats = ["SELECT 0 AS r, (SELECT count(DISTINCT u) FROM (SELECT u FROM e0 UNION ALL SELECT v FROM e0)) AS nv, (SELECT count(*) FROM e0) AS ne"]
    prev = "e0"
    for r in range(1, rounds + 1):
        parts.append(
            f"""d{r} AS MATERIALIZED (
         SELECT u AS node, count(*)::BIGINT AS d FROM
           (SELECT u, v FROM {prev} UNION ALL SELECT v, u FROM {prev})
         GROUP BY u),
       st{r} AS MATERIALIZED (
         SELECT count(*)::BIGINT AS nv, (SELECT count(*) FROM {prev})::BIGINT AS ne
         FROM d{r}),
       keep{r} AS MATERIALIZED (
         SELECT d.node FROM d{r} d CROSS JOIN st{r} s
         WHERE {_DSG_DEN} * d.d * s.nv > 2 * {_DSG_NUM} * s.ne),
       e{r} AS MATERIALIZED (
         SELECT e.u, e.v FROM {prev} e
         JOIN keep{r} ka ON ka.node = e.u JOIN keep{r} kb ON kb.node = e.v)"""
        )
        stats.append(
            f"SELECT {r} AS r, (SELECT count(*) FROM keep{r}) AS nv, (SELECT count(*) FROM e{r}) AS ne"
        )
        prev = f"e{r}"
    allst = " UNION ALL ".join(stats)
    return (
        "WITH " + ",\n       ".join(parts)
        + f""",
       allst AS ({allst})
       SELECT r AS best_round, nv::BIGINT AS n_nodes, ne::BIGINT AS n_edges,
              round(ne::DOUBLE / nv, 6) AS density
       FROM allst WHERE nv > 0
       ORDER BY round(1e9 * ne / nv) DESC, r LIMIT 1"""
    )


@query("densest_subgraph", _dsg_sql())
def q_densest_subgraph(spark, sf_dir):
    """Densest-subgraph 3-approximation by round-synchronous peeling
    (Charikar 2000 greedy; Bahmani, Kumar & Vassilvitskii, VLDB 2012
    MapReduce form): each round removes EVERY node whose degree ≤
    2(1+ε)·E/V (ε=½ here), which provably terminates in O(log₁₊ε V)
    rounds and leaves some round whose subgraph density is within
    2(1+ε) of optimal — the distributed answer to "find the spam-farm
    / boilerplate nucleus" that sequential min-degree peeling (one
    node per step) cannot give at 10^12 edges. The removal test
    den·d·V > 2·num·E is exact integer cross-multiplication; the best
    round is a deterministic nano-unit argmax over the per-round
    (V, E) log. Oracle = the same MATERIALIZED unroll; the Spark loop
    stops at the empty graph with a loud 30-round guard."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        op.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("bs"))
        .where((F.col("bs") >= 2) & (F.col("bs") <= 20)).select("l_orderkey")
    )
    b = op.join(sized, "l_orderkey")
    e = (
        b.alias("x").join(b.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("u"), F.col("y.l_partkey").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    log = []
    nv = e.select(F.col("u").alias("n")).unionAll(e.select("v")).distinct().count()
    ne = e.count()
    log.append((0, nv, ne))
    for r in range(1, _DSG_ROUNDS + 1):
        if ne == 0 or nv == 0:
            break
        sym = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
        keep = deg.where(
            F.lit(_DSG_DEN) * F.col("d") * F.lit(nv) > F.lit(2 * _DSG_NUM) * F.lit(ne)
        ).select(F.col("u").alias("node"))
        e = (
            e.join(keep.withColumnRenamed("node", "u"), "u")
            .join(keep.selectExpr("node AS v"), "v")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        nv = keep.count()
        ne = e.count()
        log.append((r, nv, ne))
    else:
        if ne > 0:
            raise RuntimeError(f"densest-subgraph peel exceeded {_DSG_ROUNDS} rounds")
    rows = [(r, v, ed) for r, v, ed in log if v > 0]
    best = max(rows, key=lambda t: (round(1e9 * t[2] / t[1]), -t[0]))
    return spark.createDataFrame(
        [(best[0], best[1], best[2], round(best[2] / best[1], 6))],
        "best_round long, n_nodes long, n_edges long, density double",
    )


_LPA_ROUNDS = 3


def _lpa_sql(rounds: int = _LPA_ROUNDS) -> str:
    parts = [
        _dsg_graph_sql(),
        """sym AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
       l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lab FROM sym)""",
    ]
    prev = "l0"
    for r in range(1, rounds + 1):
        parts.append(
            f"""v{r} AS MATERIALIZED (
         SELECT s.u AS node, ln.lab, count(*)::BIGINT AS c
         FROM sym s JOIN {prev} ln ON ln.node = s.v
         GROUP BY 1, 2),
       l{r} AS MATERIALIZED (
         SELECT node, lab FROM (
           SELECT node, lab,
                  row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
           FROM v{r})
         WHERE rn = 1)"""
        )
        prev = f"l{r}"
    return (
        "WITH " + ",\n       ".join(parts)
        + f"""
       SELECT lab AS community, count(*)::BIGINT AS n_members
       FROM {prev} GROUP BY lab"""
    )


@query("label_propagation", _lpa_sql())
def q_label_propagation(spark, sf_dir):
    """Label-propagation community detection (Raghavan, Albert & Kumara,
    PRE 2007), made DETERMINISTIC: 3 synchronous rounds where every
    node adopts its neighbors' most frequent label, ties broken by the
    smallest label — the classic near-linear community heuristic whose
    usual run-to-run nondeterminism (random order, random ties) is
    exactly what a reproducible pipeline cannot ship. Per round: one
    edge-label join + count + a row_number argmax — the same shuffle
    shape as a CC round, fixed round count (no oscillation risk to
    converge through since the output is the round-3 label census).
    Complements `modularity_q` (scores a GIVEN partition) and
    `dup_clusters` (exact connectivity) with the density-based
    middle ground."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        op.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("bs"))
        .where((F.col("bs") >= 2) & (F.col("bs") <= 20)).select("l_orderkey")
    )
    b = op.join(sized, "l_orderkey")
    e = (
        b.alias("x").join(b.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("u"), F.col("y.l_partkey").alias("v"))
        .distinct()
    )
    sym = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    labels = sym.select(F.col("u").alias("node")).distinct().withColumn("lab", F.col("node"))
    for _ in range(_LPA_ROUNDS):
        votes = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"), "lab")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        wv = Window.partitionBy("node").orderBy(F.desc("c"), "lab")
        labels = (
            votes.withColumn("rn", F.row_number().over(wv))
            .where(F.col("rn") == 1)
            .select("node", "lab")
            .localCheckpoint(eager=True)
        )
    return labels.groupBy(F.col("lab").alias("community")).agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )


_HUBER_ROUNDS = 3
_HUBER_KN, _HUBER_KD = 1345, 1000  # k = 1.345 (95% Gaussian efficiency)


def _huber_sql(rounds: int = _HUBER_ROUNDS) -> str:
    parts = [
        """x AS MATERIALIZED (SELECT doc_id, n_chars::BIGINT AS x FROM documents),
       med AS MATERIALIZED (
         SELECT x AS m FROM (
           SELECT x, row_number() OVER (ORDER BY x, doc_id) AS rn,
                  count(*) OVER () AS n FROM x)
         WHERE rn = (n + 1) // 2),
       mad AS MATERIALIZED (
         SELECT d AS s FROM (
           SELECT abs(x.x - med.m) AS d,
                  row_number() OVER (ORDER BY abs(x.x - med.m), x.doc_id) AS rn,
                  count(*) OVER () AS n
           FROM x CROSS JOIN med)
         WHERE rn = (n + 1) // 2),
       mu0 AS MATERIALIZED (SELECT m * 1000000::BIGINT AS mu FROM med)"""
    ]
    prev = "mu0"
    for r in range(1, rounds + 1):
        parts.append(
            f"""w{r} AS MATERIALIZED (
         SELECT x.x,
                CASE WHEN abs(x.x * 1000000 - p.mu) = 0 THEN 1000000000::BIGINT
                     ELSE least(1000000000::BIGINT,
                          round(1e9 * {_HUBER_KN} * mad.s * 1000000.0
                                / ({_HUBER_KD} * abs(x.x * 1000000 - p.mu)))::BIGINT)
                END AS w_nano
         FROM x CROSS JOIN {prev} p CROSS JOIN mad),
       mu{r} AS MATERIALIZED (
         SELECT round(sum(w_nano::HUGEINT * x)::DOUBLE * 1e6
                      / sum(w_nano)::DOUBLE)::BIGINT AS mu
         FROM w{r})"""
        )
        prev = f"mu{r}"
    return (
        "WITH " + ",\n       ".join(parts)
        + f"""
       SELECT round((SELECT mu FROM {prev}) / 1e6, 6) AS huber_mu,
              (SELECT m FROM med)::BIGINT AS median,
              (SELECT s FROM mad)::BIGINT AS mad,
              (SELECT round(avg(x), 6) FROM x) AS mean,
              (SELECT sum(CASE WHEN w_nano < 1000000000 THEN 1 ELSE 0 END)::BIGINT
               FROM w{_HUBER_ROUNDS}) AS n_downweighted"""
    )


@query("huber_location", _huber_sql())
def q_huber_location(spark, sf_dir):
    """Huber M-estimate of location (Huber, Ann. Math. Stat. 1964) for
    document length via 3 IRLS rounds at k=1.345·MAD (95% Gaussian
    efficiency): weights w = min(1, k·s/|x−μ|) re-estimated from the
    exact nearest-rank median and MAD — the robust mean that a few
    giant boilerplate pages cannot drag, where the plain mean (also
    reported) visibly moves. Pairs with `mad_scale` (robust scale) and
    `regression_influence` (which rows did the dragging). Every round
    rounds its weights once to NANO-units and the iterate to integer
    micro-units, so the fixed-round result is bit-identical
    cross-engine (unrolled MATERIALIZED oracle, the `bradley_terry`
    discipline)."""
    d = _docs(spark, sf_dir)
    dec = "decimal(38,0)"
    x = d.select("doc_id", F.col("n_chars").cast("long").alias("x")).localCheckpoint(eager=True)
    wn = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    med = (
        x.select("x", F.row_number().over(Window.orderBy("x", "doc_id")).alias("rn"),
                 F.count(F.lit(1)).over(wn).alias("n"))
        .where(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select(F.col("x").alias("m"))
    )
    mad = (
        x.crossJoin(F.broadcast(med))
        .select(
            F.abs(F.col("x") - F.col("m")).alias("d"), "doc_id",
        )
        .select("d", F.row_number().over(Window.orderBy("d", "doc_id")).alias("rn"),
                F.count(F.lit(1)).over(wn).alias("n"))
        .where(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select(F.col("d").alias("s"))
    )
    consts = med.crossJoin(mad).localCheckpoint(eager=True)  # (m, s)
    mu = consts.select((F.col("m") * 1000000).cast("long").alias("mu"))
    w = None
    for _ in range(_HUBER_ROUNDS):
        j = x.crossJoin(F.broadcast(mu)).crossJoin(F.broadcast(consts.select("s")))
        dev = F.abs(F.col("x") * 1000000 - F.col("mu"))
        w_nano = F.when(dev == 0, F.lit(1000000000).cast("long")).otherwise(
            F.least(
                F.lit(1000000000).cast("long"),
                F.round(
                    F.lit(1e9) * _HUBER_KN * F.col("s") * 1000000.0
                    / (_HUBER_KD * dev),
                    0,
                ).cast("long"),
            )
        )
        w = j.select("x", w_nano.alias("w_nano"))
        mu = w.agg(
            F.round(
                F.sum(F.col("w_nano").cast(dec) * F.col("x")).cast("double") * 1e6
                / F.sum("w_nano").cast("double"),
                0,
            ).cast("long").alias("mu")
        )
    stats = x.agg(F.round(F.avg("x"), 6).alias("mean"))
    ndw = w.agg(
        F.sum((F.col("w_nano") < 1000000000).cast("long")).cast("long").alias("n_downweighted")
    )
    return (
        mu.crossJoin(F.broadcast(consts)).crossJoin(F.broadcast(stats)).crossJoin(F.broadcast(ndw))
        .select(
            F.round(F.col("mu") / 1e6, 6).alias("huber_mu"),
            F.col("m").cast("long").alias("median"),
            F.col("s").cast("long").alias("mad"),
            "mean", "n_downweighted",
        )
    )


# --------------------------------------------------------------------------
# batch 70: Luhn significance scoring, Soundex blocking, Gini over time

_LUHN_W = 10  # passage width in tokens (the passage_bm25 convention)


@query(
    "luhn_summary",
    f"""WITH toks AS (
         SELECT doc_id,
                unnest(range(len(string_split(trim(text), ' '))))::BIGINT AS pos,
                unnest(string_split(trim(text), ' ')) AS token
         FROM documents),
       wc AS (
         SELECT doc_id, token, count(*)::BIGINT AS k
         FROM toks GROUP BY 1, 2),
       sig AS (
         SELECT t.doc_id, t.pos // {_LUHN_W} AS blk,
                CASE WHEN wc.k >= 2 AND length(t.token) >= 4 THEN 1 ELSE 0 END AS s
         FROM toks t JOIN wc ON wc.doc_id = t.doc_id AND wc.token = t.token),
       blocks AS (
         SELECT doc_id, blk::BIGINT AS blk, sum(s)::BIGINT AS n_sig,
                count(*)::BIGINT AS blk_len
         FROM sig GROUP BY 1, 2),
       best AS (
         SELECT doc_id, blk, n_sig, blk_len,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY n_sig * n_sig * 1000000 // blk_len DESC,
                                            blk) AS rn
         FROM blocks)
       SELECT doc_id, blk AS best_block, n_sig, blk_len,
              (n_sig * n_sig * 1000000 // blk_len)::BIGINT AS luhn_score_micro
       FROM best WHERE rn = 1""",
)
def q_luhn_summary(spark, sf_dir):
    """Luhn extractive-summarization significance scoring (Luhn, IBM
    J. 1958 — the first automatic abstract algorithm): a token is
    significant if it repeats within its document (k ≥ 2, len ≥ 4 —
    exactly the within-doc adaptation signal `word_burstiness`
    measures corpus-wide); each {_LUHN_W}-token passage scores
    significant² / length, and the best passage per document is the
    extract. Scores are exact integer micro-units (s²·10⁶ ÷ len by
    integer division), the per-doc argmax is a deterministic
    row_number (ties → earliest block). One token census joined back
    to positions — the same two-pass shape as `tfidf`; no floats
    anywhere."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.posexplode(T.tokenize(F.col("text"))).alias("pos", "token"))
    wc = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).cast("long").alias("k"))
    sig = toks.join(wc, ["doc_id", "token"]).select(
        "doc_id",
        F.floor(F.col("pos") / _LUHN_W).cast("long").alias("blk"),
        ((F.col("k") >= 2) & (F.length("token") >= 4)).cast("long").alias("s"),
    )
    blocks = sig.groupBy("doc_id", "blk").agg(
        F.sum("s").cast("long").alias("n_sig"), F.count(F.lit(1)).cast("long").alias("blk_len")
    )
    score = F.floor(F.col("n_sig") * F.col("n_sig") * 1000000 / F.col("blk_len")).cast("long")
    wb = Window.partitionBy("doc_id").orderBy(F.desc(score), "blk")
    return (
        blocks.withColumn("rn", F.row_number().over(wb))
        .where(F.col("rn") == 1)
        .select(
            "doc_id", F.col("blk").alias("best_block"), "n_sig", "blk_len",
            score.alias("luhn_score_micro"),
        )
    )


def _soundex_sql(col: str) -> str:
    # RE2-safe (no backreferences): digit runs collapse via fixed per-digit
    # patterns; h/w removed BEFORE run-collapse per the standard algorithm.
    e = f"lower({col})"
    first = f"upper(substr({e}, 1, 1))"
    mapped = (
        f"translate(substr({e}, 2), 'bfpvcgjkqsxzdtlmnraeiouyhw', "
        f"'111122222222334556000000..')"
    )
    first_digit = (
        f"translate(substr({e}, 1, 1), 'bfpvcgjkqsxzdtlmnraeiouyhw', "
        f"'111122222222334556000000..')"
    )
    run = mapped
    for dd in "123456":
        run = f"regexp_replace({run}, '{dd}+', '{dd}', 'g')"
    # drop separators ('.') AFTER collapsing so h/w do not split runs;
    # then drop vowels ('0'), then drop a leading digit equal to the
    # first letter's code
    body = f"replace({run}, '.', '')"
    for dd in "123456":
        body = f"regexp_replace({body}, '{dd}+', '{dd}', 'g')"
    body = f"replace({body}, '0', '')"
    body = (
        f"CASE WHEN substr({body}, 1, 1) = {first_digit} "
        f"THEN substr({body}, 2) ELSE {body} END"
    )
    return f"substr(concat({first}, {body}, '000'), 1, 4)"


@query(
    "soundex_blocking",
    f"""WITH toks AS (
         SELECT DISTINCT unnest(string_split(trim(text), ' ')) AS tok
         FROM documents),
       sel AS (SELECT tok FROM toks
               WHERE length(tok) >= 4 AND regexp_full_match(tok, '[a-z]+')),
       coded AS (SELECT tok, {_soundex_sql('tok')} AS sdx FROM sel),
       grp AS (
         SELECT sdx, count(*)::BIGINT AS n_tokens,
                min(tok) AS representative
         FROM coded GROUP BY sdx)
       SELECT sdx AS soundex, n_tokens, representative
       FROM grp WHERE n_tokens >= 2""",
)
def q_soundex_blocking(spark, sf_dir):
    """Soundex phonetic blocking (Russell 1918; the Census/record-
    linkage standard): every alphabetic token ≥4 chars maps to its
    4-char phonetic code (first letter + collapsed consonant-class
    digits, h/w transparent to run-collapse, vowels as separators,
    leading digit deduped against the first letter's class), and codes
    shared by ≥2 distinct tokens become candidate blocks — the
    CHEAPEST blocking key in the linkage stack, upstream of
    `jaro_winkler_dups`' scorer (block by Soundex, verify by JW is the
    textbook pipeline). Implemented in pure string expressions —
    translate + 6 fixed run-collapse regexes, RE2-safe (NO
    backreferences, which DuckDB's regex engine lacks) — identical
    text on both engines, zero UDF."""
    d = _docs(spark, sf_dir)
    toks = (
        d.select(F.explode(T.tokenize(F.col("text"))).alias("tok"))
        .distinct()
        .where((F.length("tok") >= 4) & F.col("tok").rlike("^[a-z]+$"))
    )
    e = F.lower(F.col("tok"))
    first = F.upper(F.substring(e, 1, 1))
    src = "bfpvcgjkqsxzdtlmnraeiouyhw"
    dst = "111122222222334556000000.."
    mapped = F.translate(F.expr("substr(lower(tok), 2)"), src, dst)
    first_digit = F.translate(F.substring(e, 1, 1), src, dst)
    run = mapped
    for dd in "123456":
        run = F.regexp_replace(run, f"{dd}+", dd)
    body = F.regexp_replace(run, r"\.", "")
    for dd in "123456":
        body = F.regexp_replace(body, f"{dd}+", dd)
    coded = (
        toks.withColumn("_first", first)
        .withColumn("_fd", first_digit)
        .withColumn("_body0", F.regexp_replace(run, r"\.", ""))
    )
    b = F.col("_body0")
    for dd in "123456":
        b = F.regexp_replace(b, f"{dd}+", dd)
    b = F.regexp_replace(b, "0", "")
    coded = coded.withColumn("_body1", b).withColumn(
        "_body",
        F.when(
            F.substring(F.col("_body1"), 1, 1) == F.col("_fd"),
            F.expr("substring(_body1, 2)"),
        ).otherwise(F.col("_body1")),
    )
    coded = coded.select(
        "tok",
        F.substring(F.concat(F.col("_first"), F.col("_body"), F.lit("000")), 1, 4).alias("sdx"),
    )
    return (
        coded.groupBy("sdx").agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.min("tok").alias("representative"),
        )
        .where(F.col("n_tokens") >= 2)
        .select(F.col("sdx").alias("soundex"), "n_tokens", "representative")
    )


@query(
    "gini_over_time",
    """WITH daily AS (
         SELECT date_diff('day', DATE '2024-01-01', ts::DATE)::BIGINT AS day,
                user_id, count(*)::BIGINT AS c
         FROM events GROUP BY 1, 2),
       ranked AS (
         SELECT day, c,
                row_number() OVER (PARTITION BY day ORDER BY c, user_id) AS rk,
                count(*) OVER (PARTITION BY day) AS n,
                sum(c) OVER (PARTITION BY day) AS s
         FROM daily)
       SELECT day, max(n)::BIGINT AS n_users, max(s)::BIGINT AS n_events,
              round(sum((2 * rk - n - 1) * c::HUGEINT)::DOUBLE
                    / (max(n)::HUGEINT * max(s))::DOUBLE, 6) AS gini
       FROM ranked GROUP BY day""",
)
def q_gini_over_time(spark, sf_dir):
    """Daily Gini coefficient of per-user activity concentration —
    inequality as a TIME SERIES (the drift monitor on top of the
    static `pareto_8020`/`gini_tokens` snapshots: a rising activity
    Gini means a shrinking heavy-hitter set is taking over the
    stream, the early warning for the skew defenses in
    operators/skew.py). Per day, Gini = Σ(2·rank−n−1)·cᵢ / (n·Σc) via
    the sorted rank identity — the same O(n log n) collapse
    `energy_distance` uses, exact HUGEINT numerator, one division per
    day; ranks tie-break by user_id identically on both engines."""
    ev = _events(spark, sf_dir)
    dec = "decimal(38,0)"
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).cast("long").alias("day"),
        "user_id",
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    wday = Window.partitionBy("day")
    ranked = daily.select(
        "day", "c",
        F.row_number().over(wday.orderBy("c", "user_id")).alias("rk"),
        F.count(F.lit(1)).over(wday).alias("n"),
        F.sum("c").over(wday).alias("s"),
    )
    return ranked.groupBy("day").agg(
        F.max("n").cast("long").alias("n_users"),
        F.max("s").cast("long").alias("n_events"),
        F.round(
            F.sum((2 * F.col("rk") - F.col("n") - 1) * F.col("c").cast(dec)).cast("double")
            / (F.max("n").cast(dec) * F.max("s").cast(dec)).cast("double"),
            6,
        ).alias("gini"),
    )


# --------------------------------------------------------------------------
# batch 71: log loss, eigenvector centrality, post-stratification / Kish


@query(
    "log_loss",
    """WITH scored AS (
         SELECT source,
                round(n_chars * 1e6 / (n_chars + 500))::BIGINT AS p_micro,
                CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         FROM documents),
       terms AS (
         SELECT source,
                round(-1e6 * CASE WHEN y = 1 THEN ln(p_micro / 1e6)
                                  ELSE ln(1.0 - p_micro / 1e6) END)::BIGINT AS t
         FROM scored)
       SELECT source, count(*)::BIGINT AS n,
              round(sum(t) / 1e6 / count(*), 6) AS log_loss
       FROM terms GROUP BY source""",
)
def q_log_loss(spark, sf_dir):
    """Per-source cross-entropy (log loss) of the length-based English
    probability — the PROPER scoring rule companion to
    `brier_calibration` (Brier is quadratic, log loss is the one a
    max-likelihood classifier optimizes) and the per-source breakdown
    `risk_coverage` aggregates away: a source whose log loss spikes is
    where the probability model is confidently wrong, the first place
    a langid/quality scorer needs per-domain recalibration. Per-row
    −ln-likelihood terms round once to micro-units (ln parity pinned);
    exact sums, one division per source. The integer-ratio forecast
    p = n/(n+500) never reaches 0/1, so terms are finite by
    construction."""
    d = _docs(spark, sf_dir)
    scored = d.select(
        "source",
        F.round(F.col("n_chars") * 1e6 / (F.col("n_chars") + 500), 0).cast("long").alias("p_micro"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    t = F.round(
        F.lit(-1e6)
        * F.when(F.col("y") == 1, F.log(F.col("p_micro") / 1e6)).otherwise(
            F.log(F.lit(1.0) - F.col("p_micro") / 1e6)
        ),
        0,
    ).cast("long")
    return (
        scored.select("source", t.alias("t"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("t") / 1e6 / F.count(F.lit(1)), 6).alias("log_loss"),
        )
    )


_EVC_ROUNDS = 5


def _evc_sql(rounds: int = _EVC_ROUNDS) -> str:
    parts = [
        _dsg_graph_sql(),
        """sym AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
       x0 AS MATERIALIZED (SELECT DISTINCT u AS node, 1000000::BIGINT AS x FROM sym)""",
    ]
    prev = "x0"
    for r in range(1, rounds + 1):
        parts.append(
            f"""y{r} AS MATERIALIZED (
         SELECT s.u AS node, sum(xp.x)::BIGINT AS y
         FROM sym s JOIN {prev} xp ON xp.node = s.v
         GROUP BY s.u),
       x{r} AS MATERIALIZED (
         SELECT node, round(y::DOUBLE * 1e6 / (SELECT max(y) FROM y{r}))::BIGINT AS x
         FROM y{r})"""
        )
        prev = f"x{r}"
    return (
        "WITH " + ",\n       ".join(parts)
        + f"""
       SELECT node, round(x / 1e6, 6) AS centrality
       FROM {prev}
       ORDER BY x DESC, node LIMIT 25"""
    )


@query("eigenvector_centrality", _evc_sql())
def q_eigenvector_centrality(spark, sf_dir):
    """Eigenvector centrality by fixed-round power iteration (Bonacich
    1972): x ← A·x normalized by the max entry each round, 5 rounds
    from the uniform vector, top-25 parts — prestige that counts
    WELL-CONNECTED neighbors, where PageRank (`host_pagerank`)
    dilutes by out-degree and degree counts all neighbors equally;
    the three disagree exactly on hub-adjacent nodes, which is the
    point of shipping all three. Each round is one edge-join +
    groupBy-sum (the CC/WL shuffle shape) with the iterate re-rounded
    to integer MICRO-units after L∞ normalization, so the fixed-round
    vector is bit-identical cross-engine (unrolled MATERIALIZED
    oracle). Deterministic top-k (ties → node id)."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    sized = (
        op.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("bs"))
        .where((F.col("bs") >= 2) & (F.col("bs") <= 20)).select("l_orderkey")
    )
    b = op.join(sized, "l_orderkey")
    e = (
        b.alias("x").join(b.alias("y"), "l_orderkey")
        .where(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .select(F.col("x.l_partkey").alias("u"), F.col("y.l_partkey").alias("v"))
        .distinct()
    )
    sym = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    x = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "x", F.lit(1000000).cast("long")
    )
    for _ in range(_EVC_ROUNDS):
        y = (
            sym.join(x.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"))
            .agg(F.sum("x").cast("long").alias("y"))
        )
        mx = y.agg(F.max("y").alias("mx"))
        x = (
            y.crossJoin(F.broadcast(mx))
            .select(
                "node",
                F.round(F.col("y").cast("double") * 1e6 / F.col("mx"), 0).cast("long").alias("x"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        x.orderBy(F.desc("x"), "node").limit(25)
        .select("node", F.round(F.col("x") / 1e6, 6).alias("centrality"))
    )


@query(
    "kish_weights",
    """WITH obs AS (
         SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang),
       tot AS (SELECT sum(n)::BIGINT AS nt, count(*)::BIGINT AS k FROM obs),
       w AS (
         SELECT o.lang, o.n,
                -- target: uniform share 1/k per language
                round(1e6 * t.nt::DOUBLE / (t.k * o.n))::BIGINT AS w_micro
         FROM obs o CROSS JOIN tot t),
       agg AS (
         SELECT sum(n * w_micro)::BIGINT AS sw,
                sum(n::HUGEINT * w_micro::HUGEINT * w_micro) AS sw2
         FROM w)
       SELECT w.lang, w.n AS n_docs, round(w.w_micro / 1e6, 6) AS weight,
              round((a.sw::DOUBLE * a.sw) / a.sw2::DOUBLE, 6) AS kish_ess,
              round((a.sw::DOUBLE * a.sw) / a.sw2::DOUBLE
                    / (SELECT nt FROM tot), 6) AS ess_ratio
       FROM w CROSS JOIN agg a""",
)
def q_kish_weights(spark, sf_dir):
    """Post-stratification weights to a uniform language mix with
    Kish's effective sample size (Kish 1965: ESS = (Σw)²/Σw²) — the
    reweighting every mixture designer applies when the crawl's
    language shares miss the target, and the diagnostic that says what
    the reweighting COSTS: ess_ratio ≪ 1 means the weights are so
    spread that the reweighted corpus behaves like a tiny one, and
    actual resampling (`mixture_sample`) beats weighting. Weights are
    integer micro-units from exact counts; the ESS quadratic sums are
    exact HUGEINT; two divisions total. Complements `doremi_step`
    (learned mixture) with the classical design-based fix."""
    d = _docs(spark, sf_dir)
    dec = "decimal(38,0)"
    obs = d.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = obs.agg(F.sum("n").cast("long").alias("nt"), F.count(F.lit(1)).cast("long").alias("k"))
    w = obs.crossJoin(F.broadcast(tot)).select(
        "lang", "n", "nt",
        F.round(
            F.lit(1e6) * F.col("nt").cast("double") / (F.col("k") * F.col("n")), 0
        ).cast("long").alias("w_micro"),
    )
    agg = w.agg(
        F.sum(F.col("n") * F.col("w_micro")).cast("long").alias("sw"),
        F.sum(F.col("n").cast(dec) * F.col("w_micro").cast(dec) * F.col("w_micro").cast(dec)).cast(dec).alias("sw2"),
    )
    ess = (F.col("sw").cast("double") * F.col("sw")) / F.col("sw2").cast("double")
    return w.crossJoin(F.broadcast(agg)).select(
        "lang", F.col("n").alias("n_docs"),
        F.round(F.col("w_micro") / 1e6, 6).alias("weight"),
        F.round(ess, 6).alias("kish_ess"),
        F.round(ess / F.col("nt"), 6).alias("ess_ratio"),
    )


# --------------------------------------------------------------------------
# batch 72: embedding triplet eval, linear CKA view alignment


@query(
    "triplet_eval",
    f"""WITH e AS (SELECT vec_id, embedding, label FROM embeddings),
       trip AS (
         SELECT e.vec_id AS a_id, e.label,
                lead(vec_id) OVER (PARTITION BY label ORDER BY vec_id) AS p_id,
                CASE
                  WHEN lead(label, 1) OVER w <> label THEN lead(vec_id, 1) OVER w
                  WHEN lead(label, 2) OVER w <> label THEN lead(vec_id, 2) OVER w
                  WHEN lead(label, 3) OVER w <> label THEN lead(vec_id, 3) OVER w
                END AS n_id
         FROM e WINDOW w AS (ORDER BY vec_id)),
       ok AS (SELECT * FROM trip WHERE p_id IS NOT NULL AND n_id IS NOT NULL),
       scored AS (
         SELECT ok.label,
                round({_DOT_SQL.replace('q.embedding', 'p.embedding')}
                      / ({_NORM_A} * {_NORM_Q.replace('q.embedding', 'p.embedding')}), 6)
                  AS cos_ap,
                round({_DOT_SQL.replace('q.embedding', 'n.embedding')}
                      / ({_NORM_A} * {_NORM_Q.replace('q.embedding', 'n.embedding')}), 6)
                  AS cos_an
         FROM ok JOIN e a ON a.vec_id = ok.a_id
                 JOIN e p ON p.vec_id = ok.p_id
                 JOIN e n ON n.vec_id = ok.n_id)
       SELECT label, count(*)::BIGINT AS n_triplets,
              sum(CASE WHEN cos_ap > cos_an THEN 1 ELSE 0 END)::BIGINT AS n_correct,
              round(sum(CASE WHEN cos_ap > cos_an THEN 1 ELSE 0 END)::DOUBLE
                    / count(*), 6) AS triplet_accuracy
       FROM scored GROUP BY label""",
)
def q_triplet_eval(spark, sf_dir):
    """Triplet evaluation of embedding quality (the FaceNet/sentence-
    embedding eval, Schroff et al. 2015): for each anchor, a
    deterministic positive (next vec of the SAME label) and negative
    (nearest following vec of a DIFFERENT label within 3 steps — pure
    window leads, no RNG, no all-pairs), score cos(a,p) > cos(a,n).
    Per-label accuracy is the class-conditioned answer to "does the
    embedding respect its labels", upstream of trusting `semantic_dedup`
    / `ann_ivf_topk` bucket routing. Cosines follow the engine-pinned
    sequential-fold dot product rounded at 6dp; three vec joins per
    triplet, all window-driven."""
    emb = load_table(spark, sf_dir, "embeddings")
    wl = Window.partitionBy("label").orderBy("vec_id")
    wg = Window.orderBy("vec_id")
    n_id = F.when(F.lead("label", 1).over(wg) != F.col("label"), F.lead("vec_id", 1).over(wg))
    for j in (2, 3):
        n_id = n_id.when(
            F.lead("label", j).over(wg) != F.col("label"), F.lead("vec_id", j).over(wg)
        )
    trip = emb.select(
        F.col("vec_id").alias("a_id"), "label",
        F.lead("vec_id").over(wl).alias("p_id"),
        n_id.alias("n_id"),
    ).where(F.col("p_id").isNotNull() & F.col("n_id").isNotNull())
    e = emb.select("vec_id", "embedding")
    j = (
        trip.join(e.selectExpr("vec_id AS a_id", "embedding AS va"), "a_id")
        .join(e.selectExpr("vec_id AS p_id", "embedding AS vp"), "p_id")
        .join(e.selectExpr("vec_id AS n_id", "embedding AS vn"), "n_id")
    )
    from pliers_spark.operators.similarity import _dot, _norm

    cos_ap = F.round(_dot(F.col("va"), F.col("vp")) / (_norm(F.col("va")) * _norm(F.col("vp"))), 6)
    cos_an = F.round(_dot(F.col("va"), F.col("vn")) / (_norm(F.col("va")) * _norm(F.col("vn"))), 6)
    scored = j.select("label", cos_ap.alias("cos_ap"), cos_an.alias("cos_an"))
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_triplets"),
        F.sum((F.col("cos_ap") > F.col("cos_an")).cast("long")).cast("long").alias("n_correct"),
        F.round(
            F.sum((F.col("cos_ap") > F.col("cos_an")).cast("long")).cast("double")
            / F.count(F.lit(1)), 6,
        ).alias("triplet_accuracy"),
    )


_CKA_D = 32  # view split: dims 1..32 vs 33..64


@query(
    "cka_alignment",
    f"""WITH q AS (
         SELECT vec_id,
                list_transform(embedding[1:{_CKA_D}],
                               x -> round(x * 1000)::BIGINT) AS xv,
                list_transform(embedding[{_CKA_D + 1}:{2 * _CKA_D}],
                               x -> round(x * 1000)::BIGINT) AS yv
         FROM embeddings),
       pairs AS (
         SELECT i.i, j.j,
                sum(q.xv[i.i] * q.yv[j.j])::BIGINT AS sxy,
                sum(q.xv[i.i] * q.xv[j.j])::BIGINT AS sxx,
                sum(q.yv[i.i] * q.yv[j.j])::BIGINT AS syy
         FROM q, generate_series(1, {_CKA_D}) i(i), generate_series(1, {_CKA_D}) j(j)
         GROUP BY 1, 2),
       marg AS (
         SELECT i.i, sum(q.xv[i.i])::BIGINT AS sx, sum(q.yv[i.i])::BIGINT AS sy
         FROM q, generate_series(1, {_CKA_D}) i(i) GROUP BY 1),
       nn AS (SELECT count(*)::BIGINT AS n FROM q),
       cov AS (
         SELECT p.i, p.j,
                round((nn.n * p.sxy - mi.sx::HUGEINT * mj.sy)::DOUBLE
                      / nn.n / nn.n * 1e6)::BIGINT AS cxy,
                round((nn.n * p.sxx - mi.sx::HUGEINT * mj.sx)::DOUBLE
                      / nn.n / nn.n * 1e6)::BIGINT AS cxx,
                round((nn.n * p.syy - mi.sy::HUGEINT * mj.sy)::DOUBLE
                      / nn.n / nn.n * 1e6)::BIGINT AS cyy
         FROM pairs p JOIN marg mi ON mi.i = p.i JOIN marg mj ON mj.i = p.j
         CROSS JOIN nn),
       f2 AS (
         SELECT sum(cxy::HUGEINT * cxy) AS f_xy,
                sum(cxx::HUGEINT * cxx) AS f_xx,
                sum(cyy::HUGEINT * cyy) AS f_yy
         FROM cov)
       SELECT round(f_xy::DOUBLE / sqrt(f_xx::DOUBLE * f_yy::DOUBLE), 6) AS linear_cka,
              (SELECT n FROM nn) AS n_vectors, {_CKA_D}::BIGINT AS view_dims
       FROM f2""",
)
def q_cka_alignment(spark, sf_dir):
    """Linear CKA (centered kernel alignment) between the two HALVES of
    the embedding space (Kornblith et al., ICML 2019):
    ‖Cov(X,Y)‖²_F / (‖Cov(X,X)‖_F·‖Cov(Y,Y)‖_F) over milli-quantized
    coordinates — the representation-similarity score used to compare
    layers/models, here answering "do the two coordinate blocks encode
    the same geometry" (CKA→1 means half the dimensions are redundant
    and `jl_projection`-style compression is nearly free). All feature
    sums and cross-products are exact int64 from one pass over the
    D²-cell grid; covariance entries round once to micro-units, the
    three Frobenius sums are exact HUGEINT, and the final ratio
    converts each exact integer to double once (identical nearest-even
    on both engines). The Spark plan mirrors the relational grid (the
    mapInPandas partial-Gram is the documented production variant for
    D ≫ 32)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dec = "decimal(38,0)"
    q = emb.select(
        F.transform(
            F.slice("embedding", 1, _CKA_D), lambda x: F.round(x * 1000, 0).cast("long")
        ).alias("xv"),
        F.transform(
            F.slice("embedding", _CKA_D + 1, _CKA_D), lambda x: F.round(x * 1000, 0).cast("long")
        ).alias("yv"),
    ).localCheckpoint(eager=True)
    ii = spark.range(1, _CKA_D + 1).select(F.col("id").cast("int").alias("i"))
    jj = spark.range(1, _CKA_D + 1).select(F.col("id").cast("int").alias("j"))
    g = q.crossJoin(F.broadcast(ii)).crossJoin(F.broadcast(jj))
    pairs = g.groupBy("i", "j").agg(
        F.sum(F.element_at("xv", F.col("i")) * F.element_at("yv", F.col("j"))).cast("long").alias("sxy"),
        F.sum(F.element_at("xv", F.col("i")) * F.element_at("xv", F.col("j"))).cast("long").alias("sxx"),
        F.sum(F.element_at("yv", F.col("i")) * F.element_at("yv", F.col("j"))).cast("long").alias("syy"),
    )
    marg = q.crossJoin(F.broadcast(ii)).groupBy("i").agg(
        F.sum(F.element_at("xv", F.col("i"))).cast("long").alias("sx"),
        F.sum(F.element_at("yv", F.col("i"))).cast("long").alias("sy"),
    )
    nn = q.agg(F.count(F.lit(1)).cast("long").alias("n"))
    cov = (
        pairs.join(F.broadcast(marg.selectExpr("i", "sx AS sx_i", "sy AS sy_i")), "i")
        .join(F.broadcast(marg.selectExpr("i AS j", "sx AS sx_j", "sy AS sy_j")), "j")
        .crossJoin(F.broadcast(nn))
    )

    def c_micro(splus, ma, mb):
        return F.round(
            (F.col("n") * F.col(splus) - F.col(ma).cast(dec) * F.col(mb)).cast("double")
            / F.col("n") / F.col("n") * 1e6,
            0,
        ).cast("long")

    covm = cov.select(
        c_micro("sxy", "sx_i", "sy_j").alias("cxy"),
        c_micro("sxx", "sx_i", "sx_j").alias("cxx"),
        c_micro("syy", "sy_i", "sy_j").alias("cyy"),
    )
    f2 = covm.agg(
        F.sum(F.col("cxy").cast(dec) * F.col("cxy").cast(dec)).cast(dec).alias("f_xy"),
        F.sum(F.col("cxx").cast(dec) * F.col("cxx").cast(dec)).cast(dec).alias("f_xx"),
        F.sum(F.col("cyy").cast(dec) * F.col("cyy").cast(dec)).cast(dec).alias("f_yy"),
    )
    return f2.crossJoin(F.broadcast(nn)).select(
        F.round(
            F.col("f_xy").cast("double")
            / F.sqrt(F.col("f_xx").cast("double") * F.col("f_yy").cast("double")),
            6,
        ).alias("linear_cka"),
        F.col("n").alias("n_vectors"),
        F.lit(_CKA_D).cast("long").alias("view_dims"),
    )


# --------------------------------------------------------------------------
# batch 73: MMR selection, DeLong AUC CI, Cochran's Q

_MMR_K = 5
_MMR_CAND = 20
_MMR_LAMBDA_MICRO = 700000  # lambda = 0.7
_MMR_QID = 0


def _mmr_base_sql() -> str:
    dot_aq = _DOT_SQL
    return f"""q AS MATERIALIZED (SELECT embedding FROM embeddings WHERE vec_id = {_MMR_QID}),
       cand AS MATERIALIZED (
         SELECT a.vec_id,
                a.embedding,
                round({dot_aq} / ({_NORM_A} * {_NORM_Q}), 6) AS rel
         FROM embeddings a CROSS JOIN q
         WHERE a.vec_id <> {_MMR_QID}
         ORDER BY round({dot_aq} / ({_NORM_A} * {_NORM_Q}), 6) DESC, a.vec_id
         LIMIT {_MMR_CAND}),
       sim AS MATERIALIZED (
         SELECT a.vec_id AS ca, q.vec_id AS cb,
                round(list_sum(list_transform(range(1, len(a.embedding)+1),
                        i -> a.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE))
                      / ({_NORM_A}
                         * sqrt(list_sum(list_transform(q.embedding,
                              x -> x::DOUBLE * x::DOUBLE)))), 6) AS s
         FROM cand a JOIN cand q ON a.vec_id <> q.vec_id)"""


def _mmr_sql() -> str:
    # NOTE: sel{r} must append THE argmax of score{r}; express it as
    # prev UNION (top-1 of score{r})
    rounds = []
    for r in range(1, _MMR_K + 1):
        if r == 1:
            rounds.append(
                f"""sel1 AS MATERIALIZED (
         SELECT vec_id, rel, 1::BIGINT AS pick_order FROM cand
         ORDER BY round(1e6 * rel)::BIGINT DESC, vec_id LIMIT 1)"""
            )
        else:
            prev = f"sel{r - 1}"
            rounds.append(
                f"""score{r} AS MATERIALIZED (
         SELECT c.vec_id, c.rel,
                {_MMR_LAMBDA_MICRO} * round(1e6 * c.rel)::BIGINT
              - {1000000 - _MMR_LAMBDA_MICRO}
                * (SELECT max(round(1e6 * s.s)::BIGINT) FROM sim s
                   JOIN {prev} p ON p.vec_id = s.cb WHERE s.ca = c.vec_id) AS sc
         FROM cand c ANTI JOIN {prev} p2 ON p2.vec_id = c.vec_id),
       top{r} AS MATERIALIZED (
         SELECT vec_id, rel, {r}::BIGINT AS pick_order FROM score{r}
         ORDER BY sc DESC, vec_id LIMIT 1),
       sel{r} AS MATERIALIZED (
         SELECT * FROM {prev} UNION ALL SELECT * FROM top{r})"""
            )
    return (
        "WITH " + _mmr_base_sql() + ",\n       " + ",\n       ".join(rounds)
        + f"""
       SELECT vec_id, pick_order, rel FROM sel{_MMR_K}"""
    )


@query("mmr_select", _mmr_sql())
def q_mmr_select(spark, sf_dir):
    """Maximal Marginal Relevance selection (Carbonell & Goldstein,
    SIGIR 1998 — the diversity re-ranker in every RAG/retrieval stack):
    greedily pick 5 of the top-20 candidates for query vec 0,
    maximizing λ·relevance − (1−λ)·max-similarity-to-already-picked
    (λ=0.7). Candidate gating (top-20 by query cosine) bounds the
    pairwise sim matrix at 20² regardless of corpus size — the
    standard two-stage retrieve-then-rerank shape. Cosines use the
    engine-pinned fold and round at 6dp ONCE; every greedy round then
    compares exact integer micro-scores with vec_id ties, so the pick
    sequence is deterministic cross-engine (unrolled MATERIALIZED
    oracle, the `bradley_terry` discipline)."""
    from pliers_spark.operators.similarity import _dot, _norm

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.where(F.col("vec_id") == _MMR_QID).select(F.col("embedding").alias("qe"))
    cand = (
        emb.where(F.col("vec_id") != _MMR_QID)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id", "embedding",
            F.round(
                _dot(F.col("embedding"), F.col("qe"))
                / (_norm(F.col("embedding")) * _norm(F.col("qe"))), 6,
            ).alias("rel"),
        )
        .orderBy(F.desc(F.round(F.col("rel") * 1e6, 0).cast("long")), "vec_id")
        .limit(_MMR_CAND)
        .localCheckpoint(eager=True)
    )
    a, b2 = cand.alias("a"), cand.alias("b")
    sim = (
        a.join(b2, F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ca"), F.col("b.vec_id").alias("cb"),
            F.round(
                _dot(F.col("a.embedding"), F.col("b.embedding"))
                / (_norm(F.col("a.embedding")) * _norm(F.col("b.embedding"))), 6,
            ).alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    rows = [
        (int(r.vec_id), float(r.rel))
        for r in cand.select("vec_id", "rel").collect()  # <=20 rows by construction
    ]
    sims = {
        (int(r.ca), int(r.cb)): float(r.s)
        for r in sim.collect()  # <=20*19 rows
    }
    selected = []
    remaining = dict(rows)
    for r in range(1, _MMR_K + 1):
        if r == 1:
            pick = max(remaining, key=lambda v: (round(1e6 * remaining[v]), -v))
        else:
            def score(v):
                mx = max(round(1e6 * sims[(v, s)]) for s, _, _ in selected)
                return _MMR_LAMBDA_MICRO * round(1e6 * remaining[v]) - (1000000 - _MMR_LAMBDA_MICRO) * mx
            pick = max(remaining, key=lambda v: (score(v), -v))
        selected.append((pick, r, remaining.pop(pick)))
    return spark.createDataFrame(
        [(v, o, round(rel, 6)) for v, o, rel in selected],
        "vec_id long, pick_order long, rel double",
    )


@query(
    "auc_delong_ci",
    """WITH scored AS (
         SELECT round(n_chars * 1e6 / (n_chars + 500))::BIGINT AS p,
                CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
         FROM documents),
       census AS (
         SELECT p, sum(y)::BIGINT AS pos_eq, sum(1 - y)::BIGINT AS neg_eq
         FROM scored GROUP BY p),
       cum AS (
         SELECT p, pos_eq, neg_eq,
                coalesce(sum(pos_eq) OVER (ORDER BY p
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pos_lt,
                coalesce(sum(neg_eq) OVER (ORDER BY p
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_lt
         FROM census),
       cnt AS (SELECT sum(pos_eq)::BIGINT AS m, sum(neg_eq)::BIGINT AS n FROM census),
       v10 AS (
         -- per-positive component in HALF-units: 2*neg_below + neg_ties
         SELECT sum(pos_eq * (2 * neg_lt + neg_eq))::BIGINT AS s1,
                sum(pos_eq::HUGEINT * (2 * neg_lt + neg_eq)::HUGEINT
                               * (2 * neg_lt + neg_eq)::HUGEINT) AS s2
         FROM cum),
       v01 AS (
         SELECT sum(neg_eq * (2 * (c.m - pos_lt - pos_eq) + pos_eq))::BIGINT AS s1,
                sum(neg_eq::HUGEINT
                    * (2 * (c.m - pos_lt - pos_eq) + pos_eq)::HUGEINT
                    * (2 * (c.m - pos_lt - pos_eq) + pos_eq)::HUGEINT) AS s2
         FROM cum CROSS JOIN cnt c)
       SELECT round(v10.s1::DOUBLE / (2.0 * c.m * c.n), 6) AS auc,
              round((
                (c.m * v10.s2 - v10.s1::HUGEINT * v10.s1)::DOUBLE
                  / c.m / (c.m - 1) / (4.0 * c.n * c.n) / c.m
              + (c.n * v01.s2 - v01.s1::HUGEINT * v01.s1)::DOUBLE
                  / c.n / (c.n - 1) / (4.0 * c.m * c.m) / c.n), 6) AS var_auc,
              round(v10.s1::DOUBLE / (2.0 * c.m * c.n)
                    - 1.96 * sqrt(
                (c.m * v10.s2 - v10.s1::HUGEINT * v10.s1)::DOUBLE
                  / c.m / (c.m - 1) / (4.0 * c.n * c.n) / c.m
              + (c.n * v01.s2 - v01.s1::HUGEINT * v01.s1)::DOUBLE
                  / c.n / (c.n - 1) / (4.0 * c.m * c.m) / c.n), 6) AS ci_lo,
              round(v10.s1::DOUBLE / (2.0 * c.m * c.n)
                    + 1.96 * sqrt(
                (c.m * v10.s2 - v10.s1::HUGEINT * v10.s1)::DOUBLE
                  / c.m / (c.m - 1) / (4.0 * c.n * c.n) / c.m
              + (c.n * v01.s2 - v01.s1::HUGEINT * v01.s1)::DOUBLE
                  / c.n / (c.n - 1) / (4.0 * c.m * c.m) / c.n), 6) AS ci_hi
       FROM v10 CROSS JOIN v01 CROSS JOIN cnt c""",
)
def q_auc_delong_ci(spark, sf_dir):
    """AUC with DeLong's nonparametric confidence interval (DeLong,
    DeLong & Clarke-Pearson, Biometrics 1988): Var(AUC) = S₁₀/m +
    S₀₁/n from the per-positive/per-negative placement components —
    the CI that `roc_auc` alone cannot give, and the statistically
    correct way to say whether two quality filters' AUCs actually
    differ. Components live in integer HALF-units (2·below + ties) via
    one score-value census with class-conditional cumulatives — no
    per-pair work, ties handled exactly; sums and squared sums are
    exact HUGEINT; AUC, variance and the ±1.96σ bounds are single
    identical float expressions."""
    d = _docs(spark, sf_dir)
    dec = "decimal(38,0)"
    scored = d.select(
        F.round(F.col("n_chars") * 1e6 / (F.col("n_chars") + 500), 0).cast("long").alias("p"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    census = scored.groupBy("p").agg(
        F.sum("y").cast("long").alias("pos_eq"),
        F.sum(1 - F.col("y")).cast("long").alias("neg_eq"),
    )
    wcum = Window.orderBy("p").rowsBetween(Window.unboundedPreceding, -1)
    cum = census.select(
        "p", "pos_eq", "neg_eq",
        F.coalesce(F.sum("pos_eq").over(wcum), F.lit(0)).alias("pos_lt"),
        F.coalesce(F.sum("neg_eq").over(wcum), F.lit(0)).alias("neg_lt"),
    ).localCheckpoint(eager=True)
    cnt = cum.agg(
        F.sum("pos_eq").cast("long").alias("m"), F.sum("neg_eq").cast("long").alias("n")
    )
    h10 = (2 * F.col("neg_lt") + F.col("neg_eq")).cast(dec)
    v10 = cum.agg(
        F.sum(F.col("pos_eq") * h10).cast("long").alias("s1_10"),
        F.sum(F.col("pos_eq").cast(dec) * h10 * h10).cast(dec).alias("s2_10"),
    )
    jc = cum.crossJoin(F.broadcast(cnt))
    h01 = (2 * (F.col("m") - F.col("pos_lt") - F.col("pos_eq")) + F.col("pos_eq")).cast(dec)
    v01 = jc.agg(
        F.sum(F.col("neg_eq") * h01).cast("long").alias("s1_01"),
        F.sum(F.col("neg_eq").cast(dec) * h01 * h01).cast(dec).alias("s2_01"),
    )
    j = v10.crossJoin(F.broadcast(v01)).crossJoin(F.broadcast(cnt))
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    auc = d_("s1_10") / (F.lit(2.0) * F.col("m") * F.col("n"))
    var = (
        (F.col("m") * F.col("s2_10") - F.col("s1_10").cast(dec) * F.col("s1_10")).cast("double")
        / F.col("m") / (F.col("m") - 1) / (F.lit(4.0) * F.col("n") * F.col("n")) / F.col("m")
        + (F.col("n") * F.col("s2_01") - F.col("s1_01").cast(dec) * F.col("s1_01")).cast("double")
        / F.col("n") / (F.col("n") - 1) / (F.lit(4.0) * F.col("m") * F.col("m")) / F.col("n")
    )
    return j.select(
        F.round(auc, 6).alias("auc"),
        F.round(var, 6).alias("var_auc"),
        F.round(auc - F.lit(1.96) * F.sqrt(var), 6).alias("ci_lo"),
        F.round(auc + F.lit(1.96) * F.sqrt(var), 6).alias("ci_hi"),
    )


@query(
    "cochran_q",
    """WITH preds AS (
         SELECT CASE WHEN (n_chars > 500) = (lang = 'en') THEN 1 ELSE 0 END AS xa,
                CASE WHEN contains(concat(' ', lower(text), ' '), ' the ')
                          = (lang = 'en') THEN 1 ELSE 0 END AS xb,
                CASE WHEN contains(concat(' ', lower(text), ' '), ' and ')
                          = (lang = 'en') THEN 1 ELSE 0 END AS xc
         FROM documents),
       st AS (
         SELECT sum(xa)::BIGINT AS ga, sum(xb)::BIGINT AS gb, sum(xc)::BIGINT AS gc,
                sum(xa + xb + xc)::BIGINT AS sl,
                sum((xa + xb + xc)::HUGEINT * (xa + xb + xc)) AS sl2
         FROM preds)
       SELECT ga AS correct_a, gb AS correct_b, gc AS correct_c,
              CASE WHEN 3 * sl - sl2 > 0
                   THEN round(3 * 2 * ((ga::HUGEINT*ga + gb::HUGEINT*gb + gc::HUGEINT*gc)
                              - sl::HUGEINT * sl / 3.0)::DOUBLE
                              / (3 * sl - sl2)::DOUBLE, 6)
              END AS cochran_q
       FROM st""",
)
def q_cochran_q(spark, sf_dir):
    """Cochran's Q test (Cochran, Biometrika 1950) across THREE matched
    binary classifiers on the same documents — length>500, contains
    'the', contains 'and' — the k-classifier generalization of
    `mcnemar_test` (Q reduces to McNemar at k=2): are the three
    accuracy rates jointly distinguishable, before any pairwise
    comparison is licensed? Q = k(k−1)·(ΣG_j² − (ΣG)²/k)/(k·ΣL −
    ΣL²) from exact integer column sums G and row sums L in ONE pass;
    NULL when every document has the same number of correct rules
    (degenerate denominator)."""
    d = _docs(spark, sf_dir)
    dec = "decimal(38,0)"
    en = F.col("lang") == "en"
    xa = ((F.col("n_chars") > 500) == en).cast("long")
    xb = (F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" ")).contains(" the ") == en).cast("long")
    xc = (F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" ")).contains(" and ") == en).cast("long")
    rows_l = (xa + xb + xc).cast("long")
    st = d.select(xa.alias("xa"), xb.alias("xb"), xc.alias("xc"), rows_l.alias("l")).agg(
        F.sum("xa").cast("long").alias("ga"), F.sum("xb").cast("long").alias("gb"),
        F.sum("xc").cast("long").alias("gc"),
        F.sum("l").cast("long").alias("sl"),
        F.sum(F.col("l").cast(dec) * F.col("l").cast(dec)).cast(dec).alias("sl2"),
    )
    g2 = (
        F.col("ga").cast(dec) * F.col("ga") + F.col("gb").cast(dec) * F.col("gb")
        + F.col("gc").cast(dec) * F.col("gc")
    )
    q = (
        F.lit(6.0)
        * (g2.cast("double") - F.col("sl").cast(dec).cast("double") * F.col("sl") / 3.0)
        / (3 * F.col("sl") - F.col("sl2")).cast("double")
    )
    return st.select(
        F.col("ga").alias("correct_a"), F.col("gb").alias("correct_b"),
        F.col("gc").alias("correct_c"),
        F.when((3 * F.col("sl") - F.col("sl2")).cast("double") > 0, F.round(q, 6)).alias("cochran_q"),
    )


# --------------------------------------------------------------------------
# batch 74: prequential log loss, shuffle-quality audit, cross-source dups


@query(
    "prequential_logloss",
    """WITH toks AS (
         SELECT doc_id,
                unnest(range(len(string_split(trim(text), ' '))))::BIGINT AS pos,
                unnest(string_split(trim(text), ' ')) AS token
         FROM documents),
       vv AS (SELECT count(DISTINCT token)::BIGINT AS v FROM toks),
       seq AS (
         SELECT token,
                row_number() OVER (ORDER BY doc_id, pos) AS t,
                row_number() OVER (PARTITION BY token ORDER BY doc_id, pos) AS k
         FROM toks),
       terms AS (
         SELECT round(-1e6 * ln(((k - 1) + 0.5)
                                / ((t - 1) + vv.v / 2.0)))::BIGINT AS b
         FROM seq CROSS JOIN vv)
       SELECT count(*)::BIGINT AS n_tokens,
              (SELECT v FROM vv) AS vocab,
              round(sum(b) / 1e6, 6) AS total_nats,
              round(sum(b) / 1e6 / count(*), 6) AS nats_per_token
       FROM terms""",
)
def q_prequential_logloss(spark, sf_dir):
    """Prequential (online) log loss of the Krichevsky-Trofimov add-½
    estimator over the token stream in corpus order (KT 1981; the
    minimax sequential code): token t's loss is −ln((k_before+½)/
    (N_before+V/2)) with k its prior occurrences — the COMPRESSION
    cost of the corpus under an adaptive unigram code, the honest
    single-number answer to "how much information does this corpus
    actually carry" (static entropy `chao_shen_entropy` ignores
    adaptation; `word_burstiness` shows adaptation exists). Prior
    counts come from TWO row_number windows sharing the (doc_id, pos)
    order — no per-prefix rescans; per-token terms round once to
    micro-units."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.posexplode(T.tokenize(F.col("text"))).alias("pos", "token"))
    vv = toks.agg(F.count_distinct("token").cast("long").alias("v"))
    seq = toks.select(
        "token",
        F.row_number().over(Window.orderBy("doc_id", "pos")).alias("t"),
        F.row_number().over(Window.partitionBy("token").orderBy("doc_id", "pos")).alias("k"),
    )
    terms = seq.crossJoin(F.broadcast(vv)).select(
        F.round(
            F.lit(-1e6)
            * F.log(
                ((F.col("k") - 1) + 0.5) / ((F.col("t") - 1) + F.col("v") / 2.0)
            ),
            0,
        ).cast("long").alias("b")
    )
    return terms.crossJoin(F.broadcast(vv)).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.max("v").alias("vocab"),
        F.round(F.sum("b") / 1e6, 6).alias("total_nats"),
        F.round(F.sum("b") / 1e6 / F.count(F.lit(1)), 6).alias("nats_per_token"),
    )


@query(
    "shuffle_quality",
    f"""WITH ordered AS (
         SELECT source,
                row_number() OVER (
                  ORDER BY {md5_int_sql("concat('sh:', doc_id::VARCHAR)")}, doc_id)
                  AS rn
         FROM documents),
       adj AS (
         SELECT CASE WHEN lag(source) OVER (ORDER BY rn) IS NULL THEN NULL
                     WHEN source = lag(source) OVER (ORDER BY rn)
                     THEN 1 ELSE 0 END AS same
         FROM ordered),
       obs AS (SELECT sum(same)::BIGINT AS same_cnt,
                      count(same)::BIGINT AS n_adj
               FROM adj WHERE same IS NOT NULL),
       census AS (SELECT source, count(*)::BIGINT AS c FROM documents GROUP BY source),
       tot AS (SELECT sum(c)::BIGINT AS n,
                      sum(c::HUGEINT * (c - 1)::HUGEINT) AS c2 FROM census)
       SELECT obs.same_cnt, obs.n_adj,
              round(obs.same_cnt::DOUBLE / obs.n_adj, 6) AS p_same_adjacent,
              round(tot.c2::DOUBLE / (tot.n::HUGEINT * (tot.n - 1))::DOUBLE, 6)
                AS p_same_expected,
              round(obs.same_cnt::DOUBLE / obs.n_adj
                    - tot.c2::DOUBLE / (tot.n::HUGEINT * (tot.n - 1))::DOUBLE, 6)
                AS clumping_excess
       FROM obs CROSS JOIN tot""",
)
def q_shuffle_quality(spark, sf_dir):
    """Training-shuffle quality audit: order the corpus by the
    deterministic shuffle key md5('sh:'||doc_id) (the reproducible
    shuffle `hash_split`/`hash_sample` build on), then compare the
    ADJACENT-pair same-source rate against the exchangeability
    expectation Σc(c−1)/(N(N−1)). A sound hash shuffle lands at the
    expectation; clumping_excess ≫ 0 means consecutive training
    batches over-sample one source — the sequence-level bias that
    per-batch mixture audits (`mixture_epochs`) cannot see. One sort
    by the hash key + one lag window; expectation from the source
    census, all exact integers until two divisions."""
    d = _docs(spark, sf_dir)
    dec = "decimal(38,0)"
    key = md5_int(F.concat(F.lit("sh:"), F.col("doc_id").cast("string")))
    ordered = d.select(
        "source", F.row_number().over(Window.orderBy(key, "doc_id")).alias("rn")
    )
    adj = ordered.select(
        (F.col("source") == F.lag("source").over(Window.orderBy("rn"))).cast("long").alias("same")
    ).where(F.col("same").isNotNull())
    obs = adj.agg(
        F.sum("same").cast("long").alias("same_cnt"),
        F.count("same").cast("long").alias("n_adj"),
    )
    census = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = census.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("c").cast(dec) * (F.col("c") - 1).cast(dec)).cast(dec).alias("c2"),
    )
    j = obs.crossJoin(F.broadcast(tot))
    p_obs = F.col("same_cnt").cast("double") / F.col("n_adj")
    p_exp = F.col("c2").cast("double") / (
        F.col("n").cast(dec) * (F.col("n") - 1).cast(dec)
    ).cast("double")
    return j.select(
        "same_cnt", "n_adj",
        F.round(p_obs, 6).alias("p_same_adjacent"),
        F.round(p_exp, 6).alias("p_same_expected"),
        F.round(p_obs - p_exp, 6).alias("clumping_excess"),
    )


def _dup_cross_sql() -> str:
    return (
        f"WITH RECURSIVE {_simhash_pairs_cte()},\n"
        """       lab AS (SELECT doc_id, source FROM documents),
       m AS (
         SELECT least(la.source, lb.source) AS src_a,
                greatest(la.source, lb.source) AS src_b,
                count(*)::BIGINT AS n_dup_pairs,
                sum(CASE WHEN p.hamming = 0 THEN 1 ELSE 0 END)::BIGINT AS n_exactish
         FROM nd_pairs p JOIN lab la ON la.doc_id = p.id_a
                         JOIN lab lb ON lb.doc_id = p.id_b
         GROUP BY 1, 2)
       SELECT src_a, src_b, n_dup_pairs, n_exactish,
              (src_a <> src_b) AS cross_source
       FROM m"""
    )


@query("dup_cross_source_matrix", _dup_cross_sql())
def q_dup_cross_source_matrix(spark, sf_dir):
    """Cross-source near-duplicate matrix: the SimHash near-dup pair
    list (banded once, the `linkage_profile` gate) aggregated by
    unordered source pair — the mirror-site detector. A heavy
    OFF-diagonal cell means two sources republish the same content
    (syndication/mirrors): dedup should then canonicalize BY CLUSTER
    across sources, and `loo_source_value`-style marginal source
    valuations are double-counting. Diagonal cells are within-source
    boilerplate (`word_dispersion_dp`'s culprits). One broadcast-dim
    join from pair ids to sources, one groupBy over unordered pairs."""
    docs = _docs(spark, sf_dir)
    pairs = D.simhash_near_dup_pairs(
        docs, "text", "doc_id", bits=_SIMHASH_BITS, bands=4, max_hamming=3
    )
    lab = F.broadcast(docs.select("doc_id", "source"))
    j = (
        pairs.join(lab.selectExpr("doc_id AS id_a", "source AS sa"), "id_a")
        .join(lab.selectExpr("doc_id AS id_b", "source AS sb"), "id_b")
    )
    return (
        j.groupBy(
            F.least("sa", "sb").alias("src_a"), F.greatest("sa", "sb").alias("src_b")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_pairs"),
            F.sum((F.col("hamming") == 0).cast("long")).cast("long").alias("n_exactish"),
        )
        .select(
            "src_a", "src_b", "n_dup_pairs", "n_exactish",
            (F.col("src_a") != F.col("src_b")).alias("cross_source"),
        )
    )


# --------------------------------------------------------------------------
# batch 75: seasonal Mann-Kendall, runs test, Friedman test


@query(
    "seasonal_kendall",
    """WITH cell AS (
         SELECT extract(hour FROM ts)::BIGINT AS h,
                date_diff('day', DATE '2024-01-01', ts::DATE)::BIGINT AS d,
                count(*)::BIGINT AS x
         FROM events GROUP BY 1, 2),
       s_h AS (
         SELECT a.h,
                sum(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END)::BIGINT AS s,
                count(DISTINCT a.d)::BIGINT AS n
         FROM cell a JOIN cell b ON a.h = b.h AND b.d > a.d
         GROUP BY a.h),
       ties AS (
         SELECT h, sum(t::HUGEINT * (t - 1) * (2 * t + 5))::BIGINT AS tie_term
         FROM (SELECT h, x, count(*)::BIGINT AS t FROM cell GROUP BY h, x)
         GROUP BY h),
       agg AS (
         SELECT sum(s.s)::BIGINT AS s_tot,
                sum(s.n::HUGEINT * (s.n - 1) * (2 * s.n + 5)
                    - coalesce(t.tie_term, 0))::BIGINT AS var18
         FROM s_h s LEFT JOIN ties t ON t.h = s.h)
       SELECT s_tot, round(var18 / 18.0, 6) AS var_s,
              round((s_tot - CASE WHEN s_tot > 0 THEN 1
                                  WHEN s_tot < 0 THEN -1 ELSE 0 END)
                    / sqrt(var18 / 18.0), 6) AS z
       FROM agg""",
)
def q_seasonal_kendall(spark, sf_dir):
    """Seasonal Mann-Kendall trend test (Hirsch & Slack, WRR 1984): the
    Mann-Kendall S statistic computed WITHIN each hour-of-day slice of
    the daily event counts and summed — so the diurnal cycle
    (`seasonal_profile`) cannot masquerade as trend, the failure mode
    of the plain `mann_kendall_sen` on periodic data. Per-slice S is
    an exact integer pair census over the tiny day×hour grid (30 days
    per slice — the quadratic stays inside the slice); the variance
    uses the exact tie correction Σt(t−1)(2t+5); one continuity-
    corrected z at the end."""
    ev = _events(spark, sf_dir)
    dec = "decimal(38,0)"
    cell = ev.groupBy(
        F.hour("ts").cast("long").alias("h"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).cast("long").alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x")).localCheckpoint(eager=True)
    a, b = cell.alias("a"), cell.alias("b")
    s_h = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("b.d") > F.col("a.d")))
        .groupBy(F.col("a.h").alias("h"))
        .agg(
            F.sum(
                F.when(F.col("b.x") > F.col("a.x"), 1)
                .when(F.col("b.x") < F.col("a.x"), -1)
                .otherwise(0)
            ).cast("long").alias("s"),
            F.count_distinct(F.col("a.d")).cast("long").alias("n"),
        )
    )
    ties = (
        cell.groupBy("h", "x").agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("h")
        .agg(
            F.sum(F.col("t").cast(dec) * (F.col("t") - 1) * (2 * F.col("t") + 5))
            .cast("long").alias("tie_term")
        )
    )
    agg = (
        s_h.join(ties, "h", "left")
        .agg(
            F.sum("s").cast("long").alias("s_tot"),
            F.sum(
                F.col("n").cast(dec) * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.coalesce(F.col("tie_term"), F.lit(0))
            ).cast("long").alias("var18"),
        )
    )
    cont = F.when(F.col("s_tot") > 0, 1).when(F.col("s_tot") < 0, -1).otherwise(0)
    return agg.select(
        "s_tot",
        F.round(F.col("var18") / 18.0, 6).alias("var_s"),
        F.round((F.col("s_tot") - cont) / F.sqrt(F.col("var18") / 18.0), 6).alias("z"),
    )


@query(
    "runs_test",
    """WITH daily AS (
         SELECT date_diff('day', DATE '2024-01-01', ts::DATE)::BIGINT AS d,
                count(*)::BIGINT AS x
         FROM events GROUP BY 1),
       med AS (
         SELECT x AS m FROM (
           SELECT x, row_number() OVER (ORDER BY x, d) AS rn, count(*) OVER () AS n
           FROM daily)
         WHERE rn = (n + 1) // 2),
       signs AS (
         SELECT d, CASE WHEN x > (SELECT m FROM med) THEN 1 ELSE 0 END AS s
         FROM daily WHERE x <> (SELECT m FROM med)),
       flips AS (
         SELECT s,
                coalesce(CASE WHEN s <> lag(s) OVER (ORDER BY d)
                              THEN 1 ELSE 0 END, 0) AS flip
         FROM signs),
       runs AS (
         SELECT sum(flip)::BIGINT + 1 AS r,
                sum(s)::BIGINT AS n1,
                sum(1 - s)::BIGINT AS n2
         FROM flips)
       SELECT r AS n_runs, n1 AS n_above, n2 AS n_below,
              round(2.0 * n1 * n2 / (n1 + n2) + 1, 6) AS expected_runs,
              round((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                    / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                           / ((n1 + n2) * (n1 + n2)::DOUBLE * (n1 + n2 - 1))), 6) AS z
       FROM runs""",
)
def q_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test (Ann. Math. Stat. 1940) on the daily
    event-count series dichotomized at its exact median (median-equal
    days dropped, the standard convention): too FEW runs of
    above/below means level shifts or trend (`cusum_changepoint`'s
    territory), too MANY means oscillation/negative autocorrelation —
    the distribution-free randomness gate to run before trusting
    i.i.d.-assuming monitors. Runs and margins are exact integers from
    one lag window; E[R] and Var[R] are the closed forms in one
    identical float expression."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).cast("long").alias("d")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    wn = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    med = (
        daily.select("x", F.row_number().over(Window.orderBy("x", "d")).alias("rn"),
                     F.count(F.lit(1)).over(wn).alias("n"))
        .where(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select(F.col("x").alias("m"))
    )
    signs = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("x") != F.col("m"))
        .select("d", (F.col("x") > F.col("m")).cast("long").alias("s"))
    )
    flips = signs.select(
        "s",
        F.coalesce(
            (F.col("s") != F.lag("s").over(Window.orderBy("d"))).cast("long"), F.lit(0)
        ).alias("flip"),
    )
    runs = flips.agg(
        (F.sum("flip") + 1).cast("long").alias("r"),
        F.sum("s").cast("long").alias("n1"),
        F.sum(1 - F.col("s")).cast("long").alias("n2"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    er = 2.0 * d_("n1") * d_("n2") / (F.col("n1") + F.col("n2")) + 1
    vr = (
        2.0 * d_("n1") * d_("n2") * (2.0 * d_("n1") * d_("n2") - F.col("n1") - F.col("n2"))
        / (
            (F.col("n1") + F.col("n2"))
            * (F.col("n1") + F.col("n2")).cast("double")
            * (F.col("n1") + F.col("n2") - 1)
        )
    )
    return runs.select(
        F.col("r").alias("n_runs"), F.col("n1").alias("n_above"), F.col("n2").alias("n_below"),
        F.round(er, 6).alias("expected_runs"),
        F.round((F.col("r") - er) / F.sqrt(vr), 6).alias("z"),
    )


@query(
    "friedman_test",
    """WITH days AS (SELECT DISTINCT date_diff('day', DATE '2024-01-01', ts::DATE)::BIGINT AS d
                     FROM events),
       types AS (SELECT DISTINCT event_type FROM events),
       cnt AS (
         SELECT date_diff('day', DATE '2024-01-01', ts::DATE)::BIGINT AS d,
                event_type, count(*)::BIGINT AS x
         FROM events GROUP BY 1, 2),
       dense AS (
         SELECT days.d, types.event_type, coalesce(cnt.x, 0)::BIGINT AS x
         FROM days CROSS JOIN types
         LEFT JOIN cnt ON cnt.d = days.d AND cnt.event_type = types.event_type),
       ranked AS (
         -- mid-ranks in HALF-units: 2*rank_lo + (ties - 1), exact integers
         SELECT d, event_type,
                2 * rank() OVER (PARTITION BY d ORDER BY x)
                  + count(*) OVER (PARTITION BY d, x) - 1 AS r2
         FROM dense),
       rj AS (
         SELECT event_type, sum(r2)::BIGINT AS r2_sum
         FROM ranked GROUP BY event_type),
       st AS (
         SELECT count(*)::BIGINT AS k,
                sum(r2_sum::HUGEINT * r2_sum) AS sum_r2_sq,
                (SELECT count(*) FROM days)::BIGINT AS n
         FROM rj)
       SELECT rj.event_type, round(rj.r2_sum / 2.0 / st.n, 6) AS mean_rank,
              round(12.0 / (st.n * st.k * (st.k + 1)) * st.sum_r2_sq::DOUBLE / 4.0
                    - 3.0 * st.n * (st.k + 1), 6) AS friedman_chi2
       FROM rj CROSS JOIN st""",
)
def q_friedman_test(spark, sf_dir):
    """Friedman rank test (JASA 1937) for "do the event types keep the
    same daily ordering?": within each day (block), rank the types by
    count with exact HALF-UNIT mid-ranks (2·rank + ties − 1 — integer
    tie handling, no float averaging), then χ²_F = 12/(nk(k+1))·ΣR_j²
    − 3n(k+1). The repeated-measures complement to `kruskal_wallis`
    (independent groups): days are blocks, so day-level volume shifts
    cancel and only the within-day ORDERING is tested — the right
    null for "did the event mix change" when traffic itself is
    nonstationary. Zero-densified over the day×type grid; exact
    integer rank sums; the uncorrected statistic (no tie-variance
    denominator) is reported, ties being already exact in the ranks."""
    ev = _events(spark, sf_dir)
    dec = "decimal(38,0)"
    cnt = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).cast("long").alias("d"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    days = cnt.select("d").distinct()
    types = cnt.select("event_type").distinct()
    dense = (
        days.crossJoin(F.broadcast(types))
        .join(cnt, ["d", "event_type"], "left")
        .select("d", "event_type", F.coalesce("x", F.lit(0)).cast("long").alias("x"))
    )
    wd = Window.partitionBy("d").orderBy("x")
    wt = Window.partitionBy("d", "x")
    ranked = dense.select(
        "d", "event_type",
        (2 * F.rank().over(wd) + F.count(F.lit(1)).over(wt) - 1).cast("long").alias("r2"),
    )
    rj = ranked.groupBy("event_type").agg(F.sum("r2").cast("long").alias("r2_sum"))
    st = rj.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("r2_sum").cast(dec) * F.col("r2_sum").cast(dec)).cast(dec).alias("sum_r2_sq"),
    ).crossJoin(F.broadcast(days.agg(F.count(F.lit(1)).cast("long").alias("n"))))
    return rj.crossJoin(F.broadcast(st)).select(
        "event_type",
        F.round(F.col("r2_sum") / 2.0 / F.col("n"), 6).alias("mean_rank"),
        F.round(
            12.0 / (F.col("n") * F.col("k") * (F.col("k") + 1))
            * F.col("sum_r2_sq").cast("double") / 4.0
            - 3.0 * F.col("n") * (F.col("k") + 1),
            6,
        ).alias("friedman_chi2"),
    )


# --------------------------------------------------------------------------
# batch 76: Fellegi-Sunter linkage, DP histogram release, k-center coreset,
# Cramér-von Mises drift, Wilcoxon signed-rank

_FS_M = 0.9  # P(field agrees | true match) prior — no labels available


def _fs_sql() -> str:
    fields = ["g_lang", "g_source", "g_t1", "g_t2"]
    u_cols = ", ".join(f"avg({g}) AS u_{g}" for g in fields)
    clamp = ", ".join(
        f"least(greatest(u_{g}, 0.5 / n_pairs), 1 - 0.5 / n_pairs) AS u_{g}"
        for g in fields
    )
    score = " + ".join(
        f"(CASE WHEN p.{g} = 1 THEN log2({_FS_M} / u.u_{g}) "
        f"ELSE log2({1 - _FS_M} / (1 - u.u_{g})) END)"
        for g in fields
    )
    n_agree = " + ".join(f"p.{g}" for g in fields)
    return f"""WITH recs AS (
         SELECT doc_id, lang, source, n_chars // 50 AS blk,
                string_split(trim(text), ' ')[1] AS t1,
                string_split(trim(text), ' ')[-1] AS t2
         FROM documents),
       pairs AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                (a.lang = b.lang)::BIGINT AS g_lang,
                (a.source = b.source)::BIGINT AS g_source,
                (a.t1 = b.t1)::BIGINT AS g_t1,
                (a.t2 = b.t2)::BIGINT AS g_t2
         FROM recs a JOIN recs b ON a.blk = b.blk AND a.doc_id < b.doc_id),
       u_raw AS (SELECT count(*)::DOUBLE AS n_pairs, {u_cols} FROM pairs),
       u AS (SELECT {clamp} FROM u_raw)
       SELECT p.id_a, p.id_b, ({n_agree})::BIGINT AS n_agree,
              round({score}, 6) AS fs_score
       FROM pairs p CROSS JOIN u
       WHERE {score} > 0"""


@query("fellegi_sunter", _fs_sql())
def q_fellegi_sunter(spark, sf_dir):
    """Fellegi-Sunter probabilistic record linkage (JASA 1969 — the
    canonical entity-resolution scoring rule; reference analogue: the
    dedup/merge semantics of `merge_results`' key alignment, pliers
    extractors/base.py:283+, generalized to fuzzy identity). Records are
    blocked on a length bucket (the standard O(n·B) candidate-generation
    join — never all-pairs), compared on 4 fields (lang, source,
    first/last token); u-probabilities (P(agree | non-match)) are
    ESTIMATED from the candidate pairs themselves (clamped away from
    0/1), m fixed at 0.9, and each pair scores Σ log2(m/u) over agreeing
    fields + Σ log2((1−m)/(1−u)) over disagreeing ones. Pairs with
    positive total weight are emitted as match candidates. Scale shape:
    the blocked self-join shuffles on blk; the u-estimate is one
    map-side-partial aggregate broadcast back — no second shuffle."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), " ")
    recs = docs.select(
        "doc_id", "lang", "source",
        F.floor(F.col("n_chars") / 50).cast("long").alias("blk"),
        F.element_at(toks, 1).alias("t1"),
        F.element_at(toks, -1).alias("t2"),
    )
    a, b = recs.alias("a"), recs.alias("b")
    g = lambda f: (F.col(f"a.{f}") == F.col(f"b.{f}")).cast("long").alias(f"g_{f}")  # noqa: E731
    pairs = a.join(
        b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(
        F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"),
        g("lang"), g("source"), g("t1"), g("t2"),
    )
    fields = ["g_lang", "g_source", "g_t1", "g_t2"]
    u_raw = pairs.agg(
        F.count(F.lit(1)).cast("double").alias("n_pairs"),
        *[F.avg(f).alias(f"u_{f}") for f in fields],
    )
    u = u_raw.select(
        *[
            F.least(
                F.greatest(F.col(f"u_{f}"), 0.5 / F.col("n_pairs")),
                1 - 0.5 / F.col("n_pairs"),
            ).alias(f"u_{f}")
            for f in fields
        ]
    )
    scored = pairs.crossJoin(F.broadcast(u))
    score = None
    for f in fields:
        term = F.when(
            F.col(f) == 1, F.log2(F.lit(_FS_M) / F.col(f"u_{f}"))
        ).otherwise(F.log2(F.lit(1 - _FS_M) / (1 - F.col(f"u_{f}"))))
        score = term if score is None else score + term
    n_agree = sum(F.col(f) for f in fields).cast("long")
    return scored.where(score > 0).select(
        "id_a", "id_b", n_agree.alias("n_agree"), F.round(score, 6).alias("fs_score")
    )


_DP_EPS = 1.0
_DP_TAU = 10
_DP_SEED = 77


def _dp_hist_sql() -> str:
    h = md5_int_sql("tok", seed=_DP_SEED)
    u = f"(({h} % 1000000) + 0.5) / 1e6"
    lap = f"(-1.0 / {_DP_EPS}) * sign({u} - 0.5) * ln(1 - 2 * abs({u} - 0.5))"
    return f"""WITH toks AS (
         SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents),
       cnt AS (SELECT tok, count(*)::BIGINT AS c FROM toks WHERE tok <> '' GROUP BY tok)
       SELECT tok, (c + round({lap})::BIGINT) AS noisy_count
       FROM cnt
       WHERE c + round({lap})::BIGINT >= {_DP_TAU}"""


@query("dp_token_hist", _dp_hist_sql())
def q_dp_token_hist(spark, sf_dir):
    """ε-differentially-private vocabulary release (Laplace mechanism +
    thresholding — Dwork et al. 2006; the Google/Apple "private
    histogram" pattern for releasing token statistics from a private
    corpus). Exact token counts get integer Laplace(1/ε) noise (ε=1)
    and only tokens whose NOISY count clears τ=10 are released — the
    thresholding is what protects the long tail of rare (potentially
    identifying) tokens. Sandbox determinism: the noise draw's uniform
    comes from a seeded md5 of the token (identical in both engines) —
    a production run swaps in a secret per-release seed; everything
    else is unchanged. Scale shape: one map-side-partial token count;
    the noise is a scalar expression on the grouped result (no second
    pass, no driver state)."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("tok")
    ).where(F.col("tok") != "")
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    u = ((md5_int(F.col("tok"), seed=_DP_SEED) % 1000000) + 0.5) / 1e6
    lap = (-1.0 / _DP_EPS) * F.signum(u - 0.5) * F.log(1 - 2 * F.abs(u - 0.5))
    noisy = (F.col("c") + F.round(lap, 0).cast("long")).alias("noisy_count")
    return cnt.select("tok", noisy).where(F.col("noisy_count") >= _DP_TAU)


_KC_K = 5
_KC_SEED_ID = 0


def _kcenter_d2_sql(emb_a: str, emb_q: str) -> str:
    return (
        f"round(1e6 * list_sum(list_transform(range(1, len({emb_a}) + 1), "
        f"i -> ({emb_a}[i]::DOUBLE - {emb_q}[i]::DOUBLE) "
        f"* ({emb_a}[i]::DOUBLE - {emb_q}[i]::DOUBLE))))::BIGINT"
    )


def _kcenter_sql() -> str:
    d2 = _kcenter_d2_sql("a.embedding", "q.embedding")
    ctes = [
        f"""sel1 AS MATERIALIZED (
         SELECT vec_id, 1::BIGINT AS pick_order, 0::BIGINT AS dist_micro
         FROM embeddings WHERE vec_id = {_KC_SEED_ID})""",
        f"""m1 AS MATERIALIZED (
         SELECT a.vec_id, {d2} AS md
         FROM embeddings a
         CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = {_KC_SEED_ID}) q)""",
    ]
    for r in range(2, _KC_K + 1):
        ctes.append(
            f"""pick{r} AS MATERIALIZED (
         SELECT m.vec_id, {r}::BIGINT AS pick_order, m.md AS dist_micro
         FROM m{r - 1} m ANTI JOIN sel{r - 1} s ON s.vec_id = m.vec_id
         ORDER BY m.md DESC, m.vec_id LIMIT 1),
       sel{r} AS MATERIALIZED (
         SELECT * FROM sel{r - 1}
         UNION ALL SELECT vec_id, pick_order, dist_micro FROM pick{r})"""
        )
        if r < _KC_K:
            ctes.append(
                f"""m{r} AS MATERIALIZED (
         SELECT m.vec_id, least(m.md, {d2}) AS md
         FROM m{r - 1} m JOIN embeddings a ON a.vec_id = m.vec_id
         CROSS JOIN (SELECT e.embedding FROM embeddings e
                     JOIN pick{r} p ON p.vec_id = e.vec_id) q)"""
            )
    return (
        "WITH "
        + ",\n       ".join(ctes)
        + f"""
       SELECT vec_id, pick_order, dist_micro FROM sel{_KC_K}"""
    )


@query("kcenter_coreset", _kcenter_sql())
def q_kcenter_coreset(spark, sf_dir):
    """Greedy k-center / farthest-point coreset selection (Gonzalez,
    TCS 1985 — the 2-approximation behind diversity-maximizing training
    -data selection and SemDeDup-style pruning seeds): starting from
    vec 0, each of K=5 rounds picks the point FARTHEST from its nearest
    already-chosen center (squared-L2 in integer micro-units, ties by
    vec_id). Each round is one full scan computing min-distance against
    ≤K broadcast literal centers + a TakeOrderedAndProject(1) — K scans
    total, never a K×N×N matrix; the only driver state is the K picked
    vectors (the same K-bounded collect `kmeans_fit` uses per Lloyd
    round). `dist_micro` is the selection-time distance = the coverage
    radius guarantee r_K of the chosen coreset."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )

    def d2_lit(center: list[float]):
        carr = F.array(*[F.lit(float(v)) for v in center])
        diff = F.zip_with(F.col("embedding"), carr, lambda x, y: (x - y) * (x - y))
        s = F.aggregate(diff, F.lit(0.0), lambda acc, z: acc + z)
        return F.round(s * 1e6, 0).cast("long")

    seed = emb.where(F.col("vec_id") == _KC_SEED_ID).collect()[0]
    centers = [(int(seed["vec_id"]), list(seed["embedding"]))]
    rows = [(int(seed["vec_id"]), 1, 0)]
    for r in range(2, _KC_K + 1):
        picked_ids = [c[0] for c in centers]
        mind = F.least(*[d2_lit(c[1]) for c in centers]) if len(centers) > 1 else d2_lit(centers[0][1])
        top = (
            emb.where(~F.col("vec_id").isin(picked_ids))
            .select("vec_id", mind.alias("md"), "embedding")
            .orderBy(F.desc("md"), "vec_id")
            .limit(1)
            .collect()[0]
        )
        centers.append((int(top["vec_id"]), list(top["embedding"])))
        rows.append((int(top["vec_id"]), r, int(top["md"])))
    return spark.createDataFrame(
        rows, "vec_id long, pick_order long, dist_micro long"
    )


@query(
    "cvm_drift",
    """WITH s AS (
         SELECT value, event_id,
                (event_type = 'click')::BIGINT AS is_x
         FROM events WHERE event_type IN ('click', 'view')),
       ranked AS (
         SELECT is_x,
                row_number() OVER (ORDER BY value, event_id) AS r,
                row_number() OVER (PARTITION BY is_x ORDER BY value, event_id) AS i
         FROM s),
       nn AS (
         SELECT sum(is_x)::BIGINT AS n, (count(*) - sum(is_x))::BIGINT AS m
         FROM ranked),
       u AS (
         SELECT sum(CASE WHEN is_x = 1
                         THEN nn.n::HUGEINT * (r - i) * (r - i) END) AS ux,
                sum(CASE WHEN is_x = 0
                         THEN nn.m::HUGEINT * (r - i) * (r - i) END) AS uy
         FROM ranked CROSS JOIN nn)
       SELECT nn.n AS n_x, nn.m AS n_y,
              round((u.ux + u.uy)::DOUBLE / (nn.n::DOUBLE * nn.m * (nn.n + nn.m))
                    - (4.0 * nn.n * nn.m - 1) / (6.0 * (nn.n + nn.m)), 6) AS cvm_t
       FROM u CROSS JOIN nn""",
)
def q_cvm_drift(spark, sf_dir):
    """Two-sample Cramér-von Mises drift statistic (Anderson, AMS 1962
    rank formula) between the 'click' and 'view' value distributions —
    the integrated-squared-ECDF-gap complement to `ks_drift`'s
    supremum: CvM sees diffuse distribution shifts a single-point KS
    gap misses. U = N·Σ(r_i−i)² + M·Σ(s_j−j)² over combined ranks
    (deterministic total order: value then event_id — ties get a fixed
    arbitration identically in both engines), T = U/(NM(N+M)) −
    (4NM−1)/(6(N+M)). Rank sums stay in exact integers (decimal/HUGEINT)
    — the only float op is the final normalization. Scale shape: one
    global sort (the same shape as any ranked statistic) + one
    map-side-partial aggregate; no joins."""
    ev = _events(spark, sf_dir).where(F.col("event_type").isin("click", "view"))
    dec = "decimal(38,0)"
    s = ev.select(
        "value", "event_id", (F.col("event_type") == "click").cast("long").alias("is_x")
    )
    ranked = s.select(
        "is_x",
        F.row_number().over(Window.orderBy("value", "event_id")).alias("r"),
        F.row_number()
        .over(Window.partitionBy("is_x").orderBy("value", "event_id"))
        .alias("i"),
    )
    nn = ranked.agg(
        F.sum("is_x").cast("long").alias("n"),
        (F.count(F.lit(1)) - F.sum("is_x")).cast("long").alias("m"),
    )
    d = (F.col("r") - F.col("i")).cast(dec)
    u = ranked.crossJoin(F.broadcast(nn)).agg(
        F.sum(F.when(F.col("is_x") == 1, F.col("n").cast(dec) * d * d)).cast(dec).alias("ux"),
        F.sum(F.when(F.col("is_x") == 0, F.col("m").cast(dec) * d * d)).cast(dec).alias("uy"),
        F.first("n").alias("n"),
        F.first("m").alias("m"),
    )
    return u.select(
        F.col("n").alias("n_x"),
        F.col("m").alias("n_y"),
        F.round(
            (F.col("ux") + F.col("uy")).cast("double")
            / (F.col("n").cast("double") * F.col("m") * (F.col("n") + F.col("m")))
            - (4.0 * F.col("n") * F.col("m") - 1) / (6.0 * (F.col("n") + F.col("m"))),
            6,
        ).alias("cvm_t"),
    )


@query(
    "wilcoxon_signed",
    """WITH ordered AS (
         SELECT user_id, value,
                row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                count(*) OVER (PARTITION BY user_id) AS n
         FROM events),
       halves AS (
         SELECT user_id,
                sum(CASE WHEN rn <= n // 2 THEN round(1e6 * value)::BIGINT END) AS s1,
                count(CASE WHEN rn <= n // 2 THEN 1 END)::BIGINT AS c1,
                sum(CASE WHEN rn > n // 2 THEN round(1e6 * value)::BIGINT END) AS s2,
                count(CASE WHEN rn > n // 2 THEN 1 END)::BIGINT AS c2
         FROM ordered GROUP BY user_id),
       diffs AS (
         SELECT user_id,
                round(s2::DOUBLE / c2 - s1::DOUBLE / c1)::BIGINT AS d
         FROM halves WHERE c1 >= 1),
       nz AS (SELECT user_id, d FROM diffs WHERE d <> 0),
       ranked AS (
         -- mid-ranks of |d| in HALF-units: 2*rank_lo + (ties - 1)
         SELECT d,
                2 * rank() OVER (ORDER BY abs(d))
                  + count(*) OVER (PARTITION BY abs(d)) - 1 AS r2
         FROM nz),
       st AS (
         SELECT count(*)::BIGINT AS n,
                sum(CASE WHEN d > 0 THEN r2 ELSE 0 END)::BIGINT AS w2
         FROM ranked)
       SELECT n AS n_pairs,
              round(w2 / 2.0, 6) AS w_plus,
              round((w2 / 2.0 - n * (n + 1) / 4.0)
                    / sqrt(n * (n + 1) * (2.0 * n + 1) / 24.0), 6) AS z
       FROM st""",
)
def q_wilcoxon_signed(spark, sf_dir):
    """Wilcoxon signed-rank test (Biometrics 1945) for "did per-user
    engagement shift within the window?": each user's event stream is
    split at its midpoint (by ts), the paired difference is
    second-half-mean − first-half-mean in integer micro-units (sums of
    micro-ints, so both engines derive bit-identical diffs), zero
    diffs drop per the classical procedure, |d| gets exact HALF-UNIT
    mid-ranks (2·rank + ties − 1 — same integer tie handling as
    `friedman_test`), and z normalizes W⁺ by its null mean/variance.
    The PAIRED complement to `cvm_drift`/`ks_drift`: user identity is
    blocked out, so population-mix shifts don't masquerade as drift.
    Scale shape: one shuffle on user_id for the halves, one global
    rank over the (users-sized, not events-sized) diff set."""
    ev = _events(spark, sf_dir)
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    ordered = ev.select(
        "user_id",
        F.round(F.col("value") * 1e6, 0).cast("long").alias("vm"),
        F.row_number().over(wu).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    halves = (
        ordered.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("rn") <= F.floor(F.col("n") / 2), F.col("vm"))).alias("s1"),
            F.count(F.when(F.col("rn") <= F.floor(F.col("n") / 2), F.lit(1))).cast("long").alias("c1"),
            F.sum(F.when(F.col("rn") > F.floor(F.col("n") / 2), F.col("vm"))).alias("s2"),
            F.count(F.when(F.col("rn") > F.floor(F.col("n") / 2), F.lit(1))).cast("long").alias("c2"),
        )
        .where(F.col("c1") >= 1)
    )
    diffs = halves.select(
        F.round(F.col("s2").cast("double") / F.col("c2") - F.col("s1").cast("double") / F.col("c1"), 0)
        .cast("long")
        .alias("d")
    ).where(F.col("d") != 0)
    wr = Window.orderBy(F.abs(F.col("d")))
    wt = Window.partitionBy(F.abs(F.col("d")))
    ranked = diffs.select(
        "d", (2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1).cast("long").alias("r2")
    )
    st = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("d") > 0, F.col("r2")).otherwise(F.lit(0))).cast("long").alias("w2"),
    )
    return st.select(
        F.col("n").alias("n_pairs"),
        F.round(F.col("w2") / 2.0, 6).alias("w_plus"),
        F.round(
            (F.col("w2") / 2.0 - F.col("n") * (F.col("n") + 1) / 4.0)
            / F.sqrt(F.col("n") * (F.col("n") + 1) * (2.0 * F.col("n") + 1) / 24.0),
            6,
        ).alias("z"),
    )


# --------------------------------------------------------------------------
# batch 77: Harmonic-k compaction planning, LOO kNN label probe,
# hash-randomization permutation test

_CB_CAP = 1024
_CB_K = 8


@query(
    "compaction_bins",
    f"""WITH items AS (
         SELECT doc_id, n_chars,
                least(greatest({_CB_CAP} // n_chars, 1), {_CB_K}) AS cls
         FROM documents WHERE n_chars >= 1),
       placed AS (
         SELECT cls, n_chars,
                (row_number() OVER (PARTITION BY cls
                                    ORDER BY n_chars DESC, doc_id) - 1) // cls AS bin_seq
         FROM items)
       SELECT cls AS size_class, bin_seq,
              count(*)::BIGINT AS n_items,
              sum(n_chars)::BIGINT AS fill_chars,
              round(sum(n_chars) / {_CB_CAP}.0, 6) AS fill_ratio
       FROM placed GROUP BY cls, bin_seq""",
)
def q_compaction_bins(spark, sf_dir):
    """Small-file compaction planning via HARMONIC-k bin packing (Lee &
    Lee, JACM 1985 — competitive ratio 1.691): each item (doc, size
    n_chars, bin capacity {_CB_CAP}) goes to size class k =
    clamp(floor(cap/size), 1, {_CB_K}); class k bins take EXACTLY k
    items, so items of class k (size ≤ cap/k) always fit and every
    closed bin of an unclamped class (k < {_CB_K}) is > k/(k+1) full
    (the clamped last class pools everything ≤ cap/{_CB_K}, so only
    the fits-in-cap invariant holds there). Unlike first-fit-decreasing — whose
    sequential bin state serializes the planner — class assignment and
    within-class placement are pure window arithmetic: one hash
    partition by class, one rank, zero iterative state, so planning a
    100 TB table's compaction is a single shuffle. The per-bin manifest
    (class, seq, items, fill) is what a rewrite job consumes."""
    d = _docs(spark, sf_dir).where(F.col("n_chars") >= 1)
    items = d.select(
        "doc_id", "n_chars",
        F.least(
            F.greatest(F.floor(_CB_CAP / F.col("n_chars")).cast("long"), F.lit(1)),
            F.lit(_CB_K),
        ).alias("cls"),
    )
    w = Window.partitionBy("cls").orderBy(F.desc("n_chars"), "doc_id")
    placed = items.select(
        "cls", "n_chars",
        F.floor((F.row_number().over(w) - 1) / F.col("cls")).cast("long").alias("bin_seq"),
    )
    return placed.groupBy(
        F.col("cls").alias("size_class"), "bin_seq"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("n_chars").cast("long").alias("fill_chars"),
        F.round(F.sum("n_chars") / float(_CB_CAP), 6).alias("fill_ratio"),
    )


_KNN_K = 5


def _knn_probe_sql() -> str:
    dot = "list_sum(list_transform(range(1, len(a.embedding)+1), i -> a.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE))"
    na = "sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))"
    nq = "sqrt(list_sum(list_transform(q.embedding, x -> x::DOUBLE * x::DOUBLE)))"
    return f"""WITH scored AS (
         SELECT q.vec_id AS qid, q.label AS true_label, a.label AS nb_label,
                round(1e6 * {dot} / ({na} * {nq}))::BIGINT AS cm,
                a.vec_id AS nid
         FROM embeddings q JOIN embeddings a ON a.vec_id <> q.vec_id),
       topk AS (
         SELECT qid, true_label, nb_label,
                row_number() OVER (PARTITION BY qid ORDER BY cm DESC, nid) AS rk
         FROM scored),
       votes AS (
         SELECT qid, true_label, nb_label, count(*)::BIGINT AS v
         FROM topk WHERE rk <= {_KNN_K} GROUP BY 1, 2, 3),
       pred AS (
         SELECT qid, true_label, nb_label AS pred_label,
                row_number() OVER (PARTITION BY qid ORDER BY v DESC, nb_label) AS pr
         FROM votes)
       SELECT true_label AS label, count(*)::BIGINT AS n,
              sum((pred_label = true_label)::BIGINT)::BIGINT AS correct,
              round(sum((pred_label = true_label)::BIGINT)::DOUBLE / count(*), 6) AS acc
       FROM pred WHERE pr = 1 GROUP BY true_label"""


@query("knn_probe", _knn_probe_sql())
def q_knn_probe(spark, sf_dir):
    """Leave-one-out kNN label probe (the standard zero-training
    embedding-quality eval — e.g. the kNN accuracy protocol of Wu et
    al., CVPR 2018): every vector is classified by the majority label
    of its {_KNN_K} nearest neighbors (cosine, self excluded; vote
    ties break to the smaller label, distance ties to the smaller id)
    and per-class accuracy is reported. Cosines round once to integer
    micro-units so both engines rank identically. This eval runs
    brute-force exact on an EVAL SAMPLE by design (the probe is a
    diagnostic, not a serving path); the production-scale ANN variants
    are `ann_ivf_topk`/`ivf_multiprobe` with `pq_recall` auditing the
    approximation."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label"
    )
    from pliers_spark.operators.similarity import _dot, _norm

    q, a = emb.alias("q"), emb.alias("a")
    scored = q.join(a, F.col("a.vec_id") != F.col("q.vec_id")).select(
        F.col("q.vec_id").alias("qid"),
        F.col("q.label").alias("true_label"),
        F.col("a.label").alias("nb_label"),
        F.round(
            1e6 * _dot(F.col("a.embedding"), F.col("q.embedding"))
            / (_norm(F.col("a.embedding")) * _norm(F.col("q.embedding"))),
            0,
        ).cast("long").alias("cm"),
        F.col("a.vec_id").alias("nid"),
    )
    wk = Window.partitionBy("qid").orderBy(F.desc("cm"), "nid")
    topk = scored.withColumn("rk", F.row_number().over(wk)).where(F.col("rk") <= _KNN_K)
    votes = topk.groupBy("qid", "true_label", "nb_label").agg(
        F.count(F.lit(1)).cast("long").alias("v")
    )
    wp = Window.partitionBy("qid").orderBy(F.desc("v"), "nb_label")
    pred = votes.withColumn("pr", F.row_number().over(wp)).where(F.col("pr") == 1)
    hit = (F.col("nb_label") == F.col("true_label")).cast("long")
    return pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(hit).cast("long").alias("correct"),
        F.round(F.sum(hit).cast("double") / F.count(F.lit(1)), 6).alias("acc"),
    )


_PERM_N = 20
_PERM_SRC = ("src0", "src1")


def _perm_test_sql() -> str:
    h = md5_int_sql("concat(p::VARCHAR, ':', doc_id::VARCHAR)")
    return f"""WITH base AS (
         SELECT doc_id, n_chars, source FROM documents
         WHERE source IN ('{_PERM_SRC[0]}', '{_PERM_SRC[1]}')),
       sizes AS (
         SELECT sum((source = '{_PERM_SRC[0]}')::BIGINT)::BIGINT AS n_a,
                sum((source = '{_PERM_SRC[1]}')::BIGINT)::BIGINT AS n_b,
                sum(CASE WHEN source = '{_PERM_SRC[0]}' THEN n_chars END)::BIGINT AS s_a,
                sum(CASE WHEN source = '{_PERM_SRC[1]}' THEN n_chars END)::BIGINT AS s_b
         FROM base),
       obs AS (
         SELECT n_a, n_b, s_a::DOUBLE / n_a - s_b::DOUBLE / n_b AS d_obs FROM sizes),
       perms AS (
         SELECT t.p, b.n_chars,
                row_number() OVER (PARTITION BY t.p ORDER BY {h}, doc_id) AS rn
         FROM base b CROSS JOIN (SELECT unnest(range({_PERM_N})) AS p) t),
       pd AS (
         SELECT p,
                sum(CASE WHEN rn <= o.n_a THEN n_chars END)::DOUBLE / o.n_a
              - sum(CASE WHEN rn > o.n_a THEN n_chars END)::DOUBLE / o.n_b AS d
         FROM perms CROSS JOIN obs o GROUP BY p, o.n_a, o.n_b)
       SELECT o.n_a, o.n_b, round(o.d_obs, 6) AS obs_diff,
              {_PERM_N}::BIGINT AS n_perms,
              round((1 + sum((abs(pd.d) >= abs(o.d_obs))::BIGINT)) / ({_PERM_N} + 1.0), 6)
                AS p_value
       FROM pd CROSS JOIN obs o GROUP BY o.n_a, o.n_b, o.d_obs"""


@query("permutation_test", _perm_test_sql())
def q_permutation_test(spark, sf_dir):
    """Randomization/permutation test (Fisher 1935) for the mean-length
    gap between two sources, with DETERMINISTIC permutations: draw p ∈
    [0, {_PERM_N}), re-rank the pooled rows by md5(p:doc_id), and give
    the first n_a ranks to group A — an exact size-preserving relabel
    both engines reproduce bit-for-bit (the same seeded-hash trick as
    `hash_bootstrap_ci`, which resamples WITH replacement; this one
    permutes). p = (1 + #{{|d_perm| ≥ |d_obs|}}) / (K+1), the
    add-one-smoothed Monte-Carlo estimate. Distribution-free where the
    t-test assumes normality. Scale shape: the K-fold row expansion is
    a flat map (no joins); each permutation's diff is one partial agg
    over integer char sums."""
    d = _docs(spark, sf_dir).where(F.col("source").isin(*_PERM_SRC))
    base = d.select("doc_id", "n_chars", "source")
    sizes = base.agg(
        F.sum((F.col("source") == _PERM_SRC[0]).cast("long")).cast("long").alias("n_a"),
        F.sum((F.col("source") == _PERM_SRC[1]).cast("long")).cast("long").alias("n_b"),
        F.sum(F.when(F.col("source") == _PERM_SRC[0], F.col("n_chars"))).cast("long").alias("s_a"),
        F.sum(F.when(F.col("source") == _PERM_SRC[1], F.col("n_chars"))).cast("long").alias("s_b"),
    )
    obs = sizes.select(
        "n_a", "n_b",
        (F.col("s_a").cast("double") / F.col("n_a")
         - F.col("s_b").cast("double") / F.col("n_b")).alias("d_obs"),
    )
    h = md5_int(F.concat(F.col("p").cast("string"), F.lit(":"), F.col("doc_id").cast("string")))
    perms = base.select(
        "doc_id", "n_chars", F.explode(F.sequence(F.lit(0), F.lit(_PERM_N - 1))).alias("p")
    ).select("p", "n_chars", h.alias("h"), "doc_id")
    wp = Window.partitionBy("p").orderBy("h", "doc_id")
    ranked = perms.select("p", "n_chars", F.row_number().over(wp).alias("rn"))
    pd_ = (
        ranked.crossJoin(F.broadcast(obs))
        .groupBy("p", "n_a", "n_b")
        .agg(
            (
                F.sum(F.when(F.col("rn") <= F.col("n_a"), F.col("n_chars"))).cast("double")
                / F.first("n_a")
                - F.sum(F.when(F.col("rn") > F.col("n_a"), F.col("n_chars"))).cast("double")
                / F.first("n_b")
            ).alias("d")
        )
    )
    return (
        pd_.crossJoin(F.broadcast(obs.select("d_obs")))
        .groupBy("n_a", "n_b", "d_obs")
        .agg(
            F.sum((F.abs(F.col("d")) >= F.abs(F.col("d_obs"))).cast("long")).alias("ge")
        )
        .select(
            "n_a", "n_b", F.round("d_obs", 6).alias("obs_diff"),
            F.lit(_PERM_N).cast("long").alias("n_perms"),
            F.round((1 + F.col("ge")) / (_PERM_N + 1.0), 6).alias("p_value"),
        )
    )


# --------------------------------------------------------------------------
# batch 78: off-policy evaluation, simplified silhouette, anchor-text index

_OPE_TARGET = ("click", "purchase")  # target policy: uniform over these


def _ope_sql() -> str:
    tset = ", ".join(f"'{a}'" for a in _OPE_TARGET)
    return f"""WITH base AS (
         SELECT event_type AS a, round(1e6 * value)::BIGINT AS rm FROM events),
       prop AS (
         SELECT a, count(*)::BIGINT AS na, sum(rm)::BIGINT AS sa,
                (SELECT count(*) FROM base)::BIGINT AS n
         FROM base GROUP BY a),
       qpi AS (
         SELECT sum(CASE WHEN a IN ({tset})
                         THEN 0.5 * (sa::DOUBLE / na) END) AS q_pi
         FROM prop),
       w AS (
         SELECT b.rm::DOUBLE / 1e6 AS r,
                CASE WHEN b.a IN ({tset})
                     THEN 0.5 * p.n / p.na ELSE 0.0 END AS w,
                p.sa::DOUBLE / p.na / 1e6 AS q_a
         FROM base b JOIN prop p USING (a)),
       agg AS (
         SELECT count(*)::BIGINT AS n, sum(w) AS sw, sum(w * w) AS sww,
                sum(w * r) AS swr, sum(w * (r - q_a)) AS sdr
         FROM w)
       SELECT n,
              round(swr / n, 6) AS ips,
              round(swr / sw, 6) AS snips,
              round((SELECT q_pi FROM qpi) / 1e6 + sdr / n, 6) AS dr,
              round(sw * sw / sww / n, 6) AS ess_frac
       FROM agg"""


@query("offpolicy_eval", _ope_sql())
def q_offpolicy_eval(spark, sf_dir):
    """Off-policy evaluation of a target policy (uniform over
    {{click, purchase}}) from logged interactions: IPS (Horvitz-Thompson
    1952), self-normalized SNIPS (Swaminathan & Joachims, NeurIPS 2015),
    and doubly-robust DR (Dudík et al., ICML 2011) with the per-action
    mean-reward model q̂ — the standard counterfactual-eval triple for
    recsys/routing policies, plus the weight ESS fraction ((Σw)²/(nΣw²),
    the diagnostic that says whether the estimate is usable at all).
    Logging propensities are ESTIMATED as empirical action frequencies
    (the common logs-without-propensities practice). Rewards enter as
    integer micro-units so every sum is order-exact cross-engine; the
    importance weight is a ratio of exact counts. Scale shape: one
    action-frequency census (broadcast back), one flat scan — no joins
    beyond the K-row propensity table."""
    ev = _events(spark, sf_dir)
    base = ev.select(
        F.col("event_type").alias("a"),
        F.round(F.col("value") * 1e6, 0).cast("long").alias("rm"),
    )
    prop = base.groupBy("a").agg(
        F.count(F.lit(1)).cast("long").alias("na"),
        F.sum("rm").cast("long").alias("sa"),
    )
    n_tot = base.agg(F.count(F.lit(1)).cast("long").alias("n"))
    prop = prop.crossJoin(F.broadcast(n_tot))
    in_t = F.col("a").isin(*_OPE_TARGET)
    qpi = prop.agg(
        F.sum(F.when(in_t, 0.5 * (F.col("sa").cast("double") / F.col("na")))).alias("q_pi")
    )
    w = base.join(F.broadcast(prop), "a").select(
        (F.col("rm").cast("double") / 1e6).alias("r"),
        F.when(in_t, 0.5 * F.col("n") / F.col("na")).otherwise(F.lit(0.0)).alias("w"),
        (F.col("sa").cast("double") / F.col("na") / 1e6).alias("q_a"),
    )
    agg = w.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("w")).alias("sww"),
        F.sum(F.col("w") * F.col("r")).alias("swr"),
        F.sum(F.col("w") * (F.col("r") - F.col("q_a"))).alias("sdr"),
    )
    return agg.crossJoin(F.broadcast(qpi)).select(
        "n",
        F.round(F.col("swr") / F.col("n"), 6).alias("ips"),
        F.round(F.col("swr") / F.col("sw"), 6).alias("snips"),
        F.round(F.col("q_pi") / 1e6 + F.col("sdr") / F.col("n"), 6).alias("dr"),
        F.round(F.col("sw") * F.col("sw") / F.col("sww") / F.col("n"), 6).alias("ess_frac"),
    )


def _silhouette_sql() -> str:
    comp = "round(1e6 * x)::BIGINT"
    return f"""WITH comps AS (
         SELECT vec_id, label,
                unnest(list_transform(embedding, x -> {comp})) AS cm,
                unnest(range(len(embedding))) AS i
         FROM embeddings),
       cent AS (
         SELECT label, i, sum(cm)::BIGINT AS s, count(*)::BIGINT AS n
         FROM comps GROUP BY label, i),
       dists AS (
         SELECT c.vec_id, c.label AS own, ct.label AS other,
                sqrt(sum((c.cm / 1e6 - ct.s::DOUBLE / ct.n / 1e6)
                       * (c.cm / 1e6 - ct.s::DOUBLE / ct.n / 1e6))) AS d
         FROM comps c JOIN cent ct ON ct.i = c.i
         GROUP BY c.vec_id, c.label, ct.label),
       ab AS (
         SELECT vec_id, own,
                max(CASE WHEN other = own THEN d END) AS a,
                min(CASE WHEN other <> own THEN d END) AS b
         FROM dists GROUP BY vec_id, own),
       s AS (
         SELECT own, round(1e6 * (b - a) / greatest(a, b))::BIGINT AS sm
         FROM ab)
       SELECT own AS label, count(*)::BIGINT AS n,
              round(sum(sm) / count(*) / 1e6, 6) AS silhouette
       FROM s GROUP BY own"""


@query("silhouette_simplified", _silhouette_sql())
def q_silhouette_simplified(spark, sf_dir):
    """Simplified silhouette coefficient (Hruschka et al. 2004 — the
    O(n·k) centroid form of Rousseeuw 1987) per label cluster:
    a(i) = distance to OWN centroid, b(i) = distance to the nearest
    OTHER centroid, s(i) = (b−a)/max(a,b), averaged per cluster. The
    full silhouette's O(n²) pairwise pass is replaced by n·k
    point-to-centroid distances — the form that survives a 10^9-vector
    table. Centroids come from exact integer micro-component sums (one
    map-side partial agg), every distance is derived bit-identically
    in both engines, and per-point scores round to micro-ints before
    the cluster mean so the final average is order-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    comps = emb.select(
        "vec_id", "label",
        F.posexplode(
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: F.round(x * 1e6, 0).cast("long"),
            )
        ).alias("i", "cm"),
    )
    cent = comps.groupBy("label", "i").agg(
        F.sum("cm").cast("long").alias("s"), F.count(F.lit(1)).cast("long").alias("n")
    )
    d2 = (F.col("cm") / 1e6 - F.col("s").cast("double") / F.col("n") / 1e6)
    dists = (
        comps.alias("c")
        .join(F.broadcast(cent.alias("ct")), F.col("ct.i") == F.col("c.i"))
        .groupBy(
            F.col("c.vec_id").alias("vec_id"),
            F.col("c.label").alias("own"),
            F.col("ct.label").alias("other"),
        )
        .agg(F.sqrt(F.sum(d2 * d2)).alias("d"))
    )
    ab = dists.groupBy("vec_id", "own").agg(
        F.max(F.when(F.col("other") == F.col("own"), F.col("d"))).alias("a"),
        F.min(F.when(F.col("other") != F.col("own"), F.col("d"))).alias("b"),
    )
    s = ab.select(
        "own",
        F.round(1e6 * (F.col("b") - F.col("a")) / F.greatest("a", "b"), 0)
        .cast("long")
        .alias("sm"),
    )
    return s.groupBy(F.col("own").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.sum("sm") / F.count(F.lit(1)) / 1e6, 6).alias("silhouette"),
    )


_ANCHOR_HOSTS = 50
_ANCHOR_LINKS = 3


def _anchor_sql() -> str:
    def dst(j: int) -> str:
        h = md5_int_sql(f"concat(doc_id::VARCHAR, ':{j}')")
        return f"({h} % {_ANCHOR_HOSTS})::BIGINT"

    link_union = " UNION ALL ".join(
        f"SELECT (doc_id % {_ANCHOR_HOSTS})::BIGINT AS src, {dst(j)} AS dst, "
        f"string_split(trim(text), ' ')[1] AS anchor FROM documents"
        for j in range(_ANCHOR_LINKS)
    )
    return f"""WITH links AS ({link_union}),
       ext AS (SELECT * FROM links WHERE src <> dst),
       per AS (
         SELECT dst, anchor, count(*)::BIGINT AS c
         FROM ext GROUP BY dst, anchor),
       top AS (
         SELECT dst, anchor AS top_anchor,
                row_number() OVER (PARTITION BY dst ORDER BY c DESC, anchor) AS rn
         FROM per)
       SELECT p.dst AS host, sum(p.c)::BIGINT AS in_degree,
              count(*)::BIGINT AS n_unique_anchors,
              max(t.top_anchor) AS top_anchor
       FROM per p JOIN top t ON t.dst = p.dst AND t.rn = 1
       GROUP BY p.dst"""


@query("anchor_text_index", _anchor_sql())
def q_anchor_text_index(spark, sf_dir):
    """Anchor-text index over the host link graph (the signal web search
    ranks with since Brin & Page 1998 §2.2: a page is described by the
    text of links POINTING AT it): for every destination host of the
    deterministic doc→host link graph (same graph as `host_pagerank`),
    aggregate external in-links carrying the linking doc's lead token
    as anchor — in-degree, distinct anchor vocabulary, and the modal
    anchor (ties lexicographic). Scale shape: the (dst, anchor) census
    is one map-side-partial agg over the exploded link list; the modal
    pick is a per-host window over the census (host-grain, not
    link-grain)."""
    docs = _docs(spark, sf_dir)
    anchor = F.element_at(F.split(F.trim(F.col("text")), " "), 1)
    links = None
    for j in range(_ANCHOR_LINKS):
        part = docs.select(
            (F.col("doc_id") % _ANCHOR_HOSTS).cast("long").alias("src"),
            (md5_int(F.concat(F.col("doc_id").cast("string"), F.lit(f":{j}")))
             % _ANCHOR_HOSTS).cast("long").alias("dst"),
            anchor.alias("anchor"),
        )
        links = part if links is None else links.unionAll(part)
    ext = links.where(F.col("src") != F.col("dst"))
    per = ext.groupBy("dst", "anchor").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wt = Window.partitionBy("dst").orderBy(F.desc("c"), "anchor")
    top = per.select("dst", "anchor", F.row_number().over(wt).alias("rn")).where(
        F.col("rn") == 1
    )
    return (
        per.join(top.select("dst", F.col("anchor").alias("top_anchor")), "dst")
        .groupBy(F.col("dst").alias("host"))
        .agg(
            F.sum("c").cast("long").alias("in_degree"),
            F.count(F.lit(1)).cast("long").alias("n_unique_anchors"),
            F.max("top_anchor").alias("top_anchor"),
        )
    )


@query(
    "mann_whitney_u",
    """WITH v AS (
         SELECT (event_type = 'click') AS g1,
                CAST(round(value * 1000000.0) AS BIGINT) AS v_fp
         FROM events WHERE event_type IN ('click', 'view')),
       dist AS (SELECT v_fp, count(*)::BIGINT AS eq FROM v GROUP BY v_fp),
       rk AS (
         SELECT v_fp, eq,
                2 * (sum(eq) OVER (ORDER BY v_fp) - eq) + eq + 1 AS r2
         FROM dist),
       agg AS (
         SELECT sum(CASE WHEN v.g1 THEN 1 ELSE 0 END)::BIGINT AS n1,
                sum(CASE WHEN v.g1 THEN 0 ELSE 1 END)::BIGINT AS n2,
                sum(CASE WHEN v.g1 THEN rk.r2 ELSE 0 END)::BIGINT AS r1_2,
                (SELECT sum(eq * eq * eq - eq) FROM dist)::BIGINT AS tie3
         FROM v JOIN rk USING (v_fp)),
       u AS (
         SELECT n1, n2, n1 + n2 AS n, tie3,
                r1_2 - n1 * (n1 + 1) AS u1_2
         FROM agg)
       SELECT n1, n2, round(u1_2 / 2.0, 6) AS u1,
              round((u1_2 / 2.0 - n1::DOUBLE * n2::DOUBLE / 2.0)
                    / sqrt(n1::DOUBLE * n2::DOUBLE / 12.0
                           * ((n + 1)::DOUBLE
                              - tie3::DOUBLE / (n::DOUBLE * (n - 1)::DOUBLE))), 6) AS z
       FROM u""",
)
def q_mann_whitney_u(spark, sf_dir):
    """Mann-Whitney U rank-sum test (Mann & Whitney 1947) comparing
    `value` between click and view events — the two-sample special
    case of `kruskal_wallis`, sharing its exact-integer rank machinery:
    the DOUBLED average rank of a value is 2·|{<v}| + |{=v}| + 1 from
    the value census, so the group-1 rank sum R₁ and U₁ = R₁ −
    n₁(n₁+1)/2 are exact int64 (carried doubled until the final emit).
    z uses the tie-corrected variance n₁n₂/12·((N+1) − Σ(t³−t)/(N(N−1)))
    with no continuity correction — one identical double expression on
    both engines. Plan: value census (one shuffle), value-grain running
    window, join back, single global agg."""
    ev = _events(spark, sf_dir).where(F.col("event_type").isin("click", "view"))
    v = ev.select(
        (F.col("event_type") == "click").alias("g1"),
        F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("v_fp"),
    )
    dist = v.groupBy("v_fp").agg(F.count(F.lit(1)).cast("long").alias("eq"))
    wv = Window.orderBy("v_fp").rowsBetween(Window.unboundedPreceding, 0)
    rk = dist.select(
        "v_fp",
        (2 * (F.sum("eq").over(wv) - F.col("eq")) + F.col("eq") + 1).alias("r2"),
    )
    agg = (
        v.join(rk, "v_fp")
        .agg(
            F.sum(F.when(F.col("g1"), 1).otherwise(0)).cast("long").alias("n1"),
            F.sum(F.when(F.col("g1"), 0).otherwise(1)).cast("long").alias("n2"),
            F.sum(F.when(F.col("g1"), F.col("r2")).otherwise(0)).cast("long").alias("r1_2"),
        )
        .crossJoin(
            dist.agg(
                F.sum(F.col("eq") * F.col("eq") * F.col("eq") - F.col("eq"))
                .cast("long")
                .alias("tie3")
            )
        )
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    u = agg.select(
        "n1", "n2", "tie3",
        (F.col("n1") + F.col("n2")).alias("n"),
        (F.col("r1_2") - F.col("n1") * (F.col("n1") + 1)).alias("u1_2"),
    )
    sigma = F.sqrt(
        d_("n1") * d_("n2") / F.lit(12.0)
        * ((F.col("n") + 1).cast("double") - d_("tie3") / (d_("n") * (F.col("n") - 1).cast("double")))
    )
    return u.select(
        "n1", "n2",
        F.round(F.col("u1_2") / F.lit(2.0), 6).alias("u1"),
        F.round(
            (F.col("u1_2") / F.lit(2.0) - d_("n1") * d_("n2") / F.lit(2.0)) / sigma, 6
        ).alias("z"),
    )


@query(
    "levene_bf",
    """WITH v AS (
         SELECT event_type, CAST(round(value * 1000000.0) AS BIGINT) AS v_fp
         FROM events),
       cen AS (
         SELECT event_type, v_fp, count(*)::BIGINT AS c FROM v GROUP BY 1, 2),
       cum AS (
         SELECT event_type, v_fp, c,
                sum(c) OVER (PARTITION BY event_type ORDER BY v_fp) AS cc,
                sum(c) OVER (PARTITION BY event_type) AS ni
         FROM cen),
       med AS (
         SELECT event_type, min(v_fp) AS med_fp
         FROM cum WHERE cc >= (ni + 1) // 2 GROUP BY event_type),
       z AS (
         SELECT v.event_type, abs(v.v_fp - med.med_fp)::BIGINT AS z_fp
         FROM v JOIN med USING (event_type)),
       g AS (
         SELECT event_type, count(*)::BIGINT AS ni,
                sum(z_fp)::BIGINT AS s,
                sum((z_fp / 1000000.0) * (z_fp / 1000000.0)) AS q
         FROM z GROUP BY event_type),
       terms AS (
         SELECT event_type, ni, s,
                CAST(round(1000000.0 * (s / 1000000.0) * (s / 1000000.0) / ni) AS BIGINT) AS num_fp,
                CAST(round(1000000.0 * (q - (s / 1000000.0) * (s / 1000000.0) / ni)) AS BIGINT) AS den_fp
         FROM g),
       tot AS (
         SELECT count(*)::BIGINT AS k, sum(ni)::BIGINT AS n, sum(s)::BIGINT AS st,
                sum(num_fp)::BIGINT AS numf, sum(den_fp)::BIGINT AS denf
         FROM terms)
       SELECT k, n,
              round((n - k)::DOUBLE / (k - 1)::DOUBLE
                    * (numf / 1000000.0
                       - (st / 1000000.0) * (st / 1000000.0) / n::DOUBLE)
                    / (denf / 1000000.0), 6) AS w_bf
       FROM tot""",
)
def q_levene_bf(spark, sf_dir):
    """Brown-Forsythe test for homogeneity of variance across event
    types (Brown & Forsythe, JASA 1974 — Levene's test with the
    median center, the robust form): W = ((N−k)/(k−1)) · Σnᵢ(z̄ᵢ−z̄)² /
    ΣΣ(zᵢⱼ−z̄ᵢ)² where zᵢⱼ = |xᵢⱼ − medᵢ|. The group median is the
    LOWER median (k-th smallest, k=(nᵢ+1)//2) read off an exact integer
    census + running-count window — no percentile_approx — so every zᵢⱼ
    is an exact int64; per-group cross terms are micro-int-rounded
    BEFORE the cross-group sum so the group-order-dependent float adds
    never happen. Plan: per-group value census (one shuffle), windowed
    median pick, join back, group-grain math."""
    ev = _events(spark, sf_dir)
    v = ev.select(
        "event_type", F.round(F.col("value") * F.lit(1e6), 0).cast("long").alias("v_fp")
    )
    cen = v.groupBy("event_type", "v_fp").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wcum = Window.partitionBy("event_type").orderBy("v_fp").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("event_type")
    cum = cen.select(
        "event_type", "v_fp",
        F.sum("c").over(wcum).alias("cc"), F.sum("c").over(wall).alias("ni"),
    )
    med = (
        cum.where(F.col("cc") >= F.floor((F.col("ni") + 1) / 2))
        .groupBy("event_type")
        .agg(F.min("v_fp").alias("med_fp"))
    )
    z = v.join(med, "event_type").select(
        "event_type", F.abs(F.col("v_fp") - F.col("med_fp")).cast("long").alias("z_fp")
    )
    zd = F.col("z_fp") / F.lit(1e6)
    g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("ni"),
        F.sum("z_fp").cast("long").alias("s"),
        F.sum(zd * zd).alias("q"),
    )
    sd = F.col("s") / F.lit(1e6)
    terms = g.select(
        "ni", "s",
        F.round(F.lit(1e6) * sd * sd / F.col("ni"), 0).cast("long").alias("num_fp"),
        F.round(F.lit(1e6) * (F.col("q") - sd * sd / F.col("ni")), 0).cast("long").alias("den_fp"),
    )
    tot = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("ni").cast("long").alias("n"),
        F.sum("s").cast("long").alias("st"),
        F.sum("num_fp").cast("long").alias("numf"),
        F.sum("den_fp").cast("long").alias("denf"),
    )
    d_ = lambda c: F.col(c).cast("double")  # noqa: E731
    std = F.col("st") / F.lit(1e6)
    return tot.select(
        "k", "n",
        F.round(
            (F.col("n") - F.col("k")).cast("double") / (F.col("k") - 1).cast("double")
            * (F.col("numf") / F.lit(1e6) - std * std / d_("n"))
            / (F.col("denf") / F.lit(1e6)),
            6,
        ).alias("w_bf"),
    )


@query(
    "fleiss_kappa",
    """WITH r AS (
         SELECT doc_id,
                CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 400 THEN 1 ELSE 2 END AS cat
         FROM documents
         UNION ALL
         SELECT doc_id,
                CASE WHEN len(string_split(trim(text), ' ')) < 40 THEN 0
                     WHEN len(string_split(trim(text), ' ')) < 80 THEN 1 ELSE 2 END
         FROM documents
         UNION ALL
         SELECT doc_id,
                CASE WHEN n_chars < 180 THEN 0 WHEN n_chars < 420 THEN 1 ELSE 2 END
         FROM documents),
       nij AS (SELECT doc_id, cat, count(*)::BIGINT AS nij FROM r GROUP BY 1, 2),
       per_item AS (
         SELECT doc_id, sum(nij * nij)::BIGINT AS ss FROM nij GROUP BY doc_id),
       items AS (
         SELECT count(*)::BIGINT AS n_items, sum(ss)::BIGINT AS ss_tot
         FROM per_item),
       cats AS (SELECT cat, sum(nij)::BIGINT AS cj FROM nij GROUP BY cat),
       pe AS (
         SELECT sum(CAST(round(1000000000000.0 * cj * cj
                          / ((SELECT n_items FROM items) * 3.0)
                          / ((SELECT n_items FROM items) * 3.0)) AS BIGINT))::BIGINT AS pe_fp
         FROM cats)
       SELECT items.n_items, 3::BIGINT AS m,
              round((ss_tot - items.n_items * 3)::DOUBLE
                    / (items.n_items * 3 * 2)::DOUBLE, 6) AS p_bar,
              round(pe_fp / 1000000000000.0, 6) AS p_e,
              round(((ss_tot - items.n_items * 3)::DOUBLE
                     / (items.n_items * 3 * 2)::DOUBLE
                     - pe_fp / 1000000000000.0)
                    / (1.0 - pe_fp / 1000000000000.0), 6) AS kappa
       FROM items, pe""",
)
def q_fleiss_kappa(spark, sf_dir):
    """Fleiss' kappa (Fleiss, Psych. Bulletin 1971) — chance-corrected
    agreement among m=3 deterministic 'raters' each assigning every
    document one of 3 size categories (char-count terciles at two
    threshold settings + a token-count rater, so agreement is high but
    imperfect — exactly the multi-annotator QA shape used to audit
    labeling pipelines). P̄ = Σᵢ(Σⱼnᵢⱼ² − m)/(Nm(m−1)) and Pₑ = Σⱼpⱼ²
    come from exact int64 census counts; the per-category pⱼ² terms are
    pico-int-rounded before the cross-category sum so float add order
    never matters. Plan: 3 projections unioned (no shuffle), one
    (doc,cat) census, item-grain and category-grain aggs."""
    docs = _docs(spark, sf_dir)
    ntok = F.size(F.split(F.trim(F.col("text")), " "))
    raters = [
        F.when(F.col("n_chars") < 200, 0).when(F.col("n_chars") < 400, 1).otherwise(2),
        F.when(ntok < 40, 0).when(ntok < 80, 1).otherwise(2),
        F.when(F.col("n_chars") < 180, 0).when(F.col("n_chars") < 420, 1).otherwise(2),
    ]
    r = None
    for expr in raters:
        part = docs.select("doc_id", expr.alias("cat"))
        r = part if r is None else r.unionAll(part)
    nij = r.groupBy("doc_id", "cat").agg(F.count(F.lit(1)).cast("long").alias("nij"))
    per_item = nij.groupBy("doc_id").agg(
        F.sum(F.col("nij") * F.col("nij")).cast("long").alias("ss")
    )
    items = per_item.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("ss").cast("long").alias("ss_tot"),
    )
    cats = nij.groupBy("cat").agg(F.sum("nij").cast("long").alias("cj"))
    pe = (
        cats.crossJoin(items.select("n_items"))
        .select(
            F.round(
                F.lit(1e12) * F.col("cj") * F.col("cj")
                / (F.col("n_items") * F.lit(3.0))
                / (F.col("n_items") * F.lit(3.0)),
                0,
            )
            .cast("long")
            .alias("t")
        )
        .agg(F.sum("t").cast("long").alias("pe_fp"))
    )
    j = items.crossJoin(pe)
    p_bar = (F.col("ss_tot") - F.col("n_items") * 3).cast("double") / (
        F.col("n_items") * 3 * 2
    ).cast("double")
    p_e = F.col("pe_fp") / F.lit(1e12)
    return j.select(
        "n_items",
        F.lit(3).cast("long").alias("m"),
        F.round(p_bar, 6).alias("p_bar"),
        F.round(p_e, 6).alias("p_e"),
        F.round((p_bar - p_e) / (F.lit(1.0) - p_e), 6).alias("kappa"),
    )

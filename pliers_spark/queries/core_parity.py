"""Registry module (split from the former queries.py monolith; same
@query/ORACLES contract as every sibling).

Queries: text_length, text_prep, tokenize, num_unique_words, word_counter,
    dictionary_lookup, count_vectorizer, tfidf, sentiment_lexicon,
    quality_score, token_stats, langid, features_long, merge_wide,
    treebank_tokenize, sentence_split_punkt, num_unique_words_tb,
    remove_stopwords_tb, word_counter_tb
"""
from __future__ import annotations

from ._registry import DI, F, R, T, TP, V, _PUNCT_SQL_CLASS, _docs, _isin_lambda, query



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


# --------------------------------------------------------------------------
# round 3: Punkt-lite / Treebank word tokenizer (VERDICT r2 item 7)


def _treebank_sql() -> str:
    from ..functions.text import treebank_pretokenize_sql

    cascade = treebank_pretokenize_sql("text")
    return f"""WITH pre AS (
         SELECT doc_id,
                list_filter(string_split_regex(trim({cascade}), '\\s+'),
                            x -> x <> '') AS toks
         FROM documents)
       SELECT doc_id, unnest(range(len(toks)))::BIGINT AS pos,
              unnest(toks) AS token
       FROM pre"""


@query("treebank_tokenize", _treebank_sql())
def q_treebank_tokenize(spark, sf_dir):
    """Punkt-lite opt-in tokenizer: the published Penn-Treebank word
    tokenizer rules nltk's word_tokenize applies (reference uses nltk in
    pliers/filters/text.py:139 and pliers/extractors/text.py:192),
    closing the default whitespace tokenizer's visible gaps —
    contraction splitting ("don't" -> do|n't), trailing-punctuation
    separation, ``/'' quote conversion. Pure chained JVM regexp_replace
    (whole-stage codegen); the DuckDB oracle renders the identical rule
    cascade from the same TREEBANK_RULES list. No Punkt sentence stage:
    compose sentence_split upstream when per-sentence end-of-period
    behavior is needed."""
    from ..functions.text import treebank_tokenize

    return _docs(spark, sf_dir).select(
        "doc_id", F.posexplode(treebank_tokenize(F.col("text"))).alias("pos", "token")
    ).withColumn("pos", F.col("pos").cast("long"))


# --------------------------------------------------------------------------
# round 4: Punkt-lite sentence segmenter (VERDICT r3 item 3)

# The synthetic corpus carries no punctuation, so the query first
# derives it deterministically — identically on both engines — in a way
# that exercises every protection rule: 'the'→'the.' (true boundary),
# 'of'→'Dr.' (abbreviation), 'and'→'p.m.' (multi-period abbreviation),
# 'to'→'to!' (exclamation boundary), 'a'→'J.' (single initial).
_PUNKT_DERIVE: list[tuple[str, str]] = [
    (r"\bthe\b", "the."),
    (r"\bof\b", "Dr."),
    (r"\band\b", "p.m."),
    (r"\bto\b", "to!"),
    (r"\ba\b", "J."),
]


def _punkt_sql() -> str:
    from ..functions.text import punkt_mark_sql

    marked = "text"
    for pat, repl in _PUNKT_DERIVE:
        marked = f"regexp_replace({marked}, '{pat}', '{repl}', 'g')"
    cascade = punkt_mark_sql(marked)
    return f"""WITH pre AS (
         SELECT doc_id,
                list_filter(list_transform(string_split({cascade}, chr(10)),
                                           x -> trim(x)),
                            x -> x <> '') AS sents
         FROM documents)
       SELECT doc_id, unnest(range(len(sents)))::BIGINT AS pos,
              unnest(sents) AS sentence,
              length(unnest(sents))::BIGINT AS sent_len
       FROM pre"""


@query("sentence_split_punkt", _punkt_sql())
def q_sentence_split_punkt(spark, sf_dir):
    """Punkt-lite abbreviation-aware sentence segmentation (reference:
    pliers/stimuli/text.py:230-244, unit='sentence' via nltk
    sent_tokenize's pre-trained English Punkt model). The rule cascade
    (functions/text.py PUNKT_RULES) protects abbreviation periods
    (Mr./Dr./U.S./e.g.), single-letter initials and decimal points
    behind a sentinel, marks the remaining [.!?]-run boundaries, then
    splits — pure chained JVM regexp_replace (whole-stage codegen, no
    UDF); the DuckDB oracle renders the identical cascade from the same
    PUNKT_RULES list, and tests/test_punkt.py pins goldens plus a
    differential run vs real nltk gated on import."""
    from ..functions.text import punkt_split_sentences

    marked = F.col("text")
    for pat, repl in _PUNKT_DERIVE:
        marked = F.regexp_replace(marked, pat, repl)
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.posexplode(punkt_split_sentences(marked)).alias("pos", "sentence"),
        )
        .withColumn("pos", F.col("pos").cast("long"))
        .withColumn("sent_len", F.length("sentence").cast("long"))
    )


# --------------------------------------------------------------------------
# round 4: Treebank-mode twins of the token-level parity queries
# (VERDICT r3 item 4) — the closest-to-nltk tokenization path gets the
# same end-to-end oracle pins as the default whitespace path, reusing
# functions/text.py:288-320 (TREEBANK_RULES) on both engines.


def _tb_toks_sql() -> str:
    from ..functions.text import treebank_pretokenize_sql

    cascade = treebank_pretokenize_sql("text")
    return (
        f"list_filter(string_split_regex(trim({cascade}), '\\s+'), x -> x <> '')"
    )


def _tb_num_unique_sql() -> str:
    return (
        f"SELECT doc_id, len(list_distinct({_tb_toks_sql()}))::BIGINT AS n_unique"
        " FROM documents"
    )


@query("num_unique_words_tb", _tb_num_unique_sql())
def q_num_unique_words_tb(spark, sf_dir):
    """NumUniqueWordsExtractor over Treebank tokens (reference composes
    nltk word_tokenize into the extractor via tokenizer arg,
    pliers/extractors/text.py:173-201 + 192): contraction splitting
    changes the distinct count ("don't" contributes do + n't)."""
    from ..functions.text import treebank_tokenize

    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.array_distinct(treebank_tokenize(F.col("text"))))
        .cast("long")
        .alias("n_unique"),
    )


def _tb_remove_stopwords_sql() -> str:
    from .dedup_sim import _STOPWORD_SQL_LIST

    return f"""SELECT doc_id,
              array_to_string(list_filter({_tb_toks_sql()},
                              t -> NOT list_contains([{_STOPWORD_SQL_LIST}], lower(t))), ' ')
                AS filtered_text
       FROM documents"""


@query("remove_stopwords_tb", _tb_remove_stopwords_sql())
def q_remove_stopwords_tb(spark, sf_dir):
    """TokenRemovalFilter over Treebank tokens
    (pliers/filters/text.py:148-183; the reference's default token
    stream IS nltk word_tokenize, so this twin is the parity-faithful
    form of remove_stopwords)."""
    from ..functions.text import treebank_tokenize

    kept = F.filter(
        treebank_tokenize(F.col("text")),
        lambda t: ~F.lower(t).isin(*T.ENGLISH_STOPWORDS),
    )
    return _docs(spark, sf_dir).select(
        "doc_id", F.array_join(kept, " ").alias("filtered_text")
    )


def _tb_word_counter_sql() -> str:
    return f"""WITH toks AS (
         SELECT doc_id,
                unnest(range(len({_tb_toks_sql()})))::BIGINT AS pos,
                lower(unnest({_tb_toks_sql()})) AS token
         FROM documents)
       SELECT doc_id, pos, token,
              count(*) OVER (PARTITION BY doc_id, token ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS word_count
       FROM toks"""


@query("word_counter_tb", _tb_word_counter_sql())
def q_word_counter_tb(spark, sf_dir):
    """WordCounterExtractor over Treebank tokens, case-folded running
    count (pliers/extractors/text.py:834-862): punctuation split into
    its own tokens now accumulates counts ("," seen k times)."""
    from ..functions.text import treebank_tokenize

    toks = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.posexplode(treebank_tokenize(F.col("text"))).alias("pos", "token"),
        )
        .withColumn("pos", F.col("pos").cast("long"))
        .withColumn("token", F.lower(F.col("token")))
    )
    return TP.running_count(
        toks, ["doc_id"], "token", "pos", out_col="word_count"
    ).withColumn("word_count", F.col("word_count").cast("long"))

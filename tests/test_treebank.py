"""Punkt-lite / Treebank tokenizer (round 3): golden pins on the
published rule behavior, three-way rendering agreement, and the
differential anchor against real nltk when importable."""

import pytest

from pliers_spark.functions.text import (
    TREEBANK_RULES,
    treebank_pretokenize_sql,
    treebank_tokenize,
    treebank_tokenize_py,
)

# the top visible gaps the VERDICT named, pinned as literals
GOLDEN = {
    "I don't think it's Bob's dog, can you?": [
        "I", "do", "n't", "think", "it", "'s", "Bob", "'s", "dog", ",",
        "can", "you", "?",
    ],
    'He said, "hello (world)!" -- twice.': [
        "He", "said", ",", "``", "hello", "(", "world", ")", "!", "''",
        "--", "twice", ".",
    ],
    "cannot gonna wanna": ["can", "not", "gon", "na", "wan", "na"],
    "they'll we're you've I'm he'd": [
        "they", "'ll", "we", "'re", "you", "'ve", "I", "'m", "he", "'d",
    ],
    "wait...": ["wait", "..."],
    "$1,000.50 today.": ["$", "1,000.50", "today", "."],
    "": [],
}


def test_treebank_goldens_python():
    for text, toks in GOLDEN.items():
        assert treebank_tokenize_py(text) == toks, text


def test_treebank_spark_matches_python(spark):
    texts = list(GOLDEN) + [
        "y'all won't've been [sic] <ok> {braces}; 50% #tag @user & more:",
        "'Twas the night -- or was it? I'll say we're done... D'ye know?",
        "a.b. end.", "quote 'single' and \"double\" ones", "   ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r.id: r.toks
        for r in df.select("id", treebank_tokenize("text").alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == treebank_tokenize_py(t), repr(t)


def test_treebank_duckdb_renders_same_cascade():
    import duckdb

    sql = treebank_pretokenize_sql("text")
    con = duckdb.connect()
    for text, toks in GOLDEN.items():
        row = con.execute(
            "SELECT list_filter(string_split_regex(trim(" + sql + "), '\\s+'),"
            " x -> x <> '') FROM (SELECT ? AS text)",
            [text],
        ).fetchone()[0]
        assert row == toks, text


def test_treebank_rules_re2_safe():
    """DuckDB's RE2 has no lookaround/comment groups — ensure no rule
    ever reintroduces one (the cascade must stay tri-engine-portable)."""
    for pat, _ in TREEBANK_RULES:
        assert "(?=" not in pat and "(?!" not in pat and "(?<" not in pat
        assert "(?#" not in pat


def test_treebank_differential_vs_real_nltk():
    """When the real nltk is importable, the cascade must agree with
    nltk.word_tokenize on single-sentence inputs (the engine documents
    that it omits the Punkt sentence stage)."""
    nltk = pytest.importorskip("nltk")
    try:
        nltk.word_tokenize("ping")
    except LookupError:
        pytest.skip("nltk present but punkt data missing")
    for text in GOLDEN:
        if not text:
            continue
        assert treebank_tokenize_py(text) == nltk.word_tokenize(text), text

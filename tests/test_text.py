"""Text extractor/filter parity tests — golden values from the reference
test suite (see FIXTURES.md §7 for provenance)."""

import pyspark.sql.functions as F
import pytest

from pliers_spark.functions import text as T


def one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(col.alias("v")).first()["v"]


def test_length_golden(spark):
    # LengthExtractor('hello world') → 11 (test_text_extractors.py:38-45)
    assert one(spark, "hello world", T.text_length("text")) == 11
    # strip semantics: surrounding whitespace excluded
    assert one(spark, "  hello world \n", T.text_length("text")) == 11


def test_num_unique_words_golden(spark):
    # NumUniqueWordsExtractor('hello hello world') → 2 (test_text_extractors.py:48-53)
    assert one(spark, "hello hello world", T.num_unique_words("text")) == 2


def test_punctuation_removal_exact_set(spark):
    import string

    src = "a" + string.punctuation + "b"
    assert one(spark, src, T.remove_punctuation(F.col("text"))) == "ab"


def test_lowercase(spark):
    assert one(spark, "HeLLo WoRLD", T.lower_case(F.col("text"))) == "hello world"


def test_prep_chain_golden(spark):
    # punctuation+stopword+tokenize chain on 'some, example the text.'
    # → ['example', 'text'] (pliers/tests/test_graph.py:276-283)
    cleaned = T.remove_punctuation(T.lower_case(F.col("text")))
    no_stop = T.remove_tokens(cleaned, ["some", "the"])
    toks = one(spark, "some, example the text.", T.tokenize(no_stop))
    assert toks == ["example", "text"]


def test_tokenize_positions(spark):
    df = spark.createDataFrame([(1, "a b  c")], "id long, text string")
    rows = df.select("id", F.posexplode(T.tokenize(F.col("text")))).collect()
    assert [(r.pos, r.col) for r in rows] == [(0, "a"), (1, "b"), (2, "c")]


def test_word_counter_cumulative(spark):
    # case-folded cumulative counts (pliers/extractors/text.py:851-862;
    # expected pattern per test_text_extractors.py:268-296)
    from pliers_spark.operators.temporal import running_count

    df = spark.createDataFrame(
        [(1, i, t) for i, t in enumerate("test words test Test words".split())],
        "doc long, pos long, token string",
    ).withColumn("token", F.lower(F.col("token")))
    out = running_count(df, ["doc"], "token", "pos", out_col="wc").orderBy("pos").collect()
    assert [r.wc for r in out] == [1, 1, 2, 3, 2]


def test_quality_and_ratios(spark):
    q = one(spark, "the quick brown fox jumps over the lazy dog", T.quality_score("text"))
    assert 0.0 <= q <= 1.0
    swr = one(spark, "the a and xyzzy", F.round(T.stopword_ratio("text"), 6))
    assert swr == 0.75


def test_langid_best(spark):
    assert one(spark, "the cat is in the house and it is big", T.langid_best("text")) == "en"
    assert one(spark, "el perro y la casa que se ve por los arboles", T.langid_best("text")) == "es"


def test_dictionary_lookup_semantics(spark):
    from pliers_spark.operators.dictionary import dictionary_lookup

    toks = spark.createDataFrame(
        [(1, 0, "Data"), (1, 1, "missingword")], "doc long, pos long, token string"
    )
    dim = spark.createDataFrame(
        [("data", 11.729), ("data", 99.0), ("other", 1.0)], "word string, frequency double"
    )
    out = dictionary_lookup(toks, dim, "token", "word", case_sensitive=False)
    rows = {r.token: r.frequency for r in out.collect()}
    assert rows["Data"] == pytest.approx(11.729)  # keep-first dedup + case-fold
    assert rows["missingword"] is None  # miss → NULL (NaN analog)


def test_token_attributes_spacy_surface(spark):
    from pliers_spark.functions.pos import token_attributes

    df = spark.createDataFrame(
        [(1, "the CAT is running QUICKLY with 1,000 dogs")],
        "doc_id long, text string",
    )
    rows = {r.pos: r for r in token_attributes(df).collect()}
    assert [rows[i].token for i in range(8)] == [
        "the", "CAT", "is", "running", "QUICKLY", "with", "1,000", "dogs"]
    assert rows[0].tag == "DT" and rows[0].is_stop
    assert rows[1].tag == "NN" and rows[1].shape == "XXX"
    assert rows[2].tag == "VB" and rows[2].dep == "ROOT"  # first verb
    assert rows[3].tag == "VBG" and rows[3].dep == "dep"
    assert rows[3].lemma == "runn"  # morphy-lite 'ing' detachment
    assert rows[4].upos == "ADV" and rows[4].shape == "XXXX"  # run > 4 truncated
    assert rows[6].like_num and rows[6].tag == "CD" and rows[6].shape == "d,ddd"
    assert rows[7].upos == "NOUN" and rows[7].is_alpha
    assert not rows[6].is_alpha

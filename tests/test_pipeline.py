"""Pipeline spec (Graph parity): JSON round-trip, implicit conversion,
fan-out, merge."""

import json

from pliers_spark.plans.pipeline import Pipeline


def docs(spark):
    return spark.createDataFrame(
        [(1, "Some, Example the Text."), (2, "hello hello world")],
        "doc_id long, text string",
    )


def test_linear_chain_with_merge(spark):
    spec = {
        "roots": [
            {"transformer": "length"},
            {"transformer": "num_unique_words"},
        ]
    }
    out = Pipeline(spec).run(docs(spark), key_cols=["doc_id", "text"])
    r = {x.doc_id: x for x in out.collect()}
    assert r[2].text_length == 17 and r[2].n_unique == 2


def test_prep_chain_then_feature(spark):
    spec = {
        "roots": [
            {
                "transformer": "lowercase",
                "children": [
                    {
                        "transformer": "remove_punctuation",
                        "children": [
                            {
                                "transformer": "remove_stopwords",
                                "parameters": {"stopwords": ["some", "the"]},
                                "children": [{"transformer": "token_count"}],
                            }
                        ],
                    }
                ],
            }
        ]
    }
    out = Pipeline(spec).run(docs(spark), key_cols=["doc_id"])
    r = {x.doc_id: x for x in out.collect()}
    assert r[1].text == "example text" and r[1].n_tokens == 2


def test_implicit_conversion_inserts_tokenize(spark):
    # token-level stage on a document-level frame → tokenize auto-inserted
    # (≡ pliers get_converter insertion, transformers/base.py:136-155)
    spec = {"roots": [{"transformer": "word_counter"}]}
    out = Pipeline(spec).run(docs(spark), key_cols=["doc_id"])
    assert "token" in out.columns and "word_count" in out.columns
    hh = out.where("doc_id = 2 and token = 'hello'").orderBy("token_pos").collect()
    assert [r.word_count for r in hh] == [1, 2]


def test_json_roundtrip(spark):
    spec = {"roots": [{"transformer": "length", "children": [{"transformer": "quality"}]}]}
    p = Pipeline(json.dumps(spec))
    assert json.loads(p.to_json()) == spec


def test_fanout_shares_parent(spark):
    spec = {
        "roots": [
            {
                "transformer": "lowercase",
                "children": [{"transformer": "length"}, {"transformer": "token_count"}],
            }
        ]
    }
    frames = Pipeline(spec).run(docs(spark), key_cols=["doc_id"], merge=False)
    assert len(frames) == 2
    merged = Pipeline(spec).run(docs(spark), key_cols=["doc_id", "text"])
    assert {"text_length", "n_tokens"} <= set(merged.columns)


def test_sentiment_and_stem_stages(spark):
    from pliers_spark.plans.pipeline import Pipeline

    df = spark.createDataFrame(
        [(1, "The cats are running and happiness follows")], "doc_id long, text string"
    )
    spec = {
        "roots": [
            {
                "transformer": "sentiment",
                "children": [{"transformer": "stem", "parameters": {"stemmer": "porter"}, "children": [{"transformer": "word_counter"}]}],
            }
        ]
    }
    out = Pipeline(spec).run(df, key_cols=["doc_id"])
    cols = set(out.columns)
    assert {"sentiment_pos", "sentiment_compound", "token", "word_count"} <= cols
    toks = {r.token for r in out.collect()}
    assert "run" in toks and "cat" in toks  # porter-stemmed, implicit tokenize

    import pytest

    with pytest.raises(ValueError):
        Pipeline({"roots": [{"transformer": "stem", "parameters": {"stemmer": "nope"}}]}).run(
            df, key_cols=["doc_id"]
        )


def test_history_df_parent_chain_and_implicit_flag(spark):
    """TransformationLog parity (pliers/stimuli/base.py:181-238):
    history records every executed stage parent-linked; the implicitly
    inserted tokenize converter is flagged implicit=True."""
    from pliers_spark.plans.pipeline import Pipeline

    spec = {"roots": [{"transformer": "lowercase",
                       "children": [{"transformer": "stem"}]}]}
    df = spark.createDataFrame([(1, "Running runs")], "doc_id long, text string")
    p = Pipeline(spec)
    p.run(df, key_cols=["doc_id"], merge=False)
    hist = {r["step"]: r for r in p.history_df(spark).collect()}
    assert [hist[i]["transformer"] for i in sorted(hist)] == [
        "lowercase", "tokenize", "stem"]
    assert hist[1]["implicit"] and not hist[0]["implicit"] and not hist[2]["implicit"]
    assert hist[0]["parent_step"] is None
    assert hist[1]["parent_step"] == 0 and hist[2]["parent_step"] == 1

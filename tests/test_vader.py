"""Clean-room VADER parity: golden values from the reference's own test
suite (pliers/tests/extractors/test_text_extractors.py:172-183)."""

import pytest

from pliers_spark.functions.vader import polarity_scores, with_vader


def test_vader_golden_scalar():
    s = polarity_scores("VADER is smart, handsome, and funny!")
    assert s["pos"] == pytest.approx(0.752)
    assert s["neg"] == pytest.approx(0.0)
    assert s["neu"] == pytest.approx(0.248)
    assert s["compound"] == pytest.approx(0.8439)


def test_vader_negation_and_booster():
    assert polarity_scores("not good")["compound"] < 0
    assert (
        polarity_scores("very good")["compound"] > polarity_scores("good")["compound"]
    )


def test_vader_empty():
    assert polarity_scores("") == {"pos": 0.0, "neg": 0.0, "neu": 0.0, "compound": 0.0}


def test_vader_udf_matches_local(spark):
    texts = [
        "VADER is smart, handsome, and funny!",
        "the table was slow and the query failed",
        "",
        "great fast perfect",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    out = {r.id: r for r in with_vader(df).collect()}
    for i, t in enumerate(texts):
        exp = polarity_scores(t)
        assert out[i].sentiment_compound == pytest.approx(exp["compound"])
        assert out[i].sentiment_pos == pytest.approx(exp["pos"])

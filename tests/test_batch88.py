"""Batch 88: TextRank keywords, fightin' words, phrase search."""

import math
import os


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"


def test_textrank_hub_token_wins(spark, tmp_path):
    """'hub' is adjacent to 4 distinct spokes; spokes only touch hub.
    hub gets the top rank."""
    from pliers_spark.queries import QUERIES

    rows = [
        (0, "a hub b", "en", "s", 7),
        (1, "c hub d", "en", "s", 7),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = QUERIES["textrank_keywords"](spark, sf).collect()
    assert out[0].token == "hub"
    assert out[0].rank_fp > out[1].rank_fp


def test_fightin_words_sign_and_prior(spark, tmp_path):
    """'red' is exclusive to src0, 'blue' to src1; shared filler has
    zeta near 0. Signs: src0-heavy positive, src1-heavy negative."""
    from pliers_spark.queries import QUERIES

    filler = " ".join(["base"] * 20)
    rows = [
        (0, filler + " " + " ".join(["red"] * 10), "en", "src0", 100),
        (1, filler + " " + " ".join(["blue"] * 10), "en", "src1", 100),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.token: r for r in QUERIES["fightin_words"](spark, sf).collect()}
    assert out["red"].zeta > 0 > out["blue"].zeta
    assert abs(out["base"].zeta) < abs(out["red"].zeta)
    assert out["red"].y0 == 10 and out["red"].y1 == 0
    # symmetric construction: zeta(red) == -zeta(blue)
    assert abs(out["red"].zeta + out["blue"].zeta) < 1e-6


def test_phrase_search_positions(spark, tmp_path):
    """Counts only adjacent-in-order occurrences; reversed order and
    gapped pairs don't match."""
    from pliers_spark.queries import QUERIES

    rows = [
        (0, "spark join data spark join", "en", "s", 25),
        (1, "join spark", "en", "s", 10),
        (2, "spark data join", "en", "s", 15),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.doc_id: r for r in QUERIES["phrase_search"](spark, sf).collect()}
    assert out[0].n_occurrences == 2 and out[0].first_pos == 0
    assert 1 not in out and 2 not in out

"""Corpus curation: decontamination and quality-weighted sampling."""

import pyspark.sql.functions as F

from pliers_spark.operators.curation import decontaminate, quality_weighted_sample


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_ngram_overlap(spark):
    # doc_id 0 is the eval split (0 % 97 == 0); doc 1 embeds its 5-gram,
    # doc 2 shares words but no 5-gram, doc 3 is disjoint.
    eval_text = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, eval_text),
        (1, "prefix alpha beta gamma delta epsilon suffix"),
        (2, "alpha beta gamma other delta epsilon"),
        (3, "one two three four five six seven"),
    ]
    out = {r.doc_id: r for r in decontaminate(_docs(spark, rows)).collect()}
    assert set(out) == {1, 2, 3}  # eval docs never emitted
    assert out[1].contaminated and out[1].n_overlap == 1
    assert not out[2].contaminated and out[2].n_overlap == 0
    assert not out[3].contaminated


def test_decontaminate_counts_distinct_grams(spark):
    # two distinct eval 5-grams inside one training doc → n_overlap == 2,
    # and a repeated gram counts once (distinct semantics)
    rows = [
        (0, "a b c d e f g"),  # eval: grams "a b c d e", "b c d e f", "c d e f g"
        (1, "a b c d e f g a b c d e f g"),
    ]
    out = {r.doc_id: r for r in decontaminate(_docs(spark, rows)).collect()}
    # doc 1 contains all 3 eval grams (plus wrap grams not in eval), each once
    assert out[1].n_overlap >= 3


def test_decontaminate_broadcasts_eval_side(spark):
    df = _docs(spark, [(i, f"w{i} x y z q r s") for i in range(10)])
    plan = decontaminate(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_quality_weighted_sample_weights_and_determinism(spark):
    rows = [
        (i, "the quick brown fox jumps over the lazy dog " * 6 + f"tail{i}")
        for i in range(40)
    ] + [(100 + i, f"x{i}") for i in range(40)]  # short, low quality
    df = _docs(spark, rows)
    a = quality_weighted_sample(df).orderBy("doc_id").collect()
    b = quality_weighted_sample(df).orderBy("doc_id").collect()
    assert a == b  # content-hash decision: no rand(), retry-stable
    for r in a:
        rate = (r.quality_bucket + 1) / 5.0
        assert abs(r.sample_weight - round(1.0 / rate, 6)) < 1e-9


def test_quality_weighted_sample_keeps_all_top_bucket(spark):
    # a long, alpha-rich, stopword-bearing doc lands in the top bucket
    # (rate 1.0) — every such doc must be kept regardless of its hash
    good = "the quick brown fox jumps over the lazy dog and then the end " * 5
    df = _docs(spark, [(i, good + f"v{i}") for i in range(30)])
    out = quality_weighted_sample(df).collect()
    top = [r for r in out if r.quality_bucket == 4]
    assert len(top) > 0
    kept_ids = {r.doc_id for r in out}
    # every doc whose bucket is 4 is kept: verify via recompute
    from pliers_spark.functions.text import quality_score

    buckets = {
        r.doc_id: r.b
        for r in df.select(
            "doc_id",
            F.least(F.floor(quality_score("text") * 5).cast("long"), F.lit(4)).alias("b"),
        ).collect()
    }
    for did, bkt in buckets.items():
        if bkt == 4:
            assert did in kept_ids


# ---------------------------------------------------------------------------
# Gopher quality ruleset (Rae et al. 2021, Table A1)


def _gopher(spark, rows):
    from pliers_spark.operators.quality import gopher_rules

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in gopher_rules(df, "text", "doc_id").collect()}


def test_gopher_word_count_and_required_words(spark):
    good = " ".join(["the", "be", "to", "of"] * 15)  # 60 words, 2+ required
    short = "the be to"  # 3 words
    out = _gopher(spark, [(1, good), (2, short)])
    assert out[1]["ok_word_count"] and out[1]["ok_required_words"]
    assert not out[2]["ok_word_count"]
    assert out[2]["ok_required_words"]  # 3 distinct required words
    assert out[1]["n_words"] == 60


def test_gopher_symbol_and_alpha_rules(spark):
    hashy = " ".join(["word#"] * 10)  # 10 hashes / 10 words = 1.0 > 0.1
    nums = " ".join(["123"] * 10)  # 0% alphabetic
    clean = " ".join(["word"] * 10)
    out = _gopher(spark, [(1, hashy), (2, nums), (3, clean)])
    assert not out[1]["ok_symbol_ratio"]
    assert out[3]["ok_symbol_ratio"]
    assert not out[2]["ok_alpha_words"]
    assert out[3]["ok_alpha_words"]


def test_gopher_line_rules(spark):
    bullets = "\n".join(["- item one here"] * 10)  # 100% bullet lines
    ellipsis = "\n".join(["trailing words..."] * 10)  # 100% ellipsis ends
    prose = "\n".join(["a plain line of text"] * 10)
    out = _gopher(spark, [(1, bullets), (2, ellipsis), (3, prose)])
    assert not out[1]["ok_bullet_lines"]
    assert not out[2]["ok_ellipsis_lines"]
    assert out[3]["ok_bullet_lines"] and out[3]["ok_ellipsis_lines"]
    assert out[1]["n_lines"] == 10
    # '...' lines also count toward the symbol ratio (10 ellipses / 20 words)
    assert not out[2]["ok_symbol_ratio"]


def test_gopher_mean_word_length_bounds(spark):
    tiny = " ".join(["a"] * 60)  # mean 1 < 3
    huge = " ".join(["x" * 20] * 60)  # mean 20 > 10
    mid = " ".join(["word"] * 60)  # mean 4
    out = _gopher(spark, [(1, tiny), (2, huge), (3, mid)])
    assert not out[1]["ok_mean_word_len"]
    assert not out[2]["ok_mean_word_len"]
    assert out[3]["ok_mean_word_len"]


def test_gopher_pass_is_conjunction(spark):
    # 60 words, mean length in range, has required words, no symbols/bullets
    good = "the quick brown fox jumps over that lazy dog with grace and " * 5
    out = _gopher(spark, [(1, good.strip())])
    r = out[1]
    assert r["pass_gopher"] == all(
        r[k]
        for k in (
            "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
            "ok_bullet_lines", "ok_ellipsis_lines", "ok_alpha_words",
            "ok_required_words",
        )
    )
    assert r["pass_gopher"]


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023)


def test_dsir_upweights_target_like_docs(spark):
    from pliers_spark.operators.curation import dsir_weights

    target_text = "the cat sat on the mat and the dog sat too"
    offdomain = "zzz qqq www eee rrr ttt yyy uuu iii ooo"
    rows = (
        [(i, target_text, True) for i in range(10)]
        + [(100, target_text, False)]  # raw doc that LOOKS like target
        + [(101, offdomain, False)]  # raw doc unlike target
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    out = {
        r["doc_id"]: r["logw_unats"]
        for r in dsir_weights(df, F.col("is_t")).collect()
    }
    assert out[100] > out[101]  # target-like raw doc gets the higher weight
    assert out[100] > 0  # genuinely up-weighted, not just less down-weighted


def test_dsir_empty_and_single_token_docs_get_zero(spark):
    from pliers_spark.operators.curation import dsir_weights

    rows = [(1, "the cat sat", True), (2, "word", False), (3, "", False)]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    out = {r["doc_id"]: r.asDict() for r in dsir_weights(df, F.col("is_t")).collect()}
    assert len(out) == 3  # spine keeps featureless docs
    assert out[2]["n_feats"] == 0 and out[2]["logw_unats"] == 0
    assert out[3]["n_feats"] == 0 and out[3]["logw_unats"] == 0


# ---------------------------------------------------------------------------
# Fuzzy decontamination (winnowing-based)


def test_fuzzy_decontamination_survives_small_edits(spark):
    from pliers_spark.operators.curation import decontaminate, decontaminate_fuzzy

    eval_text = "the quick brown fox jumps over the lazy dog again and again today"
    # paraphrase-adjacent training doc: one token changed mid-passage —
    # breaks every 5-gram spanning the edit but not the surrounding grams
    leaked = eval_text.replace("lazy", "sleepy") + " with extra trailing words here"
    clean = "completely unrelated training content with no shared passages at all"
    rows = [(0, eval_text), (1, leaked), (2, clean)]  # id 0 -> eval (0 % 97 == 0)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fuzzy = {r["doc_id"]: r["fuzzy_contaminated"]
             for r in decontaminate_fuzzy(df, eval_mod=97).collect()}
    assert fuzzy[1] and not fuzzy[2]
    # the edited doc still shares surrounding exact 5-grams too; the
    # point of the fuzzy tier is the GUARANTEE at matched-span length,
    # not that exact matching always fails — both flag this one
    exact = {r["doc_id"]: r["contaminated"]
             for r in decontaminate(df, eval_mod=97).collect()}
    assert exact[1] and not exact[2]

"""Statistical-LM scoring and repeated-span removal (operators/lm.py)."""

import math

from pliers_spark.operators.lm import bigram_lm_score, ccnet_buckets, chunk_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bigram_lm_score_hand_computed(spark):
    # corpus: one doc "a b a b" → bigrams (a,b) x2, (b,a) x1
    # vocab = {a, b} (V=2); add-one over V+1:
    #   p(b|a) = (2+1)/(2+3) = 0.6 ; p(a|b) = (1+1)/(1+3) = 0.5
    out = bigram_lm_score(_docs(spark, [(0, "a b a b")])).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_bigrams == 3
    expect = round(math.log(0.6) * 1e6) * 2 + round(math.log(0.5) * 1e6)
    assert r.sum_lp_unats == expect
    assert abs(r.avg_lp - round(expect / 3 / 1e6, 6)) < 1e-9


def test_bigram_lm_repeated_text_scores_higher(spark):
    # a doc made of the corpus's dominant pattern scores higher (less
    # negative) than a doc of one-off bigrams
    rows = [(i, "the cat sat on the mat") for i in range(5)] + [
        (99, "zebra quark flux banjo ember")
    ]
    out = {r.doc_id: r for r in bigram_lm_score(_docs(spark, rows)).collect()}
    assert out[0].avg_lp > out[99].avg_lp


def test_bigram_lm_short_doc_total(spark):
    # a 1-token doc has no bigrams but still gets a row
    out = {r.doc_id: r for r in bigram_lm_score(_docs(spark, [(0, "solo"), (1, "a b")])).collect()}
    assert out[0].n_bigrams == 0 and out[0].avg_lp is None
    assert out[1].n_bigrams == 1


def test_oov_maps_to_unk(spark):
    # vocab_size=1 keeps only the most frequent token; everything else
    # becomes <unk> and the model still covers every bigram
    rows = [(0, "a a a b c")]
    out = bigram_lm_score(_docs(spark, rows), vocab_size=1).collect()[0]
    assert out.n_bigrams == 4
    assert out.sum_lp_unats < 0


def test_ccnet_buckets_thirds(spark):
    rows = [(i, "the cat sat on the mat") for i in range(6)] + [
        (100, "aa bb cc dd ee ff"),
        (101, "gg hh ii jj kk ll"),
        (102, "mm nn oo pp qq rr"),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en") for i, t in rows], "doc_id long, text string, lang string"
    )
    out = {r.doc_id: r.ppl_bucket for r in ccnet_buckets(docs).collect()}
    # 9 docs, pr = rank/8: the 3 one-off docs take ranks 0-2 (pr < 1/3 →
    # tail); the 6 tied fluent docs order by doc_id, so the last two
    # (pr 0.875, 1.0) are head
    assert out[100] == out[101] == out[102] == "tail"
    assert out[4] == out[5] == "head"
    assert out[0] == "middle"  # tie-break on doc_id is deterministic


def test_chunk_dedup_removes_boilerplate_spans(spark):
    boiler = "one two three four five six seven eight"  # one exact 8-token span
    rows = [
        (0, boiler + " unique0a unique0b"),
        (1, boiler + " unique1a unique1b"),
        (2, boiler + " unique2a unique2b"),
        (3, "fully distinct text with no shared span at all"),
    ]
    out = {r.doc_id: r for r in chunk_dedup(_docs(spark, rows), max_docs=2).collect()}
    # the boilerplate span occurs in 3 > 2 docs → removed everywhere
    for i in (0, 1, 2):
        assert out[i].n_removed == 1
        assert out[i].clean_text == f"unique{i}a unique{i}b"
    assert out[3].n_removed == 0
    assert out[3].clean_text == rows[3][1]


def test_chunk_dedup_reassembles_in_order(spark):
    # 20 tokens → spans [0:8], [8:16], [16:20]; nothing repeated → text
    # survives byte-identical (single-space tokenization)
    text = " ".join(f"t{i}" for i in range(20))
    out = chunk_dedup(_docs(spark, [(0, text)])).collect()[0]
    assert out.n_chunks == 3 and out.n_removed == 0
    assert out.clean_text == text


def test_chunk_dedup_doc_fully_removed(spark):
    rows = [(i, "same eight token span here for all docs") for i in range(4)]
    out = chunk_dedup(_docs(spark, rows), max_docs=2).collect()
    assert all(r.clean_text == "" and r.n_removed == r.n_chunks for r in out)


def test_chunk_dedup_broadcast_anti_join(spark):
    rows = [(i, f"u{i} v{i} w{i} x{i}") for i in range(10)]
    plan = chunk_dedup(_docs(spark, rows))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_source_kl_identical_sources_zero(spark):
    # two sources with identical unigram distributions → KL = 0 for both
    from pliers_spark.operators.curation import source_kl

    rows = [(0, "a b c", "s0"), (1, "a b c", "s1")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in source_kl(docs).collect()}
    assert out["s0"].kl == 0.0 and out["s1"].kl == 0.0
    assert out["s0"].n_tokens == 3


def test_source_kl_disjoint_sources_positive(spark):
    from pliers_spark.operators.curation import source_kl

    rows = [(0, "a a a a", "s0"), (1, "b b b b", "s1")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in source_kl(docs).collect()}
    # each source is fully concentrated on its own token: KL = ln 2
    import math

    assert abs(out["s0"].kl - round(round(math.log(2) * 1e6) / 1e6, 6)) < 1e-9
    assert out["s0"].kl == out["s1"].kl


def test_normalize_text_unicode_and_whitespace(spark):
    from pliers_spark.operators.curation import normalize_text

    # 'e' + COMBINING ACUTE (NFD) composes to a single NFC codepoint;
    # control chars stripped; tab/space runs collapse; edges trimmed
    rows = [
        (0, "éclair  \t x"),
        (1, " plain text "),
        (2, "ctrl\x07char"),
        (3, "already clean"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in normalize_text(docs).collect()}
    assert out[0].norm_text == "éclair x" and out[0].changed
    assert out[1].norm_text == "plain text" and out[1].changed
    assert out[2].norm_text == "ctrlchar" and out[2].changed
    assert out[3].norm_text == "already clean" and not out[3].changed


def test_chunk_dedup_large_dropped_set_falls_back_to_planner(spark):
    from pliers_spark.operators.lm import chunk_dedup

    # force the fallback path: broadcast_cap=0 means even one dropped
    # span routes through the planner-chosen anti-join; results must be
    # identical to the forced-broadcast path
    boiler = "one two three four five six seven eight"
    rows = [(i, boiler + f" tail{i}") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, chunk_dedup(docs, max_docs=2).collect()))
    b = sorted(map(tuple, chunk_dedup(docs, max_docs=2, broadcast_cap=0).collect()))
    assert a == b
    assert a[0][2] == 1  # the shared span was removed

"""Distributed BPE merge learning (operators/bpe.py)."""

from pliers_spark.operators.bpe import bpe_learn


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_learn_hand_computed(spark):
    # words: aaab (freq 2), banana (freq 1)
    # round 1 census: (a,a)=4 (two overlapping pairs in aaab × freq 2),
    #   (a,b)=2, (a,n)=2, (n,a)=2, (b,a)=1 → best (a,a)
    # round 2 (aaab → [aa,a,b]): (aa,a)=2, (a,b)=2, (a,n)=2, (n,a)=2,
    #   (b,a)=1 → tie on 2, lexicographic tie-break → (a,b)
    out = bpe_learn(_docs(spark, ["aaab aaab", "banana"]), n_merges=2).collect()
    got = [(r.merge_rank, r.left_sym, r.right_sym, r.pair_count, r.new_sym) for r in out]
    assert got == [(1, "a", "a", 4, "aa"), (2, "a", "b", 2, "ab")]


def test_bpe_learn_greedy_run_semantics(spark):
    # "aaaa": round-1 census counts 3 overlapping (a,a) pairs, but the
    # greedy application merges positions 0-1 and 2-3 → [aa, aa];
    # round 2 then merges (aa, aa) once
    out = bpe_learn(_docs(spark, ["aaaa"]), n_merges=2).collect()
    got = [(r.merge_rank, r.left_sym, r.right_sym, r.pair_count, r.new_sym) for r in out]
    assert got == [(1, "a", "a", 3, "aa"), (2, "aa", "aa", 1, "aaaa")]


def test_bpe_learn_stops_when_exhausted(spark):
    # one two-char word: after one merge every word is a single symbol
    out = bpe_learn(_docs(spark, ["ab"]), n_merges=5).collect()
    assert len(out) == 1
    assert out[0].new_sym == "ab"


def test_bpe_encode_counts(spark):
    from pliers_spark.operators.bpe import bpe_encode_counts

    # one merge learned: (a,a). "aaab" → [aa,a,b] = 3 subwords,
    # "cd" stays 2 chars = 2 subwords
    docs = _docs(spark, ["aaab cd", "aaab"])
    out = {r.doc_id: r for r in bpe_encode_counts(docs, n_merges=1).collect()}
    assert out[0].n_words == 2 and out[0].n_subwords == 3 + 2
    assert out[1].n_words == 1 and out[1].n_subwords == 3

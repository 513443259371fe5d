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


def _py_greedy_merge(word, a, b):
    """Reference greedy left-to-right BPE merge on a symbol list."""
    syms = list(word)
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_apply_merge_differential_vs_python_reference(spark):
    # adversarial 2-letter alphabet maximizes runs and overlap cases;
    # one Spark job checks ~300 random words against the reference
    import random

    from pyspark.sql import functions as F

    from pliers_spark.operators.bpe import _apply_merge, _char_symbols

    rng = random.Random(7)
    words = list({
        "".join(rng.choice("ab") for _ in range(rng.randint(1, 12)))
        for _ in range(300)
    })
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    for a, b in [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")]:
        merged = _apply_merge(_char_symbols(docs, "text"), a, b)
        got = {
            r.word: r.syms
            for r in merged.groupBy("word")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "sym"))).alias("ps"))
            .select("word", F.transform("ps", lambda x: x["sym"]).alias("syms"))
            .collect()
        }
        for w in words:
            assert got[w] == _py_greedy_merge(w, a, b), (w, a, b, got[w])

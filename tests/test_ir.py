"""IR / corpus-statistics operators (operators/ir.py): value semantics
against tiny hand-checkable corpora and pure-python references, plus
the plan properties that hold at scale."""

import math

from pyspark.sql import functions as F

from pliers_spark.operators.ir import bm25_rerank, bm25_topk, pmi_collocations, readability

K1, B = 1.2, 0.75


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _bm25_reference(docs, queries, k):
    """Row-at-a-time python BM25 with the module's rounding rule."""
    tf, dl = {}, {}
    for d, text in docs:
        toks = text.split()
        dl[d] = len(toks)
        for t in toks:
            tf[(d, t)] = tf.get((d, t), 0) + 1
    n, sumdl = len(docs), sum(dl.values())
    scores = {}
    for q, terms in queries.items():
        for t in set(terms):
            df_ = len({d for (d, tt) in tf if tt == t})
            if df_ == 0:
                continue
            idf = math.log(1.0 + ((n - df_) + 0.5) / (df_ + 0.5))
            for d in dl:
                f = tf.get((d, t), 0)
                if f == 0:
                    continue
                tfn = (f * (K1 + 1.0)) / (f + K1 * ((1.0 - B) + (B * (dl[d] * n)) / sumdl))
                scores[(q, d)] = scores.get((q, d), 0) + round(idf * tfn * 1e6)
    out = {}
    for q in queries:
        ranked = sorted(
            ((s, d) for (qq, d), s in scores.items() if qq == q),
            key=lambda sd: (-sd[0], sd[1]),
        )
        out[q] = [(d, s, i + 1) for i, (s, d) in enumerate(ranked[:k])]
    return out


def test_bm25_matches_python_reference(spark):
    docs = [
        (1, "spark sql engine fast engine"),
        (2, "spark streaming engine"),
        (3, "sql query planner"),
        (4, "fast fast fast spark"),
        (5, "planner sql sql sql"),
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    queries = {10: ["spark", "sql"], 20: ["fast", "engine", "engine"]}
    qdf = spark.createDataFrame(
        [(q, t) for q, ts in queries.items() for t in ts], "q_id long, term string"
    )
    got = {
        q: [] for q in queries
    }
    for r in bm25_topk(ddf, qdf, k=3).orderBy("q_id", "rank").collect():
        got[r.q_id].append((r.doc_id, r.score_fp, r.rank))
    assert got == _bm25_reference(docs, queries, 3)


def test_bm25_rarer_term_outranks_common_term(spark):
    # 'rare' appears in one doc, 'common' in all: the rare-term doc must
    # outscore any common-term-only doc for a query carrying both.
    docs = [(1, "rare common"), (2, "common filler"), (3, "common filler"), (4, "common filler")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame([(1, "rare"), (1, "common")], "q_id long, term string")
    rows = bm25_topk(ddf, qdf, k=4).collect()
    top = min(rows, key=lambda r: r.rank)
    assert top.doc_id == 1


def test_pmi_prefers_exclusive_pair(spark):
    # 'x y' always co-occur and appear nowhere else -> highest PMI;
    # 'a b' co-occur as often but 'a'/'b' are frequent elsewhere.
    rows = []
    for i in range(6):
        rows.append((i, "x y a b"))
    for i in range(6, 30):
        rows.append((i, "a c b d a e b f"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_collocations(df, min_count=5, k=10).collect()
    assert (out[0].w1, out[0].w2) == ("x", "y")
    pmi = {(r.w1, r.w2): r.pmi_fp for r in out}
    assert pmi[("x", "y")] > pmi.get(("a", "b"), -(10**12))


def test_pmi_matches_python_reference(spark):
    corpus = [(1, "u v u v w"), (2, "u v w w w"), (3, "v u v u u")]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {(r.w1, r.w2): (r.c12, r.pmi_fp) for r in pmi_collocations(df, min_count=1, k=100).collect()}
    uni, bg = {}, {}
    for _, text in corpus:
        ts = text.split()
        for t in ts:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
    n_tok, n_bg = sum(uni.values()), sum(bg.values())
    for (a, b), c12 in bg.items():
        pmi = round(math.log((c12 * n_tok * n_tok) / (uni[a] * uni[b] * n_bg)) * 1e6)
        assert got[(a, b)] == (c12, pmi), (a, b)


def test_readability_hand_computed(spark):
    # 'the cat sat . the dog ran' -> boundary after each 'the':
    # sentences: ['the.', 'cat sat the.', 'dog ran'] = 3
    df = spark.createDataFrame([(1, "the cat sat the dog ran")], "doc_id long, text string")
    r = readability(df).collect()[0]
    assert r.n_words == 6
    assert r.n_sents == 3
    # syllables: the=1 cat=1 sat=1 the=1 dog=1 ran=1 -> 6
    assert r.n_syllables == 6
    wps, spw = 6 / 3, 6 / 6
    assert r.flesch_fp == round((206.835 - 1.015 * wps - 84.6 * spw) * 1e6)
    assert r.fk_grade_fp == round((0.39 * wps + 11.8 * spw - 15.59) * 1e6)


def test_readability_counts_vowel_groups_not_vowels(spark):
    # 'queue' has 2 vowel GROUPS (ueue is one group? u-e-u-e: 'ueue' is
    # one contiguous run -> 1, floored to 1); 'beautiful' has
    # eau|i|u -> 3 groups; consonant-only token floors to 1.
    df = spark.createDataFrame(
        [(1, "queue beautiful xyz")], "doc_id long, text string"
    )
    r = readability(df).collect()[0]
    assert r.n_syllables == 1 + 3 + 1


def test_bm25_rerank_reorders_by_cosine_within_candidates(spark):
    # docs 1 and 2 are both BM25 hits for 'spark'; doc 2's embedding is
    # aligned with the query's, doc 1's is orthogonal -> rerank flips
    # the lexical order. doc 3 never contains the term -> excluded even
    # though its embedding is identical to the query's.
    docs = [
        (1, "spark spark spark"),
        (2, "spark engine"),
        (3, "planner only"),
        (4, "query planner text"),
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    emb = spark.createDataFrame(
        [
            (1, [0.0, 1.0]),
            (2, [1.0, 0.05]),
            (3, [1.0, 0.0]),
            (4, [-1.0, 0.0]),
            (10, [1.0, 0.0]),  # the query's own vector
        ],
        "vec_id long, embedding array<float>",
    )
    qdf = spark.createDataFrame([(10, "spark")], "q_id long, term string")
    rows = bm25_rerank(ddf, qdf, emb, k1=10, k=10).orderBy("rank").collect()
    assert [r.doc_id for r in rows] == [2, 1]  # cosine order, not bm25 order
    assert rows[0].cosine > rows[1].cosine
    # bm25 lexical order was the reverse
    assert rows[1].bm25_fp > rows[0].bm25_fp


def test_bm25_rerank_k1_gates_the_semantic_stage(spark):
    # k1=1 keeps only the single best lexical hit -> the semantically
    # perfect doc 2 is never scored
    docs = [(1, "spark spark spark"), (2, "spark engine")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    emb = spark.createDataFrame(
        [(1, [0.0, 1.0]), (2, [1.0, 0.0]), (10, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    qdf = spark.createDataFrame([(10, "spark")], "q_id long, term string")
    rows = bm25_rerank(ddf, qdf, emb, k1=1, k=5).collect()
    assert [r.doc_id for r in rows] == [1]


def test_readability_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "the a b")], "doc_id long, text string")
    plan = _plan(readability(df))
    assert "Exchange" not in plan and "PythonUDF" not in plan, plan

"""Batch 80: personalized PageRank, Dirichlet QL retrieval, Good-Turing."""

import math
import os


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"


def test_personalized_pagerank_chain(spark):
    """Seed->a->b chain (no link back): seed keeps teleport mass,
    b gets only propagated mass, an isolated sink unreached by the
    seed stays at exact 0."""
    from pliers_spark.operators.graph import personalized_pagerank

    edges = spark.createDataFrame(
        [(100, 200), (200, 300), (400, 500)], "src long, dst long"
    )
    out = {r.node: r.rank_fp for r in personalized_pagerank(edges, seeds=[100], iterations=10).collect()}
    assert out[500] == 0 and out[400] == 0  # unreachable from seed
    assert out[100] > out[200] > out[300] > 0
    # seed r0 = 1e9; round 1: base 3e9//20 = 150000000, a gets 17*1e9//20
    assert out[100] >= 150_000_000


def test_personalized_pagerank_seed_split(spark):
    """Two seeds split the restart mass: symmetric graph gives equal
    ranks."""
    from pliers_spark.operators.graph import personalized_pagerank

    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    out = {r.node: r.rank_fp for r in personalized_pagerank(edges, seeds=[1, 2], iterations=5).collect()}
    assert out[1] == out[2] > 0


def test_qld_ranks_matching_doc_first(spark, tmp_path):
    """A doc containing all three query tokens outranks one with none;
    scores match the hand formula."""
    from pliers_spark.queries import QUERIES

    rows = [
        (0, "spark join data spark", "en", "s", 20),
        (1, "alpha beta gamma delta", "en", "s", 20),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = QUERIES["qld_topk"](spark, sf).collect()
    assert [r.doc_id for r in out] == [0, 1]
    # hand-check doc 0: dlen=4, cn=8, cf(spark)=2, cf(join)=1, cf(data)=1
    mu = 100
    terms0 = [
        round(1e6 * math.log((tf + mu * cf / 8) / (4 + mu)))
        for tf, cf in [(2, 2), (1, 1), (1, 1)]
    ]
    assert out[0].score_fp == sum(terms0)
    terms1 = [
        round(1e6 * math.log((0 + mu * cf / 8) / (4 + mu))) for cf in [2, 1, 1]
    ]
    assert out[1].score_fp == sum(terms1)


def test_good_turing_table(spark, tmp_path):
    """aaa x3, bb x2, c x1, d x1: N1=2, N2=1, N3=1 ->
    r*=(1+1)*N2/N1=1, r*(2)=3*N3/N2=3, r*(3)=4*0/1=0."""
    from pliers_spark.queries import QUERIES

    rows = [(0, "a a a b b c d", "en", "s", 13)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.r: r for r in QUERIES["good_turing"](spark, sf).collect()}
    assert out[1].n_r == 2 and out[1].r_star == 1.0
    assert out[2].n_r == 1 and out[2].r_star == 3.0
    assert out[3].n_r == 1 and out[3].r_star == 0.0

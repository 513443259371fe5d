"""Fixed-point PageRank: exact equality with a Python reference of the
same integer recurrence, plus graph-shape sanity."""

import pytest

from pliers_spark.operators.graph import PR_SCALE, host_link_edges, pagerank


def _py_pagerank(edges, iterations):
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    base = (3 * PR_SCALE) // (20 * n)
    r = {v: PR_SCALE // n for v in nodes}
    for _ in range(iterations):
        inc = {v: 0 for v in nodes}
        for s, d in edges:
            inc[d] += r[s] // out[s]
        r = {v: base + (17 * inc[v]) // 20 for v in nodes}
    return r


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (3, 1)],                      # cycle: symmetric ranks
        [(1, 2), (1, 3), (1, 4), (2, 1), (3, 1)],      # star with backlinks
        [(1, 2), (2, 3)],                               # chain ending dangling
    ],
)
def test_pagerank_matches_integer_reference(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank_fp for r in pagerank(df, iterations=7).collect()}
    assert got == _py_pagerank(edges, 7)


def test_pagerank_cycle_is_symmetric_and_conserves_mass(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    rows = pagerank(df, iterations=10).collect()
    fps = {r.rank_fp for r in rows}
    assert len(fps) == 1  # symmetry: identical rank on a cycle
    # no dangling nodes -> total mass stays within integer-floor slack of SCALE
    total = sum(r.rank_fp for r in rows)
    assert PR_SCALE - 100 <= total <= PR_SCALE


def test_host_link_edges_shape(spark):
    docs = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    e = host_link_edges(docs, "doc_id", n_hosts=10, links_per_doc=3)
    rows = e.collect()
    assert all(r.src != r.dst for r in rows)
    assert len(rows) == len({(r.src, r.dst) for r in rows})  # distinct
    assert all(0 <= r.src < 10 and 0 <= r.dst < 10 for r in rows)

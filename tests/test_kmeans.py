"""Lloyd assignment step (operators/similarity.kmeans_assign)."""

from pliers_spark.operators.similarity import kmeans_assign


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_assign_exact_clusters(spark):
    # seeds 0 and 1 at (0,0) and (10,10); the rest are near one of them
    rows = [
        (0, [0.0, 0.0]),
        (1, [10.0, 10.0]),
        (2, [0.5, 0.1]),
        (3, [9.0, 10.5]),
        (4, [0.2, 0.2]),
    ]
    out = {r.vec_id: r for r in kmeans_assign(_vecs(spark, rows), k=2).collect()}
    assert out[0].cluster_id == 0 and out[0].d_u == 0
    assert out[1].cluster_id == 1 and out[1].d_u == 0
    assert out[2].cluster_id == 0 and out[4].cluster_id == 0
    assert out[3].cluster_id == 1
    # exact int64 micro-unit distance: (0.5e6)² + (0.1e6)²
    assert out[2].d_u == 500000**2 + 100000**2


def test_kmeans_assign_tie_breaks_to_smaller_centroid(spark):
    rows = [
        (0, [0.0]),
        (1, [2.0]),
        (2, [1.0]),  # exactly equidistant from both seeds
    ]
    out = {r.vec_id: r for r in kmeans_assign(_vecs(spark, rows), k=2).collect()}
    assert out[2].cluster_id == 0


def test_kmeans_assign_no_shuffle(spark):
    rows = [(i, [float(i), float(-i)]) for i in range(20)]
    plan = kmeans_assign(_vecs(spark, rows))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_kmeans_fit_reduces_sse_and_partitions_all(spark):
    from pliers_spark.operators.similarity import kmeans_fit

    # two tight blobs far apart; seeds 0,1 both land in blob A, so the
    # seed assignment is bad and Lloyd must move a centroid to blob B
    blob_a = [(i, [0.0 + i * 0.01, 0.0]) for i in range(10)]
    blob_b = [(10 + i, [100.0 + i * 0.01, 100.0]) for i in range(10)]
    df = _vecs(spark, blob_a + blob_b)

    fit = {r.cluster_id: r for r in kmeans_fit(df, k=2, n_iter=3).collect()}
    assert sum(r.n_members for r in fit.values()) == 20
    # after training, the two blobs separate 10/10
    assert sorted(r.n_members for r in fit.values()) == [10, 10]

    # the trained SSE beats the seed-assignment SSE by orders of magnitude
    seed_sse = sum(
        r.d_u for r in kmeans_assign(df, k=2).collect()
    )
    fit_sse = sum(r.sum_d_u for r in fit.values())
    assert fit_sse < seed_sse / 100


def test_kmeans_fit_empty_cluster_keeps_centroid(spark):
    from pliers_spark.operators.similarity import kmeans_fit

    # seed 1 is a far outlier that captures nothing after round 1 moves
    # seed 0's centroid to the data mean; the fit must still emit k rows
    rows = [(0, [0.0]), (1, [1000.0]), (2, [0.5]), (3, [0.25])]
    out = {r.cluster_id: r for r in kmeans_fit(_vecs(spark, rows), k=2, n_iter=2).collect()}
    assert set(out) == {0, 1}
    assert out[0].n_members + out[1].n_members == 4


def test_ivf_multiprobe_recall_vs_bruteforce(spark):
    from pliers_spark.operators.similarity import cosine_topk, ivf_multiprobe_topk

    # two well-separated blobs: every query's true neighbors share its
    # bucket, so nprobe=2 IVF recalls the brute-force top-k exactly
    import random

    rng = random.Random(3)
    rows = []
    for i in range(40):
        base = [0.0, 0.0] if i % 2 == 0 else [50.0, 50.0]
        rows.append((i, [base[0] + rng.uniform(-1, 1), base[1] + rng.uniform(-1, 1)]))
    df = _vecs(spark, rows)
    ivf = ivf_multiprobe_topk(df, k_clusters=2, nprobe=2, k=3, query_lo=8, query_hi=12)
    qs = df.where((df.vec_id >= 8) & (df.vec_id < 12))
    bf = cosine_topk(df, qs, "vec_id", "embedding", "vec_id", "embedding", k=3)
    got = {(r.q_id, r.rank): r.c_id for r in ivf.collect()}
    want = {(r.q_id, r.rank): r.c_id for r in bf.collect()}
    assert got == want


def test_jl_project_matches_numpy_integer_reference(spark):
    import hashlib

    import numpy as np

    from pliers_spark.operators.similarity import jl_project

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rng = np.random.RandomState(7)
    X = rng.randn(20, 8).astype(np.float32) * 0.3
    rows = [(i, [float(v) for v in X[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.vec_id, r.dim): r.y for r in jl_project(df, out_dims=4).collect()}
    Q = np.floor(X.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    S = np.array([[1 - 2 * (h(f"{j}:{i}") % 2) for i in range(8)] for j in range(4)])
    for v in range(20):
        for j in range(4):
            assert got[(v, j)] == int((S[j] * Q[v]).sum())


def test_jl_project_preserves_relative_distance_order(spark):
    # JL guarantee (sanity, not statistics): an exact duplicate pair
    # projects to identical vectors; a far pair stays far.
    from pliers_spark.operators.similarity import jl_project

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),   # dup of 1
        (3, [-1.0, 5.0, -5.0, 9.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {}
    for r in jl_project(df, out_dims=6).collect():
        out.setdefault(r.vec_id, {})[r.dim] = r.y
    assert out[1] == out[2]
    assert out[1] != out[3]

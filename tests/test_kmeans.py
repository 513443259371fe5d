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

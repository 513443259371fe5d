"""Approximate / exact nearest-neighbor search over embedding columns.

- :func:`cosine_topk` — brute-force exact top-k (the correctness
  baseline): broadcast the (small) query set, score every corpus row
  with a JVM ``zip_with``/``aggregate`` dot product, per-query rank
  window, keep k. One broadcast join + one shuffle on query_id.
- :func:`ivf_topk` — the scale path: corpus rows carry a coarse
  partition (cluster id / label / LSH bucket); queries probe only their
  ``nprobe`` nearest buckets, cutting scored candidates by the bucket
  fan-out factor. Same scoring expressions, bucket-gated join.
- :func:`random_hyperplane_buckets` — seeded LSH bucketing for corpora
  without a precomputed cluster id (deterministic: hyperplanes derive
  from md5 of (seed, dim) — reproducible across runs/engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, z: acc + z)


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k per query (brute force, broadcast queries)."""
    q = F.broadcast(queries.select(F.col(query_id).alias("q_id"), F.col(query_vec).alias("q_vec")))
    c = corpus.select(F.col(corpus_id).alias("c_id"), F.col(corpus_vec).alias("c_vec"))
    joined = c.crossJoin(q)
    if exclude_self:
        joined = joined.where(F.col("c_id") != F.col("q_id"))
    scored = joined.select(
        "q_id",
        "c_id",
        F.round(_dot(F.col("c_vec"), F.col("q_vec")) / (_norm(F.col("c_vec")) * _norm(F.col("q_vec"))), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.col("c_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    corpus_vec: str,
    query_id: str,
    query_vec: str,
    bucket_col: str,
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-style ANN: only score corpus rows in the query's bucket(s).

    ``bucket_col`` must exist on both sides (queries pre-assigned to the
    buckets they probe — replicate query rows per probed bucket for
    nprobe > 1). Equi-join on bucket ⇒ shuffle is bucket-local; scored
    candidates shrink by ~|buckets| versus brute force.
    """
    q = queries.select(
        F.col(query_id).alias("q_id"), F.col(query_vec).alias("q_vec"), F.col(bucket_col)
    )
    c = corpus.select(
        F.col(corpus_id).alias("c_id"), F.col(corpus_vec).alias("c_vec"), F.col(bucket_col)
    )
    joined = c.join(F.broadcast(q), on=bucket_col)
    if exclude_self:
        joined = joined.where(F.col("c_id") != F.col("q_id"))
    scored = joined.select(
        "q_id",
        "c_id",
        F.round(_dot(F.col("c_vec"), F.col("q_vec")) / (_norm(F.col("c_vec")) * _norm(F.col("q_vec"))), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.col("c_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def random_hyperplane_buckets(
    df: DataFrame, vec_col: str, dim: int, n_planes: int = 4, seed: int = 42
) -> DataFrame:
    """Sign-LSH bucket id from ``n_planes`` deterministic pseudo-random
    hyperplanes. Plane coefficients come from the md5-int hash of
    (seed, plane, dim-index) mapped to [-1, 1] — fully reproducible,
    no RNG state, computable in SQL for oracles."""
    import hashlib

    def coef(p: int, d: int) -> float:
        h = int(hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[:15], 16)
        return (h / float(2**60)) * 2.0 - 1.0

    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(coef(p, d)) for d in range(dim)])
        proj = _dot(F.col(vec_col).cast("array<double>"), plane)
        bucket = bucket + F.when(proj > 0, F.lit(2**p)).otherwise(F.lit(0))
    return df.withColumn("bucket", bucket)

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

from typing import Iterator

import numpy as np
import pandas as pd
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


def kmeans_assign(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
) -> DataFrame:
    """One Lloyd assignment step — the training primitive behind the IVF
    coarse quantizer (:func:`ivf_topk` consumes exactly this output as
    its bucket column).

    Distances are EXACT int64 arithmetic: every coordinate is scaled to
    micro-units with ``floor(x·1e6 + 0.5)`` (floor-plus-half instead of
    round so both engines use the same half-up rule; numpy ``round``
    is banker's, DuckDB ``round`` is half-away), then
    ``d = Σ (v_u − c_u)²`` in int64 — order-independent, no float
    accumulation anywhere, so the driver's raw-bit hash is trivially
    stable. Ties (equidistant centroids) break toward the smaller
    centroid id on both engines.

    Seeds are the ``k`` smallest-id vectors (k-means++ at scale is a
    different initializer, same assignment step). The seed collect is a
    bounded k-row dimension fetch; the corpus side is one
    Arrow-batched numpy pass — (B×D)·(D×k) integer matmul per batch,
    never a per-row Python loop — and shuffles nothing.

    Returns ``(id, cluster_id, d_u)`` with ``d_u`` in squared
    micro-units.
    """
    seeds = (
        vectors.where(F.col(id_col) < k)
        .select(id_col, vec_col)
        .orderBy(id_col)
        .collect()
    )  # k rows — bounded dimension, mirrors the broadcast-query pattern
    seed_ids = np.array([r[0] for r in seeds], dtype=np.int64)
    cu = np.floor(np.asarray([r[1] for r in seeds], dtype=np.float64) * 1e6 + 0.5).astype(
        np.int64
    )

    @F.pandas_udf("cluster_id long, d_u long")
    def assign(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for emb in batches:
            vu = np.floor(
                np.stack(emb.to_numpy()).astype(np.float64) * 1e6 + 0.5
            ).astype(np.int64)
            # ||v-c||² = v·v − 2 v·c + c·c, all int64 (exact)
            d = (
                (vu * vu).sum(axis=1, keepdims=True)
                - 2 * (vu @ cu.T)
                + (cu * cu).sum(axis=1)[None, :]
            )
            best = d.argmin(axis=1)  # first minimum = smallest centroid id
            yield pd.DataFrame(
                {
                    "cluster_id": seed_ids[best],
                    "d_u": d[np.arange(len(best)), best],
                }
            )

    return vectors.select(
        id_col, assign(F.col(vec_col)).alias("s")
    ).select(id_col, F.col("s.cluster_id"), F.col("s.d_u"))


def kmeans_assign_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
) -> str:
    """DuckDB oracle for :func:`kmeans_assign` (same micro-unit
    scaling, same int64 distance, same tie rule)."""
    return f"""WITH c AS (
         SELECT {id_col} AS cid, {vec_col} AS cemb FROM {table} WHERE {id_col} < {k}),
       d AS (
         SELECT e.{id_col}, c.cid,
                CAST(list_sum(list_transform(
                  list_transform(range(1, len(e.{vec_col}) + 1),
                    i -> CAST(floor(e.{vec_col}[i]::DOUBLE * 1e6 + 0.5) AS BIGINT)
                       - CAST(floor(c.cemb[i]::DOUBLE * 1e6 + 0.5) AS BIGINT)),
                  x -> x * x)) AS BIGINT) AS d_u
         FROM {table} e CROSS JOIN c),
       r AS (
         SELECT {id_col}, cid, d_u,
                row_number() OVER (PARTITION BY {id_col} ORDER BY d_u, cid) AS rn
         FROM d)
       SELECT {id_col}, cid AS cluster_id, d_u FROM r WHERE rn = 1"""

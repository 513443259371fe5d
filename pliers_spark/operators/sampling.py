"""Deterministic corpus sampling: hash splits, rate gates, stratified k.

The three sampling primitives every training-data pipeline runs between
curation and tokenization, complementing the temperature mixture sampler
in operators/curation.py:

- **hash_split**: assign every row to train/valid/test by a hash of its
  id — a pure projection (zero shuffle, no RNG state), so the split is
  reproducible across runs, machines, and engines, and any row's split
  can be recomputed from its id alone. This is how production pipelines
  split at the 10^12-row scale where a shuffled `randomSplit` would be
  both nondeterministic under retries and a full-corpus shuffle.

- **rate_sample**: Bernoulli-by-hash row gate (keep iff
  ``h(id) mod 1e6 < rate_ppm``) — the seedable down-sampling filter for
  smoke slices and ablation corpora. A pure pushdown-able filter.

- **stratified_sample**: exactly ``k`` rows per stratum, chosen by hash
  order (not "first k seen", which is partition-layout-dependent).
  One shuffle on the strata key; within a stratum the winners are the k
  smallest ``(h(id), id)`` — equivalently a per-group top-k, which Spark
  executes with a rank window. At 100 TB a hot stratum serializes into
  one task; for that regime prefer ``rate_sample`` per stratum with a
  census-derived rate (see operators/skew.py for the census pattern) —
  exact-k is the small-strata tool (per-language eval sets, per-source
  audit samples).

All three use the engine's cross-engine md5 hash
(functions/hashing.md5_int), so the DuckDB oracles reproduce the exact
row sets — no allclose, no statistical assertions.

Reference anchor: pliers has no corpus-sampling surface (per-stimulus
extractors only, pliers/extractors/base.py); these are engine-level
counterparts required by the 100 TB training-data goal, following the
hash-split convention of C4/The Pile reproducible corpus construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_int, md5_int_sql


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, int] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Add ``bucket`` (0..99) and ``split`` columns by id hash.

    ``weights`` maps split name -> integer percent; must sum to 100.
    Rows land in splits by cumulative bucket ranges, so a row's split is
    a pure function of its id and the seed. Zero shuffle.
    """
    weights = weights or {"train": 98, "valid": 1, "test": 1}
    if sum(weights.values()) != 100:
        raise ValueError(f"weights must sum to 100, got {weights}")
    bucket = F.pmod(md5_int(F.col(id_col).cast("string"), seed=seed), F.lit(100))
    expr = None
    lo = 0
    for name, pct in weights.items():
        cond = bucket < F.lit(lo + pct)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo += pct
    return df.select(
        "*", bucket.cast("long").alias("bucket"), expr.alias("split")
    )


def hash_split_sql(
    table: str,
    id_col: str,
    cols: str,
    weights: dict[str, int] | None = None,
    seed: int = 0,
) -> str:
    """DuckDB oracle for :func:`hash_split` (same hash, same ranges)."""
    weights = weights or {"train": 98, "valid": 1, "test": 1}
    h = md5_int_sql(f"CAST({id_col} AS VARCHAR)", seed=seed)
    case = "CASE"
    lo = 0
    for name, pct in weights.items():
        case += f" WHEN bucket < {lo + pct} THEN '{name}'"
        lo += pct
    case += " END"
    return f"""WITH b AS (
  SELECT {cols}, CAST({h} % 100 AS BIGINT) AS bucket FROM {table})
SELECT {cols}, bucket, {case} AS split FROM b"""


def rate_sample(
    df: DataFrame, id_col: str, rate_ppm: int, seed: int = 0
) -> DataFrame:
    """Keep each row iff ``h(id) mod 1e6 < rate_ppm`` — a deterministic
    Bernoulli(rate_ppm/1e6) gate that is a plain filter (pushes below
    wide operators; no RNG state, stable under task retries)."""
    gate = F.pmod(md5_int(F.col(id_col).cast("string"), seed=seed), F.lit(1_000_000))
    return df.where(gate < F.lit(rate_ppm))


def rate_sample_sql(table: str, id_col: str, rate_ppm: int, seed: int = 0) -> str:
    h = md5_int_sql(f"CAST({id_col} AS VARCHAR)", seed=seed)
    return f"SELECT * FROM {table} WHERE {h} % 1000000 < {rate_ppm}"


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, the k smallest by
    ``(h(id), id)`` — a deterministic per-group top-k (one shuffle on the
    strata key, rank window inside). Output adds ``sample_rank`` (1..k).
    """
    h = md5_int(F.col(id_col).cast("string"), seed=seed).alias("_h")
    w = Window.partitionBy(*strata_cols).orderBy(F.col("_h"), F.col(id_col))
    return (
        df.select("*", h)
        .select("*", F.row_number().over(w).alias("sample_rank"))
        .where(F.col("sample_rank") <= k)
        .drop("_h")
        .select(*strata_cols, id_col, F.col("sample_rank").cast("long").alias("sample_rank"))
    )


def stratified_sample_sql(
    table: str, strata_cols: list[str], id_col: str, k: int, seed: int = 0
) -> str:
    h = md5_int_sql(f"CAST({id_col} AS VARCHAR)", seed=seed)
    strata = ", ".join(strata_cols)
    return f"""WITH r AS (
  SELECT {strata}, {id_col},
         row_number() OVER (PARTITION BY {strata} ORDER BY {h}, {id_col})::BIGINT AS sample_rank
  FROM {table})
SELECT {strata}, {id_col}, sample_rank FROM r WHERE sample_rank <= {k}"""

"""Skew defense for aggregations (SURVEY.md §4 custom-physical item 1).

Spark's partial (map-side) aggregation already neutralizes key skew for
algebraic aggregates (sum/count/min/max): each mapper pre-collapses its
share of the hot key. What it can NOT fix is a **non-algebraic**
aggregate — exact ``count(DISTINCT v)``, ``collect_set`` — where every
distinct value of the hot key must meet in one reduce task.

``salted_count_distinct`` breaks that with the standard two-stage salt:

    stage 1: group by (key, pmod(xxhash64(v), S)) — the VALUE hash is
             the salt, so each distinct v lands in exactly one salt
             bucket; a per-bucket exact distinct is safe to compute
             independently (buckets partition the value space);
    stage 2: group by key, SUM the per-bucket distinct counts.

The hot key's work now spreads over S reduce tasks. Both shuffles carry
only (key, salt) pre-aggregated rows. Correctness is oracle-gated
(query ``salted_unique_tokens``: result ≡ plain count distinct).

For skewed *joins* the engine relies on AQE's skew-join splitting
(asserted live in tests/test_plans.py::test_aqe_splits_skewed_join) and
on the time-range union-split of the as-of operator
(``operators/asof.py::asof_join_split``) where salting would break
sort-merge continuity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    num_salts: int = 32,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact distinct-count per key, skew-spread over ``num_salts``
    buckets by hashing the VALUE (each distinct value maps to exactly
    one bucket, so bucket counts add exactly)."""
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(num_salts)).alias("_salt")
    stage1 = (
        df.select(*key_cols, F.col(value_col), salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.countDistinct(value_col).alias("_part"))
    )
    return (
        stage1.groupBy(*key_cols)
        .agg(F.sum("_part").cast("long").alias(out_col))
    )

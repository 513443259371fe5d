"""MetricExtractor recast: N scalar reductions per group.

Parity target: ``MetricExtractor(functions=[...])`` applies arbitrary
numpy/scipy callables to a SeriesStim (``pliers/extractors/misc.py:
13-74``, including dotted-path resolution and ``subset_idx`` column
subsetting :58-68). Spark mapping: named built-in aggregates stay
JVM-side; arbitrary Python callables become GROUPED_AGG pandas UDFs
(Arrow-batched, per-group vectorized — never ``eval``'d strings,
callables only, dropping the reference's ``eval`` escape hatch by
design)."""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

BUILTIN_METRICS = {
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "std": F.stddev_samp,
    "count": F.count,
}


def entropy_expr(count_col: str) -> "F.Column":
    """Shannon entropy (nats) from per-category counts — pure SQL shape:
    H = ln(N) - sum(c*ln(c))/N ."""
    total = F.sum(count_col)
    return F.log(total.cast("double")) - F.sum(
        F.col(count_col).cast("double") * F.log(F.col(count_col).cast("double"))
    ) / total.cast("double")


def metric_extract(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    metrics: list[str] | None = None,
    custom: dict[str, Callable[[np.ndarray], float]] | None = None,
) -> DataFrame:
    """Apply named built-in + custom reductions per group.

    ``metrics`` name JVM aggregates from BUILTIN_METRICS; ``custom`` maps
    output-name → numpy callable (GROUPED_AGG pandas UDF)."""
    metrics = metrics or ["mean", "min", "max"]
    aggs = [BUILTIN_METRICS[m](value_col).alias(f"{value_col}_{m}") for m in metrics]
    for name, fn in (custom or {}).items():

        @pandas_udf("double")
        def _udf(v: pd.Series, fn=fn) -> float:
            return float(fn(v.to_numpy()))

        aggs.append(_udf(F.col(value_col)).alias(f"{value_col}_{name}"))
    return df.groupBy(*group_cols).agg(*aggs)


def categorical_entropy(df: DataFrame, group_cols: list[str], cat_col: str) -> DataFrame:
    """Per-group Shannon entropy of a categorical column (two-level agg:
    counts then entropy — both map-side combinable)."""
    counts = df.groupBy(*group_cols, cat_col).agg(F.count(F.lit(1)).alias("_c"))
    return counts.groupBy(*group_cols).agg(F.round(entropy_expr("_c"), 6).alias("entropy"))

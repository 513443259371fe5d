"""Result shaping: wide↔long feature frames and multi-extractor merge.

Recasts the reference's result model (SURVEY.md §1.2):

- ``to_long`` ≡ ``ExtractorResult.to_df(format='long')``: melt feature
  columns into (key..., feature, value) rows, dropping NULL values
  (``pliers/extractors/base.py:175-177`` melts and drops NaN).
- ``to_wide`` ≡ the wide pivot in ``merge_results``
  (``pliers/extractors/base.py:312-340``): long → one column per
  feature, clashes aggregated by mean ('mean' aggfunc, :324-326).
- ``merge_features`` ≡ ``merge_results(format='wide')`` done the
  Spark-native way: per-extractor frames **joined on the composite key**
  instead of union+pivot — schemas are static per stage, so an
  equi-join beats a pivot (no second shuffle for the pivot agg).
- feature namespacing ``extractor#feature`` mirrors
  ``pliers/extractors/base.py:308-310``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_long(df: DataFrame, key_cols: list[str], feature_cols: list[str], extractor: str | None = None) -> DataFrame:
    """Melt wide features to (key..., feature, value) long rows; NULL
    values dropped (reference drops NaN on melt)."""
    pairs = []
    for c in feature_cols:
        name = f"{extractor}#{c}" if extractor else c
        pairs.append(f"'{name}', cast(`{c}` as double)")
    stack_expr = f"stack({len(feature_cols)}, {', '.join(pairs)}) as (feature, value)"
    out = df.selectExpr(*[f"`{c}`" for c in key_cols], stack_expr)
    return out.where(F.col("value").isNotNull())


def to_wide(df: DataFrame, key_cols: list[str], feature_col: str = "feature", value_col: str = "value") -> DataFrame:
    """Pivot long rows back to wide; clashes → mean (reference aggfunc)."""
    return df.groupBy(*key_cols).pivot(feature_col).agg(F.mean(value_col))


def merge_features(frames: list[DataFrame], key_cols: list[str], how: str = "full") -> DataFrame:
    """Join per-extractor wide frames on the composite key — the
    Spark-native ``merge_results``. Keys appear once; feature columns
    accumulate. Full-outer by default (an extractor may skip rows)."""
    return reduce(lambda a, b: a.join(b, on=key_cols, how=how), frames)


def union_results(frames: list[DataFrame]) -> DataFrame:
    """UNION ALL of long frames (``pd.concat`` axis=0,
    ``pliers/extractors/base.py:303``)."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)

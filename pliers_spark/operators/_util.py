"""Shared helpers for temporal operators."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType


def is_timestamp(df: DataFrame, col: str) -> bool:
    return isinstance(df.schema[col].dataType, (TimestampType, TimestampNTZType))


def epoch_micros(df: DataFrame, col: str) -> Column:
    """Exact integer microseconds for timestamps (NTZ interpreted as UTC —
    sessions pin spark.sql.session.timeZone=UTC); pass-through µs scaling
    for numeric columns."""
    if is_timestamp(df, col):
        return F.unix_micros(F.col(col).cast("timestamp_ltz"))
    return (F.col(col).cast("double") * F.lit(1_000_000.0)).cast("long")


def epoch_seconds(df: DataFrame, col: str) -> Column:
    """Epoch seconds as double (µs-precise)."""
    if is_timestamp(df, col):
        return F.unix_micros(F.col(col).cast("timestamp_ltz")) / F.lit(1_000_000.0)
    return F.col(col).cast("double")

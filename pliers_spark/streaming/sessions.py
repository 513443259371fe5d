"""Structured Streaming twins of the batch temporal operators.

pliers has no streaming (SURVEY.md §1.4); the north rule's gap
sessionization maps naturally onto Structured Streaming's
``session_window`` with a watermark for late data. The batch operator
(``operators/temporal.sessionize``) and this streaming stage agree on
closed sessions — tested in tests/test_streaming.py with a file source
replay of the events table.

Scale notes: state is keyed by (entity, session window); the watermark
bounds state size — without it a 10^12-row stream accumulates unbounded
session state. Output mode 'append' emits each session exactly once,
when the watermark passes its close.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_session_bounds(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    gap: str = "6 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessions over a stream: one row per closed session
    (entity, session_start, session_end, n_events)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(entity_col))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(entity_col, "session_start", "session_end", "n_events")
    )


def streaming_windowed_counts(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling-window counts with late-data watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(entity_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            entity_col,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first-seen row per key, with the
    watermark bounding how long each key is remembered. The streaming
    twin of ``operators/dedup.exact_dedup`` — the shape of inline
    crawl-dedup (drop re-fetched pages as they arrive) where the batch
    job would re-scan the corpus.

    Scale notes: ``dropDuplicatesWithinWatermark`` keys the state store
    by the dedup key and evicts entries once the watermark passes —
    state stays O(keys-per-watermark-window), not O(stream). A duplicate
    arriving later than the watermark window is NOT dropped (by design:
    bounded state at 10^12 rows requires bounded memory of the past);
    route stragglers to the batch dedup in the daily compaction.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def streaming_enrich_latest(
    stream: DataFrame,
    dim: DataFrame,
    key_col: str,
    dim_ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Stream-static enrichment with the LATEST dimension row per key —
    the streaming face of the engine's as-of join (north rule): events
    arriving on a stream are joined to a static snapshot table, keeping
    for each key the dimension row with the greatest ``dim_ts_col``
    (the "current" version, i.e. the as-of answer for now-arriving
    events; full point-in-time history against a STREAM is batch
    territory — `operators/asof.py` — since a stream-side event must
    not wait for future dim versions).

    The dimension is reduced to one row per key with ``max_by`` (one
    small aggregation, no window sort) and Spark broadcasts it into
    every micro-batch — a stream-static equi-join, which Structured
    Streaming executes stateless (no watermark needed on the dim
    side). The dim DataFrame is re-read per micro-batch, so a snapshot
    table that gains a new version between batches enriches later
    events with the newer row, exactly Iceberg-style "current
    snapshot" semantics.
    """
    # ONE max_by over a struct of all value columns: per-column max_by
    # calls would resolve dim_ts ties independently and could stitch
    # together fields from two different dimension versions (row
    # tearing). The struct keeps the winning ROW atomic; which row wins
    # an exact-timestamp tie is still unspecified — version timestamps
    # are expected unique per key (append a sequence number when not).
    cols = ", ".join(value_cols)
    latest = dim.groupBy(key_col).agg(
        F.expr(f"max_by(struct({cols}), {dim_ts_col})").alias("_v"),
        F.max(dim_ts_col).alias("dim_ts"),
    ).select(key_col, *[F.col(f"_v.{c}").alias(c) for c in value_cols], "dim_ts")
    return stream.join(F.broadcast(latest), key_col, "left")

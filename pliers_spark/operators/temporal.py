"""Windowed temporal feature operators: lag/lead, ffill/backfill,
gap sessionization, leakage-safe rolling aggregates, resample grids,
running counts.

These are the north-rule additions (BASELINE.json) that pliers lacks;
their seeds in the reference are:

- ``resample``'s step-function forward-fill (``pliers/utils/base.py:218-223``:
  each value holds from its onset until its interval ends) → :func:`ffill`;
- ``WordCounterExtractor``'s cumulative count
  (``pliers/extractors/text.py:851-862``) → :func:`running_count`;
- ``FrameSamplingFilter(top_n)``'s lag-diff + rank
  (``pliers/filters/video.py:55-67``) → :func:`top_n_by_change`;
- ``object_id`` group-cumcount (``pliers/extractors/base.py:155-164``)
  → :func:`with_object_id`.

**Temporal-leakage discipline** (north rule: zero leakage): every frame
here ends at ``Window.currentRow`` — features never read rows with a
later timestamp. The only future-reading op is :func:`lead_features`,
which exists for label construction and is explicitly flagged.
All operators are pure Window/column expressions: one shuffle on the
partition key, then map-side computation — the plan scales linearly in
partitions and is skew-handled by AQE (hot keys are a data property;
for windowed ops we cannot salt without breaking frame continuity, so
hot entities are bounded by range-splitting in the as-of module).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from ._util import epoch_micros, epoch_seconds


def _entity_time_window(entity_cols: list[str], ts_col: str) -> WindowSpec:
    return Window.partitionBy(*entity_cols).orderBy(ts_col)


def lag_features(
    df: DataFrame, entity_cols: list[str], ts_col: str, value_col: str, lags: list[int]
) -> DataFrame:
    """Append ``{value_col}_lag{k}`` columns (past values only — leakage-safe)."""
    w = _entity_time_window(entity_cols, ts_col)
    for k in lags:
        df = df.withColumn(f"{value_col}_lag{k}", F.lag(value_col, k).over(w))
    return df


def lead_features(
    df: DataFrame, entity_cols: list[str], ts_col: str, value_col: str, leads: list[int]
) -> DataFrame:
    """Append ``{value_col}_lead{k}`` columns. **Reads the future** — only
    for label/target construction, never as model features (north rule)."""
    w = _entity_time_window(entity_cols, ts_col)
    for k in leads:
        df = df.withColumn(f"{value_col}_lead{k}", F.lead(value_col, k).over(w))
    return df


def ffill(df: DataFrame, entity_cols: list[str], ts_col: str, value_col: str, out_col: str | None = None) -> DataFrame:
    """Forward-fill nulls with the latest non-null earlier value.

    Generalizes the reference's step-function fill (value holds forward
    from its onset, ``pliers/utils/base.py:218-223``). Frame ends at
    currentRow ⇒ leakage-free.
    """
    w = _entity_time_window(entity_cols, ts_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col or f"{value_col}_ffill", F.last(value_col, ignorenulls=True).over(w))


def bfill(df: DataFrame, entity_cols: list[str], ts_col: str, value_col: str, out_col: str | None = None) -> DataFrame:
    """Backward-fill (next non-null later value). Future-reading by
    definition — flagged like :func:`lead_features`."""
    w = _entity_time_window(entity_cols, ts_col).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    return df.withColumn(out_col or f"{value_col}_bfill", F.first(value_col, ignorenulls=True).over(w))


def sessionize(
    df: DataFrame,
    entity_cols: list[str],
    ts_col: str,
    gap_seconds: float,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap since
    the previous event exceeds ``gap_seconds``. session_id is the running
    count of session starts (1-based) per entity.

    Batch twin of Structured Streaming's ``session_window`` (see
    ``streaming/sessions.py``). One shuffle on the entity key.
    """
    w = _entity_time_window(entity_cols, ts_col)
    secs = epoch_seconds(df, ts_col)
    prev = F.lag(secs).over(w)
    gap = secs - prev
    is_new = F.when(prev.isNull() | (gap > gap_seconds), F.lit(1)).otherwise(F.lit(0))
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_col, F.sum(is_new).over(wc))


def session_bounds(
    df: DataFrame, entity_cols: list[str], ts_col: str, gap_seconds: float
) -> DataFrame:
    """Sessionize then aggregate to one row per session:
    (entity, session_id, session_start, session_end, n_events)."""
    s = sessionize(df, entity_cols, ts_col, gap_seconds)
    return s.groupBy(*entity_cols, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def rolling_agg(
    df: DataFrame,
    entity_cols: list[str],
    ts_col: str,
    value_col: str,
    range_seconds: float,
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Time-range rolling aggregates over the trailing ``range_seconds``
    window **including** the current row (upper bound = currentRow ⇒ no
    leakage). ``aggs`` maps output-column → {'sum','avg','min','max','count'}.
    """
    aggs = aggs or {f"{value_col}_roll_sum": "sum", f"{value_col}_roll_cnt": "count"}
    w = (
        Window.partitionBy(*entity_cols)
        .orderBy(epoch_micros(df, ts_col))
        .rangeBetween(-int(range_seconds * 1_000_000), 0)
    )
    fns = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max, "count": F.count}
    for out, fn in aggs.items():
        df = df.withColumn(out, fns[fn](value_col).over(w))
    return df


def running_count(
    df: DataFrame,
    entity_cols: list[str],
    key_col: str,
    order_col: str,
    out_col: str = "word_count",
    log_scale: bool = False,
) -> DataFrame:
    """Running occurrence count of each key value up to the current
    position — WordCounterExtractor parity (case-folding is the caller's
    choice, matching ``case_sensitive``; cumcount+1 semantics of
    ``pliers/extractors/text.py:851-862``)."""
    w = (
        Window.partitionBy(*entity_cols, key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cnt = F.count(F.lit(1)).over(w)
    if log_scale:
        cnt = F.log(cnt.cast("double"))
    return df.withColumn(out_col, cnt)


def with_object_id(df: DataFrame, group_cols: list[str], order_col: str, out_col: str = "object_id") -> DataFrame:
    """0-based cumcount within group — disambiguates multiple objects at
    one onset (``pliers/extractors/base.py:155-164``)."""
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    return df.withColumn(out_col, F.row_number().over(w) - 1)


def top_n_by_change(
    df: DataFrame, entity_cols: list[str], ts_col: str, value_col: str, n: int
) -> DataFrame:
    """Per entity, the n rows with the largest absolute change from the
    previous row — FrameSamplingFilter(top_n) recast (lag-diff + rank,
    ``pliers/filters/video.py:55-67``). rank ≤ n instead of a global
    sort+limit so it stays one shuffle and scales per-entity."""
    w = _entity_time_window(entity_cols, ts_col)
    diff = F.abs(F.col(value_col) - F.lag(value_col).over(w))
    d = df.withColumn("_chg", diff).where(F.col("_chg").isNotNull())
    wr = Window.partitionBy(*entity_cols).orderBy(F.desc("_chg"), F.col(ts_col))
    return d.withColumn("_rk", F.row_number().over(wr)).where(F.col("_rk") <= n).drop("_rk")


def sample_every_nth(
    df: DataFrame, entity_cols: list[str], ts_col: str, n: int
) -> DataFrame:
    """Keep every n-th row per entity in time order —
    ``FrameSamplingFilter(every=n)``'s ``range(0, nframes, every)``
    selection (``pliers/filters/video.py:42-44``) generalized from video
    frames to crawl snapshots. One shuffle on the entity key; the modulo
    filter runs map-side after the window rank."""
    w = _entity_time_window(entity_cols, ts_col)
    return (
        df.withColumn("_rn", F.row_number().over(w) - 1)
        .where(F.col("_rn") % n == 0)
        .drop("_rn")
    )


def sample_per_period(
    df: DataFrame, entity_cols: list[str], ts_col: str, period: str = "hour"
) -> DataFrame:
    """First row per (entity, truncated-time bucket) —
    ``FrameSamplingFilter(hertz=h)``'s resample-to-rate selection
    (``pliers/filters/video.py:46-53``) recast for event time: the video
    filter keeps the frame at each 1/h-second tick; here we keep the
    earliest snapshot in each ``date_trunc(period)`` bucket. Single
    shuffle; ties broken deterministically by the full timestamp."""
    w = Window.partitionBy(*entity_cols, F.date_trunc(period, F.col(ts_col))).orderBy(ts_col)
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def temporal_trim(
    df: DataFrame, ts_col: str, start, end, rebase: bool = False
) -> DataFrame:
    """Keep rows with ``start <= ts < end`` — TemporalTrimmingFilter's
    subclip-[start,end] semantics (``pliers/filters/base.py:27-68``)
    lifted from one stim's sample axis to the table's event-time axis.
    ``rebase`` subtracts ``start`` (seconds) the way a subclip's frames
    are re-onset to 0. Pure predicate → pushed to the parquet scan."""
    out = df.where((F.col(ts_col) >= F.lit(start)) & (F.col(ts_col) < F.lit(end)))
    if rebase:
        us = lambda c: F.unix_micros(c.cast("timestamp_ltz"))
        out = out.withColumn(
            "rel_s",
            (us(F.col(ts_col)) - us(F.lit(start).cast("timestamp"))) / F.lit(1_000_000.0),
        )
    return out


def interpolate_linear(
    obs: DataFrame,
    grid: DataFrame,
    entity_cols: list[str],
    obs_ts: str,
    grid_ts: str,
    value_col: str,
    out_col: str = "value_interp",
) -> DataFrame:
    """Linear interpolation of ``value_col`` onto grid timestamps:
    v(t) = v0 + (v1 - v0) * (t - t0) / (t1 - t0) between the bracketing
    observations; NULL outside the observed range.

    Generalizes the reference ``resample``'s interp1d step
    (pliers/utils/base.py:235-239). **Reads one future point** (the
    upper bracket) by construction — offline/label use, flagged like
    :func:`lead_features`. Single union + one shuffle; prev via
    last-ignorenulls, next via first-ignorenulls over mirrored frames.
    """
    g = grid.select(
        *entity_cols,
        F.col(grid_ts).alias("_ts"),
        F.lit(1).alias("_is_grid"),
        F.lit(None).cast(obs.schema[value_col].dataType).alias("_v"),
    )
    o = obs.select(
        *entity_cols,
        F.col(obs_ts).alias("_ts"),
        F.lit(0).alias("_is_grid"),
        F.col(value_col).alias("_v"),
    )
    u = g.unionByName(o)
    secs = epoch_seconds(u, "_ts")
    u = u.withColumn("_s", secs)
    # obs rows sort before grid rows at equal ts → an exact-tie grid point
    # brackets to the observation itself on both sides.
    wb = (
        Window.partitionBy(*entity_cols)
        .orderBy(F.col("_s"), F.col("_is_grid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(*entity_cols)
        .orderBy(F.col("_s"), -F.col("_is_grid"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_v = F.last("_v", ignorenulls=True).over(wb)
    prev_s = F.last(F.when(F.col("_is_grid") == 0, F.col("_s")), ignorenulls=True).over(wb)
    next_v = F.first("_v", ignorenulls=True).over(wf)
    next_s = F.first(F.when(F.col("_is_grid") == 0, F.col("_s")), ignorenulls=True).over(wf)
    lerp = F.when(
        prev_s == next_s, prev_v
    ).otherwise(prev_v + (next_v - prev_v) * (F.col("_s") - prev_s) / (next_s - prev_s))
    out = (
        u.withColumn(out_col, F.when(prev_s.isNotNull() & next_s.isNotNull(), lerp))
        .where(F.col("_is_grid") == 1)
        .select(*entity_cols, F.col("_ts").alias(grid_ts), F.round(out_col, 6).alias(out_col))
    )
    return out


def resample_grid(
    df: DataFrame,
    entity_cols: list[str],
    ts_col: str,
    step_seconds: int,
) -> DataFrame:
    """Dense per-entity timestamp grid from min(ts) to max(ts) at a fixed
    step: ``sequence()`` + ``explode`` (generalizes the reference
    ``resample``'s target-rate grid, ``pliers/utils/base.py:235-239``).
    Values are then attached with an as-of join (operators/asof.py) —
    grid construction itself is one groupBy shuffle."""
    bounds = df.groupBy(*entity_cols).agg(F.min(ts_col).alias("_t0"), F.max(ts_col).alias("_t1"))
    grid = bounds.select(
        *entity_cols,
        F.explode(
            F.sequence(F.col("_t0"), F.col("_t1"), F.expr(f"INTERVAL {int(step_seconds)} SECONDS"))
        ).alias(ts_col),
    )
    return grid


def framed_agg(
    df: DataFrame,
    entity_cols: list[str],
    ts_col: str,
    value_col: str,
    frame_seconds: int,
    hop_seconds: int,
    origin: str = "2024-01-01 00:00:00",
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Overlapping frame/hop windowed aggregation — the Spark recast of
    the reference's STFT/librosa framing (frame_size window advanced by
    hop_size; ``pliers/extractors/audio.py:64-113,198-221``): frame ``i``
    covers ``[origin + i*hop, origin + i*hop + frame)``.

    Physical plan (scale path): instead of a range join of frames ×
    rows, each row is *exploded to the ≤ ceil(frame/hop) frame ids it
    belongs to* — a narrow bounded fan-out — then one hash aggregation
    on (entity, frame_id). No per-entity sort, no window state; at
    10^12 rows this is a single shuffle whose width is controlled by
    the frame/hop overlap factor. Rows before ``origin`` are dropped
    (frames are anchored at the origin, matching the reference's
    onset=i*hop indexing from clip start).
    """
    from ._util import epoch_seconds

    aggs = aggs or {"n_events": "count", f"{value_col}_sum": "sum"}
    off = epoch_seconds(df, ts_col) - F.unix_timestamp(
        F.to_timestamp(F.lit(origin))
    ).cast("double")
    i_max = F.floor(off / F.lit(float(hop_seconds))).cast("long")
    i_min = F.greatest(
        F.floor((off - F.lit(float(frame_seconds))) / F.lit(float(hop_seconds))).cast("long")
        + F.lit(1).cast("long"),
        F.lit(0).cast("long"),
    )
    exploded = (
        df.where(off >= 0)
        .withColumn("_frame_id", F.explode(F.sequence(i_min, i_max)))
    )
    fns = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max, "count": F.count}
    return exploded.groupBy(*entity_cols, F.col("_frame_id").alias("frame_id")).agg(
        *[fns[fn](value_col).alias(out) for out, fn in aggs.items()]
    )

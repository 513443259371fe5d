"""Point-in-time (as-of) join — the engine's core operator.

Semantics (north rule, BASELINE.json): for each spine row
``(entity, t)``, attach the value columns of the **latest** right-side
row with ``right_ts <= t`` (inclusive tie — matches the reference's
step-fill, which holds a value from its onset forward:
``pliers/utils/base.py:221-223``, i.e. ``allow_exact_matches=True``).
No right row at or before ``t`` → NULLs (left-outer).

Two physical strategies, chosen for Spark's execution model:

1. :func:`asof_join` (default) — **union + window forward-fill**, pure
   JVM. Tag both sides, ``unionByName``, one shuffle on the entity key,
   sort within partition by ``(ts, side)`` (right rows sort before spine
   rows at equal ts ⇒ inclusive match), ``last(value, ignorenulls=True)``
   over an unbounded-preceding frame, then keep spine rows. Properties:
   - exactly ONE shuffle, no Python boundary, whole-stage codegen;
   - no join explosion: cost is O((|L|+|R|) log within-partition);
   - skew: a hot entity is one sort group, not a join blow-up; AQE
     handles partition-level imbalance, :func:`detect_heavy_hitters`
     reports entities that need time-range splitting.

2. :func:`asof_join_cogroup` — ``groupBy().cogroup().applyInPandas``
   with a per-group ``pandas.merge_asof`` (the sort-merge formulation
   the north rule names). Arrow-vectorized, never per-row Python. Used
   as the differential-testing twin of strategy 1 and for carrying many
   value columns at once through one pass.

At 100 TB: the right side (pages) is bucketed/sorted by
``(entity, ts)`` at write time (see ``plans/layout.py`` notes); both
strategies then shuffle only the (much smaller) spine, or nothing when
bucket schemes align.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    spine: DataFrame,
    right: DataFrame,
    entity_cols: list[str],
    spine_ts: str,
    right_ts: str,
    value_cols: list[str],
    matched_ts_col: str | None = "matched_ts",
) -> DataFrame:
    """Union + window-ffill as-of join (JVM-only, one shuffle).

    Returns the spine columns plus ``value_cols`` (latest as-of values)
    and optionally the matched right timestamp.
    """
    spine_extra = [c for c in spine.columns if c not in entity_cols and c != spine_ts]

    left_tagged = spine.select(
        *entity_cols,
        F.col(spine_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # spine sorts after right rows at equal ts
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
        *[F.col(c) for c in spine_extra],
    )
    right_tagged = right.select(
        *entity_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
        F.col(right_ts).alias("_rts"),
        *[F.lit(None).cast(spine.schema[c].dataType).alias(c) for c in spine_extra],
    )

    unioned = left_tagged.unionByName(right_tagged)
    w = (
        Window.partitionBy(*entity_cols)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ROW-ATOMIC fill (r5 review fix): take the latest right ROW as one
    # struct, then project its fields. Per-column last(ignorenulls) would
    # resurrect each column's latest NON-NULL value when a right value
    # column is null — mixing columns from different right rows and
    # disagreeing with merge_asof / the cogroup twin. The struct is null
    # exactly for spine rows (side 1), so ignorenulls skips only those;
    # a right row whose value fields are null is still a non-null struct
    # and correctly shadows older rows.
    row = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col("_rts").alias("_rts"),
            *[F.col(f"_v_{c}").alias(c) for c in value_cols],
        ),
    )
    last_row = F.last(row, ignorenulls=True).over(w)
    filled = unioned.select(
        *entity_cols,
        F.col("_ts"),
        F.col("_side"),
        *spine_extra,
        *[last_row[c].alias(c) for c in value_cols],
        last_row["_rts"].alias("_matched_ts"),
    )
    out = filled.where(F.col("_side") == 1).drop("_side")
    out = out.withColumnRenamed("_ts", spine_ts)
    if matched_ts_col:
        out = out.withColumnRenamed("_matched_ts", matched_ts_col)
    else:
        out = out.drop("_matched_ts")
    return out


def asof_join_directional(
    spine: DataFrame,
    right: DataFrame,
    entity_cols: list[str],
    spine_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    matched_ts_col: str | None = "matched_ts",
) -> DataFrame:
    """Union + window as-of join with pandas ``merge_asof`` direction
    and tolerance semantics — same ONE-shuffle/no-Python shape as
    :func:`asof_join`, generalized:

    - ``backward`` (default): latest right row with ``rt <= t``;
    - ``forward``: earliest right row with ``rt >= t``;
    - ``nearest``: whichever side is closer in absolute time,
      ties (equal distance) resolved to the BACKWARD row — and an
      exact-timestamp match is distance 0 on the backward side, so
      inclusivity is automatic.

    ``tolerance_seconds`` nulls the value columns (and matched ts) when
    the chosen match is farther than the bound — pandas' ``tolerance``.
    All distance arithmetic is exact integer microseconds
    (``_util.epoch_micros``), never floats.

    Physical shape: both directions come from TWO window frames over
    the SAME per-entity sort (unbounded-preceding last + unbounded-
    following first) — still exactly one shuffle, still whole-stage
    codegen; ``nearest`` costs one extra window function, not an extra
    exchange. Tie ordering puts right rows before spine rows, which
    makes the preceding frame inclusive and the following frame
    exclusive at equal ts: correct for ``backward`` and ``nearest``;
    for ``forward`` the tag flips so the following frame is inclusive.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction}")
    spine_extra = [c for c in spine.columns if c not in entity_cols and c != spine_ts]
    # right rows sort before spine rows at equal ts for backward/nearest
    # (inclusive preceding frame); after them for forward (inclusive
    # following frame).
    right_side, spine_side = (0, 1) if direction != "forward" else (1, 0)

    left_tagged = spine.select(
        *entity_cols,
        F.col(spine_ts).alias("_ts"),
        F.lit(spine_side).alias("_side"),
        F.lit(1).alias("_is_spine"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
        *[F.col(c) for c in spine_extra],
    )
    right_tagged = right.select(
        *entity_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(right_side).alias("_side"),
        F.lit(0).alias("_is_spine"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
        F.col(right_ts).alias("_rts"),
        *[F.lit(None).cast(spine.schema[c].dataType).alias(c) for c in spine_extra],
    )
    unioned = left_tagged.unionByName(right_tagged)
    from ._util import epoch_micros

    us = epoch_micros(unioned, "_ts")
    order = Window.partitionBy(*entity_cols).orderBy(F.col("_ts"), F.col("_side"))
    w_back = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    # row-atomic candidate rows on both frames (same rationale as
    # asof_join): the struct is null for spine rows only, so each
    # direction picks WHOLE right rows, never a per-column mix.
    rrow = F.when(
        F.col("_is_spine") == 0,
        F.struct(
            F.col("_rts").alias("_rts"),
            epoch_micros(unioned, "_rts").alias("_rus"),
            *[F.col(f"_v_{c}").alias(c) for c in value_cols],
        ),
    )
    cols = [*entity_cols, F.col("_ts"), F.col("_is_spine"), *spine_extra, us.alias("_us")]
    if direction in ("backward", "nearest"):
        b_row = F.last(rrow, ignorenulls=True).over(w_back)
        cols += [b_row[c].alias(f"_b_{c}") for c in value_cols]
        cols.append(b_row["_rts"].alias("_b_rts"))
        cols.append(b_row["_rus"].alias("_b_us"))
    if direction in ("forward", "nearest"):
        f_row = F.first(rrow, ignorenulls=True).over(w_fwd)
        cols += [f_row[c].alias(f"_f_{c}") for c in value_cols]
        cols.append(f_row["_rts"].alias("_f_rts"))
        cols.append(f_row["_rus"].alias("_f_us"))
    filled = unioned.select(*cols).where(F.col("_is_spine") == 1).drop("_is_spine")

    if direction == "backward":
        use_back = F.lit(True)
        dist = F.col("_us") - F.col("_b_us")
    elif direction == "forward":
        use_back = F.lit(False)
        dist = F.col("_f_us") - F.col("_us")
    else:
        b_dist = F.col("_us") - F.col("_b_us")
        f_dist = F.col("_f_us") - F.col("_us")
        use_back = F.col("_b_us").isNotNull() & (
            F.col("_f_us").isNull() | (b_dist <= f_dist)
        )
        dist = F.when(use_back, b_dist).otherwise(f_dist)

    within = F.lit(True) if tolerance_seconds is None else (
        dist <= F.lit(int(round(tolerance_seconds * 1_000_000)))
    )
    keep = within & dist.isNotNull()

    def pick(prefix_b: str, prefix_f: str):
        if direction == "backward":
            return F.col(prefix_b)
        if direction == "forward":
            return F.col(prefix_f)
        return F.when(use_back, F.col(prefix_b)).otherwise(F.col(prefix_f))

    out_cols = [*entity_cols, F.col("_ts").alias(spine_ts), *spine_extra]
    out_cols += [
        F.when(keep, pick(f"_b_{c}", f"_f_{c}")).alias(c) for c in value_cols
    ]
    if matched_ts_col:
        out_cols.append(F.when(keep, pick("_b_rts", "_f_rts")).alias(matched_ts_col))
    return filled.select(*out_cols)


def asof_join_cogroup(
    spine: DataFrame,
    right: DataFrame,
    entity_cols: list[str],
    spine_ts: str,
    right_ts: str,
    value_cols: list[str],
    num_buckets: int | None = None,
    matched_ts_col: str | None = None,
) -> DataFrame:
    """Sort-merge as-of join via cogrouped ``applyInPandas`` +
    ``pandas.merge_asof`` over **entity-hash buckets** (the north rule's
    url-hash-bucketed sort-merge, literally).

    The cogroup key is ``pmod(xxhash64(entity), num_buckets)`` — NOT the
    raw entity: per-entity groups would mean millions of tiny Arrow
    batches whose per-group scheduling/serialization overhead dwarfs the
    merge (measured 4x slower at sf0.1). One bucket holds many entities;
    inside it a single vectorized ``merge_asof(by=entity)`` handles the
    per-entity alignment at C speed. ``num_buckets`` defaults to the
    session's shuffle partitions (one Arrow group per task).
    """
    import pandas as pd

    spine_fields = [spine.schema[c] for c in spine.columns]
    out_fields = spine_fields + [right.schema[c] for c in value_cols]
    from pyspark.sql.types import StructField, StructType

    if matched_ts_col:
        # the matched event timestamp rides along from merge_asof's
        # right_on column — no second as-of pass needed for it
        ts_field = right.schema[right_ts]
        out_fields = out_fields + [StructField(matched_ts_col, ts_field.dataType, True)]
    out_schema = StructType(out_fields)
    out_names = [f.name for f in out_fields]

    if num_buckets is None:
        num_buckets = int(spine.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    bucket = F.pmod(F.xxhash64(*entity_cols), F.lit(num_buckets)).alias("_bucket")

    def merge(left_pdf: pd.DataFrame, right_pdf: pd.DataFrame) -> pd.DataFrame:
        if left_pdf.empty:
            return pd.DataFrame(columns=out_names)
        # merge_asof(by=...) requires both frames sorted on the `on` key
        left_sorted = left_pdf.sort_values(spine_ts, kind="mergesort")
        if right_pdf.empty:
            res = left_sorted.copy()
            for c in value_cols:
                res[c] = None
            if matched_ts_col:
                res[matched_ts_col] = pd.NaT
            return res[out_names]
        right_sorted = right_pdf[entity_cols + [right_ts] + value_cols].sort_values(
            right_ts, kind="mergesort"
        )
        on_col = right_ts
        if matched_ts_col:
            # pre-rename so the matched timestamp survives the merge even
            # when spine and right share a ts column name
            right_sorted = right_sorted.rename(columns={right_ts: matched_ts_col})
            on_col = matched_ts_col
        merged = pd.merge_asof(
            left_sorted,
            right_sorted,
            left_on=spine_ts,
            right_on=on_col,
            by=entity_cols,
            allow_exact_matches=True,  # inclusive tie: warc_ts <= t
            direction="backward",
        )
        return merged[out_names]

    left_g = spine.withColumn("_bucket", bucket).groupBy("_bucket")
    right_g = right.withColumn("_bucket", bucket).groupBy("_bucket")
    return left_g.cogroup(right_g).applyInPandas(merge, schema=out_schema)


def detect_heavy_hitters(
    df: DataFrame, entity_cols: list[str], threshold_rows: int = 1_000_000
) -> DataFrame:
    """Pre-pass heavy-hitter census: entities whose row count would
    overwhelm a single window/cogroup task (hot domains in the crawl).
    Cheap count-aggregate; callers route these through
    :func:`asof_join_split` (time-range splitting) instead of salting —
    salting would break as-of continuity."""
    return (
        df.groupBy(*entity_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .where(F.col("n_rows") >= threshold_rows)
    )


def asof_join_split(
    spine: DataFrame,
    right: DataFrame,
    entity_cols: list[str],
    spine_ts: str,
    right_ts: str,
    value_cols: list[str],
    split_seconds: float,
) -> DataFrame:
    """Skew-defused as-of join for hot entities: augment the partition
    key with a coarse time chunk so one hot entity spreads over many
    tasks, while correctness across chunk boundaries is preserved by
    replicating each chunk's **last row per value** into the next chunk
    (boundary carry). Two narrow passes + one shuffle on
    (entity, chunk) — the standard range-split pattern for windowed skew.
    """
    from ._util import epoch_seconds

    r = right.withColumn(
        "_chunk", F.floor(epoch_seconds(right, right_ts) / F.lit(float(split_seconds))).cast("long")
    )
    s = spine.withColumn(
        "_chunk", F.floor(epoch_seconds(spine, spine_ts) / F.lit(float(split_seconds))).cast("long")
    )

    # Boundary carry, exact for arbitrarily sparse right sides: the latest
    # right row of each (entity, chunk) — a chunk-level table ~|entities|×
    # |chunks| rows, tiny next to the fact tables — is as-of joined to the
    # spine's chunk set so every spine chunk knows the latest right row from
    # any STRICTLY EARLIER chunk (availability key = chunk + 1).
    w_last = Window.partitionBy(*entity_cols, "_chunk").orderBy(F.desc(right_ts))
    last_per_chunk = (
        r.withColumn("_rn", F.row_number().over(w_last)).where(F.col("_rn") == 1).drop("_rn")
    )
    avail = last_per_chunk.withColumn("_avail", F.col("_chunk") + 1).drop("_chunk")
    spine_chunks = s.select(*entity_cols, "_chunk").distinct()
    carried = asof_join(
        spine_chunks.withColumn("_sc", F.col("_chunk")),
        avail,
        entity_cols,
        "_chunk",
        "_avail",
        value_cols + [right_ts],
        matched_ts_col=None,
    )
    carried_rows = (
        carried.where(F.col(right_ts).isNotNull())
        .select(*entity_cols, F.col("_sc").alias("_chunk"), F.col(right_ts), *value_cols)
    )

    r_aug = r.select(*entity_cols, "_chunk", right_ts, *value_cols).unionByName(carried_rows)
    out = asof_join(
        s,
        r_aug,
        entity_cols + ["_chunk"],
        spine_ts,
        right_ts,
        value_cols,
    )
    return out.drop("_chunk")

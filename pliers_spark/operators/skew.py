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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._util import epoch_micros, epoch_seconds


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


def lag1_timesplit(
    df: DataFrame,
    entity_cols: list[str],
    ts_col: str,
    value_col: str,
    bucket_seconds: int,
    out_col: str | None = None,
) -> DataFrame:
    """Skew-defused lag-1: exactly ``F.lag(value).over(partitionBy(entity)
    .orderBy(ts))`` but with the hot entity's timeline **split into time
    buckets** so no single task owns a hot domain's whole history.

    The as-of skew path (operators/asof.py::asof_join_split) solves this
    for joins; windowed features have the same failure mode — a domain
    with 10^8 snapshots makes `partitionBy(url)` a straggler. Remedy
    (SURVEY.md §7.3: "windowed stages need range-splitting by warc_ts
    with boundary overlap"):

    1. lag within (entity, time_bucket) — parallel across buckets;
    2. per (entity, bucket): one `max_by` row (the bucket's last value)
       — a partial-aggregating shuffle to a frame with ONE row per
       (entity, bucket), where a window by entity is trivially cheap;
    3. the first row of each bucket takes the previous non-empty
       bucket's last value (empty buckets never materialize, so
       `lag` over the per-bucket frame IS the previous non-empty one).

    Exactness requires ``ts`` unique per entity (the engine's snapshot
    tables guarantee it; equality vs the plain window is pinned by a
    driver oracle and tests). Generalizes to lag-k by carrying the last
    k rows per bucket (array agg) — k=1 is the flagship's need.
    """
    out_col = out_col or f"{value_col}_lag1"
    # µs-precise bucketing (unix_timestamp truncates to whole seconds and
    # would mis-bucket sub-second data — see operators/_util.epoch_micros)
    b = F.floor(epoch_micros(df, ts_col) / F.lit(bucket_seconds * 1_000_000)).alias("_tb")
    dfb = df.withColumn("_tb", b)

    w_in = Window.partitionBy(*entity_cols, "_tb").orderBy(ts_col)
    lag_in = F.lag(value_col).over(w_in)

    tails = dfb.groupBy(*entity_cols, "_tb").agg(
        F.max_by(value_col, ts_col).alias("_last_val")
    )
    w_t = Window.partitionBy(*entity_cols).orderBy("_tb")
    prev_tail = tails.withColumn("_prev_val", F.lag("_last_val").over(w_t)).drop("_last_val")

    # substitute the carried value ONLY on the bucket's first row — a null
    # *value* lagged mid-bucket must stay null (coalesce would corrupt it)
    out = (
        dfb.withColumn("_lag_in", lag_in)
        .withColumn("_rn_in", F.row_number().over(w_in))
        .join(prev_tail, entity_cols + ["_tb"], "left")
        .withColumn(
            out_col,
            F.when(F.col("_rn_in") == 1, F.col("_prev_val")).otherwise(F.col("_lag_in")),
        )
        .drop("_tb", "_lag_in", "_rn_in", "_prev_val")
    )
    return out


def sessionize_timesplit(
    df: DataFrame,
    entity_cols: list[str],
    ts_col: str,
    gap_seconds: float,
    bucket_seconds: int,
    session_col: str = "session_id",
) -> DataFrame:
    """Skew-defused gap sessionization: exactly
    ``temporal.sessionize`` (1-based running count of session starts per
    entity) but with the hot entity's history split across time buckets.

    A running sum is prefix-dependent, so the split is two-level
    (the classic scan decomposition):

    1. within (entity, bucket): session-start flags — the first row of a
       bucket compares against the PREVIOUS bucket's last timestamp,
       carried through a one-row-per-bucket frame (same carry as
       ``lag1_timesplit``); then a within-bucket running sum;
    2. per (entity, bucket): total new sessions in the bucket; an
       exclusive cumulative sum over the tiny bucket-level frame gives
       each bucket's session-id offset;
    3. session_id = bucket offset + within-bucket running count.

    Equality with the plain window is pinned by the `sessionize_split`
    driver oracle and a unit test.
    """
    # µs-precise seconds: gap comparison must see sub-second deltas exactly,
    # matching temporal.sessionize (unix_timestamp truncates to whole seconds)
    secs = epoch_seconds(df, ts_col)
    dfb = df.withColumn("_tb", F.floor(secs / F.lit(bucket_seconds)))

    w_in = Window.partitionBy(*entity_cols, "_tb").orderBy(ts_col)
    prev_in = F.lag(secs).over(w_in)

    # carry: previous non-empty bucket's last event time per entity
    tails = dfb.groupBy(*entity_cols, "_tb").agg(F.max(secs).alias("_last_s"))
    w_t = Window.partitionBy(*entity_cols).orderBy("_tb")
    carry = tails.withColumn("_prev_s", F.lag("_last_s").over(w_t)).drop("_last_s")

    flagged = (
        dfb.join(carry, entity_cols + ["_tb"], "left")
        .withColumn("_prev", F.coalesce(prev_in, F.col("_prev_s")))
        .withColumn(
            "_is_new",
            F.when(
                F.col("_prev").isNull() | ((secs - F.col("_prev")) > gap_seconds), F.lit(1)
            ).otherwise(F.lit(0)),
        )
    )
    run_in = F.sum("_is_new").over(w_in.rowsBetween(Window.unboundedPreceding, Window.currentRow))

    # bucket-level offsets: exclusive prefix sum of per-bucket new-session counts
    per_bucket = flagged.groupBy(*entity_cols, "_tb").agg(F.sum("_is_new").alias("_n_new"))
    w_off = Window.partitionBy(*entity_cols).orderBy("_tb").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_bucket.withColumn(
        "_off", F.coalesce(F.sum("_n_new").over(w_off), F.lit(0))
    ).drop("_n_new")

    out = (
        flagged.withColumn("_run_in", run_in)
        .join(offsets, entity_cols + ["_tb"], "left")
        .withColumn(session_col, (F.col("_off") + F.col("_run_in")).cast("long"))
        .drop("_tb", "_prev_s", "_prev", "_is_new", "_run_in", "_off")
    )
    return out


def ffill_timesplit(
    df: DataFrame,
    entity_cols: list[str],
    ts_col: str,
    value_col: str,
    bucket_seconds: int,
    out_col: str | None = None,
) -> DataFrame:
    """Skew-defused forward-fill: exactly ``temporal.ffill`` (latest
    non-null earlier value, frame ends at currentRow) with the hot
    entity's timeline split across time buckets.

    Carry construction: per (entity, bucket) take the bucket's last
    NON-NULL value (``max_by`` over the non-null subset); a bucket can
    be all-null, so the carry itself forward-fills over the tiny
    one-row-per-bucket frame before shifting to the next bucket. Within
    a bucket, ``coalesce(ffill_in, carry)`` is exact because ffill_in
    is null precisely on the prefix of rows before the bucket's first
    non-null value — the rows whose answer lives in an earlier bucket.
    """
    out_col = out_col or f"{value_col}_ffill"
    secs = epoch_seconds(df, ts_col)
    dfb = df.withColumn("_tb", F.floor(secs / F.lit(bucket_seconds)))

    w_in = Window.partitionBy(*entity_cols, "_tb").orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ffill_in = F.last(value_col, ignorenulls=True).over(w_in)

    # bucket's last non-null value (null when the bucket is all-null)
    tails = dfb.groupBy(*entity_cols, "_tb").agg(
        F.max_by(value_col, F.when(F.col(value_col).isNotNull(), F.col(ts_col))).alias(
            "_last_nn"
        )
    )
    # forward-fill the carry itself across buckets, then shift by one:
    # carry(b) = last non-null value in any bucket strictly before b
    w_t = (
        Window.partitionBy(*entity_cols)
        .orderBy("_tb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = tails.withColumn(
        "_carry", F.last("_last_nn", ignorenulls=True).over(w_t)
    ).drop("_last_nn")

    out = (
        dfb.withColumn("_ffill_in", ffill_in)
        .join(carry, entity_cols + ["_tb"], "left")
        .withColumn(out_col, F.coalesce(F.col("_ffill_in"), F.col("_carry")))
        .drop("_tb", "_ffill_in", "_carry")
    )
    return out


def rolling_timesplit(
    df: DataFrame,
    entity_cols: list[str],
    ts_col: str,
    value_col: str,
    range_seconds: float,
    bucket_seconds: int,
    aggs: dict[str, str] | None = None,
) -> DataFrame:
    """Skew-defused trailing time-range rolling aggregates: exactly
    ``temporal.rolling_agg`` (frame = [ts - range_seconds, ts], no
    future rows) with the hot entity's timeline split across time
    buckets via **ghost rows** — the union-split trick of
    ``asof.asof_join_split`` applied to windows:

    rows in the last ``range_seconds`` of a bucket also contribute to
    the next bucket's leading rows, so each such row is duplicated into
    the next bucket as a contributor-only ghost (``_ghost=1``); the
    range frame inside (entity, bucket) then sees every in-range
    predecessor, and ghosts are dropped from the output. Exact for any
    contribution-only aggregate (sum/count/min/max/avg via sum+count).
    Requires ``range_seconds <= bucket_seconds`` (one-bucket reach);
    chain k ghost unions for longer ranges.
    """
    if range_seconds > bucket_seconds:
        raise ValueError("range_seconds must be <= bucket_seconds (one-bucket ghost reach)")
    aggs = aggs or {f"{value_col}_roll_sum": "sum", f"{value_col}_roll_cnt": "count"}

    # microsecond integer ordering key (rangeBetween needs long bounds;
    # micros also preserve sub-second timestamps exactly — unix_timestamp
    # would truncate to seconds and leak same-second FUTURE rows into the frame)
    us = epoch_micros(df, ts_col)
    base = df.withColumn("_us", us).withColumn(
        "_tb", F.floor(F.col("_us") / F.lit(bucket_seconds * 1_000_000))
    )
    ghosts = (
        base.where(
            F.col("_us")
            >= (F.col("_tb") + 1) * F.lit(bucket_seconds * 1_000_000)
            - F.lit(int(range_seconds * 1_000_000))
        )
        .withColumn("_tb", F.col("_tb") + 1)
        .withColumn("_ghost", F.lit(1))
    )
    both = base.withColumn("_ghost", F.lit(0)).unionByName(ghosts)

    w = (
        Window.partitionBy(*entity_cols, "_tb")
        .orderBy("_us")
        .rangeBetween(-int(range_seconds * 1_000_000), 0)
    )
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max, "avg": F.avg}
    out = both
    for out_col, fn in aggs.items():
        out = out.withColumn(out_col, fns[fn](value_col).over(w))
    return out.where(F.col("_ghost") == 0).drop("_us", "_tb", "_ghost")

"""Plan-level leakage linter (plans/leakage.py): audits the optimized
plan's window frames — the enforcement mechanism behind the north
rule's zero-temporal-leakage requirement (complementing the behavioral
test in tests/test_temporal.py::test_zero_temporal_leakage)."""

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pliers_spark.plans.leakage import LeakageError, assert_leakage_free, audit_window_frames


@pytest.fixture(scope="module")
def series(spark):
    rows = [("a", dt.datetime(2024, 1, 1) + dt.timedelta(hours=i), float(i)) for i in range(6)]
    return spark.createDataFrame(rows, "url string, ts timestamp, v double")


def _w(series):
    return Window.partitionBy("url").orderBy("ts")


def test_safe_frames_pass(series):
    w = _w(series).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df = (
        series.withColumn("run_sum", F.sum("v").over(w))
        .withColumn("prev", F.lag("v", 1).over(_w(series)))
        .withColumn(
            "wk",
            F.sum("v").over(
                Window.partitionBy("url")
                .orderBy(F.col("ts").cast("long"))
                .rangeBetween(-7 * 86400, 0)
            ),
        )
    )
    assert audit_window_frames(df) == []
    assert_leakage_free(df)


def test_future_frame_flagged(series):
    df = series.withColumn(
        "fut", F.sum("v").over(_w(series).rowsBetween(Window.currentRow, 5))
    )
    finds = audit_window_frames(df)
    assert [f.column for f in finds] == ["fut"]
    assert finds[0].kind == "future_frame"
    with pytest.raises(LeakageError, match="fut"):
        assert_leakage_free(df)


def test_unbounded_following_flagged(series):
    df = series.withColumn(
        "fut",
        F.max("v").over(_w(series).rowsBetween(Window.currentRow, Window.unboundedFollowing)),
    )
    assert [f.kind for f in audit_window_frames(df)] == ["future_frame"]


def test_lead_requires_explicit_allowlist(series):
    df = series.withColumn("next_v", F.lead("v", 1).over(_w(series)))
    finds = audit_window_frames(df)
    assert [(f.column, f.kind) for f in finds] == [("next_v", "lead")]
    with pytest.raises(LeakageError):
        assert_leakage_free(df)  # not flagged by caller -> error
    assert_leakage_free(df, allow_lead={"next_v"})
    assert_leakage_free(df, allow_lead=True)


def test_engine_temporal_operators_are_clean(spark, series):
    from pliers_spark.operators.temporal import (
        ffill,
        lag_features,
        lead_features,
        rolling_agg,
        sessionize,
    )

    df = sessionize(series, ["url"], "ts", gap_seconds=3600)
    df = lag_features(df, ["url"], "ts", "v", lags=[1, 2])
    df = rolling_agg(df, ["url"], "ts", "v", range_seconds=86400)
    df = ffill(df, ["url"], "ts", "v")
    assert_leakage_free(df)

    labeled = lead_features(df, ["url"], "ts", "v", leads=[1])
    with pytest.raises(LeakageError):
        assert_leakage_free(labeled)  # lead must be explicitly flagged
    assert_leakage_free(labeled, allow_lead={"v_lead1"})


def test_training_matrix_passes_the_leakage_audit(spark):
    """The point-in-time training matrix survives the optimized-plan
    window audit: no frame reaches past the current row."""
    from pliers_spark.queries import QUERIES

    df = QUERIES["training_matrix"](spark, "/root/testdata/sf0.001")
    assert_leakage_free(df)
    assert df.count() > 0

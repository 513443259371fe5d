"""Batch 48: 2-D skyline, Youden threshold, event debouncing."""

import os
from datetime import datetime, timedelta


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


EVENTS = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_skyline_hand_points(spark, tmp_path):
    """(price, size): (1,5) and (2,9) are Pareto; (3,9) is dominated by
    (2,9); (2,4) dominated by (1,5); equal undominated twins both stay."""
    from pliers_spark.queries import QUERIES

    rows = [
        (1, "n", "b", "t", 5, 0.01),
        (2, "n", "b", "t", 9, 0.02),
        (3, "n", "b", "t", 9, 0.03),
        (4, "n", "b", "t", 4, 0.02),
        (5, "n", "b", "t", 9, 0.02),  # twin of part 2
    ]
    sf = _write(
        spark, tmp_path, "part", rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size long, p_retailprice double",
    )
    out = {r.p_partkey for r in QUERIES["skyline_2d"](spark, sf).collect()}
    assert out == {1, 2, 5}


def test_youden_perfect_separation(spark, tmp_path):
    """Positives all score above negatives: the optimal threshold sits at
    the lowest positive score with J = 1."""
    from pliers_spark.queries import QUERIES

    rows = [(i, datetime(2024, 1, 1), 1, "error" if i < 5 else "view",
             100.0 + i if i < 5 else 10.0 + i, "") for i in range(20)]
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["youden_threshold"](spark, sf).collect()[0]
    assert r.youden_j == 1.0 and r.tpr == 1.0 and r.fpr == 0.0
    assert r.threshold_fp == round(100.0 * 1e6)  # lowest positive score
    assert r.tp == 5 and r.fp == 0


def test_debounce_collapses_bursts(spark, tmp_path):
    """Three clicks within 5s collapse to one burst of 3; a fourth click
    7s later opens a new burst; other types are independent."""
    from pliers_spark.queries import QUERIES

    t0 = datetime(2024, 1, 1)
    rows = [
        (0, t0, 1, "click", 1.0, ""),
        (1, t0 + timedelta(seconds=2), 1, "click", 1.0, ""),
        (2, t0 + timedelta(seconds=4), 1, "click", 1.0, ""),
        (3, t0 + timedelta(seconds=11), 1, "click", 1.0, ""),
        (4, t0 + timedelta(seconds=1), 1, "view", 1.0, ""),
    ]
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = QUERIES["debounce_events"](spark, sf).collect()
    clicks = sorted([r for r in out if r.event_type == "click"], key=lambda r: r.burst_id)
    assert len(clicks) == 2
    assert clicks[0].n_events == 3 and clicks[0].span_us == 4_000_000
    assert clicks[1].n_events == 1 and clicks[1].span_us == 0
    views = [r for r in out if r.event_type == "view"]
    assert len(views) == 1 and views[0].n_events == 1

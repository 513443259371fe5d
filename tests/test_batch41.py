"""Batch 41: deleted interpolation, RMST, PR-AUC."""

import math
import os
from datetime import datetime, timedelta


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"
EVENTS = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_deleted_interpolation_prefers_bigram_on_deterministic_text(spark, tmp_path):
    """A rigid repeated phrase: bigram continuations are near-certain,
    so the bigram model wins most votes; lambdas sum to 1."""
    from pliers_spark.queries import QUERIES

    rows = [(i, "alpha beta gamma delta " * 10, "en", "A", 1) for i in range(5)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["deleted_interpolation"](spark, sf).collect()[0]
    assert r.v_uni + r.v_bi > 0
    assert r.lambda_bi > 0.9
    assert abs(r.lambda_uni + r.lambda_bi - 1.0) < 2e-6


def test_rmst_all_convert_day_zero(spark, tmp_path):
    """Everyone purchases within the first day -> survival collapses
    after day 0 -> RMST = 1.0 (only day 0 survived at S=1)."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    for u in range(10):
        t0 = datetime(2024, 1, 1, 8)
        rows.append((eid, t0, u, "view", 1.0, "")); eid += 1
        rows.append((eid, t0 + timedelta(hours=2), u, "purchase", 1.0, "")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["rmst"](spark, sf).collect()[0]
    assert r.n_entities == 10
    assert r.rmst_days == 1.0 and r.survival_end == 0.0


def test_rmst_no_conversion_full_survival(spark, tmp_path):
    """No purchases and observation spanning 30+ days -> survival stays
    1.0 every day -> RMST = 30."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    for u in range(5):
        rows.append((eid, datetime(2024, 1, 1), u, "view", 1.0, "")); eid += 1
        rows.append((eid, datetime(2024, 2, 15), u, "view", 1.0, "")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["rmst"](spark, sf).collect()[0]
    assert r.horizon_days == 30 and r.rmst_days == 30.0 and r.survival_end == 1.0


def test_pr_auc_perfect_and_worst(spark, tmp_path):
    """All positives scored above all negatives -> AP = 1; positives at
    the very bottom -> AP = textbook value sum(i/(n_neg+i))/n_pos."""
    from pliers_spark.queries import QUERIES

    rows = [(i, datetime(2024, 1, 1), 1, "error" if i < 5 else "view",
             1000.0 - i, "") for i in range(20)]
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["pr_auc"](spark, sf).collect()[0]
    assert r.n_pos == 5 and r.average_precision == 1.0

    rows2 = [(i, datetime(2024, 1, 1), 1, "error" if i >= 15 else "view",
              1000.0 - i, "") for i in range(20)]
    sf2 = _write(spark, tmp_path / "b", "events", rows2, EVENTS)
    r2 = QUERIES["pr_auc"](spark, sf2).collect()[0]
    want = sum(round(1e9 * i / (15 + i)) for i in range(1, 6)) / (5 * 1e9)
    assert r2.average_precision == round(want, 6)

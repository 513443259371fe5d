"""Batch 36: JSD source drift, conformal coverage, budget curation."""

import math
import os
from datetime import datetime


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


def test_jsd_bounds_and_extremes(spark, tmp_path):
    """Identical distributions -> JSD 0; disjoint vocabularies -> ln 2."""
    from pliers_spark.queries import QUERIES

    va = "alpha beta gamma delta " * 5
    vb = "omega psi chi phi " * 5
    rows = [
        (1, va, "en", "A", 1), (2, va, "en", "B", 1), (3, vb, "en", "C", 1),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {(r.src_a, r.src_b): r.jsd for r in QUERIES["source_jsd"](spark, sf).collect()}
    assert out[("A", "B")] == 0.0
    assert abs(out[("A", "C")] - math.log(2)) < 1e-5
    assert abs(out[("B", "C")] - math.log(2)) < 1e-5


def test_conformal_coverage_guarantee(spark, tmp_path):
    """Residuals uniform over a grid: held-out coverage of the 90%
    conformal interval must be >= ~0.85 (finite-sample guarantee is
    >= 0.9 - 1/(n_cal+1) in expectation; deterministic folds here)."""
    from pliers_spark.queries import QUERIES

    rows = []
    for i in range(300):
        # value = type mean (100) + structured noise in [-30, 30]
        rows.append((i, datetime(2024, 1, 1, 0, 0, i % 60), 1, "t",
                     100.0 + ((i * 7) % 61) - 30, ""))
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["conformal_coverage"](spark, sf).collect()[0]
    assert r.n_cal == 100 and r.n_test == 100
    assert r.coverage >= 0.85
    assert r.q_hat >= 0


def test_budget_select_prefers_quality(spark, tmp_path):
    """Kept set has strictly higher average quality than dropped; token
    usage never exceeds the budget."""
    from pliers_spark.queries import QUERIES

    good = ("the quick brown fox jumps over the lazy dog near riverbank "
            "and wanders home tonight with friends")  # high quality score
    bad = "x " * 40  # short tokens, low alpha-per-token shape
    rows = [(i, good, "en", "A", 1) for i in range(10)] + [
        (100 + i, bad.strip(), "en", "A", 1) for i in range(10)
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["budget_select"](spark, sf).collect()[0]
    assert r.tokens_kept <= r.budget
    assert r.n_kept > 0
    assert r.avg_q_kept > r.avg_q_dropped

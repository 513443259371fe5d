"""Batch 47: max-coverage selection, rich club, SRM check."""

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


def test_max_coverage_greedy_order(spark, tmp_path):
    """Doc 1 covers 6 shingles, doc 2 covers 3 new ones, doc 3 is a
    subset of doc 1 -> greedy picks 1 then 2; gains and totals exact."""
    from pliers_spark.queries import QUERIES

    rows = [
        (1, "a b c d e f g", "en", "A", 1),        # 6 bigrams
        (2, "x y z w", "en", "A", 1),               # 3 new bigrams
        (3, "a b c d", "en", "A", 1),               # subset of doc 1
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.round: r for r in QUERIES["max_coverage"](spark, sf).collect()}
    assert out[1].doc_id == 1 and out[1].gain == 6 and out[1].covered_total == 6
    assert out[2].doc_id == 2 and out[2].gain == 3 and out[2].covered_total == 9
    assert set(out) == {1, 2}  # coverage exhausted -> no further rounds


def test_rich_club_core_periphery(spark, tmp_path):
    """A dense core basket (K4 among parts 1-4) plus pendant spokes:
    the high-degree core is fully interconnected -> phi at low k is 1
    among the rich nodes."""
    from pliers_spark.queries import QUERIES

    rows = [(1, p) for p in (1, 2, 3, 4)]          # K4 core
    # pendant leaves raise core degrees above spokes'
    k = 10
    for p in (1, 2, 3, 4):
        for j in range(3):
            rows.append((k, p)); rows.append((k, 100 + 10 * p + j)); k += 1
    sf = _write(spark, tmp_path, "lineitem", rows, "l_orderkey long, l_partkey long")
    out = {r.k: r for r in QUERIES["rich_club"](spark, sf).collect()}
    # core degrees = 3 (K4) + 3 leaves = 6 > 4; leaves have degree 1
    assert out[4].n_rich == 4 and out[4].rich_edges == 6 and out[4].phi == 1.0
    assert out[8].n_rich == 0 and out[8].phi is None


def test_srm_balanced_and_skewed(spark, tmp_path):
    """Equal activity -> chi2 0, no flag; 9:1 activity skew -> flagged."""
    from pliers_spark.queries import QUERIES

    rows = [(i, datetime(2024, 1, 1), i % 2, "t", 1.0, "") for i in range(100)]
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["srm_check"](spark, sf).collect()[0]
    assert r.n_a == r.n_b == 50 and r.chi2 == 0.0 and r.srm_flag is False

    rows2 = [(i, datetime(2024, 1, 1), 0 if i < 90 else 1, "t", 1.0, "")
             for i in range(100)]
    sf2 = _write(spark, tmp_path / "b", "events", rows2, EVENTS)
    r2 = QUERIES["srm_check"](spark, sf2).collect()[0]
    assert r2.chi2 == 64.0 and r2.srm_flag is True

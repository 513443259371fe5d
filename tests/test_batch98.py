"""Batch 98: collocation measures, tolerance interval, control chart."""

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


def test_collocation_measures_hand_values(spark, tmp_path):
    """'of the' seen 5 times in 20 bigram tokens: check t, logDice, MI
    against the formulas."""
    from pliers_spark.queries import QUERIES

    # build text with exactly controlled counts: 5x "of the", fill rest
    text = " ".join(["of the"] * 5 + ["a b c d e f g h i j"])
    rows = [(0, text, "en", "s", len(text))]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {(r.w1, r.w2): r for r in QUERIES["collocation_measures"](spark, sf).collect()}
    r = out[("of", "the")]
    # corpus: tokens = 20, bigrams n = 19; f(of)=5, f(the)=5, fab=5
    assert r.fab == 5
    t = (5 - 5 * 5 / 19) / math.sqrt(5)
    ld = 14 + math.log2(2 * 5 / 10)
    mi = math.log2(19 * 5 / 25)
    assert abs(r.t_score - round(t, 6)) < 1e-9
    assert abs(r.log_dice - round(ld, 6)) < 1e-9
    assert abs(r.mi - round(mi, 6)) < 1e-9


def test_tolerance_interval_covers(spark, tmp_path):
    """200 uniform-ish values: the interval trims a small k, the
    reported confidence >= 0.95, and endpoints bracket >= 90% of the
    sample."""
    from pliers_spark.queries import QUERIES

    vals = [(i * 37) % 200 for i in range(200)]
    rows = [(i, datetime(2024, 1, 1, 0, 0, 0, i), i, "c", float(v), "{}") for i, v in enumerate(vals)]
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["tolerance_interval"](spark, sf).collect()[0]
    assert r.n == 200
    assert r.confidence >= 0.95
    inside = sum(1 for v in vals if r.tol_lo <= v <= r.tol_hi)
    assert inside >= 0.9 * 200
    assert r.k_trim >= 1  # n=200 allows some trimming


def test_control_chart_flags_shifted_day(spark, tmp_path):
    """9 stable days at ~10 and one day at 50: that day trips the mean
    chart; a day with a wild range trips the R chart."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    for d in range(10):
        base = 50.0 if d == 7 else 10.0
        for j in range(5):
            v = base + 0.1 * j
            if d == 4 and j == 4:
                v = base + 30.0  # wild range day
            rows.append((eid, datetime(2024, 1, 1 + d, 0, 0, j), eid, "c", v, "{}"))
            eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = {r.day: r for r in QUERIES["control_chart"](spark, sf).collect()}
    assert len(out) == 10
    assert out[datetime(2024, 1, 8)].ooc_x == 1      # shifted mean day
    assert out[datetime(2024, 1, 5)].ooc_r == 1      # wild range day
    stable = [r for d, r in out.items() if d not in (datetime(2024, 1, 8), datetime(2024, 1, 5))]
    assert all(r.ooc_r == 0 for r in stable)

"""Batch 91: Nelson-Aalen hazard, rarefaction curve, decile lift."""

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


def test_nelson_aalen_brackets_km(spark, tmp_path):
    """3 users view d0; conversions d1, d2; censor d3. H accumulates
    d/n and exp(-H) >= KM survival at every day."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0

    def ev(u, day, typ):
        nonlocal eid
        rows.append((eid, datetime(2024, 1, 1) + timedelta(days=day), u, typ, 1.0, "{}"))
        eid += 1

    for u in (1, 2, 3):
        ev(u, 0, "view")
    ev(1, 1, "purchase")
    ev(2, 2, "purchase")
    ev(3, 3, "click")
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    na = {r.day: r for r in QUERIES["nelson_aalen"](spark, sf).collect()}
    km = {r.day: r for r in QUERIES["kaplan_meier"](spark, sf).collect()}
    h1 = round(1e6 * 1 / 3) / 1e6
    assert na[1].cum_hazard == round(h1, 6)
    assert na[2].cum_hazard == round(h1 + round(1e6 * 1 / 2) / 1e6, 6)
    assert na[1].var_hazard == round(round(1e6 * 1 / 9) / 1e6, 6)
    for d in range(4):
        assert na[d].s_fleming >= km[d].survival - 1e-9


def test_rarefaction_monotone_and_exact_small(spark, tmp_path):
    """Corpus aab: N=3, S=2. E[S_1] = 1 + ... exact hypergeometric:
    m=1: P(miss a)=C(1,1)/C(3,1)=1/3, P(miss b)=C(2,1)/C(3,1)=2/3 ->
    E=2-1/3-2/3=1. Curve is monotone in m."""
    from pliers_spark.queries import QUERIES

    # need N >= 10 for percent points to be distinct; use 10 tokens
    text = "a a a a a a a a a b"  # N=10, counts: a=9, b=1
    rows = [(0, text, "en", "s", len(text))]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.q_pct: r for r in QUERIES["rarefaction_curve"](spark, sf).collect()}
    assert out[10].m == 1 and out[25].m == 2 and out[50].m == 5 and out[75].m == 7

    def exact(m):
        # E[S] = 2 - C(10-9,m)/C(10,m) - C(10-1,m)/C(10,m)
        def C(n, k):
            return math.comb(n, k) if n >= k >= 0 else 0
        return 2 - C(1, m) / C(10, m) - C(9, m) / C(10, m)

    for q, m in [(10, 1), (25, 2), (50, 5), (75, 7)]:
        assert abs(out[q].s_expected - exact(m)) < 1e-3
    vals = [out[q].s_expected for q in (10, 25, 50, 75)]
    assert vals == sorted(vals)


def test_decile_lift_perfect_separation(spark, tmp_path):
    """20 docs, top-half scores are all positive: decile 0-4 rate 1,
    lift 2; capture reaches 1.0 by decile 4."""
    from pliers_spark.queries import QUERIES

    rows = []
    for i in range(20):
        score = 1000 - i  # doc 0 highest
        lang = "en" if i < 10 else "fr"
        rows.append((i, "t", lang, "s", score))
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.decile: r for r in QUERIES["decile_lift"](spark, sf).collect()}
    assert len(out) == 10
    for d in range(5):
        assert out[d].rate == 1.0 and out[d].lift == 2.0
    assert out[4].cum_capture == 1.0
    for d in range(5, 10):
        assert out[d].rate == 0.0
    assert out[9].cum_capture == 1.0

"""Batch 104: footrule, HHI, weekly Jaccard, median polish."""

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


def test_footrule_identical_and_reversed(spark, tmp_path):
    """Token count == n_chars order -> sim 1; reversed order -> sim 0."""
    from pliers_spark.queries import QUERIES

    rows = [(i, " ".join(["w"] * (i + 1)), "en", "s", 10 * (i + 1)) for i in range(6)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["spearman_footrule"](spark, sf).collect()[0]
    assert r.footrule == 0 and r.footrule_sim == 1.0

    rows2 = [(i, " ".join(["w"] * (6 - i)), "en", "s", 10 * (i + 1)) for i in range(6)]
    sf2 = _write(spark, tmp_path, "documents", rows2, DOCS)
    r2 = QUERIES["spearman_footrule"](spark, sf2).collect()[0]
    assert r2.footrule == 18  # max for n=6: n^2/2
    assert r2.footrule_sim == 0.0


def test_hhi_monopoly_vs_uniform(spark, tmp_path):
    from pliers_spark.queries import QUERIES

    mono = [(i, "t", "en", "only", 10) for i in range(10)]
    sf = _write(spark, tmp_path, "documents", mono, DOCS)
    r = QUERIES["herfindahl_index"](spark, sf).collect()[0]
    assert r.hhi == 1.0 and r.effective_sources == 1.0
    assert r.hhi_normalized is None  # k=1: normalization undefined

    unif = [(i, "t", "en", f"s{i % 4}", 10) for i in range(40)]
    sf2 = _write(spark, tmp_path, "documents", unif, DOCS)
    r2 = QUERIES["herfindahl_index"](spark, sf2).collect()[0]
    assert r2.hhi == 0.25 and r2.effective_sources == 4.0
    assert r2.hhi_normalized == 0.0


def test_weekly_user_overlap(spark, tmp_path):
    """Week1 users {1,2,3}, week2 {2,3,4}: Jaccard = 2/4."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    for u in (1, 2, 3):
        rows.append((eid, datetime(2024, 1, 1), u, "c", 1.0, "{}")); eid += 1
    for u in (2, 3, 4):
        rows.append((eid, datetime(2024, 1, 8), u, "c", 1.0, "{}")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = sorted(QUERIES["weekly_user_overlap"](spark, sf).collect(), key=lambda r: r.week)
    assert out[0].jaccard_prev_week is None
    assert out[1].n_users == 3 and out[1].n_retained == 2
    assert out[1].jaccard_prev_week == 0.5


def test_median_polish_additive_grid(spark, tmp_path):
    """Counts built exactly additive (overall + row + col): residuals
    all zero and effects recover the structure up to the median-zero
    normalization."""
    from pliers_spark.queries import QUERIES

    row_eff = [0, 1, 2, 0, 1, 2, 0]        # by weekday
    col_eff = [0, 3, 6]                    # by week
    base = 10
    rows = []
    eid = 0
    for wi in range(3):
        for wd in range(7):
            cnt = base + row_eff[wd] + col_eff[wi]
            day = wi * 7 + wd
            for j in range(cnt):
                rows.append((eid, datetime(2024, 1, 1) + timedelta(days=day, seconds=j), eid, "c", 1.0, "{}"))
                eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = QUERIES["median_polish"](spark, sf).collect()
    assert len(out) == 21
    assert all(r.residual == 0 for r in out)
    # reconstruction identity holds exactly
    for r in out:
        assert r.overall + r.row_effect + r.col_effect + r.residual == r.x
    # row effects centered: median 0
    re = sorted({r.weekday: r.row_effect for r in out}.values())
    assert re[len(re) // 2] == 0

"""Batch 78: Mann-Whitney U, Brown-Forsythe Levene, Fleiss' kappa."""

import os


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


def _ev(i, etype, value):
    from datetime import datetime

    return (i, datetime(2024, 1, 1, 0, 0, i), i, etype, value, "{}")


def test_mann_whitney_separated(spark, tmp_path):
    """click=[1,2,3] vs view=[4,5,6]: R1=6, U1=0, no ties,
    z = -4.5/sqrt(5.25) = -1.963961."""
    from pliers_spark.queries import QUERIES

    rows = [_ev(i, "click", float(v)) for i, v in enumerate([1, 2, 3])]
    rows += [_ev(i + 3, "view", float(v)) for i, v in enumerate([4, 5, 6])]
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["mann_whitney_u"](spark, sf).collect()[0]
    assert (r.n1, r.n2, r.u1) == (3, 3, 0.0)
    assert abs(r.z - (-1.963961)) < 1e-6


def test_mann_whitney_ties(spark, tmp_path):
    """click=[1,1] vs view=[1,2]: three-way tie at 1 gives avg rank 2,
    R1=4, U1=1; tie-corrected sigma = 1 exactly, so z = -1."""
    from pliers_spark.queries import QUERIES

    rows = [_ev(0, "click", 1.0), _ev(1, "click", 1.0), _ev(2, "view", 1.0), _ev(3, "view", 2.0)]
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["mann_whitney_u"](spark, sf).collect()[0]
    assert (r.n1, r.n2) == (2, 2)
    assert r.u1 == 1.0 and r.z == -1.0


def test_levene_bf_hand_value(spark, tmp_path):
    """A=[1,2,3] (|z|=[1,0,1]) vs B=[10,20,30] (|z|=[10,0,10]):
    W = 4*54/(606/9) = 1944/606 = 3.207921."""
    from pliers_spark.queries import QUERIES

    rows = [_ev(i, "a", float(v)) for i, v in enumerate([1, 2, 3])]
    rows += [_ev(i + 3, "b", float(v)) for i, v in enumerate([10, 20, 30])]
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["levene_bf"](spark, sf).collect()[0]
    assert (r.k, r.n) == (2, 6)
    assert abs(r.w_bf - 1944.0 / 606.0) < 5e-6


def test_levene_bf_equal_spread_near_zero(spark, tmp_path):
    """Identical spread in both groups: numerator is ~0."""
    from pliers_spark.queries import QUERIES

    rows = [_ev(i, "a", float(v)) for i, v in enumerate([1, 2, 3, 4, 5])]
    rows += [_ev(i + 5, "b", float(v + 100)) for i, v in enumerate([1, 2, 3, 4, 5])]
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["levene_bf"](spark, sf).collect()[0]
    assert abs(r.w_bf) < 1e-5


def test_fleiss_kappa_perfect_agreement(spark, tmp_path):
    """Two docs, all three raters agree (cats 0 and 2): kappa = 1."""
    from pliers_spark.queries import QUERIES

    rows = [
        (0, " ".join(["w"] * 10), "en", "s", 100),
        (1, " ".join(["w"] * 100), "en", "s", 500),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["fleiss_kappa"](spark, sf).collect()[0]
    assert (r.n_items, r.m) == (2, 3)
    assert r.p_bar == 1.0 and r.kappa == 1.0


def test_fleiss_kappa_partial(spark, tmp_path):
    """Add a doc where rater 3 disagrees (n_chars=190 straddles the
    180/200 thresholds): P_i drops to 1/3 on that item; kappa matches
    the closed-form replica."""
    from pliers_spark.queries import QUERIES

    rows = [
        (0, " ".join(["w"] * 10), "en", "s", 100),
        (1, " ".join(["w"] * 100), "en", "s", 500),
        (2, " ".join(["w"] * 10), "en", "s", 190),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["fleiss_kappa"](spark, sf).collect()[0]
    # items: doc0 (0,0,0) ss=9; doc1 (2,2,2) ss=9; doc2 (0,0,1) ss=5
    n, m = 3, 3
    p_bar = (9 + 9 + 5 - n * m) / (n * m * (m - 1))
    cj = {0: 5, 1: 1, 2: 3}
    pe_fp = sum(round(1e12 * c * c / (n * 3.0) / (n * 3.0)) for c in cj.values())
    p_e = pe_fp / 1e12
    kappa = (p_bar - p_e) / (1 - p_e)
    assert abs(r.p_bar - round(p_bar, 6)) < 1e-9
    assert abs(r.kappa - round(kappa, 6)) < 1e-9

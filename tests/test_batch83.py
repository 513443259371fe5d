"""Batch 83: t-closeness, Krippendorff's alpha, effect-size family."""

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


def test_t_closeness_skewed_group_flagged(spark, tmp_path):
    """Global sens dist: 50/50 over buckets 1 and 2. Group A all bucket
    1 -> TV = 0.5 > 0.2 flagged. Group B mirrors global -> TV small."""
    from pliers_spark.queries import QUERIES

    rows = [(i, "t", "en", "A", 150) for i in range(4)]  # sens 1
    rows += [(10 + i, "t", "en", "B", 150) for i in range(2)]
    rows += [(20 + i, "t", "en", "B", 250) for i in range(2)]
    rows += [(30 + i, "t", "en", "C", 250) for i in range(4)]  # sens 2
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.source: r for r in QUERIES["t_closeness"](spark, sf).collect()}
    # global: 6 of sens1, 6 of sens2
    assert out["A"].t_dist == 0.5 and out["A"].violates_t02 == 1
    assert out["B"].t_dist == 0.0 and out["B"].violates_t02 == 0
    assert out["C"].t_dist == 0.5 and out["C"].violates_t02 == 1


def test_krippendorff_perfect_vs_partial(spark, tmp_path):
    """Perfect 3-rater agreement across 2 categories -> alpha = 1."""
    from pliers_spark.queries import QUERIES

    rows = [
        (0, " ".join(["w"] * 10), "en", "s", 100),
        (1, " ".join(["w"] * 100), "en", "s", 500),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["krippendorff_alpha"](spark, sf).collect()[0]
    assert r.n_items == 2 and r.alpha == 1.0


def test_krippendorff_replica_formula(spark, tmp_path):
    """One disagreeing item: alpha matches the closed-form replica."""
    from pliers_spark.queries import QUERIES

    rows = [
        (0, " ".join(["w"] * 10), "en", "s", 100),
        (1, " ".join(["w"] * 100), "en", "s", 500),
        (2, " ".join(["w"] * 10), "en", "s", 190),  # raters: 0,0,1
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["krippendorff_alpha"](spark, sf).collect()[0]
    n, m = 3, 3
    # nij: d0 {0:3}, d1 {2:3}, d2 {0:2, 1:1}
    dis_o = 3 * 0 + 3 * 0 + (2 * 1 + 1 * 2)
    nc = {0: 5, 1: 1, 2: 3}
    dis_e = sum(c * (n * m - c) for c in nc.values())
    d_o = dis_o / (n * m * (m - 1))
    d_e = dis_e / ((n * m) * (n * m - 1))
    assert abs(r.alpha - round(1 - d_o / d_e, 6)) < 1e-9


def test_effect_sizes_hand_value(spark, tmp_path):
    """click=[1,2,3], view=[4,5,6]: diff=-3, pooled var=1, d=-3;
    g = d*(1-3/19); glass uses view SD=1."""
    from pliers_spark.queries import QUERIES

    rows = [(i, datetime(2024, 1, 1, 0, 0, i), i, "click", float(v), "{}") for i, v in enumerate([1, 2, 3])]
    rows += [(i + 3, datetime(2024, 1, 1, 0, 0, i + 3), i, "view", float(v), "{}") for i, v in enumerate([4, 5, 6])]
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["effect_sizes"](spark, sf).collect()[0]
    assert (r.n1, r.n2) == (3, 3)
    assert r.cohens_d == -3.0
    assert abs(r.hedges_g - round(-3.0 * (1 - 3 / (4 * 4 - 1)), 6)) < 1e-9
    assert r.glass_delta == -3.0


def test_effect_sizes_zero_diff(spark, tmp_path):
    from pliers_spark.queries import QUERIES

    rows = [(i, datetime(2024, 1, 1, 0, 0, i), i, "click", float(v), "{}") for i, v in enumerate([1, 2, 3])]
    rows += [(i + 3, datetime(2024, 1, 1, 0, 0, i + 3), i, "view", float(v), "{}") for i, v in enumerate([1, 2, 3])]
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["effect_sizes"](spark, sf).collect()[0]
    assert r.cohens_d == 0.0 and r.hedges_g == 0.0 and r.glass_delta == 0.0

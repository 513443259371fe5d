"""Batch 111: Cox PH, ANOVA effect sizes, effective sample size."""

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


def test_cox_positive_covariate_effect(spark, tmp_path):
    """High-click-share users convert faster: beta > 0, HR > 1."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0

    def ev(u, day, typ):
        nonlocal eid
        rows.append((eid, datetime(2024, 1, 1) + timedelta(days=day, seconds=eid), u, typ, 1.0, "{}"))
        eid += 1

    # clickers (x high) convert day 1; non-clickers convert day 8 or censor
    for u in range(10):
        ev(u, 0, "view")
        ev(u, 0, "click")
        ev(u, 0, "click")
        ev(u, 1, "purchase")
    for u in range(10, 20):
        ev(u, 0, "view")
        if u % 2 == 0:
            ev(u, 8, "purchase")
        else:
            ev(u, 9, "error")  # censored at day 9
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["cox_regression"](spark, sf).collect()[0]
    assert r.n_subjects == 20 and r.n_events == 15
    assert r.beta > 0.5
    assert r.hazard_ratio > 1.5


def test_anova_effect_sizes_hand_check(spark, tmp_path):
    """Two groups [1,2,3] vs [7,8,9]: eta^2 = SSB/SST = 54/58;
    omega^2 slightly below; F = 54/(4/4) = 54... check exact."""
    from pliers_spark.queries import QUERIES

    rows = [(i, datetime(2024, 1, 1, 0, 0, i), i, "a", float(v), "{}") for i, v in enumerate([1, 2, 3])]
    rows += [(i + 3, datetime(2024, 1, 1, 0, 0, i + 3), i, "b", float(v), "{}") for i, v in enumerate([7, 8, 9])]
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["anova_effect_sizes"](spark, sf).collect()[0]
    ssb, ssw, sst = 54.0, 4.0, 58.0
    k, n = 2, 6
    msw = ssw / (n - k)
    assert abs(r.eta_sq - round(ssb / sst, 6)) < 1e-6
    assert abs(r.omega_sq - round((ssb - (k - 1) * msw) / (sst + msw), 6)) < 1e-6
    assert abs(r.f_stat - round((ssb / (k - 1)) / msw, 6)) < 1e-4
    assert r.omega_sq < r.eta_sq


def test_ess_positive_autocorr_shrinks(spark, tmp_path):
    """Smooth trending counts: rho1 > 0, n_eff < n; alternating
    counts: rho1 < 0, n_eff > n."""
    from pliers_spark.queries import QUERIES

    def mk(vals):
        rows = []
        for d, cnt in enumerate(vals):
            for j in range(cnt):
                rows.append((len(rows), datetime(2024, 1, 1 + d, 0, 0, j), d, "c", 1.0, "{}"))
        return rows

    smooth = [5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10]
    sf = _write(spark, tmp_path, "events", mk(smooth), EVENTS)
    r = QUERIES["effective_sample_size"](spark, sf).collect()[0]
    assert r.rho1 > 0.5 and r.n_eff < r.n and r.se_inflation > 1

    alt = [2, 8] * 6
    sf2 = _write(spark, tmp_path, "events", mk(alt), EVENTS)
    r2 = QUERIES["effective_sample_size"](spark, sf2).collect()[0]
    assert r2.rho1 < 0 and r2.n_eff > r2.n

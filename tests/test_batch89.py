"""Batch 89: exact Bayesian A/B, AMOC changepoint, KDE grid."""

import math
import os
from datetime import datetime


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


def _ev(rows):
    return [
        (i, datetime(2024, 1, 1, 0, 0, 0, i), u, t, float(v), "{}")
        for i, (u, t, v) in enumerate(rows)
    ]


def _closed_form(sa, fa, sb, fb):
    """Reference P(B>A) for Beta(1+s,1+f) posteriors via the exact sum,
    replicating the engine's integer-lfact discipline."""
    aa, ba, ab, bb = sa + 1, fa + 1, sb + 1, fb + 1
    n = aa + ba + ab + bb
    lf = [0, 0]
    acc = 0
    for i in range(2, n + 1):
        acc += round(1e6 * math.log(i))
        lf.append(acc)

    def lbeta(x, y):
        return lf[x - 1] + lf[y - 1] - lf[x + y - 1]

    p_nano = 0
    for i in range(ab):
        l_fp = (
            lbeta(aa + i, ba + bb)
            - round(1e6 * math.log(bb + i))
            - lbeta(1 + i, bb)
            - lbeta(aa, ba)
        )
        p_nano += round(1e9 * math.exp(l_fp / 1e6))
    return round(p_nano / 1e9, 6)


def test_bayes_ab_symmetric_is_half(spark, tmp_path):
    """Identical variant outcomes: P(B>A) from the exact sum — and it
    matches the pure-python replica."""
    from pliers_spark.queries import QUERIES

    rows = []
    # users 0,2 (variant 0): one converts; users 1,3 (variant 1): one converts
    rows += [(0, "purchase", 1.0), (2, "view", 1.0)]
    rows += [(1, "purchase", 1.0), (3, "view", 1.0)]
    sf = _write(spark, tmp_path, "events", _ev(rows), EVENTS)
    r = QUERIES["bayes_ab_beta"](spark, sf).collect()[0]
    assert (r.s_a, r.f_a, r.s_b, r.f_b) == (1, 1, 1, 1)
    assert r.prob_b_beats_a == _closed_form(1, 1, 1, 1)
    # symmetric posteriors: P ~ 0.5 (exact closed form gives 0.5)
    assert abs(r.prob_b_beats_a - 0.5) < 0.01


def test_bayes_ab_b_dominates(spark, tmp_path):
    """B converts 5/5, A converts 0/5: P(B>A) near 1, matches replica."""
    from pliers_spark.queries import QUERIES

    rows = []
    for u in range(0, 10, 2):  # variant 0, never converts
        rows.append((u, "view", 1.0))
    for u in range(1, 11, 2):  # variant 1, always converts
        rows.append((u, "purchase", 1.0))
    sf = _write(spark, tmp_path, "events", _ev(rows), EVENTS)
    r = QUERIES["bayes_ab_beta"](spark, sf).collect()[0]
    assert (r.s_a, r.f_a, r.s_b, r.f_b) == (0, 5, 5, 0)
    assert r.prob_b_beats_a == _closed_form(0, 5, 5, 0)
    assert r.prob_b_beats_a > 0.98


def test_amoc_finds_level_shift(spark, tmp_path):
    """Days 1-10 at value 1, days 11-20 at value 5: split at day 10."""
    from pliers_spark.queries import QUERIES

    rows = []
    for d in range(20):
        v = 1.0 if d < 10 else 5.0
        rows.append((d, datetime(2024, 1, 1 + d), d, "c", v, "{}"))
    ev = [(i, r[1], r[2], r[3], r[4], r[5]) for i, r in enumerate(rows)]
    sf = _write(spark, tmp_path, "events", ev, EVENTS)
    r = QUERIES["amoc_changepoint"](spark, sf).collect()[0]
    assert r.split_day == datetime(2024, 1, 10)
    assert r.mean_left == 1.0 and r.mean_right == 5.0
    assert r.gain > 0


def test_kde_grid_bimodal(spark, tmp_path):
    """Two tight clusters at 0 and 100: density peaks at the ends of
    the grid, trough in the middle; densities are non-negative."""
    from pliers_spark.queries import QUERIES

    rows = []
    for i in range(50):
        rows.append((i, datetime(2024, 1, 1, 0, 0, 0, i), i, "c", 0.0 + (i % 5) * 0.01, "{}"))
        rows.append((100 + i, datetime(2024, 1, 1, 0, 1, 0, i), i, "c", 100.0 + (i % 5) * 0.01, "{}"))
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = sorted(QUERIES["kde_grid"](spark, sf).collect(), key=lambda r: r.grid_idx)
    assert len(out) == 41
    dens = [r.density for r in out]
    assert min(dens) >= 0
    assert dens[0] > dens[20] and dens[40] > dens[20]
    assert out[0].x < 1 and out[40].x > 99

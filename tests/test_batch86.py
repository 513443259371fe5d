"""Batch 86: HITS, propensity matching, Gamma-Poisson EB shrinkage."""

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


def test_hits_invariants_on_derived_graph(spark):
    """On the sf0.001 host graph: max-normalization pins the top hub
    and top authority at exactly 1e6 and every score stays in
    [0, 1e6] (the integer-normalization contract)."""
    from pliers_spark.queries import QUERIES

    out = QUERIES["hits_scores"](spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    hubs = [r.hub_fp for r in out]
    auths = [r.auth_fp for r in out]
    assert max(hubs) == 1_000_000 and max(auths) == 1_000_000
    assert all(0 <= v <= 1_000_000 for v in hubs + auths)


def test_propensity_match_att(spark, tmp_path):
    """Treated user (signup, click-share 0.5, y=10); controls at share
    0.5 (y=7) and 0.0 (y=100). Match picks the same-share control:
    ATT = 3."""
    from pliers_spark.queries import QUERIES

    rows = []
    # treated user 1: signup + click + view + purchase -> share 0.25? make exact:
    # events: signup, click -> share 0.5
    rows += [(1, "signup", 10.0), (1, "click", 10.0)]
    # control 2: click, view -> share 0.5, y = 7
    rows += [(2, "click", 7.0), (2, "view", 7.0)]
    # control 3: view, view -> share 0, y = 100
    rows += [(3, "view", 100.0), (3, "view", 100.0)]
    sf = _write(spark, tmp_path, "events", _ev(rows), EVENTS)
    r = QUERIES["propensity_match"](spark, sf).collect()[0]
    assert r.n_treated == 1 and r.n_matched == 1
    assert r.att == 3.0


def test_propensity_match_caliper_excludes(spark, tmp_path):
    """Only control is 0.5 share away (> 0.05 caliper): no match."""
    from pliers_spark.queries import QUERIES

    rows = [(1, "signup", 10.0), (1, "click", 10.0)]
    rows += [(3, "view", 100.0), (3, "view", 100.0)]
    sf = _write(spark, tmp_path, "events", _ev(rows), EVENTS)
    r = QUERIES["propensity_match"](spark, sf).collect()[0]
    assert r.n_treated == 1 and r.n_matched == 0


def test_gamma_poisson_shrinks_toward_mean(spark, tmp_path):
    """Overdispersed counts: posterior sits between x and the global
    mean, low-count users pulled up, high-count pulled down."""
    from pliers_spark.queries import QUERIES

    rows = []
    for u, n in [(1, 1), (2, 1), (3, 10), (4, 20)]:
        for _ in range(n):
            rows.append((u, "click", 1.0))
    sf = _write(spark, tmp_path, "events", _ev(rows), EVENTS)
    out = {r.user_id: r for r in QUERIES["gamma_poisson_eb"](spark, sf).collect()}
    mu = 8.0
    assert out[1].x == 1 and mu > out[1].posterior_rate > 1
    assert out[4].x == 20 and mu < out[4].posterior_rate < 20
    w = out[1].shrink_weight
    assert 0 < w < 1
    # replicate: v = (4*q - s^2)/(4*3), q = 1+1+100+400=502, s=32
    v = (4 * 502 - 32 * 32) / 12.0
    beta = mu / (v - mu)
    assert abs(out[1].posterior_rate - round((1 + mu * beta) / (1 + beta), 6)) < 1e-9

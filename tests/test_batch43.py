"""Batch 43: capture-recapture, JSD contributors, dispersion index."""

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


def test_capture_recapture_full_overlap(spark, tmp_path):
    """Both halves see the SAME 5 contents -> Chapman estimates exactly
    the true population: (6*6/6)-1 = 5."""
    from pliers_spark.queries import QUERIES

    rows = [(i, f"content{i % 5}", "en", "A", 1) for i in range(10)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["capture_recapture"](spark, sf).collect()[0]
    assert r.n1 == 5 and r.n2 == 5 and r.m == 5
    assert r.true_distinct == 5
    assert r.chapman_estimate == 5.0 and r.rel_err == 0.0


def test_capture_recapture_partial_overlap(spark, tmp_path):
    """Halves share 2 of their 4 contents each (6 total): Chapman =
    (5*5/3)-1 = 7.333333."""
    from pliers_spark.queries import QUERIES

    # even docs: contents a,b,c,d ; odd docs: c,d,e,f
    ev = ["a", "b", "c", "d"]
    od = ["c", "d", "e", "f"]
    rows = [(2 * i, ev[i], "en", "A", 1) for i in range(4)] + [
        (2 * i + 1, od[i], "en", "A", 1) for i in range(4)
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["capture_recapture"](spark, sf).collect()[0]
    assert (r.n1, r.n2, r.m, r.true_distinct) == (4, 4, 2, 6)
    assert r.chapman_estimate == round(25 / 3 - 1, 6)


def test_jsd_contributors_name_the_planted_token(spark, tmp_path):
    """One token exclusive to source A dominates the A-B divergence."""
    from pliers_spark.queries import QUERIES

    shared = "common words shared across sources here"
    rows = [(i, f"zyzzyx zyzzyx {shared}", "en", "A", 1) for i in range(10)] + [
        (100 + i, shared, "en", "B", 1) for i in range(10)
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = QUERIES["jsd_contributors"](spark, sf).collect()
    top = [r for r in out if r.rank == 1][0]
    assert top.tok == "zyzzyx" and top.contribution > 0


def test_dispersion_burst_vs_uniform(spark, tmp_path):
    """'burst' events all on one user -> D >> 1; 'flat' events one per
    user -> variance 0 -> D = 0."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    for u in range(10):
        rows.append((eid, datetime(2024, 1, 1), u, "flat", 1.0, "")); eid += 1
    for i in range(30):
        rows.append((eid, datetime(2024, 1, 1), 0, "burst", 1.0, "")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = {r.event_type: r for r in QUERIES["dispersion_index"](spark, sf).collect()}
    assert out["flat"].dispersion == 0.0 and out["flat"].overdispersed is False
    assert out["burst"].dispersion > 1.0 and out["burst"].overdispersed is True
    assert out["burst"].n_users == 10  # zero rows densified in

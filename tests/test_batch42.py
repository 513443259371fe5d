"""Batch 42: Qini uplift curve, filter operating points, MRR/recall@k."""

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


def test_qini_perfect_targeting(spark, tmp_path):
    """Treated responders concentrated in the top score decile: qini
    rises immediately and is monotone-nondecreasing on this design."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    # 100 users; even ids treated. Top-decile users (90-99) respond iff treated.
    for u in range(100):
        responds = u >= 90 and u % 2 == 0
        rows.append((eid, datetime(2024, 1, 1), u,
                     "error" if responds else "view", float(u), "")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = {r.decile: r for r in QUERIES["qini_curve"](spark, sf).collect()}
    assert out[0].qini == 5.0                 # all 5 responders in decile 0
    assert out[9].n_treat == out[9].n_ctrl == 50
    assert out[9].resp_treat == 5 and out[9].resp_ctrl == 0
    vals = [out[d].qini for d in range(10)]
    assert vals == sorted(vals)


def test_filter_tradeoff_monotone(spark):
    """Raising the threshold can only shrink the kept set and recall;
    rows exist for the three thresholds."""
    from pliers_spark.queries import QUERIES

    out = {r.threshold: r for r in QUERIES["filter_tradeoff"](spark, "/root/testdata/sf0.001").collect()}
    assert set(out) == {0.4, 0.5, 0.6}
    assert out[0.4].n_kept >= out[0.5].n_kept >= out[0.6].n_kept
    assert out[0.4].good_recall >= out[0.5].good_recall >= out[0.6].good_recall
    for r in out.values():
        assert 0.0 <= r.keep_rate <= 1.0


def test_mrr_self_retrieval(spark, tmp_path):
    """Each seed doc contains all 6 of its own query terms, so it is
    relevant to itself and BM25 ranks it 1 -> rr_fp = 1e6; recall@5 = 1
    when the seed is the only relevant doc."""
    from pliers_spark.queries import QUERIES

    rows = [
        (i, f"uniq{i}a uniq{i}b uniq{i}c uniq{i}d uniq{i}e uniq{i}f filler words", "en", "A", 1)
        for i in range(8)
    ] + [(100 + i, "generic other content entirely", "en", "A", 1) for i in range(4)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.q_id: r for r in QUERIES["mrr_recall"](spark, sf).collect()}
    assert set(out) == set(range(8))
    for r in out.values():
        assert r.first_rel_rank == 1 and r.rr_fp == 1_000_000
        assert r.n_rel_total == 1 and r.recall_at_k == 1.0

"""Batch 23: SIF embedding pooling, c-TF-IDF cluster terms, SAX symbols."""

import os
from datetime import datetime

from pyspark.sql import functions as F


def _write_tables(spark, tmp_path, events_rows):
    """Materialize a minimal sf-dir with an events table for query-level tests."""
    d = str(tmp_path)
    spark.createDataFrame(
        events_rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


def test_sax_symbols_hand_case(spark, tmp_path):
    """One user, 16 events = two PAA chunks of 8: a low chunk then a high
    chunk — with symmetric values the z-score of each chunk mean is ∓1
    (beyond ±0.6745), so symbols must be 'a' then 'd'."""
    from pliers_spark.queries import QUERIES

    rows = [
        (i, datetime(2024, 1, 1, 0, i), 1, "t", -1.0 if i < 8 else 1.0, "")
        for i in range(16)
    ]
    sf = _write_tables(spark, tmp_path, rows)
    out = {r.window_id: r for r in QUERIES["sax_symbols"](spark, sf).collect()}
    assert set(out) == {0, 1}
    assert out[0].symbol == "a" and out[1].symbol == "d"
    assert out[0].cn == 8 and out[0].paa_fp == -1_000_000


def test_sax_symbols_mid_band(spark, tmp_path):
    """Chunk means just inside ±0.6745σ symbolize to the middle letters
    b (below mean) / c (at-or-above mean)."""
    from pliers_spark.queries import QUERIES

    # 8 low + 8 high with a small gap relative to within-chunk spread:
    # per-chunk deviation is well under 0.6745 of the pooled std.
    vals = [0.0, 4.0] * 4 + [1.0, 5.0] * 4  # chunk means 2.0 vs 3.0, std≈2.06
    rows = [
        (i, datetime(2024, 1, 1, 0, i), 1, "t", v, "") for i, v in enumerate(vals)
    ]
    sf = _write_tables(spark, tmp_path, rows)
    out = {r.window_id: r.symbol for r in QUERIES["sax_symbols"](spark, sf).collect()}
    assert out == {0: "b", 1: "c"}


def test_sif_downweights_frequent_tokens(spark):
    """SIF weight T/(T+1000c) must be strictly smaller for a token that is
    10x more frequent; verified on the exact int-ppm formula the query uses."""
    # T = 1100 total tokens, c=100 vs c=10
    w_freq = round(1e6 * 1100 / (1100 + 1000 * 100))
    w_rare = round(1e6 * 1100 / (1100 + 1000 * 10))
    assert w_freq < w_rare
    # and the weighting changes the pooled embedding vs the plain mean:
    from pliers_spark.queries import QUERIES

    sif = {r.doc_id: r for r in QUERIES["sif_embedding"](spark, "/root/testdata/sf0.001").collect()}
    mean = {r.doc_id: r for r in QUERIES["word_embeddings"](spark, "/root/testdata/sf0.001").collect()}
    assert set(sif) == set(mean)
    diff = sum(
        1
        for k in sif
        if any(abs((sif[k][f"emb_{d}"] or 0) - (mean[k][f"emb_{d}"] or 0)) > 1e-9 for d in range(4))
    )
    assert diff > len(sif) * 0.5  # reweighting actually moved most docs


def test_ctfidf_top_terms_shape(spark):
    """Every cluster gets exactly its top-5 rank-dense terms, ranks 1..5,
    scores non-increasing within a cluster."""
    from pliers_spark.queries import QUERIES

    rows = QUERIES["ctfidf_terms"](spark, "/root/testdata/sf0.001").collect()
    by_c = {}
    for r in rows:
        by_c.setdefault(r.cluster_id, []).append(r)
    for c, rs in by_c.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        scores = [r.score_fp for r in rs]
        assert scores == sorted(scores, reverse=True)

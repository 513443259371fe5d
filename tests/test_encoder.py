"""Sequence-encoder stage (BertExtractor execution pattern)."""

import numpy as np
from pyspark.sql import functions as F

from pliers_spark.functions.encoder import reference_encode, sequence_encode_col


def test_encoder_matches_driver_reference(spark):
    texts = ["the quick fox", "table scan merge join", "", "the quick fox"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    got = {
        r.id: r.emb
        for r in df.select("id", sequence_encode_col(F.col("text")).alias("emb")).collect()
    }
    for i, t in enumerate(texts):
        np.testing.assert_allclose(got[i], reference_encode(t), atol=1e-9)
    assert got[0] == got[3]  # deterministic
    assert got[2] == [0.0] * 8  # empty text -> zero vector


def test_encoder_pooling_is_mean_of_tokens(spark):
    # a one-token doc's vector equals that token's row through tanh;
    # a repeated token pools to the same vector
    a = reference_encode("scan")
    b = reference_encode("scan scan scan")
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_masked_lm_topk_matches_reference(spark):
    import pytest

    from pliers_spark.functions.encoder import (
        LM_VOCAB, _context_vector, _embed, _logit, _softmax_over, masked_lm_scores,
    )

    df = spark.createDataFrame(
        [(1, "table fast slow"), (2, ""), (3, "query query query")],
        "doc_id long, text string",
    )
    out = masked_lm_scores(df, "text", "doc_id", top_k=3)
    rows = sorted((r.doc_id, r.rank, r.token, r.prob) for r in out.collect())
    assert len(rows) == 9  # 3 docs x top-3
    # driver-side reference for doc 1
    ctx = _context_vector("table fast slow".split())
    probs = _softmax_over({w: _logit(ctx, _embed(w)) for w in sorted(LM_VOCAB)})
    want = sorted(probs.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got1 = [(t, p) for d, _, t, p in rows if d == 1]
    assert got1 == [(w, round(p, 6)) for w, p in want]
    # empty doc → uniform context still yields a full ranking
    assert len([r for r in rows if r[0] == 2]) == 3

    thr = masked_lm_scores(df, "text", "doc_id", top_k=None, threshold=0.05)
    assert all(r.prob >= 0.05 for r in thr.collect())
    tgt = masked_lm_scores(df, "text", "doc_id", top_k=None, targets=["table", "query"])
    assert {r.token for r in tgt.collect()} <= {"table", "query"}
    with pytest.raises(ValueError):
        masked_lm_scores(df, "text", "doc_id", top_k=3, threshold=0.1)


def test_sentiment_softmax_probabilities(spark):
    from pliers_spark.functions.encoder import sentiment_softmax

    df = spark.createDataFrame([(1, "fast table"), (2, "")], "doc_id long, text string")
    rows = {r.doc_id: (r.sent_neg, r.sent_neu, r.sent_pos)
            for r in sentiment_softmax(df, "text", "doc_id").collect()}
    for trip in rows.values():
        assert all(0.0 <= p <= 1.0 for p in trip)
        assert abs(sum(trip) - 1.0) < 1e-4
    # deterministic across runs
    rows2 = {r.doc_id: (r.sent_neg, r.sent_neu, r.sent_pos)
             for r in sentiment_softmax(df, "text", "doc_id").collect()}
    assert rows == rows2

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

"""Batch 30: DoReMi reweighting step, ANN hubness, padding waste."""

import math
import os


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"


def test_doremi_upweights_high_quality_source(spark, tmp_path):
    """A source of long fluent text gains weight relative to its share;
    a source of degenerate one-token docs loses; weights sum to ~1."""
    from pliers_spark.queries import QUERIES

    good = "the quick brown fox jumps over the lazy dog and then it runs far away home tonight"
    rows = [(i, good, "en", "GOOD", 10) for i in range(20)] + [
        (100 + i, "x", "en", "BAD", 1) for i in range(20)
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.source: r for r in QUERIES["doremi_step"](spark, sf).collect()}
    assert out["GOOD"].share_ppm == out["BAD"].share_ppm == 500_000
    assert out["GOOD"].excess > 0 > out["BAD"].excess
    assert out["GOOD"].weight_new > 0.5 > out["BAD"].weight_new
    assert abs(out["GOOD"].weight_new + out["BAD"].weight_new - 1.0) < 2e-6


def test_hubness_planted_hub(spark, tmp_path):
    """One vector close to every other (a hub) vs orthogonal spokes:
    the hub lands in every top-k; spokes are mutually distant, so many
    are never retrieved and skewness is positive."""
    from pliers_spark.queries import QUERIES

    dim = 30
    rows = []
    # hub: the all-ones direction
    rows.append((0, [1.0] * dim, 0))
    # spokes: near-one-hot vectors (cosine ~1/sqrt(30) to the hub, ~0 to
    # each other) — with n >> k the hub lands in every list while most
    # spokes compete for the residual slots
    for i in range(dim):
        v = [0.01] * dim
        v[i] = 5.0
        rows.append((i + 1, v, 0))
    sf = _write(spark, tmp_path, "embeddings", rows,
                "vec_id long, embedding array<float>, label int")
    r = QUERIES["ann_hubness"](spark, sf).collect()[0]
    assert r.n == 31 and r.k == 5
    assert r.max_occ == 30         # the hub is in every spoke's top-5
    assert r.skewness is not None and r.skewness > 1.0


def test_padding_waste_hand_buckets(spark, tmp_path):
    """Docs of 10, 16, 17, 100 tokens -> buckets 16, 16, 32, 128 with
    exact padding counts."""
    from pliers_spark.queries import QUERIES

    def doc(i, n):
        return (i, " ".join(["w"] * n), "en", "A", 1)

    sf = _write(spark, tmp_path, "documents",
                [doc(1, 10), doc(2, 16), doc(3, 17), doc(4, 100)], DOCS)
    out = {r.bucket: r for r in QUERIES["padding_waste"](spark, sf).collect()}
    assert set(out) == {16, 32, 128}
    assert out[16].n_docs == 2 and out[16].padding == 6
    assert out[16].waste_share == round(6 / 32, 6)
    assert out[32].padding == 15 and out[128].padding == 28

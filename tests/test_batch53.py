"""Batch 53: LOO source value, embedding isotropy, MATTR diversity."""

import os


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"


def test_loo_contributions_have_signs(spark, tmp_path):
    """A high-quality source contributes positively, junk negatively,
    and mean_with is identical on every row (it's the corpus mean)."""
    from pliers_spark.queries import QUERIES

    good = "the quick brown fox jumps over the lazy dog and then runs far away home again tonight happily"
    rows = [(i, good, "en", "GOOD", 1) for i in range(20)] + [
        (100 + i, "x", "en", "BAD", 1) for i in range(20)
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.source: r for r in QUERIES["loo_source_value"](spark, sf).collect()}
    assert out["GOOD"].contribution > 0 > out["BAD"].contribution
    assert out["GOOD"].mean_with == out["BAD"].mean_with
    assert out["GOOD"].mean_without < out["BAD"].mean_without


def test_isotropy_common_direction(spark, tmp_path):
    """Vectors = common direction + tiny one-hot: mean cosine near 1
    (anisotropic); orthogonal one-hots: mean cosine near 0."""
    from pliers_spark.queries import QUERIES

    dim = 8
    aniso = [(i, [10.0] * dim, 0) for i in range(6)]
    sf = _write(spark, tmp_path, "embeddings",
                [(i, [10.0 + (0.1 if j == i else 0.0) for j in range(dim)], 0)
                 for i in range(6)],
                "vec_id long, embedding array<float>, label int")
    r = QUERIES["embedding_isotropy"](spark, sf).collect()[0]
    assert r.mean_cosine > 0.99

    iso_rows = []
    for i in range(6):
        v = [0.0] * dim
        v[i] = 1.0
        iso_rows.append((i, v, 0))
    sf2 = _write(spark, tmp_path / "b", "embeddings", iso_rows,
                 "vec_id long, embedding array<float>, label int")
    r2 = QUERIES["embedding_isotropy"](spark, sf2).collect()[0]
    assert r2.mean_abs_cosine == 0.0 and r2.norm_cv == 0.0


def test_mattr_repetitive_vs_diverse(spark, tmp_path):
    """All-same-token text has MATTR = 1/w; all-distinct text has
    MATTR = 1; short docs are excluded."""
    from pliers_spark.queries import QUERIES

    rows = [
        (1, " ".join(["same"] * 50), "en", "A", 1),
        (2, " ".join(f"tok{i}" for i in range(50)), "en", "A", 1),
        (3, "too short", "en", "A", 1),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.doc_id: r for r in QUERIES["mattr_diversity"](spark, sf).collect()}
    assert set(out) == {1, 2}
    assert out[1].mattr == round(1 / 25, 6)
    assert out[2].mattr == 1.0
    assert out[1].n_windows == out[2].n_windows == 26

"""Batch 96: LOF, SymSpell correction, percolation audit."""

import os


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"
EMB = "vec_id long, embedding array<float>, label int"


def test_lof_flags_isolated_point(spark, tmp_path):
    """A tight 8-point cluster plus one far outlier (all vec_id % 3 == 0
    so the sample keeps them): the outlier's LOF is much larger."""
    from pliers_spark.queries import QUERIES

    rows = []
    for i in range(8):
        v = [0.1 * ((i * 3 + j) % 4) for j in range(8)]
        rows.append((3 * i, [float(x) for x in v] + [0.0] * 56, 0))
    rows.append((3 * 8, [50.0] * 8 + [0.0] * 56, 0))
    sf = _write(spark, tmp_path, "embeddings", rows, EMB)
    out = {r.vec_id: r.lof for r in QUERIES["lof_scores"](spark, sf).collect()}
    assert len(out) == 9
    inliers = [out[3 * i] for i in range(8)]
    assert out[24] > 5 * max(inliers)
    assert all(0.5 < v < 2.0 for v in inliers)


def test_symspell_corrects_deletion_and_substitution(spark, tmp_path):
    """'sparkk' (hapax, ed-1 insert) and 'sperk' (substitution) both
    suggest 'spark'; an unrelated hapax gets no row."""
    from pliers_spark.queries import QUERIES

    common = " ".join(["spark"] * 5 + ["table"] * 4)
    rows = [
        (0, common, "en", "s", len(common)),
        (1, "sparkk sperk zzzzqqq", "en", "s", 20),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.token: r for r in QUERIES["symspell_correct"](spark, sf).collect()}
    assert out["sparkk"].suggestion == "spark" and out["sparkk"].suggestion_count == 5
    assert out["sperk"].suggestion == "spark"
    assert "zzzzqqq" not in out


def test_symspell_prefers_higher_count(spark, tmp_path):
    """Typo equidistant from two vocab words: picks the more frequent."""
    from pliers_spark.queries import QUERIES

    text = " ".join(["cart"] * 3 + ["card"] * 10)
    rows = [(0, text, "en", "s", len(text)), (1, "carf", "en", "s", 4)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.token: r for r in QUERIES["symspell_correct"](spark, sf).collect()}
    assert out["carf"].suggestion == "card" and out["carf"].suggestion_count == 10


def test_percolation_monotone(spark):
    """More retained edges at higher p: giant fraction grows, component
    count shrinks (weakly)."""
    from pliers_spark.queries import QUERIES

    out = {r.p_pct: r for r in QUERIES["percolation_audit"](spark, "/root/testdata/sf0.001").collect()}
    assert set(out) == {30, 60}
    assert out[60].n_edges_kept >= out[30].n_edges_kept
    assert out[60].giant_frac >= out[30].giant_frac
    assert out[60].n_components <= out[30].n_components

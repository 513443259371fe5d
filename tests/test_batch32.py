"""Batch 32: KMV sketches (distinct, Jaccard) and Bloom FPR audit."""

import os


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"


def test_kmv_exact_below_k(spark, tmp_path):
    """Fewer than k distinct tokens -> the sketch IS the set: estimate
    equals exact and rel_err is 0."""
    from pliers_spark.queries import QUERIES

    rows = [(i, "alpha beta gamma delta", "en", "A", 1) for i in range(10)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["kmv_distinct"](spark, sf).collect()[0]
    assert r.exact_distinct == 4
    assert r.est_distinct == 4.0 and r.rel_err == 0.0


def test_kmv_estimate_tracks_truth_above_k(spark, tmp_path):
    """A 500-token vocabulary (>> k=64) estimates within ~35% (k=64 has
    ~12.5% standard error; 35% is a deterministic-seed-safe bound)."""
    from pliers_spark.queries import QUERIES

    text = " ".join(f"tok{i}" for i in range(500))
    rows = [(1, text, "en", "A", 1)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["kmv_distinct"](spark, sf).collect()[0]
    assert r.exact_distinct == 500
    assert abs(r.rel_err) < 0.35
    assert abs(abs(r.est_distinct - 500) / 500 - abs(r.rel_err)) < 1e-6


def test_kmv_overlap_extremes(spark, tmp_path):
    """Identical vocabularies -> j_est = j_exact = 1; disjoint -> 0."""
    from pliers_spark.queries import QUERIES

    va = " ".join(f"a{i}" for i in range(40))
    vb = " ".join(f"b{i}" for i in range(40))
    rows = [
        (1, va, "en", "A", 1),
        (2, va, "en", "B", 1),   # B identical to A
        (3, vb, "en", "C", 1),   # C disjoint
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {(r.src_a, r.src_b): r for r in QUERIES["kmv_overlap"](spark, sf).collect()}
    assert out[("A", "B")].j_est == 1.0 and out[("A", "B")].j_exact == 1.0
    assert out[("A", "C")].j_est == 0.0 and out[("A", "C")].j_exact == 0.0
    assert out[("A", "B")].abs_err == 0.0


def test_bloom_audit_counts_are_consistent(spark):
    """On the real sf0.001 corpus: probes are genuinely absent from the
    filter's input, FP count <= probes, and theory is the textbook value."""
    import math

    from pliers_spark.queries import QUERIES

    r = QUERIES["bloom_fpr_audit"](spark, "/root/testdata/sf0.001").collect()[0]
    assert 0 <= r.n_fp <= r.n_probes
    want = round((1.0 - math.exp(-3.0 * r.n_inserted / 1024)) ** 3, 6)
    assert r.fpr_theory == want
    if r.n_probes:
        assert r.fpr_observed == round(r.n_fp / r.n_probes, 6)

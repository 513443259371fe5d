"""Batch 28: 1-D Wasserstein drift, TextTiling gaps, degree assortativity."""

import os


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"


def test_wasserstein_point_masses(spark, tmp_path):
    """Point mass at 10 vs point mass at 17 -> W1 = 7 exactly; identical
    distributions -> W1 = 0."""
    from pliers_spark.queries import QUERIES

    rows = (
        [(i, "x", "en", "A", 10) for i in range(5)]
        + [(50 + i, "x", "en", "B", 17) for i in range(5)]
        + [(100 + i, "x", "en", "C", 10) for i in range(5)]
    )
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {(r.src_a, r.src_b): r.w1 for r in QUERIES["wasserstein_1d"](spark, sf).collect()}
    assert out[("A", "B")] == 7.0
    assert out[("A", "C")] == 0.0
    assert out[("B", "C")] == 7.0


def test_wasserstein_mixture(spark, tmp_path):
    """A = half at 0, half at 10; B = all at 0 -> W1 = 5 (half the mass
    moves 10)."""
    from pliers_spark.queries import QUERIES

    rows = (
        [(i, "x", "en", "A", 0) for i in range(5)]
        + [(10 + i, "x", "en", "A", 10) for i in range(5)]
        + [(100 + i, "x", "en", "B", 0) for i in range(10)]
    )
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {(r.src_a, r.src_b): r.w1 for r in QUERIES["wasserstein_1d"](spark, sf).collect()}
    assert out[("A", "B")] == 5.0


def test_texttiling_topic_shift_valley(spark, tmp_path):
    """Three 10-token blocks: A-topic, A-topic, B-topic. Gap 0 (A~A) has
    high cohesion; gap 1 (A~B) cosine 0. With only two gaps the edge
    coalesce makes gap 1 a valley iff it undercuts gap 0."""
    from pliers_spark.queries import QUERIES

    blk_a = "apple banana cherry date egg fig grape honey ice jam"
    blk_b = "zebra yak xerus wolf viper urchin tiger snake raven quail"
    rows = [(1, f"{blk_a} {blk_a} {blk_b}", "en", "A", 1)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.gap_idx: r for r in QUERIES["texttiling_gaps"](spark, sf).collect()}
    assert out[0].cosine == 1.0 and out[1].cosine == 0.0
    assert out[1].is_valley and not out[0].is_valley


def test_assortativity_star_is_negative(spark, tmp_path):
    """A star graph (hub in every basket with a distinct leaf) is maximally
    disassortative -> coefficient -1; a clique is degree-regular -> NULL."""
    from pliers_spark.queries import QUERIES

    star = [(k, 1) for k in range(10, 16)] + [(k, k) for k in range(10, 16)]
    sf = _write(spark, tmp_path, "lineitem", star, "l_orderkey long, l_partkey long")
    r = QUERIES["degree_assortativity"](spark, sf).collect()[0]
    assert r.n_edges == 6 and r.assortativity == -1.0

    clique = [(99, p) for p in (1, 2, 3, 4)]
    sf2 = _write(spark, tmp_path / "c", "lineitem", clique, "l_orderkey long, l_partkey long")
    r2 = QUERIES["degree_assortativity"](spark, sf2).collect()[0]
    assert r2.n_edges == 6 and r2.assortativity is None

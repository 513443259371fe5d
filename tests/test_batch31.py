"""Batch 31: KWIC concordance, Zipf Hill exponent, dup-size histogram."""

import math
import os


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"


def test_kwic_contexts_and_edges(spark, tmp_path):
    """Contexts clip at doc edges; term picked by frequency (>=4 chars)."""
    from pliers_spark.queries import QUERIES

    rows = [
        (1, "zzzz alpha beta gamma zzzz delta", "en", "A", 1),
        (2, "zzzz starts and ends with zzzz", "en", "A", 1),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {(r.doc_id, r.pos): r for r in QUERIES["kwic_concordance"](spark, sf).collect()}
    # 'zzzz' occurs 4x, every other >=4-char token at most 2x
    assert all(r.term == "zzzz" for r in out.values())
    assert out[(1, 1)].left_ctx == "" and out[(1, 1)].right_ctx == "alpha beta gamma"
    assert out[(1, 5)].left_ctx == "alpha beta gamma" and out[(1, 5)].right_ctx == "delta"
    assert out[(2, 6)].right_ctx == ""  # doc-final occurrence


def test_zipf_alpha_exact_geometric(spark, tmp_path):
    """Frequencies 8,4,2,1 for the only 4 tokens -> Hill alpha has a
    closed form: 1 + k / sum(ln(f_i/f_min)) with k=4."""
    from pliers_spark.queries import QUERIES

    text = " ".join(["aa"] * 8 + ["bb"] * 4 + ["cc"] * 2 + ["dd"])
    sf = _write(spark, tmp_path, "documents", [(1, text, "en", "A", 1)], DOCS)
    r = QUERIES["zipf_alpha"](spark, sf).collect()[0]
    assert r.k == 4 and r.f_k == 1
    lsum = sum(round(1e6 * math.log(f)) for f in (8, 4, 2, 1))
    assert r.alpha_hill == round(1 + 4 * 1e6 / lsum, 6)


def test_dup_histogram_partitions_corpus(spark, tmp_path):
    """Identical docs collapse into one cluster; the histogram's
    size*count total equals the corpus size."""
    from pliers_spark.queries import QUERIES

    dup = "this exact sentence is repeated verbatim in several documents today"
    rows = [(i, dup, "en", "A", 1) for i in range(4)] + [
        (100 + i, f"unique{i} content nothing like others {'x' * (i + 1)} varied words here", "en", "A", 1)
        for i in range(3)
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = QUERIES["dup_size_histogram"](spark, sf).collect()
    total = sum(r.cluster_size * r.n_clusters for r in out)
    assert total == 7
    assert any(r.cluster_size >= 4 and r.n_clusters >= 1 for r in out)

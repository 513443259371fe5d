"""Batch 39: k-anonymity audit, mutual kNN mining, stopword induction."""

import os


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"


def test_k_anonymity_counts(spark, tmp_path):
    """One big safe group (10 rows) + one singleton -> 1 row at risk,
    min group 1; l-diversity = distinct langs in the least-diverse group."""
    from pliers_spark.queries import QUERIES

    rows = [(i, "x", "en" if i % 2 else "de", "A", 150) for i in range(10)]
    rows.append((99, "x", "fr", "B", 950))  # unique (B, bucket 9) group
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["k_anonymity"](spark, sf).collect()[0]
    assert r.n_groups == 2 and r.n_rows == 11
    assert r.rows_at_risk == 1 and r.min_group_size == 1
    assert r.risk_share == round(1 / 11, 6)
    assert r.min_l_diversity == 1  # the singleton has one lang


def test_mutual_knn_planted_pair(spark, tmp_path):
    """Two near-identical vectors in a bucket of scattered ones must be
    each other's top-1 (a mutual pair) with margin > 1."""
    from pliers_spark.queries import QUERIES

    dim = 8
    rows = [
        (0, [1.0, 1.0] + [0.0] * (dim - 2), 0),
        (1, [1.0, 0.9] + [0.0] * (dim - 2), 0),
    ]
    for i in range(6):  # scattered one-hots
        v = [0.0] * dim
        v[2 + (i % (dim - 2))] = 1.0 + 0.1 * i
        rows.append((10 + i, v, 0))
    sf = _write(spark, tmp_path, "embeddings", rows,
                "vec_id long, embedding array<float>, label int")
    out = {(r.id_a, r.id_b): r for r in QUERIES["mutual_knn"](spark, sf).collect()}
    assert (0, 1) in out
    r = out[(0, 1)]
    assert r.cosine > 0.99
    assert r.margin_a > 1.0 and r.margin_b > 1.0


def test_stopword_discovery_min_across_sources(spark, tmp_path):
    """'the' appears in every doc of both sources -> rank 1 with share
    1e6; a token frequent in only one source must NOT qualify."""
    from pliers_spark.queries import QUERIES

    rows = [(i, "the common words here", "en", "A", 1) for i in range(10)] + [
        (100 + i, "the jargon jargon jargon stuff", "en", "B", 1) for i in range(10)
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.token: r for r in QUERIES["stopword_discovery"](spark, sf).collect()}
    assert out["the"].min_share_ppm == 1_000_000 and out["the"].rank == 1
    assert "jargon" not in out    # absent from source A
    assert "common" not in out    # absent from source B

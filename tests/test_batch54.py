"""Batch 54: Moore-Lewis CED selection, OOV rate."""

import os


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"


def test_moore_lewis_selects_in_domain(spark, tmp_path):
    """Docs written in the in-domain phrasing score positive CED; docs
    in the out-domain phrasing score negative."""
    from pliers_spark.queries import QUERIES

    in_dom = "alpha beta gamma delta " * 8
    out_dom = "alpha omega beta psi gamma chi delta phi " * 4  # shared unigrams,
    # different transitions -> the general model's p(beta|alpha) is diluted
    rows = [(i, in_dom, "en", "A", 1) for i in range(15)] + [
        (100 + i, out_dom, "zh", "B", 1) for i in range(15)
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.doc_id: r for r in QUERIES["moore_lewis"](spark, sf).collect()}
    assert out[0].ced > 0 and out[0].selected
    assert out[100].ced < 0 and not out[100].selected


def test_oov_rate_planted(spark, tmp_path):
    """With >1000 distinct filler tokens hogging... here vocab covers all
    of source A; source B is half rare tokens that still fit the top-1000
    when vocabulary is small -> craft true OOV by exceeding 1000 types."""
    from pliers_spark.queries import QUERIES

    common = " ".join(f"c{i}" for i in range(50))  # frequent, in-vocab
    rows = [(i, common, "en", "A", 1) for i in range(30)]
    # source B emits 1500 distinct singletons -> most fall out of top-1000
    for j in range(30):
        rare = " ".join(f"r{j}_{k}" for k in range(50))
        rows.append((1000 + j, rare, "en", "B", 1))
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.source: r for r in QUERIES["oov_rate"](spark, sf).collect()}
    assert out["A"].oov_rate == 0.0
    assert out["B"].n_oov > 0 and out["B"].oov_rate > 0.3

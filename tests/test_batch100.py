"""Batch 100: logistic IRLS and batch-subgradient SVM."""

import os


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"


def _separable_docs():
    """Long docs are English, short docs are French — cleanly separable
    on n_chars (and token count)."""
    rows = []
    did = 0
    for i in range(20):
        rows.append((did, " ".join(["w"] * 50), "en", "s", 800 + i))
        did += 1
    for i in range(20):
        rows.append((did, " ".join(["w"] * 5), "fr", "s", 100 + i))
        did += 1
    return rows


def test_logistic_irls_separates(spark, tmp_path):
    from pliers_spark.queries import QUERIES

    sf = _write(spark, tmp_path, "documents", _separable_docs(), DOCS)
    r = QUERIES["logistic_irls"](spark, sf).collect()[0]
    assert r.n == 40
    assert r.coef_nchars > 0  # longer -> more likely English
    assert r.train_acc == 1.0


def test_logistic_irls_null_relation(spark, tmp_path):
    """Label independent of length: coefficient stays near 0 and
    accuracy near the base rate."""
    from pliers_spark.queries import QUERIES

    rows = [(i, "w", "en" if i % 2 else "fr", "s", 500 + (i % 7)) for i in range(40)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["logistic_irls"](spark, sf).collect()[0]
    assert abs(r.coef_nchars) < 0.05
    assert 0.4 <= r.train_acc <= 0.75


def test_svm_separates(spark, tmp_path):
    from pliers_spark.queries import QUERIES

    sf = _write(spark, tmp_path, "documents", _separable_docs(), DOCS)
    r = QUERIES["svm_batch_subgradient"](spark, sf).collect()[0]
    assert r.n == 40
    # hyperplane orients long docs positive (English)
    assert r.w_len > 0 or r.w_tok > 0
    # 5 batch steps already classify the separable data perfectly by
    # SIGN (the margin-1 band takes more steps to clear)
    assert r.train_acc == 1.0
    assert r.n_margin_violations <= 40

"""Batch 38: snapshot time travel, Cohen's kappa, posting compression."""

import os


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"


def test_snapshot_asof_isolation(spark, tmp_path):
    """As-of read sees only snapshot-1 rows; current sees both; the
    incremental delta is exactly snapshot 2's contribution."""
    from pliers_spark.queries import QUERIES

    rows = [(i, "x", "en", "A", 10 * (i + 1)) for i in range(9)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.snapshot_label: r for r in QUERIES["snapshot_asof"](spark, sf).collect()}
    s1 = [r for r in rows if r[0] % 3 == 0]
    s2 = [r for r in rows if r[0] % 3 == 1]
    assert out["asof_s1"].n_docs == len(s1)
    assert out["asof_s1"].sum_chars == sum(r[4] for r in s1)
    assert out["delta_s2"].n_docs == len(s2)
    assert out["current"].n_docs == len(s1) + len(s2)
    assert out["current"].sum_chars == out["asof_s1"].sum_chars + out["delta_s2"].sum_chars


def test_kappa_extremes(spark, tmp_path):
    """Signals engineered to always agree -> kappa undefined-free and
    equals 1 when both marginals are mixed; total disagreement -> < 0."""
    from pliers_spark.queries import QUERIES

    good = " ".join(["veryrealword"] * 40)   # >=30 tokens, decent quality
    short_junk = "zz zz"                      # <30 tokens, low quality
    rows = [(i, good, "en", "A", 1) for i in range(10)] + [
        (100 + i, short_junk, "en", "A", 1) for i in range(10)
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["classifier_kappa"](spark, sf).collect()[0]
    assert r.n == 20 and r.agree == 20
    assert r.kappa == 1.0


def test_posting_compression_hand_gaps(spark, tmp_path):
    """Token in docs {1,2,3,...,8}: gaps of 1 encode in 1 bit each;
    Elias-gamma sizes match the closed form."""
    from pliers_spark.queries import QUERIES

    rows = [(i, "common filler words", "en", "A", 1) for i in range(1, 9)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.token: r for r in QUERIES["posting_compression"](spark, sf).collect()}
    r = out["common"]
    assert r.df == 8 and r.raw_bits == 512
    # first posting: doc_id 1 -> encode 2 -> 2*1+1 = 3 bits; 7 gaps of 1 -> 1 bit each
    assert r.gamma_bits == 3 + 7 * 1
    assert r.ratio == round(10 / 512, 6)

"""Batch 90: props schema drift, MMD-RFF two-sample, Cochran-Armitage."""

import os
from datetime import datetime


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"
EVENTS = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
EMB = "vec_id long, embedding array<float>, label int"


def test_props_schema_drift(spark, tmp_path):
    """Jan: {a,b}; Feb: {b,c,d}; Mar: {d}. New: Feb=2, Mar=0.
    Dropped: Feb=1 (a), Mar=2 (b,c)."""
    from pliers_spark.queries import QUERIES

    rows = [
        (0, datetime(2024, 1, 5), 1, "c", 1.0, '{"a": 1, "b": 2}'),
        (1, datetime(2024, 2, 5), 1, "c", 1.0, '{"b": 1, "c": 2, "d": 3}'),
        (2, datetime(2024, 3, 5), 1, "c", 1.0, '{"d": 9}'),
    ]
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = {r.month.month: r for r in QUERIES["props_schema_drift"](spark, sf).collect()}
    assert out[1].n_keys == 2 and out[1].n_new == 0 and out[1].n_dropped == 0
    assert out[2].n_keys == 3 and out[2].n_new == 2 and out[2].n_dropped == 1
    assert out[3].n_keys == 1 and out[3].n_new == 0 and out[3].n_dropped == 2


def test_mmd_rff_separated_vs_identical(spark, tmp_path):
    """Well-separated clusters give a much larger MMD^2 than two
    samples from the same tight cluster."""
    from pliers_spark.queries import QUERIES

    def vec(base, i):
        v = [base] * 64
        v[i % 64] += 0.01
        return [float(x) for x in v]

    far = [(i, vec(0.0, i), 0) for i in range(20)]
    far += [(100 + i, vec(1.0, i), 1) for i in range(20)]
    sf1 = _write(spark, tmp_path, "embeddings", far, EMB)
    mmd_far = QUERIES["mmd_rff"](spark, sf1).collect()[0]

    near = [(i, vec(0.0, i), 0) for i in range(20)]
    near += [(100 + i, vec(0.0, i + 7), 1) for i in range(20)]
    sf2 = _write(spark, tmp_path, "embeddings", near, EMB)
    mmd_near = QUERIES["mmd_rff"](spark, sf2).collect()[0]

    assert mmd_far.n_a == 20 and mmd_far.n_b == 20
    assert mmd_far.mmd2 > 10 * max(mmd_near.mmd2, 1e-6)
    assert mmd_near.mmd2 < 0.05


def test_cochran_armitage_trend_sign(spark, tmp_path):
    """English share rising with length bin -> positive z; flat share
    -> z ~ 0."""
    from pliers_spark.queries import QUERIES

    rows = []
    did = 0
    for k in range(5):
        n_en = 2 + 2 * k  # rising with k
        for i in range(10):
            lang = "en" if i < n_en else "fr"
            rows.append((did, "t", lang, "s", 200 * k + 50))
            did += 1
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    r = QUERIES["cochran_armitage"](spark, sf).collect()[0]
    assert r.n == 50 and r.z_trend > 3

    flat = [(i, "t", "en" if i % 2 else "fr", "s", 200 * (i % 5) + 50) for i in range(50)]
    sf2 = _write(spark, tmp_path, "documents", flat, DOCS)
    r2 = QUERIES["cochran_armitage"](spark, sf2).collect()[0]
    assert abs(r2.z_trend) < 1

"""Batch 108: QTE deciles, MCC confusion, lexical density."""

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


def test_qte_uniform_shift(spark, tmp_path):
    """click = view + 5 pointwise: every decile QTE is exactly 5."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    for i in range(20):
        rows.append((eid, datetime(2024, 1, 1, 0, 0, eid), eid, "view", float(i), "{}")); eid += 1
        rows.append((eid, datetime(2024, 1, 1, 0, 0, eid), eid, "click", float(i + 5), "{}")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = {r.decile: r for r in QUERIES["qte_deciles"](spark, sf).collect()}
    assert set(out) == set(range(1, 10))
    assert all(r.qte == 5.0 for r in out.values())


def test_qte_tail_only_shift(spark, tmp_path):
    """Only the top quarter of click values shifted: early deciles 0,
    late deciles positive."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    for i in range(20):
        rows.append((eid, datetime(2024, 1, 1, 0, 0, eid), eid, "view", float(i), "{}")); eid += 1
        v = float(i) + (50.0 if i >= 15 else 0.0)
        rows.append((eid, datetime(2024, 1, 1, 0, 0, eid), eid, "click", v, "{}")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = {r.decile: r for r in QUERIES["qte_deciles"](spark, sf).collect()}
    assert out[2].qte == 0.0 and out[5].qte == 0.0
    assert out[9].qte == 50.0


def test_mcc_perfect_and_random(spark, tmp_path):
    from pliers_spark.queries import QUERIES

    perfect = [(i, "t", "en" if i < 10 else "fr", "s", 600 if i < 10 else 100) for i in range(20)]
    sf = _write(spark, tmp_path, "documents", perfect, DOCS)
    r = QUERIES["mcc_confusion"](spark, sf).collect()[0]
    assert (r.tp, r.tn, r.fp, r.fn) == (10, 10, 0, 0)
    assert r.mcc == 1.0 and r.balanced_acc == 1.0 and r.f1 == 1.0

    anti = [(i, "t", "en" if i < 10 else "fr", "s", 100 if i < 10 else 600) for i in range(20)]
    sf2 = _write(spark, tmp_path, "documents", anti, DOCS)
    r2 = QUERIES["mcc_confusion"](spark, sf2).collect()[0]
    assert r2.mcc == -1.0 and r2.balanced_acc == 0.0


def test_lexical_density_contrast(spark, tmp_path):
    """A content-heavy doc (suffix-tagged adjectives/verbs) scores
    higher than a function-word string."""
    from pliers_spark.queries import QUERIES

    rows = [
        (0, "running jumped quickly beautiful useful walking", "en", "s", 48),
        (1, "the of and to in that it with", "en", "s", 30),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.doc_id: r for r in QUERIES["lexical_density"](spark, sf).collect()}
    assert out[0].lexical_density > 0.8
    assert out[1].lexical_density < out[0].lexical_density

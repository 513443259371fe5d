"""Batch 82: zone-map skipping audit, Rocchio expansion, Holm step-down."""

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


def test_minmax_skipping_flags(spark, tmp_path):
    """Bucket 0 all below range -> skippable; bucket 1 straddles with a
    real match -> kept, not FP; bucket 2 straddles (1..100) but no row
    in [50,60] -> false positive."""
    from pliers_spark.queries import QUERIES

    rows = []
    for i in range(500):  # bucket 0: values ~ 10
        rows.append((i, datetime(2024, 1, 1), i, "c", 10.0, "{}"))
    for i in range(500, 1000):  # bucket 1: 40..70 includes 55
        rows.append((i, datetime(2024, 1, 1), i, "c", 40.0 + 30.0 * (i - 500) / 499, "{}"))
    for i in range(1000, 1500):  # bucket 2: only 1 and 100
        rows.append((i, datetime(2024, 1, 1), i, "c", 1.0 if i % 2 else 100.0, "{}"))
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = {r.bucket: r for r in QUERIES["minmax_skipping"](spark, sf).collect()}
    assert out[0].skippable == 1 and out[0].n_match == 0 and out[0].false_positive == 0
    assert out[1].skippable == 0 and out[1].n_match > 0 and out[1].false_positive == 0
    assert out[2].skippable == 0 and out[2].n_match == 0 and out[2].false_positive == 1


def test_rocchio_expansion_surfaces_cooccurring_term(spark, tmp_path):
    """Docs about the query terms also contain 'shuffle'; an off-topic
    doc's vocab ('alpha') must not outrank it. Original terms carry the
    alpha=1 boost."""
    from pliers_spark.queries import QUERIES

    rows = [
        (0, "spark join data shuffle", "en", "s", 20),
        (1, "spark join data shuffle", "en", "s", 20),
        (2, "alpha beta gamma delta", "en", "s", 20),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.term: r for r in QUERIES["rocchio_expand"](spark, sf).collect()}
    assert out["spark"].in_original == 1
    # expansion term from feedback docs
    assert "shuffle" in out
    # alpha-boosted originals outrank pure-feedback terms
    assert out["spark"].w_fp > out["shuffle"].w_fp
    # doc 2 scores 0 on the query -> excluded from the feedback set,
    # so its vocabulary must not leak into the expansion
    assert "alpha" not in out
    # shuffle weight = sum over 2 feedback docs of round(1e6*0.75*1/4/10)
    assert out["shuffle"].w_fp == 2 * round(1e6 * 0.75 * 1 / 4 / 10)


def test_holm_stepdown_stops_at_first_failure(spark, tmp_path):
    """Construct 3 sources: one wildly shifted (tiny p), two ~null.
    Holm must reject a prefix only — nothing after the first keep."""
    from pliers_spark.queries import QUERIES

    rows = []
    did = 0
    for i in range(40):  # source A: length 100 +/- 1 — clearly shifted vs B/C
        rows.append((did, "t", "en", "A", 1000 + (i % 3)))
        did += 1
    for src in ("B", "C"):
        for i in range(40):
            rows.append((did, "t", "en", src, 100 + (i % 5) + (3 if src == "C" else 0)))
            did += 1
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = sorted(QUERIES["holm_bonferroni"](spark, sf).collect(), key=lambda r: r.rank)
    # rejected set is a prefix of the rank order
    rejected = [r.rejected for r in out]
    assert rejected == sorted(rejected, reverse=True)
    # the shifted source has the smallest p and is rejected
    assert out[0].source == "A" and out[0].rejected
    # thresholds step: alpha/m, alpha/(m-1), alpha/1
    assert out[0].holm_threshold < out[-1].holm_threshold

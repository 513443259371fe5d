"""Batch 97: ECOD outliers, watermark audit, vocab retention."""

import os
from datetime import datetime, timedelta


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


def test_ecod_extreme_point_scores_highest(spark, tmp_path):
    """ECOD is rank-based: the point at the extreme rank of EVERY
    dimension dominates; permutation-spread inliers never are."""
    from pliers_spark.queries import QUERIES

    perms = [1, 2, 4, 5, 8, 10, 11, 13]
    rows = []
    for i in range(20):
        v = [0.01 * (((i + 1) * p) % 21) for p in perms]
        rows.append((i, [float(x) for x in v] + [0.0] * 56, 0))
    rows.append((20, [99.0] * 8 + [0.0] * 56, 0))
    sf = _write(spark, tmp_path, "embeddings", rows, EMB)
    out = {r.vec_id: r.ecod_score for r in QUERIES["ecod_scores"](spark, sf).collect()}
    assert max(out, key=out.get) == 20
    # outlier is rank-extreme in all 8 dims: score = 8*ln(21)
    import math

    assert abs(out[20] - round(8 * round(1e6 * math.log(21)) / 1e6, 6)) < 1e-5


def test_watermark_audit_quantiles(spark, tmp_path):
    """100 in-order events + 1 event arriving 10s late: n_late counts
    the stragglers behind the running max, p99 <= max = observed worst
    lateness."""
    from pliers_spark.queries import QUERIES

    rows = []
    base = datetime(2024, 1, 1)
    for i in range(100):
        rows.append((i, base + timedelta(seconds=i), i, "c", 1.0, "{}"))
    # arrival 100 carries an event time 10s older than the max seen
    rows.append((100, base + timedelta(seconds=89), 100, "c", 1.0, "{}"))
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    r = QUERIES["watermark_audit"](spark, sf).collect()[0]
    assert r.n_events == 101 and r.n_late == 1
    assert r.p50_s == 0.0
    assert r.max_s == 10.0
    assert r.p99_s <= r.max_s


def test_vocab_retention_rates(spark, tmp_path):
    """Period 0: {a,b,c,d}; period 1: {a,b,x}: retention 2/4 = 0.5,
    half-life = ln2/ln2 = 1 period."""
    from pliers_spark.queries import QUERIES

    rows = [
        (0, "a b c d", "en", "s", 7),     # mi 0
        (1, "a b x", "en", "s", 5),       # mi 1
        (2, "a q r s t u", "en", "s", 11),  # mi 2: retains only 'a' of {a,b,x}
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.period: r for r in QUERIES["vocab_retention"](spark, sf).collect()}
    assert out[0].vocab == 4 and out[0].retention_rate is None
    assert out[1].vocab == 3 and out[1].n_retained == 2
    assert out[1].retention_rate == 0.5 and out[1].half_life_periods == 1.0
    assert out[2].n_retained == 1
    assert abs(out[2].retention_rate - round(1 / 3, 6)) < 1e-9

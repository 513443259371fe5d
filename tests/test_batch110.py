"""Batch 110: Dalenius-Hodges strata, Hotelling T2, prefix branching."""

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


def test_dalenius_hodges_partitions(spark, tmp_path):
    """Strata are contiguous, ordered, cover all rows, and a
    right-skewed distribution gets narrower top strata."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    # heavy mass at low values, sparse tail to 1000
    for i in range(900):
        rows.append((eid, datetime(2024, 1, 1, 0, 0, 0, eid), eid, "c", float(i % 100), "{}")); eid += 1
    for i in range(100):
        rows.append((eid, datetime(2024, 1, 1, 0, 1, 0, eid), eid, "c", 100.0 + 9 * i, "{}")); eid += 1
    sf = _write(spark, tmp_path, "events", rows, EVENTS)
    out = sorted(QUERIES["dalenius_hodges"](spark, sf).collect(), key=lambda r: r.stratum)
    assert sum(r.n for r in out) == 1000
    for i in range(len(out) - 1):
        assert out[i].bin_hi < out[i + 1].bin_lo  # contiguous, ordered
    # skew: the dense low region is split into multiple strata
    assert out[0].bin_hi <= 10


def test_hotelling_detects_correlated_shift(spark, tmp_path):
    """Means shifted along the correlated direction: T2 large. Same
    means: T2 ~ 0."""
    from pliers_spark.queries import QUERIES

    def mk(shift):
        rows = []
        for i in range(30):
            base = 0.01 * ((i * 7) % 10)
            a, b = base, base * 0.9 + 0.001 * (i % 3)
            rows.append((i, [a, b] + [0.0] * 62, 0))
            rows.append((100 + i, [a + shift, b + shift] + [0.0] * 62, 1))
        return rows

    sf = _write(spark, tmp_path, "embeddings", mk(0.5), EMB)
    hi = QUERIES["hotelling_t2"](spark, sf).collect()[0]
    sf2 = _write(spark, tmp_path, "embeddings", mk(0.0), EMB)
    lo = QUERIES["hotelling_t2"](spark, sf2).collect()[0]
    assert hi.n1 == 30 and hi.n2 == 30
    assert hi.t2 > 100 * max(lo.t2, 1e-6)
    assert hi.f_stat > 0


def test_prefix_branching_shape(spark, tmp_path):
    """More distinct prefixes at larger k; fanout decreasing."""
    from pliers_spark.queries import QUERIES

    words = ["apple", "apply", "apples", "banana", "band", "bandit", "cat", "car", "carbon"]
    rows = [(0, " ".join(words), "en", "s", 60)]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.k: r for r in QUERIES["prefix_branching"](spark, sf).collect()}
    assert out[1].n_prefixes == 3  # a, b, c
    assert out[3].n_prefixes == 4  # app, ban, cat, car
    assert all(out[k].n_prefixes <= out[k + 1].n_prefixes for k in range(1, 5))
    assert out[1].avg_fanout >= out[5].avg_fanout

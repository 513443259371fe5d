"""Sequence packing (distributed prefix sum) and mixture balancing."""

import pyspark.sql.functions as F

from pliers_spark.operators.curation import mixture_sample
from pliers_spark.operators.packing import pack_sequences


def _docs(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


def test_pack_invariant_to_bucket_count(spark):
    # the two-level scan must equal the global prefix sum no matter how
    # many buckets carry it — including the degenerate 1-bucket case
    rows = [(i, "w " * (i % 7 + 1)) for i in range(200)]
    df = _docs(spark, rows)
    ref = sorted(pack_sequences(df, num_buckets=1).collect())
    for b in (8, 32):
        assert sorted(pack_sequences(df, num_buckets=b).collect()) == ref


def test_pack_placement_is_consistent(spark):
    rows = [(i, "a b c d e") for i in range(50)]  # 5 tokens each
    out = pack_sequences(_docs(spark, rows), seq_len=16).collect()
    total = sum(r.n_tokens for r in out)
    assert total == 250
    for r in out:
        assert 0 <= r.pack_offset < 16
        assert r.spans_boundary == (r.pack_offset + r.n_tokens > 16)
    # starts are a permutation of the exclusive prefix sums: all distinct,
    # max start + its n_tokens == total
    starts = sorted(r.pack_id * 16 + r.pack_offset for r in out)
    assert len(set(starts)) == len(out)
    assert starts[0] == 0


def test_pack_big_window_is_bucket_partitioned(spark):
    # the data-sized Window must be partitioned by bucket; only the
    # B-row bucket-totals window may be single-partition
    df = _docs(spark, [(i, "a b c") for i in range(20)])
    plan = pack_sequences(df)._jdf.queryExecution().executedPlan().toString()
    import re

    wins = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    # at least one window partitioned by bucket (the data-sized local cumsum)
    assert any("bucket" in w for w in wins), plan


def test_mixture_sample_equalizes_groups(spark):
    rows = [(i, f"text body {i}", "big") for i in range(300)] + [
        (1000 + i, f"other {i}", "small") for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = mixture_sample(df).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # smallest group: rate 1 → all kept, weight exactly 1
    assert len(by_src["small"]) == 30
    assert all(r.sample_weight == 1.0 for r in by_src["small"])
    # big group: ~10% kept (hash-deterministic), weight = 300/30
    assert 10 <= len(by_src["big"]) <= 60
    assert all(r.sample_weight == 10.0 for r in by_src["big"])
    # determinism
    assert sorted(out) == sorted(mixture_sample(df).collect())


def test_temperature_sample_sqrt_mixture(spark):
    from pliers_spark.operators.curation import temperature_sample

    rows = [(i, f"text body {i}", "big") for i in range(400)] + [
        (1000 + i, f"other {i}", "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = temperature_sample(df).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # smallest group: keep_prob exactly 1 → all kept
    assert len(by_src["small"]) == 100
    assert all(r.keep_prob == 1.0 for r in by_src["small"])
    # big group: p = sqrt(100/400) = 0.5 → ~200 kept (hash-deterministic)
    assert all(r.keep_prob == 0.5 for r in by_src["big"])
    assert 150 <= len(by_src["big"]) <= 250
    # flattens but does NOT equalize: big still outnumbers small
    assert len(by_src["big"]) > len(by_src["small"])
    # determinism
    assert sorted(out) == sorted(temperature_sample(df).collect())

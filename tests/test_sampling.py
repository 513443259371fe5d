"""Deterministic sampling primitives (operators/sampling.py): value
semantics against a hashlib reference, and the plan properties that
make them 100 TB-safe (hash_split / rate_sample never shuffle)."""

import hashlib

import pytest

from pliers_spark.operators.sampling import hash_split, rate_sample, stratified_sample


def _h(s: str, seed=None) -> int:
    if seed is not None:
        s = f"{seed}:{s}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_hash_split_matches_hashlib_and_ranges(spark):
    df = spark.range(200).select("id")
    rows = hash_split(df, "id", {"train": 90, "valid": 5, "test": 5}, seed=0).collect()
    assert len(rows) == 200
    for r in rows:
        b = _h(str(r.id), seed=0) % 100
        assert r.bucket == b
        want = "train" if b < 90 else ("valid" if b < 95 else "test")
        assert r.split == want


def test_hash_split_is_pure_projection(spark):
    df = spark.range(50).select("id")
    plan = _plan(hash_split(df, "id"))
    assert "Exchange" not in plan and "PythonUDF" not in plan, plan


def test_hash_split_rejects_bad_weights(spark):
    with pytest.raises(ValueError):
        hash_split(spark.range(3), "id", {"train": 50, "test": 40})


def test_rate_sample_gate_and_seed_independence(spark):
    df = spark.range(500).select("id")
    kept1 = {r.id for r in rate_sample(df, "id", 300_000, seed=1).collect()}
    kept2 = {r.id for r in rate_sample(df, "id", 300_000, seed=2).collect()}
    for i in range(500):
        assert (i in kept1) == (_h(str(i), seed=1) % 1_000_000 < 300_000)
    assert kept1 != kept2  # different seeds pick different rows
    # rough rate sanity (hash is uniform; 30% of 500 ± wide margin)
    assert 90 <= len(kept1) <= 210
    plan = _plan(rate_sample(df, "id", 300_000, seed=1))
    assert "Exchange" not in plan and "PythonUDF" not in plan, plan


def test_stratified_sample_exact_k_by_hash_order(spark):
    rows = [(i, "ab"[i % 2]) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, g string")
    out = stratified_sample(df, ["g"], "id", 3, seed=0).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append((r.sample_rank, r.id))
    for g in "ab":
        ids = [i for i, gg in rows if gg == g]
        want = sorted(ids, key=lambda i: (_h(str(i), seed=0), i))[:3]
        got = [i for _, i in sorted(by_g[g])]
        assert got == want


def test_stratified_sample_small_stratum_keeps_all(spark):
    df = spark.createDataFrame([(1, "x"), (2, "x")], "id long, g string")
    out = stratified_sample(df, ["g"], "id", 10).collect()
    assert sorted(r.id for r in out) == [1, 2]
    assert sorted(r.sample_rank for r in out) == [1, 2]

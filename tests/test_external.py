"""External-stage pattern: admission guard + rate limiting + enrichment
(pliers/transformers/api/base.py:9-52 recast)."""

import time

import pytest

from pliers_spark.operators.external import RateLimiter, env_key_available, external_stage


def test_large_job_guard(spark):
    df = spark.range(200).withColumnRenamed("id", "doc_id").selectExpr(
        "doc_id", "cast(doc_id as string) as text"
    )
    with pytest.raises(ValueError, match="large_job"):
        external_stage(
            df, "doc_id", "text", lambda t: {"label": t}, "id long, label string", max_rows=100
        )


def test_enrichment_and_rate_limit(spark):
    df = spark.range(6).withColumnRenamed("id", "doc_id").selectExpr(
        "doc_id", "concat('t', doc_id) as text"
    )
    out = external_stage(
        df.coalesce(1),
        "doc_id",
        "text",
        lambda t: {"label": t.upper()},
        "id long, label string",
        rate_per_sec=1000.0,
        max_rows=100,
        batch_size=2,
    )
    rows = {r.id: r.label for r in out.collect()}
    assert rows == {i: f"T{i}" for i in range(6)}


def test_rate_limiter_spacing():
    rl = RateLimiter(50.0)  # 20ms spacing
    t0 = time.monotonic()
    for _ in range(5):
        rl.acquire()
    assert time.monotonic() - t0 >= 0.07  # 4 gaps × 20ms (first is free)


def test_env_key_gate(monkeypatch):
    monkeypatch.delenv("SOME_API_KEY", raising=False)
    assert not env_key_available("SOME_API_KEY")
    monkeypatch.setenv("SOME_API_KEY", "x")
    assert env_key_available("SOME_API_KEY")

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


def test_tweet_source_compound_rows(spark):
    """TweetStimFactory.get_status + TweetStim composition
    (pliers/stimuli/api.py:17-107) with an injected fixture transport:
    status ids -> (text, media slots) CompoundStim-shaped rows; media
    stay URL references (decode belongs to the multimodal stages)."""
    from pliers_spark.operators.external import tweet_source

    fixtures = {
        1: {"text": "hello spark", "media_urls": ["http://img/a.ppm", "http://img/b.ppm"]},
        2: {"text": "no media here", "media_urls": []},
        3: {"text": "one pic", "media_urls": ["http://img/c.ppm"]},
    }
    df = spark.createDataFrame([(1,), (2,), (3,)], "status_id long")
    got = {
        r["status_id"]: r
        for r in tweet_source(df, fixtures.__getitem__, rate_per_sec=0).collect()
    }
    assert got[1]["text"] == "hello spark" and got[1]["n_media"] == 2
    assert got[2]["media_urls"] == [] and got[2]["n_media"] == 0
    assert got[3]["media_urls"] == ["http://img/c.ppm"]


def test_tweet_source_large_job_guard(spark):
    from pliers_spark.operators.external import tweet_source

    df = spark.range(200).selectExpr("id AS status_id")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="large_job"):
        tweet_source(df, lambda sid: {"text": "", "media_urls": []}, max_rows=100)

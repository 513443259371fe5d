"""Batch 22: incremental LSH dedup, n-gram novelty, exact-integer bursts."""

from datetime import datetime

from pyspark.sql import functions as F


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "is_delta", (F.col("doc_id") >= 100) & (F.col("doc_id") < 900)
    )


def test_incremental_dedup_index_always_wins(spark):
    from pliers_spark.operators.dedup import incremental_lsh_dedup

    text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (7, text),                     # index doc (smaller id)
        (200, text),                   # delta dup of index → drop
        (101, "totally different words here nothing shared at all"),  # novel → keep
    ]
    out = {
        r.doc_id: r
        for r in incremental_lsh_dedup(
            _df(spark, rows), "text", "doc_id", "is_delta", 8, 4, 2
        ).collect()
    }
    assert set(out) == {101, 200}  # one row per DELTA doc only
    assert out[200].keep is False and out[200].first_match == 7
    assert out[101].keep is True and out[101].n_matches == 0


def test_incremental_dedup_keep_first_within_batch_and_large_index_id(spark):
    from pliers_spark.operators.dedup import incremental_lsh_dedup

    text = "one two three four five six seven eight nine ten"
    rows = [
        (999, text),   # index doc with LARGER id than the delta dups
        (101, text),   # delta: collides with index 999 → drop (index wins)
        (150, text),   # delta: collides with 999 AND earlier delta 101 → drop
    ]
    out = {
        r.doc_id: r
        for r in incremental_lsh_dedup(
            _df(spark, rows), "text", "doc_id", "is_delta", 8, 4, 2
        ).collect()
    }
    assert out[101].keep is False and out[101].first_match == 999
    assert out[150].keep is False and out[150].first_match == 101
    assert out[150].n_matches == 2


def test_ngram_novelty_repeat_doc_scores_zero(spark):
    from pliers_spark.queries import QUERIES
    import pliers_spark.queries as Q

    body = "the quick brown fox jumps over the lazy dog tonight"
    df = spark.createDataFrame(
        [(1, body), (2, body), (3, "completely fresh unseen shingle text appears here")],
        "doc_id long, text string",
    )
    sh = df.select(
        "doc_id",
        F.explode(F.array_distinct(
            __import__("pliers_spark.functions.hashing", fromlist=["shingles"]).shingles(
                F.split(F.trim("text"), " "), 3
            )
        )).alias("s"),
    )
    first = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    out = {
        r.doc_id: r
        for r in sh.join(first, "s")
        .groupBy("doc_id")
        .agg(
            F.sum(novel).alias("n_novel"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert out[1].n_novel == out[1].n          # first occurrence: all novel
    assert out[2].n_novel == 0                 # verbatim repeat: zero novel
    assert out[3].n_novel == out[3].n


def test_event_bursts_integer_rule_matches_float_3sigma(spark):
    # 18 quiet days alternating 8/12 events, one mild day (14), one
    # spike day (40, z ≈ 4.1): only the spike is a burst. (NB: with
    # IDENTICAL quiet days the max achievable z of a single outlier is
    # exactly 3 — the spike supplies all the variance — so the fixture
    # needs quiet-day variance for a >3σ day to exist at all.)
    per_day = {d: (8 if d % 2 else 12) for d in range(1, 19)}
    per_day[19] = 14
    per_day[20] = 40
    rows = []
    eid = 0
    for day, n in per_day.items():
        for _ in range(n):
            rows.append((eid, datetime(2024, 1, day, 12, 0, 0), "click"))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    daily = df.groupBy("event_type", F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("n_events").cast("long").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("long").alias("q"),
    )
    dev = F.col("n_days") * F.col("n_events") - F.col("s")
    out = daily.join(stats, "event_type").select(
        "day", "n_events",
        ((dev > 0) & (dev * dev > 9 * (F.col("n_days") * F.col("q") - F.col("s") * F.col("s"))))
        .alias("is_burst"),
    ).collect()
    by_day = {r.day.day: r.is_burst for r in out}
    assert by_day[20] is True
    assert all(not v for d, v in by_day.items() if d != 20)
    # float cross-check: exact rule ≡ c > mean + 3σ (population)
    import statistics

    counts = [float(n) for n in per_day.values()]
    mean = statistics.mean(counts)
    sigma = statistics.pstdev(counts)
    for r in out:
        assert r.is_burst == (r.n_events > mean + 3 * sigma)

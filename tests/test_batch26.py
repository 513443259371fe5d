"""Batch 26: content-defined chunking, UCB1 bandit replay, grid DBSCAN."""

import math
import os
from datetime import datetime


def _write(spark, tmp_path, name, rows, schema):
    d = str(tmp_path)
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        os.path.join(d, f"{name}.parquet")
    )
    return d


DOCS = "doc_id long, text string, lang string, source string, n_chars long"


def test_cdc_shared_suffix_is_caught(spark, tmp_path):
    """Two docs sharing a long suffix after divergent prefixes must share
    the suffix chunks (content-defined boundaries resynchronize); a doc
    with unique text has dup share 0."""
    from pliers_spark.queries import QUERIES

    shared = " ".join(f"body{i}" for i in range(64))
    rows = [
        (1, "preamble one two " + shared, "en", "A", 10),
        (2, "totally different longer preamble here " + shared, "en", "A", 10),
        (3, "nothing in common with anything else at all", "en", "A", 10),
    ]
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.doc_id: r for r in QUERIES["cdc_chunks"](spark, sf).collect()}
    assert out[1].dup_chunks > 0 and out[2].dup_chunks > 0
    assert out[1].dup_token_share > 0.5 and out[2].dup_token_share > 0.5
    assert out[3].dup_chunks == 0 and out[3].dup_token_share == 0.0
    for r in out.values():
        assert r.n_tokens >= r.dup_tokens and r.n_chunks >= r.dup_chunks


def test_ucb_bonus_favors_underexplored(spark, tmp_path):
    """Two arms with equal mean reward: the one with fewer pulls gets the
    larger UCB (exploration bonus); ucb = mean + sqrt(2 ln N / n)."""
    from pliers_spark.queries import QUERIES

    rows = []
    eid = 0
    # arm C: 30 distinct low values 1..30 -> global lower median = 25.0
    for j in range(1, 31):
        rows.append((eid, datetime(2024, 1, 1, 0, 0, eid % 60), 1, "C",
                     float(j), "")); eid += 1
    # arms A (15 pulls) and B (5 pulls): all pulls far above the median
    for i in range(15):
        rows.append((eid, datetime(2024, 1, 1, 0, 0, eid % 60), 1, "A",
                     1000.0, "")); eid += 1
    for i in range(5):
        rows.append((eid, datetime(2024, 1, 1, 0, 0, eid % 60), 1, "B",
                     1000.0, "")); eid += 1
    sf = _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r.arm: r for r in QUERIES["ucb_arms"](spark, sf).collect()}
    assert out["A"].mean_reward == out["B"].mean_reward == 1.0
    assert out["C"].mean_reward == 0.2  # values 25..30 of 30 clear the median
    assert out["B"].ucb > out["A"].ucb and out["B"].rank == 1
    n_all = 50
    for arm, r in out.items():
        assert r.ucb == round(r.s / r.n + math.sqrt(2 * math.log(n_all) / r.n), 6)


def test_dbscan_planted_blobs(spark, tmp_path):
    """Two dense blobs + one isolated point: blobs become two distinct
    clusters of core points, the outlier is noise."""
    from pliers_spark.queries import QUERIES

    def doc(i, n_tokens, wordlen):
        # n_tokens tokens of exactly `wordlen` chars -> x=n_tokens, y=100*wordlen
        return (i, " ".join("a" * wordlen for _ in range(n_tokens)), "en", "A", 1)

    rows = (
        [doc(i, 20 + (i % 3), 4) for i in range(8)]        # blob 1: x≈20-22, y=400
        + [doc(100 + i, 60 + (i % 3), 4) for i in range(8)]  # blob 2: x≈60-62
        + [doc(999, 40, 9)]                                  # outlier: y=900
    )
    sf = _write(spark, tmp_path, "documents", rows, DOCS)
    out = {r.doc_id: r for r in QUERIES["dbscan_clusters"](spark, sf).collect()}
    assert len(out) == 17
    assert out[999].role == "noise" and out[999].cluster_id is None
    b1 = {out[i].cluster_id for i in range(8)}
    b2 = {out[100 + i].cluster_id for i in range(8)}
    assert len(b1) == 1 and len(b2) == 1 and b1 != b2
    assert all(out[i].role == "core" for i in range(8))

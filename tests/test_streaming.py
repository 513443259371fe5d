"""Structured Streaming twins agree with batch operators (file replay)."""

import datetime as dt
import os

import pytest

from pliers_spark.operators.temporal import session_bounds
from pliers_spark.streaming.sessions import streaming_session_bounds, streaming_windowed_counts


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for uid in ["u1", "u2"]:
        for burst in range(3):
            for k in range(4):
                rows.append(
                    (uid, base + dt.timedelta(hours=8 * burst, minutes=5 * k), float(k))
                )
    df = spark.createDataFrame(rows, "uid string, ts timestamp, value double")
    d = str(tmp_path_factory.mktemp("stream") / "events")
    df.coalesce(1).write.parquet(d)
    return d


def test_streaming_sessions_match_batch(spark, stream_dir):
    batch_df = spark.read.parquet(stream_dir)
    expected = {
        (r.uid, r.session_start, r.session_end, r.n_events)
        for r in session_bounds(batch_df, ["uid"], "ts", gap_seconds=6 * 3600).collect()
    }

    stream = spark.readStream.schema("uid string, ts timestamp, value double").parquet(stream_dir)
    q = (
        streaming_session_bounds(stream, "uid", "ts", gap="6 hours", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.uid, r.session_start, r.session_end, r.n_events)
            for r in spark.sql("select * from sessions_out").collect()
        }
    finally:
        q.stop()
    assert got == expected and len(got) == 6  # 3 bursts × 2 users


def test_streaming_windowed_counts(spark, stream_dir):
    stream = spark.readStream.schema("uid string, ts timestamp, value double").parquet(stream_dir)
    q = (
        streaming_windowed_counts(stream, "uid", "ts", window="1 hour", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("select * from wincounts").collect()
    finally:
        q.stop()
    per_user = {}
    for r in rows:
        per_user[r.uid] = per_user.get(r.uid, 0) + r.n_events
    assert per_user == {"u1": 12, "u2": 12}

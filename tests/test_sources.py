"""Timed-text sources: SRT parsing + TSV column-spec modes
(ComplexTextStim file readers, pliers/stimuli/text.py:131-193)."""

import pytest

from pliers_spark.sources.text_sources import (
    parse_srt_blocks,
    read_srt,
    read_timed_tsv,
    srt_time_to_seconds,
)

SRT = """1
00:00:01,000 --> 00:00:04,000
There is nothing in the desert

2
00:00:05,500 --> 00:00:07,250
and no man needs nothing
"""


def test_srt_time_conversion():
    assert srt_time_to_seconds("00:00:01,000") == 1.0
    assert srt_time_to_seconds("01:02:03,450") == 3723.45


def test_parse_srt_blocks():
    rows = parse_srt_blocks(SRT)
    assert len(rows) == 2
    assert rows[0] == {
        "order": 0,
        "text": "There is nothing in the desert",
        "onset": 1.0,
        "duration": 3.0,
    }
    assert rows[1]["onset"] == 5.5 and rows[1]["duration"] == pytest.approx(1.75)


def test_read_srt_distributed(spark, tmp_path):
    p = tmp_path / "sub.srt"
    p.write_text(SRT)
    out = read_srt(spark, str(p)).orderBy("order").collect()
    assert [r.text for r in out] == [
        "There is nothing in the desert",
        "and no man needs nothing",
    ]
    assert out[0].onset == 1.0 and out[0].duration == 3.0


def test_read_timed_tsv_header(spark, tmp_path):
    p = tmp_path / "timed.tsv"
    p.write_text("onset\ttext\tduration\n0.3\texplicit\t0.1\n1.2\tword\t\n")
    df = read_timed_tsv(spark, str(p), default_duration=0.5)
    rows = sorted(df.collect(), key=lambda r: r.onset)
    assert rows[0].text == "explicit" and rows[0].duration == pytest.approx(0.1)
    assert rows[1].duration == 0.5  # default fill


def test_read_timed_tsv_colspec(spark, tmp_path):
    p = tmp_path / "nohdr.tsv"
    p.write_text("0.0\thello\n1.0\tworld\n")
    df = read_timed_tsv(spark, str(p), columns="ot")
    rows = sorted(df.collect(), key=lambda r: r.onset)
    assert [r.text for r in rows] == ["hello", "world"]
    assert "duration" in df.columns


def test_srt_round_trip(spark, tmp_path):
    from pliers_spark.sources.text_sources import read_srt, write_srt

    df = spark.createDataFrame(
        [(0, "Hello there", 0.5, 2.0), (1, "Second cue", 3.25, 1.75)],
        "order long, text string, onset double, duration double",
    )
    p = str(tmp_path / "out.srt")
    n = write_srt(df, p)
    assert n == 2
    back = read_srt(spark, p).orderBy("order").collect()
    assert [(r.order, r.text, r.onset, r.duration) for r in back] == [
        (0, "Hello there", 0.5, 2.0),
        (1, "Second cue", 3.25, 1.75),
    ]


def test_regexp_stem_matches_nltk_semantics(spark):
    from pyspark.sql import functions as F

    from pliers_spark.functions.stemming import regexp_stem

    df = spark.createDataFrame(
        [("running",), ("cats",), ("see",), ("ing",), ("horse",)], "w string"
    )
    out = dict(
        (r.w, r.s)
        for r in df.select("w", regexp_stem(F.col("w"), "ing$|s$|e$", 4).alias("s")).collect()
    )
    # re.sub strips each match once per position, len<4 words untouched
    assert out == {"running": "runn", "cats": "cat", "see": "see", "ing": "ing", "horse": "hors"}

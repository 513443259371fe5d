"""Timed-text sources: SRT subtitles and onset/duration TSV.

Parity targets:
- ``ComplexTextStim._from_srt`` (``pliers/stimuli/text.py:172-193``):
  parse .srt blocks into (text, onset, duration) rows; srt time format
  ``HH:MM:SS,mmm --> HH:MM:SS,mmm`` (converters :204-218).
- ``ComplexTextStim._from_file`` (``pliers/stimuli/text.py:131-150``):
  TSV with named header columns or a positional column spec like
  ``'ot'`` (onset, text) / ``'tod'`` (text, onset, duration); a default
  duration fills missing values (:146-148).

Sources read distributed: SRT via ``spark.read.text(wholetext)`` +
``mapInPandas`` block parsing (each file is one row → one parse task per
file, which matches SRT file sizes); TSV via ``spark.read.csv``.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pliers_spark.operators.census import CensusBoundExceeded, census_collect

SRT_SCHEMA = "file string, order long, text string, onset double, duration double"

_SRT_TIME = re.compile(r"(\d+):(\d+):(\d+)[,.](\d+)")


def srt_time_to_seconds(s: str) -> float:
    h, m, sec, ms = _SRT_TIME.match(s.strip()).groups()
    return int(h) * 3600 + int(m) * 60 + int(sec) + int(ms) / 1000.0


def parse_srt_blocks(content: str) -> list[dict]:
    rows = []
    for block in re.split(r"\n\s*\n", content.strip()):
        lines = [l.rstrip("\r") for l in block.strip().splitlines()]
        if len(lines) < 2 or "-->" not in lines[1]:
            continue
        start_s, end_s = lines[1].split("-->")
        onset = srt_time_to_seconds(start_s)
        end = srt_time_to_seconds(end_s)
        rows.append(
            {
                "order": int(lines[0]) - 1,
                "text": " ".join(lines[2:]).strip(),
                "onset": onset,
                "duration": end - onset,
            }
        )
    return rows


def read_srt(spark: SparkSession, path: str) -> DataFrame:
    """Distributed SRT source: one parse task per file."""
    raw = spark.read.text(path, wholetext=True).withColumn(
        "file", F.input_file_name()
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                for row in parse_srt_blocks(r["value"]):
                    out.append({"file": r["file"], **row})
            yield pd.DataFrame(out, columns=["file", "order", "text", "onset", "duration"])

    return raw.mapInPandas(fn, schema=SRT_SCHEMA)


def read_timed_tsv(
    spark: SparkSession,
    path: str,
    columns: str | None = None,
    default_duration: float | None = None,
) -> DataFrame:
    """Timed-text TSV: header mode (named text/onset/duration columns) or
    positional spec mode (``columns='ot'`` → onset, text...)."""
    col_map = {"t": "text", "o": "onset", "d": "duration"}
    if columns:
        names = [col_map[c] for c in columns]
        df = spark.read.csv(path, sep="\t", header=False, inferSchema=True).toDF(*names)
    else:
        df = spark.read.csv(path, sep="\t", header=True, inferSchema=True)
    for c, typ in (("onset", "double"), ("duration", "double")):
        if c in df.columns:
            df = df.withColumn(c, F.col(c).cast(typ))
    if "duration" not in df.columns:
        df = df.withColumn("duration", F.lit(default_duration).cast("double"))
    elif default_duration is not None:
        df = df.withColumn("duration", F.coalesce(F.col("duration"), F.lit(default_duration)))
    return df


def seconds_to_srt_time(s: float) -> str:
    ms = int(round(s * 1000))
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    sec, ms = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{sec:02d},{ms:03d}"


def write_srt(df: DataFrame, path: str) -> int:
    """SRT sink (≡ ``ComplexTextStim.save``, pliers/stimuli/text.py:152-170):
    render (order, text, onset, duration) rows back to .srt. Subtitle
    tracks are inherently tiny (thousands of cues), so this is a
    driver-side render of a sorted collect — guarded so a mis-aimed
    10^12-row frame fails fast instead of OOM-ing the driver."""
    try:
        rows = census_collect(
            df.select("order", "text", "onset", "duration").orderBy("order"),
            100_000, "write_srt subtitle sink",
        )
    except CensusBoundExceeded as e:
        raise ValueError(
            "write_srt is a subtitle sink (\u2264100k cues); use parquet for tables"
        ) from e
    blocks = []
    for r in rows:
        start = seconds_to_srt_time(r.onset)
        end = seconds_to_srt_time(r.onset + r.duration)
        blocks.append(f"{r.order + 1}\n{start} --> {end}\n{r.text}")
    with open(path, "w") as f:
        f.write("\n\n".join(blocks) + "\n")
    return len(rows)

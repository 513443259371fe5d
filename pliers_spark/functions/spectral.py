"""Framed spectral operators: STFT power frames and low-pass resampling.

Parity targets:
- ``STFTAudioExtractor._stft`` (pliers/extractors/audio.py:64-113): slide a
  ``frame_size`` window with ``hop_size`` stride over an ordered series,
  apply a Hann weighting, FFT each frame, and emit one row per hop with
  the frame's power per frequency bin.
- ``resample()``'s anti-alias low-pass step (pliers/utils/base.py:225-233):
  the reference uses a Butterworth IIR from scipy; scipy is absent here,
  so the same *role* (attenuate above the target Nyquist before
  decimating) is filled by a windowed-sinc FIR — a public textbook
  design — whose behavior is pinned by golden tests.

Spark shape: both are per-entity ordered computations that need the whole
series (or at least ``frame_size`` consecutive rows) at once, which Window
built-ins cannot express (no FFT/convolution in Spark SQL). They run as
``applyInPandas`` over entity groups — one Arrow batch per entity, numpy
vectorized inside, no per-row Python. Entities hash-distribute across
partitions; at 100 TB the group key would be (entity, day-chunk) with
frame_size-1 rows of boundary overlap so no group exceeds executor memory.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hann_periodic(n: int) -> np.ndarray:
    # periodic Hann: w[j] = 0.5 - 0.5*cos(2*pi*j/n) — written out (rather
    # than np.hanning, which is the symmetric variant) so the SQL oracle
    # can reproduce it term-for-term.
    j = np.arange(n)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * j / n)


def stft_power_frames(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    order_cols: list[str] | None = None,
    frame_size: int = 8,
    hop: int = 4,
    round_to: int = 4,
) -> DataFrame:
    """One row per (entity, frame): Hann-windowed rFFT power per bin.

    Only full frames are emitted (librosa center=False convention;
    n_frames = floor((L - frame_size)/hop) + 1). ``onset_ts`` is the
    timestamp of the frame's first sample — the analog of the reference's
    ``onset = i * hop_size`` (pliers/extractors/audio.py:104-108).
    """
    n_bins = frame_size // 2 + 1
    order_cols = order_cols or [ts_col]
    win = _hann_periodic(frame_size)
    schema = (
        f"{entity_col} long, frame long, onset_ts timestamp, "
        + ", ".join(f"p{k} double" for k in range(n_bins))
    )
    empty_cols = [c.split()[0] for c in schema.split(", ")]

    def _one_entity(ent, x, ts, out):
        L = len(x)
        if L < frame_size:
            return
        nf = (L - frame_size) // hop + 1
        idx = np.arange(frame_size)[None, :] + hop * np.arange(nf)[:, None]
        frames = x[idx] * win[None, :]
        spec = np.fft.rfft(frames, axis=1)
        power = (spec.real**2 + spec.imag**2).round(round_to)
        block = {
            entity_col: np.repeat(ent, nf),
            "frame": np.arange(nf, dtype=np.int64),
            "onset_ts": ts[idx[:, 0]],
        }
        for k in range(n_bins):
            block[f"p{k}"] = power[:, k]
        out.append(pd.DataFrame(block))

    def _frames_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        # one Arrow batch per BUCKET of many entities (per-entity groups
        # would mean thousands of tiny batches whose scheduling overhead
        # dwarfs the FFT — same rationale as asof_join_cogroup); one
        # bucket-wide sort, then a contiguous numpy slice per entity.
        pdf = pdf.sort_values([entity_col, *order_cols], kind="mergesort")
        ents = pdf[entity_col].to_numpy()
        xs = pdf[value_col].to_numpy(dtype=np.float64)
        tss = pdf[ts_col].to_numpy()
        bounds = np.flatnonzero(np.r_[True, ents[1:] != ents[:-1], True])
        out: list[pd.DataFrame] = []
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            _one_entity(ents[lo], xs[lo:hi], tss[lo:hi], out)
        if not out:
            return pd.DataFrame({c: pd.Series(dtype="object") for c in empty_cols}).iloc[0:0]
        return pd.concat(out, ignore_index=True)

    spark = df.sparkSession
    num_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    cols = list(dict.fromkeys([entity_col, ts_col, value_col, *order_cols]))
    bucket = F.pmod(F.xxhash64(entity_col), F.lit(num_buckets)).alias("_bucket")
    return (
        df.select(*cols, bucket)
        .groupBy("_bucket")
        .applyInPandas(_frames_bucket, schema=schema)
    )


def stft_power_sql(
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    table: str = "events",
    frame_size: int = 8,
    hop: int = 4,
    round_to: int = 4,
) -> str:
    """DuckDB oracle: the same STFT written as an explicit DFT — each
    power bin is (Σ x·w·cos)² + (Σ x·w·sin)² with the Hann weights and
    twiddle factors emitted as constant-folded literals per within-frame
    position j = n - f·hop."""
    n_bins = frame_size // 2 + 1
    terms = []
    for k in range(n_bins):
        cos_c = ", ".join(
            f"{0.5 - 0.5 * math.cos(2 * math.pi * j / frame_size):.17g}*"
            f"({math.cos(2 * math.pi * k * j / frame_size):.17g})"
            for j in range(frame_size)
        )
        sin_c = ", ".join(
            f"{0.5 - 0.5 * math.cos(2 * math.pi * j / frame_size):.17g}*"
            f"({math.sin(2 * math.pi * k * j / frame_size):.17g})"
            for j in range(frame_size)
        )
        terms.append(
            f"round(pow(sum({value_col} * ([{cos_c}])[j + 1]), 2)"
            f" + pow(sum({value_col} * ([{sin_c}])[j + 1]), 2), {round_to}) AS p{k}"
        )
    sel = ",\n              ".join(terms)
    return f"""WITH x AS (
         SELECT {entity_col}, {ts_col}, {value_col},
                row_number() OVER (PARTITION BY {entity_col}
                                   ORDER BY {ts_col}, {tiebreak_col}) - 1 AS n,
                count(*) OVER (PARTITION BY {entity_col}) AS len
         FROM {table}),
       fr AS (
         SELECT {entity_col}, {ts_col}, {value_col}, n,
                unnest(generate_series(
                    greatest(0, cast(ceil((n - {frame_size - 1}) / {hop}.0) AS BIGINT)),
                    least(cast(floor(n / {hop}.0) AS BIGINT),
                          cast(floor((len - {frame_size}) / {hop}.0) AS BIGINT)))) AS f
         FROM x WHERE len >= {frame_size}),
       j AS (SELECT *, cast(n - f * {hop} AS BIGINT) AS j FROM fr)
       SELECT {entity_col}, f AS frame, min({ts_col}) AS onset_ts,
              {sel}
       FROM j GROUP BY {entity_col}, f"""


def lowpass_sinc_kernel(decimate: int, taps: int = 15) -> np.ndarray:
    """Windowed-sinc FIR low-pass, cutoff at the post-decimation Nyquist
    (fc = 0.5/decimate cycles/sample), Blackman window, unity DC gain.
    Textbook design (public: Oppenheim & Schafer; smith's dspguide ch.16)."""
    if taps % 2 == 0:
        raise ValueError("taps must be odd for a zero-phase symmetric kernel")
    fc = 0.5 / decimate
    m = np.arange(taps) - (taps - 1) / 2.0
    safe = np.where(m == 0, 1.0, m)
    h = np.where(m == 0, 2 * np.pi * fc, np.sin(2 * np.pi * fc * safe) / safe)
    w = (
        0.42
        - 0.5 * np.cos(2 * np.pi * np.arange(taps) / (taps - 1))
        + 0.08 * np.cos(4 * np.pi * np.arange(taps) / (taps - 1))
    )
    h = h * w
    return h / h.sum()


def lowpass_decimate(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    decimate: int = 4,
    taps: int = 15,
    round_to: int = 6,
) -> DataFrame:
    """resample()'s downsample path: anti-alias low-pass then keep every
    ``decimate``-th sample (pliers/utils/base.py:225-239, Butterworth →
    interp; here FIR → stride). Edge handling: reflect-pad so the output
    length is exactly ceil(L/decimate) and a constant series is preserved
    end-to-end (golden-tested).

    Float-determinism contract (driver hashes raw bits): the convolution
    is an EXPLICIT left-associative fold over the taps in k order —
    ``((h0·x[i] + h1·x[i+1]) + h2·x[i+2]) …`` — not ``np.convolve``
    (whose internal summation order is unspecified), and outputs land on
    the 10^-round_to grid via ``floor`` (round() diverges between
    engines in the last ulp). The DuckDB oracle
    (:func:`lowpass_decimate_sql`) replays the identical fold with
    ``list_reduce`` over tap-ordered products, making the two engines
    bit-identical."""

    h = lowpass_sinc_kernel(decimate, taps)
    pad = (taps - 1) // 2
    grid = 10.0 ** round_to

    def _lp_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        # bucket-cogrouped like stft_power_frames: one Arrow batch per
        # entity-hash bucket, contiguous numpy slice per entity inside
        pdf = pdf.sort_values([entity_col, ts_col], kind="mergesort")
        ents = pdf[entity_col].to_numpy()
        xs = pdf[value_col].to_numpy(dtype=np.float64)
        tss = pdf[ts_col].to_numpy()
        bounds = np.flatnonzero(np.r_[True, ents[1:] != ents[:-1], True])
        parts = []
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            x = xs[lo:hi]
            L = len(x)
            xp = np.pad(x, pad, mode="reflect" if L > pad else "edge")
            y = h[0] * xp[0:L]  # left fold in k order — see docstring
            for k in range(1, taps):
                y = y + h[k] * xp[k : k + L]
            keep = np.arange(0, L, decimate)
            parts.append(
                pd.DataFrame(
                    {
                        entity_col: np.repeat(ents[lo], len(keep)),
                        ts_col: tss[lo:hi][keep],
                        "filtered": np.floor(y[keep] * grid) / grid,
                    }
                )
            )
        if not parts:
            return pd.DataFrame(
                {entity_col: pd.Series(dtype="int64"), ts_col: pd.Series(dtype="object"),
                 "filtered": pd.Series(dtype="float64")}
            )
        return pd.concat(parts, ignore_index=True)

    schema = f"{entity_col} long, {ts_col} timestamp, filtered double"
    spark = df.sparkSession
    num_buckets = int(spark.conf.get("spark.sql.shuffle.partitions"))
    bucket = F.pmod(F.xxhash64(entity_col), F.lit(num_buckets)).alias("_bucket")
    return (
        df.select(entity_col, ts_col, value_col, bucket)
        .groupBy("_bucket")
        .applyInPandas(_lp_bucket, schema=schema)
    )


def lowpass_decimate_sql(
    table: str = "events",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    decimate: int = 4,
    taps: int = 15,
    round_to: int = 6,
) -> str:
    """DuckDB oracle for :func:`lowpass_decimate`: the same FIR
    convolution written as relational algebra. Tap coefficients are
    embedded as 17-significant-digit literals (exact double round-trip),
    the padded source index is the same reflect/edge CASE arithmetic,
    and each output sample is the identical left fold — ``list_reduce``
    over products listed in tap order. Bit-identical to the pandas UDF
    (driver gate; requires unique ``ts`` per entity, which the corpus
    and the operator's sort contract both guarantee)."""
    h = lowpass_sinc_kernel(decimate, taps)
    pad = (taps - 1) // 2
    grid = 10.0 ** round_to
    tap_rows = ", ".join(f"({k}, {float(h[k])!r})" for k in range(taps))
    raw = f"(o.i + t.k - {pad})"
    reflect = (
        f"CASE WHEN {raw} < 0 THEN -{raw} "
        f"WHEN {raw} > o.len - 1 THEN 2 * o.len - 2 - {raw} ELSE {raw} END"
    )
    clamp = (
        f"CASE WHEN {raw} < 0 THEN 0 "
        f"WHEN {raw} > o.len - 1 THEN o.len - 1 ELSE {raw} END"
    )
    return f"""WITH ser AS (
         SELECT {entity_col}, {ts_col}, {value_col},
                row_number() OVER (PARTITION BY {entity_col} ORDER BY {ts_col}) - 1 AS i,
                count(*) OVER (PARTITION BY {entity_col}) AS len
         FROM {table}),
       taps(k, c) AS (VALUES {tap_rows}),
       terms AS (
         SELECT o.{entity_col}, o.{ts_col}, o.i, t.k,
                t.c * x.{value_col} AS p
         FROM ser o CROSS JOIN taps t
         JOIN ser x ON x.{entity_col} = o.{entity_col}
          AND x.i = (CASE WHEN o.len > {pad} THEN {reflect} ELSE {clamp} END)
         WHERE o.i % {decimate} = 0)
       SELECT {entity_col}, {ts_col},
              floor(list_reduce(list(p ORDER BY k), (a, b) -> a + b) * {grid!r})
                / {grid!r} AS filtered
       FROM terms GROUP BY {entity_col}, {ts_col}, i"""

"""Golden tests for the spectral operators (STFT power frames, FIR
low-pass decimation) and the batch-6 helpers (sentence split, feature
flagging). Parity anchors: STFTAudioExtractor
(pliers/extractors/audio.py:64-113), resample()'s anti-alias step
(pliers/utils/base.py:225-239), ComplexTextStim unit='sentence'
(pliers/stimuli/text.py:230-244), Diagnostics.flag
(pliers/diagnostics/base.py:150-214)."""

import datetime

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pliers_spark.functions.spectral import (
    lowpass_decimate,
    lowpass_sinc_kernel,
    stft_power_frames,
)


def _series_df(spark, values, entity=1):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (entity, t0 + datetime.timedelta(seconds=i), float(v), i)
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )


def test_stft_sine_peak_bin(spark):
    # pure sine at bin 2 of an 8-point frame (period 4 samples): all
    # frame power concentrates in p2 (Hann leaks into p1/p3 but the
    # argmax must be bin 2 for every frame).
    n = 32
    x = np.sin(2 * np.pi * 2 * np.arange(n) / 8)
    out = (
        stft_power_frames(_series_df(spark, x), "user_id", "ts", "value",
                          order_cols=["ts", "event_id"])
        .orderBy("frame")
        .toPandas()
    )
    assert len(out) == (n - 8) // 4 + 1
    p = out[[f"p{k}" for k in range(5)]].to_numpy()
    assert (p.argmax(axis=1) == 2).all()
    # numpy cross-check of frame 0 against the operator
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(8) / 8)
    ref = np.abs(np.fft.rfft(x[:8] * win)) ** 2
    np.testing.assert_allclose(p[0], ref.round(4), atol=1e-4)


def test_stft_short_series_emits_nothing(spark):
    out = stft_power_frames(
        _series_df(spark, [1.0] * 5), "user_id", "ts", "value"
    ).toPandas()
    assert len(out) == 0


def test_stft_constant_signal_dc_only(spark):
    out = (
        stft_power_frames(_series_df(spark, [3.0] * 16), "user_id", "ts", "value")
        .toPandas()
    )
    # constant → all energy at DC + bin1 window leakage; Hann sum = N/2 = 4
    assert np.allclose(out["p0"].to_numpy(), 144.0)
    assert (out[["p2", "p3", "p4"]].to_numpy() < 1e-6).all()


def test_lowpass_kernel_unity_dc():
    h = lowpass_sinc_kernel(4, taps=15)
    assert h.sum() == pytest.approx(1.0)
    assert np.allclose(h, h[::-1])  # zero-phase symmetric


def test_lowpass_constant_preserved(spark):
    out = lowpass_decimate(
        _series_df(spark, [7.0] * 20), "user_id", "ts", "value", decimate=4
    ).toPandas()
    assert len(out) == 5
    assert np.allclose(out["filtered"].to_numpy(), 7.0)


def test_lowpass_nyquist_attenuated(spark):
    x = [1.0, -1.0] * 16  # alternating = Nyquist of the source rate
    out = lowpass_decimate(
        _series_df(spark, x), "user_id", "ts", "value", decimate=4
    ).toPandas()
    inner = out["filtered"].to_numpy()[1:-1]  # skip edge-padded ends
    assert np.abs(inner).max() < 0.05  # >26 dB attenuation above cutoff


def test_split_sentences_column(spark):
    from pliers_spark.functions.text import split_sentences

    df = spark.createDataFrame(
        [("A b. C d! E f? G",), ("no boundary here",), ("  ",)], "text string"
    )
    got = df.select(split_sentences("text").alias("s")).collect()
    assert got[0]["s"] == ["A b.", "C d!", "E f?", "G"]
    assert got[1]["s"] == ["no boundary here"]
    assert got[2]["s"] == []


def test_flag_features(spark):
    from pliers_spark.operators.diagnostics import flag_features

    pdf = pd.DataFrame(
        {
            "a": np.arange(100, dtype=float),
            "b": np.arange(100, dtype=float) * 2 + 1,  # collinear with a
            "c": np.full(100, 5.0),  # zero variance
        }
    )
    out = (
        flag_features(spark.createDataFrame(pdf), ["a", "b", "c"])
        .toPandas()
        .set_index("feature")
    )
    assert bool(out.loc["c", "low_variance"])
    assert bool(out.loc["a", "collinear"]) and bool(out.loc["b", "collinear"])
    assert out.loc["a", "max_abs_corr"] == pytest.approx(1.0)
    assert not bool(out.loc["a", "low_variance"])

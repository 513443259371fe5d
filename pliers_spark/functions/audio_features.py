"""Named librosa-style audio features over STFT power frames.

Parity targets (reference wraps librosa; librosa is absent here, so each
feature is the published textbook formula over this engine's own STFT
frames — same framing, same hop semantics as the reference's
``LibrosaFeatureExtractor`` family):

- ``SpectralCentroidExtractor``  (pliers/extractors/audio.py:224-232)
- ``SpectralBandwidthExtractor`` (pliers/extractors/audio.py:234-243)
- ``SpectralFlatnessExtractor``  (pliers/extractors/audio.py:245-254)
- ``SpectralRolloffExtractor``   (pliers/extractors/audio.py:276-284)
- ``RMSExtractor``               (pliers/extractors/audio.py:303-312)
- ``ZeroCrossingRateExtractor``  (pliers/extractors/audio.py:358-366)
- ``OnsetStrengthMultiExtractor`` (spectral flux, audio.py:347-356)
- ``MelspectrogramExtractor`` / ``MFCCExtractor`` (audio.py:421-454)

Engine shape: the ONLY Python stage is the FFT itself
(``spectral.stft_power_frames``, an Arrow-batched applyInPandas). Every
named feature here is a pure Column expression over the frame table —
JVM-side, whole-stage codegen, no second UDF. RMS/ZCR never need the
FFT at all and run as a 100%-built-in plan (window + bounded explode +
hash agg), the same bounded-frame-explode shape as
``temporal.framed_agg``.

Cross-engine float determinism: each feature's arithmetic is generated
ONCE as a SQL expression string with constant-folded ``repr``-emitted
literals; the Spark side parses it with ``F.expr`` and the DuckDB
oracle inlines the identical text. Same parse → same literal doubles →
same IEEE op sequence → identical raw float bits (sqrt, +, -, *, / are
IEEE-exact; pow/ln may differ in the last ulp between libm and the JVM,
which the final round(, 6) absorbs).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# framing constants shared with spectral.stft_power_frames' defaults
FRAME = 8
HOP = 4
SR = 8000  # notional sampling rate: bin k sits at k*SR/FRAME = k*1000 Hz
N_BINS = FRAME // 2 + 1


def _lit(x: float) -> str:
    """repr-emitted double literal — both engines parse decimal→nearest,
    so the same text yields the same 64-bit float."""
    return repr(float(x))


# --------------------------------------------------------------------------
# spectral shape: centroid / bandwidth / rolloff / flatness


def spectral_shape_exprs(
    prefix: str = "p", n_bins: int = N_BINS, bin_hz: float = SR / FRAME,
    roll_percent: float = 0.85,
) -> dict[str, str]:
    """Feature-name → SQL expression over power columns ``p0..p{n-1}``.

    - centroid  = Σ f_k·m_k / Σ m_k           (librosa.feature.spectral_centroid)
    - bandwidth = sqrt(Σ m_k·(f_k-c)² / Σ m_k) (p=2, spectral_bandwidth)
    - rolloff   = min f_k s.t. Σ_{j<=k} m_j ≥ roll·Σ m_j (spectral_rolloff)
    - flatness  = geomean(p̂_k) / mean(p̂_k), p̂ = max(p, 1e-10)
                  (spectral_flatness; geomean via pow(Π, 1/n))
    where m_k = sqrt(p_k) is the frame's magnitude at bin k.
    """
    mags = [f"sqrt({prefix}{k})" for k in range(n_bins)]
    total = " + ".join(mags)
    weighted = " + ".join(f"{_lit(k * bin_hz)} * {m}" for k, m in enumerate(mags))
    centroid = f"(CASE WHEN ({total}) > 0.0 THEN ({weighted}) / ({total}) ELSE NULL END)"
    spread = " + ".join(
        f"{m} * ({_lit(k * bin_hz)} - {centroid}) * ({_lit(k * bin_hz)} - {centroid})"
        for k, m in enumerate(mags)
    )
    bandwidth = f"(CASE WHEN ({total}) > 0.0 THEN sqrt(({spread}) / ({total})) ELSE NULL END)"
    # rolloff: CASE cascade over the cumulative magnitude prefix sums
    cums = [" + ".join(mags[: k + 1]) for k in range(n_bins)]
    cases = " ".join(
        f"WHEN ({cums[k]}) >= {_lit(roll_percent)} * ({total}) THEN {_lit(k * bin_hz)}"
        for k in range(n_bins)
    )
    rolloff = f"(CASE WHEN ({total}) > 0.0 THEN (CASE {cases} END) ELSE NULL END)"
    floored = [f"greatest({prefix}{k}, 1e-10)" for k in range(n_bins)]
    prod = " * ".join(floored)
    amean = f"(({' + '.join(floored)}) / {_lit(n_bins)})"
    flatness = f"(pow({prod}, {_lit(1.0 / n_bins)}) / {amean})"
    return {
        "centroid_hz": f"round({centroid}, 6)",
        "bandwidth_hz": f"round({bandwidth}, 6)",
        "rolloff_hz": f"round({rolloff}, 6)",
        "flatness": f"round({flatness}, 6)",
    }


def spectral_shape(frames: DataFrame, entity_col: str = "user_id") -> DataFrame:
    """Column-only feature stage over ``stft_power_frames`` output."""
    exprs = spectral_shape_exprs()
    return frames.select(
        entity_col, "frame", *[F.expr(e).alias(n) for n, e in exprs.items()]
    )


def spectral_shape_sql(stft_sql: str) -> str:
    exprs = spectral_shape_exprs()
    sel = ",\n       ".join(f"{e} AS {n}" for n, e in exprs.items())
    return f"WITH stft AS (\n{stft_sql}\n)\nSELECT user_id, frame,\n       {sel}\nFROM stft"


# --------------------------------------------------------------------------
# spectral flux (onset strength): positive magnitude delta vs previous frame


def spectral_flux_expr(prefix: str = "p", lag_prefix: str = "lp", n_bins: int = N_BINS) -> str:
    terms = " + ".join(
        f"pow(greatest(sqrt({prefix}{k}) - sqrt({lag_prefix}{k}), 0.0), 2)"
        for k in range(n_bins)
    )
    return f"round({terms}, 6)"


def spectral_flux(frames: DataFrame, entity_col: str = "user_id") -> DataFrame:
    """Per-entity frame-over-frame onset strength: one extra window pass
    (lag of each power column), then a pure Column expression. First
    frame has no predecessor and is dropped (librosa pads; the engine's
    leakage rule forbids synthesizing a t-1 frame)."""
    w = Window.partitionBy(entity_col).orderBy("frame")
    out = frames
    for k in range(N_BINS):
        out = out.withColumn(f"lp{k}", F.lag(f"p{k}").over(w))
    return out.where(F.col("lp0").isNotNull()).select(
        entity_col, "frame", F.expr(spectral_flux_expr()).alias("flux")
    )


def spectral_flux_sql(stft_sql: str) -> str:
    lags = ", ".join(
        f"lag(p{k}) OVER (PARTITION BY user_id ORDER BY frame) AS lp{k}"
        for k in range(N_BINS)
    )
    return f"""WITH stft AS (
{stft_sql}
), lagged AS (
  SELECT user_id, frame, {', '.join(f'p{k}' for k in range(N_BINS))}, {lags}
  FROM stft)
SELECT user_id, frame, {spectral_flux_expr()} AS flux
FROM lagged WHERE lp0 IS NOT NULL"""


# --------------------------------------------------------------------------
# RMS + zero-crossing rate: no FFT, 100% built-in plan


def rms_zcr(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    frame: int = FRAME,
    hop: int = HOP,
) -> DataFrame:
    """RMSExtractor + ZeroCrossingRateExtractor on the first-difference
    series, with the STFT's row-index framing (full frames only).

    ZCR counts sign changes of s_n = x_n - x_{n-1} between consecutive
    in-frame positions, / frame (librosa's mean-crossings convention,
    applied to the detrended series so a positive-valued signal still
    crosses). Entirely deterministic: integer counts, one shuffle for
    the window, one for the frame agg; the frame explode is bounded by
    frame/hop (≤2 copies/row) exactly like ``temporal.framed_agg``.
    """
    # every window reuses ONE spec — partition by entity, order by
    # (ts, tiebreak) — so the physical plan sorts once inside a single
    # exchange; ordering the later lags by the derived `n` instead
    # would insert a redundant Sort per window (same effective order,
    # but Catalyst cannot prove it)
    wo = Window.partitionBy(entity_col).orderBy(ts_col, tiebreak_col)
    wp = Window.partitionBy(entity_col)
    n = F.row_number().over(wo) - F.lit(1)
    d = df.select(
        entity_col,
        F.col(ts_col),
        F.col(tiebreak_col),
        n.alias("n"),
        F.count(F.lit(1)).over(wp).alias("len"),
        F.col(value_col).alias("x"),
    )
    d = d.withColumn("s", F.col("x") - F.lag("x").over(wo))
    d = d.withColumn(
        "crossing",
        F.when(
            F.lag("s").over(wo).isNotNull()
            & ((F.col("s") < 0) != (F.lag("s").over(wo) < 0)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).drop(ts_col, tiebreak_col)
    f_lo = F.greatest(F.ceil((F.col("n") - F.lit(frame - 1)) / F.lit(float(hop))).cast("long"), F.lit(0))
    f_hi = F.least(
        F.floor(F.col("n") / F.lit(float(hop))).cast("long"),
        F.floor((F.col("len") - F.lit(frame)) / F.lit(float(hop))).cast("long"),
    )
    d = d.withColumn("f_lo", f_lo).withColumn("f_hi", f_hi)
    d = d.withColumn(
        "f",
        F.explode(
            F.when(F.col("f_lo") <= F.col("f_hi"), F.sequence("f_lo", "f_hi")).otherwise(
                F.array().cast("array<long>")
            )
        ),
    )
    return d.groupBy(F.col(entity_col), F.col("f").alias("frame")).agg(
        F.round(F.sqrt(F.sum(F.col("x") * F.col("x")) / F.lit(float(frame))), 6).alias("rms"),
        (
            F.sum(F.when(F.col("n") > F.col("f") * hop, F.col("crossing")).otherwise(F.lit(0)))
            / F.lit(float(frame))
        ).alias("zcr"),
    )


def rms_zcr_sql(
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    table: str = "events",
    frame: int = FRAME,
    hop: int = HOP,
) -> str:
    return f"""WITH x AS (
  SELECT {entity_col},
         row_number() OVER (PARTITION BY {entity_col} ORDER BY {ts_col}, {tiebreak_col}) - 1 AS n,
         count(*) OVER (PARTITION BY {entity_col}) AS len,
         {value_col} AS x
  FROM {table}),
s AS (
  SELECT *, x - lag(x) OVER (PARTITION BY {entity_col} ORDER BY n) AS s FROM x),
c AS (
  SELECT *, CASE WHEN lag(s) OVER (PARTITION BY {entity_col} ORDER BY n) IS NOT NULL
                  AND ((s < 0) != (lag(s) OVER (PARTITION BY {entity_col} ORDER BY n) < 0))
                 THEN 1 ELSE 0 END AS crossing
  FROM s),
fr AS (
  SELECT *, unnest(generate_series(
              greatest(cast(ceil((n - {frame - 1}) / {hop}.0) AS BIGINT), 0),
              least(cast(floor(n / {hop}.0) AS BIGINT),
                    cast(floor((len - {frame}) / {hop}.0) AS BIGINT)))) AS f
  FROM c)
SELECT {entity_col}, f AS frame,
       round(sqrt(sum(x * x) / {_lit(frame)}), 6) AS rms,
       sum(CASE WHEN n > f * {hop} THEN crossing ELSE 0 END) / {_lit(frame)} AS zcr
FROM fr GROUP BY {entity_col}, f"""


# --------------------------------------------------------------------------
# mel spectrogram + MFCC, constant-folded filterbank/DCT literals


def mel_dct_weights(
    n_mels: int = 3, n_bins: int = N_BINS, sr: int = SR, n_fft: int = FRAME,
    n_mfcc: int = 3,
) -> tuple[list[list[float]], list[list[float]]]:
    """HTK-style triangular mel filterbank + orthonormal DCT-II matrix,
    computed once driver-side with scalar math so both engines receive
    the identical repr literals. (librosa.filters.mel htk=True role;
    scipy.fftpack.dct(type=2, norm='ortho') role.)"""

    def mel(f: float) -> float:
        return 2595.0 * math.log10(1.0 + f / 700.0)

    def imel(m: float) -> float:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    hi = mel(sr / 2.0)
    pts = [imel(hi * i / (n_mels + 1)) for i in range(n_mels + 2)]
    bin_hz = sr / n_fft
    fb: list[list[float]] = []
    for m in range(n_mels):
        row = []
        for k in range(n_bins):
            f = k * bin_hz
            lo, c, up = pts[m], pts[m + 1], pts[m + 2]
            w = min((f - lo) / (c - lo), (up - f) / (up - c))
            row.append(max(0.0, w))
        fb.append(row)
    dct = []
    for c in range(n_mfcc):
        row = []
        for m in range(n_mels):
            if c == 0:
                row.append(math.sqrt(1.0 / n_mels))
            else:
                row.append(math.sqrt(2.0 / n_mels) * math.cos(math.pi * c * (2 * m + 1) / (2 * n_mels)))
        dct.append(row)
    return fb, dct


def mfcc_exprs(prefix: str = "p", n_mels: int = 3, n_mfcc: int = 3) -> dict[str, str]:
    fb, dct = mel_dct_weights(n_mels=n_mels, n_mfcc=n_mfcc)
    logmels = []
    for m in range(n_mels):
        terms = " + ".join(
            f"{_lit(w)} * {prefix}{k}" for k, w in enumerate(fb[m]) if w > 0.0
        ) or "0.0"
        logmels.append(f"ln(({terms}) + 1e-10)")
    out: dict[str, str] = {}
    for m in range(n_mels):
        out[f"logmel{m}"] = f"round({logmels[m]}, 6)"
    for c in range(n_mfcc):
        combo = " + ".join(f"{_lit(dct[c][m])} * ({logmels[m]})" for m in range(n_mels))
        out[f"mfcc{c}"] = f"round({combo}, 6)"
    return out


def mel_mfcc(frames: DataFrame, entity_col: str = "user_id") -> DataFrame:
    exprs = mfcc_exprs()
    return frames.select(
        entity_col, "frame", *[F.expr(e).alias(n) for n, e in exprs.items()]
    )


def mel_mfcc_sql(stft_sql: str) -> str:
    exprs = mfcc_exprs()
    sel = ",\n       ".join(f"{e} AS {n}" for n, e in exprs.items())
    return f"WITH stft AS (\n{stft_sql}\n)\nSELECT user_id, frame,\n       {sel}\nFROM stft"


# --------------------------------------------------------------------------
# poly_features: least-squares line fit over each frame's magnitude spectrum


def poly_features_exprs(
    prefix: str = "p", n_bins: int = N_BINS, bin_hz: float = SR / FRAME,
) -> dict[str, str]:
    """PolyFeaturesExtractor order=1 (pliers/extractors/audio.py:286-300;
    librosa.feature.poly_features ≡ np.polyfit(freqs, mag, 1)): the
    closed-form least-squares line through the n_bins points
    (f_k, m_k = sqrt(p_k)). np.polyfit returns highest degree first, so
    coefficient_0 is the slope and coefficient_1 the intercept —
    matching the reference's 'coefficient_%d' feature names. The
    frequency sums are constants and fold into literals."""
    freqs = [k * bin_hz for k in range(n_bins)]
    n = float(n_bins)
    sf = sum(freqs)
    sff = sum(f * f for f in freqs)
    denom = n * sff - sf * sf
    mags = [f"sqrt({prefix}{k})" for k in range(n_bins)]
    sm = " + ".join(mags)
    sfm = " + ".join(f"{_lit(f)} * {m}" for f, m in zip(freqs, mags))
    slope = f"(({_lit(n)} * ({sfm}) - {_lit(sf)} * ({sm})) / {_lit(denom)})"
    intercept = f"((({sm}) - {slope} * {_lit(sf)}) / {_lit(n)})"
    return {
        "coefficient_0": f"round({slope}, 6)",
        "coefficient_1": f"round({intercept}, 6)",
    }


def poly_features(frames: DataFrame, entity_col: str = "user_id") -> DataFrame:
    exprs = poly_features_exprs()
    return frames.select(
        entity_col, "frame", *[F.expr(e).alias(n) for n, e in exprs.items()]
    )


def poly_features_sql(stft_sql: str) -> str:
    exprs = poly_features_exprs()
    sel = ",\n       ".join(f"{e} AS {n}" for n, e in exprs.items())
    return f"WITH stft AS (\n{stft_sql}\n)\nSELECT user_id, frame,\n       {sel}\nFROM stft"


# --------------------------------------------------------------------------
# onset detection + tempo over the flux envelope


def onset_detect(frames: DataFrame, entity_col: str = "user_id", delta: float = 0.5) -> DataFrame:
    """OnsetDetectExtractor role (pliers/extractors/audio.py:314-322;
    librosa.onset.onset_detect): peak-pick the onset-strength envelope.
    Clean-room simplified rule (documented, deterministic): frame t is
    an onset iff its flux is a strict local max over the ±1 window AND
    exceeds the trailing mean of the previous 3 frames by ``delta``.
    Two window passes (lag/lead + trailing avg), comparisons only —
    the only emitted float is the already-rounded flux."""
    flux = spectral_flux(frames, entity_col)
    w = Window.partitionBy(entity_col).orderBy("frame")
    trail = (
        Window.partitionBy(entity_col).orderBy("frame").rowsBetween(-3, -1)
    )
    d = (
        flux.withColumn("prev", F.lag("flux").over(w))
        .withColumn("next", F.lead("flux").over(w))
        .withColumn("trail_mean", F.avg("flux").over(trail))
    )
    return d.where(
        F.col("prev").isNotNull()
        & F.col("next").isNotNull()
        & F.col("trail_mean").isNotNull()
        & (F.col("flux") > F.col("prev"))
        & (F.col("flux") >= F.col("next"))
        & (F.col("flux") >= F.col("trail_mean") + F.lit(delta))
    ).select(entity_col, "frame", "flux")


def onset_detect_sql(stft_sql: str, delta: float = 0.5) -> str:
    return f"""WITH flux_t AS (
{spectral_flux_sql(stft_sql)}
), d AS (
  SELECT user_id, frame, flux,
         lag(flux) OVER (PARTITION BY user_id ORDER BY frame) AS prev,
         lead(flux) OVER (PARTITION BY user_id ORDER BY frame) AS next,
         avg(flux) OVER (PARTITION BY user_id ORDER BY frame
                         ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS trail_mean
  FROM flux_t)
SELECT user_id, frame, flux
FROM d
WHERE prev IS NOT NULL AND next IS NOT NULL AND trail_mean IS NOT NULL
  AND flux > prev AND flux >= next AND flux >= trail_mean + {_lit(delta)}"""


def tempo_autocorr(
    frames: DataFrame, entity_col: str = "user_id", max_lag: int = 6
) -> DataFrame:
    """TempoExtractor role (pliers/extractors/audio.py:325-333;
    librosa.beat.tempo): dominant periodicity of the onset-strength
    envelope via autocorrelation — acf(L) = Σ_t flux_t · flux_{t-L} for
    L = 1..max_lag per entity, best lag = argmax (ties → smallest L),
    tempo_bpm = 60·sr/(hop·L). One window pass for the lags, one agg;
    acf rounded to 4dp on both engines before the argmax so the
    comparison is cross-engine stable."""
    flux = spectral_flux(frames, entity_col)
    w = Window.partitionBy(entity_col).orderBy("frame")
    d = flux
    for L in range(1, max_lag + 1):
        d = d.withColumn(f"fl{L}", F.lag("flux", L).over(w))
    agg = d.groupBy(entity_col).agg(
        *[
            F.round(F.sum(F.col("flux") * F.col(f"fl{L}")), 4).alias(f"acf{L}")
            for L in range(1, max_lag + 1)
        ]
    )
    best = F.greatest(*[F.col(f"acf{L}") for L in range(1, max_lag + 1)])
    lag_case = F.when(F.col("acf1") == best, F.lit(1))
    for L in range(2, max_lag + 1):
        lag_case = lag_case.when(F.col(f"acf{L}") == best, F.lit(L))
    out = agg.where(best.isNotNull()).withColumn("best_lag", lag_case.cast("long"))
    bpm = F.round(F.lit(60.0 * SR) / (F.lit(float(HOP)) * F.col("best_lag")), 6)
    return out.select(entity_col, "best_lag", bpm.alias("tempo_bpm"))


def tempo_autocorr_sql(stft_sql: str, max_lag: int = 6) -> str:
    lags = ", ".join(
        f"lag(flux, {L}) OVER (PARTITION BY user_id ORDER BY frame) AS fl{L}"
        for L in range(1, max_lag + 1)
    )
    accs = ", ".join(
        f"round(sum(flux * fl{L}), 4) AS acf{L}" for L in range(1, max_lag + 1)
    )
    best = "greatest(" + ", ".join(f"acf{L}" for L in range(1, max_lag + 1)) + ")"
    case = "CASE " + " ".join(
        f"WHEN acf{L} = {best} THEN {L}" for L in range(1, max_lag + 1)
    ) + " END"
    return f"""WITH flux_t AS (
{spectral_flux_sql(stft_sql)}
), lagged AS (
  SELECT user_id, frame, flux, {lags} FROM flux_t),
acc AS (
  SELECT user_id, {accs} FROM lagged GROUP BY user_id)
SELECT user_id, CAST({case} AS BIGINT) AS best_lag,
       round({_lit(60.0 * SR)} / ({_lit(float(HOP))} * ({case})), 6) AS tempo_bpm
FROM acc WHERE {best} IS NOT NULL"""


# --------------------------------------------------------------------------
# harmonic/percussive separation (HPSS) energy split


def hpss_exprs(prefix: str = "p", n_bins: int = N_BINS) -> dict[str, str]:
    """Median-filtering HPSS recast (HarmonicExtractor /
    PercussiveExtractor, pliers/extractors/audio.py:488-506;
    Fitzgerald 2010's median-filter method behind librosa.effects.
    harmonic/percussive): per bin, H_k = median of the bin's power over
    the ±2-frame time window (columns ``{prefix}{k}_m2..p2``), P_k =
    median across the frame's frequency bins; soft mask
    m_k = H_k²/(H_k²+P_k²+ε), harmonic_energy = Σ p_k·m_k,
    percussive_energy = Σ p_k·(1−m_k). Median-of-5 = element 3 of the
    sorted array — identical doubles sort identically on both engines."""
    freq_med = (
        "(array_sort(array(" + ", ".join(f"{prefix}{k}" for k in range(n_bins)) + "))"
        f"[{n_bins // 2}])"
    )
    h_terms, p_terms = [], []
    for k in range(n_bins):
        tmed = (
            f"(array_sort(array({prefix}{k}_m2, {prefix}{k}_m1, {prefix}{k}, "
            f"{prefix}{k}_p1, {prefix}{k}_p2))[2])"
        )
        mask = f"(pow({tmed}, 2) / (pow({tmed}, 2) + pow({freq_med}, 2) + 1e-10))"
        h_terms.append(f"{prefix}{k} * {mask}")
        p_terms.append(f"{prefix}{k} * (1.0 - {mask})")
    return {
        "harmonic_energy": f"round({' + '.join(h_terms)}, 6)",
        "percussive_energy": f"round({' + '.join(p_terms)}, 6)",
    }


def hpss_energy(frames: DataFrame, entity_col: str = "user_id") -> DataFrame:
    """Adds the ±2-frame lag/lead columns (one shared window spec → one
    Sort) then evaluates the shared-text mask expressions. Edge frames
    without a full ±2 neighborhood are dropped (no synthetic padding —
    the same no-fabricated-history rule as spectral_flux)."""
    w = Window.partitionBy(entity_col).orderBy("frame")
    out = frames
    for k in range(N_BINS):
        out = (
            out.withColumn(f"p{k}_m2", F.lag(f"p{k}", 2).over(w))
            .withColumn(f"p{k}_m1", F.lag(f"p{k}", 1).over(w))
            .withColumn(f"p{k}_p1", F.lead(f"p{k}", 1).over(w))
            .withColumn(f"p{k}_p2", F.lead(f"p{k}", 2).over(w))
        )
    out = out.where(F.col("p0_m2").isNotNull() & F.col("p0_p2").isNotNull())
    exprs = hpss_exprs()
    return out.select(
        entity_col, "frame", *[F.expr(e).alias(n) for n, e in exprs.items()]
    )


def hpss_energy_sql(stft_sql: str) -> str:
    lags = []
    for k in range(N_BINS):
        lags += [
            f"lag(p{k}, 2) OVER w AS p{k}_m2",
            f"lag(p{k}, 1) OVER w AS p{k}_m1",
            f"lead(p{k}, 1) OVER w AS p{k}_p1",
            f"lead(p{k}, 2) OVER w AS p{k}_p2",
        ]
    exprs = hpss_exprs()
    # DuckDB lists are 1-indexed; Spark arrays 0-indexed — shift the
    # subscripts in the shared expression text
    sel = ",\n       ".join(
        f"{_shift_subscripts(e)} AS {n}" for n, e in exprs.items()
    )
    return f"""WITH stft AS (
{stft_sql}
), lagged AS (
  SELECT user_id, frame, {', '.join(f'p{k}' for k in range(N_BINS))},
         {', '.join(lags)}
  FROM stft
  WINDOW w AS (PARTITION BY user_id ORDER BY frame))
SELECT user_id, frame,
       {sel}
FROM lagged WHERE p0_m2 IS NOT NULL AND p0_p2 IS NOT NULL"""


def _shift_subscripts(expr: str) -> str:
    """Rewrite Spark's 0-based ``)[i]`` array subscripts to DuckDB's
    1-based ``)[i+1]`` and ``array_sort(array(`` to ``list_sort([``."""
    import re

    out = expr.replace("array_sort(array(", "list_sort([").replace("))[", "])[")
    return re.sub(r"\]\)\[(\d+)\]", lambda m: f"])[{int(m.group(1)) + 1}]", out)


# --------------------------------------------------------------------------
# fundamental frequency (YIN), 100% built-in — no UDF, not even for framing


def yin_exprs(
    frame: int = FRAME, w: int = 4, tau_max: int = 4, threshold: float = 0.1,
    prefix: str = "x", sr: int = SR,
) -> dict[str, str]:
    """FundamentalFrequencyExtractor role (pliers/extractors/audio.py:
    508-521; librosa.pyin's underlying YIN, de Cheveigné & Kawahara
    2002): per frame, difference function d(τ) = Σ_{j<w} (x_j −
    x_{j+τ})², cumulative-mean-normalized d'(τ) = d(τ)·τ / Σ_{i≤τ} d(i),
    best τ = first lag with d'(τ) < threshold else argmin (smallest lag
    on ties), f0 = sr/τ. Constant frames (Σ d = 0) emit NULLs. The
    probabilistic (pYIN) layer needs an HMM — out of scope, documented.

    Returns a list of stage dicts (name → expr) — each stage references
    only the PREVIOUS stage's named columns, so every projection stays
    small enough for whole-stage codegen (the single-expression form
    blew the 64KB generated-method limit and fell back to interpreted
    evaluation)."""
    stage_d = {
        f"d{tau}": "(" + " + ".join(
            f"pow({prefix}{j} - {prefix}{j + tau}, 2)" for j in range(w)
        ) + ")"
        for tau in range(1, tau_max + 1)
    }
    stage_c = {"dtot": " + ".join(f"d{t}" for t in range(1, tau_max + 1))}
    for tau in range(1, tau_max + 1):
        cum = " + ".join(f"d{t}" for t in range(1, tau + 1))
        # NULL when the cumulative sum is 0 (flat prefix): ANSI Spark
        # raises on 0/0 and DuckDB returns NaN — both engines must skip
        # the lag instead (least/CASE ignore NULLs identically)
        stage_c[f"c{tau}"] = (
            f"(CASE WHEN ({cum}) > 0.0 THEN d{tau} * {_lit(float(tau))} / ({cum}) END)"
        )
    least_all = "least(" + ", ".join(f"c{t}" for t in range(1, tau_max + 1)) + ")"
    thr_cases = " ".join(
        f"WHEN c{t} < {_lit(threshold)} THEN {t}" for t in range(1, tau_max + 1)
    )
    argmin_cases = " ".join(
        f"WHEN c{t} = {least_all} THEN {t}" for t in range(1, tau_max + 1)
    )
    stage_best = {
        "raw_tau": f"(CASE {thr_cases} ELSE (CASE {argmin_cases} END) END)",
        "cmin": least_all,
    }
    f0 = " ".join(
        f"WHEN raw_tau = {t} THEN CAST({_lit(sr / t)} AS DOUBLE)"
        for t in range(1, tau_max + 1)
    )
    stage_out = {
        "best_tau": "CASE WHEN dtot > 0.0 THEN CAST(raw_tau AS BIGINT) END",
        "f0_hz": f"CASE WHEN dtot > 0.0 THEN (CASE {f0} END) END",
        "cmnd_min": "CASE WHEN dtot > 0.0 THEN round(cmin, 6) END",
    }
    return [stage_d, stage_c, stage_best, stage_out]


def position_pivot_frames(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    frame: int = FRAME,
    hop: int = HOP,
) -> DataFrame:
    """Framing with the rms_zcr shape (row_number window → bounded
    frame explode → one exchange), then the frame's samples pivot into
    position columns x0..x{frame-1} via conditional aggregation — so
    downstream per-frame features are built-in expressions inside
    whole-stage codegen. Only full frames are emitted. Shared by YIN
    and the constant-Q chroma family."""
    wo = Window.partitionBy(entity_col).orderBy(ts_col, tiebreak_col)
    wp = Window.partitionBy(entity_col)
    d = df.select(
        entity_col,
        F.col(ts_col),
        F.col(tiebreak_col),
        (F.row_number().over(wo) - F.lit(1)).alias("n"),
        F.count(F.lit(1)).over(wp).alias("len"),
        F.col(value_col).alias("v"),
    ).drop(ts_col, tiebreak_col)
    f_lo = F.greatest(F.ceil((F.col("n") - F.lit(frame - 1)) / F.lit(float(hop))).cast("long"), F.lit(0))
    f_hi = F.least(
        F.floor(F.col("n") / F.lit(float(hop))).cast("long"),
        F.floor((F.col("len") - F.lit(frame)) / F.lit(float(hop))).cast("long"),
    )
    d = d.withColumn("f_lo", f_lo).withColumn("f_hi", f_hi)
    d = d.withColumn(
        "f",
        F.explode(
            F.when(F.col("f_lo") <= F.col("f_hi"), F.sequence("f_lo", "f_hi")).otherwise(
                F.array().cast("array<long>")
            )
        ),
    ).withColumn("j", F.col("n") - F.col("f") * hop)
    return d.groupBy(F.col(entity_col), F.col("f").alias("frame")).agg(
        *[F.max(F.when(F.col("j") == j, F.col("v"))).alias(f"x{j}") for j in range(frame)]
    )


def position_pivot_sql(
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    table: str = "events",
    frame: int = FRAME,
    hop: int = HOP,
) -> str:
    """The x/fr/j/piv CTE prelude matching ``position_pivot_frames`` —
    callers append their own stages after ``piv``."""
    piv = ", ".join(
        f"max(CASE WHEN j = {j} THEN v END) AS x{j}" for j in range(frame)
    )
    return f"""x AS (
  SELECT {entity_col},
         row_number() OVER (PARTITION BY {entity_col} ORDER BY {ts_col}, {tiebreak_col}) - 1 AS n,
         count(*) OVER (PARTITION BY {entity_col}) AS len,
         {value_col} AS v
  FROM {table}),
fr AS (
  SELECT *, unnest(generate_series(
              greatest(cast(ceil((n - {frame - 1}) / {hop}.0) AS BIGINT), 0),
              least(cast(floor(n / {hop}.0) AS BIGINT),
                    cast(floor((len - {frame}) / {hop}.0) AS BIGINT)))) AS f
  FROM x),
j AS (SELECT *, n - f * {hop} AS j FROM fr),
piv AS (
  SELECT {entity_col}, f AS frame, {piv}
  FROM j GROUP BY {entity_col}, f)"""


def yin_f0(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    frame: int = FRAME,
    hop: int = HOP,
) -> DataFrame:
    """YIN over the shared position-pivot framing — the whole pipeline
    is built-in expressions inside whole-stage codegen."""
    pivoted = position_pivot_frames(
        df, entity_col, ts_col, value_col, tiebreak_col, frame, hop
    )
    stages = yin_exprs()
    out = pivoted
    for stage in stages:
        out = out.select(
            "*", *[F.expr(e).alias(n) for n, e in stage.items()]
        )
    final_cols = list(stages[-1])
    return out.select(entity_col, "frame", *final_cols)


def yin_f0_sql(
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    table: str = "events",
    frame: int = FRAME,
    hop: int = HOP,
) -> str:
    stages = yin_exprs()
    ctes = []
    prev = "piv"
    for i, stage in enumerate(stages[:-1]):
        name = f"s{i}"
        cols = ", ".join(f"{e} AS {n}" for n, e in stage.items())
        ctes.append(f"{name} AS (SELECT *, {cols} FROM {prev})")
        prev = name
    sel = ",\n       ".join(f"{e} AS {n}" for n, e in stages[-1].items())
    stage_sql = ",\n".join(ctes)
    prelude = position_pivot_sql(
        entity_col, ts_col, value_col, tiebreak_col, table, frame, hop
    )
    return f"""WITH {prelude},
{stage_sql}
SELECT {entity_col}, frame,
       {sel}
FROM {prev}"""


# --------------------------------------------------------------------------
# chroma: fold frequency bins onto pitch classes


def chroma_exprs(
    prefix: str = "p", n_bins: int = N_BINS, bin_hz: float = SR / FRAME,
) -> dict[str, str]:
    """ChromaSTFTExtractor role (pliers/extractors/audio.py:368-384;
    librosa.feature.chroma_stft): fold each non-DC bin's power onto its
    pitch class pc = round(12·log2(f/440) + 69) mod 12 (A440 equal
    temperament), then max-normalize per frame. The class map is
    computed driver-side (literal), so the fold is a plain sum per
    class; empty classes emit exact 0.0."""
    classes: dict[int, list[int]] = {}
    for k in range(1, n_bins):
        pc = round(12 * math.log2(k * bin_hz / 440.0) + 69) % 12
        classes.setdefault(pc, []).append(k)
    sums = {
        c: "(" + " + ".join(f"{prefix}{k}" for k in ks) + ")"
        for c, ks in classes.items()
    }
    mx = "greatest(" + ", ".join(sums.values()) + ", 1e-10)"
    out = {}
    for c in range(12):
        if c in sums:
            out[f"chroma_{c}"] = f"round({sums[c]} / {mx}, 6)"
        else:
            out[f"chroma_{c}"] = "0.0"
    return out


def chroma_stft(frames: DataFrame, entity_col: str = "user_id") -> DataFrame:
    exprs = chroma_exprs()
    return frames.select(
        entity_col, "frame",
        *[F.expr(e).cast("double").alias(n) for n, e in exprs.items()],
    )


def chroma_stft_sql(stft_sql: str) -> str:
    exprs = chroma_exprs()
    sel = ",\n       ".join(f"CAST({e} AS DOUBLE) AS {n}" for n, e in exprs.items())
    return f"WITH stft AS (\n{stft_sql}\n)\nSELECT user_id, frame,\n       {sel}\nFROM stft"


# --------------------------------------------------------------------------
# MFCC energy: low/high-quefrency mel-spectrum reconstruction


def mfcc_energy_exprs(
    prefix: str = "p", n_mels: int = 3, n_mfcc: int = 3, n_coefs: int = 2,
) -> dict[str, str]:
    """MFCCEnergyExtractor (pliers/extractors/audio.py:645-703; Hanke
    et al. 2015): zero out the high (resp. low) cepstral coefficients
    and map back to the mel-spectrum domain with the inverse DCT —
    'low' register keeps coefficients 0..n_coefs-1 (timbre/broad
    spectrum), 'high' keeps the rest (pitch/fine structure). Since the
    orthonormal DCT is literal, the reconstruction composes into one
    linear expression over the log-mel columns; we emit the
    reconstructed log-mel band values for both registers."""
    _, dct = mel_dct_weights(n_mels=n_mels, n_mfcc=n_mfcc)
    logmels = [e[len("round(") : -len(", 6)")] for e in
               [mfcc_exprs(prefix, n_mels, n_mfcc)[f"logmel{m}"] for m in range(n_mels)]]
    mfccs = [
        "(" + " + ".join(f"{_lit(dct[c][m])} * ({logmels[m]})" for m in range(n_mels)) + ")"
        for c in range(n_mfcc)
    ]
    out = {}
    for reg, keep in (("low", range(n_coefs)), ("high", range(n_coefs, n_mfcc))):
        for m in range(n_mels):
            rec = " + ".join(f"{_lit(dct[c][m])} * {mfccs[c]}" for c in keep)
            out[f"{reg}_mel{m}"] = f"round({rec}, 6)"
    return out


def mfcc_energy(frames: DataFrame, entity_col: str = "user_id") -> DataFrame:
    exprs = mfcc_energy_exprs()
    return frames.select(
        entity_col, "frame", *[F.expr(e).alias(n) for n, e in exprs.items()]
    )


def mfcc_energy_sql(stft_sql: str) -> str:
    exprs = mfcc_energy_exprs()
    sel = ",\n       ".join(f"{e} AS {n}" for n, e in exprs.items())
    return f"WITH stft AS (\n{stft_sql}\n)\nSELECT user_id, frame,\n       {sel}\nFROM stft"


# --------------------------------------------------------------------------
# tempogram: windowed local autocorrelation of the onset envelope


def tempogram(
    frames: DataFrame, entity_col: str = "user_id", max_lag: int = 4, win: int = 8,
) -> DataFrame:
    """TempogramExtractor role (pliers/extractors/audio.py:470-486;
    librosa.feature.tempogram): the LOCAL autocorrelation of the
    onset-strength envelope — for each frame t and lag L,
    tg_L(t) = Σ_{u ∈ [t-win+1, t]} flux_u · flux_{u-L}, i.e. the tempo
    salience at that moment rather than one global estimate (``tempo``).
    Shape: per-row lag products g_L = flux·lag(flux, L), then each
    tg_L is the EXPLICIT fixed-order sum of the trailing ``win`` lag
    products (not a windowed SUM: DuckDB evaluates sliding aggregates
    with a segment tree — pairwise summation — while Spark accumulates
    linearly, so the two engines disagree in the last ulp at tempogram
    magnitudes; a written-out left-associative 8-term sum is
    bit-identical on both). Outputs are FLOORED to BIGINT: at tempogram
    magnitudes (~1e9) round(x, 6) itself diverges between engines
    (DuckDB's multiply/round/divide vs Spark's exact BigDecimal differ
    in the last ulp when the decimal grid is finer than the float
    grid), while floor of an identical double is identical. One window
    spec throughout → one Sort, no UDF. Frames without full history are
    dropped (any NULL lag nulls the sum; no zero-padding — the
    no-fabricated-history rule)."""
    flux = spectral_flux(frames, entity_col)
    w = Window.partitionBy(entity_col).orderBy("frame")
    d = flux
    for L in range(1, max_lag + 1):
        d = d.withColumn(f"g{L}", F.col("flux") * F.lag("flux", L).over(w))
    for L in range(1, max_lag + 1):
        terms = F.col(f"g{L}")
        for i in range(1, win):
            terms = terms + F.lag(f"g{L}", i).over(w)
        d = d.withColumn(f"tg{L}", F.floor(terms).cast("long"))
    return d.where(F.col(f"tg{max_lag}").isNotNull()).select(
        entity_col, "frame", *[f"tg{L}" for L in range(1, max_lag + 1)]
    )


def tempogram_sql(stft_sql: str, max_lag: int = 4, win: int = 8) -> str:
    gs = ", ".join(
        f"flux * lag(flux, {L}) OVER w AS g{L}" for L in range(1, max_lag + 1)
    )
    tgs = ", ".join(
        "floor("
        + " + ".join([f"g{L}"] + [f"lag(g{L}, {i}) OVER w2" for i in range(1, win)])
        + f")::BIGINT AS tg{L}"
        for L in range(1, max_lag + 1)
    )
    sel = ", ".join(f"tg{L}" for L in range(1, max_lag + 1))
    return f"""WITH flux_t AS (
{spectral_flux_sql(stft_sql)}
), g AS (
  SELECT user_id, frame, flux, {gs}
  FROM flux_t
  WINDOW w AS (PARTITION BY user_id ORDER BY frame)),
tg AS (
  SELECT user_id, frame, {tgs}
  FROM g
  WINDOW w2 AS (PARTITION BY user_id ORDER BY frame))
SELECT user_id, frame, {sel} FROM tg WHERE tg{max_lag} IS NOT NULL"""


# --------------------------------------------------------------------------
# constant-Q chroma family: chroma_cqt → chroma_cens → tonnetz


def cqt_chroma_exprs(
    frame: int = FRAME, fmin: float = 500.0, n_bins: int = 12,
    bins_per_octave: int = 12, sr: int = SR, prefix: str = "x",
) -> list[dict[str, str]]:
    """ChromaCQTExtractor role (pliers/extractors/audio.py:386-397;
    librosa.feature.chroma_cqt): project each frame onto log-spaced
    complex kernels at f_b = fmin·2^(b/12) (equal temperament), fold
    bin power onto pitch class pc(b) = (pc(fmin)+b) mod 12, then
    max-normalize per frame (librosa's norm=inf default).

    Kernel caveat, documented: a true CQT lengthens its window as Q/f_b
    — with the engine's fixed frame of 8 samples every kernel is
    clamped to the frame (Hann-windowed), i.e. the filter_scale
    truncation librosa itself applies when the frame bounds the kernel.
    All weights are driver-side literals; the hot path is
    fused multiply-adds inside whole-stage codegen."""
    stage_ri: dict[str, str] = {}
    for b in range(n_bins):
        fb = fmin * 2.0 ** (b / bins_per_octave)
        re_terms, im_terms = [], []
        for t in range(frame):
            w = 0.5 - 0.5 * math.cos(2.0 * math.pi * t / frame)  # Hann
            ang = 2.0 * math.pi * fb * t / sr
            re_terms.append(f"{_lit(w * math.cos(ang))} * {prefix}{t}")
            im_terms.append(f"{_lit(-w * math.sin(ang))} * {prefix}{t}")
        stage_ri[f"re{b}"] = "(" + " + ".join(re_terms) + ")"
        stage_ri[f"im{b}"] = "(" + " + ".join(im_terms) + ")"
    stage_p = {f"q{b}": f"(re{b} * re{b} + im{b} * im{b})" for b in range(n_bins)}
    pc0 = round(12 * math.log2(fmin / 440.0) + 69) % 12
    by_class: dict[int, list[int]] = {}
    for b in range(n_bins):
        by_class.setdefault((pc0 + b) % 12, []).append(b)
    sums = {
        c: "(" + " + ".join(f"q{b}" for b in bs) + ")" for c, bs in by_class.items()
    }
    mx = "greatest(" + ", ".join(sums.values()) + ", 1e-10)"
    stage_out = {
        f"chroma_cqt_{c}": (f"round({sums[c]} / {mx}, 6)" if c in sums else "0.0")
        for c in range(12)
    }
    return [stage_ri, stage_p, stage_out]


def _staged_select(pivoted: DataFrame, stages: list[dict[str, str]],
                   entity_col: str) -> DataFrame:
    out = pivoted
    for stage in stages:
        out = out.select("*", *[F.expr(e).alias(n) for n, e in stage.items()])
    return out.select(entity_col, "frame", *list(stages[-1]))


def _staged_sql(stages: list[dict[str, str]], entity_col: str,
                prelude: str) -> str:
    ctes, prev = [], "piv"
    for i, stage in enumerate(stages[:-1]):
        cols = ", ".join(f"{e} AS {n}" for n, e in stage.items())
        ctes.append(f"cq{i} AS (SELECT *, {cols} FROM {prev})")
        prev = f"cq{i}"
    sel = ",\n       ".join(f"{e} AS {n}" for n, e in stages[-1].items())
    body = (",\n" + ",\n".join(ctes)) if ctes else ""
    return f"WITH {prelude}{body}\nSELECT {entity_col}, frame,\n       {sel}\nFROM {prev}"


def chroma_cqt(
    df: DataFrame, entity_col: str = "user_id", ts_col: str = "ts",
    value_col: str = "value", tiebreak_col: str = "event_id",
) -> DataFrame:
    pivoted = position_pivot_frames(df, entity_col, ts_col, value_col, tiebreak_col)
    return _staged_select(pivoted, cqt_chroma_exprs(), entity_col)


def chroma_cqt_sql(entity_col: str = "user_id") -> str:
    return _staged_sql(cqt_chroma_exprs(), entity_col, position_pivot_sql())


def cens_exprs(n_bins: int = 12) -> list[dict[str, str]]:
    """CENS quantization (librosa.feature.chroma_cens, Müller & Ewert
    2011): L1-normalize the CQT bin powers per frame, then map each
    class energy onto the published step function — 0.25·#{thresholds
    exceeded} over (0.05, 0.1, 0.2, 0.4). The temporal smoothing +
    L2 normalization happen in ``chroma_cens`` (window stage). The
    quantized values are exact multiples of 0.25, so the smoothing
    sums are order-independent across engines."""
    pc_cols = [f"q{b}" for b in range(n_bins)]
    tot = "greatest(" + " + ".join(pc_cols) + ", 1e-10)"
    stage_q = {}
    for b in range(n_bins):
        ratio = f"({pc_cols[b]} / {tot})"
        steps = " + ".join(
            f"(CASE WHEN {ratio} > {_lit(s)} THEN 1 ELSE 0 END)"
            for s in (0.05, 0.1, 0.2, 0.4)
        )
        stage_q[f"e{b}"] = f"(CAST(0.25 AS DOUBLE) * ({steps}))"
    return [stage_q]


_CENS_WIN = "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING"


def chroma_cens(
    df: DataFrame, entity_col: str = "user_id", ts_col: str = "ts",
    value_col: str = "value", tiebreak_col: str = "event_id",
) -> DataFrame:
    """chroma_cqt energies → CENS: quantize (cens_exprs) → smooth each
    class over ±1 frame (zero-padded edges: windowed SUM / 3, librosa's
    fixed-length convolution) → L2-normalize per frame. The smoothing
    window shares the cqt stage's (entity, frame) ordering — one
    shuffle for the pivot agg, the window reuses it."""
    pivoted = position_pivot_frames(df, entity_col, ts_col, value_col, tiebreak_col)
    stages = cqt_chroma_exprs()[:2] + cens_exprs()
    out = pivoted
    for stage in stages:
        out = out.select("*", *[F.expr(e).alias(n) for n, e in stage.items()])
    smooth = {
        f"s{c}": (
            f"(sum(e{c}) OVER (PARTITION BY {entity_col} ORDER BY frame "
            f"{_CENS_WIN}) / CAST(3.0 AS DOUBLE))"
        )
        for c in range(12)
    }
    out = out.select(entity_col, "frame", *[F.expr(e).alias(n) for n, e in smooth.items()])
    norm = "greatest(sqrt(" + " + ".join(f"s{c} * s{c}" for c in range(12)) + "), 1e-12)"
    return out.select(
        entity_col, "frame",
        *[F.expr(f"round(s{c} / {norm}, 6)").alias(f"cens_{c}") for c in range(12)],
    )


def chroma_cens_sql(entity_col: str = "user_id") -> str:
    stages = cqt_chroma_exprs()[:2] + cens_exprs()
    ctes, prev = [], "piv"
    for i, stage in enumerate(stages):
        cols = ", ".join(f"{e} AS {n}" for n, e in stage.items())
        ctes.append(f"cq{i} AS (SELECT *, {cols} FROM {prev})")
        prev = f"cq{i}"
    smooth = ", ".join(
        f"(sum(e{c}) OVER (PARTITION BY {entity_col} ORDER BY frame "
        f"{_CENS_WIN}) / CAST(3.0 AS DOUBLE)) AS s{c}"
        for c in range(12)
    )
    ctes.append(f"sm AS (SELECT {entity_col}, frame, {smooth} FROM {prev})")
    norm = "greatest(sqrt(" + " + ".join(f"s{c} * s{c}" for c in range(12)) + "), 1e-12)"
    sel = ",\n       ".join(f"round(s{c} / {norm}, 6) AS cens_{c}" for c in range(12))
    return (
        f"WITH {position_pivot_sql()},\n" + ",\n".join(ctes)
        + f"\nSELECT {entity_col}, frame,\n       {sel}\nFROM sm"
    )


def tonnetz_exprs(n_bins: int = 12) -> list[dict[str, str]]:
    """TonnetzExtractor role (pliers/extractors/audio.py:399-407;
    librosa.feature.tonnetz, Harte/Sandler/Gasser 2006): L1-normalize
    the chroma vector, then project onto the 6-D tonal centroid basis —
    circles of fifths (r=1, angle 7π/6·j), minor thirds (r=1, 3π/2·j),
    major thirds (r=0.5, 2π/3·j), sin/cos each. Basis entries are
    driver-side literals."""
    pc_cols = [f"q{b}" for b in range(n_bins)]
    tot = "greatest(" + " + ".join(pc_cols) + ", 1e-10)"
    stage_n = {f"cn{b}": f"({pc_cols[b]} / {tot})" for b in range(n_bins)}
    basis = []
    for r, period in ((1.0, 7.0 * math.pi / 6.0), (1.0, 3.0 * math.pi / 2.0),
                      (0.5, 2.0 * math.pi / 3.0)):
        basis.append([r * math.sin(period * j) for j in range(12)])
        basis.append([r * math.cos(period * j) for j in range(12)])
    stage_t = {
        f"tonnetz_{k}": "round("
        + " + ".join(f"{_lit(basis[k][j])} * cn{j}" for j in range(12))
        + ", 6)"
        for k in range(6)
    }
    return [stage_n, stage_t]


def tonnetz(
    df: DataFrame, entity_col: str = "user_id", ts_col: str = "ts",
    value_col: str = "value", tiebreak_col: str = "event_id",
) -> DataFrame:
    pivoted = position_pivot_frames(df, entity_col, ts_col, value_col, tiebreak_col)
    stages = cqt_chroma_exprs()[:2] + tonnetz_exprs()
    return _staged_select(pivoted, stages, entity_col)


def tonnetz_sql(entity_col: str = "user_id") -> str:
    stages = cqt_chroma_exprs()[:2] + tonnetz_exprs()
    return _staged_sql(stages, entity_col, position_pivot_sql())


# --------------------------------------------------------------------------
# spectral contrast: per-band peak-vs-valley percentile contrast


def spectral_contrast_exprs(
    prefix: str = "p", quantile: float = 0.4,
) -> dict[str, str]:
    """``SpectralContrastExtractor`` counterpart (librosa
    ``spectral_contrast``; reference pliers/extractors/audio.py:256-274):
    per octave band, contrast = 10·log10(peak/valley) where peak/valley
    are the means of the top/bottom ``max(1, floor(quantile·m))``
    magnitudes of the band's ``m`` bins. At this engine's frame size
    (FRAME=8 → 5 bins, octave bands of 2-3 bins) that index is exactly 1,
    so the percentile means reduce to greatest()/least() — pure Column
    expressions shared verbatim with the DuckDB oracle, like the rest of
    the librosa family. Bands follow the octave-doubling edges on the
    notional 1 kHz bin grid: [0,1] kHz (incl. DC), [1,2] kHz, [2,4] kHz.
    Magnitudes are floored at 1e-10 before the logs (librosa's amin)."""
    bands = {"b0": [0, 1], "b1": [1, 2], "b2": [2, 3, 4]}
    out: dict[str, str] = {}
    for name, bins in bands.items():
        m = len(bins)
        idx = max(1, int(quantile * m))
        assert idx == 1, "closed-form greatest/least path requires idx == 1"
        mags = [f"greatest(sqrt({prefix}{k}), 1e-10)" for k in bins]
        peak = f"greatest({', '.join(mags)})"
        valley = f"least({', '.join(mags)})"
        out[f"contrast_{name}"] = (
            f"round(10.0 * (log10({peak}) - log10({valley})), 6)"
        )
    return out


def spectral_contrast(frames: DataFrame, entity_col: str = "user_id") -> DataFrame:
    """Column-only feature stage over ``stft_power_frames`` output."""
    exprs = spectral_contrast_exprs()
    return frames.select(
        entity_col, "frame", *[F.expr(e).alias(n) for n, e in exprs.items()]
    )


def spectral_contrast_sql(stft_sql: str) -> str:
    exprs = spectral_contrast_exprs()
    sel = ",\n       ".join(f"{e} AS {n}" for n, e in exprs.items())
    return f"WITH stft AS (\n{stft_sql}\n)\nSELECT user_id, frame,\n       {sel}\nFROM stft"

"""Registry module (split from the former queries.py monolith; same
@query/ORACLES contract as every sibling).

Queries: spectral_shape, spectral_flux, rms_zcr, mel_mfcc,
    merge_wide_first, poly_features, onset_detect, tempo, hpss_energy,
    repetition_signals, char_entropy, feature_histogram, winnowing,
    edit_distance_dups, bloom_dedup, gopher_rules, spectral_contrast
"""
from __future__ import annotations

from ._registry import F, R, T, _docs, _events, load_table, query
from .encoder_nlp import _shape_sql



@query("spectral_shape", _shape_sql())
def q_spectral_shape(spark, sf_dir):
    """SpectralCentroid/Bandwidth/Rolloff/Flatness extractors
    (pliers/extractors/audio.py:224-284) over this engine's STFT power
    frames. The FFT is the only Python stage; every named feature is a
    pure Column expression (whole-stage codegen) whose arithmetic text
    is shared verbatim with the DuckDB oracle."""
    from pliers_spark.functions.audio_features import spectral_shape
    from pliers_spark.functions.spectral import stft_power_frames

    frames = stft_power_frames(
        _events(spark, sf_dir), "user_id", "ts", "value",
        order_cols=["ts", "event_id"],
    )
    return spectral_shape(frames)



def _flux_sql() -> str:
    from pliers_spark.functions.audio_features import spectral_flux_sql
    from pliers_spark.functions.spectral import stft_power_sql

    return spectral_flux_sql(stft_power_sql())



@query("spectral_flux", _flux_sql())
def q_spectral_flux(spark, sf_dir):
    """Onset-strength / spectral flux (OnsetStrengthMultiExtractor role,
    pliers/extractors/audio.py:347-356): per-entity positive magnitude
    delta vs the previous frame — one lag window over the frame table,
    then a shared-text Column expression. First frame dropped (no
    synthetic t-1: zero-leakage rule)."""
    from pliers_spark.functions.audio_features import spectral_flux
    from pliers_spark.functions.spectral import stft_power_frames

    frames = stft_power_frames(
        _events(spark, sf_dir), "user_id", "ts", "value",
        order_cols=["ts", "event_id"],
    )
    return spectral_flux(frames)



def _rms_zcr_sql() -> str:
    from pliers_spark.functions.audio_features import rms_zcr_sql

    return rms_zcr_sql()



@query("rms_zcr", _rms_zcr_sql())
def q_rms_zcr(spark, sf_dir):
    """RMSExtractor + ZeroCrossingRateExtractor
    (pliers/extractors/audio.py:303-312,358-366) with STFT framing but
    NO FFT and NO UDF: window (row index + first difference) → bounded
    frame explode (≤ frame/hop copies per row) → hash agg. 100%
    built-in plan — the scale path for waveform stats at 100 TB."""
    from pliers_spark.functions.audio_features import rms_zcr

    return rms_zcr(_events(spark, sf_dir), "user_id", "ts", "value", "event_id")



def _mfcc_sql() -> str:
    from pliers_spark.functions.audio_features import mel_mfcc_sql
    from pliers_spark.functions.spectral import stft_power_sql

    return mel_mfcc_sql(stft_power_sql())



@query("mel_mfcc", _mfcc_sql())
def q_mel_mfcc(spark, sf_dir):
    """Melspectrogram + MFCC extractors (pliers/extractors/audio.py:
    421-454): HTK triangular mel filterbank and orthonormal DCT-II
    rendered as constant-folded literal weights (computed once
    driver-side, repr-emitted into both engines), log-mel and
    cepstra as pure Column expressions over the STFT frames."""
    from pliers_spark.functions.audio_features import mel_mfcc
    from pliers_spark.functions.spectral import stft_power_frames

    frames = stft_power_frames(
        _events(spark, sf_dir), "user_id", "ts", "value",
        order_cols=["ts", "event_id"],
    )
    return mel_mfcc(frames)



@query(
    "merge_wide_first",
    """WITH toks AS (
         SELECT doc_id,
                unnest(range(len(string_split(trim(text), ' '))))::BIGINT AS ord,
                unnest(string_split(trim(text), ' ')) AS token
         FROM documents),
       long AS (
         SELECT doc_id, ord, 'tok' AS feature, token AS value FROM toks
         UNION ALL
         SELECT doc_id, ord, 'shape' AS feature, upper(token) AS value FROM toks)
       SELECT doc_id,
              arg_min(value, ord) FILTER (WHERE feature = 'shape') AS shape,
              arg_min(value, ord) FILTER (WHERE feature = 'tok') AS tok
       FROM long GROUP BY doc_id""",
)
def q_merge_wide_first(spark, sf_dir):
    """merge_results wide pivot with the reference's NON-numeric clash
    aggfunc 'first' (pliers/extractors/base.py:324-326): a string-valued
    long frame pivots to one column per feature taking the first value
    in frame order — recast deterministically as min_by(value, ord)
    (pandas row order ≡ the explicit ord column)."""
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.posexplode(T.tokenize(F.col("text"))).alias("ord", "token")
    ).withColumn("ord", F.col("ord").cast("long"))
    long = toks.select(
        "doc_id", "ord", F.lit("tok").alias("feature"), F.col("token").alias("value")
    ).unionByName(
        toks.select(
            "doc_id", "ord", F.lit("shape").alias("feature"), F.upper("token").alias("value")
        )
    )
    return R.to_wide(
        long, ["doc_id"], aggfunc="first", order_col="ord",
        feature_values=["shape", "tok"],
    )



def _poly_sql() -> str:
    from pliers_spark.functions.audio_features import poly_features_sql
    from pliers_spark.functions.spectral import stft_power_sql

    return poly_features_sql(stft_power_sql())



@query("poly_features", _poly_sql())
def q_poly_features(spark, sf_dir):
    """PolyFeaturesExtractor order=1 (pliers/extractors/audio.py:286-300):
    closed-form least-squares line fit over each frame's magnitude
    spectrum — frequency sums constant-folded to literals, shared-text
    Column expressions over the STFT frames."""
    from pliers_spark.functions.audio_features import poly_features
    from pliers_spark.functions.spectral import stft_power_frames

    frames = stft_power_frames(
        _events(spark, sf_dir), "user_id", "ts", "value",
        order_cols=["ts", "event_id"],
    )
    return poly_features(frames)



def _onset_sql() -> str:
    from pliers_spark.functions.audio_features import onset_detect_sql
    from pliers_spark.functions.spectral import stft_power_sql

    return onset_detect_sql(stft_power_sql())



@query("onset_detect", _onset_sql())
def q_onset_detect(spark, sf_dir):
    """OnsetDetectExtractor role (pliers/extractors/audio.py:314-322):
    peak-pick the onset-strength envelope — local max over ±1 frames AND
    above the trailing 3-frame mean + delta. Window comparisons only;
    the sole emitted float is the already-rounded flux."""
    from pliers_spark.functions.audio_features import onset_detect
    from pliers_spark.functions.spectral import stft_power_frames

    frames = stft_power_frames(
        _events(spark, sf_dir), "user_id", "ts", "value",
        order_cols=["ts", "event_id"],
    )
    return onset_detect(frames)



def _tempo_sql() -> str:
    from pliers_spark.functions.audio_features import tempo_autocorr_sql
    from pliers_spark.functions.spectral import stft_power_sql

    return tempo_autocorr_sql(stft_power_sql())



@query("tempo", _tempo_sql())
def q_tempo(spark, sf_dir):
    """TempoExtractor role (pliers/extractors/audio.py:325-333):
    dominant periodicity of the onset envelope via per-entity
    autocorrelation over lags 1..6, argmax (smallest lag on ties),
    tempo_bpm = 60·sr/(hop·lag)."""
    from pliers_spark.functions.audio_features import tempo_autocorr
    from pliers_spark.functions.spectral import stft_power_frames

    frames = stft_power_frames(
        _events(spark, sf_dir), "user_id", "ts", "value",
        order_cols=["ts", "event_id"],
    )
    return tempo_autocorr(frames)



def _hpss_sql() -> str:
    from pliers_spark.functions.audio_features import hpss_energy_sql
    from pliers_spark.functions.spectral import stft_power_sql

    return hpss_energy_sql(stft_power_sql())



@query("hpss_energy", _hpss_sql())
def q_hpss_energy(spark, sf_dir):
    """Harmonic/Percussive separation energies (HarmonicExtractor /
    PercussiveExtractor, pliers/extractors/audio.py:488-506; Fitzgerald
    2010 median-filter HPSS): per-bin time-median vs per-frame
    freq-median soft masks over the STFT frames — ±2-frame lags share
    one window spec (one Sort), masks are shared-text expressions."""
    from pliers_spark.functions.audio_features import hpss_energy
    from pliers_spark.functions.spectral import stft_power_frames

    frames = stft_power_frames(
        _events(spark, sf_dir), "user_id", "ts", "value",
        order_cols=["ts", "event_id"],
    )
    return hpss_energy(frames)



def _repetition_sql() -> str:
    from pliers_spark.operators.quality import repetition_signals_sql

    return repetition_signals_sql()



@query("repetition_signals", _repetition_sql())
def q_repetition_signals(spark, sf_dir):
    """Gopher/RefinedWeb-style repetition quality signals (training-data
    curation): duplicate-token fraction, top-token share, top-bigram
    share — exact integer ppm, two co-partitioned aggregations."""
    from pliers_spark.operators.quality import repetition_signals

    return repetition_signals(_docs(spark, sf_dir), "text", "doc_id")



@query(
    "char_entropy",
    """WITH chars AS (
         SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS ch
         FROM documents),
       cc AS (
         SELECT doc_id, ch, count(*)::BIGINT AS c FROM chars GROUP BY 1, 2),
       w AS (
         SELECT doc_id, c,
                sum(c) OVER (PARTITION BY doc_id) AS n
         FROM cc),
       terms AS (
         SELECT doc_id, n,
                c * CAST(round(ln(c::DOUBLE / n::DOUBLE) * 1e6) AS BIGINT) AS t
         FROM w)
       SELECT doc_id, max(n)::BIGINT AS n_chars,
              (-sum(t))::BIGINT AS entropy_sum_unats,
              round((-sum(t)::DOUBLE / max(n)) / 1000000.0, 6) AS entropy_nats
       FROM terms GROUP BY doc_id""",
)
def q_char_entropy(spark, sf_dir):
    """Character-level Shannon entropy per document — the classic
    gibberish/encoding-junk detector a curation pipeline runs on web
    text (low entropy = repeated filler, high = binary soup). Each
    char class contributes c·round(ln(c/n)·1e6) integer micro-nats
    (the bigram-LM rounding convention) so the per-doc sum is an
    order-free exact integer; the convenience nats column divides
    once at the end. One explode → (doc,char) count → windowed total
    → doc aggregation, all JVM-side."""
    from pyspark.sql import Window as W

    chars = _docs(spark, sf_dir).select(
        "doc_id",
        F.explode(F.expr("regexp_extract_all(text, '(?s).', 0)")).alias("ch"),
    )
    cc = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    w = cc.select(
        "doc_id", "c", F.sum("c").over(W.partitionBy("doc_id")).alias("n")
    )
    terms = w.select(
        "doc_id",
        "n",
        (F.col("c") * F.round(F.log(F.col("c") / F.col("n")) * 1e6, 0).cast("long")).alias("t"),
    )
    return terms.groupBy("doc_id").agg(
        F.max("n").cast("long").alias("n_chars"),
        (-F.sum("t")).cast("long").alias("entropy_sum_unats"),
        F.round((-F.sum("t").cast("double") / F.max("n")) / 1e6, 6).alias("entropy_nats"),
    )



@query(
    "feature_histogram",
    """WITH stats AS (
         SELECT event_type, min(value) AS mn, max(value) AS mx
         FROM events GROUP BY event_type),
       binned AS (
         SELECT e.event_type,
                CASE WHEN s.mx = s.mn THEN 0
                     ELSE least(CAST(floor((e.value - s.mn) * 16 / (s.mx - s.mn)) AS BIGINT), 15)
                END AS bin,
                s.mn, s.mx
         FROM events e JOIN stats s USING (event_type))
       SELECT event_type, bin, count(*)::BIGINT AS n,
              round(mn + bin * (mx - mn) / 16, 6) AS lo,
              round(mn + (bin + 1) * (mx - mn) / 16, 6) AS hi
       FROM binned GROUP BY event_type, bin, mn, mx""",
)
def q_feature_histogram(spark, sf_dir):
    """Equi-width histogram per feature group (16 bins over the
    group's [min,max]) — the distribution-profiling diagnostic run
    before choosing clipping/normalization constants. Two passes: a
    tiny per-group stats dimension (broadcast back), then one binned
    count; bin indices are floor of the same IEEE expression on both
    engines."""
    e = load_table(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    binned = e.join(F.broadcast(stats), "event_type").select(
        "event_type",
        F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.floor((F.col("value") - F.col("mn")) * 16 / (F.col("mx") - F.col("mn"))).cast("long"),
                F.lit(15).cast("long"),
            )
        )
        .alias("bin"),
        "mn",
        "mx",
    )
    return binned.groupBy("event_type", "bin", "mn", "mx").agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        "event_type",
        "bin",
        "n",
        F.round(F.col("mn") + F.col("bin") * (F.col("mx") - F.col("mn")) / 16, 6).alias("lo"),
        F.round(F.col("mn") + (F.col("bin") + 1) * (F.col("mx") - F.col("mn")) / 16, 6).alias("hi"),
    )



def _winnow_sql() -> str:
    from pliers_spark.operators.dedup import winnowing_fingerprints_sql

    return winnowing_fingerprints_sql()



@query("winnowing", _winnow_sql())
def q_winnowing(spark, sf_dir):
    """Winnowing document fingerprints (Schleimer et al. 2003, the
    MOSS algorithm): min hash of every full sliding window of
    consecutive shingle hashes — guaranteed to catch any sufficiently
    long shared substring while keeping ~2/(w+1) of hashes. One
    windowed min over the exploded grams (rows frame, single per-doc
    shuffle) + distinct; complements MinHash (global similarity) with
    LOCAL overlap detection."""
    from pliers_spark.operators.dedup import winnowing_fingerprints

    return winnowing_fingerprints(_docs(spark, sf_dir))



def _editdist_sql() -> str:
    from pliers_spark.operators.dedup import edit_distance_dups_sql

    return edit_distance_dups_sql()



@query("edit_distance_dups", _editdist_sql())
def q_edit_distance_dups(spark, sf_dir):
    """Fuzzy dedup by exact edit distance: winnowing-fingerprint
    candidate gating (df-capped inverted index, >= 2 shared
    fingerprints) then Levenshtein over bounded 256-char prefixes —
    O(prefix^2) per pair at any corpus size, never full-text
    quadratic. `levenshtein` is a JVM/DuckDB built-in with identical
    standard semantics, so distances are integer-exact cross-engine."""
    from pliers_spark.operators.dedup import edit_distance_dups

    return edit_distance_dups(_docs(spark, sf_dir))



def _bloom_sql() -> str:
    from pliers_spark.operators.dedup import bloom_dedup_sql

    union = (
        "(SELECT doc_id, text, (doc_id % 5 <> 0) AS hist0 FROM documents "
        "UNION ALL "
        "SELECT doc_id + 1000000, text, false FROM documents "
        "WHERE doc_id % 7 = 0 AND doc_id % 5 <> 0) AS u"
    )
    return bloom_dedup_sql("hist0", table=union)



@query("bloom_dedup", _bloom_sql())
def q_bloom_dedup(spark, sf_dir):
    """Bloom-filter ingestion dedup gate (the Dolma/CCNet constant-
    memory membership pattern): history = 4/5 of the corpus; delta =
    the remaining fifth (genuinely new) plus re-ingested COPIES of
    every 7th history doc under fresh ids — so the dup path is a
    checked behaviour, not dead code. k=3 seeded 60-bit md5 positions
    mod 2^20, represented as the distinct position set (the exact
    semantics of the bit array — the dense bitmap is the executor-
    local encoding); each delta row reports maybe_dup, the exact-hash
    truth, and the resulting false_positive flag the operator watches
    when sizing m/k."""
    from pliers_spark.operators.dedup import bloom_dedup

    d = _docs(spark, sf_dir)
    hist = d.select("doc_id", "text", (F.col("doc_id") % 5 != 0).alias("_hist"))
    reingest = (
        d.where((F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 5 != 0))
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            "text",
            F.lit(False).alias("_hist"),
        )
    )
    return bloom_dedup(hist.unionByName(reingest), F.col("_hist"))



def _gopher_sql() -> str:
    from pliers_spark.operators.quality import gopher_rules_sql

    return gopher_rules_sql()



@query("gopher_rules", _gopher_sql())
def q_gopher_rules(spark, sf_dir):
    """The FULL published Gopher quality-filter ruleset (Rae et al.
    2021, Table A1) as one per-doc boolean gate: word-count bounds,
    mean-word-length bounds, symbol-to-word ratio, bullet-line and
    ellipsis-line shares, alphabetic-word share, required-word
    presence. All thresholds via integer cross-multiplication — the
    emitted booleans are bit-stable across engines. Complements the
    distribution-relative quality_filter and the repetition_signals
    family with the absolute-rule gate real curation pipelines run
    first."""
    from pliers_spark.operators.quality import gopher_rules

    return gopher_rules(_docs(spark, sf_dir), "text", "doc_id")



# --------------------------------------------------------------------------
# batch 9 (round 2): curation ops — BPE-style token counting, PII scrub,
# cross-corpus boilerplate line removal

_BPE_RE = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9']+|\s+"


# --------------------------------------------------------------------------
# round 3: SpectralContrastExtractor counterpart (VERDICT r2 item 5 — the
# last named librosa extractor without an engine counterpart)


def _contrast_sql() -> str:
    from pliers_spark.functions.audio_features import spectral_contrast_sql
    from pliers_spark.functions.spectral import stft_power_sql

    return spectral_contrast_sql(stft_power_sql())


@query("spectral_contrast", _contrast_sql())
def q_spectral_contrast(spark, sf_dir):
    """SpectralContrastExtractor (pliers/extractors/audio.py:256-274,
    librosa.feature.spectral_contrast) over this engine's STFT power
    frames: per octave band, 10*log10(peak/valley) of the band's
    magnitude percentiles (closed-form greatest/least at this frame
    size). FFT is the only Python stage; the contrast features are pure
    Column expressions whose arithmetic text is shared verbatim with the
    DuckDB oracle."""
    from pliers_spark.functions.audio_features import spectral_contrast
    from pliers_spark.functions.spectral import stft_power_frames

    frames = stft_power_frames(
        _events(spark, sf_dir), "user_id", "ts", "value",
        order_cols=["ts", "event_id"],
    )
    return spectral_contrast(frames)

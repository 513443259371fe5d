"""Registry module (split from the former queries.py monolith; same
@query/ORACLES contract as every sibling).

Queries: lm_score, ccnet_buckets, chunk_dedup, source_kl, kmeans_assign,
    text_normalize, kmeans_fit, bpe_learn, bpe_encode, ivf_multiprobe,
    domain_cap, lang_confusion, image_decode_stats, png_decode_stats,
    video_motion, wav_frame_stats, video_frame_sample, image_resize,
    image_autocrop, image_dhash_dups, shot_boundaries, audio_fp_dups,
    chroma_cqt, chroma_cens, tonnetz, beat_track, url_features,
    url_canonical_dups, blocklist_filter, chunk_windows, mixture_epochs,
    rrf_fusion, containment_dedup, tpch_q18, dedup_incremental,
    ngram_novelty, event_bursts, sif_embedding, ctfidf_terms, sax_symbols,
    ndcg_at_k, dunning_keyness, woe_iv, image_saliency, jpeg_decode_stats,
    image_resize_bilinear, jpeg_color_decode_stats
"""
from __future__ import annotations

from ._registry import F, T, Window, _docs, _events, load_table, md5_int, md5_int_sql, query
from .core_parity import _langid_sql, q_langid
from .dedup_sim import (
    _MH_BANDS,
    _MH_K,
    _MH_SHINGLE,
    _ROWS_PER_BAND,
    _URL_HOST_SQL,
    _URL_PATH_SQL,
    _URL_SYNTH_SQL,
    _band_key_sql,
    _minhash_cte,
)
from .features_a import _EMB_DIM



# --------------------------------------------------------------------------
# batch 13: statistical-LM corpus scoring and repeated-span removal
# (operators/lm.py)


def _lm_score_sql() -> str:
    from pliers_spark.operators.lm import bigram_lm_score_sql

    return bigram_lm_score_sql()



@query("lm_score", _lm_score_sql())
def q_lm_score(spark, sf_dir):
    """CCNet-style statistical-LM document scoring: add-one-smoothed
    bigram LM trained on the corpus itself, per-doc average log-prob in
    exact integer micro-nats. Vocab is a distributed top-k (never a
    single-partition rank window), the model is a broadcast dimension,
    and the corpus shuffles only for the model agg and the per-doc
    reduction (operators/lm.py)."""
    from pliers_spark.operators.lm import bigram_lm_score

    return bigram_lm_score(_docs(spark, sf_dir))



def _ccnet_sql() -> str:
    from pliers_spark.operators.lm import ccnet_buckets_sql

    return ccnet_buckets_sql()



@query("ccnet_buckets", _ccnet_sql())
def q_ccnet_buckets(spark, sf_dir):
    """CCNet head/middle/tail corpus partitioning: per-language
    percent-rank over the bigram-LM score, thirds labeled
    head/middle/tail. The rank orders by the EXACT integer micro-nat
    sum (ties broken on doc_id), so bucket boundaries are deterministic
    across engines (operators/lm.py)."""
    from pliers_spark.operators.lm import ccnet_buckets

    return ccnet_buckets(_docs(spark, sf_dir))



def _chunk_dedup_sql() -> str:
    from pliers_spark.operators.lm import chunk_dedup_sql

    return chunk_dedup_sql()



@query("chunk_dedup", _chunk_dedup_sql())
def q_chunk_dedup(spark, sf_dir):
    """C4/Gopher-style repeated-span removal: census every 8-token span,
    drop spans occurring in >2 distinct docs (boilerplate), reassemble
    surviving spans in order. Census → small dropped set → broadcast
    LEFT ANTI join: the corpus never shuffles for the filter, only for
    the ordered per-doc reassembly (operators/lm.py)."""
    from pliers_spark.operators.lm import chunk_dedup

    return chunk_dedup(_docs(spark, sf_dir))



def _source_kl_sql() -> str:
    from pliers_spark.operators.curation import source_kl_sql

    return source_kl_sql()



@query("source_kl", _source_kl_sql())
def q_source_kl(spark, sf_dir):
    """Mixture diagnostics: per-source unigram KL divergence from the
    corpus distribution in exact integer micro-nats — the statistic
    data-mixture reweighting reads. One (source, word) census shuffle
    touches the corpus; everything downstream runs on the checkpointed
    census (operators/curation.py)."""
    from pliers_spark.operators.curation import source_kl

    return source_kl(_docs(spark, sf_dir))



def _kmeans_sql() -> str:
    from pliers_spark.operators.similarity import kmeans_assign_sql

    return kmeans_assign_sql()



@query("kmeans_assign", _kmeans_sql())
def q_kmeans_assign(spark, sf_dir):
    """IVF coarse-quantizer training primitive: one Lloyd assignment
    step over the embedding table with EXACT int64 micro-unit
    distances (no float accumulation — bit-stable by construction).
    Seeds broadcast; one Arrow-batched integer-matmul pass over the
    corpus, zero shuffle (operators/similarity.py)."""
    from pliers_spark.operators.similarity import kmeans_assign

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_assign(emb)



def _normalize_sql() -> str:
    from pliers_spark.operators.curation import normalize_text_sql

    return normalize_text_sql()



@query("text_normalize", _normalize_sql())
def q_text_normalize(spark, sf_dir):
    """Unicode/whitespace normalization — the entry pass of a crawl
    curation pipeline: NFC compose (Arrow-batched unicodedata, exactly
    DuckDB's nfc_normalize tables), control-char strip + horizontal
    whitespace collapse in JVM codegen. Narrow map, zero shuffle
    (operators/curation.py)."""
    from pliers_spark.operators.curation import normalize_text

    return normalize_text(_docs(spark, sf_dir))



def _kmeans_fit_sql() -> str:
    from pliers_spark.operators.similarity import kmeans_fit_sql

    return kmeans_fit_sql()



@query("kmeans_fit", _kmeans_fit_sql())
def q_kmeans_fit(spark, sf_dir):
    """Full IVF coarse-quantizer TRAINING: 3 Lloyd rounds in the MLlib
    shape — per-batch partial sums inside the Arrow worker (the shuffle
    carries k·(D+2)-row partials, never vectors), k×D centroid array on
    the driver between rounds, exact int64 micro-unit arithmetic
    throughout. The oracle replays the entire fit as UNROLLED
    relational algebra (operators/similarity.kmeans_fit_sql)."""
    from pliers_spark.operators.similarity import kmeans_fit

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_fit(emb)



def _bpe_sql() -> str:
    from pliers_spark.operators.bpe import bpe_learn_sql

    return bpe_learn_sql()



@query("bpe_learn", _bpe_sql())
def q_bpe_learn(spark, sf_dir):
    """Distributed BPE merge-rule TRAINING (Sennrich 2016): the corpus
    contributes one word-census shuffle; five merge rounds run entirely
    on the distinct-word symbol relation (pair census weighted by word
    frequency -> deterministic argmax -> greedy in-word merge via
    gaps-and-islands windows). All integers and strings - the oracle
    replays the whole fit as unrolled CTEs (operators/bpe.py)."""
    from pliers_spark.operators.bpe import bpe_learn

    return bpe_learn(_docs(spark, sf_dir))



def _bpe_encode_sql() -> str:
    from pliers_spark.operators.bpe import bpe_encode_counts_sql

    return bpe_encode_counts_sql()



@query("bpe_encode", _bpe_encode_sql())
def q_bpe_encode(spark, sf_dir):
    """Train-then-encode round trip: learn 5 BPE merges, then count
    every document's subword tokens under the learned tokenizer. The
    per-word subword count is a broadcast dimension, so encoding is a
    narrow explode + broadcast join + per-doc reduction — the token
    budget that feeds sequence_pack (operators/bpe.py)."""
    from pliers_spark.operators.bpe import bpe_encode_counts

    return bpe_encode_counts(_docs(spark, sf_dir))



def _ivf_mp_sql() -> str:
    from pliers_spark.operators.similarity import ivf_multiprobe_topk_sql

    return ivf_multiprobe_topk_sql()



@query("ivf_multiprobe", _ivf_mp_sql())
def q_ivf_multiprobe(spark, sf_dir):
    """End-to-end IVF ANN over the TRAINED coarse quantizer: corpus
    bucketed by kmeans_assign, each query probes its 2 nearest
    centroids (exact int64 centroid ranking), cosine top-5 over the
    probed buckets only — candidates shrink ~k/nprobe vs brute force
    (operators/similarity.ivf_multiprobe_topk)."""
    from pliers_spark.operators.similarity import ivf_multiprobe_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_multiprobe_topk(emb)



@query(
    "domain_cap",
    f"""WITH r AS (
         SELECT doc_id, source,
                row_number() OVER (
                  PARTITION BY source
                  ORDER BY {md5_int_sql('text', seed=31)} % 1000000, doc_id) AS rk
         FROM documents)
       SELECT doc_id, source, rk::BIGINT AS rank_in_domain FROM r WHERE rk <= 50""",
)
def q_domain_cap(spark, sf_dir):
    """FineWeb-style per-domain cap: keep at most 50 docs per source,
    chosen by a deterministic content-hash lottery (retry-stable, no
    rand()) with id tie-break — the anti-overrepresentation pass that
    stops one boilerplate-heavy domain from dominating the mixture.
    One rank window per domain partition."""
    d = _docs(spark, sf_dir)
    ticket = F.pmod(md5_int(F.col("text"), seed=31), F.lit(1_000_000))
    w = Window.partitionBy("source").orderBy(ticket, "doc_id")
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rank_in_domain"))
        .where(F.col("rank_in_domain") <= 50)
        .select("doc_id", "source", F.col("rank_in_domain").cast("long").alias("rank_in_domain"))
    )



def _lang_confusion_sql() -> str:
    return f"""WITH li AS ({_langid_sql()})
       SELECT d.lang, li.lang_pred, count(*)::BIGINT AS n
       FROM li JOIN documents d USING (doc_id)
       GROUP BY d.lang, li.lang_pred"""



@query("lang_confusion", _lang_confusion_sql())
def q_lang_confusion(spark, sf_dir):
    """Language-ID quality evaluation: confusion matrix of the labeled
    lang column vs the heuristic predictor — the acceptance gate a
    curation pipeline runs before trusting langid-based filtering.
    Reuses the langid stage; one small groupBy after a narrow map."""
    li = q_langid(spark, sf_dir).select("doc_id", "lang_pred")
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    return d.join(li, "doc_id").groupBy("lang", "lang_pred").agg(
        F.count(F.lit(1)).alias("n")
    )



# --------------------------------------------------------------------------
# §2.1 multimodal binary payloads: REAL codec round trips, driver-oracled
#
# The testdata tables carry no binary column, so each query synthesises
# its payloads from doc_id with a closed-form pixel/sample formula,
# encodes them with the real container codec (pliers_spark.codecs),
# and runs the production decode → feature stage on the bytes. The
# DuckDB oracle recomputes the same features from the generating
# formula directly — so a green row certifies the encode → decode →
# extract path end-to-end (any codec bug breaks the match). In
# production the payload column comes off the table scan instead; the
# mapInPandas stages are identical.


def _synth_payloads(spark, sf_dir, build):
    """(doc_id → bytes) over documents as an `id, payload` DataFrame.

    Deterministic per-row generation inside mapInPandas — distributed,
    no driver materialisation, stand-in for a real binary column scan."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {"id": pdf["doc_id"].astype("int64"),
                 "payload": [build(int(d)) for d in pdf["doc_id"]]}
            )

    return (
        _docs(spark, sf_dir)
        .select("doc_id")
        .mapInPandas(fn, schema="id long, payload binary")
    )



def _synth_image(did: int, h: int = 8, w: int = 8, fk: int = 0) -> "np.ndarray":
    """pixel(r,c,ch) = (did*131 + fk*101 + r*17 + c*5 + ch*29) % 256."""
    import numpy as np

    r = np.arange(h)[:, None, None]
    c = np.arange(w)[None, :, None]
    ch = np.arange(3)[None, None, :]
    return ((did * 131 + fk * 101 + r * 17 + c * 5 + ch * 29) % 256).astype(np.uint8)



_IMG_PX = "(doc_id*131 + r.r*17 + c.c*5 + {ch})"



@query(
    "image_decode_stats",
    f"""WITH px AS (
         SELECT d.doc_id,
                GREATEST({_IMG_PX.format(ch=0)} % 256,
                         {_IMG_PX.format(ch=29)} % 256,
                         {_IMG_PX.format(ch=58)} % 256) AS mx
         FROM documents d, generate_series(0,7) r(r), generate_series(0,7) c(c))
       SELECT doc_id, CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
              CAST(3 AS INTEGER) AS channels,
              (SUM(mx)::DOUBLE / 64) / 255 AS mean_brightness
       FROM px GROUP BY doc_id""",
)
def q_image_decode_stats(spark, sf_dir):
    """BrightnessExtractor over a REAL PPM encode→decode round trip
    (pliers/extractors/image.py:26-38; decode = pliers_spark.codecs):
    8x8 formula images → P6 bytes → production image_stats stage.
    mean_brightness = mean(max over channels)/255 is exact: integer
    pixel sums, then /64 (power of two) and one /255 — bit-identical
    on both engines. Arrow-batched, payloads never leave executors."""
    from pliers_spark import codecs, multimodal

    payloads = _synth_payloads(
        spark, sf_dir, lambda did: codecs.encode_ppm(_synth_image(did))
    )
    return multimodal.image_stats(payloads).withColumnRenamed("id", "doc_id")



_PNG_PX = "(doc_id*173 + r.r*19 + c.c*7 + {ch})"



@query(
    "png_decode_stats",
    f"""WITH px AS (
         SELECT d.doc_id,
                GREATEST({_PNG_PX.format(ch=0)} % 256,
                         {_PNG_PX.format(ch=31)} % 256,
                         {_PNG_PX.format(ch=62)} % 256) AS mx
         FROM documents d, generate_series(0,8) r(r), generate_series(0,6) c(c))
       SELECT doc_id, CAST(7 AS INTEGER) AS width, CAST(9 AS INTEGER) AS height,
              CAST(3 AS INTEGER) AS channels,
              (SUM(mx)::DOUBLE / 63) / 255 AS mean_brightness
       FROM px GROUP BY doc_id""",
)
def q_png_decode_stats(spark, sf_dir):
    """BrightnessExtractor over a REAL PNG encode→decode round trip
    (pliers/extractors/image.py:26-38; pliers loads PNGs via imageio —
    here the engine's own stdlib-zlib codec, pliers_spark.codecs
    encode_png/decode_png): 9x7 formula images → DEFLATE-compressed,
    Up-filtered scanlines → production image_stats stage. A green row
    certifies chunk framing, zlib round trip, and filter reconstruction
    end-to-end: any codec bug changes the pixels and breaks the exact
    integer pixel-sum the oracle recomputes relationally. 63 pixels →
    one int-sum / 63 / 255 double division chain, identical on both
    engines (numpy integer mean is an exact int sum, then the same two
    IEEE divisions)."""
    import numpy as np

    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        r = np.arange(9)[:, None, None]
        c = np.arange(7)[None, :, None]
        ch = np.arange(3)[None, None, :]
        img = ((did * 173 + r * 19 + c * 7 + ch * 31) % 256).astype(np.uint8)
        return codecs.encode_png(img)

    payloads = _synth_payloads(spark, sf_dir, build)
    return multimodal.image_stats(payloads).withColumnRenamed("id", "doc_id")



def _video_motion_sql() -> str:
    """Relational replay of block-matching motion over the formula
    frames: gray(r,c) for a frame with cyclic shift (sy,sx) is the sum
    of the three channel formulas at the unshifted coordinates; the
    argmin over the 25 candidate displacements uses the same
    (sad, dy, dx) tie order as the engine."""

    def gray(r: str, c: str, shift_k: str) -> str:
        # frame shift: sy = ((doc_id + 2*k)%3) - 1, sx = ((doc_id + k)%3) - 1
        rr = f"(({r}) - ((doc_id + 2*({shift_k})) % 3) + 1 + 32) % 8"
        cc = f"(({c}) - ((doc_id + ({shift_k})) % 3) + 1 + 32) % 8"
        return " + ".join(
            f"((doc_id*131 + ({rr})*17 + ({cc})*5 + {ch}) % 256)" for ch in (0, 29, 58)
        )

    g1 = gray("r.r", "c.c", "k.k")
    g0 = gray("r.r - dy.dy", "c.c - dx.dx", "k.k - 1")
    return f"""WITH sad AS (
  SELECT d.doc_id, k.k, dy.dy, dx.dx,
         SUM(ABS(({g1}) - ({g0})))::BIGINT AS sad
  FROM documents d,
       generate_series(1,3) k(k),
       generate_series(-2,2) dy(dy), generate_series(-2,2) dx(dx),
       generate_series(0,7) r(r), generate_series(0,7) c(c)
  GROUP BY 1, 2, 3, 4),
best AS (
  SELECT doc_id, k, dy, dx, sad,
         row_number() OVER (PARTITION BY doc_id, k ORDER BY sad, dy, dx) AS rn
  FROM sad)
SELECT doc_id, k::INTEGER AS frame, dy::BIGINT AS dy, dx::BIGINT AS dx, sad
FROM best WHERE rn = 1"""



@query("video_motion", _video_motion_sql())
def q_video_motion(spark, sf_dir):
    """Motion estimation per consecutive frame pair — the
    FarnebackOpticalFlowExtractor role (pliers/extractors/video.py:
    21-87) recast as exhaustive block matching (argmin-SAD over
    ±2-pixel cyclic displacements, integer grayscale R+G+B): 4
    formula frames per doc, each a cyclically shifted copy of the
    doc's base image with a known per-frame shift, encoded as REAL
    PPM bytes → production multimodal.video_motion stage. The oracle
    replays the full 25-candidate argmin relationally, so a green row
    certifies decode + displacement search end-to-end; the recovered
    (dy, dx) equals the known inter-frame shift wherever the shifted
    images are unambiguous."""
    import numpy as np

    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        base = _synth_image(did)
        out = []
        for k in range(4):
            sy = ((did + 2 * k) % 3) - 1
            sx = ((did + k) % 3) - 1
            out.append(codecs.encode_ppm(np.roll(base, (sy, sx), axis=(0, 1))))
        return b"".join(out)

    frame_bytes = len("P6\n8 8\n255\n") + 8 * 8 * 3
    payloads = _synth_payloads(spark, sf_dir, build)
    return multimodal.video_motion(
        payloads, frame_bytes=frame_bytes, search=2
    ).withColumnRenamed("id", "doc_id")



@query(
    "mp3_frame_index",
    """WITH f AS (
         SELECT d.doc_id, k.k,
                1 + ((d.doc_id * 3 + 5 * k.k) % 14) AS bi,
                (d.doc_id + k.k) % 2 AS pad
         FROM documents d, generate_series(0, 3) k(k)),
       g AS (
         SELECT doc_id, k, pad,
                list_value(32,40,48,56,64,80,96,112,128,160,192,224,256,320)[bi] AS kbps
         FROM f),
       h AS (
         SELECT doc_id, k, kbps, pad,
                (144 * kbps * 1000) // 44100 + pad AS flen
         FROM g),
       o AS (
         SELECT doc_id, k, kbps, pad, flen,
                coalesce(sum(flen) OVER (PARTITION BY doc_id ORDER BY k
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                         0) AS off
         FROM h)
       SELECT doc_id, k::BIGINT AS frame, off::BIGINT AS offset,
              flen::BIGINT AS frame_len, kbps::BIGINT AS bitrate_kbps,
              pad::BIGINT AS padded, 44100::BIGINT AS sample_rate
       FROM o""",
)
def q_mp3_frame_index(spark, sf_dir):
    """MPEG-1 Layer III container indexing over a REAL byte-stream
    round trip (r5, VERDICT r4 item 6; reference surface
    pliers/stimuli/audio.py:29-55): 4 formula-parameterized frames per
    doc (bitrate index 1+((doc_id*3+5k) mod 14), padding (doc_id+k)
    mod 2, mono 44.1 kHz) are byte-assembled per row inside
    mapInPandas, then the production codecs_mp3.index_frames STRICT
    sync-walk recovers every frame's offset/length/bitrate — one wrong
    entry in the published bitrate/length tables desyncs and fails the
    row. The oracle replays the closed-form frame-length arithmetic
    (144·kbps·1000 // 44100 + pad) and the offset cumsum relationally —
    exact integers end to end."""
    from pliers_spark import codecs_mp3, multimodal

    def build(did: int) -> bytes:
        out = []
        for k in range(4):
            bi = 1 + ((did * 3 + 5 * k) % 14)
            pad = (did + k) % 2
            h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
            h |= (bi << 12) | (0 << 10) | (pad << 9) | (3 << 6)
            kbps = codecs_mp3.BITRATES_KBPS["v1"][bi]
            flen = 144 * kbps * 1000 // 44100 + pad
            out.append(h.to_bytes(4, "big") + bytes(flen - 4))
        return b"".join(out)

    payloads = _synth_payloads(spark, sf_dir, build)
    return multimodal.mp3_frame_index(payloads).withColumnRenamed("id", "doc_id")



_WAV_S = "((d.doc_id*7919 + (k.k*64+t.t)*104729) % 65536) - 32768"



@query(
    "wav_frame_stats",
    f"""WITH s AS (
         SELECT d.doc_id, k.k, t.t, {_WAV_S} AS v
         FROM documents d, generate_series(0,2) k(k), generate_series(0,127) t(t)),
       w AS (
         SELECT doc_id, k, t, v,
                lag(v) OVER (PARTITION BY doc_id, k ORDER BY t) AS pv
         FROM s)
       SELECT doc_id, k::INTEGER AS frame,
              (k*64)/8000.0 AS onset, 128/8000.0 AS duration,
              SUM(v*v)::BIGINT AS sum_sq,
              SUM(abs(v))::BIGINT AS sum_abs,
              SUM(CASE WHEN pv IS NOT NULL AND ((pv >= 0) <> (v >= 0))
                       THEN 1 ELSE 0 END)::BIGINT AS n_crossings
       FROM w GROUP BY doc_id, k""",
)
def q_wav_frame_stats(spark, sf_dir):
    """Framed RMS-energy/ZCR over a REAL RIFF/WAVE round trip
    (pliers/extractors/audio.py:216-265 surface): 300 formula PCM16
    samples per doc → WAV bytes → production wav_frame_stats stage
    (frame=128, hop=64 → 3 overlapping frames/doc). All features are
    exact integers; onset/duration are single int/int divisions —
    bit-identical on both engines."""
    import numpy as np

    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        i = np.arange(300, dtype=np.int64)
        v = ((did * 7919 + i * 104729) % 65536) - 32768
        return codecs.encode_wav_int16(v, sr=8000)

    payloads = _synth_payloads(spark, sf_dir, build)
    return multimodal.wav_frame_stats(
        payloads, frame=128, hop=64
    ).withColumnRenamed("id", "doc_id")



@query(
    "wav_float_stats",
    f"""WITH s AS (
         SELECT d.doc_id, k.k, t.t, {_WAV_S} AS v
         FROM documents d, generate_series(0,2) k(k), generate_series(0,127) t(t)),
       w AS (
         SELECT doc_id, k, t, v,
                lag(v) OVER (PARTITION BY doc_id, k ORDER BY t) AS pv
         FROM s)
       SELECT doc_id, k::INTEGER AS frame,
              (k*64)/8000.0 AS onset, 128/8000.0 AS duration,
              SUM(v*v)::BIGINT AS sum_sq,
              SUM(abs(v))::BIGINT AS sum_abs,
              SUM(CASE WHEN pv IS NOT NULL AND ((pv >= 0) <> (v >= 0))
                       THEN 1 ELSE 0 END)::BIGINT AS n_crossings
       FROM w GROUP BY doc_id, k""",
)
def q_wav_float_stats(spark, sf_dir):
    """Same framed stats over a REAL IEEE-float32 WAV round trip (r4:
    the format-3 float container every DAW exports; codecs.decode_wav
    now reads PCM 8/16/24 and float 32/64). The formula samples are the
    dyadic rationals v/65536 with |v| < 2^16, exactly representable in
    float32, so encode(bits=32) → decode → ×65536 recovers the exact
    integers and the SAME oracle arithmetic as `wav_frame_stats`
    certifies the float path bit-for-bit."""
    import numpy as np

    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        i = np.arange(300, dtype=np.int64)
        v = ((did * 7919 + i * 104729) % 65536) - 32768
        return codecs.encode_wav(v.astype(np.float64) / 65536.0, sr=8000, bits=32)

    payloads = _synth_payloads(spark, sf_dir, build)
    return multimodal.wav_frame_stats(
        payloads, frame=128, hop=64, scale=65536.0
    ).withColumnRenamed("id", "doc_id")



_VID_PX = "(doc_id*131 + k.k*101 + r.r*17 + c.c*5 + {ch})"



@query(
    "video_frame_sample",
    f"""WITH px AS (
         SELECT d.doc_id, k.k,
                GREATEST({_VID_PX.format(ch=0)} % 256,
                         {_VID_PX.format(ch=29)} % 256,
                         {_VID_PX.format(ch=58)} % 256) AS mx
         FROM documents d, generate_series(0,9) k(k),
              generate_series(0,3) r(r), generate_series(0,3) c(c)
         WHERE k.k % 3 = 0)
       SELECT doc_id, k::BIGINT AS frame, k/30.0 AS onset,
              CAST(4 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
              (SUM(mx)::DOUBLE / 16) / 255 AS mean_brightness
       FROM px GROUP BY doc_id, k""",
)
def q_video_frame_sample(spark, sf_dir):
    """FrameSamplingFilter(every=3) + per-frame brightness over a REAL
    multi-frame binary payload (pliers/filters/video.py:19-53,
    pliers/stimuli/video.py:12-37): 10 fixed-size 4x4 P6 frame records
    per doc (59 bytes each) → production video_frame_sample stage,
    which decodes ONLY the sampled offsets (selective decode, the lazy
    get_frame contract). onset = k/30.0 and the exact-integer
    brightness match bit-for-bit."""
    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        return b"".join(
            codecs.encode_ppm(_synth_image(did, h=4, w=4, fk=k)) for k in range(10)
        )

    payloads = _synth_payloads(spark, sf_dir, build)
    return multimodal.video_frame_sample(
        payloads, every=3, fps=30.0, frame_bytes=59
    ).withColumnRenamed("id", "doc_id")



_RS_PX = "(doc_id*131 + ((ty.ty*8)//3)*17 + ((tx.tx*8)//5)*5 + {ch})"



@query(
    "image_resize",
    f"""WITH px AS (
         SELECT d.doc_id,
                GREATEST({_RS_PX.format(ch=0)} % 256,
                         {_RS_PX.format(ch=29)} % 256,
                         {_RS_PX.format(ch=58)} % 256) AS mx
         FROM documents d, generate_series(0,2) ty(ty), generate_series(0,4) tx(tx))
       SELECT doc_id, CAST(5 AS INTEGER) AS width, CAST(3 AS INTEGER) AS height,
              CAST(3 AS INTEGER) AS channels,
              (SUM(mx)::DOUBLE / 15) / 255 AS mean_brightness
       FROM px GROUP BY doc_id""",
)
def q_image_resize(spark, sf_dir):
    """ImageResizingFilter (pliers/filters/image.py:46) over a REAL BMP
    encode→decode round trip: 8x8 formula images → 24bpp BI_RGB bytes →
    production image_resize_stats stage (nearest-neighbor to 5x3). The
    oracle recomputes the sampled source indices relationally
    (r = ty*8//3, c = tx*8//5) — a green row certifies the BMP codec
    (bottom-up BGR rows, 4-byte padding) and the resampling index math
    bit-for-bit."""
    from pliers_spark import codecs, multimodal

    payloads = _synth_payloads(
        spark, sf_dir, lambda did: codecs.encode_bmp(_synth_image(did))
    )
    return multimodal.image_resize_stats(
        payloads, target_w=5, target_h=3
    ).withColumnRenamed("id", "doc_id")



_CR_PX = "((doc_id*131 + r.r*17 + c.c*5 + {ch}) % 255) + 1"



@query(
    "image_autocrop",
    f"""WITH px AS (
         SELECT d.doc_id, (d.doc_id % 3) AS b,
                GREATEST({_CR_PX.format(ch=0)},
                         {_CR_PX.format(ch=29)},
                         {_CR_PX.format(ch=58)}) AS mx
         FROM documents d, generate_series(0,7) r(r), generate_series(0,7) c(c)
         WHERE r.r >= (d.doc_id % 3) AND r.r < 8 - (d.doc_id % 3)
           AND c.c >= (d.doc_id % 3) AND c.c < 8 - (d.doc_id % 3))
       SELECT doc_id,
              CAST(8 - 2*b AS INTEGER) AS width, CAST(8 - 2*b AS INTEGER) AS height,
              CAST(b AS INTEGER) AS x0, CAST(b AS INTEGER) AS y0,
              CAST(8 - b AS INTEGER) AS x1, CAST(8 - b AS INTEGER) AS y1,
              (SUM(mx)::DOUBLE / ((8 - 2*b) * (8 - 2*b))) / 255 AS mean_brightness
       FROM px GROUP BY doc_id, b""",
)
def q_image_autocrop(spark, sf_dir):
    """ImageCroppingFilter auto-trim (pliers/filters/image.py:18-43, the
    PIL getbbox recast): formula images with a doc_id%3-wide black
    border and strictly nonzero interior (pixel = f%255 + 1) → PPM →
    production image_crop_stats(box=None). The oracle derives the
    exclusive-right/lower bbox and post-crop brightness from the border
    formula directly — certifying the nonzero-scan, the PIL bbox
    convention, and the crop slice bit-for-bit."""
    import numpy as np

    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        # raw formula % 255 + 1 (NOT the %256-reduced _synth_image pixel:
        # (x % 256) % 255 differs from x % 255 — the oracle uses the latter)
        r = np.arange(8)[:, None, None]
        c = np.arange(8)[None, :, None]
        ch = np.arange(3)[None, None, :]
        img = (((did * 131 + r * 17 + c * 5 + ch * 29) % 255) + 1).astype(np.uint8)
        b = did % 3
        full = np.zeros((8, 8, 3), dtype=np.uint8)
        if b == 0:
            full = img
        else:
            full[b:-b, b:-b] = img[b:-b, b:-b]
        return codecs.encode_ppm(full)

    payloads = _synth_payloads(spark, sf_dir, build)
    return multimodal.image_crop_stats(payloads, box=None).withColumnRenamed("id", "doc_id")



_DH_BASE = "(((d.doc_id % 37)*131 + ((ty.ty*8)//7)*17 + ((tx.tx*8)//9)*5 + {ch}) % 200)"



@query(
    "image_dhash_dups",
    f"""WITH lum AS (
         SELECT d.doc_id, ty.ty AS r, tx.tx AS c,
                299*{_DH_BASE.format(ch=0)} + 587*{_DH_BASE.format(ch=29)}
              + 114*{_DH_BASE.format(ch=58)} AS lum
         FROM documents d, generate_series(0,6) ty(ty), generate_series(0,8) tx(tx)),
       bits AS (
         SELECT doc_id, r, c,
                CASE WHEN lum > lead(lum) OVER (PARTITION BY doc_id, r ORDER BY c)
                     THEN 1 ELSE 0 END AS b
         FROM lum),
       h AS (
         SELECT doc_id,
                SUM(b * (1::BIGINT << (r*8 + c)))::BIGINT AS dhash
         FROM bits WHERE c < 8 GROUP BY doc_id)
       SELECT doc_id, dhash,
              CAST(count(*) OVER (PARTITION BY dhash) AS BIGINT) AS group_size,
              CAST(CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY dhash)
                        THEN 1 ELSE 0 END AS BIGINT) AS keep
       FROM h""",
)
def q_image_dhash_dups(spark, sf_dir):
    """Perceptual image dedup over a REAL PPM round trip: each doc's
    payload is a brightness-shifted copy of one of 37 base patterns
    (pixel = base(doc_id % 37) + (doc_id*7) % 50, clip-free), so dHash
    — invariant to the uniform shift — collides exactly the docs that
    share a base image even though their payload BYTES all differ.
    Production image_dhash stage (decode → 9×7 resample → integer luma
    → 56 packed comparison bits), then one window over the hash for
    group_size + min-id keep flag — the image twin of dedup_exact
    (pliers has no image dedup; the decode surface is
    pliers/stimuli/image.py:10-40). The oracle recomputes luma
    relationally WITHOUT the per-doc offset — it cancels in every
    adjacent comparison, which is exactly the invariance the hash
    claims; bits and packing are exact integers, bit-identical on both
    engines."""
    import numpy as np

    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        r = np.arange(8)[:, None, None]
        c = np.arange(8)[None, :, None]
        ch = np.arange(3)[None, None, :]
        base = ((did % 37) * 131 + r * 17 + c * 5 + ch * 29) % 200
        return codecs.encode_ppm((base + (did * 7) % 50).astype(np.uint8))

    payloads = _synth_payloads(spark, sf_dir, build)
    h = multimodal.image_dhash(payloads).withColumnRenamed("id", "doc_id")
    w = Window.partitionBy("dhash")
    return h.select(
        "doc_id",
        "dhash",
        F.count(F.lit(1)).over(w).cast("long").alias("group_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).cast("long").alias("keep"),
    )



_SB_PX = "(doc_id*131 + (k.k//4)*101 + r.r*17 + c.c*5 + {ch})"



@query(
    "shot_boundaries",
    f"""WITH px AS (
         SELECT d.doc_id, k.k,
                GREATEST({_SB_PX.format(ch=0)} % 256,
                         {_SB_PX.format(ch=29)} % 256,
                         {_SB_PX.format(ch=58)} % 256) AS mx
         FROM documents d, generate_series(0,11) k(k),
              generate_series(0,3) r(r), generate_series(0,3) c(c)),
       b AS (
         SELECT doc_id, k, (SUM(mx)::DOUBLE / 16) / 255 AS br
         FROM px GROUP BY doc_id, k)
       SELECT doc_id, k::BIGINT AS frame, k/30.0 AS onset,
              CAST(CASE WHEN lag(br) OVER (PARTITION BY doc_id ORDER BY k) IS NOT NULL
                         AND br <> lag(br) OVER (PARTITION BY doc_id ORDER BY k)
                        THEN 1 ELSE 0 END AS BIGINT) AS is_cut
       FROM b""",
)
def q_shot_boundaries(spark, sf_dir):
    """Shot-boundary (scene-cut) detection over a REAL multi-frame
    binary payload: 12 fixed-size 4×4 P6 frames per doc in 3 scenes of
    4 (frame k's pixels keyed by k//4), production video_frame_sample
    stage decoding EVERY frame (every=1), then one lag window per doc
    comparing consecutive frame brightness — a cut is any change. This
    is the frame-differencing core of scene detection feeding
    FrameSamplingFilter-style curation (pliers/filters/video.py:19-53
    samples; here we detect). Brightness is the exact-integer
    Σmax/16/255 double on both engines, so the equality comparison is
    deterministic; cuts land at k=4 and k=8 wherever the scene sums
    differ. One narrow mapInPandas + one window shuffle on doc_id."""
    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        return b"".join(
            codecs.encode_ppm(_synth_image(did, h=4, w=4, fk=k // 4)) for k in range(12)
        )

    payloads = _synth_payloads(spark, sf_dir, build)
    vs = multimodal.video_frame_sample(payloads, every=1, fps=30.0, frame_bytes=59)
    w = Window.partitionBy("id").orderBy("frame")
    prev = F.lag("mean_brightness").over(w)
    return vs.select(
        F.col("id").alias("doc_id"),
        "frame",
        "onset",
        F.when(prev.isNotNull() & (F.col("mean_brightness") != prev), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_cut"),
    )



@query(
    "audio_fp_dups",
    """WITH s AS (
         SELECT d.doc_id, k.k, t.t,
                ((((d.doc_id % 41)*7919 + (k.k*32 + t.t)*104729) % 200) - 100)
                * (1 + (d.doc_id % 4)) AS v
         FROM documents d, generate_series(0,16) k(k), generate_series(0,63) t(t)),
       e AS (
         SELECT doc_id, k, SUM(v*v)::BIGINT AS e
         FROM s GROUP BY doc_id, k),
       b AS (
         SELECT doc_id, k,
                CASE WHEN e > lag(e) OVER (PARTITION BY doc_id ORDER BY k)
                     THEN 1 ELSE 0 END AS bit
         FROM e),
       h AS (
         SELECT doc_id, SUM(bit * (1::BIGINT << (k - 1)))::BIGINT AS afp
         FROM b WHERE k >= 1 GROUP BY doc_id)
       SELECT doc_id, afp,
              CAST(count(*) OVER (PARTITION BY afp) AS BIGINT) AS group_size,
              CAST(CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY afp)
                        THEN 1 ELSE 0 END AS BIGINT) AS keep
       FROM h""",
)
def q_audio_fp_dups(spark, sf_dir):
    """Audio-level dedup over a REAL RIFF/WAVE round trip: each doc's
    clip is one of 41 base recordings under a per-doc integer gain
    (sample = base(doc_id % 41) · (1 + doc_id % 4), |v| ≤ 400 so PCM16
    never clips), so the gain-invariant energy fingerprint collides
    exactly the docs that share a recording even though their payload
    BYTES differ. Production audio_fingerprint stage (decode → 17
    overlapping frame energies, frame=64/hop=32 → 16 packed
    comparison bits), then one window over the hash — the audio twin
    of dedup_exact / image_dhash_dups. All integers; bit-identical on
    both engines."""
    import numpy as np

    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        i = np.arange(600, dtype=np.int64)
        v = ((((did % 41) * 7919 + i * 104729) % 200) - 100) * (1 + did % 4)
        return codecs.encode_wav_int16(v, sr=8000)

    payloads = _synth_payloads(spark, sf_dir, build)
    h = multimodal.audio_fingerprint(payloads, frame=64, hop=32).withColumnRenamed("id", "doc_id")
    w = Window.partitionBy("afp")
    return h.select(
        "doc_id",
        "afp",
        F.count(F.lit(1)).over(w).cast("long").alias("group_size"),
        (F.col("doc_id") == F.min("doc_id").over(w)).cast("long").alias("keep"),
    )



def _chroma_cqt_sql() -> str:
    from pliers_spark.functions.audio_features import chroma_cqt_sql

    return chroma_cqt_sql()



@query("chroma_cqt", _chroma_cqt_sql())
def q_chroma_cqt(spark, sf_dir):
    """ChromaCQTExtractor role (pliers/extractors/audio.py:386-397):
    log-spaced constant-Q kernel projections (literal Hann·cos/sin
    weights, equal-temperament centers) folded onto pitch classes,
    max-normalized per frame. 100% built-in: shared position-pivot
    framing, then fused multiply-adds in whole-stage codegen — no FFT,
    no UDF."""
    from pliers_spark.functions.audio_features import chroma_cqt

    return chroma_cqt(_events(spark, sf_dir))



def _chroma_cens_sql() -> str:
    from pliers_spark.functions.audio_features import chroma_cens_sql

    return chroma_cens_sql()



@query("chroma_cens", _chroma_cens_sql())
def q_chroma_cens(spark, sf_dir):
    """ChromaCENSExtractor role (pliers/extractors/audio.py:386-397
    variant; Müller & Ewert 2011): CQT chroma → L1-normalize → published
    0.25-step quantization → ±1-frame smoothing (zero-padded window SUM
    / 3) → per-frame L2 normalization. Quantized values are exact
    multiples of 0.25, so the smoothing sums are order-independent —
    the window stage reuses the pivot agg's (entity, frame) shuffle."""
    from pliers_spark.functions.audio_features import chroma_cens

    return chroma_cens(_events(spark, sf_dir))



def _tonnetz_sql() -> str:
    from pliers_spark.functions.audio_features import tonnetz_sql

    return tonnetz_sql()



@query("tonnetz", _tonnetz_sql())
def q_tonnetz(spark, sf_dir):
    """TonnetzExtractor (pliers/extractors/audio.py:399-407): 6-D tonal
    centroid projection (circles of fifths / minor thirds / major
    thirds, literal sin/cos basis) of the L1-normalized CQT chroma —
    one more Column stage over the same framing, still zero UDFs."""
    from pliers_spark.functions.audio_features import tonnetz

    return tonnetz(_events(spark, sf_dir))



def _beat_track_sql() -> str:
    from pliers_spark.functions.audio_features import spectral_flux_sql
    from pliers_spark.functions.spectral import stft_power_sql
    from pliers_spark.operators.beat import beat_track_sql

    return beat_track_sql(spectral_flux_sql(stft_power_sql()))



@query("beat_track", _beat_track_sql())
def q_beat_track(spark, sf_dir):
    """BeatTrackExtractor (pliers/extractors/audio.py:286-301; Ellis
    2007 DP) in the exact-integer variant: onset strength = spectral
    flux in micro-units, forward DP with a quadratic integer penalty,
    deterministic-tie backtrack. Per-entity grouped map — parallel
    across series, O(T*W) within one; the oracle replays the identical
    DP as a DuckDB recursive CTE."""
    from pliers_spark.functions.audio_features import spectral_flux
    from pliers_spark.functions.spectral import stft_power_frames
    from pliers_spark.operators.beat import beat_track

    frames = stft_power_frames(
        _events(spark, sf_dir), "user_id", "ts", "value",
        order_cols=["ts", "event_id"],
    )
    return beat_track(spectral_flux(frames))



# (_URL_*_SQL constants are defined near _tok_sql, used by several queries)


@query(
    "url_features",
    f"""WITH u AS (
         SELECT doc_id, {_URL_SYNTH_SQL} AS url FROM documents)
       SELECT doc_id, url,
              {_URL_HOST_SQL} AS host,
              regexp_extract({_URL_HOST_SQL}, '([^.]+\\.[^.]+)$', 1) AS domain,
              {_URL_PATH_SQL} AS path,
              (len(string_split({_URL_PATH_SQL}, '/')) - 1)::BIGINT AS path_depth,
              (url LIKE 'https://%') AS is_https
       FROM u""",
)
def q_url_features(spark, sf_dir):
    """URL structure features (crawl-partitioning input; SURVEY §2.1
    url row): host/domain/path-depth/https over JVM ``parse_url`` —
    whole-stage codegen, zero Python, URL synthesis itself is pure
    Column concat over doc_id so the oracle regenerates identical
    strings and parses them relationally."""
    from pliers_spark.pages_pipeline import url_features

    d = _docs(spark, sf_dir).select("doc_id")
    did = F.col("doc_id")
    url = F.concat(
        F.when(did % 2 == 1, F.lit("https://")).otherwise(F.lit("http://")),
        F.lit("www.site"), (did % 50).cast("string"),
        F.lit(".example"), (did % 7).cast("string"),
        F.lit(".com/sec"), (did % 5).cast("string"),
        F.lit("/page"), (did % 11).cast("string"),
        F.when(did % 3 == 0, F.lit("?q=spark")).otherwise(F.lit("")),
    )
    return url_features(d.withColumn("url", url), key_cols=("doc_id",))



def _url_canon_sql() -> str:
    from pliers_spark.pages_pipeline import canonical_url_sql

    synth = """CASE WHEN doc_id % 4 = 0 THEN 'HTTP://'
                    WHEN doc_id % 2 = 1 THEN 'https://' ELSE 'http://' END
  || CASE WHEN doc_id % 5 = 0 THEN 'WWW.Site' ELSE 'www.site' END
  || (doc_id % 40)::VARCHAR || '.example.com'
  || CASE WHEN doc_id % 6 = 0 AND doc_id % 2 = 0 THEN ':80'
          WHEN doc_id % 6 = 3 THEN ':443' ELSE '' END
  || '/Sec' || (doc_id % 5)::VARCHAR || '/page' || (doc_id % 11)::VARCHAR
  || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
  || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&q=spark'
          WHEN doc_id % 3 = 1 THEN '?q=spark&utm_campaign=x&fbclid=1'
          ELSE '?q=spark' END
  || CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END"""
    return f"""WITH u AS (
  SELECT doc_id, {canonical_url_sql(synth)} AS canon_url FROM documents),
g AS (
  SELECT canon_url, count(*)::BIGINT AS n_dups, min(doc_id) AS keeper
  FROM u GROUP BY canon_url)
SELECT u.doc_id, u.canon_url, g.n_dups, (u.doc_id = g.keeper) AS keep
FROM u JOIN g USING (canon_url)"""



@query("url_canonical_dups", _url_canon_sql())
def q_url_canonical_dups(spark, sf_dir):
    """URL canonicalization + URL-keyed dedup (crawl-ingest entry op):
    messy synthetic URLs (mixed-case scheme/host, default ports,
    fragments, utm/fbclid tracking params, trailing slashes — all pure
    Column concat over doc_id so the oracle regenerates identical
    strings) → ``pages_pipeline.canonical_url`` (codegen regex chain)
    → group on the canonical form, count duplicates, keep the smallest
    doc_id. One shuffle on the canonical key; at crawl scale this is
    the same hash-groupBy shape as exact content dedup."""
    from pliers_spark.pages_pipeline import canonical_url

    did = F.col("doc_id")
    url = F.concat(
        F.when(did % 4 == 0, F.lit("HTTP://"))
        .when(did % 2 == 1, F.lit("https://"))
        .otherwise(F.lit("http://")),
        F.when(did % 5 == 0, F.lit("WWW.Site")).otherwise(F.lit("www.site")),
        (did % 40).cast("string"),
        F.lit(".example.com"),
        F.when((did % 6 == 0) & (did % 2 == 0), F.lit(":80"))
        .when(did % 6 == 3, F.lit(":443"))
        .otherwise(F.lit("")),
        F.lit("/Sec"),
        (did % 5).cast("string"),
        F.lit("/page"),
        (did % 11).cast("string"),
        F.when(did % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(did % 3 == 0, F.lit("?utm_source=feed&q=spark"))
        .when(did % 3 == 1, F.lit("?q=spark&utm_campaign=x&fbclid=1"))
        .otherwise(F.lit("?q=spark")),
        F.when(did % 7 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    u = _docs(spark, sf_dir).select("doc_id", canonical_url(url).alias("canon_url"))
    g = u.groupBy("canon_url").agg(
        F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keeper")
    )
    return u.join(g, "canon_url").select(
        "doc_id",
        "canon_url",
        "n_dups",
        (F.col("doc_id") == F.col("keeper")).alias("keep"),
    )



_BLOCKLIST = ("slow", "dup", "leak")

_BL_SQL = ", ".join(f"'{w}'" for w in _BLOCKLIST)



@query(
    "blocklist_filter",
    f"""WITH toks AS (
         SELECT doc_id, lower(unnest(string_split(trim(text), ' '))) AS token
         FROM documents)
       SELECT doc_id,
              SUM(CASE WHEN token IN ({_BL_SQL}) THEN 1 ELSE 0 END)::BIGINT AS n_hits,
              (SUM(CASE WHEN token IN ({_BL_SQL}) THEN 1 ELSE 0 END) = 0) AS keep
       FROM toks GROUP BY doc_id""",
)
def q_blocklist_filter(spark, sf_dir):
    """C4-style bad-word blocklist gate (Raffel et al. 2020 §2.2: drop
    any page containing a blocklisted word): explode tokens → literal
    IN-list predicate (no join — the list constant-folds into codegen)
    → per-doc hit count with map-side partial agg; keep = zero hits.
    At 100 TB the plan is a narrow map + one hash agg on doc_id — the
    same shape as token_stats; a large real blocklist would swap the
    IN-list for a broadcast left-semi join, same single shuffle."""
    d = _docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(T.tokenize(F.col("text"))).alias("token"))
    hit = F.when(F.lower(F.col("token")).isin(*_BLOCKLIST), F.lit(1)).otherwise(F.lit(0))
    return toks.groupBy("doc_id").agg(
        F.sum(hit).alias("n_hits"),
        (F.sum(hit) == 0).alias("keep"),
    )



@query(
    "chunk_windows",
    """WITH n AS (
         SELECT doc_id, len(string_split(trim(text), ' '))::BIGINT AS n_tokens
         FROM documents),
       k AS (
         SELECT doc_id, n_tokens,
                (CASE WHEN n_tokens <= 32 THEN 1
                      ELSE (n_tokens - 32 + 15) // 16 + 1 END) AS n_chunks
         FROM n)
       SELECT doc_id,
              unnest(generate_series(0, n_chunks - 1))::BIGINT AS chunk_id,
              (unnest(generate_series(0, n_chunks - 1)) * 16)::BIGINT AS start_tok,
              least(unnest(generate_series(0, n_chunks - 1)) * 16 + 32,
                    n_tokens)::BIGINT AS end_tok
       FROM k""",
)
def q_chunk_windows(spark, sf_dir):
    """Sliding-window chunking for context-window training (the
    BERT/GPT overlapping-stride split: window 32 tokens, stride 16):
    per doc, emit (chunk_id, start_tok, end_tok) covering the token
    sequence with 50% overlap, final chunk clipped. Narrow map + a
    bounded sequence explode (≤ n/stride rows per doc) — no shuffle at
    all; at 100 TB this is a pure map stage that pipelines into
    sequence_pack."""
    d = _docs(spark, sf_dir)
    n = d.select("doc_id", F.size(T.tokenize(F.col("text"))).cast("long").alias("n_tokens"))
    k = n.withColumn(
        "n_chunks",
        F.expr("CASE WHEN n_tokens <= 32 THEN 1 ELSE (n_tokens - 32 + 15) div 16 + 1 END"),
    )
    out = k.select(
        "doc_id", "n_tokens",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1)).alias("chunk_id"),
    )
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (F.col("chunk_id") * 16).cast("long").alias("start_tok"),
        F.least(F.col("chunk_id") * 16 + 32, F.col("n_tokens")).cast("long").alias("end_tok"),
    )



@query(
    "mixture_epochs",
    """WITH tot AS (
         SELECT source, SUM(len(string_split(trim(text), ' ')))::BIGINT AS src_tokens
         FROM documents GROUP BY source),
       mx AS (SELECT MAX(src_tokens) AS max_tokens FROM tot),
       fac AS (
         SELECT source, src_tokens,
                ((SELECT max_tokens FROM mx) + src_tokens - 1) // src_tokens AS n_epochs
         FROM tot)
       SELECT d.doc_id, d.source,
              unnest(generate_series(1, f.n_epochs))::BIGINT AS epoch,
              f.n_epochs::BIGINT AS n_epochs
       FROM documents d JOIN fac f USING (source)""",
)
def q_mixture_epochs(spark, sf_dir):
    """Epoch-based source up-sampling (the data-mixing repetition rule
    behind LLaMA/Gopher mixture tables): each source repeats
    ceil(max_source_tokens / source_tokens) times so every source
    contributes a comparable token budget; docs are emitted once per
    epoch with the epoch index. The per-source factor is a tiny
    aggregate broadcast back onto the corpus — the big side sees one
    narrow map + a bounded explode, no skew (factor is per-source, not
    per-key)."""
    d = _docs(spark, sf_dir)
    tot = d.groupBy("source").agg(
        F.sum(F.size(T.tokenize(F.col("text"))).cast("long")).alias("src_tokens")
    )
    mx = tot.agg(F.max("src_tokens").alias("max_tokens"))
    fac = tot.crossJoin(F.broadcast(mx)).select(
        "source",
        F.expr("(max_tokens + src_tokens - 1) div src_tokens").alias("n_epochs"),
    )
    return (
        d.select("doc_id", "source")
        .join(F.broadcast(fac), "source")
        .select(
            "doc_id", "source",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_epochs"))).alias("epoch"),
            F.col("n_epochs").cast("long").alias("n_epochs"),
        )
    )



# --------------------------------------------------------------------------
# batch 21: hybrid rank fusion, containment dedup, TPC-H Q18

def _rrf_sql() -> str:
    from pliers_spark.operators.ir import rrf_fuse_sql

    return f"""WITH seeds AS (
         SELECT doc_id, string_split(trim(text), ' ') AS t
         FROM documents ORDER BY doc_id LIMIT 8),
       queries AS (
         SELECT doc_id AS q_id, unnest(t[1:6]) AS term FROM seeds),
       {rrf_fuse_sql(k1=20, k=10, rrf_k=60)}"""



@query("rrf_fusion", _rrf_sql())
def q_rrf_fusion(spark, sf_dir):
    """Hybrid-search reciprocal-rank fusion (Cormack et al. SIGIR'09 —
    the Elasticsearch/Vespa hybrid merge): BM25 top-20 and dense-cosine
    top-20 rankings per seed query, fused by Σ 1/(60+rank) in integer
    micro-units. Lexical side reuses the broadcast-gated BM25 postings
    plan; dense side is the exact brute-force baseline (IVF/LSH swap in
    at scale); fusion is a full-outer join of two tiny (q×k1) rankings
    (operators/ir.rrf_fuse)."""
    from pliers_spark.operators.ir import rrf_fuse

    docs = _docs(spark, sf_dir)
    seeds = (
        docs.orderBy("doc_id")
        .limit(8)
        .select(
            F.col("doc_id").alias("q_id"),
            F.explode(F.slice(T.tokenize(F.col("text")), 1, 6)).alias("term"),
        )
    )
    emb = load_table(spark, sf_dir, "embeddings")
    return rrf_fuse(docs, seeds, emb, k1=20, k=10, rrf_k=60)



def _containment_sql() -> str:
    from pliers_spark.operators.dedup import containment_pairs_sql

    return containment_pairs_sql(n=3, threshold_num=4, threshold_den=5, max_df=50)



@query("containment_dedup", _containment_sql())
def q_containment_dedup(spark, sf_dir):
    """Shingle-set CONTAINMENT near-dup join (Broder 1997 §2): pairs
    where ≥80% of the smaller doc's 3-gram shingles appear in the
    larger — catches quote/inclusion duplicates that Jaccard scores
    near zero. Inverted-index join over distinct shingles with a
    max_df=50 stop-shingle cap; the threshold gate is the pure-integer
    cross product 5·∩ ≥ 4·min(|A|,|B|) (operators/dedup.containment_pairs)."""
    from pliers_spark.operators.dedup import containment_pairs

    return containment_pairs(
        _docs(spark, sf_dir), "text", "doc_id", n=3, threshold_num=4, threshold_den=5, max_df=50
    )



@query(
    "tpch_q18",
    """WITH big AS (
         SELECT l_orderkey, sum(l_quantity) AS total_qty
         FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
       SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
              round(b.total_qty, 6) AS total_qty
       FROM big b
       JOIN orders o ON o.o_orderkey = b.l_orderkey
       JOIN customer c ON c.c_custkey = o.o_custkey
       ORDER BY o.o_totalprice DESC, o.o_orderdate, o.o_orderkey
       LIMIT 100""",
)
def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 (large-volume customer): HAVING-gated order census →
    join back to orders + customer → global top-100. The quantity
    census is one map-side-combined shuffle on l_orderkey; the gated
    set is a tiny fraction of orders (AQE broadcasts it into the
    orders join at runtime); the top-100 with a full (price, date,
    orderkey) tiebreak runs as TakeOrderedAndProject — per-partition
    heaps, no global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            F.round("total_qty", 6).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )



# --------------------------------------------------------------------------
# batch 22: incremental crawl-batch dedup, n-gram novelty, burst detection

def _dedup_incremental_sql() -> str:
    bands = ", ".join(_band_key_sql(b, _ROWS_PER_BAND) for b in range(_MH_BANDS))
    return (
        _minhash_cte()
        + f""",
       banded AS (
         SELECT doc_id, unnest([{bands}]) AS band_key FROM sigs),
       bf AS (
         SELECT doc_id, (doc_id % 5 = 0) AS is_delta, band_key
         FROM banded WHERE band_key IS NOT NULL),
       cand AS (
         SELECT DISTINCT p.doc_id AS new_id, o.doc_id AS old_id
         FROM bf p JOIN bf o USING (band_key)
         WHERE p.is_delta
           AND ((NOT o.is_delta AND o.doc_id != p.doc_id)
                OR (o.is_delta AND o.doc_id < p.doc_id))),
       m AS (
         SELECT new_id, count(*)::BIGINT AS n_matches,
                min(old_id)::BIGINT AS first_match
         FROM cand GROUP BY 1)
       SELECT d.doc_id, coalesce(m.n_matches, 0)::BIGINT AS n_matches,
              m.first_match, (m.new_id IS NULL) AS keep
       FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
       LEFT JOIN m ON m.new_id = d.doc_id"""
    )



@query("dedup_incremental", _dedup_incremental_sql())
def q_dedup_incremental(spark, sf_dir):
    """Incremental near-dup gate: the NEWEST crawl batch (doc_id%5=0
    plays the incoming dump) LSH-probed against the indexed corpus +
    earlier batch members — keep-first semantics, index always wins.
    Only the delta side drives the band-key equi-join; in production
    the index postings are a materialized snapshot table, so each
    ingest shuffles just the delta (operators/dedup.incremental_lsh_dedup)."""
    from pliers_spark.operators.dedup import incremental_lsh_dedup

    d = _docs(spark, sf_dir).withColumn("is_delta", F.col("doc_id") % 5 == 0)
    return incremental_lsh_dedup(
        d, "text", "doc_id", "is_delta",
        num_hashes=_MH_K, bands=_MH_BANDS, shingle_n=_MH_SHINGLE,
    )



@query(
    "ngram_novelty",
    """WITH base AS (SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
       sh AS (
         SELECT DISTINCT doc_id,
                unnest(list_transform(range(1, len(t) - 1),
                                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
         FROM base WHERE len(t) >= 3),
       first AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s)
       SELECT sh.doc_id,
              count(*)::BIGINT AS n_shingles,
              SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_novel,
              CAST(round(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END)
                         * 1000000.0 / count(*)) AS BIGINT) AS novelty_ppm
       FROM sh JOIN first f USING (s)
       GROUP BY sh.doc_id""",
)
def q_ngram_novelty(spark, sf_dir):
    """Cross-corpus n-gram novelty (the memorization/contamination
    statistic of Lee et al. 2022 §5: how much of a doc is new text vs
    already-seen shingles): per doc, the fraction of its distinct
    3-gram shingles whose FIRST corpus occurrence (min doc_id owning
    the shingle) is this doc. One shingle census (map-side combined
    min), one join back on the shingle key, one per-doc re-agg — the
    novelty twin of the dedup inverted index, never all-pairs."""
    d = _docs(spark, sf_dir)
    from pliers_spark.functions.hashing import shingles

    sh = d.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(T.tokenize(F.col("text")), 3))).alias("s"),
    )
    first = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), F.lit(1)).otherwise(F.lit(0))
    return (
        sh.join(first, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(novel).cast("long").alias("n_novel"),
            F.round(F.sum(novel) * F.lit(1e6) / F.count(F.lit(1)), 0)
            .cast("long")
            .alias("novelty_ppm"),
        )
    )



@query(
    "event_bursts",
    """WITH daily AS (
         SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS day,
                count(*)::BIGINT AS n_events
         FROM events GROUP BY 1, 2),
       stats AS (
         SELECT event_type, count(*)::BIGINT AS n_days,
                sum(n_events)::BIGINT AS s, sum(n_events * n_events)::BIGINT AS q
         FROM daily GROUP BY 1)
       SELECT d.event_type, d.day, d.n_events,
              (s.n_days * d.n_events - s.s)::BIGINT AS dev_num,
              (s.n_days * d.n_events - s.s > 0
               AND (s.n_days * d.n_events - s.s) * (s.n_days * d.n_events - s.s)
                   > 9 * (s.n_days * s.q - s.s * s.s)) AS is_burst
       FROM daily d JOIN stats s USING (event_type)""",
)
def q_event_bursts(spark, sf_dir):
    """Burst / trending-day detection per event stream (the 3σ spike
    rule behind ops alerting and trending-topic feeds), entirely in
    EXACT integer algebra: a day is a burst iff n·c − S > 0 and
    (n·c − S)² > 9·(nQ − S²) — the squared z-score test cleared of
    division and sqrt, so both engines compare identical int64s. Two
    stacked aggregations (day grain → stream grain, both map-side
    combined) + a broadcast of the per-stream stats; the fact table is
    scanned once."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("n_events").cast("long").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("long").alias("q"),
    )
    dev = F.col("n_days") * F.col("n_events") - F.col("s")
    return daily.join(F.broadcast(stats), "event_type").select(
        "event_type", "day", "n_events",
        dev.cast("long").alias("dev_num"),
        ((dev > 0) & (dev * dev > 9 * (F.col("n_days") * F.col("q") - F.col("s") * F.col("s"))))
        .alias("is_burst"),
    )



# --------------------------------------------------------------------------
# batch 23: SIF embedding pooling, c-TF-IDF cluster terms, SAX symbols

def _sif_sql() -> str:
    from pliers_spark.functions.embeddings import hash_embedding_dim_ppm_sql

    dims = ", ".join(
        f"round(sum({hash_embedding_dim_ppm_sql('token', d)} * w_ppm)"
        f" / (1000000.0 * sum(w_ppm)), 6) AS emb_{d}"
        for d in range(_EMB_DIM)
    )
    return f"""WITH toks AS (
         SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents),
       tot AS (SELECT count(*)::BIGINT AS t FROM toks),
       cnt AS (SELECT token, count(*)::BIGINT AS c FROM toks GROUP BY token),
       w AS (
         SELECT token, CAST(round(1000000.0 * t / (t + 1000 * c)) AS BIGINT) AS w_ppm
         FROM cnt CROSS JOIN tot)
       SELECT doc_id, {dims}
       FROM toks JOIN w USING (token)
       GROUP BY doc_id"""



@query("sif_embedding", _sif_sql())
def q_sif_embedding(spark, sf_dir):
    """SIF-weighted document embedding pooling (Arora, Liang & Ma, ICLR
    2017 — 'a simple but tough-to-beat baseline'): each token weighted
    by a/(a+p(w)) before averaging, so Zipf-head words stop dominating
    the mean. With a = 1/1000 the weight is EXACTLY T/(T + 1000·c) —
    one rounding to integer ppm per vocab word, so the weighted sums
    are order-independent int64s and the single final division is
    bit-identical cross-engine. Plan: token census (one shuffle) →
    weight dim joined back on the token key (vocab-sized, NOT broadcast
    at corpus scale) → per-doc weighted reduction. The common-component
    (first-PC) removal step of the paper is a KxK driver-side PCA at
    corpus scale — out of scope here, as in most production uses."""
    d = _docs(spark, sf_dir)
    from pliers_spark.functions.embeddings import hash_embedding_dim_ppm

    toks = d.select("doc_id", F.explode(T.tokenize(F.col("text"))).alias("token"))
    tot = toks.agg(F.count(F.lit(1)).cast("long").alias("t"))
    cnt = toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("c"))
    w = cnt.crossJoin(F.broadcast(tot)).select(
        "token",
        F.round(F.lit(1e6) * F.col("t") / (F.col("t") + 1000 * F.col("c")), 0)
        .cast("long")
        .alias("w_ppm"),
    )
    weighted = toks.join(w, "token")
    return weighted.groupBy("doc_id").agg(
        *[
            F.round(
                F.sum(hash_embedding_dim_ppm(F.col("token"), dd) * F.col("w_ppm"))
                / (F.lit(1e6) * F.sum("w_ppm")),
                6,
            ).alias(f"emb_{dd}")
            for dd in range(_EMB_DIM)
        ]
    )



def _ctfidf_sql(k: int = 8, topk: int = 5) -> str:
    from pliers_spark.operators.similarity import kmeans_assign_sql

    return f"""WITH assign AS ({kmeans_assign_sql(k=k)}),
       toks AS (
         SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents),
       joined AS (
         SELECT a.cluster_id, t.token
         FROM toks t JOIN assign a ON a.vec_id = t.doc_id),
       tf AS (SELECT cluster_id, token, count(*)::BIGINT AS tf FROM joined GROUP BY 1, 2),
       ft AS (SELECT token, sum(tf)::BIGINT AS f_t FROM tf GROUP BY token),
       sc AS (
         SELECT (SELECT sum(tf) FROM tf)::BIGINT AS total_tokens,
                (SELECT count(DISTINCT cluster_id) FROM tf)::BIGINT AS n_clusters),
       scored AS (
         SELECT tf.cluster_id, tf.token, tf.tf,
                tf.tf * CAST(round(ln(1.0 + total_tokens::DOUBLE
                                       / (n_clusters::DOUBLE * f_t::DOUBLE))
                                   * 1000000.0) AS BIGINT) AS score_fp
         FROM tf JOIN ft USING (token) CROSS JOIN sc)
       SELECT cluster_id, token, tf, score_fp,
              row_number() OVER (PARTITION BY cluster_id
                                 ORDER BY score_fp DESC, token)::BIGINT AS rank
       FROM scored QUALIFY rank <= {topk}"""



@query("ctfidf_terms", _ctfidf_sql())
def q_ctfidf_terms(spark, sf_dir):
    """c-TF-IDF cluster labeling (Grootendorst 2022, BERTopic §3.3):
    top-5 characteristic terms per embedding k-means cluster, scored
    tf_{t,c} · ln(1 + A/f_t) with A = average tokens per class. The
    cluster assignment is the exact-int64 Lloyd step (kmeans_assign);
    the term side is two stacked censuses on (cluster, token) / token
    keys — the idf factor rounds ONCE to integer micro-nats, so the
    int64 product ordering is total and cross-engine identical. This
    is the topic-labeling readout every embedding-cluster curation
    pipeline runs after `kmeans_assign`/`semantic_dedup`."""
    from pliers_spark.operators.similarity import kmeans_assign

    emb = load_table(spark, sf_dir, "embeddings")
    assign = kmeans_assign(emb, k=8).select(
        F.col("vec_id").alias("doc_id"), "cluster_id"
    )
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.explode(T.tokenize(F.col("text"))).alias("token")
    )
    joined = toks.join(assign, "doc_id")
    tf = joined.groupBy("cluster_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    ft = tf.groupBy("token").agg(F.sum("tf").cast("long").alias("f_t"))
    sc = tf.agg(
        F.sum("tf").cast("long").alias("total_tokens"),
        F.countDistinct("cluster_id").cast("long").alias("n_clusters"),
    )
    scored = (
        tf.join(ft, "token")
        .crossJoin(F.broadcast(sc))
        .select(
            "cluster_id", "token", "tf",
            (
                F.col("tf")
                * F.round(
                    F.log(
                        F.lit(1.0)
                        + F.col("total_tokens").cast("double")
                        / (F.col("n_clusters").cast("double") * F.col("f_t").cast("double"))
                    )
                    * F.lit(1e6),
                    0,
                ).cast("long")
            ).alias("score_fp"),
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("score_fp"), F.col("token"))
    return (
        scored.select("*", F.row_number().over(w).cast("long").alias("rank"))
        .where(F.col("rank") <= 5)
    )



_SAX_B2_NUM = 45_495_025  # 0.6745² · 1e8 (exactly: 0.45495025)

_SAX_B2_DEN = 100_000_000



@query(
    "sax_symbols",
    f"""WITH v AS (
         SELECT user_id, event_id,
                CAST(round(value * 1000000.0) AS BIGINT) AS v_fp,
                row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         FROM events),
       st AS (
         SELECT user_id, count(*)::BIGINT AS n,
                sum(v_fp)::BIGINT AS s,
                sum(v_fp::HUGEINT * v_fp::HUGEINT) AS q
         FROM v GROUP BY user_id),
       paa AS (
         SELECT user_id, ((rn - 1) // 8)::BIGINT AS window_id,
                count(*)::BIGINT AS cn, sum(v_fp)::BIGINT AS cs
         FROM v GROUP BY 1, 2),
       j AS (
         SELECT p.user_id, p.window_id, p.cn,
                CAST(round(p.cs::DOUBLE / p.cn) AS BIGINT) AS paa_fp,
                (s.n::HUGEINT * p.cs::HUGEINT - p.cn::HUGEINT * s.s::HUGEINT) AS dev,
                (s.n::HUGEINT * s.q - s.s::HUGEINT * s.s::HUGEINT) AS m,
                p.cn::HUGEINT AS cnh
         FROM paa p JOIN st s USING (user_id))
       SELECT user_id, window_id, cn, paa_fp,
              CASE
                WHEN dev < 0 AND {_SAX_B2_DEN}::HUGEINT * dev * dev
                                 > {_SAX_B2_NUM}::HUGEINT * cnh * cnh * m THEN 'a'
                WHEN dev < 0 THEN 'b'
                WHEN {_SAX_B2_DEN}::HUGEINT * dev * dev
                     <= {_SAX_B2_NUM}::HUGEINT * cnh * cnh * m THEN 'c'
                ELSE 'd'
              END AS symbol
       FROM j""",
)
def q_sax_symbols(spark, sf_dir):
    """SAX symbolic time-series approximation (Lin et al., DMKD 2007):
    per user, the event-value sequence is PAA-averaged over chunks of 8
    and each chunk mapped to a 4-letter alphabet by the Gaussian
    breakpoints (−0.6745, 0, +0.6745) of the per-user z-distribution —
    the front door to motif discovery / symbolic indexing over raw
    series. The z-comparison never touches a float: PAA-mean vs
    μ + b·σ is cross-multiplied and squared into
    1e8·dev² ≷ 45495025·cn²·(nQ−S²) with dev = n·cs − cn·S, evaluated
    in DECIMAL(38,0)/HUGEINT (the temperature_sample discipline), so
    the symbol boundaries are bit-identical on both engines. Plan: one
    per-user sequence window (single shuffle on user_id), two stacked
    aggregations, broadcast per-user stats back onto chunk grain."""
    ev = _events(spark, sf_dir)
    dec = "decimal(38,0)"
    v_fp = F.round(F.col("value") * F.lit(1e6), 0).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = ev.select(
        "user_id", "event_id", v_fp.alias("v_fp"), F.row_number().over(w).alias("rn")
    )
    st = v.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v_fp").cast("long").alias("s"),
        F.sum(F.col("v_fp").cast(dec) * F.col("v_fp").cast(dec)).cast(dec).alias("q"),
    )
    paa = v.groupBy(
        "user_id", F.floor((F.col("rn") - 1) / 8).cast("long").alias("window_id")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("cn"),
        F.sum("v_fp").cast("long").alias("cs"),
    )
    j = paa.join(st, "user_id").select(
        "user_id", "window_id", "cn",
        F.round(F.col("cs").cast("double") / F.col("cn"), 0).cast("long").alias("paa_fp"),
        (F.col("n").cast(dec) * F.col("cs").cast(dec) - F.col("cn").cast(dec) * F.col("s").cast(dec)).alias("dev"),
        (F.col("n").cast(dec) * F.col("q") - F.col("s").cast(dec) * F.col("s").cast(dec)).alias("m"),
        F.col("cn").cast(dec).alias("cnh"),
    )
    lhs = F.lit(_SAX_B2_DEN).cast(dec) * F.col("dev") * F.col("dev")
    rhs = F.lit(_SAX_B2_NUM).cast(dec) * F.col("cnh") * F.col("cnh") * F.col("m")
    symbol = (
        F.when((F.col("dev") < 0) & (lhs > rhs), F.lit("a"))
        .when(F.col("dev") < 0, F.lit("b"))
        .when(lhs <= rhs, F.lit("c"))
        .otherwise(F.lit("d"))
    )
    return j.select("user_id", "window_id", "cn", "paa_fp", symbol.alias("symbol"))



# --------------------------------------------------------------------------
# batch 24: NDCG ranking evaluation, Dunning keyness, WOE/IV binning

# exact integer discount weights round(1e6 / log2(1+r)) for ranks 1..5 —
# computed once in Python and shared verbatim by BOTH engines so the DCG
# sums are pure int64 arithmetic (see tools/golden_hashes.py discipline)
_NDCG_W = {1: 1_000_000, 2: 630_930, 3: 500_000, 4: 430_677, 5: 386_853}

_NDCG_GAIN = {r: 2**r - 1 for r in range(0, 7)}  # graded gain 2^rel - 1



def _ndcg_sql(k: int = 5) -> str:
    from pliers_spark.operators.ir import bm25_topk_sql

    w_case = " ".join(f"WHEN {r} THEN {w}" for r, w in _NDCG_W.items())
    g_case = " ".join(f"WHEN {r} THEN {g}" for r, g in _NDCG_GAIN.items())
    tail = f""", rel AS (
  SELECT b.q_id, b.doc_id, b.rank, count(tf.term)::BIGINT AS rel
  FROM bm25 b
  JOIN qt ON qt.q_id = b.q_id
  LEFT JOIN tf ON tf.doc_id = b.doc_id AND tf.term = qt.term
  GROUP BY 1, 2, 3),
gains AS (
  SELECT q_id, doc_id, rank,
         (CASE rel {g_case} END)::BIGINT AS gain,
         row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, doc_id)::BIGINT AS irank
  FROM rel),
agg AS (
  SELECT q_id,
         sum(gain * (CASE rank {w_case} END))::BIGINT AS dcg_fp,
         sum(gain * (CASE irank {w_case} END))::BIGINT AS idcg_fp
  FROM gains GROUP BY q_id)
SELECT q_id, dcg_fp, idcg_fp,
       CASE WHEN idcg_fp = 0 THEN 0.0
            ELSE round(dcg_fp::DOUBLE / idcg_fp::DOUBLE, 6) END AS ndcg
FROM agg"""
    return f"""WITH seeds AS (
         SELECT doc_id, string_split(trim(text), ' ') AS t
         FROM documents ORDER BY doc_id LIMIT 8),
       queries AS (
         SELECT doc_id AS q_id, unnest(t[1:6]) AS term FROM seeds),
       {bm25_topk_sql(k=k, tail=tail)}"""



@query("ndcg_at_k", _ndcg_sql())
def q_ndcg_at_k(spark, sf_dir):
    """NDCG@5 ranking evaluation (Järvelin & Kekäläinen, TOIS 2002) of
    the engine's own BM25 retrieval: graded relevance = number of the
    query's terms the candidate actually contains (0..6), gain 2^rel−1,
    discount 1/log2(1+rank) as ONCE-rounded integer micro-weights shared
    verbatim by both engines — so DCG and ideal-DCG are exact int64 sums
    and the single final division is bit-identical. Plan: the corpus is
    touched only by the BM25 postings pass; relevance grading joins the
    (queries × k)-sized candidate set back to doc term sets through a
    broadcast gate, so the evaluation stage never shuffles the corpus.
    This is the eval loop every retrieval/curation pipeline runs over
    its ranker."""
    from pliers_spark.operators.ir import bm25_topk

    docs = _docs(spark, sf_dir)
    seeds = (
        docs.orderBy("doc_id")
        .limit(8)
        .select(
            F.col("doc_id").alias("q_id"),
            F.explode(F.slice(T.tokenize(F.col("text")), 1, 6)).alias("term"),
        )
    )
    # both frames are tiny (queries×k rows) but feed MULTIPLE branches
    # (relevance grading, ideal re-rank, final join) — checkpoint so the
    # BM25 postings pass and the seed scan run ONCE, not per branch
    cand = bm25_topk(docs, seeds, k=5).stableCheckpoint(eager=True)
    qt = seeds.distinct().stableCheckpoint(eager=True)
    cand_docs = cand.select("doc_id").distinct()
    # distinct (doc, term) postings of candidate docs only — broadcast-gated
    doc_terms = (
        docs.join(F.broadcast(cand_docs), "doc_id")
        .select("doc_id", F.explode(T.tokenize(F.col("text"))).alias("term"))
        .distinct()
    )
    matched = (
        doc_terms.join(F.broadcast(qt), "term")
        .groupBy("q_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("rel"))
    )
    rel = cand.join(matched, ["q_id", "doc_id"], "left").select(
        "q_id", "doc_id", "rank", F.coalesce(F.col("rel"), F.lit(0)).alias("rel")
    )
    gain = F.create_map(
        *[F.lit(x) for kv in _NDCG_GAIN.items() for x in kv]
    )[F.col("rel")].cast("long")
    wmap = F.create_map(*[F.lit(x) for kv in _NDCG_W.items() for x in kv])
    iw = Window.partitionBy("q_id").orderBy(F.desc("rel"), "doc_id")
    gains = rel.select(
        "q_id",
        gain.alias("gain"),
        wmap[F.col("rank")].cast("long").alias("w"),
        wmap[F.row_number().over(iw).cast("long")].cast("long").alias("iw"),
    )
    agg = gains.groupBy("q_id").agg(
        F.sum(F.col("gain") * F.col("w")).cast("long").alias("dcg_fp"),
        F.sum(F.col("gain") * F.col("iw")).cast("long").alias("idcg_fp"),
    )
    return agg.select(
        "q_id", "dcg_fp", "idcg_fp",
        F.when(F.col("idcg_fp") == 0, F.lit(0.0))
        .otherwise(
            F.round(F.col("dcg_fp").cast("double") / F.col("idcg_fp").cast("double"), 6)
        )
        .alias("ndcg"),
    )



def _keyness_sql(min_count: int = 10, topk: int = 20) -> str:
    return f"""WITH toks AS (
         SELECT source, unnest(string_split(trim(text), ' ')) AS token FROM documents),
       st AS (SELECT source, token, count(*)::BIGINT AS a FROM toks GROUP BY 1, 2),
       tt AS (SELECT token, sum(a)::BIGINT AS c FROM st GROUP BY token),
       src AS (SELECT source, sum(a)::BIGINT AS n1 FROM st GROUP BY source),
       tot AS (SELECT sum(a)::BIGINT AS n FROM st),
       j AS (
         SELECT st.source, st.token, st.a, tt.c - st.a AS b,
                src.n1, tot.n - src.n1 AS n2, tt.c, tot.n
         FROM st JOIN tt USING (token) JOIN src USING (source) CROSS JOIN tot
         WHERE tt.c >= {min_count}),
       g AS (
         SELECT source, token, a, b,
                2 * (a * CAST(round(1000000.0 * ln((a::DOUBLE * n::DOUBLE)
                                                   / (n1::DOUBLE * c::DOUBLE))) AS BIGINT)
                     + CASE WHEN b = 0 THEN 0
                            ELSE b * CAST(round(1000000.0 * ln((b::DOUBLE * n::DOUBLE)
                                                               / (n2::DOUBLE * c::DOUBLE))) AS BIGINT)
                       END) AS g2_fp,
                (a::DOUBLE * n::DOUBLE > n1::DOUBLE * c::DOUBLE) AS overused
         FROM j)
       SELECT source, token, a AS cnt_focus, b AS cnt_rest, g2_fp, overused,
              row_number() OVER (PARTITION BY source
                                 ORDER BY g2_fp DESC, token)::BIGINT AS rank
       FROM g QUALIFY rank <= {topk}"""



@query("dunning_keyness", _keyness_sql())
def q_dunning_keyness(spark, sf_dir):
    """Log-likelihood keyness (Dunning, CL 1993 G²): for every source,
    the 20 tokens whose frequency most defies the corpus-wide rate —
    the standard corpus-linguistics answer to 'what is distinctive
    about this slice', and the readout behind domain-mix debugging in
    pretraining curation. G² = 2Σ Oᵢ·ln(Oᵢ/Eᵢ) with each ln computed on
    one double ratio of exact int64 counts and rounded ONCE to integer
    micro-nats before the count multiplier, so both engines sum
    identical int64s (b=0 term is the 0·ln0 = 0 limit). Plan: one
    (source, token) census shuffle, a token-grain join for corpus
    counts (vocab-sized — NOT broadcast at web scale), per-source
    totals broadcast, top-k per source via TakeOrdered-style window."""
    d = _docs(spark, sf_dir)
    toks = d.select("source", F.explode(T.tokenize(F.col("text"))).alias("token"))
    st = toks.groupBy("source", "token").agg(F.count(F.lit(1)).cast("long").alias("a"))
    tt = st.groupBy("token").agg(F.sum("a").cast("long").alias("c"))
    src = st.groupBy("source").agg(F.sum("a").cast("long").alias("n1"))
    tot = st.agg(F.sum("a").cast("long").alias("n"))
    j = (
        st.join(tt, "token")
        .where(F.col("c") >= 10)
        .join(F.broadcast(src), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source", "token", "a", (F.col("c") - F.col("a")).alias("b"),
            "n1", (F.col("n") - F.col("n1")).alias("n2"), "c", "n",
        )
    )
    d_ = lambda col: F.col(col).cast("double")  # noqa: E731
    lg1 = F.round(
        F.lit(1e6) * F.log((d_("a") * d_("n")) / (d_("n1") * d_("c"))), 0
    ).cast("long")
    lg2 = F.round(
        F.lit(1e6) * F.log((d_("b") * d_("n")) / (d_("n2") * d_("c"))), 0
    ).cast("long")
    g2 = 2 * (
        F.col("a") * lg1
        + F.when(F.col("b") == 0, F.lit(0)).otherwise(F.col("b") * lg2)
    )
    scored = j.select(
        "source", "token", F.col("a").alias("cnt_focus"), F.col("b").alias("cnt_rest"),
        g2.alias("g2_fp"),
        (d_("a") * d_("n") > d_("n1") * d_("c")).alias("overused"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("g2_fp"), "token")
    return scored.select(
        "*", F.row_number().over(w).cast("long").alias("rank")
    ).where(F.col("rank") <= 20)



def _woe_sql(bins: int = 10) -> str:
    return f"""WITH v AS (
         SELECT o_orderkey,
                CAST(round(o_totalprice * 100.0) AS BIGINT) AS v_fp,
                (o_orderstatus = 'F')::INT AS bad
         FROM orders),
       r AS (
         SELECT v_fp, bad,
                row_number() OVER (ORDER BY v_fp, o_orderkey) AS rn,
                count(*) OVER () AS nn
         FROM v),
       b AS (
         SELECT ((rn - 1) * {bins} // nn)::BIGINT AS bin,
                count(*)::BIGINT AS n,
                sum(1 - bad)::BIGINT AS goods,
                sum(bad)::BIGINT AS bads
         FROM r GROUP BY 1),
       t AS (SELECT sum(goods)::BIGINT AS g, sum(bads)::BIGINT AS bb FROM b),
       s AS (
         SELECT bin, n, goods, bads,
                CAST(round(1000000.0 * ln((goods::DOUBLE * bb::DOUBLE)
                                          / (bads::DOUBLE * g::DOUBLE))) AS BIGINT) AS woe_fp,
                (goods::DOUBLE * bb::DOUBLE - bads::DOUBLE * g::DOUBLE) AS diff,
                g::DOUBLE * bb::DOUBLE AS gb
         FROM b CROSS JOIN t
         WHERE goods > 0 AND bads > 0)
       SELECT bin, n, goods, bads, woe_fp,
              round(diff * woe_fp::DOUBLE / (gb * 1000000.0), 6) AS iv_part
       FROM s"""



@query("woe_iv", _woe_sql())
def q_woe_iv(spark, sf_dir):
    """Weight-of-evidence / information-value binning (the credit-
    scoring feature-screening standard; Siddiqi 2006): o_totalprice is
    exact-rank-deciled (integer rank arithmetic — no ntile remainder
    ambiguity), per-bin WOE = ln(good-share / bad-share) rounded ONCE
    to integer micro-nats from a single double ratio of exact int64
    counts, and the IV contribution (gᵢ/G − bᵢ/B)·WOE evaluated in the
    identical double-expression shape on both engines. Plan: global
    rank is the two-pass rank histogram for real (CENSUS GRAIN r4:
    range-bucketed row_number, operators/census.py); everything after
    is bin-grain (10 rows) with the class totals broadcast."""
    from pliers_spark.operators.census import scalable_row_number

    o = load_table(spark, sf_dir, "orders")
    v = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100.0, 0).cast("long").alias("v_fp"),
        (F.col("o_orderstatus") == "F").cast("int").alias("bad"),
    )
    n = v.count()
    r = scalable_row_number(v, "v_fp", out="rn", tiebreak=("o_orderkey",)).select(
        "v_fp", "bad", "rn"
    )
    b = r.groupBy(
        F.floor((F.col("rn") - 1) * 10 / F.lit(n)).cast("long").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(1 - F.col("bad")).cast("long").alias("goods"),
        F.sum("bad").cast("long").alias("bads"),
    )
    t = b.agg(
        F.sum("goods").cast("long").alias("g"), F.sum("bads").cast("long").alias("bb")
    )
    d_ = lambda col: F.col(col).cast("double")  # noqa: E731
    s = (
        b.crossJoin(F.broadcast(t))
        .where((F.col("goods") > 0) & (F.col("bads") > 0))
        .select(
            "bin", "n", "goods", "bads",
            F.round(
                F.lit(1e6) * F.log((d_("goods") * d_("bb")) / (d_("bads") * d_("g"))), 0
            ).cast("long").alias("woe_fp"),
            (d_("goods") * d_("bb") - d_("bads") * d_("g")).alias("diff"),
            (d_("g") * d_("bb")).alias("gb"),
        )
    )
    return s.select(
        "bin", "n", "goods", "bads", "woe_fp",
        F.round(F.col("diff") * F.col("woe_fp").cast("double") / (F.col("gb") * F.lit(1e6)), 6).alias("iv_part"),
    )


# --------------------------------------------------------------------------
# round 3: SaliencyExtractor counterpart (VERDICT r2 item 6) — Itti-Koch
# summary stats over the real PNG decode path


_SAL_PX = "(d.doc_id*149 + r.r*23 + c.c*11 + {ch})"


@query(
    "image_saliency",
    f"""WITH px AS (
         SELECT d.doc_id, r.r, c.c,
                ({_SAL_PX.format(ch=0)} % 256
                 + {_SAL_PX.format(ch=37)} % 256
                 + {_SAL_PX.format(ch=74)} % 256)::BIGINT AS i
         FROM documents d, generate_series(0,7) r(r), generate_series(0,7) c(c)),
       tot AS (SELECT doc_id, sum(i)::BIGINT AS s FROM px GROUP BY doc_id),
       nb AS (
         SELECT p.doc_id, p.r, p.c, sum(p2.i)::BIGINT AS cs
         FROM px p JOIN px p2 ON p2.doc_id = p.doc_id
          AND p2.r BETWEEN p.r - 1 AND p.r + 1
          AND p2.c BETWEEN p.c - 1 AND p.c + 1
         GROUP BY p.doc_id, p.r, p.c),
       sal AS (
         SELECT n.doc_id, n.r, n.c, abs(n.cs*64 - 9*t.s)::BIGINT AS sal
         FROM nb n JOIN tot t USING (doc_id)),
       mx AS (SELECT doc_id, max(sal) AS smax FROM sal GROUP BY doc_id),
       pos AS (
         SELECT s.doc_id, min(s.r*8 + s.c) AS idx
         FROM sal s JOIN mx m USING (doc_id) WHERE s.sal = m.smax
         GROUP BY s.doc_id),
       qt AS (
         SELECT s.doc_id,
                CASE WHEN m.smax = 0 THEN 0
                     ELSE (510*s.sal + m.smax) // (2*m.smax) END AS q
         FROM sal s JOIN mx m USING (doc_id)),
       hist AS (SELECT doc_id, q, count(*)::BIGINT AS cnt FROM qt GROUP BY doc_id, q),
       cum AS (
         SELECT doc_id, q, cnt,
                sum(cnt) OVER win AS w0, sum(q*cnt) OVER win AS s0,
                sum(q*cnt) OVER (PARTITION BY doc_id) AS stot,
                count(*) OVER (PARTITION BY doc_id) AS ndist,
                row_number() OVER (PARTITION BY doc_id ORDER BY q) AS rn,
                max(q) OVER (PARTITION BY doc_id) AS qmax
         FROM hist
         WINDOW win AS (PARTITION BY doc_id ORDER BY q ROWS UNBOUNDED PRECEDING)),
       cand AS (
         SELECT doc_id, q, qmax,
                (s0*(64 - w0) - (stot - s0)*w0) AS a, w0*(64 - w0) AS b
         FROM cum WHERE rn < ndist),
       pick AS (
         SELECT doc_id, q AS t,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY (a*a)::DOUBLE / b DESC, q ASC) AS pr
         FROM cand),
       thr AS (
         SELECT c.doc_id, coalesce(p.t, c.qmax) AS t
         FROM (SELECT DISTINCT doc_id, qmax FROM cum) c
         LEFT JOIN (SELECT doc_id, t FROM pick WHERE pr = 1) p USING (doc_id)),
       high AS (
         SELECT q.doc_id, sum((q.q > t.t)::INT)::BIGINT AS nh
         FROM qt q JOIN thr t USING (doc_id) GROUP BY q.doc_id)
       SELECT m.doc_id,
              round_even(m.smax / 146880.0, 6) AS max_saliency,
              (p.idx // 8)::INT AS max_y,
              (p.idx % 8)::INT AS max_x,
              round(h.nh / 64.0, 6) AS frac_high_saliency
       FROM mx m JOIN pos p USING (doc_id) JOIN high h USING (doc_id)""",
)
def q_image_saliency(spark, sf_dir):
    """SaliencyExtractor summary stats (pliers/extractors/image.py:72-103:
    Itti-Koch max_saliency / max_y / max_x / frac_high_saliency with Otsu
    binarization) over a REAL PNG encode→decode round trip: 8x8 formula
    images → stdlib-zlib PNG → production image_saliency_stats stage
    (multimodal.py). The center-surround map is kept in exact integer
    units and the Otsu threshold maximizes the exact-integer between-class
    variance, so the relational oracle recomputes the identical pixels,
    map, threshold, and fractions — any codec or formula bug breaks the
    row hash."""
    import numpy as np

    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        r = np.arange(8)[:, None, None]
        c = np.arange(8)[None, :, None]
        ch = np.arange(3)[None, None, :]
        img = ((did * 149 + r * 23 + c * 11 + ch * 37) % 256).astype(np.uint8)
        return codecs.encode_png(img)

    payloads = _synth_payloads(spark, sf_dir, build)
    return multimodal.image_saliency_stats(payloads).withColumnRenamed("id", "doc_id")


# --------------------------------------------------------------------------
# round 3 (stretch, VERDICT r2 item 10): baseline-JPEG round trip


@query(
    "jpeg_decode_stats",
    """WITH blk AS (
         SELECT d.doc_id,
                ((d.doc_id*37 + i.i*101 + j.j*53) % 256)::BIGINT AS v
         FROM documents d, generate_series(0,1) i(i), generate_series(0,1) j(j)),
       dec AS (
         SELECT doc_id,
                greatest(0.0, least(255.0,
                    2*round_even((v - 128) / 2.0, 0) + 128)) AS dv
         FROM blk),
       s AS (SELECT doc_id, sum(dv) AS sd FROM dec GROUP BY doc_id)
       SELECT doc_id, CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
              CAST(3 AS INTEGER) AS channels,
              ((sd * 64) / 256.0) / 255.0 AS mean_brightness
       FROM s""",
)
def q_jpeg_decode_stats(spark, sf_dir):
    """BrightnessExtractor over a REAL baseline-JPEG encode→decode round
    trip (pliers loads JPEG via imageio; here the engine's own stdlib
    T.81 codec — markers, DQT, SOF0, Huffman scan, byte stuffing, DCT):
    16x16 images of four constant 8x8 blocks → quality-50 JPEG →
    production image_stats stage. Constant blocks make the lossy
    round trip CLOSED-FORM: only the DC survives, quantized at Q0=16,
    so decoded(v) = clip(2*round_half_even((v-128)/2) + 128) exactly
    (the codec snaps mathematically-integer DCT values to the 1e-6
    grid, making the .5 boundary reproducibly half-even). The oracle
    recomputes that form relationally — any Huffman/marker/DCT bug
    changes the pixels and breaks the hash."""
    import numpy as np

    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        i = np.arange(2)[:, None]
        j = np.arange(2)[None, :]
        blocks = ((did * 37 + i * 101 + j * 53) % 256).astype(np.uint8)
        img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
        return codecs.encode_jpeg(img, quality=50)

    payloads = _synth_payloads(spark, sf_dir, build)
    return multimodal.image_stats(payloads).withColumnRenamed("id", "doc_id")

# --------------------------------------------------------------------------
# round 3: ImageResizingFilter with REAL bilinear interpolation


def _bilinear_sql() -> str:
    # source pixel P(y, x, ch) of the 8x8 formula image; tap indices and
    # weights are exact integers (denominator 2*th * 2*tw = 60) with one
    # float division + round_even at the end — mirrors
    # multimodal.resize_bilinear bit-for-bit
    def p(y: str, x: str, ch: int) -> str:
        return f"((doc_id*157 + {y}*29 + {x}*13 + {ch}) % 256)"

    def chan(ch: int) -> str:
        return (
            f"round_even(((6 - ry)*((10 - rx)*{p('y0','x0',ch)} + rx*{p('y0','x1',ch)})"
            f" + ry*((10 - rx)*{p('y1','x0',ch)} + rx*{p('y1','x1',ch)})) / 60.0, 0)"
        )

    return f"""WITH grid AS (
         SELECT d.doc_id, i.i, j.j,
                least(greatest((2*i.i + 1)*8 - 3, 0), 42) AS numy,
                least(greatest((2*j.j + 1)*8 - 5, 0), 70) AS numx
         FROM documents d, generate_series(0,2) i(i), generate_series(0,4) j(j)),
       taps AS (
         SELECT doc_id,
                numy // 6 AS y0, least(numy // 6 + 1, 7) AS y1, numy % 6 AS ry,
                numx // 10 AS x0, least(numx // 10 + 1, 7) AS x1, numx % 10 AS rx
         FROM grid),
       px AS (
         SELECT doc_id, greatest({chan(0)}, {chan(41)}, {chan(82)}) AS mx
         FROM taps)
       SELECT doc_id, CAST(5 AS INTEGER) AS width, CAST(3 AS INTEGER) AS height,
              CAST(3 AS INTEGER) AS channels,
              (sum(mx) / 15.0) / 255.0 AS mean_brightness
       FROM px GROUP BY doc_id"""


@query("image_resize_bilinear", _bilinear_sql())
def q_image_resize_bilinear(spark, sf_dir):
    """ImageResizingFilter (pliers/filters/image.py:46-76) with REAL
    bilinear interpolation (round 3; the nearest-neighbor `image_resize`
    row was the last 'partial' with an actionable gap): 8x8 formula
    images → real PNG round trip → exact-integer 4-tap bilinear resample
    to 5x3 (half-pixel centers, edge clamp, round-half-even) → stats.
    The oracle recomputes taps, weights, per-channel rounding, channel
    max, and the mean relationally — bit-identical by construction."""
    import numpy as np

    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        r = np.arange(8)[:, None, None]
        c = np.arange(8)[None, :, None]
        ch = np.arange(3)[None, None, :]
        img = ((did * 157 + r * 29 + c * 13 + ch * 41) % 256).astype(np.uint8)
        return codecs.encode_png(img)

    payloads = _synth_payloads(spark, sf_dir, build)
    return multimodal.image_resize_bilinear_stats(
        payloads, target_w=5, target_h=3
    ).withColumnRenamed("id", "doc_id")


# --------------------------------------------------------------------------
# round 3: COLOR (YCbCr 4:4:4) baseline-JPEG round trip


def _jpeg_color_sql() -> str:
    # constant-color 8x8 images make the lossy color round trip a scalar
    # closed form per doc: JFIF transform (rounded/clipped per plane) ->
    # per-plane DC-only quantize/dequant (luma Q0=16, chroma Q0=17 at
    # quality 50) -> inverse transform. Every step mirrors the numpy
    # pipeline's float ops left-associatively with round_even, so the
    # doubles agree bit-for-bit (validated over 400 random colors in
    # tests/test_multimodal.py).
    def clip(e: str) -> str:
        return f"least(255.0, greatest(0.0, {e}))"

    def dec_plane(v: str, q: str) -> str:
        quant = f"round_even((8.0*({v} - 128)) / {q}, 0)"
        return clip(f"round_even(round_even(({quant})*{q}/8.0, 6) + 128.0, 0)")

    y = clip("round_even(0.299*r + 0.587*g + 0.114*b, 0)")
    cb = clip("round_even(-0.168736*r - 0.331264*g + 0.5*b + 128.0, 0)")
    cr = clip("round_even(0.5*r - 0.418688*g - 0.081312*b + 128.0, 0)")
    rr = clip("round_even(y2 + 1.402*(cr2 - 128.0), 0)")
    gg = clip("round_even(y2 - 0.344136*(cb2 - 128.0) - 0.714136*(cr2 - 128.0), 0)")
    bb = clip("round_even(y2 + 1.772*(cb2 - 128.0), 0)")
    return f"""WITH rgb AS (
         SELECT doc_id,
                ((doc_id*31) % 256)::DOUBLE AS r,
                ((doc_id*57 + 11) % 256)::DOUBLE AS g,
                ((doc_id*93 + 5) % 256)::DOUBLE AS b
         FROM documents),
       ycc AS (
         SELECT doc_id, {y} AS y, {cb} AS cb, {cr} AS cr FROM rgb),
       dec AS (
         SELECT doc_id,
                {dec_plane('y', '16.0')} AS y2,
                {dec_plane('cb', '17.0')} AS cb2,
                {dec_plane('cr', '17.0')} AS cr2
         FROM ycc),
       back AS (
         SELECT doc_id, {rr} AS rr, {gg} AS gg, {bb} AS bb FROM dec)
       SELECT doc_id, CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
              CAST(3 AS INTEGER) AS channels,
              greatest(rr, gg, bb) / 255.0 AS mean_brightness
       FROM back"""


@query("jpeg_color_decode_stats", _jpeg_color_sql())
def q_jpeg_color_decode_stats(spark, sf_dir):
    """BrightnessExtractor over a REAL color baseline-JPEG round trip
    (3-component YCbCr 4:4:4; pliers loads color JPEG via imageio —
    here the engine's stdlib T.81 codec end-to-end): 8x8 constant-color
    images -> quality-50 color encode -> decode (markers, 2 quant
    tables, 4 Huffman tables, MCU-interleaved scan, inverse color
    transform) -> production image_stats stage. Constant planes leave
    only each component's DC, so the whole lossy pipeline collapses to
    a scalar closed form per doc that the oracle mirrors float-op by
    float-op (round_even everywhere, left-associative expressions)."""
    import numpy as np

    from pliers_spark import codecs, multimodal

    def build(did: int) -> bytes:
        img = np.zeros((8, 8, 3), dtype=np.uint8)
        img[:] = ((did * 31) % 256, (did * 57 + 11) % 256, (did * 93 + 5) % 256)
        return codecs.encode_jpeg(img, quality=50, mode="color")

    payloads = _synth_payloads(spark, sf_dir, build)
    return multimodal.image_stats(payloads).withColumnRenamed("id", "doc_id")

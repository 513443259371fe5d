"""Multimodal plumbing: schemas, batch shapes, real PPM/BMP/WAV decode,
deterministic stub fallback."""

import numpy as np
import pytest

from pliers_spark.multimodal import audio_frames, image_stats


def test_image_stats_plumbing(spark):
    rows = [(1, b"\x10" * 64), (2, b"\xff" * 256), (3, None)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r.id: r for r in image_stats(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2].mean_brightness == 1.0  # all-0xff payload → max brightness
    assert out[1].channels == 3
    r1a = image_stats(df).orderBy("id").collect()
    r1b = image_stats(df).orderBy("id").collect()
    assert r1a == r1b  # deterministic stub


def test_malformed_payloads_degrade_to_gate(spark):
    """A corrupt image payload must fall to the deterministic-fake gate,
    never crash the mapInPandas stage (ADVICE r3: truncated JPEG entropy
    data raises IndexError, corrupt headers raise KeyError/struct.error —
    all must be absorbed, not just ValueError)."""
    from pliers_spark import codecs

    good = codecs.encode_jpeg(np.full((16, 16), 128, dtype=np.uint8))
    rows = [
        (1, good[: len(good) // 2]),          # truncated mid-entropy JPEG
        (2, good[:20] + b"\x00" * 40),        # corrupt tables/header
        (3, b"\x89PNG\r\n\x1a\n" + b"\x00" * 12),  # truncated PNG
        (4, b"BM" + b"\x01" * 10),            # truncated BMP header
        (5, b"P6 trash"),                     # malformed PPM header
        (6, good),                            # control: valid JPEG
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r.id: r for r in image_stats(df).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}
    assert out[6].width == 16 and out[6].height == 16
    # degraded rows are deterministic (fake is a pure function of bytes)
    again = {r.id: r for r in image_stats(df).collect()}
    assert out == again


def test_audio_frames_framing(spark):
    n = 4096
    df = spark.createDataFrame([(7, bytes(range(256)) * (n // 256))], "id long, payload binary")
    out = audio_frames(df, frame=1024, hop=512, sr=16000).orderBy("frame").collect()
    assert len(out) == (n - 1024) // 512 + 1
    assert out[0].onset == 0.0 and out[1].onset == 512 / 16000
    assert all(abs(r.duration - 1024 / 16000) < 1e-9 for r in out)
    assert all(0.0 <= r.rms <= 1.01 for r in out)


def test_image_resize_plumbing(spark):
    from pliers_spark.multimodal import image_resize_stats

    df = spark.createDataFrame([(1, b"\x40" * 100), (2, b"\xff" * 30)], "id long, payload binary")
    out = {r.id: r for r in image_resize_stats(df, target_w=4, target_h=3).collect()}
    assert all((r.width, r.height, r.channels) == (4, 3, 3) for r in out.values())
    assert out[2].mean_brightness == 1.0


def test_video_frame_sample_every_nth(spark):
    from pliers_spark.multimodal import video_frame_sample

    payload = bytes(range(256)) * 2  # 512 bytes → 8 frames of 64
    df = spark.createDataFrame([(9, payload)], "id long, payload binary")
    out = video_frame_sample(df, every=2, fps=30.0).orderBy("frame").collect()
    assert [r.frame for r in out] == [0, 2, 4, 6]
    assert abs(out[1].onset - 2 / 30.0) < 1e-9
    assert all(r.width > 0 and r.height > 0 for r in out)


# ---------------------------------------------------------------------------
# round 2: real PPM/BMP/WAV codecs + formula-path image features on real bytes


class TestCodecs:
    def test_ppm_roundtrip(self):
        from pliers_spark import codecs

        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (5, 7, 3), dtype=np.uint8)
        assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(img)), img)

    def test_ppm_comments_and_whitespace(self):
        from pliers_spark import codecs

        img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
        data = b"P6 # comment\n# another\n 2\t2 \n255\n" + img.tobytes()
        assert np.array_equal(codecs.decode_ppm(data), img)

    def test_bmp_roundtrip_odd_width(self):
        from pliers_spark import codecs

        rng = np.random.RandomState(4)
        img = rng.randint(0, 256, (4, 5, 3), dtype=np.uint8)  # stride pad = 1
        assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(img)), img)

    def test_wav_roundtrip_16bit(self):
        from pliers_spark import codecs

        x = np.sin(np.linspace(0, 20, 400))
        data = codecs.encode_wav(x, sr=8000)
        y, sr = codecs.decode_wav(data)
        assert sr == 8000
        assert np.abs(y - x).max() < 1e-4  # 0.5 LSB quantize + 32767/32768 scale

    def test_wav_stereo_channel_average(self):
        from pliers_spark import codecs

        left = np.linspace(-0.5, 0.5, 100)
        right = -left
        data = codecs.encode_wav(np.stack([left, right], axis=1), sr=4000, channels=2)
        y, sr = codecs.decode_wav(data)
        # AudioStim mono rule: mean over channels → ~0 everywhere
        assert np.abs(y).max() < 1.0 / 16000

    def test_wav_8bit(self):
        from pliers_spark import codecs

        x = np.linspace(-1, 1, 50)
        y, sr = codecs.decode_wav(codecs.encode_wav(x, sr=1000, bits=8))
        assert np.abs(y - x).max() < 0.015  # 0.5 LSB + 127/128 scale

    def test_wav_24bit_roundtrip(self):
        from pliers_spark import codecs

        # dyadic samples k/2^23 survive the 24-bit round trip exactly,
        # including negative values (sign extension of the 3-byte ints)
        k = np.array([0, 1, -1, 8388607, -8388608, 12345, -54321], dtype=np.int64)
        x = k.astype(np.float64) / 8388608.0 * (8388607.0 / 8388608.0)
        y, sr = codecs.decode_wav(codecs.encode_wav(x, sr=48000, bits=24))
        assert sr == 48000
        assert np.abs(y - x).max() < 2.0 / 8388608.0
        # exact recovery for in-range dyadics
        v = np.array([0, 5, -5, 4194303, -4194304], dtype=np.int64)
        y2, _ = codecs.decode_wav(
            codecs.encode_wav(v.astype(np.float64) / 8388607.0, sr=8000, bits=24)
        )
        assert np.array_equal(np.rint(y2 * 8388608.0).astype(np.int64), v)

    def test_wav_float32_roundtrip_exact(self):
        from pliers_spark import codecs

        v = np.array([0, 1, -1, 32767, -32768, 12345], dtype=np.int64)
        x = v.astype(np.float64) / 65536.0  # exact in float32
        y, sr = codecs.decode_wav(codecs.encode_wav(x, sr=16000, bits=32))
        assert sr == 16000
        assert np.array_equal(y, x)  # bit-exact through format 3

    def test_wav_float64_decode(self):
        import struct

        from pliers_spark import codecs

        x = np.array([0.5, -0.25, 0.125])
        pcm = x.astype("<f8").tobytes()
        fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 8, 8, 64)
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
        wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        y, sr = codecs.decode_wav(wav)
        assert np.array_equal(y, x)


class TestRealDecodeFeatures:
    def test_image_features_match_numpy_on_real_ppm(self, spark):
        from pliers_spark import codecs
        from pliers_spark.multimodal import image_features

        rng = np.random.RandomState(11)
        imgs = [rng.randint(0, 256, (6, 8, 3), dtype=np.uint8) for _ in range(3)]
        df = spark.createDataFrame(
            [(i, bytearray(codecs.encode_ppm(im))) for i, im in enumerate(imgs)],
            "id long, payload binary",
        )
        got = {r["id"]: r for r in image_features(df).collect()}
        for i, im in enumerate(imgs):
            f = im.astype(np.float64)
            assert got[i]["brightness"] == pytest.approx(im.max(axis=2).mean() / 255.0)
            assert got[i]["vibrance"] == pytest.approx(f.var(axis=2).mean())
            # sharpness: reference quirk — BGR2GRAY weights on RGB data
            gray = np.clip(np.rint(0.299 * f[:, :, 2] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 0]), 0, 255)
            p = np.pad(gray, 1, mode="reflect")
            lap = p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:] - 4 * p[1:-1, 1:-1]
            assert got[i]["sharpness"] == pytest.approx(np.clip(np.abs(lap), 0, 255).max() / 255.0)

    def test_image_features_bmp_equals_ppm(self, spark):
        from pliers_spark import codecs
        from pliers_spark.multimodal import image_features

        rng = np.random.RandomState(12)
        img = rng.randint(0, 256, (3, 5, 3), dtype=np.uint8)
        df = spark.createDataFrame(
            [(0, bytearray(codecs.encode_ppm(img))), (1, bytearray(codecs.encode_bmp(img)))],
            "id long, payload binary",
        )
        rows = {r["id"]: r for r in image_features(df).collect()}
        assert rows[0]["brightness"] == rows[1]["brightness"]
        assert rows[0]["vibrance"] == rows[1]["vibrance"]
        assert rows[0]["sharpness"] == rows[1]["sharpness"]

    def test_audio_frames_real_wav_rms(self, spark):
        from pliers_spark import codecs
        from pliers_spark.multimodal import audio_frames

        x = np.sin(np.linspace(0, 60, 2000)) * 0.8
        wav = codecs.encode_wav(x, sr=16000)
        df = spark.createDataFrame([(7, bytearray(wav))], "id long, payload binary")
        out = audio_frames(df, frame=512, hop=256).collect()
        q, _ = codecs.decode_wav(wav)
        q = q.astype(np.float32)
        n_frames = (len(q) - 512) // 256 + 1
        assert len(out) == n_frames
        for r in out:
            seg = q[r["frame"] * 256 : r["frame"] * 256 + 512]
            assert r["rms"] == pytest.approx(float(np.sqrt((seg**2).mean())), rel=1e-6)
            assert r["onset"] == pytest.approx(r["frame"] * 256 / 16000)


class TestImageCrop:
    def test_explicit_box(self, spark):
        from pliers_spark import codecs
        from pliers_spark.multimodal import image_crop_stats

        rng = np.random.RandomState(5)
        img = rng.randint(1, 256, (8, 10, 3), dtype=np.uint8)
        df = spark.createDataFrame([(0, bytearray(codecs.encode_ppm(img)))], "id long, payload binary")
        r = image_crop_stats(df, box=(2, 1, 7, 5)).first()
        sub = img[1:5, 2:7]
        assert (r["width"], r["height"]) == (5, 4)
        assert r["mean_brightness"] == pytest.approx(sub.max(axis=2).mean() / 255.0)

    def test_auto_trim_black_borders(self, spark):
        from pliers_spark import codecs
        from pliers_spark.multimodal import image_crop_stats

        img = np.zeros((9, 9, 3), dtype=np.uint8)
        img[3:6, 2:8] = 200  # bright block inside black borders
        df = spark.createDataFrame([(1, bytearray(codecs.encode_ppm(img)))], "id long, payload binary")
        r = image_crop_stats(df).first()
        assert (r["x0"], r["y0"], r["x1"], r["y1"]) == (2, 3, 8, 6)
        assert (r["width"], r["height"]) == (6, 3)
        assert r["mean_brightness"] == pytest.approx(200 / 255.0)

    def test_all_black_null(self, spark):
        from pliers_spark import codecs
        from pliers_spark.multimodal import image_crop_stats

        img = np.zeros((4, 4, 3), dtype=np.uint8)
        df = spark.createDataFrame([(2, bytearray(codecs.encode_ppm(img)))], "id long, payload binary")
        r = image_crop_stats(df).first()
        assert r["width"] == 0 and r["mean_brightness"] is None


class TestWavFrameStats:
    def test_int16_encode_is_exact_passthrough(self):
        from pliers_spark.codecs import decode_wav, encode_wav_int16

        v = np.array([-32768, -1, 0, 1, 32767, 12345], dtype=np.int64)
        samples, sr = decode_wav(encode_wav_int16(v, sr=8000))
        assert sr == 8000
        # /32768 is a power-of-two scale: multiplying back is bit-exact
        assert (np.rint(samples * 32768.0).astype(np.int64) == v).all()

    def test_frame_stats_exact_integers(self, spark):
        from pliers_spark.codecs import encode_wav_int16
        from pliers_spark.multimodal import wav_frame_stats

        i = np.arange(300, dtype=np.int64)
        v = ((7 * 7919 + i * 104729) % 65536) - 32768
        df = spark.createDataFrame([(7, bytearray(encode_wav_int16(v, sr=8000)))],
                                   "id long, payload binary")
        rows = {r["frame"]: r for r in wav_frame_stats(df, frame=128, hop=64).collect()}
        assert set(rows) == {0, 1, 2}
        for k, r in rows.items():
            seg = v[k * 64 : k * 64 + 128]
            nonneg = seg >= 0
            assert r["sum_sq"] == int((seg * seg).sum())
            assert r["sum_abs"] == int(np.abs(seg).sum())
            assert r["n_crossings"] == int((nonneg[1:] != nonneg[:-1]).sum())
            assert r["onset"] == k * 64 / 8000
            assert r["duration"] == 128 / 8000


class TestPerceptualDedup:
    def test_image_dhash_brightness_invariant(self, spark):
        """The dedup key must collide brightness-shifted copies and
        separate genuinely different patterns — the invariance claim
        the image_dhash_dups oracle certifies only implicitly."""
        from pliers_spark.codecs import encode_ppm
        from pliers_spark.multimodal import image_dhash

        r = np.arange(8)[:, None, None]
        c = np.arange(8)[None, :, None]
        ch = np.arange(3)[None, None, :]
        base = ((r * 17 + c * 5 + ch * 29) % 200).astype(np.int64)
        other = ((r * 31 + c * 13 + ch * 7) % 200).astype(np.int64)
        df = spark.createDataFrame(
            [
                (1, bytearray(encode_ppm(base.astype(np.uint8)))),
                (2, bytearray(encode_ppm((base + 50).astype(np.uint8)))),  # shifted copy
                (3, bytearray(encode_ppm(other.astype(np.uint8)))),
            ],
            "id long, payload binary",
        )
        h = {r_["id"]: r_["dhash"] for r_ in image_dhash(df).collect()}
        assert h[1] == h[2]          # uniform brightness shift collides
        assert h[1] != h[3]          # different pattern separates
        assert 0 <= h[1] < (1 << 56)  # 9x7 grid -> 56 bits, sign-safe

    def test_audio_fingerprint_gain_invariant(self, spark):
        from pliers_spark.codecs import encode_wav_int16
        from pliers_spark.multimodal import audio_fingerprint

        i = np.arange(600, dtype=np.int64)
        base = ((i * 104729) % 200) - 100
        other = ((i * 7919) % 200) - 100
        df = spark.createDataFrame(
            [
                (1, bytearray(encode_wav_int16(base, sr=8000))),
                (2, bytearray(encode_wav_int16(base * 3, sr=8000))),  # gain x3
                (3, bytearray(encode_wav_int16(other, sr=8000))),
            ],
            "id long, payload binary",
        )
        h = {r["id"]: r["afp"] for r in audio_fingerprint(df, frame=64, hop=32).collect()}
        assert h[1] == h[2]  # integer gain scales every energy by g^2: order preserved
        assert h[1] != h[3]


# ---------------------------------------------------------------------------
# round 2 (cont): real PNG codec — stdlib-zlib DEFLATE + filter reconstruction


class TestPngCodec:
    def test_rgb_roundtrip(self):
        from pliers_spark import codecs

        rng = np.random.RandomState(11)
        for shape in [(1, 1, 3), (8, 8, 3), (9, 7, 3)]:
            img = rng.randint(0, 256, shape, dtype=np.uint8)
            data = codecs.encode_png(img)
            assert codecs.sniff_image(data) == "png"
            assert np.array_equal(codecs.decode_png(data), img)

    def test_gray_and_rgba_roundtrip(self):
        from pliers_spark import codecs

        rng = np.random.RandomState(12)
        gray = rng.randint(0, 256, (6, 4), dtype=np.uint8)
        assert np.array_equal(codecs.decode_png(codecs.encode_png(gray))[:, :, 0], gray)
        rgba = rng.randint(0, 256, (5, 13, 4), dtype=np.uint8)
        assert np.array_equal(codecs.decode_png(codecs.encode_png(rgba)), rgba)

    def test_all_filter_types_against_independent_unfilter(self):
        """Hand-built IDAT exercising filters 0/1/3/4 (encode_png only
        emits 0/2), checked against a from-the-spec pure-Python
        unfilter written independently of the numpy implementation."""
        import struct
        import zlib

        from pliers_spark import codecs

        def build(h, w, ch, rows):
            ct = {1: 0, 3: 2, 4: 6}[ch]
            ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
            body = b"".join(bytes([f]) + r for f, r in rows)
            return (
                codecs.PNG_SIG
                + codecs._png_chunk(b"IHDR", ihdr)
                + codecs._png_chunk(b"IDAT", zlib.compress(body))
                + codecs._png_chunk(b"IEND", b"")
            )

        def ref_decode(h, w, ch, rows):
            stride = w * ch
            prev = [0] * stride
            out = []
            for f, r in rows:
                cur = list(r)
                rec = [0] * stride
                for x in range(stride):
                    a = rec[x - ch] if x >= ch else 0
                    b = prev[x]
                    c = prev[x - ch] if x >= ch else 0
                    if f == 0:
                        pred = 0
                    elif f == 1:
                        pred = a
                    elif f == 2:
                        pred = b
                    elif f == 3:
                        pred = (a + b) // 2
                    else:
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    rec[x] = (cur[x] + pred) & 0xFF
                out.append(rec)
                prev = rec
            return np.array(out, dtype=np.uint8).reshape(h, w, ch)

        rng = np.random.RandomState(13)
        h, w, ch = 4, 5, 3
        rows = [
            (f, bytes(rng.randint(0, 256, w * ch, dtype=np.uint8)))
            for f in (0, 1, 3, 4)
        ]
        got = codecs.decode_png(build(h, w, ch, rows))
        want = ref_decode(h, w, ch, rows)
        assert np.array_equal(got, want)

    def test_split_idat_chunks(self):
        """Multiple IDAT chunks are one continuous zlib stream (spec §5.6)."""
        import struct
        import zlib

        from pliers_spark import codecs

        img = np.arange(3 * 2 * 3, dtype=np.uint8).reshape(3, 2, 3)
        body = b"".join(b"\x00" + img[y].tobytes() for y in range(3))
        z = zlib.compress(body)
        ihdr = struct.pack(">IIBBBBB", 2, 3, 8, 2, 0, 0, 0)
        data = (
            codecs.PNG_SIG
            + codecs._png_chunk(b"IHDR", ihdr)
            + codecs._png_chunk(b"IDAT", z[: len(z) // 2])
            + codecs._png_chunk(b"IDAT", z[len(z) // 2 :])
            + codecs._png_chunk(b"IEND", b"")
        )
        assert np.array_equal(codecs.decode_png(data), img)

    def test_image_stats_png_equals_ppm(self, spark):
        from pliers_spark import codecs

        rng = np.random.RandomState(14)
        img = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
        df = spark.createDataFrame(
            [(1, bytearray(codecs.encode_png(img))), (2, bytearray(codecs.encode_ppm(img)))],
            "id long, payload binary",
        )
        rows = {r["id"]: r for r in image_stats(df).collect()}
        assert rows[1]["mean_brightness"] == rows[2]["mean_brightness"]
        assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == (8, 8, 3)


# ---------------------------------------------------------------------------
# video motion (block-matching optical-flow role)


def test_video_motion_recovers_known_shift(spark):
    from pliers_spark import codecs
    from pliers_spark.multimodal import video_motion

    rng = np.random.RandomState(21)
    base = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
    shifts = [(0, 0), (1, -2), (-1, 0)]  # absolute shift of each frame
    frames = [
        codecs.encode_ppm(np.roll(base, s, axis=(0, 1))) for s in shifts
    ]
    fb = len(frames[0])
    df = spark.createDataFrame(
        [(7, bytearray(b"".join(frames)))], "id long, payload binary"
    )
    out = {r["frame"]: r for r in video_motion(df, frame_bytes=fb, search=2).collect()}
    assert len(out) == 2
    # frame k's motion relative to k-1 is the shift delta, SAD exactly 0
    assert (out[1]["dy"], out[1]["dx"], out[1]["sad"]) == (1, -2, 0)
    assert (out[2]["dy"], out[2]["dx"], out[2]["sad"]) == (-2, 2, 0)


def test_image_saliency_hand_computed(spark):
    """Hand-computed pins for the round-3 SaliencyExtractor counterpart.

    Uniform image (all 100s, intensity 300, S=19200, N=64): interior
    cs=2700 -> sal=0; corners cs=1200 -> sal=|1200*64-9*19200|=96000
    (the zero padding makes borders salient); edges cs=1800 -> 57600.
    max at the first corner (0,0); q = {corners:255, edges:153,
    interior:0}; Otsu splits 36 zeros from the 28 border pixels.

    Single bright pixel at (2,3) (intensity 765, S=765): every pixel of
    the 3x3 block around the spot has cs=765 -> sal=765*55=42075; the
    rest cs=0 -> sal=9*765=6885. First row-major max is the block's
    top-left corner (1,2); q={block:255, rest:42}; Otsu isolates the 9
    block pixels."""
    from pliers_spark import codecs
    from pliers_spark.multimodal import image_saliency_stats

    flat = np.full((8, 8, 3), 100, dtype=np.uint8)
    spot = np.zeros((8, 8, 3), dtype=np.uint8)
    spot[2, 3] = 255
    df = spark.createDataFrame(
        [(0, bytearray(codecs.encode_png(flat))),
         (1, bytearray(codecs.encode_png(spot)))],
        "id long, payload binary",
    )
    out = {r["id"]: r for r in image_saliency_stats(df).collect()}

    r0 = out[0]
    assert (r0.max_y, r0.max_x) == (0, 0)
    assert r0.max_saliency == round(96000 / (2295.0 * 64), 6)  # 0.653595
    assert r0.frac_high_saliency == round(28 / 64, 6)  # 0.4375

    r1 = out[1]
    assert (r1.max_y, r1.max_x) == (1, 2)
    assert r1.max_saliency == round(42075 / (2295.0 * 64), 6)  # 0.286458
    assert r1.frac_high_saliency == round(9 / 64, 6)


class TestJpegCodec:
    """Round-3 baseline-JPEG codec (ITU T.81 sequential DCT, grayscale)."""

    def test_roundtrip_error_bounded_and_shrinks_with_quality(self):
        from pliers_spark import codecs

        rng = np.random.RandomState(3)
        x = rng.randint(0, 256, (24, 17), dtype=np.uint8)  # non-multiple of 8
        prev = None
        for q in (30, 50, 75, 90):
            data = codecs.encode_jpeg(x, quality=q)
            assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
            y = codecs.decode_jpeg(data)
            assert y.shape == (24, 17, 1)
            err = float(np.abs(x.astype(int) - y[:, :, 0].astype(int)).mean())
            if prev is not None:
                assert err <= prev + 1e-9  # quality up -> error down
            prev = err
        assert err < 8.0  # q90 mean error on worst-case noise

    def test_smooth_image_high_quality_near_lossless(self):
        from pliers_spark import codecs

        r = np.arange(32)[:, None]
        c = np.arange(32)[None, :]
        x = ((r * 3 + c * 2) % 200 + 20).astype(np.uint8)
        y = codecs.decode_jpeg(codecs.encode_jpeg(x, quality=95))[:, :, 0]
        assert int(np.abs(x.astype(int) - y.astype(int)).max()) <= 4

    def test_constant_block_closed_form_all_values(self):
        """The DC-only round trip at quality 50 (Q0=16) must equal
        clip(2*round_half_even((v-128)/2)+128) for every v — the exact
        contract the jpeg_decode_stats oracle recomputes relationally."""
        import decimal

        from pliers_spark import codecs

        for v in range(256):
            flat = np.full((8, 8), v, dtype=np.uint8)
            y = codecs.decode_jpeg(codecs.encode_jpeg(flat, 50))[:, :, 0]
            q = int(
                (decimal.Decimal(v - 128) / 2).quantize(
                    0, rounding=decimal.ROUND_HALF_EVEN
                )
            )
            exp = min(255, max(0, 2 * q + 128))
            assert (y == exp).all(), (v, int(y[0, 0]), exp)

    def test_rgb_input_uses_rec601_luma(self):
        from pliers_spark import codecs

        x = np.zeros((8, 8, 3), dtype=np.uint8)
        x[:, :, 1] = 200  # pure green: luma = (587*200+500)//1000 = 117
        y = codecs.decode_jpeg(codecs.encode_jpeg(x, 50))[:, :, 0]
        # closed form: 117 -> v'=-11 -> 2*round_even(-5.5)+128 = 116
        assert (y == 116).all()

    def test_sniff_and_decode_image_path(self):
        from pliers_spark import codecs
        from pliers_spark.multimodal import _decode_image

        x = np.full((9, 5), 64, dtype=np.uint8)
        data = codecs.encode_jpeg(x, 50)
        assert codecs.sniff_image(data) == "jpeg"
        img = _decode_image(data)
        assert img.shape == (9, 5, 3)
        assert (img == 64).all()  # 64 even -> exact

    def test_rejects_non_baseline(self):
        from pliers_spark import codecs

        with pytest.raises(ValueError):
            codecs.decode_jpeg(b"\x89PNG")
        # flipping SOF0->SOF2 on a sequential stream yields an invalid
        # progressive scan header (DC scan with Se=63) -> refused
        bad = bytearray(codecs.encode_jpeg(np.zeros((8, 8), np.uint8)))
        i = bad.find(b"\xff\xc0")
        bad[i + 1] = 0xC2
        with pytest.raises(ValueError):
            codecs.decode_jpeg(bytes(bad))


class TestBilinearResize:
    """Round-3 real-interpolation path for ImageResizingFilter."""

    def test_identity_and_constant(self):
        from pliers_spark.multimodal import resize_bilinear

        img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
        assert np.array_equal(resize_bilinear(img, 8, 8), img)
        flat = np.full((6, 9, 3), 77, np.uint8)
        assert (resize_bilinear(flat, 2, 4) == 77).all()

    def test_matches_independent_float_bilinear(self):
        """Hand formulation with plain float arithmetic (half-pixel
        centers, edge clamp), independent of the integer-numerator
        implementation."""
        from pliers_spark.multimodal import resize_bilinear

        rng = np.random.RandomState(8)
        img = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
        th, tw = 3, 5
        got = resize_bilinear(img, th, tw)
        for i in range(th):
            for j in range(tw):
                sy = min(max((i + 0.5) * 8 / th - 0.5, 0.0), 7.0)
                sx = min(max((j + 0.5) * 8 / tw - 0.5, 0.0), 7.0)
                y0, x0 = int(np.floor(sy)), int(np.floor(sx))
                y1, x1 = min(y0 + 1, 7), min(x0 + 1, 7)
                fy, fx = sy - y0, sx - x0
                for ch in range(3):
                    v = ((1 - fy) * ((1 - fx) * img[y0, x0, ch] + fx * img[y0, x1, ch])
                         + fy * ((1 - fx) * img[y1, x0, ch] + fx * img[y1, x1, ch]))
                    assert abs(float(got[i, j, ch]) - v) <= 0.5 + 1e-9

    def test_upscale_interpolates_between_pixels(self):
        from pliers_spark.multimodal import resize_bilinear

        img = np.zeros((2, 2, 3), dtype=np.uint8)
        img[:, 1] = 100
        up = resize_bilinear(img, 2, 4)
        # centers at sx = -0.25, 0.25, 0.75, 1.25 -> clamp, 0.25, 0.75, clamp
        assert list(up[0, :, 0]) == [0, 25, 75, 100]


class TestJpegColor:
    """Round-3 continuation: 3-component YCbCr 4:4:4 baseline JPEG."""

    def test_color_roundtrip_smooth_image(self):
        from pliers_spark import codecs

        r = np.arange(24)[:, None]
        c = np.arange(19)[None, :]
        img = np.stack(
            [(r * 3 + c * 2) % 200 + 20, (r * 2 + c * 5) % 180 + 30,
             (r + c) % 150 + 40], axis=2,
        ).astype(np.uint8)
        out = codecs.decode_jpeg(codecs.encode_jpeg(img, 95, mode="color"))
        assert out.shape == (24, 19, 3)
        assert int(np.abs(img.astype(int) - out.astype(int)).max()) <= 6

    def test_color_constant_image_near_exact(self):
        from pliers_spark import codecs

        img = np.zeros((8, 8, 3), dtype=np.uint8)
        img[:] = (200, 50, 100)
        out = codecs.decode_jpeg(codecs.encode_jpeg(img, 90, mode="color"))
        # constant blocks: only DC survives in each plane; the double
        # color transform costs at most a couple of counts per channel
        assert (np.abs(out.astype(int) - img.astype(int)) <= 3).all()
        assert len(np.unique(out.reshape(-1, 3), axis=0)) == 1

    def test_decode_image_contract_color(self):
        from pliers_spark import codecs
        from pliers_spark.multimodal import _decode_image

        img = np.stack(
            [np.full((9, 5), 200, np.uint8), np.full((9, 5), 50, np.uint8),
             np.full((9, 5), 100, np.uint8)], axis=2,
        )
        d = _decode_image(codecs.encode_jpeg(img, 90, mode="color"))
        assert d.shape == (9, 5, 3)  # never HxWx9 (repeat only for gray)
        assert (np.abs(d.astype(int) - img.astype(int)) <= 3).all()

    def test_color_needs_three_channels(self):
        from pliers_spark import codecs

        with pytest.raises(ValueError):
            codecs.encode_jpeg(np.zeros((8, 8), np.uint8), mode="color")

    def test_ycbcr_transform_inverts(self):
        from pliers_spark.codecs import _rgb_to_ycbcr, _ycbcr_to_rgb

        rng = np.random.RandomState(9)
        img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
        y, cb, cr = _rgb_to_ycbcr(img)
        back = _ycbcr_to_rgb(y, cb, cr)
        # one quantization round trip: off by at most 2 counts
        assert int(np.abs(back.astype(int) - img.astype(int)).max()) <= 2


class TestJpeg420:
    """4:2:0 chroma subsampling — the layout real-world JPEGs use."""

    def test_roundtrip_odd_dims(self):
        from pliers_spark import codecs

        r = np.arange(24)[:, None]
        c = np.arange(19)[None, :]
        img = np.stack(
            [(r * 3 + c * 2) % 200 + 20, (r * 2 + c * 5) % 180 + 30,
             (r + c) % 150 + 40], axis=2,
        ).astype(np.uint8)  # 24x19: exercises MCU padding and chroma crop
        out = codecs.decode_jpeg(codecs.encode_jpeg(img, 95, mode="color420"))
        assert out.shape == (24, 19, 3)
        assert int(np.abs(img.astype(int) - out.astype(int)).max()) <= 12

    def test_constant_color_near_exact(self):
        from pliers_spark import codecs

        img = np.zeros((20, 13, 3), np.uint8)
        img[:] = (180, 60, 90)
        out = codecs.decode_jpeg(codecs.encode_jpeg(img, 90, mode="color420"))
        assert (np.abs(out.astype(int) - img.astype(int)) <= 2).all()

    def test_smaller_than_444(self):
        from pliers_spark import codecs

        rng = np.random.RandomState(5)
        img = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
        b444 = codecs.encode_jpeg(img, 75, mode="color")
        b420 = codecs.encode_jpeg(img, 75, mode="color420")
        assert len(b420) < len(b444)  # half the chroma blocks

    def test_box_downsample_hand_values(self):
        from pliers_spark.codecs import _box_downsample

        p = np.array([[0, 2, 4], [6, 8, 10]], dtype=np.uint8)
        d = _box_downsample(p, 2, 2)
        # boxes: [[0,2],[6,8]] mean 4; [[4,4],[10,10]] (edge-replicated col) mean 7
        assert d.tolist() == [[4, 7]]

    def test_decode_image_handles_420(self):
        from pliers_spark import codecs
        from pliers_spark.multimodal import _decode_image

        img = np.zeros((9, 5, 3), np.uint8)
        img[:] = (200, 50, 100)
        d = _decode_image(codecs.encode_jpeg(img, 90, mode="color420"))
        assert d.shape == (9, 5, 3)
        assert (np.abs(d.astype(int) - img.astype(int)) <= 3).all()


class TestJpegProgressive:
    """Spectral-selection progressive JPEG (SOF2, DC scan + per-component
    AC band scans with EOB-run codes)."""

    def test_gray_progressive_decodes_identical_to_sequential(self):
        from pliers_spark import codecs

        rng = np.random.RandomState(3)
        x = rng.randint(0, 256, (24, 17), dtype=np.uint8)
        seq = codecs.decode_jpeg(codecs.encode_jpeg(x, 80))
        prog = codecs.decode_jpeg(codecs.encode_jpeg(x, 80, mode="progressive"))
        # same quantized coefficients, different scan order -> same pixels
        assert np.array_equal(seq, prog)

    def test_color_progressive_decodes_identical_to_sequential(self):
        from pliers_spark import codecs

        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, (16, 11, 3), dtype=np.uint8)
        seq = codecs.decode_jpeg(codecs.encode_jpeg(img, 85, mode="color"))
        prog = codecs.decode_jpeg(
            codecs.encode_jpeg(img, 85, mode="progressive_color")
        )
        assert np.array_equal(seq, prog)

    def test_eobrun_exercised_by_sparse_image(self):
        from pliers_spark import codecs

        # mostly-flat image: nearly every block is DC-only, so the AC
        # scans compress to EOB runs spanning many blocks
        x = np.full((64, 64), 90, dtype=np.uint8)
        x[5, 7] = 200  # one busy block
        data = codecs.encode_jpeg(x, 75, mode="progressive")
        y = codecs.decode_jpeg(data)
        seq = codecs.decode_jpeg(codecs.encode_jpeg(x, 75))
        assert np.array_equal(y, seq)
        # the run-coded AC scan must be much smaller than per-block EOBs
        assert len(data) < len(codecs.encode_jpeg(x, 75)) + 200

    def test_successive_approximation_refused(self):
        from pliers_spark import codecs

        data = bytearray(codecs.encode_jpeg(np.zeros((8, 8), np.uint8), mode="progressive"))
        # patch the DC scan header's Ah/Al byte (last byte of first SOS body)
        i = data.find(b"\xff\xda")
        ln = int.from_bytes(data[i + 2:i + 4], "big")
        data[i + 2 + ln - 1] = 0x11  # Ah=1, Al=1
        with pytest.raises(ValueError, match="successive"):
            codecs.decode_jpeg(bytes(data))

    def test_decode_image_contract_progressive(self):
        from pliers_spark import codecs
        from pliers_spark.multimodal import _decode_image

        img = np.zeros((9, 5, 3), np.uint8)
        img[:] = (200, 50, 100)
        d = _decode_image(codecs.encode_jpeg(img, 90, mode="progressive_color"))
        assert d.shape == (9, 5, 3)
        assert (np.abs(d.astype(int) - img.astype(int)) <= 3).all()


class TestJpegSuccessiveApproximation:
    """Successive-approximation progressive JPEG (libjpeg-style script:
    DC first at Al=1, DC refinement, per-component AC first at Al=1 and
    AC refinement with interleaved correction bits)."""

    def test_sa_decodes_identical_to_sequential_stress(self):
        """The two-stage approximation must reconstruct the exact
        quantized coefficients, so decoding equals the sequential
        encoding bit-for-bit — stressed over random images, qualities
        spanning sparse (low q: EOB-region corrections) to dense
        (high q: long refinement runs, ZRL segments), and both modes."""
        from pliers_spark import codecs

        rng = np.random.RandomState(17)
        for trial in range(12):
            q = [20, 50, 80, 95][trial % 4]
            if trial % 2:
                img = rng.randint(0, 256, (17, 23, 3), dtype=np.uint8)
                seq = codecs.decode_jpeg(codecs.encode_jpeg(img, q, mode="color"))
                sa = codecs.decode_jpeg(
                    codecs.encode_jpeg(img, q, mode="progressive_sa_color")
                )
            else:
                img = rng.randint(0, 256, (23, 17), dtype=np.uint8)
                seq = codecs.decode_jpeg(codecs.encode_jpeg(img, q))
                sa = codecs.decode_jpeg(codecs.encode_jpeg(img, q, mode="progressive_sa"))
            assert np.array_equal(seq, sa), (trial, q)

    def test_sa_smooth_gradient_and_sparse(self):
        from pliers_spark import codecs

        r = np.arange(40)[:, None]
        c = np.arange(33)[None, :]
        grad = ((r * 5 + c * 3) % 256).astype(np.uint8)
        assert np.array_equal(
            codecs.decode_jpeg(codecs.encode_jpeg(grad, 70)),
            codecs.decode_jpeg(codecs.encode_jpeg(grad, 70, mode="progressive_sa")),
        )
        flat = np.full((64, 64), 90, np.uint8)
        flat[5, 7] = 200
        assert np.array_equal(
            codecs.decode_jpeg(codecs.encode_jpeg(flat, 75)),
            codecs.decode_jpeg(codecs.encode_jpeg(flat, 75, mode="progressive_sa")),
        )

    def test_sa_file_advertises_approximation_scans(self):
        from pliers_spark import codecs

        data = codecs.encode_jpeg(np.zeros((8, 8), np.uint8), mode="progressive_sa")
        # SOF2 + four SOS scans (DC first/refine, AC first/refine)
        assert b"\xff\xc2" in data
        assert data.count(b"\xff\xda") == 4

    def test_invalid_approximation_sequence_refused(self):
        from pliers_spark import codecs

        data = bytearray(codecs.encode_jpeg(np.zeros((8, 8), np.uint8), mode="progressive_sa"))
        # corrupt the DC refinement scan header: Ah=2 with Al=0 (Ah must be Al+1)
        i = data.find(b"\xff\xda")
        i = data.find(b"\xff\xda", i + 2)  # second SOS = DC refine
        ln = int.from_bytes(data[i + 2:i + 4], "big")
        data[i + 2 + ln - 1] = 0x20
        with pytest.raises(ValueError, match="Ah must equal Al"):
            codecs.decode_jpeg(bytes(data))


class TestPngAdam7:
    """Adam7-interlaced PNG (PNG spec §8.2) — seven independently
    filtered sub-images scattered onto the pass grids."""

    def test_roundtrip_all_shapes_and_channels(self):
        from pliers_spark import codecs

        rng = np.random.RandomState(5)
        for shape in [(13, 9), (13, 9, 3), (8, 8, 4), (1, 1, 3), (2, 3),
                      (9, 1, 3), (1, 9), (16, 16, 3)]:
            img = rng.randint(0, 256, shape, dtype=np.uint8)
            dec = codecs.decode_png(codecs.encode_png_interlaced(img))
            ref = img[:, :, None] if img.ndim == 2 else img
            assert np.array_equal(dec, ref), shape

    def test_interlaced_equals_noninterlaced_decode(self):
        from pliers_spark import codecs

        rng = np.random.RandomState(6)
        img = rng.randint(0, 256, (21, 17, 3), dtype=np.uint8)
        a = codecs.decode_png(codecs.encode_png(img))
        b = codecs.decode_png(codecs.encode_png_interlaced(img))
        assert np.array_equal(a, b)

    def test_empty_passes_small_images(self):
        """A 1x1 image has bytes only in pass 1; 2x1 only passes 1 and 6
        contribute — empty passes must contribute zero bytes (spec)."""
        from pliers_spark import codecs

        one = np.array([[[7, 8, 9]]], dtype=np.uint8)
        assert np.array_equal(codecs.decode_png(codecs.encode_png_interlaced(one)), one)
        two = np.array([[[1, 2, 3], [4, 5, 6]]], dtype=np.uint8)
        assert np.array_equal(codecs.decode_png(codecs.encode_png_interlaced(two)), two)

    def test_unknown_interlace_method_refused(self):
        from pliers_spark import codecs

        data = bytearray(codecs.encode_png(np.zeros((4, 4, 3), np.uint8)))
        # IHDR body starts at offset 16; interlace byte is body[12]
        data[16 + 12] = 2
        # corrupting IHDR breaks its CRC too, but the decoder reads
        # fields positionally — the interlace check must fire
        with pytest.raises(ValueError, match="interlace"):
            codecs.decode_png(bytes(data))

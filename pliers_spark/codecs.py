"""Pure-numpy binary codecs: PPM (P6), BMP (24-bit BI_RGB), WAV (PCM),
PNG (8-bit gray/RGB/RGBA, interlaced and non-interlaced).

The reference decodes stimuli with imageio/PIL/librosa
(pliers/stimuli/image.py:15, pliers/stimuli/audio.py:9-84); none of
those are in this container, so the engine ships real decoders for the
simplest public container formats — enough to exercise the
Brightness/Vibrance/Sharpness and framed-audio formula paths on REAL
bytes end-to-end instead of a stand-in. PNG needs only DEFLATE, which
ships in the Python stdlib (`zlib`), so it gets a full real codec too.
JPEG gets a from-scratch ITU T.81 implementation: baseline sequential
(gray / 4:4:4 / 4:2:0) AND full progressive — spectral selection plus
successive approximation (DC/AC first + refinement scans). Only MP3
remains behind the import-gated path.

All are published byte layouts:
- PPM P6: netpbm format spec (ASCII header, raw RGB rows).
- BMP: BITMAPFILEHEADER/BITMAPINFOHEADER, 24bpp uncompressed,
  bottom-up BGR rows padded to 4 bytes.
- WAV: RIFF/WAVE with a PCM ``fmt `` chunk; 8-bit unsigned or
  16-bit signed little-endian samples, interleaved channels.
- PNG: W3C PNG spec / RFC 2083 — signature, length-type-data-CRC
  chunks, IHDR/IDAT/IEND, zlib-wrapped scanlines with per-row
  filters 0-4 (None/Sub/Up/Average/Paeth).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


# --------------------------------------------------------------------------
# PPM (P6 binary)


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_ppm expects HxWx3 uint8")
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """P6 → HxWx3 uint8. Header tokens may be separated by any
    whitespace and ``#`` comments (netpbm spec)."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    need = h * w * 3
    raw = data[pos : pos + need]
    if len(raw) < need:
        raise ValueError("truncated PPM payload")
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).copy()


# --------------------------------------------------------------------------
# BMP (24-bit uncompressed BI_RGB)


def encode_bmp(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_bmp expects HxWx3 uint8 (RGB)")
    h, w, _ = img.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up rows
        body += img[y, :, ::-1].tobytes()  # RGB → BGR
        body += b"\x00" * pad
    offset = 14 + 40
    size = offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """24bpp BI_RGB BMP → HxWx3 uint8 RGB. Handles bottom-up (positive
    height) and top-down (negative height) row order."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24bpp BI_RGB supported (bpp={bpp}, comp={compression})")
    top_down = h_raw < 0
    h = abs(h_raw)
    row = w * 3
    stride = row + ((-row) % 4)
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        y = i if top_down else h - 1 - i
        line = np.frombuffer(data, dtype=np.uint8, count=row, offset=offset + i * stride)
        out[y] = line.reshape(w, 3)[:, ::-1]  # BGR → RGB
    return out


# --------------------------------------------------------------------------
# WAV (RIFF PCM)


def encode_wav(samples: np.ndarray, sr: int, bits: int = 16, channels: int = 1) -> bytes:
    """float samples in [-1, 1] → WAV bytes. Multi-channel input is
    (n, channels); mono is 1-D. ``bits``: 8/16/24 = integer PCM
    (format 1); 32 = IEEE float32 (format 3, the float WAV every DAW
    exports)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    if x.shape[1] != channels:
        raise ValueError(f"expected {channels} channels, got {x.shape[1]}")
    audio_format = 1
    if bits == 16:
        pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2").tobytes()
    elif bits == 8:
        pcm = np.clip(np.round(x * 127.0 + 128.0), 0, 255).astype(np.uint8).tobytes()
    elif bits == 24:
        ints = np.clip(np.round(x * 8388607.0), -8388608, 8388607).astype("<i4")
        # little-endian 3-byte packing: drop the high byte of each int32
        pcm = ints.view(np.uint8).reshape(-1, 4)[:, :3].tobytes()
    elif bits == 32:
        audio_format = 3
        pcm = x.astype("<f4").tobytes()
    else:
        raise ValueError("bits must be 8, 16, 24 or 32 (float)")
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", audio_format, channels, sr, sr * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def encode_wav_int16(samples: np.ndarray, sr: int) -> bytes:
    """int16 PCM samples → mono WAV bytes, no float round trip: the
    payload carries the exact integers, so ``decode_wav`` (which divides
    by 32768, a power of two) recovers them bit-exactly — the property
    integer-exact oracles rely on."""
    pcm = np.asarray(samples).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (mono float64 samples, sampling_rate). Multi-channel is
    channel-averaged to mono exactly like the reference's AudioStim
    (pliers/stimuli/audio.py:48-52: ``data.mean(axis=1)``)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        clen = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + clen + (clen % 2)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sr, _, _, bits = fmt
    if audio_format == 1:
        if bits == 16:
            x = np.frombuffer(pcm, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 8:
            x = (np.frombuffer(pcm, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 24:
            b3 = np.frombuffer(pcm, dtype=np.uint8)
            b3 = b3[: (len(b3) // 3) * 3].reshape(-1, 3).astype(np.int64)
            ints = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
            ints = np.where(ints >= 1 << 23, ints - (1 << 24), ints)
            x = ints.astype(np.float64) / 8388608.0
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(pcm, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(pcm, dtype="<f8").astype(np.float64)
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
    else:
        raise ValueError(f"only PCM/IEEE-float supported (format={audio_format})")
    if channels > 1:
        n = len(x) // channels
        x = x[: n * channels].reshape(n, channels).mean(axis=1)
    return x, sr


# --------------------------------------------------------------------------
# PNG (8-bit depth, color types 0=gray / 2=RGB / 6=RGBA, interlace 0)

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


# Adam7 pass grids (PNG spec §8.2): (x origin, y origin, x step, y step)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def encode_png_interlaced(img: np.ndarray, level: int = 6) -> bytes:
    """Adam7-interlaced PNG encode (filter 0 rows in every pass) — the
    round-trip partner for the interlaced decode path; real-world
    interlaced files come from any standard encoder."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype_by_ch = {1: 0, 3: 2, 4: 6}
    if ch not in ctype_by_ch:
        raise ValueError(f"encode_png_interlaced expects 1/3/4 channels, got {ch}")
    lines = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for row in sub.reshape(sub.shape[0], sub.shape[1] * ch):
            lines += b"\x00" + row.tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_by_ch[ch], 0, 0, 1)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), level))
        + _png_chunk(b"IEND", b"")
    )


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA) uint8 → PNG bytes.

    Writes filter type 2 (Up) on every row after the first and 0 (None)
    on row 0 — valid per spec, cheap to produce (one vectorized byte
    subtraction), and it exercises a real filter on decode."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype_by_ch = {1: 0, 3: 2, 4: 6}
    if ch not in ctype_by_ch:
        raise ValueError(f"encode_png expects 1/3/4 channels, got {ch}")
    flat = img.reshape(h, w * ch).astype(np.int16)
    lines = bytearray()
    lines += b"\x00" + flat[0].astype(np.uint8).tobytes()
    if h > 1:
        diff = ((flat[1:] - flat[:-1]) & 0xFF).astype(np.uint8)
        for y in range(h - 1):
            lines += b"\x02" + diff[y].tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_by_ch[ch], 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), level))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering (PNG spec §6). Returns (h, w*bpp)
    uint8. Sub is a per-lane cumulative sum mod 256 (vectorized); Up is
    one vectorized add; Average/Paeth fall back to a per-byte loop —
    they carry a left-neighbour recurrence that doesn't vectorize."""
    stride = w * bpp
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG scanline data")
    out = np.empty((h, stride), dtype=np.uint8)
    arr = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = int(arr[y, 0])
        cur = arr[y, 1:].astype(np.int32)
        if ft == 0:
            rec = cur
        elif ft == 1:  # Sub: per-lane running sum mod 256
            lanes = cur.reshape(w, bpp)
            rec = (np.cumsum(lanes, axis=0, dtype=np.int64) & 0xFF).reshape(stride)
            rec = rec.astype(np.int32)
        elif ft == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif ft == 3:  # Average
            rec = cur
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (rec[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            rec = cur
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG → HxWxC uint8 (C per color type: 1 gray, 3 RGB, 4 RGBA).
    Supports bit depth 8, color types 0/2/6, both interlace methods
    (none and Adam7) — the layouts `encode_png` emits plus what
    formula-generated corpora and real-world files need; other layouts
    raise so the imageio fallback (when present) can take over."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    ctype = None
    interlaced = False
    idat = bytearray()
    while pos + 8 <= len(data):
        (clen,) = struct.unpack_from(">I", data, pos)
        cid = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG (depth={depth}, color={ctype})")
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG compression/filter method")
            if interlace not in (0, 1):
                raise ValueError(f"unknown PNG interlace method {interlace}")
            interlaced = interlace == 1
        elif cid == b"IDAT":
            idat += body
        elif cid == b"IEND":
            break
        pos += 12 + clen  # len + type + data + crc
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    ch = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    if not interlaced:
        return _png_unfilter(raw, h, w, ch).reshape(h, w, ch)
    # Adam7: seven sub-images, each independently filtered, scattered
    # onto the (x0 + i*dx, y0 + j*dy) grids of the PNG spec
    out = np.zeros((h, w, ch), dtype=np.uint8)
    off = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue  # empty pass contributes no bytes at all
        nbytes = ph * (pw * ch + 1)
        sub = _png_unfilter(raw[off:off + nbytes], ph, pw, ch).reshape(ph, pw, ch)
        out[y0::dy, x0::dx] = sub
        off += nbytes
    return out


# --------------------------------------------------------------------------
# format sniffing


def sniff_image(data: bytes) -> str | None:
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:8] == PNG_SIG:
        return "png"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    return None


def sniff_audio(data: bytes) -> str | None:
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


# --------------------------------------------------------------------------
# JPEG — baseline sequential DCT, grayscale, stdlib+numpy only (round 3)
# (reference loads JPEG via imageio; this closes the last import-gated
# binary-format gap with a real ITU T.81 baseline codec: markers, DQT,
# SOF0, standard Annex-K-style Huffman tables, byte stuffing, zigzag,
# quality-scaled quantization, float DCT/IDCT. Scope: single-component
# (grayscale) encode AND decode — enough for real round trips; color /
# subsampled external files raise ValueError and fall to the import
# gate in multimodal._decode_image.)

_JPEG_QBASE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# canonical Huffman specs (BITS, HUFFVAL) — standard luminance DC table
# and an Annex-K-shaped AC table. Encoder and decoder derive codes from
# the SAME spec written into DHT, so round trips are exact by
# construction even where this AC ordering deviates from the official
# K.5 listing.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_VALS = (
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA]
)


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    u = np.arange(8)[:, None]
    c = np.where(u == 0, 1.0 / np.sqrt(2.0), 1.0)
    return 0.5 * c * np.cos((2 * x[None, :] + 1) * u * np.pi / 16.0)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        # pad the final partial byte with 1-bits (T.81 F.1.2.3)
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # unstuff
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, value bits) per T.81 F.1.2.1 / F.1.2.2."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, v if v > 0 else v + (1 << s) - 1


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1



_JPEG_QBASE_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int64)


def _jpeg_qtable_scaled(base: np.ndarray, quality: int) -> np.ndarray:
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _rgb_to_ycbcr(img: np.ndarray) -> list[np.ndarray]:
    """JFIF full-range color transform, each plane rounded to uint8
    before the DCT (the standard encoder pipeline)."""
    r = img[:, :, 0].astype(np.float64)
    g = img[:, :, 1].astype(np.float64)
    b = img[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return [np.clip(np.round(p), 0, 255).astype(np.uint8) for p in (y, cb, cr)]


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    yf = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136 * cbf - 0.714136 * crf
    b = yf + 1.772 * cbf
    return np.stack(
        [np.clip(np.round(p), 0, 255).astype(np.uint8) for p in (r, g, b)], axis=2
    )


def _pad_plane(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return np.pad(
        plane, ((0, (-h) % 8), (0, (-w) % 8)), mode="edge"
    ).astype(np.float64) - 128.0


def _encode_block(bw, blk, q, c, dc_codes, ac_codes, prev_dc: int) -> int:
    """Huffman-encode one 8x8 block; returns the new DC predictor.

    The float DCT is snapped to the 1e-6 grid first: mathematically
    integer coefficients (e.g. the DC of a constant block, 8*(v-128))
    otherwise carry ~1e-13 residue that flips the .5-boundary of the
    quantizer rounding nondeterministically across BLAS builds; after
    the snap the boundary rounds half-even, reproducibly."""
    coef = np.round(np.round(c @ blk @ c.T, 6) / q).astype(np.int64)
    zz = coef.flatten()[_ZIGZAG]
    s, vb = _magnitude(int(zz[0]) - prev_dc)
    new_dc = int(zz[0])
    code, ln = dc_codes[s]
    bw.put(code, ln)
    bw.put(vb, s)
    run = 0
    last = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.put(code, ln)
            run -= 16
        s, vb = _magnitude(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        bw.put(vb, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.put(code, ln)
    return new_dc


def _jpeg_seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def _box_downsample(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    """fy x fx box-mean downsample (edge-replicated to whole boxes,
    round-half-even) — the chroma decimation for 4:2:0."""
    h, w = plane.shape
    p = np.pad(plane, ((0, (-h) % fy), (0, (-w) % fx)), mode="edge").astype(np.int64)
    hh, ww = p.shape[0] // fy, p.shape[1] // fx
    s = p.reshape(hh, fy, ww, fx).sum(axis=(1, 3))
    return np.round(s / float(fy * fx)).astype(np.uint8)


def encode_jpeg(img: np.ndarray, quality: int = 50, mode: str = "gray") -> bytes:
    """Baseline JFIF encode. mode="gray" (default): single-component
    luma (HxW / HxWx1 direct; HxWx3 converted with the integer Rec.601
    luma used by the tests). mode="color": 3-component YCbCr 4:4:4.
    mode="color420": 3-component YCbCr with 2x2 chroma subsampling
    (box-mean decimation) — the layout virtually all real-world JPEGs
    use. Standard luma + chroma quant tables; the same Annex-K-shaped
    Huffman specs are written for both table classes. Edge-replicated
    padding aligns every plane to the MCU grid."""
    a = np.asarray(img)
    if mode in ("progressive", "progressive_color"):
        return _encode_jpeg_progressive(a, quality, color=mode == "progressive_color")
    if mode in ("progressive_sa", "progressive_sa_color"):
        return _encode_jpeg_progressive_sa(
            a, quality, color=mode == "progressive_sa_color"
        )
    if mode in ("color", "color420"):
        if a.ndim != 3 or a.shape[2] != 3:
            raise ValueError(f"mode={mode!r} needs an HxWx3 image")
        h, w = a.shape[:2]
        raw = _rgb_to_ycbcr(a)
        samp = [(2, 2), (1, 1), (1, 1)] if mode == "color420" else [(1, 1)] * 3
        qy = _jpeg_qtable_scaled(_JPEG_QBASE, quality)
        qc = _jpeg_qtable_scaled(_JPEG_QBASE_CHROMA, quality)
        qs = [qy, qc, qc]
    elif mode == "gray":
        if a.ndim == 3 and a.shape[2] == 3:
            a = ((299 * a[:, :, 0].astype(np.int64)
                  + 587 * a[:, :, 1].astype(np.int64)
                  + 114 * a[:, :, 2].astype(np.int64) + 500) // 1000).astype(np.uint8)
        elif a.ndim == 3:
            a = a[:, :, 0]
        h, w = a.shape
        raw = [a]
        samp = [(1, 1)]
        qs = [_jpeg_qtable_scaled(_JPEG_QBASE, quality)]
    else:
        raise ValueError(f"unknown mode {mode!r}")

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    planes = []
    for (sh, sv), p in zip(samp, raw):
        if (sh, sv) != (hmax, vmax):
            p = _box_downsample(p, vmax // sv, hmax // sh)
        ph = mcy * 8 * sv - p.shape[0]
        pw = mcx * 8 * sh - p.shape[1]
        planes.append(
            np.pad(p, ((0, ph), (0, pw)), mode="edge").astype(np.float64) - 128.0
        )

    c = _dct_matrix()
    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    prev = [0] * len(planes)
    for my in range(mcy):
        for mx in range(mcx):
            for ci, ((sh, sv), plane) in enumerate(zip(samp, planes)):
                for byy in range(sv):
                    for bxx in range(sh):
                        by, bx = my * sv + byy, mx * sh + bxx
                        blk = plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                        prev[ci] = _encode_block(
                            bw, blk, qs[ci], c, dc_codes, ac_codes, prev[ci]
                        )
    bw.flush()

    n = len(planes)
    out = bytearray(b"\xff\xd8")  # SOI
    out += _jpeg_seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _jpeg_seg(0xDB, bytes([0]) + bytes(int(x) for x in qs[0].flatten()[_ZIGZAG]))
    if n == 3:
        out += _jpeg_seg(0xDB, bytes([1]) + bytes(int(x) for x in qs[1].flatten()[_ZIGZAG]))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([n])
    for ci in range(n):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0 if ci == 0 else 1])
    out += _jpeg_seg(0xC0, sof)
    out += _jpeg_seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _jpeg_seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    if n == 3:
        out += _jpeg_seg(0xC4, bytes([0x01]) + bytes(_DC_BITS) + bytes(_DC_VALS))
        out += _jpeg_seg(0xC4, bytes([0x11]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    sos = bytes([n])
    for ci in range(n):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += _jpeg_seg(0xDA, sos)
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _scan_end(data: bytes, start: int) -> int:
    """Index of the marker byte pair terminating entropy-coded data that
    begins at ``start`` (0xFF00 stuffing is data; restart markers are
    refused upstream via the DRI check)."""
    i = start
    n = len(data)
    while i < n - 1:
        if data[i] == 0xFF and data[i + 1] != 0x00:
            return i
        i += 1
    return n


def decode_jpeg(data: bytes) -> np.ndarray:
    """JFIF decode to HxWx1 / HxWx3 uint8.

    Supported: baseline sequential (SOF0) and spectral-selection
    progressive (SOF2 with Ah=Al=0 scans — DC scan + per-component AC
    band scans with EOB-run codes); 1-component grayscale, 3-component
    YCbCr 4:4:4, and (sequential only) 4:2:0 with replicated-pixel
    chroma upsampling. Successive-approximation progressive scans and
    restart intervals raise ValueError (handled by the import gate in
    multimodal._decode_image)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple[list[int], list[int]]] = {}
    h = w = 0
    progressive = False
    comps: list[tuple[int, int, int, int]] = []  # (id, sh, sv, quant id)
    scans: list[tuple[bytes, bytes]] = []  # (SOS body, entropy bytes)
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        m = data[pos + 1]
        if m == 0xD9:
            break
        ln = int.from_bytes(data[pos + 2:pos + 4], "big")
        body = data[pos + 4:pos + 2 + ln]
        if m == 0xDB:
            o = 0
            while o < len(body):
                pq, tq_id = body[o] >> 4, body[o] & 0xF
                if pq != 0:
                    raise ValueError("16-bit qtable unsupported")
                z = np.frombuffer(body[o + 1:o + 65], dtype=np.uint8).astype(np.int64)
                t = np.zeros(64, dtype=np.int64)
                t[_ZIGZAG] = z
                qtables[tq_id] = t.reshape(8, 8)
                o += 65
        elif m in (0xC0, 0xC2):
            progressive = m == 0xC2
            if body[0] != 8:
                raise ValueError("only 8-bit precision")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise ValueError("only 1- or 3-component JPEG supported")
            for i in range(ncomp):
                cid, sampb, tq_id = body[6 + 3 * i:9 + 3 * i]
                sh, sv = sampb >> 4, sampb & 0xF
                if sh not in (1, 2) or sv not in (1, 2):
                    raise ValueError("sampling factors beyond 2 unsupported")
                comps.append((cid, sh, sv, tq_id))
            if progressive and any(c[1:3] != (1, 1) for c in comps):
                raise ValueError("progressive with subsampling unsupported")
        elif m in (0xC1, 0xC3):
            raise ValueError("only baseline SOF0 / progressive SOF2")
        elif m == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif m == 0xC4:
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                bits = list(body[o + 1:o + 17])
                nv = sum(bits)
                vals = list(body[o + 17:o + 17 + nv])
                htables[(tc, th)] = (bits, vals)
                o += 17 + nv
        elif m == 0xDA:
            ent_start = pos + 2 + ln
            ent_end = _scan_end(data, ent_start)
            scans.append((body, data[ent_start:ent_end]))
            pos = ent_end
            continue
        pos += 2 + ln
    if not scans or not h or not comps:
        raise ValueError("truncated JPEG")

    def decode_tree(spec: tuple[list[int], list[int]]):
        codes = _huff_codes(*spec)
        return {(ln, code): val for val, (code, ln) in codes.items()}

    def read_sym(br, tbl) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | br.bit()
            ln += 1
            v = tbl.get((ln, code))
            if v is not None:
                return v
        raise ValueError("bad Huffman code")

    hmax = max(cc[1] for cc in comps)
    vmax = max(cc[2] for cc in comps)
    for _, sh, sv, _ in comps:
        if hmax % sh or vmax % sv:
            raise ValueError("non-dividing sampling factors unsupported")
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    # per-component quantized-coefficient store: (blocks_y, blocks_x, 64)
    coefs = [
        np.zeros((mcy * sv, mcx * sh, 64), dtype=np.int64) for _, sh, sv, _ in comps
    ]
    idx_of = {cc[0]: i for i, cc in enumerate(comps)}

    for sos, ent in scans:
        ns = sos[0]
        in_scan = []
        for i in range(ns):
            cid = sos[1 + 2 * i]
            tt = sos[2 + 2 * i]
            in_scan.append((idx_of[cid], tt >> 4, tt & 0xF))
        ss, se, ahal = sos[1 + 2 * ns], sos[2 + 2 * ns], sos[3 + 2 * ns]
        ah, al = ahal >> 4, ahal & 0xF
        if progressive and ss == 0 and se != 0:
            raise ValueError("invalid progressive scan: DC scan must have Se=0")
        if not progressive and (ss != 0 or se != 63):
            raise ValueError("invalid sequential scan: spectral band must be 0..63")
        if progressive and ah != 0 and ah != al + 1:
            raise ValueError("invalid successive approximation: Ah must equal Al+1")
        br = _BitReader(ent)
        # Huffman decode-trees are per-scan constants (DHT cannot appear
        # mid-scan): memoize per (class, id) so the MCU loop never
        # rebuilds a tree per block.  Lazy because DC-refinement scans
        # read no Huffman symbols at all (their table ids may be absent).
        trees: dict[tuple[int, int], dict] = {}

        def scan_tree(tc: int, th: int):
            key = (tc, th)
            t = trees.get(key)
            if t is None:
                t = trees[key] = decode_tree(htables[key])
            return t

        if not progressive or ss == 0:
            # sequential full scan, or progressive DC scan (first or
            # refinement): interleaved MCU order over the scan's comps
            prev = [0] * len(in_scan)
            for my in range(mcy):
                for mx in range(mcx):
                    for si, (ci, dc_id, ac_id) in enumerate(in_scan):
                        _, sh, sv, _ = comps[ci]
                        for byy in range(sv):
                            for bxx in range(sh):
                                by, bx = my * sv + byy, mx * sh + bxx
                                zz = coefs[ci][by, bx]
                                if progressive and ah != 0:
                                    # DC refinement: one raw bit (T.81 G.1.2.1)
                                    if br.bit():
                                        zz[0] |= 1 << al
                                    continue
                                dct = scan_tree(0, dc_id)
                                s = read_sym(br, dct)
                                prev[si] += _extend(br.bits(s), s)
                                zz[0] = prev[si] << al  # al=0 when sequential
                                if progressive:
                                    continue
                                act = scan_tree(1, ac_id)
                                k = 1
                                while k < 64:
                                    rs = read_sym(br, act)
                                    r, s = rs >> 4, rs & 0xF
                                    if rs == 0x00:
                                        break
                                    if rs == 0xF0:
                                        k += 16
                                        continue
                                    k += r
                                    zz[k] = _extend(br.bits(s), s)
                                    k += 1
        else:
            # progressive AC band scan: exactly one component,
            # non-interleaved raster order over ITS block grid, EOB runs
            if len(in_scan) != 1:
                raise ValueError("AC scans must be single-component")
            ci, _, ac_id = in_scan[0]
            act = scan_tree(1, ac_id)
            bh, bw_ = coefs[ci].shape[:2]
            eobrun = 0
            if ah == 0:
                # first scan of this band: values arrive at precision Al
                for by in range(bh):
                    for bx in range(bw_):
                        if eobrun:
                            eobrun -= 1
                            continue
                        zz = coefs[ci][by, bx]
                        k = ss
                        while k <= se:
                            rs = read_sym(br, act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                eobrun = (1 << r) - 1 + (br.bits(r) if r else 0)
                                break
                            k += r
                            zz[k] = _extend(br.bits(s), s) << al
                            k += 1
            else:
                # refinement scan (T.81 G.1.2.3, the libjpeg
                # decode_mcu_AC_refine flow): every nonzero-history
                # coefficient passed consumes a correction bit; runs
                # count only zero-history zeros; EOBn covers the
                # remainder of the current block too
                p1 = np.int64(1) << al
                m1 = -(np.int64(1) << al)
                for by in range(bh):
                    for bx in range(bw_):
                        zz = coefs[ci][by, bx]
                        k = ss
                        if eobrun == 0:
                            while k <= se:
                                rs = read_sym(br, act)
                                r, s = rs >> 4, rs & 0xF
                                if s == 0:
                                    if r != 15:
                                        eobrun = (1 << r) + (br.bits(r) if r else 0)
                                        break
                                    newval = np.int64(0)  # ZRL: skip 16
                                else:
                                    if s != 1:
                                        raise ValueError(
                                            "refinement scan symbol with size > 1"
                                        )
                                    newval = p1 if br.bit() else m1
                                while k <= se:
                                    if zz[k] != 0:
                                        if br.bit() and (zz[k] & p1) == 0:
                                            zz[k] += p1 if zz[k] >= 0 else m1
                                    else:
                                        if r == 0:
                                            break
                                        r -= 1
                                    k += 1
                                if newval and k <= se:
                                    zz[k] = newval
                                k += 1
                        if eobrun > 0:
                            # EOB region: correction bits for the rest
                            # of this block's nonzero-history coefs
                            while k <= se:
                                if zz[k] != 0:
                                    if br.bit() and (zz[k] & p1) == 0:
                                        zz[k] += p1 if zz[k] >= 0 else m1
                                k += 1
                            eobrun -= 1

    c = _dct_matrix()
    pix = []
    for (cid, sh, sv, tq_id), cf in zip(comps, coefs):
        bh, bw_ = cf.shape[:2]
        plane = np.zeros((bh * 8, bw_ * 8), dtype=np.float64)
        q = qtables[tq_id]
        for by in range(bh):
            for bx in range(bw_):
                coef = np.zeros(64, dtype=np.int64)
                coef[_ZIGZAG] = cf[by, bx]
                plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = (
                    c.T @ (coef.reshape(8, 8) * q) @ c
                )
        # same 1e-6 snap as the encoder: IDCT output that is
        # mathematically integer must round reproducibly
        u = np.clip(np.round(np.round(plane, 6) + 128.0), 0, 255).astype(np.uint8)
        if (sh, sv) != (hmax, vmax):
            u = np.repeat(np.repeat(u, vmax // sv, axis=0), hmax // sh, axis=1)
        pix.append(u[:h, :w])
    if len(pix) == 1:
        return pix[0][:, :, None]
    return _ycbcr_to_rgb(pix[0], pix[1], pix[2])


def _encode_jpeg_progressive(a: np.ndarray, quality: int, color: bool) -> bytes:
    """Spectral-selection progressive JFIF encode (SOF2, Ah=Al=0):
    one interleaved DC scan, then one full-band (1..63) AC scan per
    component — the simplest spec-conformant progressive scan script.
    Empty blocks emit plain EOB codes (the decoder additionally accepts
    real EOBn run symbols from external encoders). Grayscale or YCbCr
    4:4:4 (progressive + subsampling is out of scope, as in the
    decoder)."""
    if color:
        if a.ndim != 3 or a.shape[2] != 3:
            raise ValueError("mode='progressive_color' needs an HxWx3 image")
        h, w = a.shape[:2]
        raw = _rgb_to_ycbcr(a)
        qy = _jpeg_qtable_scaled(_JPEG_QBASE, quality)
        qc = _jpeg_qtable_scaled(_JPEG_QBASE_CHROMA, quality)
        qs = [qy, qc, qc]
    else:
        if a.ndim == 3 and a.shape[2] == 3:
            a = ((299 * a[:, :, 0].astype(np.int64)
                  + 587 * a[:, :, 1].astype(np.int64)
                  + 114 * a[:, :, 2].astype(np.int64) + 500) // 1000).astype(np.uint8)
        elif a.ndim == 3:
            a = a[:, :, 0]
        h, w = a.shape
        raw = [a]
        qs = [_jpeg_qtable_scaled(_JPEG_QBASE, quality)]

    c = _dct_matrix()
    n = len(raw)
    # quantized zigzag coefficients per component: (by, bx, 64)
    coefs = []
    for p, q in zip(raw, qs):
        plane = _pad_plane(p)
        bh, bw_ = plane.shape[0] // 8, plane.shape[1] // 8
        cf = np.zeros((bh, bw_, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw_):
                blk = plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                coef = np.round(np.round(c @ blk @ c.T, 6) / q).astype(np.int64)
                cf[by, bx] = coef.flatten()[_ZIGZAG]
        coefs.append(cf)

    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_codes(_AC_BITS, _AC_VALS)

    # scan 1: interleaved DC (all components, 1x1 sampling -> MCU = block)
    bw = _BitWriter()
    prev = [0] * n
    bh, bw_ = coefs[0].shape[:2]
    for by in range(bh):
        for bx in range(bw_):
            for ci in range(n):
                s, vb = _magnitude(int(coefs[ci][by, bx, 0]) - prev[ci])
                prev[ci] = int(coefs[ci][by, bx, 0])
                code, ln = dc_codes[s]
                bw.put(code, ln)
                bw.put(vb, s)
    bw.flush()
    dc_scan = bytes(bw.buf)

    # per-component AC band scans with EOB runs
    ac_scans = []
    for ci in range(n):
        bw = _BitWriter()
        eobrun = 0

        def flush_eob():
            # the shared Annex-K-shaped AC table defines only the plain
            # EOB symbol (0x00, an EOB-run of 1) — longer EOBn symbols
            # (0x10..0xE0) would need a progressive-specific Huffman
            # table, so a run of k empty blocks is emitted as k plain
            # EOBs: spec-conformant (any decoder reads it), just without
            # the run-length compression
            nonlocal eobrun
            while eobrun:
                code, ln = ac_codes[0x00]
                bw.put(code, ln)
                eobrun -= 1

        for by in range(coefs[ci].shape[0]):
            for bx in range(coefs[ci].shape[1]):
                zz = coefs[ci][by, bx]
                nz = np.nonzero(zz[1:64])[0]
                if len(nz) == 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                last = int(nz[-1]) + 1
                run = 0
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]
                        bw.put(code, ln)
                        run -= 16
                    s, vb = _magnitude(v)
                    code, ln = ac_codes[(run << 4) | s]
                    bw.put(code, ln)
                    bw.put(vb, s)
                    run = 0
                if last < 63:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        bw.flush()
        ac_scans.append(bytes(bw.buf))

    out = bytearray(b"\xff\xd8")  # SOI
    out += _jpeg_seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _jpeg_seg(0xDB, bytes([0]) + bytes(int(x) for x in qs[0].flatten()[_ZIGZAG]))
    if n == 3:
        out += _jpeg_seg(0xDB, bytes([1]) + bytes(int(x) for x in qs[1].flatten()[_ZIGZAG]))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([n])
    for ci in range(n):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _jpeg_seg(0xC2, sof)  # SOF2: progressive
    out += _jpeg_seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _jpeg_seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    if n == 3:
        out += _jpeg_seg(0xC4, bytes([0x01]) + bytes(_DC_BITS) + bytes(_DC_VALS))
        out += _jpeg_seg(0xC4, bytes([0x11]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    sos = bytes([n])
    for ci in range(n):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x10])
    sos += bytes([0, 0, 0x00])  # Ss=0 Se=0 Ah=Al=0 (DC scan)
    out += _jpeg_seg(0xDA, sos)
    out += dc_scan
    for ci in range(n):
        sos = bytes([1, ci + 1, 0x00 if ci == 0 else 0x11])
        sos += bytes([1, 63, 0x00])  # full AC band, no approximation
        out += _jpeg_seg(0xDA, sos)
        out += ac_scans[ci]
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_jpeg_progressive_sa(a: np.ndarray, quality: int, color: bool) -> bytes:
    """Successive-approximation progressive JFIF encode (SOF2) with the
    libjpeg-style two-stage script: DC first at Al=1 + DC refinement,
    then per component an AC first scan at Al=1 and an AC refinement
    scan (T.81 G.1.2.2/G.1.2.3). The refinement encoder is a
    bit-emitting twin of the decoder walk: sign bit after the symbol,
    correction bits for every nonzero-history coefficient passed, runs
    counting only zero-history zeros, plain EOB covering the block
    remainder. Grayscale or YCbCr 4:4:4."""
    if color:
        if a.ndim != 3 or a.shape[2] != 3:
            raise ValueError("mode='progressive_sa_color' needs an HxWx3 image")
        h, w = a.shape[:2]
        raw = _rgb_to_ycbcr(a)
        qy = _jpeg_qtable_scaled(_JPEG_QBASE, quality)
        qc = _jpeg_qtable_scaled(_JPEG_QBASE_CHROMA, quality)
        qs = [qy, qc, qc]
    else:
        if a.ndim == 3 and a.shape[2] == 3:
            a = ((299 * a[:, :, 0].astype(np.int64)
                  + 587 * a[:, :, 1].astype(np.int64)
                  + 114 * a[:, :, 2].astype(np.int64) + 500) // 1000).astype(np.uint8)
        elif a.ndim == 3:
            a = a[:, :, 0]
        h, w = a.shape
        raw = [a]
        qs = [_jpeg_qtable_scaled(_JPEG_QBASE, quality)]

    c = _dct_matrix()
    n = len(raw)
    coefs = []
    for p, q in zip(raw, qs):
        plane = _pad_plane(p)
        bh, bw_ = plane.shape[0] // 8, plane.shape[1] // 8
        cf = np.zeros((bh, bw_, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw_):
                blk = plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                coef = np.round(np.round(c @ blk @ c.T, 6) / q).astype(np.int64)
                cf[by, bx] = coef.flatten()[_ZIGZAG]
        coefs.append(cf)

    dc_codes = _huff_codes(_DC_BITS, _DC_VALS)
    ac_codes = _huff_codes(_AC_BITS, _AC_VALS)
    bh, bw_ = coefs[0].shape[:2]

    # scan 1: DC first at Al=1 (DPCM over the shifted values)
    bw = _BitWriter()
    prev = [0] * n
    for by in range(bh):
        for bx in range(bw_):
            for ci in range(n):
                shifted = int(coefs[ci][by, bx, 0]) >> 1
                s, vb = _magnitude(shifted - prev[ci])
                prev[ci] = shifted
                code, ln = dc_codes[s]
                bw.put(code, ln)
                bw.put(vb, s)
    bw.flush()
    dc_first = bytes(bw.buf)

    # scan 2: DC refinement — one raw bit (bit 0 of the DC) per block
    bw = _BitWriter()
    for by in range(bh):
        for bx in range(bw_):
            for ci in range(n):
                bw.put(int(coefs[ci][by, bx, 0]) & 1, 1)
    bw.flush()
    dc_refine = bytes(bw.buf)

    # per-component AC first (Al=1) and AC refinement scans
    ac_first, ac_refine = [], []
    for ci in range(n):
        # first: magnitudes shifted toward zero by 1 bit
        bw = _BitWriter()
        for by in range(coefs[ci].shape[0]):
            for bx in range(coefs[ci].shape[1]):
                zz = coefs[ci][by, bx]
                run = 0
                emitted_any = False
                last_nz = 0
                for k in range(1, 64):
                    if abs(int(zz[k])) >> 1:
                        last_nz = k
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    t = (abs(v) >> 1) * (1 if v > 0 else -1)
                    if t == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]
                        bw.put(code, ln)
                        run -= 16
                    s, vb = _magnitude(t)
                    code, ln = ac_codes[(run << 4) | s]
                    bw.put(code, ln)
                    bw.put(vb, s)
                    run = 0
                if last_nz < 63:
                    code, ln = ac_codes[0x00]  # EOB (run of 1)
                    bw.put(code, ln)
        bw.flush()
        ac_first.append(bytes(bw.buf))

        # refinement: bit-emitting twin of the decoder walk
        bw = _BitWriter()
        for by in range(coefs[ci].shape[0]):
            for bx in range(coefs[ci].shape[1]):
                zz = coefs[ci][by, bx]
                absv = [abs(int(zz[k])) for k in range(64)]
                targets = [j for j in range(1, 64) if absv[j] == 1]
                k = 1
                for j in targets:
                    while True:
                        zcount = sum(1 for p in range(k, j) if absv[p] == 0)
                        if zcount < 16:
                            break
                        # ZRL segment: symbol, then corrections passed
                        # before the 16th zero-history zero
                        code, ln = ac_codes[0xF0]
                        bw.put(code, ln)
                        seen = 0
                        p = k
                        while True:
                            if absv[p] == 0:
                                seen += 1
                                if seen == 16:
                                    break
                            elif absv[p] >= 2:
                                bw.put(absv[p] & 1, 1)
                            p += 1
                        k = p + 1
                    code, ln = ac_codes[(zcount << 4) | 1]
                    bw.put(code, ln)
                    bw.put(1 if int(zz[j]) > 0 else 0, 1)
                    for p in range(k, j):
                        if absv[p] >= 2:
                            bw.put(absv[p] & 1, 1)
                    k = j + 1
                if k <= 63:
                    code, ln = ac_codes[0x00]  # EOB covering the rest
                    bw.put(code, ln)
                    for p in range(k, 64):
                        if absv[p] >= 2:
                            bw.put(absv[p] & 1, 1)
        bw.flush()
        ac_refine.append(bytes(bw.buf))

    out = bytearray(b"\xff\xd8")
    out += _jpeg_seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _jpeg_seg(0xDB, bytes([0]) + bytes(int(x) for x in qs[0].flatten()[_ZIGZAG]))
    if n == 3:
        out += _jpeg_seg(0xDB, bytes([1]) + bytes(int(x) for x in qs[1].flatten()[_ZIGZAG]))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([n])
    for ci in range(n):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _jpeg_seg(0xC2, sof)
    out += _jpeg_seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _jpeg_seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    if n == 3:
        out += _jpeg_seg(0xC4, bytes([0x01]) + bytes(_DC_BITS) + bytes(_DC_VALS))
        out += _jpeg_seg(0xC4, bytes([0x11]) + bytes(_AC_BITS) + bytes(_AC_VALS))

    def sos_seg(comp_specs: bytes, ncomp: int, ss: int, se: int, ah: int, al: int) -> bytes:
        return _jpeg_seg(0xDA, bytes([ncomp]) + comp_specs + bytes([ss, se, (ah << 4) | al]))

    all_dc = b"".join(bytes([ci + 1, 0x00 if ci == 0 else 0x10]) for ci in range(n))
    out += sos_seg(all_dc, n, 0, 0, 0, 1) + dc_first
    out += sos_seg(all_dc, n, 0, 0, 1, 0) + dc_refine
    for ci in range(n):
        spec = bytes([ci + 1, 0x00 if ci == 0 else 0x11])
        out += sos_seg(spec, 1, 1, 63, 0, 1) + ac_first[ci]
        out += sos_seg(spec, 1, 1, 63, 1, 0) + ac_refine[ci]
    out += b"\xff\xd9"
    return bytes(out)

"""Pure-numpy binary codecs: PPM (P6), BMP (24-bit BI_RGB), WAV (PCM),
PNG (8-bit gray/RGB/RGBA, non-interlaced).

The reference decodes stimuli with imageio/PIL/librosa
(pliers/stimuli/image.py:15, pliers/stimuli/audio.py:9-84); none of
those are in this container, so the engine ships real decoders for the
simplest public container formats — enough to exercise the
Brightness/Vibrance/Sharpness and framed-audio formula paths on REAL
bytes end-to-end instead of a stand-in. PNG needs only DEFLATE, which
ships in the Python stdlib (`zlib`), so it gets a full real codec too;
formats whose entropy coding has no stdlib support (JPEG/MP3) stay
behind the import-gated imageio path.

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
    """float samples in [-1, 1] → PCM WAV bytes. Multi-channel input is
    (n, channels); mono is 1-D."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    if x.shape[1] != channels:
        raise ValueError(f"expected {channels} channels, got {x.shape[1]}")
    if bits == 16:
        pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2").tobytes()
    elif bits == 8:
        pcm = np.clip(np.round(x * 127.0 + 128.0), 0, 255).astype(np.uint8).tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, sr, sr * block, block, bits)
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
    if audio_format != 1:
        raise ValueError(f"only PCM supported (format={audio_format})")
    if bits == 16:
        x = np.frombuffer(pcm, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(pcm, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported bit depth {bits}")
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
    Supports bit depth 8, color types 0/2/6, no interlace — the layouts
    `encode_png` emits plus what formula-generated corpora need; other
    layouts raise so the imageio fallback (when present) can take over."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    ctype = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (clen,) = struct.unpack_from(">I", data, pos)
        cid = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG (depth={depth}, color={ctype})")
            if comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported PNG compression/filter/interlace")
        elif cid == b"IDAT":
            idat += body
        elif cid == b"IEND":
            break
        pos += 12 + clen  # len + type + data + crc
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    ch = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    return _png_unfilter(raw, h, w, ch).reshape(h, w, ch)


# --------------------------------------------------------------------------
# format sniffing


def sniff_image(data: bytes) -> str | None:
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:8] == PNG_SIG:
        return "png"
    return None


def sniff_audio(data: bytes) -> str | None:
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None

"""Pure-numpy binary codecs: PPM (P6), BMP (24-bit BI_RGB), WAV (PCM).

The reference decodes stimuli with imageio/PIL/librosa
(pliers/stimuli/image.py:15, pliers/stimuli/audio.py:9-84); none of
those are in this container, so the engine ships real decoders for the
three simplest public container formats — enough to exercise the
Brightness/Vibrance/Sharpness and framed-audio formula paths on REAL
bytes end-to-end instead of a stand-in. Formats with entropy coding
(JPEG/PNG/MP3) stay behind the import-gated imageio path.

All three are published byte layouts:
- PPM P6: netpbm format spec (ASCII header, raw RGB rows).
- BMP: BITMAPFILEHEADER/BITMAPINFOHEADER, 24bpp uncompressed,
  bottom-up BGR rows padded to 4 bytes.
- WAV: RIFF/WAVE with a PCM ``fmt `` chunk; 8-bit unsigned or
  16-bit signed little-endian samples, interleaved channels.
"""

from __future__ import annotations

import struct

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
# format sniffing


def sniff_image(data: bytes) -> str | None:
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"BM":
        return "bmp"
    return None


def sniff_audio(data: bytes) -> str | None:
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None

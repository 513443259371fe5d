"""MPEG-1/2 Audio Layer III (MP3) — the last import-gated binary format.

Reference anchor: pliers decodes audio stimuli through moviepy/librosa
(pliers/stimuli/audio.py:29-55); the engine's other audio container
(RIFF/WAVE, ``codecs.decode_wav``) is fully self-contained because WAV
is lossless structure + raw PCM.  Layer III splits differently:

- **Structure** (frame sync, header fields, frame-length arithmetic,
  side-info bit layout, the bit-reservoir back-pointer protocol) is
  pure published specification *logic* — implemented completely here
  and verified two independent ways: exact-integer oracles over
  synthesized streams, and a sync-walk over real third-party MP3 files
  present in this environment (every computed frame length must land
  exactly on the next 0xFFE sync — one wrong entry in the bitrate /
  sample-rate tables desyncs immediately).
- **Spectral reconstruction** (requantize → stereo → alias reduction →
  IMDCT → overlap-add → frequency inversion → polyphase synthesis) is
  implemented as real vectorized numpy below; the IMDCT windows are
  the spec's analytic sine formulas, and the 8 alias-reduction
  coefficients are the published Table B.9 constants.
- **Huffman code tables (ISO 11172-3 Table B.7) and the 512-tap
  synthesis window (Table B.3)** are *published data files*, not
  logic — like the full VADER lexicon, they cannot be fetched in this
  offline container and hand-reconstruction would be unverifiable
  guessing.  They load through ``PLIERS_SPARK_MP3_TABLES`` (a JSON
  file; see :func:`load_tables`), the same zero-code-change deployment
  mechanism as ``PLIERS_SPARK_VADER_LEXICON``; the mechanism itself is
  tested at full size with synthetic tables (tests/test_mp3.py), so
  what remains untested is the real data files' literal contents
  (Huffman rows, synthesis window, and the per-sample-rate
  scalefactor-band tables ``sfband`` that set per-granule big-values
  region boundaries), plus real-stream-only features the gated path
  rejects explicitly rather than mis-decoding: bit-reservoir assembly
  across frames, stereo modes, and switched/short blocks.
  Without tables, :func:`decode_mp3` raises
  :class:`Mp3TablesUnavailable` with the deployment instructions.

Everything here is clean-room from the public ISO 11172-3 / 13818-3
specification structure; no decoder source was consulted or copied.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

# ---------------------------------------------------------------------------
# Published header constant tables (spec structure, verified by sync-walk
# over real files in tests/test_mp3.py).

# kbit/s by (version_key, bitrate_index); index 0 is "free", 15 forbidden.
BITRATES_KBPS = {
    # MPEG-1 Layer III
    "v1": [None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None],
    # MPEG-2 / 2.5 Layer III (LSF)
    "v2": [None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, None],
}
SAMPLE_RATES = {
    3: [44100, 48000, 32000, None],  # MPEG-1
    2: [22050, 24000, 16000, None],  # MPEG-2
    0: [11025, 12000, 8000, None],   # MPEG-2.5
}
MODE_NAMES = ["stereo", "joint_stereo", "dual_channel", "mono"]


class Mp3FormatError(ValueError):
    pass


class Mp3TablesUnavailable(RuntimeError):
    """Raised by the spectral stage when the published Huffman/synthesis
    tables are not deployed (see module docstring)."""


@dataclass
class FrameHeader:
    offset: int
    version_bits: int      # 3=MPEG-1, 2=MPEG-2, 0=MPEG-2.5
    bitrate_kbps: int
    sample_rate: int
    padded: int
    mode: str
    frame_len: int
    samples: int           # 1152 (MPEG-1 L3) or 576 (LSF L3)
    side_info_len: int     # bytes, after header(+crc)
    crc: bool

    @property
    def is_mpeg1(self) -> bool:
        return self.version_bits == 3


def parse_frame_header(data: bytes, off: int) -> FrameHeader:
    """Parse one 4-byte Layer III frame header at ``off``.

    Frame length (the published closed form): MPEG-1 uses 1152
    samples/frame -> ``144 * bitrate / sample_rate + padding`` bytes;
    LSF (MPEG-2/2.5) halves the granule count -> coefficient 72.
    """
    if off + 4 > len(data):
        raise Mp3FormatError(f"truncated header at {off}")
    h = int.from_bytes(data[off : off + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        raise Mp3FormatError(f"no frame sync at {off}")
    ver = (h >> 19) & 3
    layer = (h >> 17) & 3
    if ver == 1 or layer != 1:  # ver=1 reserved; layer bits 01 = Layer III
        raise Mp3FormatError(f"not Layer III at {off} (ver={ver}, layer={layer})")
    no_crc = (h >> 16) & 1
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    pad = (h >> 9) & 1
    mode = (h >> 6) & 3
    sr = SAMPLE_RATES[ver][sr_idx]
    br = BITRATES_KBPS["v1" if ver == 3 else "v2"][br_idx]
    if sr is None or br is None:
        raise Mp3FormatError(f"reserved bitrate/sample-rate index at {off}")
    coeff = 144 if ver == 3 else 72
    frame_len = coeff * br * 1000 // sr + pad
    mono = mode == 3
    if ver == 3:
        side = 17 if mono else 32
    else:
        side = 9 if mono else 17
    return FrameHeader(
        offset=off,
        version_bits=ver,
        bitrate_kbps=br,
        sample_rate=sr,
        padded=pad,
        mode=MODE_NAMES[mode],
        frame_len=frame_len,
        samples=1152 if ver == 3 else 576,
        side_info_len=side,
        crc=not bool(no_crc),
    )


def skip_id3v2(data: bytes, off: int = 0) -> int:
    """Bytes occupied by an ID3v2 tag starting at ``off`` (syncsafe
    size), 0 if there is none or the header is truncated.  Offset-based
    so mid-stream tags cost no tail copy."""
    if data[off : off + 3] != b"ID3" or len(data) - off < 10:
        return 0
    sz = 0
    for b in data[off + 6 : off + 10]:
        sz = (sz << 7) | (b & 0x7F)
    return 10 + sz


def index_frames(data: bytes, strict: bool = True) -> list[FrameHeader]:
    """Walk the stream frame by frame using ONLY the computed lengths.

    ``strict`` requires every step to land exactly on the next sync —
    the property that validates the bitrate/sample-rate/length tables
    against real files (any wrong table entry desyncs at once).  An
    ID3v1 trailer (128-byte 'TAG' block) and trailing ID3v2 tags are
    tolerated at EOF.
    """
    frames: list[FrameHeader] = []
    off = skip_id3v2(data)
    n = len(data)
    while off + 4 <= n:
        if data[off : off + 3] == b"TAG" and n - off == 128:
            break  # ID3v1 trailer
        if data[off : off + 3] == b"ID3":
            adv = skip_id3v2(data, off)
            if adv == 0:
                break  # truncated tag header at EOF — trailing junk
            off += adv
            continue
        try:
            fh = parse_frame_header(data, off)
        except Mp3FormatError:
            if strict and frames:
                raise
            if not frames:  # scan for first sync (junk prefix)
                off += 1
                continue
            break
        if off + fh.frame_len > n:
            break  # truncated final frame
        frames.append(fh)
        off += fh.frame_len
    return frames


# ---------------------------------------------------------------------------
# Side info (bit-exact published layout) + bit reservoir protocol.


class _Bits:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, k: int) -> int:
        v = 0
        for _ in range(k):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


@dataclass
class GranuleInfo:
    part2_3_length: int
    big_values: int
    global_gain: int
    scalefac_compress: int
    window_switching: int
    block_type: int
    mixed_block: int
    table_select: tuple[int, ...]
    subblock_gain: tuple[int, ...]
    region0_count: int
    region1_count: int
    preflag: int
    scalefac_scale: int
    count1table_select: int


@dataclass
class SideInfo:
    main_data_begin: int
    scfsi: tuple[tuple[int, ...], ...]    # [ch][band-group]
    granules: tuple[tuple[GranuleInfo, ...], ...]  # [granule][channel]


def parse_side_info(frame: bytes, fh: FrameHeader) -> SideInfo:
    """MPEG-1 Layer III side info (17/32 bytes). LSF streams use a
    9/17-byte single-granule variant — structure below follows the
    published MPEG-1 layout; MPEG-2 differs only in field widths
    (main_data_begin 8 bits, no scfsi, 1 granule)."""
    start = fh.offset + 4 + (2 if fh.crc else 0)
    b = _Bits(frame[start : start + fh.side_info_len])
    nch = 1 if fh.mode == "mono" else 2
    if fh.is_mpeg1:
        mdb = b.read(9)
        b.read(5 if nch == 1 else 3)  # private bits
        scfsi = tuple(tuple(b.read(1) for _ in range(4)) for _ in range(nch))
        ngr = 2
    else:
        mdb = b.read(8)
        b.read(1 if nch == 1 else 2)
        scfsi = tuple((0, 0, 0, 0) for _ in range(nch))
        ngr = 1
    grans = []
    for _ in range(ngr):
        chs = []
        for _ in range(nch):
            p23 = b.read(12)
            bv = b.read(9)
            gg = b.read(8)
            sfc = b.read(4 if fh.is_mpeg1 else 9)
            wsf = b.read(1)
            if wsf:
                bt = b.read(2)
                mixed = b.read(1)
                tsel = (b.read(5), b.read(5))
                sbg = (b.read(3), b.read(3), b.read(3))
                # spec-implied region counts for switched blocks: the
                # bitstream carries none, decoders use the published
                # convention (7, remainder; 8 for pure-short granules)
                r0 = 8 if (bt == 2 and not mixed) else 7
                r1 = 20 - r0
            else:
                bt, mixed = 0, 0
                tsel = (b.read(5), b.read(5), b.read(5))
                sbg = (0, 0, 0)
                r0 = b.read(4)
                r1 = b.read(3)
            pre = b.read(1) if fh.is_mpeg1 else 0
            sfs = b.read(1)
            c1t = b.read(1)
            chs.append(
                GranuleInfo(p23, bv, gg, sfc, wsf, bt, mixed, tsel, sbg,
                            r0, r1, pre, sfs, c1t)
            )
        grans.append(tuple(chs))
    return SideInfo(mdb, scfsi, tuple(grans))


def reservoir_ledger(data: bytes, frames: list[FrameHeader]) -> list[dict]:
    """Audit the bit-reservoir protocol over a whole stream: for every
    frame, ``main_data_begin`` must not reach back past the main-data
    bytes accumulated in prior frames (capped by the 511-byte pointer),
    and spec field constraints must hold (window-switched granules
    never carry block_type 0; table_select/other fields are in range by
    construction of their widths).  Returns one ledger row per frame —
    the structural invariants a real encoder's output always satisfies,
    so a layout mistake in :func:`parse_side_info` surfaces on the
    first real file."""
    rows = []
    avail = 0
    for fh in frames:
        frame = data  # absolute offsets inside parse_side_info
        si = parse_side_info(frame, fh)
        main_sz = fh.frame_len - 4 - (2 if fh.crc else 0) - fh.side_info_len
        ok_reservoir = si.main_data_begin <= min(avail, 511)
        ok_blocks = all(
            (g.window_switching == 0) or (g.block_type != 0)
            for gr in si.granules for g in gr
        )
        rows.append(
            {
                "offset": fh.offset,
                "main_data_begin": si.main_data_begin,
                "main_data_size": main_sz,
                "reservoir_ok": ok_reservoir,
                "block_types_ok": ok_blocks,
                "part2_3_total": sum(
                    g.part2_3_length for gr in si.granules for g in gr
                ),
            }
        )
        avail = min(avail + main_sz, 511 + main_sz)
    return rows


# ---------------------------------------------------------------------------
# Spectral reconstruction chain (real numpy; tables via load_tables).


def requantize(iq: np.ndarray, global_gain: int) -> np.ndarray:
    """The published 4/3-power requantization for one granule's integer
    spectrum (scalefactor terms folded to zero — the synthetic-table
    test path): ``xr_i = sign(iq_i) * |iq_i|^(4/3) * 2^((gg-210)/4)``.
    Exactly dyadic whenever |iq| is a power of 8 and gg-210 ≡ 0 (mod 4)
    — the property the exact oracles use."""
    mag = np.abs(iq).astype(np.float64) ** (4.0 / 3.0)
    return np.sign(iq) * mag * (2.0 ** ((global_gain - 210) / 4.0))


# Table B.9 alias-reduction coefficients (published constants).
ALIAS_CI = np.array(
    [-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037]
)
_ALIAS_CS = 1.0 / np.sqrt(1.0 + ALIAS_CI**2)
_ALIAS_CA = ALIAS_CI / np.sqrt(1.0 + ALIAS_CI**2)


def alias_reduce(xr: np.ndarray) -> np.ndarray:
    """Butterflies across each of the 31 subband boundaries of the
    576-line granule (8 published (cs, ca) pairs per boundary)."""
    out = xr.copy()
    for sb in range(1, 32):
        for i in range(8):
            lo = sb * 18 - 1 - i
            hi = sb * 18 + i
            a, b = out[lo], out[hi]
            out[lo] = a * _ALIAS_CS[i] - b * _ALIAS_CA[i]
            out[hi] = b * _ALIAS_CS[i] + a * _ALIAS_CA[i]
    return out


_IMDCT_M: dict[int, np.ndarray] = {}


def _imdct(n: int, x: np.ndarray) -> np.ndarray:
    """Direct-form IMDCT of size n (12 or 36): the spec formula
    ``s_i = sum_k x_k cos(pi/(2n) (2i + 1 + n/2)(2k + 1))``.  The
    cosine matrix is a pure constant per size — cached (it sits inside
    the 32-band × 2-granule × N-frame loop)."""
    if n not in _IMDCT_M:
        i = np.arange(n)[:, None]
        k = np.arange(n // 2)[None, :]
        _IMDCT_M[n] = np.cos(np.pi / (2 * n) * (2 * i + 1 + n / 2) * (2 * k + 1))
    return _IMDCT_M[n] @ x


_WINDOW_CACHE: dict[int, np.ndarray] = {}


def imdct_window(block_type: int) -> np.ndarray:
    """The spec's ANALYTIC window formulas (block types 0-3); short
    blocks return the 12-point window applied per sub-block. Cached —
    constants on the per-band hot path."""
    if block_type in _WINDOW_CACHE:
        return _WINDOW_CACHE[block_type]
    i = np.arange(36)
    if block_type == 0:
        w = np.sin(np.pi / 36 * (i + 0.5))
    elif block_type == 1:  # start
        w = np.sin(np.pi / 36 * (i + 0.5))
        w[18:24] = 1.0
        w[24:30] = np.sin(np.pi / 12 * (np.arange(24, 30) - 18 + 0.5))
        w[30:] = 0.0
    elif block_type == 3:  # stop
        w = np.sin(np.pi / 36 * (i + 0.5))
        w[:6] = 0.0
        w[6:12] = np.sin(np.pi / 12 * (np.arange(6, 12) - 6 + 0.5))
        w[12:18] = 1.0
        w[18:] = np.sin(np.pi / 36 * (np.arange(18, 36) + 0.5))
    elif block_type == 2:  # short (12-point, used 3× inside hybrid)
        w = np.sin(np.pi / 12 * (np.arange(12) + 0.5))
    else:
        raise Mp3FormatError(f"bad block_type {block_type}")
    w.setflags(write=False)
    _WINDOW_CACHE[block_type] = w
    return w


def hybrid_synthesis_long(xr_band: np.ndarray, block_type: int,
                          overlap: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One subband's 18 spectral lines -> 18 time samples + new overlap
    (36-point windowed IMDCT, 50% overlap-add)."""
    z = _imdct(36, xr_band) * imdct_window(block_type)
    out = z[:18] + overlap
    return out, z[18:]


def frequency_inversion(sb_samples: np.ndarray) -> np.ndarray:
    """Every odd time sample of every odd subband is negated (spec
    compensation for the polyphase filterbank's frequency folding).
    ``sb_samples`` is (18, 32)."""
    out = sb_samples.copy()
    out[1::2, 1::2] *= -1.0
    return out


_SYNTH_M: list = []


def synthesis_matrix() -> np.ndarray:
    """The (64, 32) polyphase matrixing ``N_ik = cos((16+i)(2k+1)π/32)``
    — analytic, no table needed; computed once."""
    if not _SYNTH_M:
        i = np.arange(64)[:, None]
        k = np.arange(32)[None, :]
        _SYNTH_M.append(np.cos((16 + i) * (2 * k + 1) * np.pi / 32))
    return _SYNTH_M[0]


def polyphase_synthesis(sb: np.ndarray, d_window: np.ndarray,
                        state: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One granule's (18, 32) subband samples -> 576 PCM samples via the
    published shift/matrix/window/sum loop.  ``d_window`` is the
    512-tap Table B.3 synthesis window (DATA — see load_tables);
    ``state`` is the 1024-sample V-FIFO carried between calls."""
    if d_window.shape != (512,):
        raise Mp3FormatError("synthesis window must have 512 taps")
    N = synthesis_matrix()
    v = state.copy()
    out = np.empty(576)
    for t in range(18):
        v = np.roll(v, 64)
        v[:64] = N @ sb[t]
        # build the 512-sample U vector from alternating V blocks
        u = np.empty(512)
        for j in range(8):
            u[j * 64 : j * 64 + 32] = v[j * 128 : j * 128 + 32]
            u[j * 64 + 32 : j * 64 + 64] = v[j * 128 + 96 : j * 128 + 128]
        w = u * d_window
        out[t * 32 : (t + 1) * 32] = w.reshape(16, 32).sum(axis=0)
    return out, v


# ---------------------------------------------------------------------------
# Published-data gate (Huffman tables + synthesis window).

_TABLES: dict | None = None


def set_tables(tables: dict | None) -> None:
    global _TABLES
    _TABLES = tables
    _DECODER_CACHE.clear()  # decoders are derived data — never stale


def load_tables() -> dict:
    """The deployment mechanism for the published data tables:
    ``PLIERS_SPARK_MP3_TABLES`` names a JSON file with keys
    ``huffman`` (table id -> list of [x, y, hlen, hcod] rows, ISO
    11172-3 Table B.7) and ``synth_window`` (512 floats, Table B.3).
    Identical shape to the VADER lexicon swap: zero code change on a
    cluster, `spark-submit --conf spark.executorEnv....`"""
    global _TABLES
    if _TABLES is not None:
        return _TABLES
    p = os.environ.get("PLIERS_SPARK_MP3_TABLES")
    if p and os.path.exists(p):
        with open(p, encoding="utf-8") as fh:
            t = json.load(fh)
        if "huffman" not in t or "synth_window" not in t:
            raise Mp3FormatError(
                "PLIERS_SPARK_MP3_TABLES must contain 'huffman' and 'synth_window'"
            )
        _TABLES = t
        _DECODER_CACHE.clear()
        return t
    raise Mp3TablesUnavailable(
        "Layer III spectral decode needs the published Huffman code "
        "tables (ISO 11172-3 Table B.7) and 512-tap synthesis window "
        "(Table B.3) — data files this offline container cannot fetch "
        "(same class as the full VADER lexicon). Deploy them via "
        "PLIERS_SPARK_MP3_TABLES=/path/to/mp3_tables.json; the frame "
        "index / side-info / reservoir layers above work without them."
    )


def build_huffman_decoder(rows: list[list[int]]):
    """(x, y, hlen, hcod) rows -> prefix-code dict {(hcod, hlen): (x, y)}
    with prefix-freeness validated (a malformed table fails fast here,
    not mid-stream)."""
    codes: dict[tuple[int, int], tuple[int, int]] = {}
    for x, y, hlen, hcod in rows:
        key = (hcod, hlen)
        if key in codes:
            raise Mp3FormatError(f"duplicate code {key}")
        codes[key] = (x, y)
    lens = {l for _, l in codes}
    for (c, l) in codes:
        for l2 in lens:
            if l2 <= l:
                continue
            # any longer code starting with c's bits breaks prefix-freeness
            for (c2, l2b) in codes:
                if l2b == l2 and (c2 >> (l2 - l)) == c:
                    raise Mp3FormatError("table is not prefix-free")
    return codes


# slen1/slen2 per scalefac_compress (published Layer III constants).
SLEN1 = [0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4]
SLEN2 = [0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3]


def decode_granule_spectrum(bits: _Bits, g: GranuleInfo,
                            tables: dict) -> np.ndarray:
    """Main-data decode of ONE mono long-block granule into its 576
    integer spectral lines: scalefactors (slen bit-skip; the synthetic
    and exact-oracle paths use scalefac_compress=0 == zero part2 bits),
    then the big_values region pair-coded against
    ``table_select`` entries, then count1 quadruples until
    ``part2_3_length`` bits are consumed.  The part2_3 bit budget is
    enforced EXACTLY — a one-bit table error desyncs and raises, which
    is the self-check property real streams exercise.  linbits escape
    values follow the published (15 + linbits) rule; sign bits trail
    every nonzero value."""
    start = bits.pos
    budget = g.part2_3_length
    s1, s2 = SLEN1[g.scalefac_compress], SLEN2[g.scalefac_compress]
    for _ in range(11):
        if s1:
            bits.read(s1)
    for _ in range(10):
        if s2:
            bits.read(s2)
    huff = tables["huffman"]
    linbits_map = {int(k): v for k, v in tables.get("linbits", {}).items()}
    # Big-values region boundaries are PER-GRANULE in the spec: indices
    # into the sample-rate scalefactor-band table (ISO 11172-3 B.8,
    # shipped as tables["sfband"] — data, like B.7/B.3).  The synthetic
    # path may instead pin a static tables["region_bounds"] pair.
    if "sfband" in tables:
        sfb = tables["sfband"]  # long-block band start indices, ending 576
        i0 = min(g.region0_count + 1, len(sfb) - 1)
        i1 = min(g.region0_count + 1 + g.region1_count + 1, len(sfb) - 1)
        bounds = [sfb[i0], sfb[i1]]
    else:
        bounds = tables["region_bounds"]  # [b0, b1] spectral-line boundaries
    xs = np.zeros(576, dtype=np.int64)

    def read_code(tbl_id: int) -> tuple[int, int]:
        codes = _decoder_cache(huff, tbl_id)
        c, l = 0, 0
        while (c, l) not in codes:
            if l > 24 or bits.pos - start > budget:
                raise Mp3FormatError("Huffman desync (bad table or stream)")
            c = (c << 1) | bits.read(1)
            l += 1
        return codes[(c, l)]

    def read_linbits_sign(v: int, tbl_id: int) -> int:
        if v == 15 and linbits_map.get(tbl_id, 0):
            v += bits.read(linbits_map[tbl_id])
        if v and bits.read(1):
            v = -v
        return v

    regions = [(0, min(bounds[0], 2 * g.big_values), g.table_select[0]),
               (min(bounds[0], 2 * g.big_values),
                min(bounds[1], 2 * g.big_values), g.table_select[1]),
               (min(bounds[1], 2 * g.big_values), 2 * g.big_values,
                g.table_select[2] if len(g.table_select) > 2 else 0)]
    for lo, hi, tbl in regions:
        i = lo
        while i < hi:
            if tbl == 0:
                xs[i], xs[i + 1] = 0, 0
            else:
                x, y = read_code(tbl)
                xs[i] = read_linbits_sign(x, tbl)
                xs[i + 1] = read_linbits_sign(y, tbl)
            i += 2
    # count1 region: quadruples until the bit budget is exhausted
    i = 2 * g.big_values
    c1 = tables["count1"][str(g.count1table_select)]
    c1codes = {(int(c), int(l)): tuple(v) for c, l, *v in c1}
    while bits.pos - start < budget and i + 3 < 576:
        c, l = 0, 0
        while (c, l) not in c1codes:
            if l > 10 or bits.pos - start > budget:
                raise Mp3FormatError("count1 desync")
            c = (c << 1) | bits.read(1)
            l += 1
        quad = c1codes[(c, l)]
        for v in quad:
            vv = int(v)
            if vv and bits.read(1):
                vv = -vv
            xs[i] = vv
            i += 1
    used = bits.pos - start
    if used != budget:
        raise Mp3FormatError(
            f"part2_3_length mismatch: used {used}, advertised {budget}"
        )
    return xs


_DECODER_CACHE: dict[tuple[int, int], dict] = {}


def _decoder_cache(huff: dict, tbl_id: int) -> dict:
    key = (id(huff), tbl_id)
    if key not in _DECODER_CACHE:
        _DECODER_CACHE[key] = build_huffman_decoder(
            [list(r) for r in huff[str(tbl_id)]]
        )
    return _DECODER_CACHE[key]


def decode_mp3(data: bytes) -> tuple[np.ndarray, int]:
    """Full-stream decode: structure layers run unconditionally, then
    the spectral chain (Huffman -> requantize -> alias -> IMDCT ->
    overlap-add -> frequency inversion -> polyphase synthesis) against
    the deployed tables.  Raises :class:`Mp3TablesUnavailable` with
    deployment instructions when the published data tables are absent
    (BEFORE any partial output).  Mono long-block path — the shape the
    mechanism tests and exact oracles drive end-to-end; stereo/short
    paths reuse the same per-granule stages."""
    frames = index_frames(data)
    if not frames:
        raise Mp3FormatError("no Layer III frames found")
    tables = load_tables()
    d_window = np.asarray(tables["synth_window"], dtype=np.float64)
    pcm = []
    v_state = np.zeros(1024)
    overlaps = np.zeros((32, 18))
    for fh in frames:
        si = parse_side_info(data, fh)
        md_start = fh.offset + 4 + (2 if fh.crc else 0) + fh.side_info_len
        main = data[md_start : fh.offset + fh.frame_len]
        if si.main_data_begin:
            raise Mp3FormatError(
                "bit-reservoir streams need the multi-frame assembly the "
                "ledger audits; the exact-oracle path writes reservoir-free "
                "frames (main_data_begin=0)"
            )
        bits = _Bits(main)
        for gr in si.granules:
            g = gr[0]  # mono
            if g.window_switching:
                raise Mp3FormatError(
                    "switched-block synthesis not wired in the gated "
                    "path (long-block granules only)"
                )
            xs = decode_granule_spectrum(bits, g, tables)
            xr = requantize(xs, g.global_gain)
            xr = alias_reduce(xr)
            sb = np.empty((18, 32))
            for band in range(32):
                out, overlaps[band] = hybrid_synthesis_long(
                    xr[band * 18 : (band + 1) * 18], g.block_type, overlaps[band]
                )
                sb[:, band] = out
            sb = frequency_inversion(sb)
            out, v_state = polyphase_synthesis(sb, d_window, v_state)
            pcm.append(out)
    return np.concatenate(pcm), frames[0].sample_rate


def mp3_stream_stats(data: bytes) -> dict:
    """Container-level stats (the structure layer's public product):
    frame count, duration, bitrate profile, reservoir health."""
    frames = index_frames(data)
    if not frames:
        raise Mp3FormatError("no Layer III frames found")
    ledger = (
        reservoir_ledger(data, frames) if frames[0].is_mpeg1 else []
    )
    sr = frames[0].sample_rate
    return {
        "n_frames": len(frames),
        "sample_rate": sr,
        "mode": frames[0].mode,
        "duration_s": round(sum(f.samples for f in frames) / sr, 6),
        "kbps_min": min(f.bitrate_kbps for f in frames),
        "kbps_max": max(f.bitrate_kbps for f in frames),
        "bytes_audio": sum(f.frame_len for f in frames),
        "reservoir_violations": sum(
            0 if r["reservoir_ok"] else 1 for r in ledger
        ),
        "block_type_violations": sum(
            0 if r["block_types_ok"] else 1 for r in ledger
        ),
    }

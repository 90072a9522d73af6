"""Baseline JPEG codec (ITU T.81 sequential DCT, 4:4:4) — pure
stdlib + numpy.

The last media format on the "needs native libs" list that actually
doesn't: baseline JPEG is huffman coding + an 8x8 DCT, both fully
implementable from the public specification.  This module ships a
REAL decoder — marker parse, canonical huffman table construction,
entropy decode with DC prediction and byte-unstuffing, zigzag,
dequantization, float64 IDCT, YCbCr->RGB — plus the matching encoder
used for corpus/fixture generation.

Scope (explicit, error-checked): baseline sequential, 8-bit, 3
components, 4:4:4 sampling, dimensions multiple of 8.  Progressive,
subsampled, or restart-marker streams raise ``ValueError`` — honest
subset, not a guess.

Determinism contract (what lets an independent engine verify real
decodes): every lossy rounding in BOTH codec directions is
``floor(x + 0.5)`` (half-up), and the DC-only reconstruction of a
constant block is exact in IEEE double (``DCq * q00 / 8`` is an
integer scaled by a power of two), so for block-constant images the
decoded pixels are an exact closed form of the source color — the
DuckDB oracle in ``queries_media.py`` recomputes it without touching
a byte.  General (non-constant) blocks decode through the same code
path; tests cover them via round-trip energy bounds and an
independent numpy reconstruction.

Quantization uses the ITU T.81 Annex K example tables (the public
"quality 50" matrices) — q00 is 16 (luma) / 17 (chroma), which the
oracle mirrors as literals.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Constants from the public spec (ITU T.81 Annex K examples)
# ---------------------------------------------------------------------------

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# Annex K huffman table specs: (BITS[1..16], HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# Progressive AC table (written into the stream as DHT id 2, so any
# spec decoder reads it like any other table): the Annex K baseline AC
# tables have NO codes for the EOBn symbols (r<<4 with r=1..14, Annex
# G only), so progressive scans use this flat canonical table covering
# every symbol a progressive AC scan can emit — EOB0..EOB14, ZRL, and
# (run<<4)|size for run 0..15 / size 1..10.  All 176 symbols at code
# length 8 (an incomplete canonical code; compression optimality is
# not this encoder's job, spec-shaped streams are).
_AC_PROG_VALS = (
    [0x00]
    + [r << 4 for r in range(1, 15)]
    + [0xF0]
    + [(run << 4) | size for run in range(16) for size in range(1, 11)]
)
_AC_PROG_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_PROG_VALS),
                 0, 0, 0, 0, 0, 0, 0, 0]


def _zigzag_order() -> np.ndarray:
    """Zigzag scan order: result[i] = flat (row*8+col) index of the
    i-th zigzag position — built programmatically (a 64-entry literal
    is exactly the kind of table a typo silently corrupts)."""
    order = []
    for s in range(15):
        ks = range(max(0, s - 7), min(s, 7) + 1)
        diag = [(k, s - k) for k in ks]
        if s % 2 == 0:
            diag.reverse()  # even diagonals run bottom-left -> top-right
        order.extend(r * 8 + c for r, c in diag)
    return np.array(order, dtype=np.int64)


_ZIGZAG = _zigzag_order()

def _dct_basis() -> np.ndarray:
    """8x8 DCT basis C with C[u, x] = c(u)/2 * cos((2x+1) u pi / 16)."""
    u = np.arange(8).reshape(8, 1).astype(np.float64)
    x = np.arange(8).reshape(1, 8).astype(np.float64)
    c = np.where(u == 0, 1 / np.sqrt(2), 1.0)
    return c / 2 * np.cos((2 * x + 1) * u * np.pi / 16)


_DCT_C = _dct_basis()


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5) — the single rounding used everywhere in this
    codec, chosen because it is exactly reproducible in SQL."""
    return np.floor(x + 0.5)


# ---------------------------------------------------------------------------
# Huffman table machinery (canonical construction from BITS/HUFFVAL)
# ---------------------------------------------------------------------------


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical T.81 assignment."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (the pre-marker fill)."""
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)

    def append_marker(self, code: int) -> None:
        """Emit a raw marker (0xFF <code>) into the entropy stream —
        NOT through write(), which would stuff the 0xFF."""
        self.align()
        self.out.append(0xFF)
        self.out.append(code)

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream exhausted")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream ends on 0xFF")
            marker = self.data[self.pos]
            if marker == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{marker:02X} inside an "
                    "entropy-coded interval"
                )
        self.acc = (self.acc << 8) | b
        self.n += 8

    def sync_restart(self, expected: int) -> None:
        """Consume an RSTn marker at a restart boundary: discard the
        pad bits of the finished interval, then require the cyclically
        expected 0xFFD0+n at the byte position (ITU T.81 E.1.4 — a
        wrong or missing RSTn means the stream lost sync).  Fill 0xFF
        bytes before the marker (T.81 B.1.1.2) are consumed."""
        self.acc = 0
        self.n = 0
        while (
            self.pos + 2 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0xFF
        ):
            self.pos += 1  # fill byte before the restart marker
        if self.pos + 2 > len(self.data):
            raise ValueError("JPEG stream truncated at restart boundary")
        if self.data[self.pos] != 0xFF or (
            self.data[self.pos + 1] != 0xD0 + expected
        ):
            raise ValueError(
                f"JPEG restart marker RST{expected} missing at byte "
                f"{self.pos}"
            )
        self.pos += 2

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        bit = (self.acc >> self.n) & 1
        self.acc &= (1 << self.n) - 1  # keep acc bounded
        return bit

    def read_bits(self, length: int) -> int:
        while self.n < length:
            self._fill()
        self.n -= length
        v = (self.acc >> self.n) & ((1 << length) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        # Peek-based canonical huffman: extract the top `length` bits
        # in one integer op per candidate length instead of one call
        # per bit (the standard fast-decoder structure; ~3x on the
        # entropy-bound path).
        for length in range(1, 17):
            while self.n < length:
                self._fill()
            code = (self.acc >> (self.n - length)) & ((1 << length) - 1)
            sym = table.get((length, code))
            if sym is not None:
                self.n -= length
                self.acc &= (1 << self.n) - 1
                return sym
        raise ValueError("invalid JPEG huffman code")


def _magnitude_category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_magnitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _decode_magnitude(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits >> (size - 1):
        return bits
    return bits - (1 << size) + 1


# ---------------------------------------------------------------------------
# Color transforms (single rounding definition, SQL-reproducible)
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.int32)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(_round_half_up(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _validated_rgb(rgb: np.ndarray, who: str,
                   hy: int = 1, vy: int = 1) -> np.ndarray:
    a = np.asarray(rgb, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"{who} wants (h, w, 3), got {rgb.shape}")
    if a.shape[0] % (8 * vy) or a.shape[1] % (8 * hy):
        raise ValueError(
            f"{who} wants dimensions that are multiples of the MCU "
            f"size ({8 * hy}x{8 * vy})"
        )
    return a


# Luma sampling factors per sampling mode; chroma is always 1x1.
# "422" halves chroma horizontally, "420" halves it both ways — the
# two subsampled layouts that dominate real-world JPEG.
_SAMPLINGS: dict[str, tuple[int, int]] = {
    "444": (1, 1),
    "422": (2, 1),
    "420": (2, 2),
}


def _sampling_factors(sampling: str) -> tuple[int, int]:
    try:
        return _SAMPLINGS[sampling]
    except KeyError:
        raise ValueError(
            f"unsupported JPEG sampling {sampling!r} "
            f"(one of {sorted(_SAMPLINGS)})"
        ) from None


def _scan_order(
    comp_idxs: tuple[int, ...],
    geo: list[tuple[int, int, int, int]],
    mcx: int, mcy: int,
) -> list[tuple[int, int, int]]:
    """(scan_slot, component, block_index) sequence of one scan.
    Interleaved scans follow T.81 A.2.3: per MCU, each component
    contributes its hc x vc blocks raster-first within the MCU.
    Non-interleaved (single-component) scans are pure raster order
    over that component's own block array."""
    if len(comp_idxs) == 1:
        (c,) = comp_idxs
        _hc, _vc, bw, bh = geo[c]
        return [(0, c, bi) for bi in range(bw * bh)]
    order = []
    for mi in range(mcx * mcy):
        my, mx = divmod(mi, mcx)
        for si, c in enumerate(comp_idxs):
            hc, vc, bw, _bh = geo[c]
            for v in range(vc):
                for hh in range(hc):
                    order.append(
                        (si, c, (my * vc + v) * bw + (mx * hc + hh))
                    )
    return order


def _quantized_plane(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """FDCT + quantize + zigzag every 8x8 block of one component
    plane: returns ``(n_blocks, 64)`` int64, blocks in raster order —
    the coefficient domain BOTH entropy codings (baseline sequential
    and progressive) transport losslessly, so the two encoders share
    this exactly."""
    h, w = plane.shape
    blocks = np.zeros((h // 8 * (w // 8), 64), dtype=np.int64)
    bi = 0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            block = plane[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
            coeffs = _DCT_C @ block @ _DCT_C.T
            # The DC basis is constant 1/(2*sqrt(2)), so DC is
            # exactly sum(block)/8 — a dyadic value IEEE doubles
            # represent exactly, where the cos-product form is off
            # by 1 ulp.  That ulp matters: luma q00=16 puts odd
            # sums exactly ON the quantizer's half boundary, and
            # the quantized DC must round the way exact arithmetic
            # does for decodes to be closed-form verifiable.
            coeffs[0, 0] = block.sum() / 8.0
            q = _round_half_up(coeffs / quant).astype(np.int64)
            blocks[bi] = q.reshape(-1)[_ZIGZAG]
            bi += 1
    return blocks


def _downsample(plane: np.ndarray, fh: int, fv: int) -> np.ndarray:
    """Box-mean chroma downsample by (fh, fv) with the codec's single
    rounding (floor(x+0.5)) — exact on regions constant within each
    fh x fv box, which is what keeps MCU-constant tiles closed-form
    verifiable through the subsampled path."""
    if fh == 1 and fv == 1:
        return plane
    h, w = plane.shape
    a = plane.astype(np.float64).reshape(h // fv, fv, w // fh, fh)
    return np.clip(
        _round_half_up(a.mean(axis=(1, 3))), 0, 255
    ).astype(np.int32)


def _component_planes(ycc: np.ndarray, hy: int, vy: int) -> list[np.ndarray]:
    """Y at full resolution, Cb/Cr downsampled by the luma factors
    (chroma sampling is 1x1, so the ratio to Y is hy x vy)."""
    return [ycc[:, :, 0]] + [
        _downsample(ycc[:, :, c], hy, vy) for c in (1, 2)
    ]


def _quantized_zigzag(ycc: np.ndarray,
                      hy: int = 1, vy: int = 1) -> list[np.ndarray]:
    """Per-component quantized-zigzag blocks (chroma downsampled by
    the luma sampling factors first)."""
    planes = _component_planes(ycc, hy, vy)
    return [
        _quantized_plane(planes[c],
                         QUANT_LUMA if c == 0 else QUANT_CHROMA)
        for c in range(3)
    ]


def _mcu_geometry(
    sfactors: list[tuple[int, int]], w: int, h: int
) -> tuple[int, int, list[tuple[int, int, int, int]]]:
    """MCU grid (mcus across, mcus down) and per-component
    ``(hc, vc, blocks_across, blocks_down)`` for an interleaved scan.
    Requires integer sampling ratios and MCU-aligned dimensions (this
    codec does not implement partial-MCU edge padding — honest subset,
    typed error otherwise)."""
    hmax = max(hc for hc, _vc in sfactors)
    vmax = max(vc for _hc, vc in sfactors)
    if w % (8 * hmax) or h % (8 * vmax):
        raise ValueError(
            f"JPEG dimensions not multiples of the MCU size "
            f"({8 * hmax}x{8 * vmax}; padding not supported)"
        )
    geo = []
    for hc, vc in sfactors:
        if hmax % hc or vmax % vc:
            raise ValueError(
                f"non-integer JPEG sampling ratio ({hc}x{vc} vs max "
                f"{hmax}x{vmax}) not supported"
            )
        geo.append((hc, vc, w * hc // (hmax * 8), h * vc // (vmax * 8)))
    return w // (8 * hmax), h // (8 * vmax), geo


_ENC_DC_TABS = None
_ENC_AC_TABS = None


def _encode_tabs() -> tuple[list[dict], list[dict]]:
    global _ENC_DC_TABS, _ENC_AC_TABS
    if _ENC_DC_TABS is None:
        _ENC_DC_TABS = [
            _build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS),
            _build_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
        ]
        _ENC_AC_TABS = [
            _build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS),
            _build_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS),
        ]
    return _ENC_DC_TABS, _ENC_AC_TABS


def _dht_segment(cls: int, tid: int, bits: list[int],
                 vals: list[int]) -> bytes:
    payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    return struct.pack(">HH", 0xFFC4, 2 + len(payload)) + payload


def _headers(h: int, w: int, sof_marker: int,
             hy: int = 1, vy: int = 1) -> bytes:
    """SOI + DQT/SOF/DHT segments shared by both encoders; only the
    SOF marker differs (0xFFC0 baseline, 0xFFC2 progressive).
    ``hy``/``vy`` are the luma sampling factors (chroma is 1x1)."""

    def dqt(tq: int, table: np.ndarray) -> bytes:
        zz = table.reshape(-1)[_ZIGZAG].astype(np.uint8)
        return struct.pack(">HHB", 0xFFDB, 67, tq) + zz.tobytes()

    out = bytearray(b"\xff\xd8")  # SOI
    out += dqt(0, QUANT_LUMA)
    out += dqt(1, QUANT_CHROMA)
    # SOF: 8-bit, 3 components, luma at (hy, vy), chroma 1x1
    out += struct.pack(">HHBHHB", sof_marker, 17, 8, h, w, 3)
    for cid, samp, tq in ((1, (hy << 4) | vy, 0), (2, 0x11, 1), (3, 0x11, 1)):
        out += bytes([cid, samp, tq])
    out += _dht_segment(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _dht_segment(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    out += _dht_segment(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
    out += _dht_segment(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    return bytes(out)


def _sos(comp_idxs: tuple[int, ...], ss: int, se: int,
         ah: int, al: int, ac_tid: int | None = None) -> bytes:
    """SOS header for a scan over the given component indices
    (0=Y luma tables, 1/2=chroma tables; component ids are idx+1).
    ``ac_tid`` overrides the AC table id (progressive AC scans use
    the shared DHT id 2)."""
    out = struct.pack(">HHB", 0xFFDA, 6 + 2 * len(comp_idxs),
                      len(comp_idxs))
    for c in comp_idxs:
        tsel = 0 if c == 0 else 1
        # T.81 Table B.3: Ta shall be 0 when Ss = Se = 0 (a DC scan
        # uses no AC table) — lenient decoders ignore Ta there, but
        # strict validators reject a nonzero selector.  Baseline's
        # interleaved scan is Ss=0, Se=63 and DOES use its AC selector.
        atid = (
            0 if ss == 0 and se == 0
            else (tsel if ac_tid is None else ac_tid)
        )
        out += bytes([c + 1, (tsel << 4) | atid])
    return out + bytes([ss, se, (ah << 4) | al])


def _encode_block(writer: _BitWriter, zz: np.ndarray, pred: int,
                  dc_tab: dict, ac_tab: dict) -> int:
    """Baseline entropy coding of one quantized-zigzag block; returns
    the new DC prediction."""
    diff = int(zz[0]) - pred
    size = _magnitude_category(diff)
    code, ln = dc_tab[size]
    writer.write(code, ln)
    if size:
        writer.write(_encode_magnitude(diff, size), size)
    run = 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        size = _magnitude_category(v)
        code, ln = ac_tab[(run << 4) | size]
        writer.write(code, ln)
        writer.write(_encode_magnitude(v, size), size)
        run = 0
    if run:
        code, ln = ac_tab[0x00]  # EOB
        writer.write(code, ln)
    return int(zz[0])


def jpeg_encode(rgb: np.ndarray, restart_interval: int = 0,
                sampling: str = "444") -> bytes:
    """Encode ``uint8 (h, w, 3)`` RGB (h, w multiples of the MCU size)
    as a baseline sequential JPEG with the Annex K tables.
    ``restart_interval`` > 0 emits a DRI segment and the cyclic RSTn
    markers every that many MCUs (byte-aligned, DC prediction reset —
    T.81 E.1.4), the resync structure real camera JPEGs carry.
    ``sampling`` picks the chroma layout: "444" (1x1 MCUs, the
    historical default), "422" (chroma halved horizontally, 16x8
    MCUs), or "420" (halved both ways, 16x16 MCUs) — MCUs interleave
    the luma blocks raster-first within each MCU per T.81 A.2.3."""
    hy, vy = _sampling_factors(sampling)
    a = _validated_rgb(rgb, "jpeg_encode", hy, vy)
    h, w = a.shape[0], a.shape[1]
    if not 0 <= restart_interval <= 65535:
        raise ValueError("restart interval must fit in 16 bits")
    zz_all = _quantized_zigzag(_rgb_to_ycbcr(a), hy, vy)
    dc_tabs, ac_tabs = _encode_tabs()
    sfactors = [(hy, vy), (1, 1), (1, 1)]
    mcx, mcy, geo = _mcu_geometry(sfactors, w, h)

    writer = _BitWriter()
    pred = [0, 0, 0]
    rst = 0
    for mi in range(mcx * mcy):
        if restart_interval and mi and mi % restart_interval == 0:
            writer.append_marker(0xD0 + rst)
            rst = (rst + 1) & 7
            pred = [0, 0, 0]
        my, mx = divmod(mi, mcx)
        for comp in range(3):
            tsel = 0 if comp == 0 else 1
            hc, vc, bw, _bh = geo[comp]
            for v in range(vc):
                for hh in range(hc):
                    bi = (my * vc + v) * bw + (mx * hc + hh)
                    pred[comp] = _encode_block(
                        writer, zz_all[comp][bi], pred[comp],
                        dc_tabs[tsel], ac_tabs[tsel],
                    )

    out = bytearray(_headers(h, w, 0xFFC0, hy, vy))
    if restart_interval:
        out += struct.pack(">HHH", 0xFFDD, 4, restart_interval)
    out += _sos((0, 1, 2), 0, 63, 0, 0)
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# Progressive scan script: DC first (interleaved, one point-transform
# bit held back), DC refinement, then per-component spectral-selection
# AC bands at Al=1 followed by their successive-approximation
# refinement passes — exercising every progressive coding mode of ITU
# T.81 Annex G (DC first/refine, AC first with EOB runs, AC refine
# with correction bits).
_PROG_SCRIPT: tuple[tuple[tuple[int, ...], int, int, int, int], ...] = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((0,), 1, 5, 0, 1), ((1,), 1, 5, 0, 1), ((2,), 1, 5, 0, 1),
    ((0,), 6, 63, 0, 1), ((1,), 6, 63, 0, 1), ((2,), 6, 63, 0, 1),
    ((0,), 1, 5, 1, 0), ((1,), 1, 5, 1, 0), ((2,), 1, 5, 1, 0),
    ((0,), 6, 63, 1, 0), ((1,), 6, 63, 1, 0), ((2,), 6, 63, 1, 0),
)


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: divide by 2^al TRUNCATING TOWARD ZERO (ITU
    T.81 G.1.2.2 — an arithmetic shift would change the sign class of
    small negatives)."""
    return v >> al if v >= 0 else -((-v) >> al)


def _encode_dc_first(writer: _BitWriter, zz_all: list[np.ndarray],
                     n_scomps: int, al: int, dc_tabs: list[dict],
                     order: list[tuple[int, int, int]]) -> None:
    pred = [0] * n_scomps
    for si, c, bi in order:
        tsel = 0 if c == 0 else 1
        v = int(zz_all[c][bi, 0]) >> al  # DC point transform: shift
        diff = v - pred[si]
        pred[si] = v
        size = _magnitude_category(diff)
        code, ln = dc_tabs[tsel][size]
        writer.write(code, ln)
        if size:
            writer.write(_encode_magnitude(diff, size), size)


def _encode_dc_refine(writer: _BitWriter, zz_all: list[np.ndarray],
                      al: int, order: list[tuple[int, int, int]]) -> None:
    for _si, c, bi in order:
        writer.write((int(zz_all[c][bi, 0]) >> al) & 1, 1)


def _emit_eobn(writer: _BitWriter, tab: dict, length: int) -> None:
    """EOBn: huffman (r<<4)|0 with r extra bits, run = 2^r + bits."""
    r = length.bit_length() - 1
    code, ln = tab[r << 4]
    writer.write(code, ln)
    if r:
        writer.write(length - (1 << r), r)


def _encode_ac_first(writer: _BitWriter, zz: np.ndarray, ss: int, se: int,
                     al: int, tab: dict) -> None:
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        while eobrun > 0:
            chunk = min(eobrun, 32767)
            _emit_eobn(writer, tab, chunk)
            eobrun -= chunk

    for bi in range(zz.shape[0]):
        band = [_pt_ac(int(v), al) for v in zz[bi, ss : se + 1]]
        nz = [k for k, v in enumerate(band) if v]
        if not nz:
            eobrun += 1
            if eobrun == 32767:
                flush()
            continue
        flush()
        run = 0
        for k in range(nz[-1] + 1):
            v = band[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = tab[0xF0]  # ZRL
                writer.write(code, ln)
                run -= 16
            size = _magnitude_category(v)
            code, ln = tab[(run << 4) | size]
            writer.write(code, ln)
            writer.write(_encode_magnitude(v, size), size)
            run = 0
        if nz[-1] < se - ss:  # trailing zeros end the block with an EOB
            eobrun += 1
            if eobrun == 32767:
                flush()
    flush()


def _encode_ac_refine(writer: _BitWriter, zz: np.ndarray, ss: int, se: int,
                      al: int, tab: dict) -> None:
    """Successive-approximation AC refinement (T.81 G.1.2.3): one
    correction bit per already-significant coefficient, run-length +
    sign for newly-significant ones, correction bits appended after
    each code in the positional order the decoder's walk consumes
    them, EOB runs carrying the buffered correction bits of every
    block they cover."""
    ah = al + 1
    eob_blocks: list[list[int]] = []  # correction bits per EOB-run block

    def flush() -> None:
        while eob_blocks:
            chunk = eob_blocks[: min(len(eob_blocks), 32767)]
            del eob_blocks[: len(chunk)]
            _emit_eobn(writer, tab, len(chunk))
            for bits in chunk:
                for b in bits:
                    writer.write(b, 1)

    for bi in range(zz.shape[0]):
        raw = [int(v) for v in zz[bi, ss : se + 1]]
        prev = [_pt_ac(v, ah) for v in raw]
        now = [_pt_ac(v, al) for v in raw]
        newly = [k for k in range(len(raw)) if prev[k] == 0 and now[k] != 0]
        if not newly:
            eob_blocks.append(
                [abs(now[k]) & 1 for k in range(len(raw)) if prev[k] != 0]
            )
            continue
        flush()
        last_new = newly[-1]
        # events up to (and including) the last newly-significant coef:
        # 'c'orrection bit / zero-history 'z'ero / 'n'ew-with-sign
        events: list[tuple[str, int]] = []
        for k in range(last_new + 1):
            if prev[k] != 0:
                events.append(("c", abs(now[k]) & 1))
            elif now[k] == 0:
                events.append(("z", 0))
            else:
                if abs(now[k]) != 1:
                    raise AssertionError(
                        "refine invariant: newly-significant magnitude "
                        "must be 1"
                    )
                events.append(("n", 1 if now[k] > 0 else 0))
        i = 0
        while i < len(events):
            j = i
            run = 0
            while events[j][0] != "n":
                if events[j][0] == "z":
                    run += 1
                j += 1
            while run > 15:
                code, ln = tab[0xF0]  # ZRL: consumes 16 zero-history slots
                writer.write(code, ln)
                zcnt = 0
                while zcnt < 16:
                    kind, bit = events[i]
                    i += 1
                    if kind == "z":
                        zcnt += 1
                    else:  # 'c' — read by the decoder's run walk
                        writer.write(bit, 1)
                run -= 16
            code, ln = tab[(run << 4) | 1]
            writer.write(code, ln)
            writer.write(events[j][1], 1)  # sign bit
            while i <= j:  # correction bits the placement walk consumes
                kind, bit = events[i]
                i += 1
                if kind == "c":
                    writer.write(bit, 1)
        if last_new < len(raw) - 1:  # band tail joins an EOB run
            eob_blocks.append(
                [abs(now[k]) & 1
                 for k in range(last_new + 1, len(raw)) if prev[k] != 0]
            )
    flush()


def jpeg_encode_progressive(
    rgb: np.ndarray,
    script: tuple[tuple[tuple[int, ...], int, int, int, int], ...]
    | None = None,
    sampling: str = "444",
) -> bytes:
    """Encode ``uint8 (h, w, 3)`` RGB (h, w multiples of the MCU size)
    as a PROGRESSIVE JPEG (SOF2) with the Annex K tables and the
    14-scan spectral-selection + successive-approximation script in
    ``_PROG_SCRIPT`` (or a caller-supplied spec-legal ``script`` — the
    tests drive alternative scripts through the same decoder).  The
    quantized coefficients are identical to :func:`jpeg_encode`'s at
    the same ``sampling`` — progressive is a different ENTROPY CODING
    of the same data, so decoding either stream must yield the same
    pixels (the cross-check the tests pin).  Interleaved (DC) scans of
    a subsampled image follow MCU order per T.81 A.2.3; AC scans are
    per-component raster (G.1.1.1.1)."""
    hy, vy = _sampling_factors(sampling)
    a = _validated_rgb(rgb, "jpeg_encode_progressive", hy, vy)
    h, w = a.shape[0], a.shape[1]
    zz_all = _quantized_zigzag(_rgb_to_ycbcr(a), hy, vy)
    dc_tabs, _ = _encode_tabs()
    sfactors = [(hy, vy), (1, 1), (1, 1)]
    mcx, mcy, geo = _mcu_geometry(sfactors, w, h)

    prog_ac = _build_encode_table(_AC_PROG_BITS, _AC_PROG_VALS)
    out = bytearray(_headers(h, w, 0xFFC2, hy, vy))
    out += _dht_segment(1, 2, _AC_PROG_BITS, _AC_PROG_VALS)
    for comp_idxs, ss, se, ah, al in (script or _PROG_SCRIPT):
        writer = _BitWriter()
        if ss == 0:
            order = _scan_order(comp_idxs, geo, mcx, mcy)
            out += _sos(comp_idxs, ss, se, ah, al)
            if ah == 0:
                _encode_dc_first(writer, zz_all, len(comp_idxs), al,
                                 dc_tabs, order)
            else:
                _encode_dc_refine(writer, zz_all, al, order)
        else:
            if len(comp_idxs) != 1:
                raise ValueError(
                    "progressive AC scan must be single-component"
                )
            out += _sos(comp_idxs, ss, se, ah, al, ac_tid=2)
            (c,) = comp_idxs
            if ah == 0:
                _encode_ac_first(writer, zz_all[c], ss, se, al, prog_ac)
            else:
                _encode_ac_refine(writer, zz_all[c], ss, se, al, prog_ac)
        out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _entropy_end(data: bytes, start: int) -> int:
    """Offset of the marker terminating the entropy-coded segment that
    begins at ``start``.  Restart markers and stuffed 0x00 bytes are
    INSIDE the segment (T.81 B.2.5); spec-legal fill 0xFF bytes may
    precede ANY marker, including an in-scan RSTn (B.1.1.2), so a run
    of 0xFF is classified by its first non-0xFF byte: continue past a
    stuffed 0x00 or an RSTn (consuming the fill), terminate on
    anything else — returning the offset of the first 0xFF of the run
    (the marker walk upstream skips the fill itself)."""
    p = start
    while p + 1 < len(data):
        if data[p] != 0xFF:
            p += 1
            continue
        q = p
        while q + 1 < len(data) and data[q + 1] == 0xFF:
            q += 1  # fill bytes
        if q + 1 >= len(data):
            break
        nxt = data[q + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
            p = q + 2  # stuffed byte / restart marker: still in-scan
        else:
            return p
    raise ValueError("JPEG scan not terminated by a marker")


def _tbl(tables: dict, key: int, kind: str):
    try:
        return tables[key]
    except KeyError:
        raise ValueError(
            f"JPEG scan references undefined {kind} table {key}"
        ) from None


def _decode_baseline_scan(reader: _BitReader,
                          scomps: list[tuple[int, int, int]],
                          coefs: list[np.ndarray],
                          dc_tables: dict, ac_tables: dict,
                          order: list[tuple[int, int, int]],
                          blocks_per_mcu: int,
                          restart_interval: int = 0) -> None:
    """Baseline entropy decode in the (scan_slot, component, block)
    sequence of ``order`` (MCU-interleaved per T.81 A.2.3 — for
    subsampled streams each MCU carries hc x vc luma blocks).  Restart
    boundaries fall every ``restart_interval`` MCUs, i.e. every
    ``restart_interval * blocks_per_mcu`` entries of the order."""
    pred = [0] * len(scomps)
    rst = 0
    rst_every = restart_interval * blocks_per_mcu
    for oi, (si, c, bi) in enumerate(order):
        if rst_every and oi and oi % rst_every == 0:
            # byte-align, require the cyclic RSTn, reset DC prediction
            # (T.81 E.1.4 / F.2.1.3.1)
            reader.sync_restart(rst)
            rst = (rst + 1) & 7
            pred = [0] * len(scomps)
        _cid, dc_tid, ac_tid = scomps[si]
        zz = coefs[c][bi]
        size = reader.read_symbol(_tbl(dc_tables, dc_tid, "DC"))
        if size > 15:
            raise ValueError("bad JPEG DC size category")
        diff = _decode_magnitude(reader.read_bits(size), size)
        pred[si] += diff
        zz[0] = pred[si]
        ac = _tbl(ac_tables, ac_tid, "AC")
        i = 1
        while i < 64:
            sym = reader.read_symbol(ac)
            if sym == 0x00:  # EOB
                break
            run, size = sym >> 4, sym & 0x0F
            if size == 0:
                if run != 15:
                    raise ValueError("bad JPEG AC symbol")
                i += 16  # ZRL
                continue
            i += run
            if i > 63:
                raise ValueError("JPEG AC run overflows block")
            zz[i] = _decode_magnitude(reader.read_bits(size), size)
            i += 1


def _decode_progressive_scan(reader: _BitReader,
                             scomps: list[tuple[int, int, int]],
                             cid_to_idx: dict[int, int],
                             coefs: list[np.ndarray],
                             dc_tables: dict, ac_tables: dict,
                             ss: int, se: int, ah: int, al: int,
                             order: list[tuple[int, int, int]]) -> None:
    """One progressive scan into the coefficient buffers (ITU T.81
    Annex G): DC first/refine (interleaved allowed, MCU-ordered via
    ``order`` so subsampled streams decode), AC first with EOB runs,
    AC successive-approximation refinement with correction bits.
    Scan geometry is script-driven from the SOS header — any
    spec-legal script decodes, not just the one our encoder emits."""
    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ah == 0:
            pred = [0] * len(scomps)
            for si, c, bi in order:
                _cid, dc_tid, _ac = scomps[si]
                size = reader.read_symbol(_tbl(dc_tables, dc_tid, "DC"))
                if size > 15:
                    raise ValueError("bad JPEG DC size category")
                diff = _decode_magnitude(reader.read_bits(size), size)
                pred[si] += diff
                coefs[c][bi, 0] = pred[si] << al
        else:  # refinement: one raw bit per block, no huffman
            for _si, c, bi in order:
                if reader.read_bit():
                    coefs[c][bi, 0] |= 1 << al
        return
    # AC scan: single component only (T.81 G.1.1.1.1)
    if len(scomps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if not (0 < ss <= se <= 63):
        raise ValueError("bad progressive spectral band")
    cid, _dc_tid, ac_tid = scomps[0]
    cf = coefs[_tbl(cid_to_idx, cid, "component")]
    n_blocks = cf.shape[0]
    tab = _tbl(ac_tables, ac_tid, "AC")
    eobrun = 0
    if ah == 0:  # first scan of this band at this Al
        for bi in range(n_blocks):
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                sym = reader.read_symbol(tab)
                r, s = sym >> 4, sym & 0x0F
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    eobrun = (1 << r) - 1  # run includes this block
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                k += r
                if k > se:
                    raise ValueError("JPEG AC run overflows band")
                cf[bi, k] = _decode_magnitude(reader.read_bits(s), s) << al
                k += 1
        return
    # refinement scan (G.1.2.3): correction bit per already-nonzero
    # coefficient, run+sign for newly-significant (magnitude 1 at this
    # bit), EOB runs still consume correction bits for every block
    p1 = 1 << al
    for bi in range(n_blocks):
        row = cf[bi]
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = reader.read_symbol(tab)
                r, s = sym >> 4, sym & 0x0F
                newval = 0
                if s == 0:
                    if r < 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    # r == 15: ZRL — skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("bad JPEG refine AC symbol")
                    newval = p1 if reader.read_bit() else -p1
                while k <= se:
                    if row[k] != 0:
                        if reader.read_bit() and (row[k] & p1) == 0:
                            row[k] += p1 if row[k] > 0 else -p1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval:
                    if k > se:
                        raise ValueError("JPEG refine run overflows band")
                    row[k] = newval
                k += 1
        if eobrun > 0:  # tail of this block + whole following blocks
            while k <= se:
                if row[k] != 0:
                    if reader.read_bit() and (row[k] & p1) == 0:
                        row[k] += p1 if row[k] > 0 else -p1
                k += 1
            eobrun -= 1


def _reconstruct(coefs: list[np.ndarray], comps: list[tuple[int, int, int, int]],
                 quant: dict[int, np.ndarray], h: int, w: int,
                 geo: list[tuple[int, int, int, int]]) -> np.ndarray:
    """Dequant + IDCT each component at its OWN sampled resolution,
    then box-replicate chroma up to full size (the inverse of the
    encoder's box-mean decimation — exact on regions constant within
    each sampling box, which is what keeps MCU-constant tiles
    closed-form verifiable through the subsampled path)."""
    hmax = max(hc for hc, _vc, _bw, _bh in geo)
    vmax = max(vc for _hc, vc, _bw, _bh in geo)
    planes = np.zeros((h, w, 3), dtype=np.int32)
    for ci, (_cid, tq, _hc, _vc) in enumerate(comps):
        qt = _tbl(quant, tq, "quantization")
        hc, vc, nbx, nby = geo[ci]
        plane = np.zeros((nby * 8, nbx * 8), dtype=np.int32)
        for bi in range(coefs[ci].shape[0]):
            zz = coefs[ci][bi]
            by, bx = (bi // nbx) * 8, (bi % nbx) * 8
            coeffs = np.zeros(64, dtype=np.float64)
            coeffs[_ZIGZAG] = zz
            block = coeffs.reshape(8, 8) * qt
            if not np.any(zz[1:]):
                # DC-only fast path (the standard reduced-IDCT
                # optimization, cf. libjpeg's scaled IDCTs): a
                # DC-only block is uniform at DC/8 + 128, and this
                # dyadic form is EXACT in IEEE double where the
                # general cos-product basis is off by 1 ulp at
                # half-boundaries — so it is both faster and the
                # reason constant-tile decodes are closed-form
                # verifiable (measured: 2 of 512 DC values round
                # differently through the general basis).
                val = _round_half_up(np.float64(block[0, 0]) / 8.0 + 128.0)
                plane[by : by + 8, bx : bx + 8] = int(np.clip(val, 0, 255))
            else:
                pixels = _DCT_C.T @ block @ _DCT_C + 128.0
                plane[by : by + 8, bx : bx + 8] = np.clip(
                    _round_half_up(pixels), 0, 255
                ).astype(np.int32)
        fy, fx = vmax // vc, hmax // hc
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes[:, :, ci] = plane[:h, :w]
    return _ycbcr_to_rgb(planes)


def _jpeg_decode_inner(data: bytes) -> np.ndarray:
    """Decode a baseline-sequential OR progressive (SOF0/SOF2) 8-bit
    JPEG — 4:4:4, 4:2:2, 4:2:0, or any other integer-ratio sampling
    with MCU-aligned dimensions — to ``uint8 (h, w, 3)`` RGB.  Both
    codings fill the same per-component coefficient buffers
    (progressive across its whole scan script), then share one
    dequant+IDCT+chroma-upsample reconstruction — so a progressive
    stream of the same quantized coefficients decodes to bit-identical
    pixels.  Raises ``ValueError`` on arithmetic coding, partial-MCU
    padding, restart intervals inside progressive streams, or
    structural corruption."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict[tuple[int, int], int]] = {}
    ac_tables: dict[int, dict[tuple[int, int], int]] = {}
    h = w = -1
    progressive = False
    restart_interval = 0
    # (component id, quant table id, h sampling, v sampling)
    comps: list[tuple[int, int, int, int]] = []
    coefs: list[np.ndarray] | None = None
    cid_to_idx: dict[int, int] = {}
    geo: list[tuple[int, int, int, int]] = []
    mcx = mcy = 0
    got_scan = False

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        # spec-legal fill: any number of extra 0xFF bytes may pad the
        # gap before the marker code (ITU T.81 B.1.1.2)
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / standalone RSTn carry no length segment
            continue
        (seg_len,) = struct.unpack_from(">H", data, pos)
        payload = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                zz = np.frombuffer(payload, np.uint8, 64, p + 1).astype(np.int32)
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = zz
                quant[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            _prec, h, w, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if _prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            if ncomp != 3:
                raise ValueError("only 3-component JPEG supported")
            for i in range(ncomp):
                cid, sampling, tq = payload[6 + 3 * i : 9 + 3 * i]
                hc, vc = sampling >> 4, sampling & 0x0F
                if not (1 <= hc <= 4 and 1 <= vc <= 4):
                    raise ValueError(
                        f"bad JPEG sampling factors {hc}x{vc} (T.81 "
                        "allows 1..4)"
                    )
                comps.append((cid, tq, hc, vc))
            cid_to_idx = {c[0]: i for i, c in enumerate(comps)}
            # MCU grid + per-component block geometry (typed error on
            # non-integer ratios or non-MCU-aligned dimensions)
            mcx, mcy, geo = _mcu_geometry(
                [(hc, vc) for _cid, _tq, hc, vc in comps], w, h
            )
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"unsupported JPEG coding (SOF{marker & 0x0F}); only "
                "baseline (SOF0) and progressive (SOF2) huffman decode"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                if len(bits) < 16:
                    raise ValueError("truncated JPEG DHT segment")
                nvals = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nvals])
                if len(vals) < nvals:
                    raise ValueError("truncated JPEG DHT segment")
                tab = _build_decode_table(bits, vals)
                (dc_tables if cls == 0 else ac_tables)[tid] = tab
                p += 17 + nvals
        elif marker == 0xDD:  # DRI
            if seg_len != 4:
                raise ValueError("bad JPEG DRI segment length")
            (restart_interval,) = struct.unpack_from(">H", payload, 0)
        elif marker == 0xDA:  # SOS
            if h < 0 or not comps:
                raise ValueError("JPEG SOS before SOF")
            if coefs is None:
                coefs = [
                    np.zeros((bw * bh, 64), dtype=np.int64)
                    for _hc, _vc, bw, bh in geo
                ]
            ns = payload[0]
            if len(payload) < 4 + 2 * ns:
                raise ValueError("truncated JPEG SOS header")
            scomps = []
            for i in range(ns):
                cid = payload[1 + 2 * i]
                tabs = payload[2 + 2 * i]
                scomps.append((cid, tabs >> 4, tabs & 0x0F))
            comp_idxs = tuple(
                _tbl(cid_to_idx, cid, "component")
                for cid, _dc, _ac in scomps
            )
            order = _scan_order(comp_idxs, geo, mcx, mcy)
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ahal = payload[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            entropy_start = pos + seg_len
            end = _entropy_end(data, entropy_start)
            reader = _BitReader(data[entropy_start:end])
            if progressive:
                if restart_interval:
                    raise ValueError(
                        "restart intervals in progressive JPEG not supported"
                    )
                _decode_progressive_scan(
                    reader, scomps, cid_to_idx, coefs, dc_tables,
                    ac_tables, ss, se, ah, al, order,
                )
            else:
                if ss != 0 or se != 63 or ah != 0 or al != 0:
                    raise ValueError("baseline JPEG scan must cover 0..63")
                if ns != len(comps):
                    raise ValueError(
                        "baseline JPEG expects one interleaved scan"
                    )
                blocks_per_mcu = sum(
                    geo[c][0] * geo[c][1] for c in comp_idxs
                )
                _decode_baseline_scan(
                    reader, scomps, coefs, dc_tables, ac_tables,
                    order, blocks_per_mcu, restart_interval,
                )
            got_scan = True
            pos = end
            continue
        pos += seg_len

    if not got_scan or coefs is None:
        raise ValueError("JPEG missing SOF/SOS")
    return _reconstruct(coefs, comps, quant, h, w, geo)


def jpeg_decode(data: bytes) -> np.ndarray:
    """Typed-error front door: ANY structural corruption — short
    headers, truncated segments, bad offsets — surfaces as ValueError,
    never a leaked struct.error/IndexError from the parse internals
    (see :func:`_jpeg_decode_inner` for the format contract)."""
    try:
        return _jpeg_decode_inner(data)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt JPEG structure: {exc}") from None


# ---------------------------------------------------------------------------
# Synthetic constant-tile corpus + decode-stats operator
# ---------------------------------------------------------------------------

# Tile formulas (encode side only; the oracle recomputes the closed
# form — see queries_media.media_jpeg_decode_stats).  Constant 8x8
# tiles are the verifiability trick: only the DC coefficient is
# nonzero, and DC-only reconstruction is exact in IEEE double, so the
# decoded color is a closed form of the source color.
JPEG_TX_MOD, JPEG_TX_MIN = 4, 1  # tiles across = k % 4 + 1  (1..4)
JPEG_TY_MOD, JPEG_TY_MIN = 3, 1  # tiles down   = k % 3 + 1  (1..3)


def _tile_colors(k: int) -> np.ndarray:
    """The (ty, tx, 3) uint8 tile-color lattice of document key ``k``
    (the closed-form formulas the SQL oracles recompute)."""
    tx = k % JPEG_TX_MOD + JPEG_TX_MIN
    ty = k % JPEG_TY_MOD + JPEG_TY_MIN
    j, i = np.mgrid[0:ty, 0:tx]
    i = i.astype(np.int64)
    j = j.astype(np.int64)
    return np.stack(
        [
            (i * 31 + j * 17 + k) % 256,
            (i * 13 + j * 7 + 2 * k) % 256,
            (i * 3 + j * 29 + 3 * k) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)


def _synth_tile_rgb(doc_id: int) -> np.ndarray:
    from .media import _key

    tiles = _tile_colors(_key(doc_id))
    return np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)


def _synth_mcu_tile_rgb(doc_id: int) -> tuple[np.ndarray, str]:
    """MCU-sized constant tiles + the per-document sampling mode: even
    keys get 4:2:0 (16x16 MCUs), odd keys 4:2:2 (16x8 MCUs).  A tile
    constant over a whole MCU survives the chroma box-mean decimation
    EXACTLY, so the decoded colors follow the same closed form as the
    4:4:4 corpus — the subsampled-stats oracle's verifiability trick."""
    from .media import _key

    k = _key(doc_id)
    sampling = "420" if k % 2 == 0 else "422"
    mh = 16 if sampling == "420" else 8
    tiles = _tile_colors(k)
    return np.repeat(np.repeat(tiles, mh, axis=0), 16, axis=1), sampling


def synth_jpeg_corpus(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One real baseline JPEG per document, built from constant 8x8
    tiles.  Schema: (doc_id long, payload binary)."""
    from .media import _scatter_ids

    src = _scatter_ids(docs, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["doc_id"].astype("int64")
            payloads = [jpeg_encode(_synth_tile_rgb(int(d))) for d in ids]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return src.mapInPandas(run, schema="doc_id long, payload binary")


def synth_restart_jpeg_corpus(docs: DataFrame,
                              id_col: str = "doc_id") -> DataFrame:
    """One baseline JPEG per document WITH restart intervals — the
    same constant tiles as :func:`synth_jpeg_corpus`, DRI = k%4+1 MCUs
    so the decoder resyncs at varying cadences (including every MCU)
    and resets DC prediction mid-image.
    Schema: (doc_id long, payload binary)."""
    from .media import _key, _scatter_ids

    src = _scatter_ids(docs, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["doc_id"].astype("int64")
            payloads = [
                jpeg_encode(
                    _synth_tile_rgb(int(d)),
                    restart_interval=_key(int(d)) % 4 + 1,
                )
                for d in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return src.mapInPandas(run, schema="doc_id long, payload binary")


def synth_subsampled_jpeg_corpus(docs: DataFrame,
                                 id_col: str = "doc_id") -> DataFrame:
    """One chroma-subsampled baseline JPEG per document — constant
    MCU-sized tiles, 4:2:0 for even keys and 4:2:2 for odd keys, so
    one corpus exercises both dominant real-world sampling layouts
    (MCU-interleaved multi-block entropy order, chroma decimation,
    and the decoder's per-component geometry + upsample path).
    Schema: (doc_id long, payload binary)."""
    from .media import _scatter_ids

    src = _scatter_ids(docs, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                rgb, sampling = _synth_mcu_tile_rgb(int(d))
                payloads.append(jpeg_encode(rgb, sampling=sampling))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return src.mapInPandas(run, schema="doc_id long, payload binary")


def synth_progressive_jpeg_corpus(docs: DataFrame,
                                  id_col: str = "doc_id") -> DataFrame:
    """One real PROGRESSIVE JPEG per document — the same constant
    8x8 tiles as :func:`synth_jpeg_corpus`, entropy-coded through the
    14-scan SA+spectral script, so the decoder must walk every
    progressive coding mode to recover the same pixels.
    Schema: (doc_id long, payload binary)."""
    from .media import _scatter_ids

    src = _scatter_ids(docs, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["doc_id"].astype("int64")
            payloads = [
                jpeg_encode_progressive(_synth_tile_rgb(int(d)))
                for d in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return src.mapInPandas(run, schema="doc_id long, payload binary")


def jpeg_stats(df: DataFrame, id_col: str = "doc_id",
               payload_col: str = "payload") -> DataFrame:
    """Decode JPEG payloads (full huffman/zigzag/dequant/IDCT path)
    and emit integer channel sums."""
    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                arr = jpeg_decode(bytes(payload))
                sums = arr.astype(np.int64).sum(axis=(0, 1))
                rows.append(
                    (int(doc_id), arr.shape[1], arr.shape[0],
                     int(sums[0]), int(sums[1]), int(sums[2]))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "sum_r", "sum_g", "sum_b"],
            )

    return src.mapInPandas(
        run,
        schema=("doc_id long, width int, height int, "
                "sum_r long, sum_g long, sum_b long"),
    )

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

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
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
                    f"unexpected marker 0xFF{marker:02X} inside scan "
                    "(restart intervals not supported)"
                )
        self.acc = (self.acc << 8) | b
        self.n += 8

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


def jpeg_encode(rgb: np.ndarray) -> bytes:
    """Encode ``uint8 (h, w, 3)`` RGB (h, w multiples of 8) as a
    baseline sequential 4:4:4 JPEG with the Annex K tables."""
    a = np.asarray(rgb, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"jpeg_encode wants (h, w, 3), got {rgb.shape}")
    h, w = a.shape[0], a.shape[1]
    if h % 8 or w % 8:
        raise ValueError("jpeg_encode wants dimensions that are multiples of 8")
    ycc = _rgb_to_ycbcr(a)

    dc_tabs = [
        _build_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS),
        _build_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS),
    ]
    ac_tabs = [
        _build_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS),
        _build_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ]
    quants = [QUANT_LUMA, QUANT_CHROMA]

    writer = _BitWriter()
    pred = [0, 0, 0]
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            for comp in range(3):
                tsel = 0 if comp == 0 else 1
                block = ycc[by : by + 8, bx : bx + 8, comp].astype(np.float64) - 128.0
                coeffs = _DCT_C @ block @ _DCT_C.T
                # The DC basis is constant 1/(2*sqrt(2)), so DC is
                # exactly sum(block)/8 — a dyadic value IEEE doubles
                # represent exactly, where the cos-product form is off
                # by 1 ulp.  That ulp matters: luma q00=16 puts odd
                # sums exactly ON the quantizer's half boundary, and
                # the quantized DC must round the way exact arithmetic
                # does for decodes to be closed-form verifiable.
                coeffs[0, 0] = block.sum() / 8.0
                q = _round_half_up(coeffs / quants[tsel]).astype(np.int64)
                zz = q.reshape(-1)[_ZIGZAG]
                # DC
                diff = int(zz[0]) - pred[comp]
                pred[comp] = int(zz[0])
                size = _magnitude_category(diff)
                code, ln = dc_tabs[tsel][size]
                writer.write(code, ln)
                if size:
                    writer.write(_encode_magnitude(diff, size), size)
                # AC
                run = 0
                for i in range(1, 64):
                    v = int(zz[i])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_tabs[tsel][0xF0]  # ZRL
                        writer.write(code, ln)
                        run -= 16
                    size = _magnitude_category(v)
                    code, ln = ac_tabs[tsel][(run << 4) | size]
                    writer.write(code, ln)
                    writer.write(_encode_magnitude(v, size), size)
                    run = 0
                if run:
                    code, ln = ac_tabs[tsel][0x00]  # EOB
                    writer.write(code, ln)
    scan = writer.flush()

    def dqt(tq: int, table: np.ndarray) -> bytes:
        zz = table.reshape(-1)[_ZIGZAG].astype(np.uint8)
        return struct.pack(">HHB", 0xFFDB, 67, tq) + zz.tobytes()

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        return struct.pack(">HH", 0xFFC4, 2 + len(payload)) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += dqt(0, QUANT_LUMA)
    out += dqt(1, QUANT_CHROMA)
    # SOF0: 8-bit, 3 components, 4:4:4 (sampling 1x1 each)
    out += struct.pack(">HHBHHB", 0xFFC0, 17, 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, tq])
    out += dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    out += dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
    out += dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    out += struct.pack(">HHB", 0xFFDA, 12, 3)
    for cid, tabs in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tabs])
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _jpeg_decode_inner(data: bytes) -> np.ndarray:
    """Decode a baseline sequential 4:4:4 8-bit JPEG to ``uint8
    (h, w, 3)`` RGB.  Raises ``ValueError`` on progressive streams,
    subsampled chroma, restart intervals, or structural corruption."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict[tuple[int, int], int]] = {}
    ac_tables: dict[int, dict[tuple[int, int], int]] = {}
    h = w = -1
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    scan_comps: list[tuple[int, int, int]] = []  # (cid, dc tid, ac tid)
    scan_data: bytes | None = None

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
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, ncomp = struct.unpack_from(">BHHB", payload, 0)
            if _prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            if ncomp != 3:
                raise ValueError("only 3-component JPEG supported")
            for i in range(ncomp):
                cid, sampling, tq = payload[6 + 3 * i : 9 + 3 * i]
                if sampling != 0x11:
                    raise ValueError("subsampled JPEG (non-4:4:4) not supported")
                comps.append((cid, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"non-baseline JPEG (SOF{marker & 0x0F}) not supported")
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
        elif marker == 0xDD:
            raise ValueError("restart intervals not supported")
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            for i in range(ns):
                cid = payload[1 + 2 * i]
                tabs = payload[2 + 2 * i]
                scan_comps.append((cid, tabs >> 4, tabs & 0x0F))
            scan_data = data[pos + seg_len :]
            break
        pos += seg_len

    if scan_data is None or h < 0 or not comps:
        raise ValueError("JPEG missing SOF/SOS")
    if h % 8 or w % 8:
        raise ValueError("dimensions not multiples of 8 (padding not supported)")

    reader = _BitReader(scan_data)
    planes = np.zeros((h, w, 3), dtype=np.int32)
    pred = [0, 0, 0]
    comp_tq = {cid: tq for cid, tq in comps}
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            for ci, (cid, dc_tid, ac_tid) in enumerate(scan_comps):
                zz = np.zeros(64, dtype=np.int64)
                size = reader.read_symbol(dc_tables[dc_tid])
                diff = _decode_magnitude(reader.read_bits(size), size)
                pred[ci] += diff
                zz[0] = pred[ci]
                i = 1
                while i < 64:
                    sym = reader.read_symbol(ac_tables[ac_tid])
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
                coeffs = np.zeros(64, dtype=np.float64)
                coeffs[_ZIGZAG] = zz
                block = coeffs.reshape(8, 8) * quant[comp_tq[cid]]
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
                    planes[by : by + 8, bx : bx + 8, ci] = int(
                        np.clip(val, 0, 255)
                    )
                else:
                    pixels = _DCT_C.T @ block @ _DCT_C + 128.0
                    planes[by : by + 8, bx : bx + 8, ci] = np.clip(
                        _round_half_up(pixels), 0, 255
                    ).astype(np.int32)
    return _ycbcr_to_rgb(planes)


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


def _synth_tile_rgb(doc_id: int) -> np.ndarray:
    from .media import _key

    k = _key(doc_id)
    tx = k % JPEG_TX_MOD + JPEG_TX_MIN
    ty = k % JPEG_TY_MOD + JPEG_TY_MIN
    j, i = np.mgrid[0:ty, 0:tx]
    i = i.astype(np.int64)
    j = j.astype(np.int64)
    tiles = np.stack(
        [
            (i * 31 + j * 17 + k) % 256,
            (i * 13 + j * 7 + 2 * k) % 256,
            (i * 3 + j * 29 + 3 * k) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)
    return np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)


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

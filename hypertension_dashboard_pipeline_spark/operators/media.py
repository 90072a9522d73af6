"""Real media codecs over binary columns — pure stdlib + numpy.

This container has no PIL/ffmpeg, but three production formats are
fully decodable with the standard library alone, so the engine ships
REAL decoders for them instead of the honest fakes in
``operators/multimodal.py`` (which stay, for the formats that genuinely
need native libs — video frames, JPEG):

* **PNG** — zlib inflate (stdlib) + the five per-row filters
  (None/Sub/Up/Average/Paeth) from the public PNG specification;
  8-bit greyscale / RGB / RGBA, sequential or Adam7-interlaced
  (each of the seven passes is an independently-filtered sub-image
  scattered onto the strided output lattice).
* **BMP** — BITMAPINFOHEADER, 24-bit uncompressed BI_RGB, 4-byte row
  padding, bottom-up or top-down row order.
* **WAV** — RIFF chunk walk parsed with ``struct`` (deliberately NOT
  the stdlib ``wave`` module, which the tests use as the independent
  ENCODER), 16-bit PCM.

Execution shape (the part that matters at 100 TB): media decode is
embarrassingly parallel per row, so every operator here is an
Arrow-batched ``mapInPandas`` over a ``binary`` column — executors
stream batches through the Python worker, nothing is collected, no
shuffle is introduced, and input partitioning is preserved.  The
per-image Python cost is the same cost PIL would charge (decode is
CPU-bound either way); the engine-side guarantee is that it happens
IN PLACE on the scan partition.

Reference parity: the reference pipeline has no media path at all
(R/dplyr over vitals — see SURVEY.md §2); this module is part of the
beyond-reference LLM-training-data surface, same as dedup/ANN.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


# Adam7 pass lattice from the PNG specification: (x0, y0, dx, dy) per
# pass — pass p covers output pixels (x0 + i*dx, y0 + j*dy).  Passes
# whose sub-image is empty for a given geometry contribute NO scanline
# bytes at all (spec: "if the image is too small, some passes are
# entirely absent").
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def png_encode(arr: np.ndarray, interlace: bool = False,
               trns: tuple[int, ...] | int | None = None,
               depth: int | None = None) -> bytes:
    """Encode an image array as a PNG (filter 0 scanlines).

    ``arr`` has shape ``(h, w)`` (greyscale), ``(h, w, 2)``
    (grey+alpha), ``(h, w, 3)`` (RGB) or ``(h, w, 4)`` (RGBA); dtype
    ``uint16`` selects bit depth 16 (big-endian samples per spec),
    anything else is encoded as 8-bit.  ``depth`` of 1/2/4 selects
    sub-byte greyscale (2-D uint8 input with samples < 2**depth,
    packed MSB-first with zero tail padding) — with it the full
    IHDR matrix of spec-legal (color type, bit depth) pairs is
    producible.  Filter type 0 on every row — valid PNG always;
    compression ratio is not this encoder's job (fixtures and
    synthetic corpora are), decode correctness is.  ``interlace=True``
    writes the Adam7 pass sequence (each pass an independently-
    filtered sub-image, empty passes absent), exercising the decoder's
    interlaced path with spec-shaped input.  ``trns`` writes a tRNS
    chunk (PNG 1.2 §4.2.1.1): a single grey sample for color type 0 or
    an (r, g, b) triple for color type 2 — that exact pixel value
    decodes as fully transparent; 16-bit chunk fields per spec at
    every depth, sample values bounded by the bit depth.  Alpha images
    (color types 4/6) reject ``trns``.
    """
    src = np.asarray(arr)
    if depth is not None:
        if depth not in (1, 2, 4):
            raise ValueError(f"explicit encode depth must be 1/2/4, "
                             f"got {depth}")
        if src.ndim != 2:
            raise ValueError("sub-byte PNG encode wants a (h, w) grey array")
        a = src.astype(np.uint8)
        if a.size and int(a.max()) >= (1 << depth):
            raise ValueError("grey sample out of range for bit depth")
        return _png_encode_grey_subbyte(a, depth, interlace, trns)
    depth = 16 if src.dtype == np.uint16 else 8
    a = src if depth == 16 else src.astype(np.uint8)
    if a.ndim == 2:
        color_type, channels = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 2:
        color_type, channels = 4, 2
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, channels = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    if depth == 16:
        a = a.astype(">u2")  # big-endian sample order per spec
    h, w = a.shape[0], a.shape[1]
    trns_chunk = b""
    if trns is not None:
        if color_type == 0:
            key = (int(trns) if np.isscalar(trns) else int(np.ravel(trns)[0]),)
        elif color_type == 2:
            key = tuple(int(v) for v in trns)
            if len(key) != 3:
                raise ValueError("RGB tRNS wants an (r, g, b) triple")
        else:
            raise ValueError("tRNS is invalid for alpha color types")
        if any(not 0 <= v < (1 << depth) for v in key):
            raise ValueError("tRNS sample out of range for bit depth")
        trns_chunk = _png_chunk(b"tRNS", struct.pack(f">{len(key)}H", *key))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0,
                       1 if interlace else 0)
    raw = bytearray()
    if interlace:
        for x0, y0, dx, dy in _ADAM7:
            sub = a[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            for row in sub:
                raw.append(0)  # filter type 0 (None)
                raw += row.tobytes()
    else:
        for y in range(h):
            raw.append(0)  # filter type 0 (None)
            raw += a[y].tobytes()
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + trns_chunk
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _unfilter(mat: np.ndarray, bpp: int) -> np.ndarray:
    """Reconstruct PNG-filtered scanlines.

    ``mat`` is ``(rows, stride + 1)`` uint8 — each row is a filter-type
    byte followed by the filtered bytes of one scanline; returns the
    reconstructed ``(rows, stride)`` pixels.  Vectorized per scanline
    (a per-byte Python loop here would dominate decode cost on foreign
    PNGs):

    * None/Up — whole-row numpy (Up is prev + cur mod 256);
    * Sub     — exact mod-256 cumulative sum per channel column
                (out[x] = out[x-1] + raw[x] is cumsum, and addition
                mod 256 commutes with the int64 cumsum);
    * Average/Paeth — irreducibly sequential in x (floor-division /
                predictor selection break the cumsum trick), so the
                loop runs per PIXEL with all channels as one numpy
                slice — bpp× fewer Python iterations than per-byte.
    """
    rows, stride = mat.shape[0], mat.shape[1] - 1
    out = np.zeros((rows, stride), dtype=np.uint8)
    for y in range(rows):
        ftype = int(mat[y, 0])
        cur = mat[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y > 0 else np.zeros(
            stride, dtype=np.int64
        )
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            cur = np.cumsum(cur.reshape(-1, bpp), axis=0).reshape(stride) % 256
        elif ftype == 2:  # Up
            cur = (cur + prev) % 256
        elif ftype == 3:  # Average
            cur = cur.reshape(-1, bpp)
            up = prev.reshape(-1, bpp)
            left = np.zeros(bpp, dtype=np.int64)
            for x in range(cur.shape[0]):
                left = (cur[x] + ((left + up[x]) >> 1)) % 256
                cur[x] = left
            cur = cur.reshape(stride)
        elif ftype == 4:  # Paeth
            cur = cur.reshape(-1, bpp)
            up = prev.reshape(-1, bpp)
            left = np.zeros(bpp, dtype=np.int64)
            ul = np.zeros(bpp, dtype=np.int64)
            for x in range(cur.shape[0]):
                p = left + up[x] - ul
                pa, pb, pc = (
                    np.abs(p - left), np.abs(p - up[x]), np.abs(p - ul)
                )
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up[x], ul)
                )
                left = (cur[x] + pred) % 256
                cur[x] = left
                ul = up[x]
            cur = cur.reshape(stride)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def _pack_subbyte_rows(a: np.ndarray, depth: int) -> bytearray:
    """Filter-0 scanlines of a (rows, w) sample array at bit depth
    1/2/4/8: sub-byte samples packed MSB-first with zero tail padding
    per spec (shared by the paletted and sub-byte-grey encoders)."""
    out = bytearray()
    for row in a:
        if depth == 8:
            rb = row.tobytes()
        else:
            bits = np.unpackbits(row[:, None], axis=1)[:, 8 - depth:]
            flat = bits.reshape(-1)
            pad = (-len(flat)) % 8
            if pad:
                flat = np.concatenate([flat, np.zeros(pad, dtype=np.uint8)])
            rb = np.packbits(flat).tobytes()
        out.append(0)  # filter type 0 (None)
        out += rb
    return out


def _png_encode_grey_subbyte(a: np.ndarray, depth: int, interlace: bool,
                             trns: tuple[int, ...] | int | None) -> bytes:
    """Color-type-0 PNG at bit depth 1/2/4 (see :func:`png_encode`)."""
    h, w = a.shape
    trns_chunk = b""
    if trns is not None:
        key = int(trns) if np.isscalar(trns) else int(np.ravel(trns)[0])
        if not 0 <= key < (1 << depth):
            raise ValueError("tRNS sample out of range for bit depth")
        trns_chunk = _png_chunk(b"tRNS", struct.pack(">H", key))
    raw = bytearray()
    if interlace:
        for x0, y0, dx, dy in _ADAM7:
            sub = a[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raw += _pack_subbyte_rows(sub, depth)
    else:
        raw += _pack_subbyte_rows(a, depth)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0,
                       1 if interlace else 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + trns_chunk
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def png_encode_palette(indices: np.ndarray, palette: np.ndarray,
                       depth: int = 8, interlace: bool = False,
                       trns: np.ndarray | None = None) -> bytes:
    """Encode a ``(h, w)`` index array + ``(n, 3)`` RGB palette as a
    color-type-3 PNG at bit depth 1/2/4/8 (sub-byte rows packed
    MSB-first with zero tail padding, filter 0 scanlines, optional
    Adam7) — the fixture/corpus producer for the paletted decode
    path.  ``trns`` is an optional per-palette-entry alpha byte array
    (length <= palette entries, PNG 1.2 §4.2.1.1: trailing entries
    default to 255/opaque) written as a tRNS chunk after PLTE."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2:
        raise ValueError(f"png_encode_palette wants (h, w) indices, got {idx.shape}")
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
        raise ValueError("palette must be (n, 3) with 1 <= n <= 256")
    if depth not in (1, 2, 4, 8):
        raise ValueError(f"bad palette bit depth {depth}")
    if pal.shape[0] > (1 << depth):
        raise ValueError("palette too large for bit depth")
    if idx.size and int(idx.max()) >= pal.shape[0]:
        raise ValueError("palette index out of range")
    trns_chunk = b""
    if trns is not None:
        alpha = np.asarray(trns, dtype=np.uint8)
        if alpha.ndim != 1 or not 1 <= alpha.shape[0] <= pal.shape[0]:
            raise ValueError("tRNS must be (n,) with 1 <= n <= palette size")
        trns_chunk = _png_chunk(b"tRNS", alpha.tobytes())
    h, w = idx.shape
    raw = bytearray()
    if interlace:
        for x0, y0, dx, dy in _ADAM7:
            sub = idx[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raw += _pack_subbyte_rows(sub, depth)
    else:
        raw += _pack_subbyte_rows(idx, depth)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0,
                       1 if interlace else 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", pal.tobytes())
        + trns_chunk
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _decode_subimage(buf: bytes, ph: int, pw: int, depth: int,
                     channels: int) -> np.ndarray:
    """Unfilter + unpack one (sub-)image of ``ph`` scanlines of ``pw``
    pixels at ``depth`` bits per sample: filters operate on BYTES with
    bpp = max(1, depth*channels/8) per spec; sub-byte depths then
    unpack MSB-first with scanline-tail padding discarded.  Returns
    ``(ph, pw, channels)`` — uint16 for depth 16 (big-endian sample
    pairs recombined AFTER byte-level unfiltering, the spec's order of
    operations), else uint8 (palette indices for channels=1 at
    sub-byte depth)."""
    stride = (pw * depth * channels + 7) // 8
    mat = np.frombuffer(buf, dtype=np.uint8).reshape(ph, stride + 1)
    rows = _unfilter(mat, max(1, (depth * channels) // 8))
    if depth == 8:
        return rows.reshape(ph, pw, channels)
    if depth == 16:
        pairs = rows.reshape(ph, pw, channels, 2).astype(np.uint16)
        return (pairs[..., 0] << 8) | pairs[..., 1]
    bits = np.unpackbits(rows, axis=1)  # MSB-first per spec
    vals = bits.reshape(ph, stride * 8 // depth, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    idx = (vals * weights).sum(axis=2).astype(np.uint8)
    return idx[:, :pw].reshape(ph, pw, 1)


def _subimage_len(pw: int, ph: int, depth: int, channels: int) -> int:
    return ph * ((pw * depth * channels + 7) // 8 + 1)


def _png_decode_inner(data: bytes) -> np.ndarray:
    """Decode a PNG to an array of shape ``(h, w, channels)``.

    Supports the FULL spec-legal IHDR matrix (PNG 1.2 table 11.1):
    color type 0 (grey) at depths 1/2/4/8/16 (sub-byte samples scaled
    to the 8-bit range — 255/(2**depth - 1) is exact), types 2 (RGB),
    4 (grey+alpha) and 6 (RGBA) at 8/16 (16-bit returns ``uint16``;
    big-endian sample pairs, byte-level filtering), and type 3
    (paletted) at 1/2/4/8 (PLTE lookup, indices expanded to RGB on
    return), each sequential OR Adam7-interlaced.  A tRNS chunk (PNG 1.2 §4.2.1.1) is
    honored: paletted images expand to RGBA with per-entry alpha
    (missing trailing entries opaque); grey/RGB images grow an alpha
    channel that is 0 exactly where the pixel equals the transparency
    key and fully opaque elsewhere — so channels on return reflects
    the tRNS, not just the IHDR color type.  All five spec filter
    types are implemented (the tests hand-craft scanlines for each);
    the interlaced path reconstructs each of the seven passes as an
    independent sub-image (its own scanline filtering, empty passes
    absent) and scatters it onto the strided output lattice.  Raises
    ``ValueError`` with a specific message on anything else rather
    than guessing.
    """
    if len(data) < 8 or data[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = -1
    channels = 0
    ctype = -1
    depth = 8
    ilace = 0
    palette: np.ndarray | None = None
    trns: bytes | None = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", payload
            )
            if ctype == 3:
                if depth not in (1, 2, 4, 8):
                    raise ValueError(
                        f"unsupported paletted PNG bit depth {depth}"
                    )
            elif ctype == 0:
                if depth not in (1, 2, 4, 8, 16):
                    raise ValueError(f"unsupported PNG bit depth {depth}")
            elif depth not in (8, 16):
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if ilace not in (0, 1):
                raise ValueError(f"unsupported PNG interlace method {ilace}")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard PNG compression/filter method")
            try:
                channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
            except KeyError:
                raise ValueError(f"unsupported PNG color type {ctype}") from None
        elif tag == b"PLTE":
            if length % 3 or not 3 <= length <= 768:
                raise ValueError("bad PNG PLTE chunk length")
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = payload
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width < 0:
        raise ValueError("PNG missing IHDR")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG pixel data: {exc}") from None
    if ilace == 0:
        if len(raw) != _subimage_len(width, height, depth, channels):
            raise ValueError("PNG pixel data length mismatch")
        out = _decode_subimage(raw, height, width, depth, channels)
    else:
        # Adam7: consume the pass sub-images in spec order; each pass
        # is filtered against its OWN previous scanline (never a
        # neighboring pass), then scattered onto the (dy, dx) lattice.
        out = np.zeros(
            (height, width, channels),
            dtype=np.uint16 if depth == 16 else np.uint8,
        )
        consumed = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx if width > x0 else 0
            ph = (height - y0 + dy - 1) // dy if height > y0 else 0
            if pw == 0 or ph == 0:
                continue
            need = _subimage_len(pw, ph, depth, channels)
            if consumed + need > len(raw):
                raise ValueError("PNG pixel data length mismatch")
            out[y0::dy, x0::dx] = _decode_subimage(
                raw[consumed : consumed + need], ph, pw, depth, channels
            )
            consumed += need
        if consumed != len(raw):
            raise ValueError("PNG pixel data length mismatch")
    if ctype != 3:
        # Sub-byte greyscale: scale samples to the 8-bit range (255 /
        # (2**depth - 1) is exact for depths 1/2/4 — 255/85/17), the
        # standard presentation of low-depth grey.
        scale = 255 // ((1 << depth) - 1) if ctype == 0 and depth < 8 else 1
        if scale != 1:
            out = (out * scale).astype(np.uint8)
        if trns is None:
            return out
        # Color-key transparency (tRNS on grey/RGB): 16-bit chunk
        # fields at every depth, value range bounded by the bit depth;
        # pixels equal to the key become alpha 0, all others fully
        # opaque (PNG 1.2 §4.2.1.1).
        if ctype in (4, 6):
            raise ValueError("tRNS is invalid for alpha color types")
        if len(trns) != 2 * channels:
            raise ValueError("bad PNG tRNS chunk length")
        key = np.frombuffer(trns, dtype=">u2")
        if int(key.max()) >= (1 << depth):
            raise ValueError("PNG tRNS sample out of range for bit depth")
        opaque = 65535 if depth == 16 else 255
        keyv = (key.astype(np.int64) * scale).astype(out.dtype)
        alpha = np.where(
            (out == keyv).all(axis=2), 0, opaque
        ).astype(out.dtype)
        return np.concatenate([out, alpha[:, :, None]], axis=2)
    if palette is None:
        raise ValueError("paletted PNG missing PLTE chunk")
    idx = out[:, :, 0]
    if idx.size and int(idx.max()) >= palette.shape[0]:
        raise ValueError("PNG palette index out of range")
    rgb = palette[idx]
    if trns is None:
        return rgb
    # Per-palette-entry alpha: tRNS may be shorter than PLTE; trailing
    # entries default to opaque (PNG 1.2 §4.2.1.1).
    if not 1 <= len(trns) <= palette.shape[0]:
        raise ValueError("bad PNG tRNS chunk length")
    alpha_tab = np.full(palette.shape[0], 255, dtype=np.uint8)
    alpha_tab[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
    return np.concatenate([rgb, alpha_tab[idx][:, :, None]], axis=2)


def png_decode(data: bytes) -> np.ndarray:
    """Typed-error front door: ANY structural corruption — short
    headers, truncated segments, bad offsets — surfaces as ValueError,
    never a leaked struct.error/IndexError from the parse internals
    (see :func:`_png_decode_inner` for the format contract)."""
    try:
        return _png_decode_inner(data)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt PNG structure: {exc}") from None


# ---------------------------------------------------------------------------
# BMP (24-bit BI_RGB, BITMAPINFOHEADER)
# ---------------------------------------------------------------------------


def bmp_encode(arr: np.ndarray, topdown: bool = False) -> bytes:
    """Encode a ``uint8`` array as an uncompressed BMP: ``(h, w, 3)``
    -> 24-bit BGR, ``(h, w, 4)`` -> 32-bit BGRX (the 4th input channel
    lands in the pad byte the decoder drops), rows padded to 4 bytes.
    ``topdown=True`` writes a negative-height header with rows in
    natural order — the spec's other row direction, exercised so the
    bottom-up flip is verified rather than assumed."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] not in (3, 4):
        raise ValueError(f"bmp_encode wants (h, w, 3|4), got {arr.shape}")
    h, w, ch = a.shape
    depth = ch * 8
    row = w * ch
    pad = (-row) % 4
    body = bytearray()
    ys = range(h) if topdown else range(h - 1, -1, -1)
    for y in ys:
        if ch == 3:
            body += a[y, :, ::-1].tobytes()  # RGB -> BGR
        else:
            body += a[y][:, [2, 1, 0, 3]].tobytes()  # RGBX -> BGRX
        body += b"\x00" * pad
    pixel_off = 14 + 40
    header = struct.pack(
        "<2sIHHI", b"BM", pixel_off + len(body), 0, 0, pixel_off
    ) + struct.pack("<IiiHHIIiiII", 40, w, -h if topdown else h, 1, depth,
                    0, len(body), 2835, 2835, 0, 0)
    return bytes(header) + bytes(body)


def bmp_encode_palette(indices: np.ndarray, palette: np.ndarray,
                       depth: int = 8, topdown: bool = False) -> bytes:
    """Encode a ``(h, w)`` index array + ``(n, 3)`` RGB palette as a
    paletted BMP at bit depth 1/4/8 (BGRX color table, sub-byte pixels
    packed MSB-first, rows 4-byte-aligned) — the fixture/corpus
    producer for the paletted BMP decode path."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2:
        raise ValueError(f"bmp_encode_palette wants (h, w) indices, got {idx.shape}")
    if depth not in (1, 4, 8):
        raise ValueError(f"bad BMP palette bit depth {depth}")
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= (1 << depth):
        raise ValueError("palette must be (n, 3) with 1 <= n <= 2**depth")
    if idx.size and int(idx.max()) >= pal.shape[0]:
        raise ValueError("palette index out of range")
    h, w = idx.shape
    stride = ((w * depth + 31) // 32) * 4
    body = bytearray()
    ys = range(h) if topdown else range(h - 1, -1, -1)
    for y in ys:
        row = idx[y]
        if depth == 8:
            rb = row.tobytes()
        else:
            bits = np.unpackbits(row[:, None], axis=1)[:, 8 - depth:]
            flat = bits.reshape(-1)
            pad_bits = stride * 8 - len(flat)
            flat = np.concatenate(
                [flat, np.zeros(pad_bits, dtype=np.uint8)]
            )
            rb = np.packbits(flat).tobytes()
        body += rb.ljust(stride, b"\x00")[:stride]
    table = np.zeros((pal.shape[0], 4), dtype=np.uint8)
    table[:, :3] = pal[:, ::-1]  # RGB -> BGR, X byte zero
    pixel_off = 14 + 40 + table.size
    header = struct.pack(
        "<2sIHHI", b"BM", pixel_off + len(body), 0, 0, pixel_off
    ) + struct.pack("<IiiHHIIiiII", 40, w, -h if topdown else h, 1, depth,
                    0, len(body), 2835, 2835, pal.shape[0], 0)
    return bytes(header) + table.tobytes() + bytes(body)


def _bmp_decode_inner(data: bytes) -> np.ndarray:
    """Decode an uncompressed (BI_RGB) BMP to ``uint8 (h, w, 3)`` RGB.

    Bit depths 1/4/8 (paletted: BGRX color table after the info
    header, ``biClrUsed`` entries or the full 2**depth when zero,
    sub-byte pixels packed MSB-first, indices expanded to RGB on
    return), 24 (BGR triples) and 32 (BGRX quads, the pad byte
    dropped).  Handles both bottom-up (positive height, the common
    case) and top-down (negative height) row order and the 4-byte row
    alignment at every depth.
    """
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP: bad magic")
    (pixel_off,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h_signed = struct.unpack_from("<Iii", data, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    planes, depth, compression = struct.unpack_from("<HHI", data, 26)
    if compression != 0 or depth not in (1, 4, 8, 24, 32):
        raise ValueError(f"unsupported BMP: depth={depth} compression={compression}")
    h = abs(h_signed)
    row_bits = w * depth
    stride = ((row_bits + 31) // 32) * 4  # rows 4-byte-aligned per spec
    need = pixel_off + stride * h
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h,
                         offset=pixel_off).reshape(h, stride)
    if depth <= 8:
        (clr_used,) = struct.unpack_from("<I", data, 46)
        n_pal = clr_used or (1 << depth)
        pal_off = 14 + hdr_size
        if pal_off + n_pal * 4 > pixel_off or n_pal > (1 << depth):
            raise ValueError("bad BMP color table")
        pal = np.frombuffer(
            data, dtype=np.uint8, count=n_pal * 4, offset=pal_off
        ).reshape(-1, 4)[:, 2::-1]  # BGRX -> RGB
        if depth == 8:
            idx = rows[:, :w]
        else:
            bits = np.unpackbits(rows, axis=1)  # MSB-first per spec
            vals = bits.reshape(h, stride * 8 // depth, depth)
            weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
            idx = (vals * weights).sum(axis=2).astype(np.uint8)[:, :w]
        if idx.size and int(idx.max()) >= n_pal:
            raise ValueError("BMP palette index out of range")
        out = pal[idx]
    elif depth == 24:
        out = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    else:
        out = rows[:, : w * 4].reshape(h, w, 4)[:, :, 2::-1]  # BGRX -> RGB
    if h_signed > 0:
        out = out[::-1]  # stored bottom-up
    return np.ascontiguousarray(out)


def bmp_decode(data: bytes) -> np.ndarray:
    """Typed-error front door: ANY structural corruption — short
    headers, truncated segments, bad offsets — surfaces as ValueError,
    never a leaked struct.error/IndexError from the parse internals
    (see :func:`_bmp_decode_inner` for the format contract)."""
    try:
        return _bmp_decode_inner(data)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt BMP structure: {exc}") from None


# ---------------------------------------------------------------------------
# WAV (RIFF, 16-bit PCM) — struct-parsed; tests encode with stdlib wave
# ---------------------------------------------------------------------------


def _wav_decode_inner(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a RIFF/WAVE file to ``(sample_rate, samples)``.

    Walks the chunk list with ``struct`` (fmt chunks longer than 16
    bytes — e.g. cbSize-bearing PCM — are accepted; non-PCM raises).
    Integer PCM at the four real-world widths: 8-bit (unsigned per
    spec, returned widened to ``int16`` as ``(v - 128) * 256`` — the
    standard presentation), 16-bit (``int16``), 24-bit (3-byte
    little-endian two's complement, sign-extended to ``int32``) and
    32-bit (``int32``).  Multi-channel audio comes back shaped
    ``(n_frames, n_channels)``; mono as a flat ``(n_frames,)``.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF header")
    pos = 12
    rate = None
    n_channels = 0
    bits = 16
    pcm: bytes | None = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt_code, n_channels, rate = struct.unpack_from("<HHI", payload, 0)
            (bits,) = struct.unpack_from("<H", payload, 14)
            if fmt_code != 1:
                raise ValueError(f"unsupported WAV format code {fmt_code} (PCM only)")
            if bits not in (8, 16, 24, 32):
                raise ValueError(f"unsupported WAV bit depth {bits}")
        elif tag == b"data":
            pcm = payload
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(pcm) % (bits // 8):
        raise ValueError("WAV data length not a multiple of the sample size")
    if bits == 8:
        samples = (
            (np.frombuffer(pcm, dtype=np.uint8).astype(np.int16) - 128) * 256
        )
    elif bits == 16:
        samples = np.frombuffer(pcm, dtype="<i2")
    elif bits == 24:
        b = np.frombuffer(pcm, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        u = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        samples = (u ^ 0x800000) - 0x800000  # sign-extend bit 23
    else:
        samples = np.frombuffer(pcm, dtype="<i4")
    if n_channels > 1:
        samples = samples.reshape(-1, n_channels)
    return rate, samples


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """Typed-error front door: ANY structural corruption — short
    headers, truncated segments, bad offsets — surfaces as ValueError,
    never a leaked struct.error/IndexError from the parse internals
    (see :func:`_wav_decode_inner` for the format contract)."""
    try:
        return _wav_decode_inner(data)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt WAV structure: {exc}") from None


def wav_encode(rate: int, samples: np.ndarray, bits: int = 16) -> bytes:
    """Encode PCM samples as a WAV via the stdlib ``wave`` module — a
    codec implementation INDEPENDENT of :func:`wav_decode`'s manual
    parser, which is exactly why the round-trip test is meaningful.
    ``samples`` are RAW wire values for the chosen width: unsigned
    0..255 at ``bits=8``, signed int16/int24/int32 at 16/24/32
    (24-bit packed 3-byte little-endian two's complement).  A
    ``(n_frames, n_channels)`` input writes interleaved multi-channel
    frames; 1-D input is mono."""
    import io
    import wave

    a = np.asarray(samples)
    n_channels = a.shape[1] if a.ndim == 2 else 1
    if bits == 8:
        raw = a.astype(np.uint8).tobytes()
    elif bits == 16:
        raw = a.astype("<i2").tobytes()
    elif bits == 24:
        u = (a.astype(np.int64) & 0xFFFFFF).astype(np.uint32)
        b3 = np.stack(
            [u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF], axis=-1
        ).astype(np.uint8)
        raw = b3.tobytes()
    elif bits == 32:
        raw = a.astype("<i4").tobytes()
    else:
        raise ValueError(f"unsupported WAV encode bit depth {bits}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(n_channels)
        wv.setsampwidth(bits // 8)
        wv.setframerate(rate)
        wv.writeframes(raw)
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Resize (nearest-neighbor, floor index map)
# ---------------------------------------------------------------------------


def nn_resize(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample with the floor index map
    ``src = (dst * src_dim) // dst_dim`` — deterministic integer
    geometry (no rounding-mode ambiguity), which is what lets an
    independent engine reproduce the resampled pixels exactly."""
    h, w = arr.shape[0], arr.shape[1]
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return arr[ys][:, xs]


# ---------------------------------------------------------------------------
# Synthetic corpus + decode-stats operators (Arrow-batched mapInPandas)
# ---------------------------------------------------------------------------

# Pixel / sample generation formulas.  These live ONLY on the encode
# side; the decode-side operators below see nothing but bytes.  The
# DuckDB oracles recompute the same closed forms in SQL, so Spark
# (bytes -> real decode -> stats) and DuckDB (formula -> stats) arrive
# at the same numbers by INDEPENDENT routes — the decoders are what is
# actually under test.
IMG_W_MOD, IMG_W_MIN = 29, 4  # w = k % 29 + 4   (4..32)
IMG_H_MOD, IMG_H_MIN = 17, 3  # h = k % 17 + 3   (3..19)
AUD_N_MOD, AUD_N_MIN = 97, 16  # n = k % 97 + 16 (16..112)

# Python's % floors (always non-negative for a positive modulus) while
# SQL's truncates toward zero, so the formulas run on a normalized
# non-negative key k = pmod(doc_id, 2^31) — identical to doc_id for
# every real corpus, and identical IN BOTH ENGINES if a hostile corpus
# ever carries a negative id.
KEY_MOD = 2_147_483_648


def _scatter_ids(docs: DataFrame, id_col: str) -> DataFrame:
    """Corpus-generation scaffolding: scatter the id projection across
    the cluster BEFORE synthesizing payloads.

    In production, media payloads live in a parquet binary column and
    decode parallelism comes from input splits for free.  The
    synthetic corpora instead DERIVE payloads from the tiny documents
    id table, which at test scale is a single input split — without
    this scatter, every encode AND decode would run on one core (a
    generation artifact, not a decode property; measured 6.6s -> ~1s
    on the JPEG query at sf0.1).  The exchange moves ids only (8
    bytes/row), never pixels; the decode stage downstream remains
    exchange-free."""
    n = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .repartition(n)
    )


def _key(doc_id: int) -> int:
    return doc_id % KEY_MOD  # Python % is already floored/non-negative


def _synth_pixels(doc_id: int) -> np.ndarray:
    doc_id = _key(doc_id)
    w = doc_id % IMG_W_MOD + IMG_W_MIN
    h = doc_id % IMG_H_MOD + IMG_H_MIN
    y, x = np.mgrid[0:h, 0:w]
    x = x.astype(np.int64)
    y = y.astype(np.int64)
    return np.stack(
        [
            (x * 7 + y * 11 + doc_id) % 256,
            (x * 3 + y * 5 + 2 * doc_id) % 256,
            (x + y + 3 * doc_id) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)


def _synth_samples(doc_id: int) -> np.ndarray:
    doc_id = _key(doc_id)
    n = doc_id % AUD_N_MOD + AUD_N_MIN
    i = np.arange(n, dtype=np.int64)
    return ((i * i * 37 + i * 1009 + doc_id * 31) % 65536 - 32768).astype(np.int16)


def synth_image_corpus(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One real encoded image per document: PNG for even ids, BMP for
    odd — so a consumer exercises BOTH decoders through one column,
    dispatching on magic bytes exactly as a real mixed-format corpus
    requires.  Schema: (doc_id long, fmt string, payload binary)."""
    src = _scatter_ids(docs, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["doc_id"].astype("int64")
            fmts, payloads = [], []
            for doc_id in ids:
                px = _synth_pixels(int(doc_id))
                if _key(int(doc_id)) % 2 == 0:
                    fmts.append("png")
                    payloads.append(png_encode(px))
                else:
                    fmts.append("bmp")
                    payloads.append(bmp_encode(px))
            yield pd.DataFrame(
                {"doc_id": ids, "fmt": fmts, "payload": payloads}
            )

    return src.mapInPandas(run, schema="doc_id long, fmt string, payload binary")


def synth_interlaced_image_corpus(docs: DataFrame,
                                  id_col: str = "doc_id") -> DataFrame:
    """One Adam7-interlaced PNG per document — same pixel formulas as
    :func:`synth_image_corpus`, but every payload takes the decoder's
    seven-pass path.  The width range (4..32) deliberately includes
    geometries where later passes dominate and tiny heights (3) where
    some passes are entirely absent — the spec's edge cases.
    Schema: (doc_id long, payload binary)."""
    src = _scatter_ids(docs, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["doc_id"].astype("int64")
            payloads = [
                png_encode(_synth_pixels(int(d)), interlace=True)
                for d in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return src.mapInPandas(run, schema="doc_id long, payload binary")


PAL_N = 16  # palette entries per synthetic image (depth-4 packing)


def _synth_palette(doc_id: int) -> tuple[np.ndarray, np.ndarray]:
    """(indices, palette) for the paletted corpus: same geometry as
    _synth_pixels, 16-entry palette and index lattice in closed form
    (keep in sync with the media_png_palette_stats oracle)."""
    k = _key(doc_id)
    w = k % IMG_W_MOD + IMG_W_MIN
    h = k % IMG_H_MOD + IMG_H_MIN
    y, x = np.mgrid[0:h, 0:w]
    idx = ((x * 3 + y * 5 + k) % PAL_N).astype(np.uint8)
    i = np.arange(PAL_N, dtype=np.int64)
    pal = np.stack(
        [(i * 37 + k) % 256, (i * 59 + 2 * k) % 256, (i * 83 + 3 * k) % 256],
        axis=-1,
    ).astype(np.uint8)
    return idx, pal


def synth_palette_image_corpus(docs: DataFrame,
                               id_col: str = "doc_id") -> DataFrame:
    """One color-type-3 PNG per document at bit depth 4 (sub-byte
    packing with scanline tail padding), Adam7-interlaced for even
    keys — composing the palette and interlace paths through one
    column.  Schema: (doc_id long, payload binary)."""
    src = _scatter_ids(docs, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                idx, pal = _synth_palette(int(d))
                payloads.append(
                    png_encode_palette(
                        idx, pal, depth=4,
                        interlace=_key(int(d)) % 2 == 0,
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return src.mapInPandas(run, schema="doc_id long, payload binary")


def _synth_pixels16(doc_id: int) -> np.ndarray:
    """16-bit lattice: RGB for even keys, greyscale for odd (keep in
    sync with the media_png_16bit_stats oracle — full 0..65535 sample
    range so an 8-bit truncation anywhere in the pipe fails parity)."""
    k = _key(doc_id)
    w = k % IMG_W_MOD + IMG_W_MIN
    h = k % IMG_H_MOD + IMG_H_MIN
    y, x = np.mgrid[0:h, 0:w]
    x = x.astype(np.int64)
    y = y.astype(np.int64)
    if k % 2 == 0:
        return np.stack(
            [
                (x * 257 + y * 1031 + k * 3) % 65536,
                (x * 101 + y * 577 + k * 5) % 65536,
                (x * 29 + y * 47 + k * 7) % 65536,
            ],
            axis=-1,
        ).astype(np.uint16)
    return ((x * 521 + y * 769 + k * 11) % 65536).astype(np.uint16)


def synth_16bit_image_corpus(docs: DataFrame,
                             id_col: str = "doc_id") -> DataFrame:
    """One bit-depth-16 PNG per document: RGB for even keys, greyscale
    for odd, Adam7-interlaced when ``k % 3 == 0`` — composing 16-bit
    samples with both channel layouts and the seven-pass path.
    Schema: (doc_id long, payload binary)."""
    src = _scatter_ids(docs, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["doc_id"].astype("int64")
            payloads = [
                png_encode(
                    _synth_pixels16(int(d)),
                    interlace=_key(int(d)) % 3 == 0,
                )
                for d in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return src.mapInPandas(run, schema="doc_id long, payload binary")


def synth_trns_image_corpus(docs: DataFrame,
                            id_col: str = "doc_id") -> DataFrame:
    """One tRNS-bearing PNG per document, covering both spec forms of
    the chunk: even keys are depth-4 paletted images (the
    :func:`_synth_palette` lattice) with a per-entry alpha table of
    length ``k % 16 + 1`` — deliberately SHORTER than the palette for
    most keys, so the trailing-entries-opaque rule is load-bearing;
    odd keys are 8-bit RGB (the :func:`_synth_pixels` lattice) with a
    color-key tRNS equal to the pixel at (0, 0) — exactly one pixel of
    every such image decodes transparent.  Schema:
    (doc_id long, payload binary)."""
    src = _scatter_ids(docs, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                k = _key(int(d))
                if k % 2 == 0:
                    idx, pal = _synth_palette(int(d))
                    i = np.arange(k % 16 + 1, dtype=np.int64)
                    alpha = ((i * 19 + 5 * k) % 256).astype(np.uint8)
                    payloads.append(
                        png_encode_palette(
                            idx, pal, depth=4,
                            interlace=k % 3 == 0, trns=alpha,
                        )
                    )
                else:
                    px = _synth_pixels(int(d))
                    payloads.append(
                        png_encode(px, trns=tuple(int(v) for v in px[0, 0]))
                    )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return src.mapInPandas(run, schema="doc_id long, payload binary")


def synth_graya_image_corpus(docs: DataFrame,
                             id_col: str = "doc_id") -> DataFrame:
    """One color-type-4 (grey+alpha) PNG per document — bit depth 16
    for even keys, 8 for odd, Adam7-interlaced when ``k % 3 == 0``.
    The alpha plane carries its own position-dependent formula (keep
    in sync with the media_png_graya_stats oracle), so a channel-
    interleave error in the 2-channel layout shows up in the alpha
    sums.  Schema: (doc_id long, payload binary)."""
    src = _scatter_ids(docs, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                k = _key(int(d))
                w = k % IMG_W_MOD + IMG_W_MIN
                h = k % IMG_H_MOD + IMG_H_MIN
                y, x = np.mgrid[0:h, 0:w]
                x = x.astype(np.int64)
                y = y.astype(np.int64)
                hi = 65536 if k % 2 == 0 else 256
                dt_ = np.uint16 if k % 2 == 0 else np.uint8
                ga = np.stack(
                    [
                        (x * 37 + y * 53 + 7 * k) % hi,
                        (x * 13 + y * 29 + 11 * k) % hi,
                    ],
                    axis=-1,
                ).astype(dt_)
                payloads.append(png_encode(ga, interlace=k % 3 == 0))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return src.mapInPandas(run, schema="doc_id long, payload binary")


def synth_subbyte_image_corpus(docs: DataFrame,
                               id_col: str = "doc_id") -> DataFrame:
    """One sub-byte greyscale PNG per document — bit depth 1/2/4 by
    ``k % 3``, Adam7-interlaced for even keys.  Decoded samples scale
    to the 8-bit range (×255/85/17 — exact), which the
    media_png_subbyte_stats oracle restates in closed form.  Schema:
    (doc_id long, payload binary)."""
    src = _scatter_ids(docs, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                k = _key(int(d))
                depth = (1, 2, 4)[k % 3]
                w = k % IMG_W_MOD + IMG_W_MIN
                h = k % IMG_H_MOD + IMG_H_MIN
                y, x = np.mgrid[0:h, 0:w]
                samples = ((x * 3 + y * 5 + k) % (1 << depth)).astype(
                    np.uint8
                )
                payloads.append(
                    png_encode(samples, depth=depth, interlace=k % 2 == 0)
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return src.mapInPandas(run, schema="doc_id long, payload binary")


POSITION_STATS_SCHEMA = (
    "doc_id long, width int, height int, "
    "sum_xr long, sum_yg long, sum_b long"
)


def image_position_stats(df: DataFrame, id_col: str = "doc_id",
                         payload_col: str = "payload") -> DataFrame:
    """Decode every payload (PNG or BMP, dispatched on magic bytes)
    and emit POSITION-WEIGHTED integer channel sums: sum(x·r),
    sum(y·g), sum(b).  A plain channel sum is permutation-invariant —
    a decoder that scattered interlace passes onto the wrong lattice
    positions, or skipped the BMP bottom-up flip, would still match it
    — so the coordinate weights are what make this query verify the
    geometry, not just the byte inventory.  Exact int64 on both
    engines."""
    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                blob = bytes(payload)
                dec = bmp_decode if blob[:2] == b"BM" else png_decode
                arr = dec(blob).astype(np.int64)
                if arr.shape[2] <= 2:
                    # grayscale (w/ or w/o tRNS alpha): replicate the
                    # grey plane so the channel indexing below is
                    # always valid (same convention as image_stats)
                    arr = np.repeat(arr[:, :, :1], 3, axis=2)
                h, w = arr.shape[0], arr.shape[1]
                xs = np.arange(w, dtype=np.int64)[None, :]
                ys = np.arange(h, dtype=np.int64)[:, None]
                rows.append(
                    (int(doc_id), w, h,
                     int((xs * arr[:, :, 0]).sum()),
                     int((ys * arr[:, :, 1]).sum()),
                     int(arr[:, :, 2].sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height",
                         "sum_xr", "sum_yg", "sum_b"],
            )

    return src.mapInPandas(run, schema=POSITION_STATS_SCHEMA)


ALPHA_STATS_SCHEMA = (
    "doc_id long, width int, height int, "
    "sum_xa long, sum_ya long, n_transparent long"
)


def image_alpha_stats(df: DataFrame, id_col: str = "doc_id",
                      payload_col: str = "payload") -> DataFrame:
    """Decode every payload and emit POSITION-WEIGHTED alpha sums
    (sum(x·a), sum(y·a)) plus the fully-transparent pixel count.  The
    coordinate weights make the result sensitive to WHERE tRNS
    transparency lands, not just how much of it there is — a decoder
    that looked up the right alpha table through the wrong index
    lattice still fails parity.  Images that decode without an alpha
    channel count as fully opaque at their bit depth.  Exact int64 on
    both engines; same exchange-free mapInPandas shape as the other
    media stats."""
    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                arr = png_decode(bytes(payload))
                h, w = arr.shape[0], arr.shape[1]
                if arr.shape[2] in (2, 4):
                    a = arr[:, :, -1].astype(np.int64)
                else:
                    opaque = 65535 if arr.dtype == np.uint16 else 255
                    a = np.full((h, w), opaque, dtype=np.int64)
                xs = np.arange(w, dtype=np.int64)[None, :]
                ys = np.arange(h, dtype=np.int64)[:, None]
                rows.append(
                    (int(doc_id), w, h,
                     int((xs * a).sum()), int((ys * a).sum()),
                     int((a == 0).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height",
                         "sum_xa", "sum_ya", "n_transparent"],
            )

    return src.mapInPandas(run, schema=ALPHA_STATS_SCHEMA)


def synth_audio_corpus(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One real PCM WAV per document (stdlib ``wave`` encoder).
    Schema: (doc_id long, payload binary)."""
    src = _scatter_ids(docs, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["doc_id"].astype("int64")
            payloads = [
                wav_encode(8000 + _key(int(d)) % 3 * 4000, _synth_samples(int(d)))
                for d in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return src.mapInPandas(run, schema="doc_id long, payload binary")


def synth_bmp_variant_corpus(docs: DataFrame,
                             id_col: str = "doc_id") -> DataFrame:
    """One BMP per document cycling through the real-world variant
    matrix by ``k % 4``: 8-bit paletted, 4-bit paletted TOP-DOWN,
    32-bit BGRX (pad byte carries a formula the decoder must drop),
    and 24-bit top-down — verifying the color table, sub-byte packing,
    pad-byte drop and BOTH row orders through one column (keep in
    sync with the media_bmp_variant_stats oracle; palette lattice
    shared with :func:`_synth_palette`).  Schema:
    (doc_id long, payload binary)."""
    src = _scatter_ids(docs, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                k = _key(int(d))
                form = k % 4
                if form in (0, 1):
                    idx, pal = _synth_palette(int(d))
                    payloads.append(
                        bmp_encode_palette(
                            idx, pal, depth=8 if form == 0 else 4,
                            topdown=form == 1,
                        )
                    )
                else:
                    px = _synth_pixels(int(d))
                    if form == 2:
                        h, w = px.shape[:2]
                        y, x = np.mgrid[0:h, 0:w]
                        pad = ((x + 7 * k) % 256).astype(np.uint8)
                        px = np.dstack([px, pad])
                    payloads.append(bmp_encode(px, topdown=form == 3))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return src.mapInPandas(run, schema="doc_id long, payload binary")


def synth_audio_depth_corpus(docs: DataFrame,
                             id_col: str = "doc_id") -> DataFrame:
    """One PCM WAV per document cycling through ALL FOUR integer
    sample widths by ``k % 4`` (8-bit unsigned, 16/24/32-bit signed) —
    the wire formats a real ingest corpus mixes.  32-bit payloads keep
    24-bit-range values so the downstream energy sum stays in exact
    int64 on both engines (a corpus choice, not a decoder limit).
    Schema: (doc_id long, payload binary)."""
    src = _scatter_ids(docs, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                k = _key(int(d))
                n = k % AUD_N_MOD + AUD_N_MIN
                i = np.arange(n, dtype=np.int64)
                r = i * i * 37 + i * 1009 + k * 31
                bits = (8, 16, 24, 32)[k % 4]
                if bits == 8:
                    stored = r % 256
                elif bits == 16:
                    stored = r % 65536 - 32768
                else:
                    stored = r % 16777216 - 8388608
                payloads.append(
                    wav_encode(8000 + k % 3 * 4000, stored, bits=bits)
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return src.mapInPandas(run, schema="doc_id long, payload binary")


def synth_stereo_audio_corpus(docs: DataFrame,
                              id_col: str = "doc_id") -> DataFrame:
    """One STEREO PCM WAV per document — left and right channels carry
    DIFFERENT closed-form signals (keep in sync with the
    media_audio_stereo_stats oracle), so a channel de-interleave error
    (swap, stride, off-by-one) breaks per-channel parity while leaving
    whole-stream sums intact.  Schema: (doc_id long, payload binary)."""
    src = _scatter_ids(docs, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                k = _key(int(d))
                n = k % AUD_N_MOD + AUD_N_MIN
                i = np.arange(n, dtype=np.int64)
                left = (i * i * 37 + i * 1009 + k * 31) % 65536 - 32768
                right = (i * i * 41 + i * 787 + k * 17) % 65536 - 32768
                frames = np.stack([left, right], axis=1)
                payloads.append(wav_encode(8000 + k % 3 * 4000, frames))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return src.mapInPandas(run, schema="doc_id long, payload binary")


CHANNEL_STATS_SCHEMA = (
    "doc_id long, sample_rate int, channel int, n_frames long, "
    "sum_sample long, sum_sq long"
)


def audio_channel_stats(df: DataFrame, id_col: str = "doc_id",
                        payload_col: str = "payload") -> DataFrame:
    """Decode WAV payloads and fan out ONE ROW PER CHANNEL with exact
    integer per-channel sums and energies — the statistics that verify
    interleaved frame layout channel by channel (mono payloads emit a
    single channel-0 row)."""
    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                rate, s = wav_decode(bytes(payload))
                if s.ndim == 1:
                    s = s[:, None]
                s64 = s.astype(np.int64)
                for ch in range(s64.shape[1]):
                    col = s64[:, ch]
                    rows.append(
                        (int(doc_id), int(rate), ch, len(col),
                         int(col.sum()), int((col * col).sum()))
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "channel", "n_frames",
                         "sum_sample", "sum_sq"],
            )

    return src.mapInPandas(run, schema=CHANNEL_STATS_SCHEMA)


IMAGE_STATS_SCHEMA = (
    "doc_id long, fmt string, width int, height int, n_px long, "
    "sum_r long, sum_g long, sum_b long"
)


def image_stats(df: DataFrame, id_col: str = "doc_id",
                payload_col: str = "payload") -> DataFrame:
    """Decode every payload (format sniffed from magic bytes) and emit
    integer channel statistics.  Integer sums — not float means — cross
    the engine boundary, so parity is exact by construction.
    Greyscale decodes replicate the single channel across r/g/b;
    RGBA ignores alpha for the channel sums."""
    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                data = bytes(payload)
                if data[:8] == PNG_SIG:
                    arr, fmt = png_decode(data), "png"
                elif data[:2] == b"BM":
                    arr, fmt = bmp_decode(data), "bmp"
                else:
                    raise ValueError(f"doc {doc_id}: unknown image format")
                if arr.shape[2] == 1:
                    arr = np.repeat(arr, 3, axis=2)
                sums = arr[:, :, :3].astype(np.int64).sum(axis=(0, 1))
                rows.append(
                    (int(doc_id), fmt, arr.shape[1], arr.shape[0],
                     arr.shape[0] * arr.shape[1],
                     int(sums[0]), int(sums[1]), int(sums[2]))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "fmt", "width", "height", "n_px",
                         "sum_r", "sum_g", "sum_b"],
            )

    return src.mapInPandas(run, schema=IMAGE_STATS_SCHEMA)


def resize_stats(df: DataFrame, out_w: int, out_h: int,
                 id_col: str = "doc_id",
                 payload_col: str = "payload") -> DataFrame:
    """Decode + nearest-neighbor resize to (out_w, out_h), emitting the
    resized integer channel sums — a REAL pixel resample whose output
    an independent engine can still reproduce exactly (floor index
    map, see :func:`nn_resize`)."""
    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                data = bytes(payload)
                arr = png_decode(data) if data[:8] == PNG_SIG else bmp_decode(data)
                small = nn_resize(arr[:, :, :3], out_w, out_h)
                sums = small.astype(np.int64).sum(axis=(0, 1))
                rows.append(
                    (int(doc_id), int(sums[0]), int(sums[1]), int(sums[2]))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "rs_r", "rs_g", "rs_b"]
            )

    return src.mapInPandas(
        run, schema="doc_id long, rs_r long, rs_g long, rs_b long"
    )


AUDIO_STATS_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, sum_sample long, "
    "sum_abs long, sum_sq long, n_sign_flips long"
)


def audio_stats(df: DataFrame, id_col: str = "doc_id",
                payload_col: str = "payload") -> DataFrame:
    """Decode WAV payloads (manual RIFF parser) and emit integer PCM
    statistics: sample count, sum, absolute sum, energy (sum of
    squares), and the count of sign flips between consecutive samples
    (>= 0 counted as non-negative) — all exact int64."""
    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                rate, s = wav_decode(bytes(payload))
                s64 = s.astype(np.int64)
                nonneg = s64 >= 0
                flips = int(np.count_nonzero(nonneg[1:] != nonneg[:-1]))
                rows.append(
                    (int(doc_id), int(rate), len(s64), int(s64.sum()),
                     int(np.abs(s64).sum()), int((s64 * s64).sum()), flips)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "n_samples", "sum_sample",
                         "sum_abs", "sum_sq", "n_sign_flips"],
            )

    return src.mapInPandas(run, schema=AUDIO_STATS_SCHEMA)

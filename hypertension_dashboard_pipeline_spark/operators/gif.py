"""GIF codec (GIF89a, LZW) — pure Python/numpy, no native libs.

Completes the real-decode media surface (``operators/media.py``) with
the one widely-deployed ANIMATED format that needs no native decoder:
multi-frame GIF makes the video-shaped operator — frame extraction,
one input row fanning out to N frame rows — REAL instead of the
honest fake in ``operators/multimodal.py:sample_frames`` (which stays
for formats that genuinely need ffmpeg).

Implemented from the public GIF89a specification:

* logical screen descriptor + global/local color tables;
* image descriptors, multiple frames, frame-local palettes;
* variable-width LZW decompression (clear/end codes, dictionary
  growth to 12 bits) — and a real dictionary-building LZW ENCODER,
  so round-trip tests exercise the decoder's growth path rather than
  the degenerate clear-every-code form;
* the 4-pass interlace row order;
* graphic control extensions are parsed and skipped (frame pixel
  data is what the operators consume; disposal compositing is a
  renderer concern, not a decode concern).

Execution shape: same as the rest of the media surface — Arrow-batched
``mapInPandas`` over a binary column, embarrassingly parallel, no
shuffle, 1->N output rows independent of input batch boundaries.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# LZW (GIF variant: variable code width, clear/end codes, 12-bit max)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # dictionary: code -> byte sequence
    base = {i: bytes([i]) for i in range(clear)}
    table = dict(base)
    next_code = end + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = dict(base)
                next_code = end + 1
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return bytes(out)
            if prev is None:
                first = table.get(code)
                if first is None:
                    raise ValueError(f"corrupt GIF LZW stream: code {code}")
                entry = first
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]
            else:
                raise ValueError(f"corrupt GIF LZW stream: code {code}")
            out += entry
            if prev is not None and next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
    return bytes(out)


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """Real dictionary-building GIF-LZW encoder (not the
    clear-every-code 'uncompressed GIF' trick), so decode round-trips
    exercise dictionary growth and width bumps."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    run = b""
    for b in data:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # width covers codes up to next_code - 1; bump BEFORE the
            # first code that needs the extra bit (decoder mirrors this)
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run])
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Pack a byte stream into GIF <=255-byte sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_rows(h: int) -> list[int]:
    rows: list[int] = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, h, step))
    return rows


# ---------------------------------------------------------------------------
# Container encode/decode
# ---------------------------------------------------------------------------


def gif_encode(frames: list[np.ndarray], palette: np.ndarray,
               interlace: bool = False,
               transparent_idx: int | None = None) -> bytes:
    """Encode palette-indexed frames as an (animated) GIF89a.

    ``frames``: list of ``uint8 (h, w)`` index arrays, all full-size.
    ``palette``: ``uint8 (256, 3)`` RGB global color table.
    ``transparent_idx`` sets the graphic-control-extension transparent
    color flag + index (GIF89a §23) on every frame — that palette slot
    decodes with alpha 0.
    """
    if not frames:
        raise ValueError("gif_encode needs at least one frame")
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.shape != (256, 3):
        raise ValueError(f"palette must be (256, 3), got {pal.shape}")
    if transparent_idx is not None and not 0 <= transparent_idx <= 255:
        raise ValueError("transparent index out of range")
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    # logical screen descriptor: GCT present, 8 bits/channel, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += pal.tobytes()
    for idx_arr in frames:
        a = np.asarray(idx_arr, dtype=np.uint8)
        if a.shape != (h, w):
            raise ValueError("all frames must share the logical screen size")
        # graphic control extension (delay 10cs)
        if transparent_idx is None:
            out += b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
        else:
            out += b"\x21\xf9\x04\x01\x0a\x00" + bytes(
                [transparent_idx]
            ) + b"\x00"
        packed = 0x40 if interlace else 0x00
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, packed)
        rows = a[_interlace_rows(h)] if interlace else a
        out.append(8)  # LZW min code size
        out += _sub_blocks(_lzw_encode(rows.tobytes(), 8))
    out += b"\x3b"
    return bytes(out)


def _gif_decode_inner(data: bytes) -> list[np.ndarray]:
    """Decode every frame of a GIF to ``uint8`` arrays — ``(h, w, 3)``
    RGB, or ``(h, w, 4)`` RGBA when the frame's graphic control
    extension declares a transparent color index (GIF89a §23: the flag
    applies to the single image that follows, then resets).

    Frames smaller than the logical screen are returned at their own
    size (no disposal compositing — decode, not rendering).  Raises
    ``ValueError`` on structural corruption.
    """
    if len(data) < 13 or data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF: bad signature")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct: np.ndarray | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    frames: list[np.ndarray] = []
    pending_tidx: int | None = None
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            label = data[pos]
            pos += 1
            # GCE (0xF9): parse the transparent-color flag + index;
            # everything else is skipped as before
            if (label == 0xF9 and pos < len(data) and data[pos] >= 4
                    and pos + 4 < len(data)):
                if data[pos + 1] & 0x01:
                    pending_tidx = data[pos + 4]
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise ValueError("GIF frame has no color table")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                lzw += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(_lzw_decode(bytes(lzw), min_code), np.uint8)
            if len(idx) < w * h:
                raise ValueError("truncated GIF frame pixel data")
            idx = idx[: w * h].reshape(h, w)
            if ipacked & 0x40:  # interlaced: invert the 4-pass order
                order = _interlace_rows(h)
                deinterlaced = np.empty_like(idx)
                deinterlaced[order] = idx
                idx = deinterlaced
            rgb = pal[idx]
            if pending_tidx is not None:
                alpha = np.where(idx == pending_tidx, 0, 255).astype(
                    np.uint8
                )
                rgb = np.concatenate([rgb, alpha[:, :, None]], axis=2)
                pending_tidx = None  # the GCE governs one image only
            frames.append(rgb)
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF contains no frames")
    return frames


def gif_decode(data: bytes) -> list[np.ndarray]:
    """Typed-error front door: ANY structural corruption — short
    headers, truncated segments, bad offsets — surfaces as ValueError,
    never a leaked struct.error/IndexError from the parse internals
    (see :func:`_gif_decode_inner` for the format contract)."""
    try:
        return _gif_decode_inner(data)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt GIF structure: {exc}") from None


# ---------------------------------------------------------------------------
# Synthetic animated corpus + frame-stats operator
# ---------------------------------------------------------------------------

# Generation formulas (encode side only — the decode operator sees
# bytes; the SQL oracle recomputes these closed forms).  k is the
# pmod-normalized doc key shared with operators/media.py.
GIF_W_MOD, GIF_W_MIN = 11, 2  # w = k % 11 + 2  (2..12)
GIF_H_MOD, GIF_H_MIN = 7, 2  # h = k % 7 + 2   (2..8)
GIF_F_MOD, GIF_F_MIN = 5, 2  # frames = k % 5 + 2 (2..6)

# palette entry i -> (i, (3i) % 256, (7i) % 256)
_PALETTE = np.stack(
    [
        np.arange(256, dtype=np.int64) % 256,
        np.arange(256, dtype=np.int64) * 3 % 256,
        np.arange(256, dtype=np.int64) * 7 % 256,
    ],
    axis=1,
).astype(np.uint8)


def _synth_frames(doc_id: int) -> list[np.ndarray]:
    from .media import _key

    k = _key(doc_id)
    w = k % GIF_W_MOD + GIF_W_MIN
    h = k % GIF_H_MOD + GIF_H_MIN
    n_frames = k % GIF_F_MOD + GIF_F_MIN
    y, x = np.mgrid[0:h, 0:w]
    return [
        ((x * 5 + y * 9 + f * 13 + k) % 256).astype(np.uint8)
        for f in range(n_frames)
    ]


def synth_gif_corpus(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One real animated GIF per document (interlaced for every third
    doc, exercising both row orders through one column).
    Schema: (doc_id long, payload binary)."""
    from .media import _key, _scatter_ids

    src = _scatter_ids(docs, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["doc_id"].astype("int64")
            payloads = [
                gif_encode(
                    _synth_frames(int(d)), _PALETTE,
                    interlace=_key(int(d)) % 3 == 0,
                )
                for d in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return src.mapInPandas(run, schema="doc_id long, payload binary")


def synth_gif_trns_corpus(docs: DataFrame,
                          id_col: str = "doc_id") -> DataFrame:
    """One animated GIF per document with a GCE transparent color
    index: frame indices run over a 16-slot sub-palette
    ``(x*5 + y*9 + f*13 + k) % 16`` and the transparent slot is
    ``k % 16``, so each frame carries a DIFFERENT transparency mask
    (the set of lattice points hitting the slot shifts with f) —
    interlaced for every third doc, composing transparency with the
    4-pass row order.  Schema: (doc_id long, payload binary)."""
    from .media import _key, _scatter_ids

    src = _scatter_ids(docs, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                k = _key(int(d))
                w = k % GIF_W_MOD + GIF_W_MIN
                h = k % GIF_H_MOD + GIF_H_MIN
                n_frames = k % GIF_F_MOD + GIF_F_MIN
                y, x = np.mgrid[0:h, 0:w]
                frames = [
                    ((x * 5 + y * 9 + f * 13 + k) % 16).astype(np.uint8)
                    for f in range(n_frames)
                ]
                payloads.append(
                    gif_encode(
                        frames, _PALETTE, interlace=k % 3 == 0,
                        transparent_idx=k % 16,
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return src.mapInPandas(run, schema="doc_id long, payload binary")


ALPHA_FRAME_STATS_SCHEMA = (
    "doc_id long, frame_idx int, width int, height int, "
    "sum_xa long, n_transparent long"
)


def gif_alpha_stats(df: DataFrame, id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """Per-frame POSITION-WEIGHTED alpha sums + transparent-pixel
    counts over decoded GIF frames — x-weighting makes the result
    sensitive to WHERE the transparent slot lands after de-interlace,
    not just how many pixels hit it.  Frames decoded without an alpha
    channel count as fully opaque."""
    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                for f_idx, frame in enumerate(gif_decode(bytes(payload))):
                    h, w = frame.shape[0], frame.shape[1]
                    if frame.shape[2] == 4:
                        a = frame[:, :, 3].astype(np.int64)
                    else:
                        a = np.full((h, w), 255, dtype=np.int64)
                    xs = np.arange(w, dtype=np.int64)[None, :]
                    rows.append(
                        (int(doc_id), f_idx, w, h,
                         int((xs * a).sum()), int((a == 0).sum()))
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "width", "height",
                         "sum_xa", "n_transparent"],
            )

    return src.mapInPandas(run, schema=ALPHA_FRAME_STATS_SCHEMA)


FRAME_STATS_SCHEMA = (
    "doc_id long, frame_idx int, width int, height int, "
    "sum_r long, sum_g long, sum_b long"
)


def gif_frame_stats(df: DataFrame, id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """REAL frame extraction: decode every GIF frame (LZW + palette +
    de-interlace) and fan out one row per frame with integer channel
    sums — the video-frame-sampling shape with actual decoded pixels.
    Output row count is a property of the DATA (frame counts), not of
    input batch boundaries."""
    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                for f_idx, frame in enumerate(gif_decode(bytes(payload))):
                    sums = frame.astype(np.int64).sum(axis=(0, 1))
                    rows.append(
                        (int(doc_id), f_idx, frame.shape[1], frame.shape[0],
                         int(sums[0]), int(sums[1]), int(sums[2]))
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "width", "height",
                         "sum_r", "sum_g", "sum_b"],
            )

    return src.mapInPandas(run, schema=FRAME_STATS_SCHEMA)

"""Real media codec tests (operators/media.py).

Codec-level: hand-built fixtures the module's own encoders did NOT
produce — a PNG with every spec filter type built from raw scanlines +
zlib in the test, a byte-level hand-assembled BMP, WAVs written by the
stdlib ``wave`` module (independent of the manual RIFF parser under
test).  Spark-level: the synthetic corpus queries against direct numpy
recomputation, plus batch-boundary invariance.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from hypertension_dashboard_pipeline_spark.operators import media as m


def _rng():
    return np.random.default_rng(20260816)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def test_png_roundtrip_rgb_gray_rgba():
    rng = _rng()
    for shape in [(5, 7, 3), (3, 4, 4), (6, 2), (1, 1, 3), (2, 1)]:
        a = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = m.png_decode(m.png_encode(a))
        ref = a if a.ndim == 3 else a[:, :, None]
        assert got.shape == ref.shape
        assert (got == ref).all()


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _png_with_filters(pixels: np.ndarray, filters: list[int]) -> bytes:
    """Build a PNG from scratch applying the given per-row filter types
    — independent of media.png_encode (which only ever emits type 0)."""
    h, w, ch = pixels.shape
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        cur = pixels[y].reshape(-1).astype(np.int64)
        f = filters[y]
        raw.append(f)
        for i in range(w * ch):
            left = cur[i - ch] if i >= ch else 0
            up = int(prev[i])
            ul = int(prev[i - ch]) if i >= ch else 0
            if f == 0:
                v = cur[i]
            elif f == 1:
                v = cur[i] - left
            elif f == 2:
                v = cur[i] - up
            elif f == 3:
                v = cur[i] - ((left + up) >> 1)
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                v = cur[i] - pred
            raw.append(int(v) & 0xFF)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        m.PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def test_png_decode_all_filter_types():
    rng = _rng()
    pixels = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    png = _png_with_filters(pixels, [0, 1, 2, 3, 4])
    assert (m.png_decode(png) == pixels).all()


def test_png_decode_random_filters_stress():
    """Randomized cross-check of the vectorized filter reconstruction
    (cumsum Sub, whole-row Up, pixel-strided Average/Paeth) against the
    independent per-byte filter APPLICATION in _png_with_filters."""
    rng = _rng()
    for trial in range(5):
        h, w = int(rng.integers(2, 40)), int(rng.integers(2, 40))
        pixels = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        filters = rng.integers(0, 5, size=h).tolist()
        png = _png_with_filters(pixels, filters)
        assert (m.png_decode(png) == pixels).all(), (trial, filters)


def test_png_decode_multiple_idat_chunks():
    """The spec allows pixel data split across any number of IDAT
    chunks; decoders must concatenate before inflating."""
    rng = _rng()
    pixels = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    whole = m.png_encode(pixels)
    # re-split the single IDAT into two
    sig, rest = whole[:8], whole[8:]
    (ihdr_len,) = struct.unpack(">I", rest[:4])
    ihdr = rest[: 12 + ihdr_len]
    rest = rest[12 + ihdr_len :]
    (idat_len,) = struct.unpack(">I", rest[:4])
    payload = rest[8 : 8 + idat_len]
    cut = len(payload) // 2
    rebuilt = (
        sig
        + ihdr
        + _chunk(b"IDAT", payload[:cut])
        + _chunk(b"IDAT", payload[cut:])
        + _chunk(b"IEND", b"")
    )
    assert (m.png_decode(rebuilt) == pixels).all()


def test_adam7_passes_partition_every_geometry():
    """The seven pass lattices must tile each (h, w) exactly once —
    the structural property the spec's pass table encodes (a wrong
    (x0, y0, dx, dy) row shows up as double-covered or missed
    pixels)."""
    for h in range(1, 18):
        for w in range(1, 18):
            cover = np.zeros((h, w), dtype=int)
            for x0, y0, dx, dy in m._ADAM7:
                cover[y0::dy, x0::dx] += 1
            assert (cover == 1).all(), (h, w)


def test_png_interlaced_roundtrip_all_channel_counts():
    """Adam7 encode -> decode is the identity across geometries that
    exercise absent passes (dims < 8/5/3), single-pixel images, and
    all three color types."""
    rng = _rng()
    for h, w in [(1, 1), (1, 9), (7, 1), (3, 4), (8, 8), (13, 21), (19, 32)]:
        for ch in (0, 3, 4):
            shape = (h, w) if ch == 0 else (h, w, ch)
            arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
            exp = arr[:, :, None] if ch == 0 else arr
            got = m.png_decode(m.png_encode(arr, interlace=True))
            assert got.shape == exp.shape
            assert (got == exp).all(), (h, w, ch)


def test_png_interlaced_matches_sequential_decode():
    """The same pixels encoded both ways decode to the same array —
    pins the interlaced path against the long-verified sequential
    one."""
    rng = _rng()
    arr = rng.integers(0, 256, size=(11, 17, 3), dtype=np.uint8)
    seq = m.png_decode(m.png_encode(arr))
    ilaced = m.png_decode(m.png_encode(arr, interlace=True))
    assert (seq == ilaced).all()


def test_png_interlaced_filtered_passes_decode():
    """Each pass is filtered independently: hand-build an interlaced
    stream whose passes use different filter types (Sub/Up on later
    passes reference the PASS-LOCAL previous scanline, never another
    pass) and check reconstruction against the strided sub-images."""
    rng = _rng()
    arr = rng.integers(0, 256, size=(10, 12, 3), dtype=np.uint8)
    raw = bytearray()
    for p, (x0, y0, dx, dy) in enumerate(m._ADAM7):
        sub = arr[y0::dy, x0::dx].astype(np.int64)
        if sub.size == 0:
            continue
        ftype = p % 3  # rotate None/Sub/Up across passes
        for j in range(sub.shape[0]):
            row = sub[j].reshape(-1)
            if ftype == 0:
                filt = row
            elif ftype == 1:  # Sub: raw[x] = out[x] - out[x-bpp]
                prev_px = np.concatenate(
                    [np.zeros(3, dtype=np.int64), row[:-3]]
                )
                filt = (row - prev_px) % 256
            else:  # Up: raw[x] = out[x] - prior scanline of SAME pass
                up = sub[j - 1].reshape(-1) if j > 0 else np.zeros_like(row)
                filt = (row - up) % 256
            raw.append(ftype)
            raw += filt.astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", 12, 10, 8, 2, 0, 0, 1)
    png = (
        m.PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    assert (m.png_decode(png) == arr).all()


def test_png_interlaced_truncated_or_padded_stream_is_typed_error():
    arr = np.arange(200, dtype=np.uint8).reshape(10, 20)
    raw = bytearray()
    for x0, y0, dx, dy in m._ADAM7:
        sub = arr[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw.append(0)
            raw += row.tobytes()
    ihdr = struct.pack(">IIBBBBB", 20, 10, 8, 0, 0, 0, 1)

    def build(payload: bytes) -> bytes:
        return (
            m.PNG_SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(payload))
            + _chunk(b"IEND", b"")
        )

    for mutant in (bytes(raw)[:-1], bytes(raw)[: len(raw) // 2],
                   bytes(raw) + b"\x00"):
        with pytest.raises(ValueError, match="length mismatch"):
            m.png_decode(build(mutant))


@pytest.mark.parametrize(
    "mutant,msg",
    [
        (b"\x88PNG\r\n\x1a\n" + b"\x00" * 32, "bad signature"),
        (m.PNG_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 32, 2, 0, 0, 0)),
         "bit depth"),
        (m.PNG_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 5, 0, 0, 0)),
         "color type"),
        (m.PNG_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)),
         "bit depth"),
        (m.PNG_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)),
         "paletted PNG bit depth"),
        (m.PNG_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 2)),
         "interlace method"),
    ],
)
def test_png_decode_rejects_unsupported(mutant, msg):
    with pytest.raises(ValueError, match=msg):
        m.png_decode(mutant)


def test_png_decode_truncation_is_a_clear_error():
    png = m.png_encode(np.zeros((3, 3, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        m.png_decode(png[: len(png) // 2])


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_all_padding_widths():
    rng = _rng()
    for w in range(1, 6):  # row padding 1/2/3/0 bytes across these
        a = rng.integers(0, 256, size=(4, w, 3), dtype=np.uint8)
        assert (m.bmp_decode(m.bmp_encode(a)) == a).all(), w


def test_bmp_decode_hand_assembled_topdown():
    """Byte-level BMP built in the test (not by bmp_encode): 2x2
    top-down (negative height), BGR order, 2-byte row padding."""
    # pixels (RGB): [[red, green], [blue, white]]
    rows_bgr = [
        bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00\x00",
        bytes([255, 0, 0]) + bytes([255, 255, 255]) + b"\x00\x00",
    ]
    body = b"".join(rows_bgr)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, len(body), 0, 0, 0, 0
    )
    got = m.bmp_decode(hdr + body)
    exp = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    assert (got == exp).all()


def test_bmp_decode_rejects_compressed_and_truncated():
    a = m.bmp_encode(np.zeros((2, 2, 3), dtype=np.uint8))
    compressed = a[:30] + struct.pack("<I", 1) + a[34:]  # biCompression=1 (RLE8)
    with pytest.raises(ValueError, match="compression"):
        m.bmp_decode(compressed)
    with pytest.raises(ValueError, match="truncated"):
        m.bmp_decode(a[:-3])


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def test_wav_decode_against_stdlib_encoder():
    samples = np.array([-32768, -1, 0, 1, 32767, 12345, -12345], dtype=np.int16)
    rate, got = m.wav_decode(m.wav_encode(44100, samples))
    assert rate == 44100
    assert got.dtype == np.int16
    assert (got == samples).all()


def test_wav_decode_skips_foreign_chunks():
    """Real WAVs carry LIST/INFO etc. between fmt and data; the chunk
    walk must skip them (including the odd-length word-align rule)."""
    samples = np.arange(-5, 5, dtype=np.int16)
    base = m.wav_encode(8000, samples)
    # splice a 3-byte (odd) foreign chunk right after the fmt chunk
    fmt_end = 12 + 8 + 16
    foreign = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    spliced = base[:fmt_end] + foreign + base[fmt_end:]
    rate, got = m.wav_decode(spliced)
    assert rate == 8000 and (got == samples).all()


def test_wav_decode_stereo_shape_and_rejections():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(2)
        wv.setsampwidth(2)
        wv.setframerate(16000)
        wv.writeframes(np.arange(8, dtype="<i2").tobytes())
    rate, got = m.wav_decode(buf.getvalue())
    assert got.shape == (4, 2)

    buf8 = io.BytesIO()
    with wave.open(buf8, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(1)
        wv.setframerate(16000)
        wv.writeframes(b"\x00\x80\xff")
    rate, got = m.wav_decode(buf8.getvalue())
    # 8-bit is unsigned midpoint-128, widened (v - 128) * 256
    assert got.dtype == np.int16
    assert got.tolist() == [-32768, 0, 32512]
    # a 12-bit depth is still a typed rejection: patch the fmt chunk's
    # wBitsPerSample field in a valid 16-bit stream
    blob = bytearray(m.wav_encode(8000, np.arange(4, dtype=np.int16)))
    i = blob.index(b"fmt ")
    struct.pack_into("<H", blob, i + 8 + 14, 12)
    with pytest.raises(ValueError, match="bit depth"):
        m.wav_decode(bytes(blob))
    with pytest.raises(ValueError, match="RIFF"):
        m.wav_decode(b"not audio at all")


def test_wav_24_and_32_bit_decode_sign_extension():
    """24-bit: 3-byte little-endian two's complement, bit 23 the sign;
    32-bit: plain int32 — both against the independent stdlib-wave
    encoder path in wav_encode."""
    vals24 = np.array([0, 1, -1, 8388607, -8388608, -42], dtype=np.int64)
    rate, got = m.wav_decode(m.wav_encode(44100, vals24, bits=24))
    assert rate == 44100 and got.dtype == np.int32
    assert got.tolist() == vals24.tolist()
    vals32 = np.array([0, 2**31 - 1, -(2**31), 123456789], dtype=np.int64)
    rate, got = m.wav_decode(m.wav_encode(22050, vals32, bits=32))
    assert got.dtype == np.int32
    assert got.tolist() == vals32.tolist()
    # data length not a multiple of the sample size is typed
    blob = m.wav_encode(8000, vals24, bits=24)
    i = blob.rindex(b"data")
    cut = blob[: i + 8 + 4]  # 4 bytes of 3-byte samples
    patched = bytearray(cut)
    struct.pack_into("<I", patched, i + 4, 4)
    with pytest.raises(ValueError, match="multiple of the sample size"):
        m.wav_decode(bytes(patched))


# ---------------------------------------------------------------------------
# Resize geometry
# ---------------------------------------------------------------------------


def test_nn_resize_floor_index_map():
    rng = _rng()
    a = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    got = m.nn_resize(a, 4, 3)
    for yo in range(3):
        for xo in range(4):
            assert (got[yo, xo] == a[(yo * 10) // 3, (xo * 7) // 4]).all()
    up = m.nn_resize(a, 14, 20)  # upscale works too
    assert up.shape == (20, 14, 3)


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def test_image_stats_matches_direct_numpy(spark, sf_smoke):
    from hypertension_dashboard_pipeline_spark.io import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(40)
    stats = m.image_stats(m.synth_image_corpus(docs)).collect()
    assert len(stats) == 40
    for row in stats:
        px = m._synth_pixels(row.doc_id)
        assert row.fmt == ("png" if row.doc_id % 2 == 0 else "bmp")
        assert (row.width, row.height) == (px.shape[1], px.shape[0])
        s = px.astype(np.int64).sum(axis=(0, 1))
        assert (row.sum_r, row.sum_g, row.sum_b) == (s[0], s[1], s[2])


def test_audio_stats_matches_direct_numpy(spark, sf_smoke):
    from hypertension_dashboard_pipeline_spark.io import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(40)
    stats = m.audio_stats(m.synth_audio_corpus(docs)).collect()
    assert len(stats) == 40
    for row in stats:
        s = m._synth_samples(row.doc_id).astype(np.int64)
        nonneg = s >= 0
        assert row.n_samples == len(s)
        assert row.sum_sample == s.sum()
        assert row.sum_sq == (s * s).sum()
        assert row.n_sign_flips == int(np.count_nonzero(nonneg[1:] != nonneg[:-1]))


def test_image_stats_partition_invariant(spark, sf_smoke):
    """Arrow batch/partition boundaries must not affect results —
    decode is per-row; repartitioning the corpus is a no-op on values."""
    from hypertension_dashboard_pipeline_spark.io import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(60)
    corpus = m.synth_image_corpus(docs)
    one = sorted(map(tuple, m.image_stats(corpus.coalesce(1)).collect()))
    many = sorted(map(tuple, m.image_stats(corpus.repartition(7)).collect()))
    assert one == many


def test_png_palette_roundtrip_all_depths():
    """Color type 3 at depths 1/2/4/8: sub-byte MSB-first packing with
    scanline tail padding, PLTE lookup, sequential and Adam7 — decode
    returns the palette-expanded RGB."""
    rng = _rng()
    for depth in (1, 2, 4, 8):
        for h, w in [(1, 1), (3, 5), (7, 9), (10, 13)]:
            n = int(rng.integers(1, (1 << depth) + 1))
            pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
            idx = rng.integers(0, n, (h, w), dtype=np.uint8)
            for il in (False, True):
                dec = m.png_decode(
                    m.png_encode_palette(idx, pal, depth=depth, interlace=il)
                )
                assert dec.shape == (h, w, 3)
                assert (dec == pal[idx]).all(), (depth, h, w, il)


def test_png_palette_subbyte_padding_is_per_scanline():
    """Widths that don't fill the last byte exercise the per-scanline
    tail padding: a 2-bit, 5-wide image uses 2 bytes/row with 6 junk
    bits that must be discarded, not read into the next row."""
    idx = np.arange(15, dtype=np.uint8).reshape(3, 5) % 4
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    dec = m.png_decode(m.png_encode_palette(idx, pal, depth=2))
    assert (dec == pal[idx]).all()


def test_png_palette_rejections():
    idx = np.zeros((2, 2), np.uint8)
    pal = np.zeros((4, 3), np.uint8)
    with pytest.raises(ValueError, match="bit depth"):
        m.png_encode_palette(idx, pal, depth=3)
    with pytest.raises(ValueError, match="too large"):
        m.png_encode_palette(idx, np.zeros((5, 3), np.uint8), depth=2)
    with pytest.raises(ValueError, match="index out of range"):
        m.png_encode_palette(np.full((2, 2), 9, np.uint8), pal)
    # decoder: missing PLTE
    blob = m.png_encode_palette(idx, pal)
    i = blob.index(b"PLTE")
    # excise the whole PLTE chunk (4 len + 4 tag + 12 payload + 4 crc)
    no_plte = blob[: i - 4] + blob[i + 4 + 12 + 4 :]
    with pytest.raises(ValueError, match="missing PLTE"):
        m.png_decode(no_plte)
    # decoder: index beyond palette — rebuild with a 2-entry palette
    blob2 = m.png_encode_palette(np.full((2, 2), 3, np.uint8), pal)
    j = blob2.index(b"PLTE")
    rebuilt = (
        blob2[: j - 4]
        + m._png_chunk(b"PLTE", bytes(6))
        + blob2[j + 4 + 12 + 4 :]
    )
    with pytest.raises(ValueError, match="index out of range"):
        m.png_decode(rebuilt)


def test_position_stats_grayscale_replicates_channels(spark):
    """A grayscale (color-type-0) PNG through image_position_stats must
    replicate the single channel across r/g/b (image_stats convention)
    instead of crashing the Arrow worker on arr[:, :, 1] — the r12
    advice case."""
    gray = (np.arange(5 * 7, dtype=np.uint8) * 11 % 256).reshape(5, 7)
    payload = m.png_encode(gray)
    df = spark.createDataFrame([(1, bytearray(payload))],
                               "doc_id long, payload binary")
    row = m.image_position_stats(df).collect()[0]
    g = gray.astype(np.int64)
    xs = np.arange(7, dtype=np.int64)[None, :]
    ys = np.arange(5, dtype=np.int64)[:, None]
    assert (row.width, row.height) == (7, 5)
    assert row.sum_xr == int((xs * g).sum())
    assert row.sum_yg == int((ys * g).sum())
    assert row.sum_b == int(g.sum())


# ------------------------------------------------------- 16-bit + tRNS (r13)


def test_png_16bit_roundtrip_grey_and_rgb_both_codings():
    rgb = ((np.arange(6 * 9 * 3, dtype=np.int64) * 9973) % 65536).astype(
        np.uint16
    ).reshape(6, 9, 3)
    grey = rgb[:, :, 0]
    for il in (False, True):
        out = m.png_decode(m.png_encode(rgb, interlace=il))
        assert out.dtype == np.uint16 and (out == rgb).all()
        out = m.png_decode(m.png_encode(grey, interlace=il))
        assert out.shape == (6, 9, 1) and (out[:, :, 0] == grey).all()


def test_png_16bit_filtered_scanlines_decode():
    """Filters operate on BYTES with bpp = 2 (16-bit grey): hand-craft
    Sub/Up-filtered scanlines and pin the reconstruction — a decoder
    that filtered on 16-bit SAMPLES would differ whenever a carry
    crosses the hi/lo byte boundary."""
    # target pixels: row0 = [0x0102, 0x0305], row1 = [0x0103, 0x0306]
    # raw bytes row0: 01 02 03 05 ; row1: 01 03 03 06
    # Sub on row0 (bpp=2): keep first pixel, later bytes minus the byte
    # 2 back: 01 02 (03-01)=02 (05-02)=03
    # Up on row1: byte-wise delta vs row0: 00 01 00 01
    raw = bytes([1, 0x01, 0x02, 0x02, 0x03,  # filter 1 (Sub)
                 2, 0x00, 0x01, 0x00, 0x01])  # filter 2 (Up)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    blob = (
        m.PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = m.png_decode(blob)
    assert out.dtype == np.uint16
    assert out[:, :, 0].tolist() == [[0x0102, 0x0305], [0x0103, 0x0306]]


def test_png_trns_palette_short_table_defaults_opaque():
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    for il in (False, True):
        blob = m.png_encode_palette(
            idx, pal, depth=2, interlace=il,
            trns=np.array([10, 0], dtype=np.uint8),
        )
        out = m.png_decode(blob)
        assert out.shape == (2, 4, 4)
        assert (out[:, :, :3] == pal[idx]).all()
        alpha = np.array([10, 0, 255, 255], dtype=np.uint8)[idx]
        assert (out[:, :, 3] == alpha).all()


def test_png_trns_colorkey_grey_rgb_and_16bit():
    g8 = np.array([[1, 2], [3, 1]], dtype=np.uint8)
    out = m.png_decode(m.png_encode(g8, trns=1))
    assert out.shape == (2, 2, 2)
    assert out[:, :, 1].tolist() == [[0, 255], [255, 0]]
    rgb8 = np.zeros((3, 3, 3), np.uint8)
    rgb8[1, 1] = [9, 8, 7]
    out = m.png_decode(m.png_encode(rgb8, trns=(9, 8, 7)))
    assert out.shape == (3, 3, 4)
    assert out[1, 1, 3] == 0 and out[0, 0, 3] == 255
    g16 = ((np.arange(12, dtype=np.int64) * 5003) % 65536).astype(
        np.uint16
    ).reshape(3, 4)
    out = m.png_decode(m.png_encode(g16, trns=int(g16[2, 1])))
    assert out.dtype == np.uint16 and out.shape == (3, 4, 2)
    assert out[2, 1, 1] == 0
    assert (out[:, :, 1][g16 != g16[2, 1]] == 65535).all()


def test_png_trns_rejections():
    rgba = np.zeros((2, 2, 4), np.uint8)
    with pytest.raises(ValueError, match="alpha color types"):
        m.png_encode(rgba, trns=(1, 2, 3))
    with pytest.raises(ValueError, match="out of range"):
        m.png_encode(np.zeros((2, 2), np.uint8), trns=300)
    with pytest.raises(ValueError, match="triple"):
        m.png_encode(np.zeros((2, 2, 3), np.uint8), trns=(1, 2))
    with pytest.raises(ValueError, match="palette size"):
        m.png_encode_palette(
            np.zeros((2, 2), np.uint8), np.zeros((4, 3), np.uint8),
            trns=np.zeros(5, np.uint8),
        )
    # decoder: tRNS on an alpha color type is a typed error
    blob = m.png_encode(rgba)
    i = blob.index(b"IDAT")
    hostile = (
        blob[: i - 4]
        + m._png_chunk(b"tRNS", struct.pack(">3H", 1, 2, 3))
        + blob[i - 4 :]
    )
    with pytest.raises(ValueError, match="alpha color types"):
        m.png_decode(hostile)
    # decoder: key out of range for the declared bit depth
    blob = m.png_encode(np.zeros((2, 2), np.uint8))
    i = blob.index(b"IDAT")
    hostile = (
        blob[: i - 4]
        + m._png_chunk(b"tRNS", struct.pack(">H", 256))
        + blob[i - 4 :]
    )
    with pytest.raises(ValueError, match="out of range"):
        m.png_decode(hostile)
    # decoder: wrong chunk length for the color type
    blob = m.png_encode(np.zeros((2, 2, 3), np.uint8))
    i = blob.index(b"IDAT")
    hostile = (
        blob[: i - 4]
        + m._png_chunk(b"tRNS", struct.pack(">H", 0))
        + blob[i - 4 :]
    )
    with pytest.raises(ValueError, match="tRNS chunk length"):
        m.png_decode(hostile)


def test_png_full_ihdr_matrix_roundtrip():
    """Every spec-legal (color type, bit depth) pair from PNG 1.2
    table 11.1 encodes and decodes as the identity (sub-byte grey up
    to the exact ×255/85/17 sample scaling), sequential and Adam7."""
    rng = _rng()
    for il in (False, True):
        for d in (1, 2, 4):  # ctype 0 sub-byte
            a = rng.integers(0, 1 << d, size=(9, 13), dtype=np.uint8)
            out = m.png_decode(m.png_encode(a, interlace=il, depth=d))
            assert (out[:, :, 0] == a * (255 // ((1 << d) - 1))).all()
        for ch in (1, 2, 3, 4):  # ctypes 0/4/2/6 at 8 and 16
            for dt_ in (np.uint8, np.uint16):
                hi = 256 if dt_ == np.uint8 else 65536
                shape = (7, 5) if ch == 1 else (7, 5, ch)
                a = rng.integers(0, hi, size=shape, dtype=dt_)
                out = m.png_decode(m.png_encode(a, interlace=il))
                exp = a[:, :, None] if ch == 1 else a
                assert out.dtype == dt_ and (out == exp).all(), (ch, dt_, il)


def test_png_subbyte_grey_trns_and_rejections():
    a = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    out = m.png_decode(m.png_encode(a, depth=2, trns=2))
    assert out.shape == (2, 4, 2)
    assert (out[:, :, 0] == a * 85).all()
    assert (out[:, :, 1] == np.where(a == 2, 0, 255)).all()
    with pytest.raises(ValueError, match="alpha color types"):
        m.png_encode(np.zeros((2, 2, 2), np.uint8), trns=1)
    with pytest.raises(ValueError, match="out of range"):
        m.png_encode(np.full((2, 2), 4, np.uint8), depth=2)
    with pytest.raises(ValueError, match="grey array"):
        m.png_encode(np.zeros((2, 2, 3), np.uint8), depth=4)
    with pytest.raises(ValueError, match="1/2/4"):
        m.png_encode(np.zeros((2, 2), np.uint8), depth=3)
    with pytest.raises(ValueError, match="out of range"):
        m.png_encode(np.zeros((2, 2), np.uint8), depth=2, trns=4)


def test_alpha_stats_matches_direct_numpy(spark):
    """image_alpha_stats over one payload of each corpus form equals a
    direct numpy computation on the decoded array."""
    idx = (np.arange(5 * 6, dtype=np.int64) % 4).astype(np.uint8).reshape(5, 6)
    pal = (np.arange(12, dtype=np.int64) * 7 % 256).astype(np.uint8).reshape(4, 3)
    pal_blob = m.png_encode_palette(
        idx, pal, depth=4, trns=np.array([0, 128], dtype=np.uint8)
    )
    rgb = (np.arange(4 * 5 * 3, dtype=np.int64) % 256).astype(np.uint8).reshape(4, 5, 3)
    key_blob = m.png_encode(rgb, trns=tuple(int(v) for v in rgb[2, 3]))
    plain_blob = m.png_encode(rgb)  # no alpha: fully opaque at depth 8
    df = spark.createDataFrame(
        [(1, bytearray(pal_blob)), (2, bytearray(key_blob)),
         (3, bytearray(plain_blob))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in m.image_alpha_stats(df).collect()}
    for doc_id, blob in ((1, pal_blob), (2, key_blob), (3, plain_blob)):
        arr = m.png_decode(blob)
        h, w = arr.shape[:2]
        a = (arr[:, :, -1].astype(np.int64) if arr.shape[2] in (2, 4)
             else np.full((h, w), 255, dtype=np.int64))
        xs = np.arange(w, dtype=np.int64)[None, :]
        ys = np.arange(h, dtype=np.int64)[:, None]
        r = rows[doc_id]
        assert (r.width, r.height) == (w, h)
        assert r.sum_xa == int((xs * a).sum())
        assert r.sum_ya == int((ys * a).sum())
        assert r.n_transparent == int((a == 0).sum())


# -------------------------------------------------------- BMP variants (r13)


def test_bmp_paletted_roundtrip_all_depths_and_orders():
    rng = _rng()
    for d in (1, 4, 8):
        n = (1 << d) if d < 8 else 200
        pal = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
        for w in (1, 3, 7, 9):
            for td in (False, True):
                idx = rng.integers(0, n, size=(5, w), dtype=np.uint8)
                blob = m.bmp_encode_palette(idx, pal, depth=d, topdown=td)
                assert (m.bmp_decode(blob) == pal[idx]).all(), (d, w, td)


def test_bmp_32bit_drops_pad_byte_and_row_orders():
    rng = _rng()
    for w in (1, 2, 5):
        for td in (False, True):
            a = rng.integers(0, 256, size=(4, w, 4), dtype=np.uint8)
            out = m.bmp_decode(m.bmp_encode(a, topdown=td))
            assert out.shape == (4, w, 3)
            assert (out == a[:, :, :3]).all(), (w, td)


def test_bmp_variant_rejections():
    with pytest.raises(ValueError, match="wants"):
        m.bmp_encode(np.zeros((2, 2), np.uint8))
    with pytest.raises(ValueError, match="index out of range"):
        m.bmp_encode_palette(
            np.full((2, 2), 2, np.uint8), np.zeros((2, 3), np.uint8)
        )
    with pytest.raises(ValueError, match="1 <= n <= 2"):
        m.bmp_encode_palette(
            np.zeros((2, 2), np.uint8), np.zeros((3, 3), np.uint8), depth=1
        )
    with pytest.raises(ValueError, match="bit depth"):
        m.bmp_encode_palette(
            np.zeros((2, 2), np.uint8), np.zeros((4, 3), np.uint8), depth=2
        )
    # decoder: foreign stream with a pixel index beyond the color table
    blob = bytearray(
        m.bmp_encode_palette(np.zeros((2, 2), np.uint8),
                             np.zeros((2, 3), np.uint8))
    )
    blob[-4] = 5  # first pixel byte of the last stored row
    with pytest.raises(ValueError, match="index out of range"):
        m.bmp_decode(bytes(blob))
    # decoder: 16-bit depth stays a typed rejection
    blob = bytearray(m.bmp_encode(np.zeros((2, 2, 3), np.uint8)))
    struct.pack_into("<H", blob, 28, 16)
    with pytest.raises(ValueError, match="unsupported BMP"):
        m.bmp_decode(bytes(blob))


def test_wav_multichannel_roundtrip_all_depths():
    """Interleaved multi-channel frames roundtrip at every width; the
    decoder reshapes to (n_frames, n_channels)."""
    rng = _rng()
    for ch in (2, 3):
        frames = rng.integers(-30000, 30000, size=(11, ch)).astype(np.int64)
        for bits in (16, 24, 32):
            rate, got = m.wav_decode(
                m.wav_encode(22050, frames, bits=bits)
            )
            assert got.shape == (11, ch), (ch, bits)
            assert got.tolist() == frames.tolist(), (ch, bits)
        raw8 = rng.integers(0, 256, size=(7, ch)).astype(np.int64)
        rate, got = m.wav_decode(m.wav_encode(8000, raw8, bits=8))
        assert got.tolist() == ((raw8 - 128) * 256).tolist(), ch

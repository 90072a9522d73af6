"""Baseline JPEG codec tests (operators/jpeg.py): closed-form decode
parity over a dense color lattice, general-path (AC) round-trips,
huffman/bitstream mechanics, scope rejections, and the Spark operator.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from hypertension_dashboard_pipeline_spark.operators import jpeg as J


def _rng():
    return np.random.default_rng(20260818)


def _closed_form(rgb):
    """Independent (test-side) statement of the constant-tile decode
    law: RGB -> YCbCr -> DC quantize/dequant -> YCbCr -> RGB with
    floor(x+0.5) everywhere — what the SQL oracle also computes."""
    r, g, b = (float(v) for v in rgb)

    def rhu(x):
        return math.floor(x + 0.5)

    def cl(x):
        return min(255, max(0, x))

    y = cl(rhu(0.299 * r + 0.587 * g + 0.114 * b))
    cb = cl(rhu(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0))
    cr = cl(rhu(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0))
    rec = []
    for v, q in ((y, 16), (cb, 17), (cr, 17)):
        dcq = rhu(8.0 * (v - 128.0) / q)
        rec.append(cl(rhu(dcq * q / 8.0 + 128.0)))
    yd, cbd, crd = rec
    return (
        cl(rhu(yd + 1.402 * (crd - 128.0))),
        cl(rhu(yd - 0.344136 * (cbd - 128.0) - 0.714136 * (crd - 128.0))),
        cl(rhu(yd + 1.772 * (cbd - 128.0))),
    )


def test_constant_tiles_decode_to_the_exact_closed_form():
    """Dense lattice (~2.4k colors incl. the DC half-boundary hitters)
    packed into one image: every decoded tile must equal the closed
    form EXACTLY — this is the law the SQL oracle relies on."""
    colors = [(r, g, b)
              for r in range(0, 256, 17)
              for g in range(0, 256, 21)
              for b in range(0, 256, 23)]
    colors += [(238, 238, 238), (239, 239, 239), (0, 0, 0), (255, 255, 255),
               (133, 133, 133)]  # odd-luma half-boundary case
    cols = 16
    rows = (len(colors) + cols - 1) // cols
    img = np.zeros((rows * 8, cols * 8, 3), np.uint8)
    for idx, c in enumerate(colors):
        j, i = divmod(idx, cols)
        img[j * 8 : (j + 1) * 8, i * 8 : (i + 1) * 8] = c
    dec = J.jpeg_decode(J.jpeg_encode(img))
    for idx, c in enumerate(colors):
        j, i = divmod(idx, cols)
        tile = dec[j * 8 : (j + 1) * 8, i * 8 : (i + 1) * 8]
        assert (tile == tile[0, 0]).all(), c
        assert tuple(int(v) for v in tile[0, 0]) == _closed_form(c), c


def test_general_ac_path_roundtrip_quality():
    """Non-constant blocks run the full AC huffman + IDCT path.  A
    smooth gradient must survive Q50 nearly exactly; decode must also
    be deterministic byte-for-byte."""
    y, x = np.mgrid[0:16, 0:24]
    img = np.stack([(x * 3 + y) % 64 + 96,
                    (x + y * 2) % 64 + 64,
                    (x * 2 + y * 3) % 64 + 128], axis=-1).astype(np.uint8)
    data = J.jpeg_encode(img)
    dec1 = J.jpeg_decode(data)
    dec2 = J.jpeg_decode(data)
    assert (dec1 == dec2).all()
    err = np.abs(dec1.astype(int) - img.astype(int))
    assert err.mean() < 8.0, err.mean()  # lossy but sane at Q50


def test_noise_roundtrip_is_lossy_but_structurally_valid():
    rng = _rng()
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    dec = J.jpeg_decode(J.jpeg_encode(img))
    assert dec.shape == img.shape and dec.dtype == np.uint8


def test_byte_stuffing_roundtrip():
    """An input whose entropy stream contains 0xFF bytes — the
    stuffed 0xFF 0x00 pairs must be transparent to the decoder.
    (Seed found by search; the assertion below keeps the test honest
    if the encoder's bit packing ever changes.)"""
    img = np.random.default_rng(7).integers(0, 256, (8, 16, 3), np.uint8)
    data = J.jpeg_encode(img)
    scan = data[data.index(b"\xff\xda") + 14 : -2]
    assert b"\xff\x00" in scan  # stuffing actually exercised
    dec1 = J.jpeg_decode(data)
    dec2 = J.jpeg_decode(data)
    assert dec1.shape == img.shape and (dec1 == dec2).all()


def test_dc_prediction_across_blocks():
    """DC coding is differential; a horizontal gradient of tiles
    exercises nonzero diffs of both signs."""
    vals = [0, 128, 255, 16, 240, 32]
    img = np.zeros((8, 8 * len(vals), 3), np.uint8)
    for i, v in enumerate(vals):
        img[:, i * 8 : (i + 1) * 8] = v
    dec = J.jpeg_decode(J.jpeg_encode(img))
    for i, v in enumerate(vals):
        assert tuple(int(c) for c in dec[4, i * 8 + 4]) == _closed_form((v, v, v))


def test_magnitude_coding_is_an_exact_involution():
    for v in list(range(-300, 301)) + [-32767, 32767]:
        size = J._magnitude_category(v)
        if v == 0:
            assert size == 0
            continue
        assert J._decode_magnitude(J._encode_magnitude(v, size), size) == v


def test_decode_rejections():
    img = np.zeros((8, 8, 3), np.uint8)
    good = J.jpeg_encode(img)
    with pytest.raises(ValueError, match="SOI"):
        J.jpeg_decode(b"\x00\x00" + good)
    # flip SOF0 into SOF2: the stream now parses as progressive, and
    # its full-band interleaved scan violates the progressive scan
    # rules (a DC scan must have Se=0) — typed error, not a bad decode
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="Se=0"):
        J.jpeg_decode(prog)
    # other SOFs (lossless, arithmetic) stay rejected outright
    lossless = good.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with pytest.raises(ValueError, match="unsupported JPEG coding"):
        J.jpeg_decode(lossless)
    with pytest.raises(ValueError):
        J.jpeg_decode(good[: len(good) // 2])
    with pytest.raises(ValueError, match="multiples of the MCU"):
        J.jpeg_encode(np.zeros((7, 8, 3), np.uint8))


def test_decode_tolerates_fill_bytes_and_standalone_markers():
    """Spec-legal 0xFF fill bytes between segments and length-less
    TEM markers in the header must not break the marker walk
    (ITU T.81 B.1.1.2; ADVICE r10)."""
    img = (np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3) * 5) % 256
    good = J.jpeg_encode(img.astype(np.uint8))
    base = J.jpeg_decode(good)
    # insert fill bytes + a TEM marker right after SOI (before DQT)
    padded = good[:2] + b"\xff\xff\xff\x01" + good[2:]
    assert (J.jpeg_decode(padded) == base).all()
    # fill bytes immediately before an existing marker: turn the DQT
    # marker's 0xFF into 0xFF 0xFF 0xFF sequence
    i = good.index(b"\xff\xdb")
    stuffed = good[:i] + b"\xff\xff" + good[i:]
    assert (J.jpeg_decode(stuffed) == base).all()


def test_jpeg_stats_matches_direct_numpy(spark, sf_smoke):
    from hypertension_dashboard_pipeline_spark.io import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(30)
    rows = J.jpeg_stats(J.synth_jpeg_corpus(docs)).collect()
    assert len(rows) == 30
    for row in rows:
        src = J._synth_tile_rgb(row.doc_id)
        assert (row.width, row.height) == (src.shape[1], src.shape[0])
        exp = np.zeros(3, dtype=np.int64)
        for j in range(src.shape[0] // 8):
            for i in range(src.shape[1] // 8):
                exp += 64 * np.array(_closed_form(src[j * 8, i * 8]))
        assert (row.sum_r, row.sum_g, row.sum_b) == tuple(exp)


def test_jpeg_stats_partition_invariant(spark, sf_smoke):
    from hypertension_dashboard_pipeline_spark.io import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(40)
    corpus = J.synth_jpeg_corpus(docs)
    one = sorted(map(tuple, J.jpeg_stats(corpus.coalesce(1)).collect()))
    many = sorted(map(tuple, J.jpeg_stats(corpus.repartition(7)).collect()))
    assert one == many


# ---------------------------------------------------------------------------
# Progressive (SOF2, ITU T.81 Annex G)
# ---------------------------------------------------------------------------


def test_progressive_decode_equals_baseline_decode():
    """Progressive is a different entropy coding of the same quantized
    coefficients, so both streams must decode to BIT-IDENTICAL pixels —
    random content exercises DC first/refine, AC first and the
    successive-approximation refinement (correction bits, newly-
    significant placements, EOB runs with buffered corrections)."""
    rng = np.random.default_rng(3)
    for _ in range(25):
        h = 8 * int(rng.integers(1, 6))
        w = 8 * int(rng.integers(1, 6))
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        base = J.jpeg_decode(J.jpeg_encode(arr))
        prog = J.jpeg_decode(J.jpeg_encode_progressive(arr))
        assert np.array_equal(base, prog), (h, w)


@pytest.mark.parametrize(
    "script",
    [
        # spectral selection only, no successive approximation
        (((0, 1, 2), 0, 0, 0, 0),
         ((0,), 1, 63, 0, 0), ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0)),
        # three-level DC successive approximation
        (((0, 1, 2), 0, 0, 0, 2), ((0, 1, 2), 0, 0, 2, 1),
         ((0, 1, 2), 0, 0, 1, 0),
         ((0,), 1, 63, 0, 0), ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0)),
        # three-level AC successive approximation
        (((0, 1, 2), 0, 0, 0, 0),
         ((0,), 1, 63, 0, 2), ((1,), 1, 63, 0, 2), ((2,), 1, 63, 0, 2),
         ((0,), 1, 63, 2, 1), ((1,), 1, 63, 2, 1), ((2,), 1, 63, 2, 1),
         ((0,), 1, 63, 1, 0), ((1,), 1, 63, 1, 0), ((2,), 1, 63, 1, 0)),
        # many narrow bands, asymmetric across components
        (((0, 1, 2), 0, 0, 0, 1), ((0, 1, 2), 0, 0, 1, 0),
         ((0,), 1, 2, 0, 0), ((0,), 3, 9, 0, 0), ((0,), 10, 63, 0, 0),
         ((1,), 1, 20, 0, 0), ((1,), 21, 63, 0, 0),
         ((2,), 1, 63, 0, 0)),
    ],
    ids=["no-sa", "deep-dc-sa", "deep-ac-sa", "many-bands"],
)
def test_progressive_alternative_scripts_decode(script):
    """The decoder is scan-script-driven from the SOS headers — any
    spec-legal script must reassemble the same coefficients."""
    rng = np.random.default_rng(17)
    for _ in range(8):
        h = 8 * int(rng.integers(1, 5))
        w = 8 * int(rng.integers(1, 5))
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        base = J.jpeg_decode(J.jpeg_encode(arr))
        prog = J.jpeg_decode(J.jpeg_encode_progressive(arr, script=script))
        assert np.array_equal(base, prog), (h, w)


def test_progressive_long_eob_runs():
    """A large constant image makes every AC scan a single EOB run
    spanning hundreds of blocks (>255 forces multi-bit EOBn extra
    fields), and the refinement scans must still consume one run slot
    per block."""
    big = np.full((160, 160, 3), 200, dtype=np.uint8)
    base = J.jpeg_decode(J.jpeg_encode(big))
    prog = J.jpeg_decode(J.jpeg_encode_progressive(big))
    assert np.array_equal(base, prog)
    assert (base == base[0, 0]).all()  # constant image stays constant


def test_progressive_constant_tiles_hit_the_closed_form():
    """The oracle corpus shape: progressive decode of constant tiles
    must land on the same DC-only closed form the baseline query is
    externally verified against."""
    for k in (0, 5, 777, -3):
        src = J._synth_tile_rgb(k)
        prog = J.jpeg_decode(J.jpeg_encode_progressive(src))
        assert np.array_equal(prog, J.jpeg_decode(J.jpeg_encode(src)))
        for j in range(src.shape[0] // 8):
            for i in range(src.shape[1] // 8):
                tile = prog[j * 8 : j * 8 + 8, i * 8 : i * 8 + 8]
                assert (tile == tile[0, 0]).all()
                assert tuple(tile[0, 0]) == _closed_form(src[j * 8, i * 8])


def test_progressive_rejections():
    arr = np.zeros((8, 8, 3), np.uint8)
    blob = J.jpeg_encode_progressive(arr)
    # truncating mid-scan is a typed error
    with pytest.raises(ValueError):
        J.jpeg_decode(blob[: len(blob) * 2 // 3])
    # an AC scan over multiple components is illegal in progressive
    with pytest.raises(ValueError, match="single-component"):
        J.jpeg_encode_progressive(arr, script=(((0, 1), 1, 5, 0, 0),))


# ---------------------------------------------------------------------------
# Restart intervals (DRI + RSTn, T.81 E.1.4)
# ---------------------------------------------------------------------------


def test_restart_decode_equals_plain_decode():
    """Restart markers change the entropy FRAMING, not the
    coefficients: a stream with any DRI cadence must decode to pixels
    bit-identical to the plain encoding."""
    rng = np.random.default_rng(23)
    for _ in range(15):
        h = 8 * int(rng.integers(1, 6))
        w = 8 * int(rng.integers(1, 6))
        ri = int(rng.choice([1, 2, 3, 5, 7, 16]))
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        plain = J.jpeg_decode(J.jpeg_encode(arr))
        withr = J.jpeg_decode(J.jpeg_encode(arr, restart_interval=ri))
        assert np.array_equal(plain, withr), (h, w, ri)


def test_restart_markers_cycle_past_rst7():
    """A 20-MCU row at DRI=1 wraps the cyclic RST index (RST0..RST7
    then RST0 again) — 19 markers, all consumed in order."""
    rng = np.random.default_rng(29)
    big = rng.integers(0, 256, (8, 8 * 20, 3), np.uint8)
    blob = J.jpeg_encode(big, restart_interval=1)
    n_markers = sum(blob.count(bytes([0xFF, 0xD0 + i])) for i in range(8))
    assert n_markers == 19 and b"\xff\xd7" in blob
    assert np.array_equal(J.jpeg_decode(blob),
                          J.jpeg_decode(J.jpeg_encode(big)))


def test_restart_out_of_order_is_typed_error():
    """A wrong RSTn code at a boundary means lost sync — typed error,
    never a silent mis-decode."""
    rng = np.random.default_rng(31)
    big = rng.integers(0, 256, (8, 8 * 20, 3), np.uint8)
    blob = J.jpeg_encode(big, restart_interval=1)
    i = blob.index(b"\xff\xd1")
    bad = blob[:i] + b"\xff\xd5" + blob[i + 2 :]
    with pytest.raises(ValueError, match="restart marker"):
        J.jpeg_decode(bad)


def test_restart_in_progressive_is_rejected():
    arr = np.zeros((16, 16, 3), np.uint8)
    p = J.jpeg_encode_progressive(arr)
    with_dri = p[:2] + b"\xff\xdd\x00\x04\x00\x02" + p[2:]
    with pytest.raises(ValueError, match="progressive"):
        J.jpeg_decode(with_dri)


def test_fill_bytes_before_restart_markers_decode():
    """T.81 B.1.1.2: fill 0xFF bytes may precede ANY marker, including
    an in-scan RSTn.  Injecting a fill byte before every restart
    marker must not change the decode (the r12 advice case: the old
    _entropy_end treated FF FF Dn as the scan terminator and lost the
    rest of the scan)."""
    rng = np.random.default_rng(37)
    arr = rng.integers(0, 256, (16, 8 * 5, 3), np.uint8)
    blob = J.jpeg_encode(arr, restart_interval=2)
    filled = bytearray()
    i = 0
    sos = blob.index(b"\xff\xda")
    while i < len(blob):
        if (
            i > sos
            and blob[i] == 0xFF
            and i + 1 < len(blob)
            and 0xD0 <= blob[i + 1] <= 0xD7
        ):
            filled += b"\xff"  # fill byte before the RSTn
        filled.append(blob[i])
        i += 1
    assert len(filled) > len(blob)  # fill actually injected
    assert np.array_equal(J.jpeg_decode(bytes(filled)), J.jpeg_decode(blob))


def test_progressive_dc_scan_emits_ac_selector_zero():
    """T.81 Table B.3: Ta shall be 0 when Ss = Se = 0.  Walk every SOS
    of an emitted progressive stream and check the DC scans."""
    arr = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    blob = J.jpeg_encode_progressive(arr)
    found_dc = 0
    pos = 2
    import struct as _struct

    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        if marker == 0xDA:
            (seg_len,) = _struct.unpack_from(">H", blob, pos + 2)
            payload = blob[pos + 4 : pos + 2 + seg_len]
            ns = payload[0]
            ss = payload[1 + 2 * ns]
            if ss == 0:  # DC scan
                found_dc += 1
                for i in range(ns):
                    assert payload[2 + 2 * i] & 0x0F == 0, "Ta != 0 on DC scan"
            pos += 2 + seg_len
        elif marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
        else:
            (seg_len,) = _struct.unpack_from(">H", blob, pos + 2)
            pos += 2 + seg_len
    assert found_dc == 2  # DC first + DC refine scans both checked


# ---------------------------------------------------------------------------
# Chroma subsampling (4:2:2 / 4:2:0)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sampling,mw,mh", [("422", 16, 8), ("420", 16, 16)])
def test_subsampled_constant_mcu_tiles_decode_to_the_closed_form(
    sampling, mw, mh
):
    """A tile constant over a whole MCU survives chroma subsampling
    EXACTLY (the box mean of a constant box is the constant, and
    floor(x+0.5) is the identity on integers), so the decoded color is
    the SAME closed form as 4:4:4 — the law the subsampled-stats SQL
    oracle relies on."""
    colors = [(r, g, b)
              for r in range(0, 256, 34)
              for g in range(0, 256, 42)
              for b in range(0, 256, 46)]
    colors += [(238, 238, 238), (133, 133, 133), (0, 0, 0), (255, 255, 255)]
    cols = 8
    rows = (len(colors) + cols - 1) // cols
    img = np.zeros((rows * mh, cols * mw, 3), np.uint8)
    for idx, c in enumerate(colors):
        j, i = divmod(idx, cols)
        img[j * mh : (j + 1) * mh, i * mw : (i + 1) * mw] = c
    dec = J.jpeg_decode(J.jpeg_encode(img, sampling=sampling))
    for idx, c in enumerate(colors):
        j, i = divmod(idx, cols)
        tile = dec[j * mh : (j + 1) * mh, i * mw : (i + 1) * mw]
        assert (tile == tile[0, 0]).all(), c
        assert tuple(int(v) for v in tile[0, 0]) == _closed_form(c), c


@pytest.mark.parametrize("sampling", ["422", "420"])
def test_subsampled_cross_coding_bit_identity(sampling):
    """Baseline, baseline+restart, and progressive are three entropy
    codings of the SAME quantized subsampled coefficients — all three
    must decode bit-identically, on general (non-constant) content."""
    rng = _rng()
    img = rng.integers(0, 256, (32, 48, 3), np.uint8)
    base = J.jpeg_decode(J.jpeg_encode(img, sampling=sampling))
    rst = J.jpeg_decode(
        J.jpeg_encode(img, restart_interval=2, sampling=sampling)
    )
    prog = J.jpeg_decode(J.jpeg_encode_progressive(img, sampling=sampling))
    assert np.array_equal(base, rst)
    assert np.array_equal(base, prog)
    assert base.shape == img.shape and base.dtype == np.uint8


def test_subsampled_sof_declares_the_sampling_and_shrinks_the_stream():
    """The emitted SOF must carry luma 2x2 / chroma 1x1 for 420, and
    coding 3/8 as many chroma blocks must actually shrink the payload
    on chroma-detailed content."""
    rng = _rng()
    img = rng.integers(0, 256, (32, 32, 3), np.uint8)
    b444 = J.jpeg_encode(img)
    b420 = J.jpeg_encode(img, sampling="420")
    sof = b420.index(b"\xff\xc0")
    # SOF payload: len(2) prec(1) h(2) w(2) ncomp(1), then cid/samp/tq
    assert b420[sof + 11] == 0x22  # luma 2x2
    assert b420[sof + 14] == 0x11 and b420[sof + 17] == 0x11  # chroma 1x1
    assert len(b420) < len(b444)


def test_subsampled_dimension_and_ratio_rejections():
    # encode: dims must be MCU-aligned
    with pytest.raises(ValueError, match="multiples of the MCU"):
        J.jpeg_encode(np.zeros((8, 16, 3), np.uint8), sampling="420")
    with pytest.raises(ValueError, match="multiples of the MCU"):
        J.jpeg_encode(np.zeros((8, 8, 3), np.uint8), sampling="422")
    with pytest.raises(ValueError, match="unsupported JPEG sampling"):
        J.jpeg_encode(np.zeros((16, 16, 3), np.uint8), sampling="411")
    # decode: non-integer sampling ratio (3x1 luma, 2x1 chroma) is a
    # typed error, as is a partial-MCU foreign stream
    good = J.jpeg_encode(np.zeros((16, 48, 3), np.uint8), sampling="420")
    sof = good.index(b"\xff\xc0")
    bad = bytearray(good)
    bad[sof + 11] = 0x32  # luma 3x2: chroma ratio 3/1... 3%1==0; use 0x33
    bad[sof + 14] = 0x21  # chroma 2x1 -> hmax=3, 3 % 2 != 0
    with pytest.raises(ValueError, match="non-integer JPEG sampling"):
        J.jpeg_decode(bytes(bad))
    bad2 = bytearray(good)
    bad2[sof + 11] = 0x24  # luma 2x4 -> MCU 16x32, h=16 not aligned
    with pytest.raises(ValueError, match="multiples of the MCU"):
        J.jpeg_decode(bytes(bad2))
    bad3 = bytearray(good)
    bad3[sof + 11] = 0x52  # sampling factor 5 out of T.81 range
    with pytest.raises(ValueError, match="bad JPEG sampling factors"):
        J.jpeg_decode(bytes(bad3))

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
    with pytest.raises(ValueError, match="multiples of 8"):
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

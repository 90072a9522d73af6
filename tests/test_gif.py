"""GIF codec tests (operators/gif.py): LZW round-trips through the
dictionary-growth and 12-bit-reset paths, interlace inversion, a
byte-level hand-assembled fixture with hand-computed LZW codes (fully
independent of the module's encoder), and the Spark frame fan-out.
"""

from __future__ import annotations

import numpy as np
import pytest

from hypertension_dashboard_pipeline_spark.operators import gif as g


def _rng():
    return np.random.default_rng(20260817)


def test_multiframe_roundtrip_plain_and_interlaced():
    rng = _rng()
    pal = g._PALETTE
    for interlace in (False, True):
        frames = [rng.integers(0, 256, size=(9, 13), dtype=np.uint8)
                  for _ in range(4)]
        dec = g.gif_decode(g.gif_encode(frames, pal, interlace=interlace))
        assert len(dec) == 4
        for f, d in zip(frames, dec):
            assert (d == pal[f]).all()


def test_lzw_twelve_bit_growth_and_reset():
    """A 90x120 noise frame forces >4096 dictionary entries, so the
    encoder hits the 12-bit ceiling and emits a mid-stream clear; the
    decoder must follow both the width bumps and the reset."""
    rng = _rng()
    big = rng.integers(0, 256, size=(90, 120), dtype=np.uint8)
    dec = g.gif_decode(g.gif_encode([big], g._PALETTE))
    assert (dec[0] == g._PALETTE[big]).all()


def test_constant_frame_max_compression():
    const = np.full((20, 30), 7, dtype=np.uint8)
    dec = g.gif_decode(g.gif_encode([const], g._PALETTE))
    assert (dec[0] == g._PALETTE[const]).all()


def test_decode_hand_assembled_gif_with_local_palette():
    """Byte-level GIF built in the test with HAND-COMPUTED LZW codes
    (min code size 2; pixels [1, 1, 0] -> codes clear,1,1,0,end ->
    bytes 0x4C 0x50), a 2-entry local color table, no global table."""
    data = bytes(
        b"GIF89a"
        + b"\x03\x00\x01\x00"  # logical screen 3x1
        + b"\x00\x00\x00"      # no GCT
        + b"\x2c"              # image descriptor
        + b"\x00\x00\x00\x00\x03\x00\x01\x00"
        + b"\x80"              # local color table, 2 entries
        + bytes([10, 20, 30, 200, 100, 50])
        + b"\x02"              # LZW min code size
        + b"\x02\x4c\x50\x00"  # one 2-byte sub-block + terminator
        + b"\x3b"
    )
    frames = g.gif_decode(data)
    assert len(frames) == 1
    exp = np.array([[[200, 100, 50], [200, 100, 50], [10, 20, 30]]],
                   dtype=np.uint8)
    assert (frames[0] == exp).all()


def test_decode_survives_sub_block_resplitting():
    """Pixel data split across many tiny sub-blocks must decode the
    same — the sub-block framing is transport, not content."""
    rng = _rng()
    frame = rng.integers(0, 256, size=(6, 7), dtype=np.uint8)
    whole = g.gif_encode([frame], g._PALETTE)
    # locate the image data: descriptor starts after header+LSD+GCT
    off = 13 + 256 * 3
    # the encoder writes a graphic control extension before each frame
    assert whole[off] == 0x21
    # find 0x2C from off, then skip block byte + 9-byte descriptor + mcs
    i = whole.index(b"\x2c", off)
    data_start = i + 11
    # unpack existing sub-blocks
    payload = bytearray()
    p = data_start
    while whole[p] != 0:
        ln = whole[p]
        payload += whole[p + 1 : p + 1 + ln]
        p += 1 + ln
    tail = whole[p + 1 :]
    # re-pack as 3-byte sub-blocks
    repacked = bytearray()
    for j in range(0, len(payload), 3):
        chunk = payload[j : j + 3]
        repacked.append(len(chunk))
        repacked += chunk
    repacked.append(0)
    rebuilt = whole[:data_start] + bytes(repacked) + tail
    assert (g.gif_decode(rebuilt)[0] == g._PALETTE[frame]).all()


def test_decode_rejections():
    with pytest.raises(ValueError, match="signature"):
        g.gif_decode(b"JIF89a" + b"\x00" * 20)
    frame = np.zeros((3, 3), dtype=np.uint8)
    whole = g.gif_encode([frame], g._PALETTE)
    with pytest.raises(ValueError, match="no frames"):
        g.gif_decode(whole[: 13 + 768] + b"\x3b")


def test_lzw_corrupt_first_code_raises_valueerror():
    """A first-code-after-clear outside the table must raise the
    documented ValueError, not leak a bare KeyError (ADVICE r10)."""
    # min_code_size=2: clear=4, end=5, table holds 0..3; code 7 is out
    # of range as the FIRST code after the implicit clear state.
    # widths are 3 bits; pack code 7 then end(5): 7 | 5<<3 = 0x2f.
    with pytest.raises(ValueError, match="corrupt GIF LZW stream"):
        g._lzw_decode(bytes([0x2F]), 2)


def test_gif_frame_stats_fanout_partition_invariant(spark, sf_smoke):
    from hypertension_dashboard_pipeline_spark.io import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(50)
    corpus = g.synth_gif_corpus(docs)
    one = sorted(map(tuple, g.gif_frame_stats(corpus.coalesce(1)).collect()))
    many = sorted(map(tuple, g.gif_frame_stats(corpus.repartition(9)).collect()))
    assert one == many
    # fan-out matches the formula: n_frames = k % 5 + 2
    from collections import Counter

    per_doc = Counter(r[0] for r in one)
    from hypertension_dashboard_pipeline_spark.operators.media import _key

    for doc_id, n in per_doc.items():
        assert n == _key(doc_id) % 5 + 2


def test_gif_frame_stats_matches_direct_numpy(spark, sf_smoke):
    from hypertension_dashboard_pipeline_spark.io import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(30)
    rows = g.gif_frame_stats(g.synth_gif_corpus(docs)).collect()
    for r in rows:
        frames = g._synth_frames(r.doc_id)
        rgb = g._PALETTE[frames[r.frame_idx]].astype(np.int64)
        s = rgb.sum(axis=(0, 1))
        assert (r.sum_r, r.sum_g, r.sum_b) == (s[0], s[1], s[2])
        assert (r.width, r.height) == (frames[0].shape[1], frames[0].shape[0])


def test_gif_transparency_marks_exactly_the_declared_slot():
    """GCE transparent index: alpha 0 precisely where the frame's
    index equals the slot, opaque elsewhere; the flag governs one
    image then resets (GIF89a §23)."""
    from hypertension_dashboard_pipeline_spark.operators import gif as g

    idx = (np.arange(5 * 6, dtype=np.int64) % 7).astype(np.uint8).reshape(5, 6)
    frames = [idx, (idx + 1) % 7]
    for il in (False, True):
        blob = g.gif_encode(frames, g._PALETTE, interlace=il,
                            transparent_idx=3)
        out = g.gif_decode(blob)
        assert len(out) == 2
        for f, src in zip(out, frames):
            assert f.shape == (5, 6, 4)
            assert ((f[:, :, 3] == 0) == (src == 3)).all()
            assert (f[:, :, :3] == g._PALETTE[src]).all()
    # no transparent_idx -> plain RGB frames (shape unchanged)
    out = g.gif_decode(g.gif_encode(frames, g._PALETTE))
    assert all(f.shape == (5, 6, 3) for f in out)
    # hand-built stream: GCE on the FIRST image only — second frame
    # must decode opaque (the flag resets per image)
    blob = bytearray(g.gif_encode(frames, g._PALETTE, transparent_idx=3))
    # flip the second GCE's transparency flag off
    first = blob.index(b"\x21\xf9\x04\x01")
    second = blob.index(b"\x21\xf9\x04\x01", first + 1)
    blob[second + 3] = 0x00
    out = g.gif_decode(bytes(blob))
    assert out[0].shape[2] == 4 and out[1].shape[2] == 3
    # encoder rejects an out-of-range slot
    with pytest.raises(ValueError, match="transparent index"):
        g.gif_encode(frames, g._PALETTE, transparent_idx=256)

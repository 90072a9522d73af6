"""Perceptual-hash media dedup (operators/phash.py): hash-chain unit
tests, invariance properties, brute-force pair parity, cross-format
content identity, and partition invariance of the Spark operator."""

from __future__ import annotations

import numpy as np

from hypertension_dashboard_pipeline_spark.operators import phash as ph
from hypertension_dashboard_pipeline_spark.operators import media as m


def _rng():
    return np.random.default_rng(11)


# ---------------------------------------------------------------------------
# Hash-chain units
# ---------------------------------------------------------------------------


def test_bits_to_i64_packing_and_sign_bit():
    bits = np.zeros(64, dtype=bool)
    assert ph._bits_to_i64(bits) == 0
    bits[0] = True
    assert ph._bits_to_i64(bits) == 1
    bits[:] = True
    assert ph._bits_to_i64(bits) == -1  # two's complement all-ones
    bits[:] = False
    bits[63] = True
    assert ph._bits_to_i64(bits) == -(1 << 63)


def test_ahash_known_value():
    # 8x8 grayscale ramp as RGB (r=g=b): gray == pixel value exactly
    # (299+587+114 = 1000).  mean = floor(sum/64); bit i = v > mean.
    v = np.arange(64, dtype=np.uint8).reshape(8, 8)
    arr = np.stack([v, v, v], axis=-1)
    thr = int(v.sum()) // 64
    expected = ph._bits_to_i64((v > thr).reshape(-1))
    assert ph.ahash64(arr) == expected


def test_dhash_known_value():
    # 8x9 image resizes to itself (floor map is identity when dims
    # match); bit (gy*8+gx) = g[gy, gx+1] > g[gy, gx].
    v = _rng().integers(0, 256, size=(8, 9), dtype=np.uint8)
    arr = np.stack([v, v, v], axis=-1)
    expected = ph._bits_to_i64(
        (v[:, 1:].astype(int) > v[:, :-1].astype(int)).reshape(-1)
    )
    assert ph.dhash64(arr) == expected


def test_hashes_brightness_shift_invariant():
    """Adding a constant to all channels shifts the integer gray by
    exactly that constant (the BT.601 weights sum to 1000), so both
    the mean-threshold and adjacent-difference hashes are unchanged —
    the property that makes perceptual dedup catch re-encodes."""
    rng = _rng()
    base = rng.integers(0, 200, size=(10, 13, 3), dtype=np.uint8)
    shifted = (base.astype(np.int64) + 37).astype(np.uint8)  # no clamp hit
    assert ph.ahash64(base) == ph.ahash64(shifted)
    assert ph.dhash64(base) == ph.dhash64(shifted)
    # ...while the exact fingerprint distinguishes them
    assert ph.pixel_fingerprint(base) != ph.pixel_fingerprint(shifted)


def test_pixel_fingerprint_positional():
    a = np.zeros((2, 2, 3), dtype=np.uint8)
    b = np.zeros((2, 2, 3), dtype=np.uint8)
    a[0, 0, 0] = 5
    b[1, 1, 0] = 5  # same multiset of values, different positions
    assert ph.pixel_fingerprint(a) != ph.pixel_fingerprint(b)
    assert ph.pixel_fingerprint(a.copy()) == ph.pixel_fingerprint(a)


def test_cross_format_content_identity():
    """The same pixels encoded as PNG and as BMP decode to identical
    signatures — format-independent dedup."""
    px = ph._synth_neardup_pixels(42)
    png_sig = ph._decode_rgb(m.png_encode(px))
    bmp_sig = ph._decode_rgb(m.bmp_encode(px))
    assert (png_sig == bmp_sig).all()
    assert ph.pixel_fingerprint(png_sig) == ph.pixel_fingerprint(bmp_sig)
    assert ph.ahash64(png_sig) == ph.ahash64(bmp_sig)


def test_neardup_corpus_structure():
    """Same (kc, v) -> identical pixels; same kc, different v -> small
    dHash Hamming distance; the noise amplitude is tuned so variants
    stay near their family."""
    # doc ids 3 and 3+80 share kc=3 and v=((3+80)//20)%4 vs (3//20)%4
    a = ph._synth_neardup_pixels(3)       # kc=3, v=0
    b = ph._synth_neardup_pixels(3 + 160)  # kc=3, v=(163//20)%4=0
    assert (a == b).all()  # exact duplicate
    c = ph._synth_neardup_pixels(3 + 20)  # kc=3, v=1 — near duplicate
    assert not (a == c).all()
    d_ac = bin(
        (ph.dhash64(a) ^ ph.dhash64(c)) & ((1 << 64) - 1)
    ).count("1")
    assert d_ac <= 10  # near, not identical-or-far


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def test_signatures_match_direct_numpy(spark, sf_smoke):
    from hypertension_dashboard_pipeline_spark.io import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(40)
    rows = ph.image_content_signatures(
        ph.synth_neardup_image_corpus(docs)
    ).collect()
    assert len(rows) == 40
    for r in rows:
        px = ph._synth_neardup_pixels(r.doc_id)
        assert (r.width, r.height) == (px.shape[1], px.shape[0])
        assert r.fp == ph.pixel_fingerprint(px)
        assert r.ahash == ph.ahash64(px)
        assert r.dhash == ph.dhash64(px)


def test_hamming_pairs_equal_brute_force(spark, sf_smoke):
    """The chunk-pair blocked pair set must equal the plain all-pairs
    Hamming filter (lossless blocking), including identical-signature
    expansion."""
    from hypertension_dashboard_pipeline_spark.io import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(60)
    sigs = ph.image_content_signatures(
        ph.synth_neardup_image_corpus(docs)
    ).select("doc_id", "dhash").collect()
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in ph.hamming_doc_pairs(
            ph.image_content_signatures(
                ph.synth_neardup_image_corpus(docs)
            ),
            sig_col="dhash",
            max_hamming=6,
        ).collect()
    }
    want = set()
    for i, a in enumerate(sigs):
        for b in sigs[i + 1:]:
            hd = bin((a.dhash ^ b.dhash) & ((1 << 64) - 1)).count("1")
            if hd <= 6:
                lo, hi = sorted((a.doc_id, b.doc_id))
                want.add((lo, hi, hd))
    assert got == want


def test_hamming_calibration_equals_brute_force(spark, sf_smoke):
    """Every row of the threshold sweep must equal a plain Python
    all-pairs computation over the collected signatures: counts, truth
    total, and the 6dp-floored precision/recall."""
    import math

    from hypertension_dashboard_pipeline_spark.io import load_table

    km = 2147483648
    docs = load_table(spark, sf_smoke, "documents").limit(80)
    sigs = ph.image_content_signatures(ph.synth_neardup_image_corpus(docs))
    rows = sigs.select("doc_id", "dhash").collect()
    fam = {r.doc_id: (r.doc_id % km) % 20 for r in rows}
    pair_h, pair_same = [], []
    for i, a in enumerate(rows):
        for b in rows[i + 1:]:
            pair_h.append(bin((a.dhash ^ b.dhash) & ((1 << 64) - 1))
                          .count("1"))
            pair_same.append(fam[a.doc_id] == fam[b.doc_id])
    n_truth = sum(pair_same)

    from pyspark.sql import functions as F

    fam_df = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        (((F.col("doc_id") % km) + km) % km % 20).alias("family"),
    )
    got = {r.max_hamming: r for r in ph.hamming_calibration(
        sigs, fam_df, thresholds=(0, 1, 2, 3, 4, 5, 6)
    ).collect()}
    assert sorted(got) == [0, 1, 2, 3, 4, 5, 6]
    for t, r in got.items():
        n_pairs = sum(1 for h in pair_h if h <= t)
        n_hit = sum(1 for h, s in zip(pair_h, pair_same) if h <= t and s)
        assert (r.n_pairs, r.n_hit, r.n_truth) == (n_pairs, n_hit, n_truth)
        exp_p = (math.floor(n_hit / n_pairs * 1e6 + 0.5) / 1e6
                 if n_pairs else None)
        exp_r = (math.floor(n_hit / n_truth * 1e6 + 0.5) / 1e6
                 if n_truth else None)
        assert r.precision == exp_p and r.recall == exp_r


def test_hamming_calibration_threshold_bound():
    import pytest

    with pytest.raises(ValueError, match="lossless"):
        ph.hamming_calibration(None, None, thresholds=(0, 7))
    with pytest.raises(ValueError):
        ph.hamming_calibration(None, None, thresholds=(-1, 2))


def test_phash_groups_consistent_with_pairs(spark, sf_smoke):
    """Every emitted near-dup pair must share a group label, and group
    labels are the min doc id of their member set (transitive closure
    can merge pair-connected families, never split them)."""
    from hypertension_dashboard_pipeline_spark.io import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(80)
    corpus = ph.synth_neardup_image_corpus(docs)
    sigs = ph.image_content_signatures(corpus)
    groups = {
        r.doc_id: r.group_id
        for r in ph.phash_dedup_groups(sigs, sig_col="dhash").collect()
    }
    sigs2 = ph.image_content_signatures(ph.synth_neardup_image_corpus(docs))
    pairs = ph.hamming_doc_pairs(sigs2, sig_col="dhash").collect()
    assert len(groups) == 80  # every document is labeled
    for p in pairs:
        assert groups[p.id_a] == groups[p.id_b]
    by_group: dict[int, list[int]] = {}
    for doc, g in groups.items():
        by_group.setdefault(g, []).append(doc)
    for g, members in by_group.items():
        assert g == min(members)


def test_dedup_survivors_one_per_group_and_minimal(spark, sf_smoke):
    from hypertension_dashboard_pipeline_spark.io import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(100)
    sigs = ph.image_content_signatures(ph.synth_neardup_image_corpus(docs))
    all_rows = sigs.collect()
    sigs2 = ph.image_content_signatures(ph.synth_neardup_image_corpus(docs))
    surv = ph.image_dedup_survivors(sigs2).collect()
    groups: dict[tuple, list[int]] = {}
    for r in all_rows:
        groups.setdefault((r.width, r.height, r.fp), []).append(r.doc_id)
    assert len(surv) == len(groups)  # exactly one survivor per group
    for s in surv:
        assert s.doc_id == min(groups[(s.width, s.height, s.fp)])


def test_dup_groups_partition_invariant(spark, sf_smoke):
    from hypertension_dashboard_pipeline_spark.io import load_table

    docs = load_table(spark, sf_smoke, "documents")
    corpus = ph.synth_neardup_image_corpus(docs)

    def run(df):
        return sorted(
            tuple(r) for r in ph.signature_dup_groups(
                ph.image_content_signatures(df), ["width", "height", "fp"]
            ).collect()
        )

    assert run(corpus.coalesce(1)) == run(corpus.repartition(7))


def test_empty_corpus_contracts(spark):
    empty = spark.createDataFrame([], "doc_id long")
    corpus = ph.synth_neardup_image_corpus(empty)
    sigs = ph.image_content_signatures(corpus)
    assert sigs.count() == 0
    assert ph.signature_dup_groups(sigs, ["ahash"]).count() == 0
    assert ph.hamming_doc_pairs(sigs).count() == 0
    fam_empty = spark.createDataFrame([], "doc_id long, family long")
    cal = ph.hamming_calibration(sigs, fam_empty,
                                 thresholds=(0, 3, 6)).collect()
    assert sorted(r.max_hamming for r in cal) == [0, 3, 6]
    assert all((r.n_pairs, r.n_hit, r.n_truth) == (0, 0, 0) for r in cal)
    assert all(r.precision is None and r.recall is None for r in cal)
    asigs = ph.audio_content_signatures(ph.synth_dup_audio_corpus(empty))
    assert asigs.count() == 0
    fsigs = ph.gif_frame_signatures(ph.synth_framedup_gif_corpus(empty))
    assert ph.frame_dup_groups(fsigs).count() == 0


# ---------------------------------------------------------------------------
# Audio / GIF-frame dedup
# ---------------------------------------------------------------------------


def test_audio_signatures_match_direct_numpy(spark, sf_smoke):
    from hypertension_dashboard_pipeline_spark.io import load_table
    from hypertension_dashboard_pipeline_spark.operators.media import _key

    docs = load_table(spark, sf_smoke, "documents").limit(40)
    rows = ph.audio_content_signatures(
        ph.synth_dup_audio_corpus(docs)
    ).collect()
    assert len(rows) == 40
    for r in rows:
        kc = _key(r.doc_id) % ph.AUD_KC_MOD
        samples = ph._synth_dup_samples(kc)
        assert r.sample_rate == 8000 + kc % 3 * 4000
        assert r.n_samples == len(samples)
        assert r.fp == ph.sample_fingerprint(samples)


def test_audio_dup_groups_find_content_collisions(spark, sf_smoke):
    """Documents sharing k % 30 carry byte-identical WAVs and must land
    in one group."""
    from hypertension_dashboard_pipeline_spark.io import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(120)
    sigs = ph.audio_content_signatures(ph.synth_dup_audio_corpus(docs))
    groups = ph.signature_dup_groups(
        sigs, ["sample_rate", "n_samples", "fp"]
    ).collect()
    assert groups  # 120 docs over 30 content keys -> real groups
    assert sum(g.n_docs for g in groups) <= 120
    assert all(g.n_docs >= 2 for g in groups)


def test_gif_frame_fingerprint_reads_palette_index(spark, sf_smoke):
    """The decoded R channel IS the palette index (entry i -> red i),
    so the Spark-side fingerprint equals the formula fingerprint."""
    from hypertension_dashboard_pipeline_spark.io import load_table
    from hypertension_dashboard_pipeline_spark.operators.media import _key

    docs = load_table(spark, sf_smoke, "documents").limit(25)
    rows = ph.gif_frame_signatures(
        ph.synth_framedup_gif_corpus(docs)
    ).collect()
    for r in rows:
        kc = _key(r.doc_id) % ph.GFD_KC_MOD
        fc = (kc + r.frame_idx * 3) % ph.GFD_FC_MOD
        idx = ph._synth_dup_frame(fc).astype(np.int64)
        weights = np.arange(idx.size, dtype=np.int64).reshape(idx.shape) + 1
        assert r.fp == int((idx * weights).sum())


def test_frame_dup_groups_span_documents_and_positions(spark, sf_smoke):
    from hypertension_dashboard_pipeline_spark.io import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(60)
    groups = ph.frame_dup_groups(
        ph.gif_frame_signatures(ph.synth_framedup_gif_corpus(docs))
    ).collect()
    assert groups
    # frames recur ACROSS documents: some group spans >= 2 distinct docs
    assert any(g.n_docs >= 2 for g in groups)
    # only 10 possible frame contents exist
    assert len({g.fp for g in groups}) <= ph.GFD_FC_MOD


# ---------------------------------------------------------------------------
# Calibration -> selection (calibration_operating_point)
# ---------------------------------------------------------------------------


def _curve_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "hash_kind string, max_hamming int, n_pairs long, n_hit long, "
        "n_truth long",
    )


def test_operating_point_argmax_f1_with_tight_tiebreak(spark):
    """F1 = 2*n_hit/(n_pairs+n_truth) exactly; equal F1 picks the
    SMALLER max_hamming (higher-precision operating point)."""
    rows = [
        # kind A: t=2 strictly best (f1 = 2*8/(10+10) = 0.8)
        ("a", 0, 4, 4, 10), ("a", 1, 6, 6, 10), ("a", 2, 10, 8, 10),
        ("a", 3, 40, 9, 10),
        # kind B: t=1 and t=3 tie at f1 — tie-break to t=1
        ("b", 1, 10, 8, 10), ("b", 3, 10, 8, 10), ("b", 5, 100, 10, 10),
    ]
    got = {
        r.hash_kind: r
        for r in ph.calibration_operating_point(
            _curve_df(spark, rows), key_cols=("hash_kind",)
        ).collect()
    }
    assert got["a"].max_hamming == 2 and got["a"].f1 == 0.8
    # b: t=5 has f1 = 20/110 ≈ 0.1818; t=1/t=3 have 16/20 = 0.8
    assert got["b"].max_hamming == 1


def test_operating_point_precision_floor_mode(spark):
    """max-recall-at-precision-floor: thresholds below the floor are
    excluded (exact integer-ppm comparison), then highest n_hit wins,
    tie-break to the smaller threshold."""
    rows = [
        ("a", 0, 10, 9, 20),   # precision .9
        ("a", 1, 20, 16, 20),  # precision .8  <- floor cut
        ("a", 2, 40, 18, 20),  # precision .45
    ]
    got = ph.calibration_operating_point(
        _curve_df(spark, rows), key_cols=("hash_kind",),
        precision_floor=0.85,
    ).collect()
    assert len(got) == 1 and got[0].max_hamming == 0 and got[0].n_hit == 9
    # floor exactly met (>= is inclusive): 16/20 = 0.8 passes floor 0.8
    got2 = ph.calibration_operating_point(
        _curve_df(spark, rows), key_cols=("hash_kind",),
        precision_floor=0.8,
    ).collect()
    assert got2[0].max_hamming == 1  # recall 16 beats 9
    import pytest as _pytest

    with _pytest.raises(ValueError, match="precision_floor"):
        ph.calibration_operating_point(
            _curve_df(spark, rows), precision_floor=1.5
        )


def test_operating_point_zero_denominator_f1_is_null_and_loses(spark):
    rows = [("a", 0, 0, 0, 0), ("a", 1, 10, 5, 10)]
    got = ph.calibration_operating_point(
        _curve_df(spark, rows), key_cols=("hash_kind",)
    ).collect()
    assert len(got) == 1 and got[0].max_hamming == 1

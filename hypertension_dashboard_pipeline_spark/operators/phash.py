"""Perceptual image hashing + corpus-level media dedup.

Extends the real-decode media surface (``operators/media.py``) with the
operations a LAION-style image-dedup pipeline runs over decoded pixels:

* **aHash** (average hash): grayscale -> 8x8 nearest-neighbor grid ->
  threshold each cell against the integer mean -> 64-bit signature.
* **dHash** (difference hash): grayscale -> 9x8 grid -> each bit
  compares horizontally adjacent cells -> 64-bit signature.
* **exact pixel dedup**: a positionally-weighted integer fingerprint of
  the full decoded RGB lattice, grouped — format-independent content
  identity (a PNG and a BMP with identical pixels land in one group).

Every stage is pure integer arithmetic (integer grayscale weights,
floor-map resize, integer-mean threshold), so an independent engine can
recompute the hashes in closed form from the generation formulas
without decoding a byte — the same oracle design as the rest of the
media surface (``queries_media.py`` module docstring).

Near-dup pair generation reuses the LOSSLESS chunk-pair Hamming
blocking already proven on SimHash (``operators/dedup.py:
near_signature_pairs`` — max_hamming 6 over 8 chunks pigeonholes every
qualifying pair onto an equal 16-bit chunk-pair key), so the 100 TB
posture is inherited: candidates are generated per bucket, the
self-join runs on DISTINCT signatures, and signature multiplicity never
inflates the shuffle.

Beyond-reference surface (the reference pipeline has no media path).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import round_fixed
from .dedup import (
    _maybe_persist,
    connected_components,
    near_signature_pairs,
    release_persisted,
)
from .media import (
    PNG_SIG,
    _key,
    _scatter_ids,
    bmp_decode,
    bmp_encode,
    nn_resize,
    png_decode,
    png_encode,
    wav_decode,
    wav_encode,
)

# ---------------------------------------------------------------------------
# Synthetic near-duplicate corpus
# ---------------------------------------------------------------------------

# Generation formulas (encode side only — the SQL oracles recompute the
# closed forms; keep in sync with queries_media.py).  k is the
# pmod-normalized doc key; kc is the CONTENT family (docs sharing kc
# render the same base image, across formats), v a small variant whose
# noise perturbs ~20% of pixels — so the corpus contains exact
# duplicates (same kc, same v), near duplicates (same kc, different v),
# and unrelated images (different kc).
PH_KC_MOD = 20  # kc = k % 20
PH_V_DIV, PH_V_MOD = 20, 4  # v = (k // 20) % 4
PH_W_MOD, PH_W_MIN = 5, 12  # w = kc % 5 + 12  (12..16)
PH_H_MOD, PH_H_MIN = 3, 10  # h = kc % 3 + 10  (10..12)
# noise amplitude per variant step: the BT.601 integer weights sum to
# exactly 1000, so adding nz to all three channels shifts the gray
# value by ~nz — v*2 keeps variants within a few Hamming bits of their
# family (near-dups), while the exact fingerprint still separates them.
PH_NOISE = 2


def _synth_neardup_pixels(doc_id: int) -> np.ndarray:
    k = _key(doc_id)
    kc = k % PH_KC_MOD
    v = (k // PH_V_DIV) % PH_V_MOD
    w = kc % PH_W_MOD + PH_W_MIN
    h = kc % PH_H_MOD + PH_H_MIN
    y, x = np.mgrid[0:h, 0:w]
    x = x.astype(np.int64)
    y = y.astype(np.int64)
    noise = np.where((x * 2 + y) % 5 == 0, v * PH_NOISE, 0)
    return np.stack(
        [
            (x * 7 + y * 11 + kc * 29 + noise) % 256,
            (x * 3 + y * 13 + kc * 17 + noise) % 256,
            (x * 5 + y * 7 + kc * 23 + noise) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)


def synth_neardup_image_corpus(docs: DataFrame,
                               id_col: str = "doc_id") -> DataFrame:
    """One real encoded image per document (PNG for even keys, BMP for
    odd) with deliberate content collisions across documents AND
    formats.  Schema: (doc_id long, payload binary)."""
    src = _scatter_ids(docs, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["doc_id"].astype("int64")
            payloads = [
                (png_encode if _key(int(d)) % 2 == 0 else bmp_encode)(
                    _synth_neardup_pixels(int(d))
                )
                for d in ids
            ]
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return src.mapInPandas(run, schema="doc_id long, payload binary")


# ---------------------------------------------------------------------------
# Perceptual hashes (pure integer chain — closed-form verifiable)
# ---------------------------------------------------------------------------

# Integer grayscale (ITU BT.601 weights scaled by 1000, floor division):
# deterministic and exactly reproducible in SQL, unlike float luma.
GRAY_R, GRAY_G, GRAY_B, GRAY_DIV = 299, 587, 114, 1000


def _gray_grid(arr: np.ndarray) -> np.ndarray:
    rgb = arr[:, :, :3].astype(np.int64)
    return (
        rgb[:, :, 0] * GRAY_R + rgb[:, :, 1] * GRAY_G + rgb[:, :, 2] * GRAY_B
    ) // GRAY_DIV


def _bits_to_i64(bits: np.ndarray) -> int:
    """Pack a flat boolean array (LSB first) into a SIGNED 64-bit int
    (bit 63 is the sign bit — two's complement wrap, matching both
    Spark longs and DuckDB BIGINTs)."""
    h = 0
    for i, b in enumerate(bits.reshape(-1)):
        if b:
            h |= 1 << i
    return h - (1 << 64) if h >= (1 << 63) else h


def ahash64(arr: np.ndarray) -> int:
    """Average hash: 8x8 grayscale grid, bit i set iff cell i exceeds
    the integer mean (floor(sum/64)).  Bit index = gy*8 + gx."""
    g = nn_resize(_gray_grid(arr), 8, 8)
    thr = int(g.sum()) // 64
    return _bits_to_i64(g > thr)


def dhash64(arr: np.ndarray) -> int:
    """Difference hash: 9x8 grayscale grid, bit (gy*8 + gx) set iff
    cell (gy, gx+1) exceeds cell (gy, gx) — brightness-shift invariant
    by construction."""
    g = nn_resize(_gray_grid(arr), 9, 8)
    return _bits_to_i64(g[:, 1:] > g[:, :-1])


def pixel_fingerprint(arr: np.ndarray) -> int:
    """Positionally-weighted exact content fingerprint of the decoded
    RGB lattice: sum over pixels of r*(3*idx+1) + g*(3*idx+2) +
    b*(3*idx+3) with idx = y*w + x.  Identical pixels <=> identical
    fingerprint on this corpus (weights make transpositions distinct);
    bounded by 84M for the corpus sizes, exact int64."""
    rgb = arr[:, :, :3].astype(np.int64)
    h, w = rgb.shape[0], rgb.shape[1]
    idx = (np.arange(h * w, dtype=np.int64).reshape(h, w)) * 3
    return int(
        (rgb[:, :, 0] * (idx + 1)).sum()
        + (rgb[:, :, 1] * (idx + 2)).sum()
        + (rgb[:, :, 2] * (idx + 3)).sum()
    )


def _decode_rgb(data: bytes) -> np.ndarray:
    if data[:8] == PNG_SIG:
        arr = png_decode(data)
    elif data[:2] == b"BM":
        arr = bmp_decode(data)
    else:
        raise ValueError("unknown image format")
    if arr.shape[2] == 1:
        arr = np.repeat(arr, 3, axis=2)
    return arr


PHASH_SCHEMA = (
    "doc_id long, width int, height int, fp long, ahash long, dhash long, "
    "sum_rgb long"
)


def image_content_signatures(df: DataFrame, id_col: str = "doc_id",
                             payload_col: str = "payload") -> DataFrame:
    """Decode every payload and emit the full content-identity row:
    dimensions, exact pixel fingerprint, aHash, dHash, and the total
    channel sum (the integer brightness statistic downstream quality
    bands filter on).  One decode feeds every signature; no shuffle
    (mapInPandas, partitioning preserved)."""
    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                try:
                    arr = _decode_rgb(bytes(payload))
                except ValueError as exc:
                    raise ValueError(f"doc {doc_id}: {exc}") from None
                rows.append(
                    (int(doc_id), arr.shape[1], arr.shape[0],
                     pixel_fingerprint(arr), ahash64(arr), dhash64(arr),
                     int(arr[:, :, :3].astype(np.int64).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "fp", "ahash",
                         "dhash", "sum_rgb"],
            )

    return src.mapInPandas(run, schema=PHASH_SCHEMA)


# ---------------------------------------------------------------------------
# Corpus-level dedup over the signatures
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Audio exact-dup (decoded PCM fingerprint)
# ---------------------------------------------------------------------------

# dup-audio corpus formulas: content key kc collides across documents,
# so the corpus contains real duplicate recordings.
AUD_KC_MOD = 30  # kc = k % 30
AUD_N_MOD, AUD_N_MIN = 50, 20  # n = kc % 50 + 20 (20..69)


def _synth_dup_samples(kc: int) -> np.ndarray:
    n = kc % AUD_N_MOD + AUD_N_MIN
    i = np.arange(n, dtype=np.int64)
    return ((i * i * 37 + i * 1009 + kc * 31) % 65536 - 32768).astype(np.int16)


def synth_dup_audio_corpus(docs: DataFrame,
                           id_col: str = "doc_id") -> DataFrame:
    """One real PCM WAV per document, with deliberate content
    collisions: documents sharing ``k % 30`` carry byte-identical
    recordings.  Schema: (doc_id long, payload binary)."""
    src = _scatter_ids(docs, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                kc = _key(int(d)) % AUD_KC_MOD
                payloads.append(
                    wav_encode(8000 + kc % 3 * 4000, _synth_dup_samples(kc))
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return src.mapInPandas(run, schema="doc_id long, payload binary")


def sample_fingerprint(samples: np.ndarray) -> int:
    """Positionally-weighted exact fingerprint of a PCM sample array:
    sum of s_i * (i + 1) — order-sensitive, exact int64 (|s| < 2^15,
    weights bounded by corpus length)."""
    s = np.asarray(samples, dtype=np.int64).reshape(-1)
    return int((s * (np.arange(len(s), dtype=np.int64) + 1)).sum())


AUDIO_SIG_SCHEMA = "doc_id long, sample_rate int, n_samples long, fp long"


def audio_content_signatures(df: DataFrame, id_col: str = "doc_id",
                             payload_col: str = "payload") -> DataFrame:
    """Decode every WAV (real RIFF parse) and emit the content-identity
    row: sample rate, length, exact sample fingerprint."""
    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                rate, samples = wav_decode(bytes(payload))
                rows.append(
                    (int(doc_id), rate, len(samples),
                     sample_fingerprint(samples))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "sample_rate", "n_samples", "fp"]
            )

    return src.mapInPandas(run, schema=AUDIO_SIG_SCHEMA)


# ---------------------------------------------------------------------------
# GIF frame-level dedup (the video-frame-dedup read: shared frames
# across different animations)
# ---------------------------------------------------------------------------

# frame-dup corpus formulas: all frames are 6x5 on the shared palette;
# the frame CONTENT key fc = (kc + f*3) % 10 deliberately collides
# across documents and frame positions.
GFD_KC_MOD = 12  # kc = k % 12
GFD_NF_MOD, GFD_NF_MIN = 4, 3  # n_frames = kc % 4 + 3 (3..6)
GFD_W, GFD_H = 6, 5
GFD_FC_MOD = 10  # fc = (kc + f*3) % 10


def _synth_dup_frame(fc: int) -> np.ndarray:
    y, x = np.mgrid[0:GFD_H, 0:GFD_W]
    return ((x * 5 + y * 9 + fc * 21) % 256).astype(np.uint8)


def synth_framedup_gif_corpus(docs: DataFrame,
                              id_col: str = "doc_id") -> DataFrame:
    """One real animated GIF per document whose frames recur across
    documents AND positions (frame content key (kc + f*3) % 10).
    Schema: (doc_id long, payload binary)."""
    from .gif import _PALETTE, gif_encode

    src = _scatter_ids(docs, id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids = batch["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                kc = _key(int(d)) % GFD_KC_MOD
                nf = kc % GFD_NF_MOD + GFD_NF_MIN
                frames = [
                    _synth_dup_frame((kc + f * 3) % GFD_FC_MOD)
                    for f in range(nf)
                ]
                payloads.append(gif_encode(frames, _PALETTE))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return src.mapInPandas(run, schema="doc_id long, payload binary")


FRAME_SIG_SCHEMA = "doc_id long, frame_idx int, fp long"


def gif_frame_signatures(df: DataFrame, id_col: str = "doc_id",
                         payload_col: str = "payload") -> DataFrame:
    """REAL frame extraction + per-frame content fingerprint: every GIF
    frame is LZW-decoded and palette-mapped; the fingerprint is the
    positionally-weighted sum of the palette INDEX grid (the decoded R
    channel — the shared palette maps entry i to red value i, so the
    index survives decoding exactly).  1->N fan-out, no shuffle."""
    from .gif import gif_decode

    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                for f_idx, frame in enumerate(gif_decode(bytes(payload))):
                    idx = frame[:, :, 0].astype(np.int64)  # palette index
                    h, w = idx.shape
                    weights = (
                        np.arange(h * w, dtype=np.int64).reshape(h, w) + 1
                    )
                    rows.append(
                        (int(doc_id), f_idx, int((idx * weights).sum()))
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "fp"])

    return src.mapInPandas(run, schema=FRAME_SIG_SCHEMA)


def frame_dup_groups(frame_sigs: DataFrame) -> DataFrame:
    """Group identical frames across the corpus (video-frame dedup):
    one shuffle on the fingerprint, map-side-combinable aggregates."""
    return (
        frame_sigs.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_frames") >= 2)
    )


def signature_dup_groups(sigs: DataFrame, key_cols: list[str]) -> DataFrame:
    """Group documents by a content-signature key and keep groups of
    two or more — the exact-dup read.  One shuffle on the key; the
    aggregate is map-side combinable."""
    return (
        sigs.groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def image_dedup_survivors(sigs: DataFrame, persist: bool = True,
                          release: bool = True) -> DataFrame:
    """Keep ONE document per exact pixel-identity group — the survivor
    is the min doc id (deterministic).  The signature relation feeds
    both the group-min aggregate and the re-join, so it is persisted
    under the dedup-module contract.  Semi-join shape: the aggregate
    emits (key, min_doc) and the join back recovers the survivor's full
    signature row without a window over the corpus."""
    if release:
        release_persisted()
    base = _maybe_persist(sigs, persist)
    mins = base.groupBy("width", "height", "fp").agg(
        F.min("doc_id").alias("doc_id")
    )
    return base.join(mins, ["width", "height", "fp", "doc_id"])


def hamming_doc_pairs(sigs: DataFrame, sig_col: str = "dhash",
                      max_hamming: int = 6, persist: bool = True,
                      release: bool = True) -> DataFrame:
    """(id_a, id_b, hamming) document pairs within Hamming
    ``max_hamming`` of each other's 64-bit signature.

    Same two-phase shape as ``operators/dedup.py:simhash_pairs``:
    cross-signature candidates come from the lossless chunk-pair
    blocking over DISTINCT signature values (template families cost one
    candidate row, not n²), and identical-signature pairs are expanded
    by a separate equality self-join (that expansion IS the output).
    The signature subplan feeds FIVE join branches (distinct set, two
    cross expansions, two same-sig sides); without the persist each
    branch would re-run the whole decode+hash chain — the dedup-module
    persist/release contract applies (16 bytes/row of state)."""
    if release:
        release_persisted()
    base = _maybe_persist(
        sigs.select("doc_id", F.col(sig_col).alias("simhash")), persist
    )
    near = near_signature_pairs(
        base.select("simhash").distinct(), max_hamming=max_hamming
    )
    cross = (
        near.join(
            base.select(F.col("simhash").alias("sa"),
                        F.col("doc_id").alias("ia")),
            "sa",
        )
        .join(
            base.select(F.col("simhash").alias("sb"),
                        F.col("doc_id").alias("ib")),
            "sb",
        )
        .select(
            F.least("ia", "ib").alias("id_a"),
            F.greatest("ia", "ib").alias("id_b"),
            "hamming",
        )
    )
    same = (
        base.alias("a")
        .join(base.alias("b"), "simhash")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.lit(0).alias("hamming"),
        )
    )
    return cross.unionByName(same)


def hamming_calibration(sigs: DataFrame, families: DataFrame,
                        thresholds: tuple[int, ...] = (0, 1, 2, 3, 4, 5, 6),
                        sig_col: str = "dhash", persist: bool = True,
                        release: bool = True) -> DataFrame:
    """Precision/recall sweep of perceptual-hash Hamming thresholds
    against a ground-truth family labeling — the measurement that
    tells a pipeline owner WHICH max_hamming to trust before running
    :func:`phash_dedup_groups` at 100 TB (the dedup counterpart of
    ``operators/dedup.py`` minhash_calibration / lsh_recall).

    ``families`` is (doc_id, family); truth pairs are same-family doc
    pairs.  One row per threshold t: candidate pairs at hamming<=t,
    same-family hits among them, the corpus truth-pair total, and the
    when-guarded precision/recall ratios (6dp fixed rounding).

    Scale shape: candidates are generated ONCE at max(thresholds) via
    the lossless chunk-pair blocking (hence the <=6 bound — beyond it
    the 8-chunk pigeonhole no longer guarantees recall 1 and the
    sweep would silently under-count), folded to a <=7-row
    per-hamming histogram in ONE corpus-sized aggregation; the
    threshold sweep is an inequality join against that bounded
    histogram.  Truth is two map-side-combinable aggregates over the
    family relation — never a pair expansion."""
    ts = sorted({int(t) for t in thresholds})
    if not ts or ts[0] < 0:
        raise ValueError("thresholds must be non-negative")
    if ts[-1] > 6:
        raise ValueError(
            "max threshold above 6 breaks the lossless chunk-pair "
            "blocking guarantee (8 chunks, pair keys: >=2 clean chunks "
            "only when hamming <= 6)"
        )
    pairs = hamming_doc_pairs(
        sigs, sig_col=sig_col, max_hamming=ts[-1],
        persist=persist, release=release,
    )
    fa = families.select(F.col("doc_id").alias("id_a"),
                         F.col("family").alias("fam_a"))
    fb = families.select(F.col("doc_id").alias("id_b"),
                         F.col("family").alias("fam_b"))
    hist = (
        pairs.join(fa, "id_a")
        .join(fb, "id_b")
        .groupBy("hamming")
        .agg(
            F.count(F.lit(1)).alias("nph"),
            F.sum((F.col("fam_a") == F.col("fam_b")).cast("long"))
            .alias("nhh"),
        )
    )
    truth = (
        families.groupBy("family")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.coalesce(
                F.sum(F.expr("n * (n - 1) DIV 2")), F.lit(0)
            ).cast("long").alias("n_truth")
        )
    )
    th = sigs.sparkSession.createDataFrame(
        [(t,) for t in ts], "max_hamming int"
    )
    per = (
        th.join(
            F.broadcast(hist),  # bounded: <= max_hamming+1 rows
            F.col("hamming") <= F.col("max_hamming"),
            "left",
        )
        .groupBy("max_hamming")
        .agg(
            F.coalesce(F.sum("nph"), F.lit(0)).cast("long")
            .alias("n_pairs"),
            F.coalesce(F.sum("nhh"), F.lit(0)).cast("long")
            .alias("n_hit"),
        )
    )
    return per.crossJoin(F.broadcast(truth)).select(
        "max_hamming",
        "n_pairs",
        "n_hit",
        "n_truth",
        F.when(
            F.col("n_pairs") > 0,
            round_fixed(
                F.col("n_hit").cast("double") / F.col("n_pairs"), 6
            ),
        ).alias("precision"),
        F.when(
            F.col("n_truth") > 0,
            round_fixed(
                F.col("n_hit").cast("double") / F.col("n_truth"), 6
            ),
        ).alias("recall"),
    )


def calibration_operating_point(curve: DataFrame,
                                key_cols: tuple[str, ...] = (),
                                precision_floor: float | None = None,
                                ) -> DataFrame:
    """Turn a :func:`hamming_calibration` curve into the operating
    threshold :func:`phash_dedup_groups` consumes — one row per
    ``key_cols`` group (e.g. per hash kind when two curves are stacked
    side by side).

    Default policy is **argmax-F1** with the tightest-threshold
    tie-break (equal F1 -> smaller ``max_hamming``, i.e. the
    higher-precision operating point).  F1 is computed EXACTLY from
    the integer curve columns — ``2*n_hit / (n_pairs + n_truth)`` is
    the harmonic mean of precision and recall without touching their
    rounded presentations — then 6dp-fixed for output.  With
    ``precision_floor`` the policy becomes max-recall-at-precision-
    floor: among thresholds whose precision meets the floor (exact
    integer-ppm comparison, no float equality), pick the highest
    ``n_hit`` (recall shares the constant ``n_truth`` denominator),
    same tie-break.

    Scale shape: a calibration curve is BOUNDED (one row per swept
    threshold per key — <= 7 per hash kind here), so the row_number
    window over it is a constant-size operation regardless of corpus
    size; all corpus-sized work already happened inside the
    calibration sweep."""
    from pyspark.sql.window import Window

    denom = F.col("n_pairs") + F.col("n_truth")
    scored = curve.withColumn(
        "f1",
        F.when(
            denom > 0,
            round_fixed(
                F.lit(2.0) * F.col("n_hit").cast("double")
                / denom.cast("double"),
                6,
            ),
        ),
    )
    if precision_floor is not None:
        if not 0.0 <= precision_floor <= 1.0:
            raise ValueError("precision_floor must be within [0, 1]")
        ppm = int(round(precision_floor * 1_000_000))
        scored = scored.where(
            (F.col("n_pairs") > 0)
            & (F.col("n_hit") * 1_000_000 >= F.lit(ppm) * F.col("n_pairs"))
        )
        order = [F.col("n_hit").desc(), F.col("max_hamming").asc()]
    else:
        order = [F.col("f1").desc_nulls_last(), F.col("max_hamming").asc()]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def phash_dedup_groups(sigs: DataFrame, sig_col: str = "dhash",
                       max_hamming: int = 6, max_iterations: int = 20,
                       persist: bool = True,
                       release: bool = True) -> DataFrame:
    """(doc_id, group_id) for EVERY document, where group_id is the min
    doc id over the transitive closure of signature-level near-dup
    edges — the scale-safe survivor labeling (n output rows, never the
    O(family²) pair expansion).

    Mirrors ``operators/dedup.py:simhash_groups`` over precomputed
    perceptual signatures: components run on DISTINCT signature values
    (a template family is ONE node), documents join their signature's
    component once, singleton signatures keep themselves as their
    component."""
    if release:
        release_persisted()
    base = _maybe_persist(
        sigs.select("doc_id", F.col(sig_col).alias("simhash")), persist
    )
    near = near_signature_pairs(
        base.select("simhash").distinct(), max_hamming=max_hamming
    )
    comp = connected_components(
        near, "sa", "sb", max_iterations=max_iterations, release=False
    ).select(F.col("id").alias("simhash"), F.col("component").alias("__comp"))
    with_comp = base.join(comp, "simhash", "left").select(
        "doc_id", F.coalesce(F.col("__comp"), F.col("simhash")).alias("__comp")
    )
    gid = with_comp.groupBy("__comp").agg(F.min("doc_id").alias("group_id"))
    return with_comp.join(gid, "__comp").select("doc_id", "group_id")

"""Multimodal column plumbing (extension surface).

Images/audio/video ride through the engine as opaque ``binary`` columns
plus typed metadata. The Spark-side machinery here is real and tested —
schema, Arrow-batched ``mapInPandas``, partition-preserving transforms;
the actual media decode is stubbed because no image/audio libraries
exist in this container (clearly marked below).

At scale: decode/feature-extract is embarrassingly parallel per row, so
``mapInPandas`` (Arrow batches, vectorized pandas ops, no per-row
Python) is the right shape — executors stream batches through the
Python worker without collecting anything.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, fake_width int, fake_height int"
)


def _decode_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decoder.

    STUB: a real deployment would decode image bytes here (PIL/ffmpeg
    are not in this container). The fake derives stable "dimensions"
    from the payload length so results are reproducible and
    oracle-checkable; the Arrow plumbing around it is production-real.
    """
    try:  # real decoder would be used if present
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real image decode intentionally not implemented in this build"
        )
    except ImportError:
        pass
    n_bytes = batch["payload"].map(len).astype("int64")
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"].astype("int64"),
            "n_bytes": n_bytes,
            "fake_width": (n_bytes % 640 + 1).astype("int32"),
            "fake_height": (n_bytes * 7 % 480 + 1).astype("int32"),
        }
    )


def decode_metadata(df: DataFrame, id_col: str = "doc_id",
                    payload_col: str = "payload") -> DataFrame:
    """Run the (stub) decoder over a binary column via mapInPandas."""
    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _decode_batch(batch)

    return src.mapInPandas(run, schema=DECODED_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_hash string"


def sample_frames(df: DataFrame, id_col: str = "doc_id",
                  payload_col: str = "payload") -> DataFrame:
    """Frame-sampling plumbing: one input row fans out to N output rows
    (the video-frame / audio-chunk extraction shape) via mapInPandas.

    STUB decoder: frame count is derived from payload length
    (n_bytes % 4 + 1) and each "frame" is identified by a stable digest
    — a real deployment would emit decoded frame bytes. The 1→N
    Arrow-batched fan-out is the production-real part: output row count
    is independent of input batch boundaries.
    """
    import hashlib

    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(batch["doc_id"], batch["payload"]):
                n_frames = len(payload) % 4 + 1
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(
                        hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame_hash": pd.Series(hashes, dtype="object")}
            )

    return src.mapInPandas(run, schema=FRAMES_SCHEMA)


FEATURES_SCHEMA = "doc_id long, features array<double>"
FEATURE_DIM = 8


def extract_features(df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload") -> DataFrame:
    """Fixed-dimension feature vector per payload via Arrow-batched
    mapInPandas — the embedding-model-inference shape.

    STUB featurizer: dimension i is the i-th 16-bit word of the
    payload's md5, scaled to [0, 1] (a real deployment would run the
    encoder model here). Deterministic and engine-agnostic, so the
    whole Arrow pipeline — batch in, fixed-width vector column out —
    is oracle-checkable end to end. Exact IEEE division (no rounding)
    keeps cross-engine floats bit-identical.
    """
    import hashlib

    src = df.select(F.col(id_col).alias("doc_id"),
                    F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            feats = [
                [
                    int(hashlib.md5(p).hexdigest()[4 * i : 4 * i + 4], 16)
                    / 65535.0
                    for i in range(FEATURE_DIM)
                ]
                for p in batch["payload"]
            ]
            yield pd.DataFrame(
                {"doc_id": batch["doc_id"].astype("int64"),
                 "features": pd.Series(feats, dtype="object")}
            )

    return src.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_meta(decoded: DataFrame, target_w: int = 224,
                target_h: int = 224) -> DataFrame:
    """Aspect-preserving fit-inside resize arithmetic over decoded
    dimensions — pure JVM-side expressions (the pixel resample itself
    would live in the decode UDF; the geometry never needs Python)."""
    scale = F.least(
        F.lit(float(target_w)) / F.col("fake_width"),
        F.lit(float(target_h)) / F.col("fake_height"),
    )
    return decoded.select(
        "doc_id",
        "fake_width",
        "fake_height",
        F.floor(F.col("fake_width") * scale).cast("int").alias("out_w"),
        F.floor(F.col("fake_height") * scale).cast("int").alias("out_h"),
    )


def documents_as_binary(df: DataFrame) -> DataFrame:
    """Treat document text as an opaque binary payload — the multimodal
    ingestion shape (real pipelines read image/audio bytes from parquet
    binary columns the same way)."""
    return df.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

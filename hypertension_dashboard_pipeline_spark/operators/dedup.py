"""Deduplication operators (beyond-reference extension surface).

Large-scale training-data dedup over the ``documents`` table:

* exact         — md5-hash groupBy; one shuffle on the digest.
* n-gram Jaccard— inverted-index candidate join on shared shingles,
                  exact Jaccard on candidates only (never a cross join).
* MinHash + LSH — signature → bands → bucket self-join; candidates
                  shrink from O(n²) to near-linear. Signatures use
                  lexicographic-min md5 per seed so an independent SQL
                  engine reproduces them exactly.
* embedding     — cosine near-dup over embeddings (see similarity.py).

Everything is built-in expressions — shingling/hashing stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import minhash_signature, word_shingles


def exact_dedup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups: one row per distinct content digest with
    the surviving (min) id and the duplicate count."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row per distinct text (deterministic min-id
    survivor)."""
    keep = exact_dedup_groups(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def shingle_pairs_jaccard(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text", k: int = 3,
                          threshold: float = 0.5,
                          scale: int = 6) -> DataFrame:
    """Near-duplicate pairs by exact k-word-shingle Jaccard.

    Candidate generation is an inverted-index self-join (explode
    shingles → join on shingle → distinct pairs), so only documents
    sharing at least one shingle are ever compared — the scalable
    alternative to an O(n²) cross join. Exact |A∩B|/|A∪B| is then
    computed on candidates only.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), k).alias("shingles"),
    ).filter(F.size("shingles") > 0)

    exploded = sh.select("id", F.explode("shingles").alias("shingle"))
    cand = (
        exploded.alias("a")
        .join(exploded.alias("b"), on="shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    a = sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    scored = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")),
                scale,
            ),
        )
    )
    return scored.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", k: int = 3,
                       n_hashes: int = 16) -> DataFrame:
    """Per-document MinHash signature (array of md5-min digests)."""
    return df.select(
        F.col(id_col).alias("id"),
        minhash_signature(word_shingles(F.col(text_col), k), n_hashes).alias("sig"),
    ).filter(F.col("sig")[0].isNotNull())


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 3,
                      n_hashes: int = 16, bands: int = 4,
                      scale: int = 6) -> DataFrame:
    """LSH candidate pairs with estimated Jaccard.

    Signature is banded (``bands`` bands of n_hashes/bands rows); docs
    colliding in any band become candidates (bucket equi-join on the
    band digest — near-linear, shuffle on band hash). The estimate is
    the fraction of agreeing signature positions.
    """
    rows = n_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, k, n_hashes)
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws("|", F.slice(F.col("sig"), b * rows + 1, rows))
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", "bb.band", "bb.bucket")

    cand = (
        banded.alias("a")
        .join(banded.alias("b"), on=["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.select(
        "id_a",
        "id_b",
        F.round(
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                    lambda m: m,
                )
            ).cast("double")
            / F.lit(float(n_hashes)),
            scale,
        ).alias("est_jaccard"),
    )

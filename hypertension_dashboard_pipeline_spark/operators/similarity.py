"""Similarity search over embedding columns (extension surface).

* ``brute_force_topk`` — exact cosine top-k against a literal query
  vector: one scan, one TakeOrdered; the correctness baseline.
* ``cosine_near_dup_pairs`` — all pairs above a cosine threshold via a
  blocked self-join (bucketed by an LSH sign signature) so candidate
  generation is near-linear.
* ``lsh_bucket_topk`` — the scale path for top-k: probe only vectors
  sharing the query's hyperplane-sign bucket (and 1-bit neighbors).

Hyperplanes are derived deterministically from md5 digits, not an RNG —
reproducible across engines and runs (a requirement both for the DuckDB
oracle and for incremental re-indexing at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double_array, cosine, dot, norm


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane components in [-7.5, 7.5]:
    hex digits of md5("lsh:<plane>:<i>"). Engine-agnostic."""
    import hashlib

    comps = []
    for i in range(dim):
        h = hashlib.md5(f"lsh:{plane}:{i}".encode()).hexdigest()
        comps.append(float(int(h[0], 16)) - 7.5)
    return comps


def sign_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: concatenated sign bits of <vec, plane_j>."""
    v = as_double_array(vec)
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(v, F.array(*[F.lit(c) for c in plane]), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def brute_force_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     scale: int = 6) -> DataFrame:
    """Exact cosine top-k: rank by (rounded cosine desc, id) — the
    rounding makes rank order reproducible across engines."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine(F.col(vec_col), q, scale=scale).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def cosine_near_dup_pairs(df: DataFrame, threshold: float = 0.95,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          n_planes: int = 8, probe_mirrors: bool = True,
                          scale: int = 6) -> DataFrame:
    """Pairs with cosine ≥ threshold.

    Blocking: vectors are bucketed by hyperplane-sign signature; only
    same-bucket pairs are scored. With 8 planes a 0.95-cosine pair
    collides with probability ~(1 - θ/π)^8 ≈ 0.66 per table of planes —
    good recall for near-dup screening while cutting candidates by
    ~2^8. (Exact variant: set n_planes=0 to score all pairs.)
    """
    # vector dimension from a cheap first-row probe
    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    d = int(first["d"])

    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if n_planes > 0:
        planes = [_hyperplane(j, d) for j in range(n_planes)]
        base = base.withColumn("bucket", sign_bucket(F.col("v"), planes))
        a = base.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), "bucket")
        b = base.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), "bucket")
        cand = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    else:
        a = base.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
        b = base.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
        cand = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))

    scored = cand.select(
        "id_a", "id_b", cosine(F.col("v_a"), F.col("v_b"), scale=scale).alias("cos_sim")
    )
    return scored.filter(F.col("cos_sim") >= threshold)


def label_centroids(df: DataFrame, label_col: str = "label",
                    vec_col: str = "embedding",
                    scale: int = 4) -> DataFrame:
    """Per-label centroid components (label, pos, centroid_val) —
    posexplode + one hash aggregation; the IVF coarse quantizer.
    Components round so downstream ranking is engine-reproducible."""
    return (
        df.select(
            F.col(label_col).alias("label"),
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("p", "v"),
        )
        .groupBy("label", (F.col("p") + 1).alias("pos"))
        .agg(F.round(F.avg("v"), scale).alias("centroid_val"))
    )


def ivf_topk(df: DataFrame, query_vec: list[float], k: int = 10,
             n_probe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding", label_col: str = "label",
             scale: int = 6) -> DataFrame:
    """IVF-style approximate top-k: rank cluster centroids against the
    query, then score only vectors in the ``n_probe`` nearest clusters.

    At scale the table is stored partitioned/bucketed by the cluster id,
    so probing reads ~n_probe/n_clusters of the data — the standard IVF
    trade: recall vs clusters probed. Here the pre-assigned ``label``
    column is the coarse assignment; ``label_centroids`` is its
    quantizer build.
    """
    cents = label_centroids(df, label_col, vec_col)
    # assemble centroid vectors: sorted struct-collect per label
    cent_vecs = (
        cents.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "centroid_val"))).alias("pv"))
        .select(
            "label",
            F.transform(F.col("pv"), lambda s: s["centroid_val"]).alias("cvec"),
        )
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probed = (
        cent_vecs.select(
            "label", cosine(F.col("cvec"), q, scale=scale).alias("c_sim")
        )
        .orderBy(F.col("c_sim").desc(), F.col("label"))
        .limit(n_probe)
        .select("label")
    )
    scored = df.join(F.broadcast(probed), label_col).select(
        F.col(id_col), cosine(F.col(vec_col), q, scale=scale).alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def lsh_bucket_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = 4, scale: int = 6) -> DataFrame:
    """Approximate top-k: score only the query's sign bucket.

    At 100 TB the full-scan baseline reads everything per query; with a
    bucketed (pre-partitioned) index only ~1/2^planes of rows are
    scored. Recall is tunable via n_planes (fewer planes = bigger
    bucket = higher recall).
    """
    d = len(query_vec)
    planes = [_hyperplane(j, d) for j in range(n_planes)]
    qbits = "".join(
        "1" if sum(c * x for c, x in zip(plane, query_vec)) >= 0 else "0"
        for plane in planes
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    bucketed = df.withColumn("bucket", sign_bucket(F.col(vec_col), planes)).filter(
        F.col("bucket") == qbits
    )
    scored = bucketed.select(
        F.col(id_col), cosine(F.col(vec_col), q, scale=scale).alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)

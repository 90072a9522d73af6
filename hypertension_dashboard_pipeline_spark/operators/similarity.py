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

from ..functions.expressions import round_fixed
from ..functions.vectors import (
    as_double_array,
    cosine,
    cosine_guarded,
    dot,
    lit_double_array,
    norm,
)


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane components in [-7.5, 7.5]:
    hex digits of md5("lsh:<plane>:<i>"). Engine-agnostic."""
    import hashlib

    comps = []
    for i in range(dim):
        h = hashlib.md5(f"lsh:{plane}:{i}".encode()).hexdigest()
        comps.append(float(int(h[0], 16)) - 7.5)
    return comps


def sign_bucket(vec_col: str, planes: list[list[float]]) -> Column:
    """LSH bucket id: concatenated sign bits of <vec, plane_j>.

    Built as ONE parsed SQL expression instead of per-plane
    F.lit/python-lambda Column trees: a 4-table × 4-plane signature over
    64-dim planes is 1,024 ``F.lit`` py4j round-trips in the Column
    form, ~1 s of driver-side construction per plan (r13 optimization —
    the bench timer includes construction; guide §7.3).  The parsed
    tree is identical modulo lambda variable names (pinned by
    tests/test_similarity.py), so buckets are bit-equal."""
    from ..functions.vectors import sql_double

    v = f"cast({vec_col} as array<double>)"
    bits = []
    for plane in planes:
        arr = "array(" + ", ".join(sql_double(c) for c in plane) + ")"
        dotp = (
            f"aggregate(zip_with({v}, {arr}, (x, y) -> x * y), "
            f"0.0D, (acc, x) -> acc + x)"
        )
        bits.append(f"CASE WHEN {dotp} >= 0 THEN '1' ELSE '0' END")
    return F.expr("concat(" + ", ".join(bits) + ")")


def brute_force_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     scale: int = 6) -> DataFrame:
    """Exact cosine top-k: rank by (rounded cosine desc, id) — the
    rounding makes rank order reproducible across engines.

    Zero-norm corpus vectors (failed-encoder output, legal in any real
    corpus) score NULL via the when-guarded cosine and are dropped
    before ranking — under ANSI the unguarded division is a runtime
    DIVIDE_BY_ZERO, and a norm>0 pre-filter does NOT protect a
    projection-time division (see ``cosine_guarded``).  Contract: a
    zero vector is never a neighbor; a zero-norm QUERY returns the
    empty set."""
    q = lit_double_array(query_vec)
    scored = df.select(
        F.col(id_col),
        cosine_guarded(F.col(vec_col), q, scale=scale).alias("cos_sim"),
    ).filter(F.col("cos_sim").isNotNull())
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def cosine_near_dup_pairs(df: DataFrame, threshold: float = 0.95,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          n_tables: int = 4, planes_per_table: int = 4,
                          scale: int = 6, dim: int | None = None,
                          persist: bool = True,
                          release: bool = True) -> DataFrame:
    """Pairs with cosine ≥ threshold via banded random-hyperplane LSH.

    OR-amplified blocking (same banding idea as MinHash LSH): each
    vector gets ``n_tables`` sign signatures of ``planes_per_table``
    bits each; a pair is a candidate if it agrees on ALL bits of ANY
    table.  For cosine c, per-table collision is (1 - θ/π)^r with
    θ = arccos(c), so recall amplifies as 1-(1-p^r)^B — tunable without
    giving up blocking.  Candidates are deduped as ids-only pairs, then
    vectors are re-joined for scoring, so the wide rows never fan out
    through the bucket join.

    The hyperplanes are md5-derived constants, so the SAME blocking is
    reproducible in any engine — the DuckDB oracle applies it verbatim
    and the result stays exactly checkable despite being approximate.

    ``n_tables=0`` is the exact all-pairs variant — O(n²) crossJoin,
    test-baseline ONLY (recall measurement); never register it.

    Pass ``dim`` (the embedding width, known to any real caller from
    the encoder config or table metadata) to avoid the fallback
    first-row probe, which costs one extra Spark job per invocation.
    A declared ``dim`` is verified in-plan: any row whose vector width
    differs raises instead of silently projecting onto wrong-width
    hyperplanes (the check rides the existing scan — no extra job).
    """
    d = dim if dim is not None else int(
        df.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    )

    vec = F.col(vec_col)
    if dim is not None:
        # the when-branch makes the assertion part of the consumed
        # value, so column pruning cannot drop it
        vec = F.when(F.size(vec) == d, vec).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"cosine_near_dup_pairs: declared dim={d} but "
                          f"{vec_col} has width "),
                    F.size(F.col(vec_col)).cast("string"),
                )
            )
        )
    if release:
        from .dedup import release_persisted

        release_persisted()
    # per-vector norm computed ONCE here instead of per candidate pair:
    # sqrt is deterministic, so dot/(nrm_a*nrm_b) is bit-identical to
    # the oracle's per-pair dot/(sqrt(dot_aa)*sqrt(dot_bb)) — but the
    # pair-scoring stage drops from 3 array folds to 1.
    # Zero-norm vectors (failed-encoder output, legal in any real
    # corpus) are excluded HERE, before bucketing: cosine is undefined
    # for them, and under ANSI mode the 0/0 in the pair score is a
    # runtime divideByZeroError, not a quiet NaN — found by the
    # adversarial embeddings sweep.  Contract: a zero vector is never
    # a near-duplicate of anything.
    base = df.select(
        F.col(id_col).alias("id"), vec.alias("v"), norm(vec).alias("nrm")
    ).filter(F.col("nrm") > 0)
    if n_tables > 0:
        sigs = []
        for t in range(n_tables):
            planes = [
                _hyperplane(t * planes_per_table + j, d)
                for j in range(planes_per_table)
            ]
            sigs.append(
                F.struct(
                    F.lit(t).alias("t"),
                    sign_bucket("v", planes).alias("b"),
                )
            )
        # both self-join sides re-read tagged; persisted, the 16-plane
        # signature projection runs once, not twice
        from .dedup import _maybe_persist

        tagged = _maybe_persist(
            base.select("id", F.explode(F.array(*sigs)).alias("tb")), persist
        )
        cand = (
            tagged.select(F.col("id").alias("id_a"), "tb")
            .join(tagged.select(F.col("id").alias("id_b"), "tb"), "tb")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        cand = cand.join(
            base.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"),
                        F.col("nrm").alias("nrm_a")), "id_a"
        ).join(
            base.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"),
                        F.col("nrm").alias("nrm_b")), "id_b"
        )
    else:
        a = base.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"),
                        F.col("nrm").alias("nrm_a"))
        b = base.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"),
                        F.col("nrm").alias("nrm_b"))
        cand = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))

    scored = cand.select(
        "id_a", "id_b",
        round_fixed(
            dot(F.col("v_a"), F.col("v_b")) / (F.col("nrm_a") * F.col("nrm_b")),
            scale,
        ).alias("cos_sim"),
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
        .agg(round_fixed(F.avg("v"), scale).alias("centroid_val"))
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

    Zero-norm handling mirrors ``brute_force_topk``: guarded cosine +
    NULL drop on BOTH the centroid ranking (an all-zero cluster has a
    zero centroid) and the probed scoring — never a norm>0 pre-filter
    (``cosine_guarded`` documents why).
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
    q = lit_double_array(query_vec)
    probed = (
        cent_vecs.select(
            "label", cosine_guarded(F.col("cvec"), q, scale=scale).alias("c_sim")
        )
        .filter(F.col("c_sim").isNotNull())
        .orderBy(F.col("c_sim").desc(), F.col("label"))
        .limit(n_probe)
        .select("label")
    )
    scored = df.join(F.broadcast(probed), label_col).select(
        F.col(id_col),
        cosine_guarded(F.col(vec_col), q, scale=scale).alias("cos_sim"),
    ).filter(F.col("cos_sim").isNotNull())
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def query_sign_bits(query_vec: list[float], n_planes: int) -> str:
    """The query vector's sign-bucket id, computed driver-side (the
    planes are deterministic constants; no Spark job)."""
    planes = [_hyperplane(j, len(query_vec)) for j in range(n_planes)]
    return "".join(
        "1" if sum(c * x for c, x in zip(plane, query_vec)) >= 0 else "0"
        for plane in planes
    )


def build_lsh_index(df: DataFrame, path: str, n_planes: int = 4,
                    vec_col: str = "embedding",
                    dim: int | None = None) -> None:
    """Materialize the ANN index: the table rewritten with a
    ``bucket=<sign bits>`` partition directory layout.

    ``lsh_bucket_topk`` computes buckets at query time — a full scan
    per query, fine for one-off batch jobs but not for a served index.
    This pays the bucketing once at write time; every subsequent probe
    is a partition-pruned scan of ~1/2^n_planes of the data (pinned by
    tests/test_plans.py::test_lsh_index_probe_prunes_partitions).
    Incremental growth works because the planes are md5-derived
    constants: new vectors append into the same bucket directories."""
    d = dim if dim is not None else int(
        df.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    )
    planes = [_hyperplane(j, d) for j in range(n_planes)]
    (
        df.withColumn("bucket", sign_bucket(vec_col, planes))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def lsh_bucket_topk_indexed(spark, index_path: str, query_vec: list[float],
                            k: int = 10, id_col: str = "vec_id",
                            vec_col: str = "embedding", n_planes: int = 4,
                            scale: int = 6) -> DataFrame:
    """Approximate top-k over a materialized sign-bucket index
    (``build_lsh_index``): the bucket equality lands in the scan's
    PartitionFilters, so only the query's bucket directory is read —
    the claimed 1/2^planes scan made real rather than computed on the
    fly. Same result set as ``lsh_bucket_topk`` by construction —
    including the zero-norm exclusion: a zero vector signs into the
    all-ones bucket (every <0, plane> is >= 0), so it CAN share the
    query's partition; the guarded cosine + NULL drop keeps it out of
    the ranking instead of crashing the probe under ANSI."""
    qbits = query_sign_bits(query_vec, n_planes)
    bucketed = spark.read.parquet(index_path).filter(F.col("bucket") == qbits)
    q = lit_double_array(query_vec)
    scored = bucketed.select(
        F.col(id_col),
        cosine_guarded(F.col(vec_col), q, scale=scale).alias("cos_sim"),
    ).filter(F.col("cos_sim").isNotNull())
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def quantized_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   scale: int = 6) -> DataFrame:
    """Int8 scalar-quantized inner-product top-k (MIPS over a compressed
    index).

    Each vector is quantized independently: ``scale_v = 127 / max|x|``,
    ``q_i = floor(x_i * scale_v)`` — int8-range codes that shrink a
    float32 embedding store 4× (the difference between an index that
    fits executor page cache at 100 TB and one that doesn't). Scoring
    is an exact BIGINT dot product between codes, de-scaled once per
    row: ``approx_dot = qdot * max_c * max_q / 127²``.

    Everything is built-in expressions (transform/zip_with/aggregate —
    sequential fold, bit-deterministic), so a DuckDB oracle reproduces
    the quantization and ranking exactly: quantization error is part of
    the operator's CONTRACT, not a verification gap. Ranking is by
    (rounded approx_dot desc, id) as in ``brute_force_topk``.

    NaN-component vectors have no int8 code (``floor(NaN)`` is a cast
    error, not a value), so they are excluded from the index — the
    ``~isnan(max|x|)`` filter below, mirrored by the oracle's
    ``NOT isnan`` WHERE (NaN > 0 is TRUE in both engines, so nothing
    weaker works; the r10 cosine-family class).
    """
    import math

    qd = [float(x) for x in query_vec]
    max_q = max(abs(x) for x in qd) or 1.0
    s_q = 127.0 / max_q
    q_codes = [int(math.floor(x * s_q)) for x in qd]

    v = as_double_array(vec_col)
    max_c_raw = F.array_max(F.transform(v, lambda x: F.abs(x)))
    max_c = F.when(max_c_raw == 0.0, F.lit(1.0)).otherwise(max_c_raw)
    s_c = F.lit(127.0) / max_c
    codes = F.transform(v, lambda x: F.floor(x * s_c))
    qlit = F.array(*[F.lit(c).cast("long") for c in q_codes])
    qdot = F.aggregate(
        F.zip_with(codes, qlit, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = df.filter(~F.isnan(max_c_raw)).select(
        F.col(id_col),
        qdot.alias("qdot"),
        round_fixed(
            qdot.cast("double") * max_c * F.lit(max_q) / F.lit(16129.0), scale
        ).alias("approx_dot"),
    )
    return scored.orderBy(F.col("approx_dot").desc(), F.col(id_col)).limit(k)


def lsh_bucket_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = 4, scale: int = 6) -> DataFrame:
    """Approximate top-k: score only the query's sign bucket.

    At 100 TB the full-scan baseline reads everything per query; with a
    bucketed (pre-partitioned) index only ~1/2^planes of rows are
    scored. Recall is tunable via n_planes (fewer planes = bigger
    bucket = higher recall).

    A zero-norm vector signs into the all-ones bucket, so it can land
    in the probed set; the guarded cosine scores it NULL and the drop
    filter removes it (ANSI-safe — see ``cosine_guarded``).
    """
    d = len(query_vec)
    planes = [_hyperplane(j, d) for j in range(n_planes)]
    qbits = "".join(
        "1" if sum(c * x for c, x in zip(plane, query_vec)) >= 0 else "0"
        for plane in planes
    )
    q = lit_double_array(query_vec)
    bucketed = df.withColumn("bucket", sign_bucket(vec_col, planes)).filter(
        F.col("bucket") == qbits
    )
    scored = bucketed.select(
        F.col(id_col),
        cosine_guarded(F.col(vec_col), q, scale=scale).alias("cos_sim"),
    ).filter(F.col("cos_sim").isNotNull())
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def semdedup_pairs(df: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding", cluster_col: str = "label",
                   threshold: float = 0.95, scale: int = 6) -> DataFrame:
    """Within-cluster cosine near-dup pairs — the candidate stage of
    SemDeDup (Abbas et al. 2023): semantic dedup never compares across
    clusters, so the quadratic pair space is bounded per cluster
    instead of per corpus.

    ``cluster_col`` is a precomputed cluster id (k-means assignment in
    the paper; any partitioning column works). The self-join is an
    equi-join on the cluster id, so at 100 TB each cluster's pairs are
    generated inside one shuffle partition group; cluster size is the
    knob that bounds cost (SemDeDup uses ~10^4 clusters for 10^8 docs;
    oversized clusters get split upstream — same discipline as the
    hot-shingle guard in text dedup).
    """
    # zero-norm vectors never pair (cosine undefined; ANSI 0/0 is a
    # runtime error) — and therefore always SURVIVE semdedup, which is
    # the right call for a dedup pass: deciding what to do with
    # degenerate vectors belongs to a quality filter, not here
    base = df.select(
        F.col(cluster_col).alias("c"),
        F.col(id_col).alias("id"),
        as_double_array(F.col(vec_col)).alias("v"),
    ).filter(norm(F.col("v")) > 0)
    return (
        base.alias("a")
        .join(base.alias("b"), "c")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("c").alias(cluster_col),
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v"), scale=scale).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def semdedup_survivors(df: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       cluster_col: str = "label",
                       threshold: float = 0.95, scale: int = 6) -> DataFrame:
    """SemDeDup survivor set: within each cluster, drop every vector
    that has a LOWER-id neighbor with cosine ≥ threshold — the
    deterministic form of "keep one representative per semantic
    duplicate neighborhood" (min-id plays the paper's keep-choice
    rule; any total order works, it just has to be stable).

    Note the policy is greedy-by-id, not connected-components: a
    vector is dropped iff some kept-or-dropped lower id is its near
    neighbor. That matches SemDeDup's per-point max-similarity test
    and needs only the pair list + one distinct — no iteration.
    """
    removed = (
        semdedup_pairs(df, id_col, vec_col, cluster_col, threshold, scale)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return df.join(removed, id_col, "left_anti")


def jl_sign_matrix(out_dim: int, in_dim: int,
                   scale: float) -> list[list[float]]:
    """Deterministic ±scale sign matrix for the sparse
    Johnson-Lindenstrauss projection (Achlioptas 2003, public
    literature): entry (j, i) is +scale when the first hex digit of
    md5("i_j") is even.  Content-derived, so every engine — and every
    re-run — materializes the identical matrix with no RNG state to
    ship."""
    import hashlib

    return [
        [
            scale
            if int(hashlib.md5(f"{i}_{j}".encode()).hexdigest()[0], 16) % 2
            == 0
            else -scale
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(df: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "embedding", out_dim: int = 16,
                      in_dim: int = 64) -> DataFrame:
    """Johnson-Lindenstrauss random projection to ``out_dim``
    dimensions: out[j] = Σ_i v[i]·S[j][i] with S the deterministic
    ±1/√out_dim sign matrix.  With the default out_dim=16 the scale is
    exactly 0.25 — a power of two, so the scaling itself is lossless.

    Pure narrow map: the sign matrix is a constant-folded literal (no
    broadcast join, no RNG), each row's 16 outputs are ordered left
    folds over the input dims (bit-exact on any engine), and the only
    data movement is the projection's own column-width reduction —
    the preprocessing step that makes downstream ANN/LSH shuffles
    4× narrower at 100 TB.
    """
    scale = 1.0 / (out_dim ** 0.5)
    signs = jl_sign_matrix(out_dim, in_dim, scale)
    signs_col = F.array(
        *[F.array(*[F.lit(v) for v in row]) for row in signs]
    )
    vecs = df.select(
        F.col(id_col), as_double_array(vec_col).alias("__v")
    )
    proj = F.transform(
        signs_col,
        lambda srow: F.aggregate(
            F.zip_with(F.col("__v"), srow, lambda x, s: x * s),
            F.lit(0.0),
            lambda a, b: a + b,
        ),
    )
    return vecs.select(
        id_col, F.posexplode(proj).alias("j", "val")
    )


def exact_vector_dup_groups(df: DataFrame, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            scale: int = 6) -> DataFrame:
    """Exact embedding-duplicate groups: vectors are equal iff their
    per-component fixed-point quantizations (``floor(v·10^s + 0.5)``,
    the package's engine-exact rounding form) are equal, detected by
    ONE hash aggregation on the md5 of the joined quantized string —
    the embedding-space analog of ``dedup.exact_dedup_groups``.
    Quantizing first makes the digest robust to the float-formatting
    divergence raw ``CAST(float AS VARCHAR)`` would hit across
    engines, and collapses re-encoded copies that differ only below
    10^-s.

    100 TB shape: narrow map (quantize + digest per row, vector never
    leaves the map side un-hashed... the digest IS the shuffle key, 32
    chars regardless of dimension) + one groupBy; map-side partial
    aggregation absorbs hot duplicate clusters exactly as in exact
    text dedup.

    Output: (vec_hash, n_vectors, keep_id) for groups with >= 2
    members — the report half; survivors = a min-id semi-join, same
    as text exact dedup.
    """
    # the quantized INTEGER itself (floor(v·10^s + 0.5) as BIGINT), not
    # round_fixed (which divides back to the original scale — casting
    # that double would re-truncate);  pmod form == exact IEEE floor
    # for finite v (functions.expressions.round_fixed docstring).
    # FIXED-POINT RANGE CONTRACT (the degenerate-vector rule of the
    # zero-norm cosine family, applied to quantization): any vector
    # with a component outside ±9·10^(18-s) is EXCLUDED before
    # digesting — under ANSI the BIGINT cast of its scaled value is a
    # runtime CAST_OVERFLOW (found by the r8 package-wide crash sweep
    # on the hostile-embeddings corpus: a 1e30 failed-encoder
    # component scales to 1e36), and fixed-point equality at absolute
    # tolerance 10^-s is semantically meaningless at such magnitudes
    # anyway.  The same max-|component| predicate also drops NaN/Inf
    # vectors (comparisons with NaN are false), ENFORCING the
    # previously documented-only finite-component contract instead of
    # silently skipping the component in concat_ws.  Deciding what to
    # do with garbage-magnitude vectors belongs to a quality filter
    # (emb_norm_profile / emb_quantile_clip surface them), not here.
    limit = 9.0e18 / (10.0 ** scale)
    comp_max = F.array_max(
        F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
    )
    df = df.filter(comp_max <= F.lit(limit))

    def _qint(v):
        x = v.cast("double") * F.lit(float(10 ** scale)) + F.lit(0.5)
        return (x - F.pmod(x, F.lit(1.0))).cast("bigint")

    q = F.transform(F.col(vec_col), _qint)
    digest = F.md5(F.concat_ws(",", F.transform(q, lambda x: x.cast("string"))))
    return (
        df.select(digest.alias("vec_hash"), F.col(id_col))
        .groupBy("vec_hash")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_vectors") >= 2)
    )


def _directed_lsh_scored(df: DataFrame, id_col: str, vec_col: str,
                         label_col: str, n_tables: int,
                         planes_per_table: int, scale: int,
                         dim: int | None, persist: bool,
                         release: bool, cross_label_only: bool) -> DataFrame:
    """Shared engine for the directed banded-LSH scorers: every
    non-zero vector is an anchor; candidates share a bucket in any
    table; scored on the rounded cosine.  ``cross_label_only``
    restricts candidates to differing labels (hard negatives) vs any
    non-self vector (kNN)."""
    from .dedup import _maybe_persist, release_persisted

    d = dim if dim is not None else int(
        df.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    )
    if release:
        release_persisted()
    base = df.select(
        F.col(id_col).alias("id"), F.col(label_col).alias("lbl"),
        as_double_array(F.col(vec_col)).alias("v"),
        norm(F.col(vec_col)).alias("nrm"),
    ).filter(F.col("nrm") > 0)
    sigs = []
    for t in range(n_tables):
        planes = [
            _hyperplane(t * planes_per_table + j, d)
            for j in range(planes_per_table)
        ]
        sigs.append(
            F.struct(
                F.lit(t).alias("t"),
                sign_bucket("v", planes).alias("b"),
            )
        )
    tagged = _maybe_persist(
        base.select("id", "lbl", F.explode(F.array(*sigs)).alias("tb")),
        persist,
    )
    pair_filter = (
        F.col("label_a") != F.col("label_b") if cross_label_only
        else F.col("anchor_id") != F.col("neg_id")
    )
    cand = (
        tagged.select(F.col("id").alias("anchor_id"),
                      F.col("lbl").alias("label_a"), "tb")
        .join(
            tagged.select(F.col("id").alias("neg_id"),
                          F.col("lbl").alias("label_b"), "tb"),
            "tb",
        )
        .filter(pair_filter)
        .select("anchor_id", "neg_id", "label_a", "label_b")
        .distinct()
    )
    return (
        cand.join(
            base.select(F.col("id").alias("anchor_id"),
                        F.col("v").alias("v_a"),
                        F.col("nrm").alias("nrm_a")), "anchor_id"
        )
        .join(
            base.select(F.col("id").alias("neg_id"),
                        F.col("v").alias("v_b"),
                        F.col("nrm").alias("nrm_b")), "neg_id"
        )
        .select(
            "anchor_id", "neg_id", "label_a", "label_b",
            round_fixed(
                dot(F.col("v_a"), F.col("v_b"))
                / (F.col("nrm_a") * F.col("nrm_b")),
                scale,
            ).alias("cos_sim"),
        )
    )


def hard_negatives(df: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding", label_col: str = "label",
                   k: int = 4, n_tables: int = 4,
                   planes_per_table: int = 4, scale: int = 6,
                   dim: int | None = None,
                   persist: bool = True, release: bool = True) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    vector, the top-``k`` most cosine-similar vectors bearing a
    DIFFERENT label — the negatives that actually teach an embedding
    model something (random negatives are trivially separable; the
    hard ones sit just across the decision boundary).

    Same banded-LSH candidate generation as
    ``cosine_near_dup_pairs`` (agree on all bits of any table), but
    DIRECTED: every vector is an anchor and receives its own ranked
    negatives, so the bucket join keeps both (a, b) and (b, a).
    Candidates are ids-only until scoring; ranking runs per anchor on
    the ROUNDED cosine (ties to the lower neg id) so the cutoff is
    engine-stable.  A 100 TB corpus never sees an all-pairs product —
    the miss risk (a hard negative in no shared bucket) is the
    standard LSH recall trade, tunable via n_tables.

    Zero-norm vectors are excluded on both sides (cosine undefined).
    Output: (anchor_id, neg_id, label_a, label_b, cos_sim, rank)."""
    from pyspark.sql.window import Window

    scored = _directed_lsh_scored(
        df, id_col, vec_col, label_col, n_tables, planes_per_table,
        scale, dim, persist, release, cross_label_only=True,
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos_sim").desc(), F.col("neg_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_label_accuracy(df: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       label_col: str = "label", k: int = 5,
                       n_tables: int = 4, planes_per_table: int = 4,
                       scale: int = 6, dim: int | None = None,
                       persist: bool = True,
                       release: bool = True) -> DataFrame:
    """Embedding-quality evaluation by leave-one-out kNN label vote:
    each vector's label is predicted by the majority label of its
    ``k`` nearest same-bucket neighbors (ties on vote count break to
    the smaller label; ranking on the rounded cosine, ties to the
    smaller neighbor id) and compared to its own — the standard
    "do the labels cluster?" probe run before trusting an encoder,
    as one relational plan over the SAME directed LSH blocking the
    mining operators use.  Anchors with no bucket neighbor are
    excluded (reported via n_anchors).

    Output: 1 row (n_anchors, n_correct, accuracy)."""
    from pyspark.sql.window import Window

    scored = _directed_lsh_scored(
        df, id_col, vec_col, label_col, n_tables, planes_per_table,
        scale, dim, persist, release, cross_label_only=False,
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos_sim").desc(), F.col("neg_id")
    )
    topk = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    votes = topk.groupBy("anchor_id", "label_a", "label_b").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wv = Window.partitionBy("anchor_id").orderBy(
        F.col("n_votes").desc(), F.col("label_b")
    )
    pred = (
        votes.withColumn("vrank", F.row_number().over(wv))
        .filter(F.col("vrank") == 1)
        .select(
            "anchor_id",
            (F.col("label_b") == F.col("label_a")).alias("correct"),
        )
    )
    return pred.agg(
        F.count(F.lit(1)).alias("n_anchors"),
        F.sum(F.col("correct").cast("int")).cast("long")
        .alias("n_correct"),
        round_fixed(
            F.sum(F.col("correct").cast("int")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("accuracy"),
    )


def _py_round_fixed(x: float, digits: int = 6) -> float:
    """Driver-side mirror of functions.expressions.round_fixed for
    bounded-pool arithmetic: floor(x*10^d + 0.5)/10^d in IEEE doubles
    (Python floats ARE IEEE doubles, so this matches the Spark/DuckDB
    floor form bit-for-bit on the finite, small-magnitude values the
    MMR scores take)."""
    import math

    scale = 10.0 ** digits
    return math.floor(x * scale + 0.5) / scale


def _py_cosine6(a: list[float], b: list[float]) -> float:
    """Driver-side cosine, 6dp — the identical left-to-right IEEE
    fold the engines run (sequential sum, math.sqrt is correctly
    rounded on every platform)."""
    import math

    dot_ab = 0.0
    dot_aa = 0.0
    dot_bb = 0.0
    for x, y in zip(a, b):
        dot_ab += x * y
    for x in a:
        dot_aa += x * x
    for y in b:
        dot_bb += y * y
    return _py_round_fixed(dot_ab / (math.sqrt(dot_aa) * math.sqrt(dot_bb)))


def mmr_rerank(
    emb: DataFrame,
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): from the cosine top-``pool`` candidates for a query
    (the lowest-id vector), greedily select ``k`` maximizing
    lam*relevance - (1-lam)*max-similarity-to-already-selected — the
    diversity-aware top-k an IR/RAG stack serves instead of raw ANN
    hits.

    Distributed shape: the corpus-sized work (cosine scoring + the
    top-``pool`` cut) is ONE narrow scan + TakeOrdered, exactly the
    brute-force-topk plan; the greedy selection then runs on the
    bounded pool (pool x dim driver state, the kmeans-centroid
    contract) with every number produced by the same IEEE
    fold + 6dp floor-round both engines compute, so the pick
    sequence is deterministic cross-engine.  Zero-norm AND
    NaN-component vectors are excluded up front (cosine undefined;
    NaN > 0 is TRUE in both engines, so a bare positivity filter
    would let a garbage vector's NaN relevance rank FIRST into the
    pool and crash the driver-side floor — the r10 cosine-family
    class).

    Returns ``sel_step, vec_id, rel, mmr_score`` (k rows; step 0's
    score IS its relevance)."""
    v = as_double_array(vec_col)
    self_dot = F.aggregate(
        F.zip_with(v, v, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    first = (
        emb.filter((self_dot > 0) & ~F.isnan(self_dot))
        .orderBy(id_col)
        .select(F.col(id_col).alias("qid"), v.alias("qv"))
        .limit(1)
        .collect()[0]
    )
    qid, qv = first["qid"], [float(x) for x in first["qv"]]
    qlit = F.array(*[F.lit(c) for c in qv])
    base = emb.select(F.col(id_col).alias("vec_id"), v.alias("v")).filter(
        (F.col("vec_id") != qid)
        & (dot("v", "v") > 0)
        & ~F.isnan(dot("v", "v"))
    )
    pool_rows = (
        base.select(
            "vec_id", "v", cosine(F.col("v"), qlit, scale=6).alias("rel")
        )
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(pool)
        .collect()
    )
    cand = {
        r["vec_id"]: ([float(x) for x in r["v"]], float(r["rel"]))
        for r in pool_rows
    }
    # greedy selection over the bounded pool — driver arithmetic is
    # the same IEEE ops both engines run on identical doubles
    red: dict[int, float] = {}
    picked: list[tuple[int, int, float, float]] = []  # step, id, rel, score
    remaining = dict(cand)
    for step in range(min(k, len(cand))):
        if step == 0:
            best_id = max(remaining, key=lambda i: (remaining[i][1], -i))
            score = remaining[best_id][1]
        else:
            def mmr(i: int) -> float:
                return lam * remaining[i][1] - (1.0 - lam) * red[i]

            best_id = max(remaining, key=lambda i: (mmr(i), -i))
            score = _py_round_fixed(mmr(best_id))
        picked.append((step, best_id, remaining[best_id][1], score))
        best_vec = remaining.pop(best_id)[0]
        for i in remaining:
            s = _py_cosine6(remaining[i][0], best_vec)
            red[i] = s if i not in red else max(red[i], s)
    steps = F.create_map(
        *[x for st, vid, _, _ in picked for x in (F.lit(vid), F.lit(st))]
    )
    scores = F.create_map(
        *[x for _, vid, _, sc in picked for x in (F.lit(vid), F.lit(sc))]
    )
    ids = [vid for _, vid, _, _ in picked]
    return (
        base.select(
            "vec_id", cosine(F.col("v"), qlit, scale=6).alias("rel")
        )
        .filter(F.col("vec_id").isin(ids))
        .select(
            steps[F.col("vec_id")].alias("sel_step"),
            "vec_id",
            "rel",
            scores[F.col("vec_id")].alias("mmr_score"),
        )
    )

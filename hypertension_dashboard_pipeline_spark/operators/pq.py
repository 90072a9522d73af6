"""Product quantization (PQ) for embedding columns — the ANN memory
story at 100 TB: a 64-dim float32 vector (256 B) compresses to M=8
one-byte codes by quantizing each 8-dim subvector against its own
K=16-entry codebook, and queries score compressed vectors with an
asymmetric-distance (ADC) table lookup — 8 table reads per vector
instead of 64 multiplies, over 32x less data scanned.

Codebooks here are md5-derived deterministic constants (the same
device as the LSH hyperplanes, operators/similarity.py): every engine
reproduces them bit-for-bit, which is what makes the ENCODE step —
argmin over exact left-fold float arithmetic — oracle-checkable.  In
production the codebooks come from per-subspace k-means (the
kmeans_lloyd operator trains them; sub-vector slicing reuses the same
expressions) — swapping trained centroids in changes ONLY the
constants, not the plan.

Scale shape: encoding is a pure narrow map (WholeStageCodegen over
~1k arithmetic ops/row, no shuffle, no Python); ADC scoring is a
narrow map + TakeOrdered(k).  Codes, not vectors, flow through any
downstream shuffle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M_SUB = 8          # subspaces
K_CODES = 16       # centroids per subspace
SUB_DIM = 8        # dims per subspace (M_SUB * SUB_DIM = 64)


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def codebook() -> list[list[list[float]]]:
    """[m][c][j] -> centroid component in [-1, 1], md5-derived.
    (2001 buckets over /1000.0 keeps every value an exact ratio both
    engines parse to the identical double.)"""
    return [
        [
            [
                (_h(f"pq:{m}:{c}:{j}") % 2001 - 1000) / 1000.0
                for j in range(SUB_DIM)
            ]
            for c in range(K_CODES)
        ]
        for m in range(M_SUB)
    ]


def encode(df: DataFrame, vec_col: str = "embedding",
           id_col: str = "vec_id") -> DataFrame:
    """(id, code_0..code_{M-1}): per-subspace argmin code, lowest code
    on ties (array_position returns the FIRST minimal index).

    Implementation notes:
    * expressed with higher-order functions (zip_with + aggregate over
      a codebook LITERAL) instead of a fully unrolled M*K*SUB_DIM
      arithmetic tree — the unrolled form was measured at ~10s of
      whole-stage-codegen COMPILE time per plan (flat across data
      sizes, pure compile cost).  The HOF fold is 0.0 + d_0 + d_1 + ...
      — IEEE-identical to the oracle's left fold (0.0 + x == x
      exactly), so codes are still bit-equal.
    * built as ONE selectExpr of SQL strings, not 1,024 ``F.lit`` +
      24 Python-lambda HOF Column objects: each F.lit/lambda is a py4j
      round-trip, and the Column form cost ~1.5 s of driver time per
      plan CONSTRUCTION (r13 optimization, guide §1/§7.3 — planning
      overhead is real wall-clock under the bench's constructor+sink
      timer).  The parsed expression tree is identical modulo lambda
      variable names (pinned by tests/test_pq.py), so codes are
      bit-equal; repr(float) round-trips every double exactly."""
    cb = codebook()
    exprs = [id_col]
    for m in range(M_SUB):
        cents = "array(" + ", ".join(
            "array(" + ", ".join(repr(v) + "D" for v in cb[m][c]) + ")"
            for c in range(K_CODES)
        ) + ")"
        sub = f"slice({vec_col}, {m * SUB_DIM + 1}, {SUB_DIM})"
        dists = (
            f"transform({cents}, c -> aggregate(zip_with({sub}, c, "
            f"(x, y) -> (cast(x as double) - y) * (cast(x as double) - y)), "
            f"0.0D, (acc, d) -> acc + d))"
        )
        exprs.append(
            f"cast(array_position({dists}, array_min({dists})) - 1 as int)"
            f" as code_{m}"
        )
    return df.selectExpr(*exprs)


def adc_scores(codes: DataFrame, query_vec: list[float],
               id_col: str = "vec_id") -> DataFrame:
    """Asymmetric-distance inner-product score against a (driver-side)
    query vector: score = sum_m ADC[m][code_m], where ADC[m][c] =
    dot(q_sub_m, centroid[m][c]) — an 8-entry table lookup per row,
    never touching the original vectors."""
    cb = codebook()
    adc = [
        [
            _dot_py(query_vec[m * SUB_DIM:(m + 1) * SUB_DIM], cb[m][c])
            for c in range(K_CODES)
        ]
        for m in range(M_SUB)
    ]
    score: Column | None = None
    for m in range(M_SUB):
        term = F.element_at(
            F.array(*[F.lit(v) for v in adc[m]]), F.col(f"code_{m}") + 1
        )
        score = term if score is None else score + term
    assert score is not None
    # round_fixed, not F.round: engine round(double) diverges at
    # shortest-repr boundaries (functions/expressions.py)
    from ..functions.expressions import round_fixed

    return codes.select(id_col, round_fixed(score, 6).alias("adc_score"))


def _dot_py(a: list[float], b: list[float]) -> float:
    """Left-fold dot product in Python doubles — IEEE-identical to the
    engines' identically-ordered expression."""
    total = 0.0
    for x, y in zip(a, b):
        total = total + x * y
    return total


def ivf_adc_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                 n_probe: int = 2, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 label_col: str = "label") -> DataFrame:
    """IVF-PQ: the two halves of the production ANN index composed —
    coarse IVF probing prunes the corpus to ``n_probe`` clusters
    (~n_probe/n_clusters of the rows ever read when the table is
    partitioned by the coarse label), then ADC scores the survivors'
    PQ codes with 8 table lookups per row instead of 64 multiplies.

    This is the FAISS IVFADC layout (Jégou et al. TPAMI'11, public
    literature) as a relational plan: probed labels arrive as a
    broadcast semi-join (partition pruning on a label-partitioned
    store), and the fine scorer touches codes, never raw vectors —
    scan volume drops multiplicatively (probe fraction × 32x code
    compression).  Encoding here runs post-filter for the query's
    one-shot form; the persisted-index form stores ``encode`` output
    partitioned by label and skips straight to ADC.
    """
    from ..functions.vectors import cosine
    from .similarity import label_centroids

    cents = label_centroids(df, label_col, vec_col)
    cent_vecs = (
        cents.groupBy("label")
        .agg(F.array_sort(
            F.collect_list(F.struct("pos", "centroid_val"))).alias("pv"))
        .select(
            "label",
            F.transform(F.col("pv"), lambda s: s["centroid_val"]).alias("cvec"),
        )
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probed = (
        cent_vecs.select(
            "label", cosine(F.col("cvec"), q, scale=6).alias("c_sim")
        )
        .orderBy(F.col("c_sim").desc(), F.col("label"))
        .limit(n_probe)
        .select("label")
    )
    pruned = df.join(F.broadcast(probed), label_col)
    codes = encode(pruned, vec_col, id_col)
    return (
        adc_scores(codes, query_vec, id_col)
        .orderBy(F.desc("adc_score"), id_col)
        .limit(k)
    )

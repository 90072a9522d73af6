"""Unit tests for product quantization (operators/pq.py) — mechanics
the parity sweep can't isolate: exact-centroid vectors encode to their
own codes, codes are stable under repartitioning, and ADC scoring of a
centroid-exact vector equals the plain dot product."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark.operators import pq


def _vec_from_codes(cb, picks):
    """Build a 64-dim vector equal to centroid picks[m] in subspace m."""
    out = []
    for m, c in enumerate(picks):
        out.extend(cb[m][c])
    return out


def test_centroid_exact_vectors_encode_to_their_codes(spark):
    cb = pq.codebook()
    picks_a = [0, 3, 7, 15, 2, 9, 11, 5]
    picks_b = [1, 1, 1, 1, 1, 1, 1, 1]
    df = spark.createDataFrame(
        [(1, _vec_from_codes(cb, picks_a)), (2, _vec_from_codes(cb, picks_b))],
        "vec_id long, embedding array<float>",
    )
    # float32 storage perturbs the exact centroid values, so quantize
    # the CODEBOOK the same way the column stores them: the nearest
    # centroid must still be the picked one by a wide margin (random
    # centroids are far apart relative to float32 eps).
    got = {r.vec_id: [r[f"code_{m}"] for m in range(pq.M_SUB)]
           for r in pq.encode(df).collect()}
    assert got[1] == picks_a
    assert got[2] == picks_b


def test_codes_stable_under_repartition(spark, sf_smoke):
    from hypertension_dashboard_pipeline_spark.io import load_table

    emb = load_table(spark, sf_smoke, "embeddings")
    a = sorted(tuple(r) for r in pq.encode(emb).collect())
    b = sorted(tuple(r) for r in pq.encode(emb.repartition(7)).collect())
    assert a == b
    for row in a:
        assert all(0 <= c < pq.K_CODES for c in row[1:])


def test_adc_of_centroid_exact_vector_is_plain_dot(spark):
    cb = pq.codebook()
    picks = [4, 4, 4, 4, 4, 4, 4, 4]
    vec = _vec_from_codes(cb, picks)
    df = spark.createDataFrame(
        [(1, vec)], "vec_id long, embedding array<float>"
    )
    codes = pq.encode(df)
    # query the vector against itself: ADC should equal the true
    # self-dot of the float32-rounded vector up to the fold's rounding
    qvec = [float(F32(x)) for x in vec]
    got = pq.adc_scores(codes, qvec).collect()[0]
    exact = sum(q * c for q, c in
                zip(qvec, _vec_from_codes(cb, picks)))
    assert got.adc_score == pytest.approx(exact, abs=1e-4)


def F32(x: float) -> float:
    import struct

    return struct.unpack("f", struct.pack("f", x))[0]


def test_encode_selectexpr_plan_equals_column_form(spark, sf_smoke):
    """r13 optimization: encode() builds its expressions as SQL strings
    (one selectExpr) instead of 1,024 F.lit + 24 python-lambda Column
    objects, purely to cut driver-side construction time.  The parsed
    Catalyst tree must be IDENTICAL to the Column form modulo lambda
    variable names — pinned here so the construction shortcut can never
    silently change what the operator computes."""
    import re

    from pyspark.sql import functions as F

    from hypertension_dashboard_pipeline_spark.operators import pq

    df = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")

    # the pre-r13 Column form, verbatim
    cb = pq.codebook()
    emb = F.col("embedding")
    cols = [F.col("vec_id")]
    for m in range(pq.M_SUB):
        sub = F.slice(emb, m * pq.SUB_DIM + 1, pq.SUB_DIM)
        cents = F.array(
            *[F.array(*[F.lit(v) for v in cb[m][c]]) for c in range(pq.K_CODES)]
        )
        dists = F.transform(
            cents,
            lambda c: F.aggregate(
                F.zip_with(
                    sub, c,
                    lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                ),
                F.lit(0.0),
                lambda acc, d: acc + d,
            ),
        )
        code = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        cols.append(code.alias(f"code_{m}"))
    old = df.select(*cols)
    new = pq.encode(df)

    def norm(d):
        s = d._jdf.queryExecution().executedPlan().toString()
        s = re.sub(r"#\d+", "#N", s)          # expression ids
        s = re.sub(r"lambda \w+#N", "lambda V#N", s)  # lambda var names
        return s

    assert norm(old) == norm(new)

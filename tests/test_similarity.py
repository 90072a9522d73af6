"""Similarity-search behavior tests: the approximate paths are judged
against the exact baseline (recall), since no SQL oracle can pin an
approximation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark.io import load_table
from hypertension_dashboard_pipeline_spark.operators import similarity as sim


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = load_table(spark, sf_dir, "embeddings")
    df.cache()
    return df


@pytest.fixture(scope="module")
def qvec(emb):
    return [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]


def test_brute_force_topk_self_first(emb, qvec):
    top = sim.brute_force_topk(emb, qvec, k=10).collect()
    assert len(top) == 10
    # the query vector itself must rank first with cosine 1
    assert top[0]["vec_id"] == 0
    assert abs(top[0]["cos_sim"] - 1.0) < 1e-9
    # descending order
    sims = [r["cos_sim"] for r in top]
    assert sims == sorted(sims, reverse=True)


def test_lsh_bucket_contains_query_and_overlaps_exact(emb, qvec):
    exact = {r["vec_id"] for r in sim.brute_force_topk(emb, qvec, k=10).collect()}
    approx_rows = sim.lsh_bucket_topk(emb, qvec, k=10, n_planes=4).collect()
    approx = {r["vec_id"] for r in approx_rows}
    assert 0 in approx                     # query's own bucket contains it
    assert len(approx_rows) == 10
    # same-bucket vectors skew similar: expect meaningful recall of the
    # true top-10 even with 1/16 of the table scored
    assert len(exact & approx) >= 3


def test_near_dup_pairs_threshold(emb):
    # n_tables=0 = exhaustive all-pairs: the TEST-ONLY baseline (the
    # registered operator always uses banded LSH blocking)
    pairs = sim.cosine_near_dup_pairs(emb, threshold=0.4, n_tables=0).collect()
    assert all(r["cos_sim"] >= 0.4 for r in pairs)
    assert all(r["id_a"] < r["id_b"] for r in pairs)


def test_near_dup_lsh_is_subset_of_exact_with_recall(emb):
    """The banded-LSH near-dup pairs must be a strict subset of the
    exhaustive pairs (no false positives — every candidate is scored
    exactly), with nonzero amplified recall at the 0.9 band where
    near-dup detection actually operates."""
    exact = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in sim.cosine_near_dup_pairs(emb, threshold=0.4, n_tables=0).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in sim.cosine_near_dup_pairs(
            emb, threshold=0.4, n_tables=4, planes_per_table=4
        ).collect()
    }
    assert set(blocked) <= set(exact)
    for k, v in blocked.items():
        assert v == exact[k]
    # recall on the high-similarity band: 1-(1-p^4)^4 with
    # p = 1 - arccos(0.9)/pi ≈ 0.86 gives ≈ 0.96 expected
    hi = {k for k, v in exact.items() if v >= 0.9}
    if hi:
        assert len(hi & set(blocked)) / len(hi) >= 0.7


def test_lsh_recall_on_clustered_corpus(spark):
    """On data with cluster structure (the case ANN exists for), the
    sign-bucket LSH must recover nearly all true neighbors: same-cluster
    vectors share hyperplane signs, so the probed bucket contains the
    cluster. Quantified recall@10 >= 0.8 vs the exact baseline.
    (On structureless uniform data recall degrades toward the probed
    fraction — that is inherent to LSH, not this implementation.)"""
    dim, per_cluster = 8, 40
    # 4 well-separated axis clusters with small deterministic jitter
    rows = []
    vid = 0
    for c in range(4):
        for i in range(per_cluster):
            base = [0.0] * dim
            base[c * 2] = 1.0
            jitter = [((vid * 13 + d * 7) % 11 - 5) / 100.0 for d in range(dim)]
            rows.append((vid, [b + j for b, j in zip(base, jitter)]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    recalls = []
    for qid in (0, per_cluster, 2 * per_cluster, 3 * per_cluster):
        qv = rows[qid][1]
        exact = {r.vec_id for r in sim.brute_force_topk(emb, qv, k=10).collect()}
        approx = {r.vec_id for r in sim.lsh_bucket_topk(emb, qv, k=10,
                                                        n_planes=4).collect()}
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_near_dup_wrong_dim_raises(emb):
    """A declared dim that disagrees with the stored vector width must
    fail the job, not silently project onto wrong-width hyperplanes."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises((Py4JJavaError, SparkRuntimeException, Exception),
                       match="declared dim"):
        sim.cosine_near_dup_pairs(emb, threshold=0.4, dim=32).collect()


def test_indexed_lsh_probe_matches_on_the_fly(spark, emb, qvec, tmp_path):
    """The materialized-index probe must return exactly the on-the-fly
    bucket probe's rows (same planes, same bucket, same scoring)."""
    path = str(tmp_path / "lsh_index")
    sim.build_lsh_index(emb, path, n_planes=4, dim=64)
    direct = [
        (r["vec_id"], r["cos_sim"])
        for r in sim.lsh_bucket_topk(emb, qvec, k=10, n_planes=4).collect()
    ]
    indexed = [
        (r["vec_id"], r["cos_sim"])
        for r in sim.lsh_bucket_topk_indexed(
            spark, path, qvec, k=10, n_planes=4
        ).collect()
    ]
    assert indexed == direct


def test_quantized_topk_tracks_exact_dot_ranking(emb, qvec):
    """Int8 quantization must keep high overlap with the EXACT
    inner-product ranking (the thing it approximates), and the query
    vector itself must rank first (its code dot with itself is max)."""
    from hypertension_dashboard_pipeline_spark.functions.vectors import dot

    q = F.array(*[F.lit(float(x)) for x in qvec])
    exact = [
        r["vec_id"]
        for r in emb.select(
            "vec_id", dot(F.col("embedding"), q).alias("d")
        ).orderBy(F.col("d").desc(), "vec_id").limit(10).collect()
    ]
    approx_rows = sim.quantized_topk(emb, qvec, k=10).collect()
    approx = [r["vec_id"] for r in approx_rows]
    assert approx[0] == 0  # the query vector itself
    # recall@10 against exact MIPS: int8 on 64-dim keeps ranking tight
    assert len(set(exact) & set(approx)) >= 8
    # scores are descending and qdot is an exact integer
    scores = [r["approx_dot"] for r in approx_rows]
    assert scores == sorted(scores, reverse=True)
    assert all(isinstance(r["qdot"], int) for r in approx_rows)


def test_quantized_topk_plan_stays_jvm_side(emb, qvec):
    plan = (
        sim.quantized_topk(emb, qvec, k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sign_bucket_sql_plan_equals_column_form(spark, sf_smoke):
    """r13 optimization: sign_bucket builds one parsed SQL expression
    instead of per-plane F.lit/python-lambda Column trees (1,024 py4j
    round-trips for a 4x4x64 signature).  The Catalyst tree must be
    IDENTICAL to the Column form modulo lambda variable names, so
    buckets — and every LSH candidate set — are bit-equal."""
    import re

    from pyspark.sql import functions as F

    from hypertension_dashboard_pipeline_spark.operators.similarity import (
        _hyperplane,
        sign_bucket,
    )

    df = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    planes = [_hyperplane(j, 64) for j in range(4)]

    # the pre-r13 Column form, verbatim
    v = F.col("embedding").cast("array<double>")
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(v, F.array(*[F.lit(c) for c in plane]),
                           lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    old = df.select(F.concat(*bits).alias("b"))
    new = df.select(sign_bucket("embedding", planes).alias("b"))

    def norm_plan(d):
        s = d._jdf.queryExecution().executedPlan().toString()
        s = re.sub(r"#\d+", "#N", s)
        s = re.sub(r"lambda \w+#N", "lambda V#N", s)
        return s

    assert norm_plan(old) == norm_plan(new)

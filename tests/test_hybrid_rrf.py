"""Reciprocal-rank fusion (operators/relevance.rrf_fuse): fusion math
vs a driver-side recomputation, bounded-input contract, and the empty
query-vector bail."""

from __future__ import annotations

from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark import registry
from hypertension_dashboard_pipeline_spark.io import load_table
from hypertension_dashboard_pipeline_spark.operators import similarity as sim
from hypertension_dashboard_pipeline_spark.operators.relevance import (
    bm25_topk,
    rrf_fuse,
)

registry.load_all()


def test_rrf_matches_driver_side_recomputation(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    emb = load_table(spark, sf_smoke, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0)
          .select("embedding").first()["embedding"]]
    lex = bm25_topk(docs, ["hash", "join", "scan", "vector"], k=50).collect()
    sem = sim.brute_force_topk(emb, qv, k=50).collect()
    # driver-side truth: ranks by (rounded score desc, id)
    lex_rank = {r.doc_id: i + 1 for i, r in enumerate(
        sorted(lex, key=lambda r: (-r.bm25, r.doc_id)))}
    sem_rank = {r.vec_id: i + 1 for i, r in enumerate(
        sorted(sem, key=lambda r: (-r.cos_sim, r.vec_id)))}
    want = {}
    for d in set(lex_rank) & set(sem_rank):
        raw = 1.0 / (60 + lex_rank[d]) + 1.0 / (60 + sem_rank[d])
        import math
        want[d] = (lex_rank[d], sem_rank[d],
                   math.floor(raw * 1e6 + 0.5) / 1e6)
    got = registry.QUERIES["text_hybrid_rrf"](spark, sf_smoke).collect()
    assert len(got) == min(20, len(want))
    for r in got:
        assert (r.rank_lex, r.rank_sem, r.rrf) == want[r.doc_id]
    # top-k by fused score: nothing outside the result beats the floor
    if len(want) > len(got):
        floor_val = min((r.rrf, r.doc_id) for r in got)
        out = [d for d in want if d not in {r.doc_id for r in got}]
        assert all((want[d][2], d) > floor_val for d in out)


def test_weighted_rrf_matches_driver_side_recomputation(spark, sf_smoke):
    """The 3:1 weighted fusion: ranks identical to the unweighted
    query's legs, fused score = 3/(60+rank_lex) + 1/(60+rank_sem)
    floor-rounded at 6dp; ordering follows the weighted score."""
    import math

    docs = load_table(spark, sf_smoke, "documents")
    emb = load_table(spark, sf_smoke, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0)
          .select("embedding").first()["embedding"]]
    lex = bm25_topk(docs, ["hash", "join", "scan", "vector"], k=50).collect()
    sem = sim.brute_force_topk(emb, qv, k=50).collect()
    lex_rank = {r.doc_id: i + 1 for i, r in enumerate(
        sorted(lex, key=lambda r: (-r.bm25, r.doc_id)))}
    sem_rank = {r.vec_id: i + 1 for i, r in enumerate(
        sorted(sem, key=lambda r: (-r.cos_sim, r.vec_id)))}
    want = {}
    for d in set(lex_rank) & set(sem_rank):
        raw = 3.0 / (60 + lex_rank[d]) + 1.0 / (60 + sem_rank[d])
        want[d] = (lex_rank[d], sem_rank[d],
                   math.floor(raw * 1e6 + 0.5) / 1e6)
    got = registry.QUERIES["text_hybrid_weighted_rrf"](
        spark, sf_smoke
    ).collect()
    assert len(got) == min(20, len(want))
    for r in got:
        assert (r.rank_lex, r.rank_sem, r.rrf) == want[r.doc_id]
    # the tilt is real: unweighted and weighted orders may differ, but
    # each returned list is ordered by ITS OWN fused score
    scores = [(r.rrf, -r.doc_id) for r in got]
    assert scores == sorted(scores, reverse=True)


def test_weighted_rrf_unit_weights_is_classic_rrf(spark, sf_smoke):
    """rrf_fuse(w=1,1) must be bit-identical to the pre-weight form —
    pins that adding the knob did not move the verified query."""
    docs = load_table(spark, sf_smoke, "documents")
    emb = load_table(spark, sf_smoke, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0)
          .select("embedding").first()["embedding"]]
    lex = bm25_topk(docs, ["hash", "join", "scan", "vector"], k=50)
    sem = sim.brute_force_topk(emb, qv, k=50)
    a = rrf_fuse(lex, sem, c=60, k=20).collect()
    b = rrf_fuse(lex, sem, c=60, k=20, w_lex=1.0, w_sem=1.0).collect()
    assert a == b


def test_rrf_empty_embeddings_returns_typed_empty(spark, sf_smoke, tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    # pytest tmp_path: fresh per run, so a stale symlink from a prior
    # sf_smoke location can never be silently reused (ADVICE r11)
    root = str(tmp_path / "rrf_empty_emb")
    os.makedirs(root, exist_ok=True)
    for t in ("region nation customer supplier part orders lineitem "
              "events documents").split():
        os.symlink(f"{sf_smoke}/{t}.parquet", f"{root}/{t}.parquet")
    pq.write_table(
        pa.table({
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
            "label": pa.array([], pa.int32()),
        }),
        f"{root}/embeddings.parquet",
    )
    out = registry.QUERIES["text_hybrid_rrf"](spark, root)
    assert out.count() == 0
    assert out.columns == ["doc_id", "rank_lex", "rank_sem", "rrf"]


def test_rrf_fuse_is_bounded(spark, sf_smoke):
    """The fusion operates on the two bounded top-N inputs only —
    output can never exceed min(|lex|, |sem|, k)."""
    docs = load_table(spark, sf_smoke, "documents")
    emb = load_table(spark, sf_smoke, "embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0)
          .select("embedding").first()["embedding"]]
    lex = bm25_topk(docs, ["hash"], k=5)
    sem = sim.brute_force_topk(emb, qv, k=7)
    out = rrf_fuse(lex, sem, k=20).collect()
    assert len(out) <= 5

"""Adversarial-data parity for the embedding-reading queries: zero
vectors (norm-0 edge in anything cosine-shaped), NaN-component
vectors (NaN > 0 is TRUE in both engines — the r10 cosine-guard
class), exact-duplicate vector families, float32 extremes (1e30),
float32 denormals, negative values, and axis-aligned one-hot vectors.
Covers the in-window embedding queries plus the similarity family
(externally green but worth the net — a regenerated corpus could
legally contain any of these shapes).
"""

from __future__ import annotations

import os
import random

import duckdb
import pytest

from hypertension_dashboard_pipeline_spark import registry

from test_driver_parity import TABLES, _canon

registry.load_all()

EMB_QUERIES = [
    "emb_gram_matrix",
    "emb_kmeans_lloyd",
    "emb_pq_codes",
    "sim_pq_adc_topk",
    "emb_label_centroids",
    "sim_quantized_topk",
    "sim_semdedup",
    "sim_cosine_near_dup",
    "emb_top_component",
    "emb_remove_top_component",
    # r7 wave-4+ debuts: the shared directed-LSH scorer must hold the
    # zero-norm exclusion contract; standardize divides by sigma
    # (constant dims would 0/0 — absent from this corpus, the
    # operator's documented precondition)
    "sim_hard_negatives",
    "sim_knn_accuracy",
    "sim_ivf_recall",
    # wave-10 debuts: kcenter works in raw squared-L2 (zero/huge
    # vectors are legitimate points); MMR excludes zero-norm rows and
    # guards the query pick the same way
    "sample_kcenter_diversity",
    "sim_mmr_rerank",
    "sim_mips_topk",
    "emb_norm_profile",
    "sim_range_search",
    # r8 LATENT-BUG ROTATION (registry.py): the five pinned cosine
    # top-k queries crashed on this corpus's zero vector under ANSI
    # (DIVIDE_BY_ZERO in the unguarded cosine) before the when-guard
    # landed in brute_force_topk / ivf_topk / lsh_bucket_topk(+indexed)
    # and the guarded batch-ANN scoring; the zero vector signs into
    # the all-ones LSH bucket and vec_id 4 sits inside the batch-ANN
    # query set, so every guard path (corpus, bucket-probed, and
    # query-side) is exercised, with full value parity vs the
    # WHERE-guarded oracles — not just no-crash.
    "sim_cosine_topk",
    "sim_ivf_topk",
    "sim_lsh_bucket_topk",
    "sim_lsh_bucket_topk_indexed",
    "sim_batch_ann_topk",
    # r8 debut: per-dimension winsorization must clip the 1e30 and
    # denormal extremes to the dimension quantiles identically in
    # both engines (exact-percentile interpolation on hostile values)
    "emb_quantile_clip",
    # late-r8 crash-sweep find: the 1e30 component scaled past BIGINT
    # (ANSI CAST_OVERFLOW) in the quantized digest — the fixed-point
    # range contract now excludes such vectors on both sides; this
    # corpus's huge/denormal/duplicate-family rows pin it with full
    # value parity
    "sim_exact_vector_dup",
    # late-r8 evaluation debut: purity over the same Lloyd
    # assignments emb_kmeans_lloyd pins on this corpus (1e30/denormal
    # distances are deterministic on both sides)
    "sim_cluster_purity",
]

_DIM = 64


def _build_adv_embeddings(path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(41)
    vecs: list[list[float]] = []
    # vec 0 is the query vector for the top-k probes: ordinary values
    vecs.append([round(rng.uniform(-1, 1), 4) for _ in range(_DIM)])
    # a few ordinary vectors so k-means init (first 4 ids) is sane
    for _ in range(3):
        vecs.append([round(rng.uniform(-1, 1), 4) for _ in range(_DIM)])
    vecs.append([0.0] * _DIM)                     # zero vector
    vecs.append([1e30] * _DIM)                    # float32 huge
    vecs.append([1e-40] * _DIM)                   # float32 denormal
    vecs.append([-1.0] * _DIM)                    # constant negative
    vecs.append([0.5] * _DIM)                     # constant midpoint
    for axis in range(6):                         # one-hot axes
        v = [0.0] * _DIM
        v[axis] = 1.0
        vecs.append(v)
    # NaN-component garbage vector (r10 cosine-family rotation): its
    # self-dot is NaN, and NaN > 0 is TRUE in both engines, so before
    # the ~isnan leg in cosine_guarded it survived the positivity
    # guard and ranked FIRST under ORDER BY cos_sim DESC.  Lives in
    # the corpus side of every probe (vec_id >= 8) and poisons its
    # label's IVF centroid (AVG propagates NaN), exercising the
    # centroid-guard path too.
    nan_vec = [round(rng.uniform(-1, 1), 4) for _ in range(_DIM)]
    nan_vec[7] = float("nan")
    vecs.append(nan_vec)
    # exact-duplicate family (5 copies)
    dup = [round(rng.uniform(-1, 1), 4) for _ in range(_DIM)]
    vecs += [list(dup) for _ in range(5)]
    # bulk ordinary mass
    for _ in range(400):
        vecs.append([round(rng.gauss(0, 1), 4) for _ in range(_DIM)])

    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(
            [i % 8 for i in range(len(vecs))], pa.int32()
        ),
    })
    pq.write_table(tbl, path)


@pytest.fixture(scope="module")
def advemb_dir(tmp_path_factory, sf_smoke):
    root = tmp_path_factory.mktemp("adv_emb")
    for t in TABLES:
        if t != "embeddings":
            os.symlink(f"{sf_smoke}/{t}.parquet", root / f"{t}.parquet")
    _build_adv_embeddings(str(root / "embeddings.parquet"))
    return str(root)


@pytest.fixture(scope="module")
def advemb_duck(advemb_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{advemb_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_embedding_query_matches_oracle_on_adversarial_data(
    name, spark, advemb_dir, advemb_duck
):
    sdf = registry.QUERIES[name](spark, advemb_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    duck_tbl = advemb_duck.execute(registry.ORACLES[name]).arrow()
    duck_cols = list(duck_tbl.schema.names)
    duck_rows = [tuple(d.values()) for d in duck_tbl.to_pylist()]
    assert sorted(spark_cols) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: {len(spark_rows)} vs {len(duck_rows)} rows"
    )
    _, srows = _canon(spark_cols, spark_rows)
    _, drows = _canon(duck_cols, duck_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )

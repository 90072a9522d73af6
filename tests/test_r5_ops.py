"""Unit tests for the r5 extension operators: benchmark
decontamination, temperature-flattened domain mixing, SCD-1 merge,
blocked fuzzy join, and SemDeDup — handcrafted inputs with known
answers (the registered queries' DuckDB oracles cover the sf0.01
tables; these pin the operator semantics directly)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark.operators.decontam import (
    contamination_scores,
    decontaminate,
)
from hypertension_dashboard_pipeline_spark.operators.joins import (
    fuzzy_join_blocked,
    merge_upsert,
)
from hypertension_dashboard_pipeline_spark.operators.sampling import (
    hash_bucket,
    temperature_mix,
)
from hypertension_dashboard_pipeline_spark.operators.similarity import (
    semdedup_survivors,
)


# ------------------------------------------------------------------ decontam

def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_contamination_scores_exact_fraction(spark):
    # benchmark: "a b c d" → shingles {a b c, b c d}
    bench = _docs(spark, [(100, "a b c d")])
    # doc 1: 4 shingles, 2 of them benchmark shingles → ratio 0.5
    # doc 2: no overlap → ratio 0.0
    corpus = _docs(spark, [(1, "a b c d e f"), (2, "x y z w")])
    got = {
        r["id"]: r
        for r in contamination_scores(corpus, bench, threshold=0.5).collect()
    }
    assert got[1]["n_sh"] == 4 and got[1]["n_hit"] == 2
    assert got[1]["overlap_ratio"] == pytest.approx(0.5)
    assert got[1]["contaminated"] == 1
    assert got[2]["n_hit"] == 0 and got[2]["contaminated"] == 0


def test_decontaminate_drops_flagged_keeps_short_docs(spark):
    bench = _docs(spark, [(100, "a b c d")])
    corpus = _docs(spark, [(1, "a b c d"), (2, "p q r s"), (3, "hi")])
    kept = sorted(
        r["doc_id"]
        for r in decontaminate(corpus, bench, threshold=0.5).collect()
    )
    # doc 1 is fully contaminated; doc 3 has <3 tokens (no shingles,
    # cannot be contaminated) and must survive
    assert kept == [2, 3]


# ------------------------------------------------------- temperature mixing

def test_temperature_mix_flattens_toward_sqrt(spark):
    # two domains, 900 vs 100 rows; α=0.5 targets ∝ 30:10, so at
    # frac=0.5 the small domain should be kept ~100% (p=1 capped at
    # 500·(10/40)/100 = 1.25 → 1) and the big one at ~500·0.75/900≈0.42
    rows = [Row(k=i, d="big") for i in range(900)] + [
        Row(k=10_000 + i, d="small") for i in range(100)
    ]
    df = spark.createDataFrame(rows)
    out = temperature_mix(df, "d", "k", sample_frac=0.5)
    counts = {r["d"]: r["n"] for r in
              out.groupBy("d").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["small"] == 100  # p capped at 1 → everything kept
    # big domain: expected ~375/900; hash noise is a few percent
    assert 300 < counts["big"] < 450


def test_temperature_mix_deterministic_and_stable_under_repartition(spark):
    rows = [Row(k=i, d=f"d{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows)
    a = sorted(r["k"] for r in temperature_mix(df, "d", "k").collect())
    b = sorted(
        r["k"]
        for r in temperature_mix(df.repartition(7), "d", "k").collect()
    )
    assert a == b and len(a) > 0


def test_hash_bucket_matches_duckdb():
    import duckdb

    from hypertension_dashboard_pipeline_spark.session import build_session

    spark = build_session(app_name="hb", shuffle_partitions=2)
    df = spark.createDataFrame([Row(k=i) for i in range(50)])
    got = {
        r["k"]: r["b"]
        for r in df.select("k", hash_bucket("k", 97).alias("b")).collect()
    }
    want = dict(
        duckdb.sql(
            "SELECT i, ('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 8))"
            "::BIGINT % 97 FROM range(50) t(i)"
        ).fetchall()
    )
    assert got == want


# ------------------------------------------------------------- merge upsert

def test_merge_upsert_update_insert_passthrough(spark):
    target = spark.createDataFrame(
        [Row(k=1, v="t1"), Row(k=2, v="t2"), Row(k=3, v="t3")]
    )
    source = spark.createDataFrame([Row(k=2, v="s2"), Row(k=9, v="s9")])
    got = {r["k"]: r["v"] for r in merge_upsert(target, source, ["k"]).collect()}
    assert got == {1: "t1", 2: "s2", 3: "t3", 9: "s9"}


def test_merge_upsert_version_col_keeps_newer_target(spark):
    target = spark.createDataFrame([Row(k=1, v="new", ver=5)])
    source = spark.createDataFrame([Row(k=1, v="stale", ver=3)])
    got = merge_upsert(target, source, ["k"], version_col="ver").collect()
    assert len(got) == 1 and got[0]["v"] == "new"


def test_merge_upsert_rejects_mismatched_columns(spark):
    target = spark.createDataFrame([Row(k=1, v="a")])
    source = spark.createDataFrame([Row(k=1, other="b")])
    with pytest.raises(ValueError, match="identical column sets"):
        merge_upsert(target, source, ["k"])


# --------------------------------------------------------------- fuzzy join

def test_fuzzy_join_within_distance_and_blocking_limits(spark):
    a = spark.createDataFrame(
        [Row(name="chocolate lace"), Row(name="goldenrod mint")]
    )
    b = spark.createDataFrame(
        [
            Row(name="chocolate lace"),   # dist 0
            Row(name="chocolate lame"),   # dist 1
            Row(name="goldenrod mints"),  # dist 1
            Row(name="Xhocolate lace"),   # dist 1 but first char differs
            Row(name="chocolate"),        # dist 5 — over the band
        ]
    )
    got = sorted(
        (r["s_left"], r["s_right"], r["dist"])
        for r in fuzzy_join_blocked(a, b, "name", "name", max_dist=2).collect()
    )
    assert got == [
        ("chocolate lace", "chocolate lace", 0),
        ("chocolate lace", "chocolate lame", 1),
        ("goldenrod mint", "goldenrod mints", 1),
    ]
    # the blocking miss ("Xhocolate...") is the documented recall trade


# ----------------------------------------------------------------- semdedup

def _vec(theta: float) -> list[float]:
    return [math.cos(theta), math.sin(theta)]


def test_semdedup_greedy_by_id_within_cluster(spark):
    # cluster 0: ids 1,2 nearly parallel (cos≈1) → 2 dropped;
    # id 3 orthogonal → kept.  cluster 1: id 4 parallel to id 1 but in
    # another cluster → kept (no cross-cluster comparison).
    rows = [
        Row(vec_id=1, label=0, embedding=_vec(0.00)),
        Row(vec_id=2, label=0, embedding=_vec(0.01)),
        Row(vec_id=3, label=0, embedding=_vec(math.pi / 2)),
        Row(vec_id=4, label=1, embedding=_vec(0.0)),
    ]
    df = spark.createDataFrame(rows)
    kept = sorted(r["vec_id"] for r in
                  semdedup_survivors(df, threshold=0.95).collect())
    assert kept == [1, 3, 4]


# ------------------------------------------------------ grouped topk partial

def test_grouped_topk_partial_matches_window_semantics(spark):
    import random

    rng = random.Random(7)
    rows = [
        Row(g=f"g{i % 5}", score=rng.random(), rid=i) for i in range(500)
    ]
    df = spark.createDataFrame(rows).repartition(13)

    from hypertension_dashboard_pipeline_spark.operators.windows import (
        grouped_topk_partial,
    )

    got = sorted(
        (r["g"], r["rank"], r["rid"])
        for r in grouped_topk_partial(df, ["g"], "score", "rid", k=7).collect()
    )
    # reference: plain python per-group sort
    by_g: dict[str, list[Row]] = {}
    for r in rows:
        by_g.setdefault(r.g, []).append(r)
    want = sorted(
        (g, rank + 1, r.rid)
        for g, items in by_g.items()
        for rank, r in enumerate(
            sorted(items, key=lambda r: (-r.score, r.rid))[:7]
        )
    )
    assert got == want


def test_grouped_topk_partial_ascending_and_short_groups(spark):
    df = spark.createDataFrame(
        [Row(g="a", score=3.0, rid=1), Row(g="a", score=1.0, rid=2),
         Row(g="b", score=9.0, rid=3)]
    )
    from hypertension_dashboard_pipeline_spark.operators.windows import (
        grouped_topk_partial,
    )

    got = sorted(
        (r["g"], r["rank"], r["rid"])
        for r in grouped_topk_partial(
            df, ["g"], "score", "rid", k=5, ascending=True
        ).collect()
    )
    # groups smaller than k emit all rows, ranked ascending by score
    assert got == [("a", 1, 2), ("a", 2, 1), ("b", 1, 3)]

"""Bloom-prefiltered incremental ingest: the filter's probabilistic
contract (no false negatives, bounded false positives) and the
wrapper's exact equivalence to the anti-join path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark.io import load_table
from hypertension_dashboard_pipeline_spark.operators import dedup as dd


@pytest.fixture(scope="module")
def digests(spark):
    return spark.createDataFrame(
        [(f"digest_{i}",) for i in range(2000)], "fp string"
    )


def test_bloom_no_false_negatives(spark, digests):
    """Every digest the bitmap was built over MUST probe positive."""
    bitmap = dd.bloom_bitmap(digests, "fp", m_bits=1 << 16, k=5)
    dec = dd.bloom_maybe_contains(bitmap, digests, "fp",
                                  m_bits=1 << 16, k=5).collect()
    assert len(dec) == 2000
    assert all(r["maybe_in_corpus"] for r in dec)


def test_bloom_false_positive_rate_bounded(spark, digests):
    """Disjoint digests must be mostly definite-negatives; at
    m=2^16 bits / n=2000 / k=5 the theoretical fp rate is ~1e-4."""
    bitmap = dd.bloom_bitmap(digests, "fp", m_bits=1 << 16, k=5)
    other = spark.createDataFrame(
        [(f"absent_{i}",) for i in range(2000)], "fp string"
    )
    dec = dd.bloom_maybe_contains(bitmap, other, "fp",
                                  m_bits=1 << 16, k=5).collect()
    fp = sum(1 for r in dec if r["maybe_in_corpus"])
    assert fp <= 40  # 2% — two orders of magnitude of slack


def test_bloom_ingest_equals_exact_ingest(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    incoming = docs.select(
        (F.col("doc_id") + 500_000).alias("doc_id"),
        F.when(F.col("doc_id") % 2 == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" x"), F.col("doc_id")))
        .alias("text"),
    )
    exact = sorted(
        (r["doc_id"], r["text"])
        for r in dd.incremental_ingest(docs, incoming).collect()
    )
    bloom = sorted(
        (r["doc_id"], r["text"])
        for r in dd.incremental_ingest_bloom(docs, incoming).collect()
    )
    assert bloom == exact and len(bloom) > 0


def test_bloom_ingest_null_text_matches_exact_path(spark):
    """Null-fingerprint rows must get the SAME treatment as the exact
    path gives them (the oracle-pinned contract: they survive the
    anti-join but drop at the survivor semi-join, whose null key
    matches nothing) — the Bloom shortcut must not resurrect them."""
    corpus = spark.createDataFrame(
        [(1, "alpha"), (2, None)], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [(10, None), (11, None), (12, "alpha"), (13, "beta")],
        "doc_id long, text string",
    )
    exact = sorted(
        r["doc_id"] for r in dd.incremental_ingest(corpus, incoming).collect()
    )
    bloom = sorted(
        r["doc_id"]
        for r in dd.incremental_ingest_bloom(corpus, incoming).collect()
    )
    assert bloom == exact == [13]


def test_bloom_bitmap_is_bounded_and_plan_jvm_side(spark, digests):
    bitmap = dd.bloom_bitmap(digests, "fp", m_bits=1 << 16, k=5)
    assert bitmap.count() <= (1 << 16) // 64
    plan = bitmap._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bloom_probe_plan_broadcasts_bitmap(spark, digests):
    """The probe side must join against a BROADCAST bitmap — nothing
    corpus-sized may shuffle to decide maybe/definitely-new."""
    bitmap = dd.bloom_bitmap(digests, "fp", m_bits=1 << 16, k=5)
    dec = dd.bloom_maybe_contains(bitmap, digests, "fp",
                                  m_bits=1 << 16, k=5)
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan

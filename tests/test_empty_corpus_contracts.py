"""Pins the r9 empty-corpus contracts: the last three queries the r8
empty-table sweep flagged (scripts/crash_sweep.py triage) must run
CLEAN on a fully empty documents table —

* text_bm25_topk: the driver-side corpus-stats splice bails to the
  TYPED empty result instead of dividing None (the
  mergeable_quantile_profile empty-input contract);
* text_retrieval_ndcg: degrades through the bm25 bail to a single
  all-NULL/zero metrics row (agg-without-groupBy always emits one);
* curation_attrition_funnel: both stage ratios are when-guarded, so a
  zero denominator yields NULL, never DIVIDE_BY_ZERO.

These are unit pins; scripts/crash_sweep.py re-runs the same contract
across every registered query each round (its KNOWN_EMPTY_LIMITS
allowlist is now empty).
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hypertension_dashboard_pipeline_spark import registry

registry.load_all()

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_docs_dir() -> str:
    root = tempfile.mkdtemp(prefix="empty_docs_")
    for t in ("region nation customer supplier part orders lineitem "
              "events embeddings").split():
        os.symlink(f"{SF_SMOKE}/{t}.parquet", f"{root}/{t}.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "source": pa.array([], pa.string()),
            "n_chars": pa.array([], pa.int64()),
        }),
        f"{root}/documents.parquet",
    )
    return root


def test_bm25_topk_empty_corpus_returns_typed_empty(spark, empty_docs_dir):
    out = registry.QUERIES["text_bm25_topk"](spark, empty_docs_dir)
    assert out.columns == ["doc_id", "bm25"]
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "double",
    ]
    assert out.collect() == []


def test_retrieval_ndcg_empty_corpus_emits_null_metrics(
    spark, empty_docs_dir
):
    rows = registry.QUERIES["text_retrieval_ndcg"](
        spark, empty_docs_dir
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_hit_topk is None or r.n_hit_topk == 0
    assert r.dcg_at_10 == 0.0
    assert r.ndcg_at_10 is None  # idcg == 0 -> guarded NULL


def test_attrition_funnel_empty_corpus_yields_null_ratios(
    spark, empty_docs_dir
):
    rows = registry.QUERIES["curation_attrition_funnel"](
        spark, empty_docs_dir
    ).collect()
    assert [r.stage for r in sorted(rows, key=lambda r: r.stage_idx)] == [
        "raw", "lang_en", "quality", "exact_dedup", "near_dup",
    ]
    for r in rows:
        assert r.n_docs == 0
        assert r.pct_of_raw is None
        assert r.pct_of_prev is None

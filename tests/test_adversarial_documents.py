"""Adversarial-data parity for the documents-reading window queries —
the text/dedup counterpart of test_adversarial_events.py.

The rebuilt documents table contains the shapes a regenerated corpus
could legally produce but the current one does not: empty and
whitespace-only texts, single tokens, exact duplicates, one-char
near-duplicates, a hot-shingle mega-doc (max_df guard stress), heavy
unicode, regex metacharacters, and repeated-punctuation runs.  Every
documents-reading window query must still match its DuckDB oracle
bit-for-bit.
"""

from __future__ import annotations

import os
import random

import duckdb
import pytest

from hypertension_dashboard_pipeline_spark import registry

from test_driver_parity import TABLES, _canon

registry.load_all()

DOCS_QUERIES = [
    "curation_pipeline",
    "dedup_components",
    "dedup_simhash_groups",
    "dedup_quality_survivor",
    "text_lm_bigram_score",
    "text_segment_boilerplate",
    "sample_weighted_topk",
    "sample_global_shuffle",
    "text_tfidf_top_terms",
    "sample_global_index",
    "dedup_prefix_filter_pairs",
    "dedup_duplicate_spans",
    "text_vocab_encode",
    "dedup_span_coverage",
    "text_feature_hashing",
    # r7 wave-3+ debuts over documents
    "dedup_winnow_pairs",
    "text_tfidf_cosine_pairs",
    "curation_dsir_weights",
    "text_bpe_train",
    "text_bpe_encode",
    # wave-10 debuts over documents
    "dedup_cluster_size_profile",
    "curation_mixture_report",
    "dedup_lsh_recall",
    "text_retrieval_ndcg",
    "curation_attrition_funnel",
    "curation_budget_select",
    "curation_dsir_sample",
    "dedup_minhash_calibration",
    # r8 debuts over documents: the HLL overlap must hold its
    # within-bounds contract on empty/whitespace/sub-3-token docs
    # (sources can lose every shingle); the packer must bin the
    # empty-text zero-token rows without emitting phantom bins
    "dedup_corpus_overlap_hll",
    "curation_pack_efficiency",
    # late-r8 parity-sweep find: zero-token documents produced NULL
    # chunk text in the oracle vs '' from the operator — pinned here
    "text_chunk_documents",
]

_WORDS = ("the fast key order sort table scan merge part window small hash "
          "join batch stream spark data query row filter customer line value "
          "agg column big slow vector a dup").split()


def _build_adv_docs(path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(99)
    texts: list[str | None] = []
    # pathological shapes
    texts += [
        "",                      # empty
        "   ",                   # whitespace only
        "word",                  # single token
        "x",                     # single char
        "!!! ??? ... ;;; :::",   # punctuation-only tokens
        ".*+?[](){}|\\^$ the .*+?[](){}|\\^$",  # regex metacharacters
        "café naïve 中文文本 \U0001f600 "
        "über straße",  # unicode incl. emoji
        "the " * 500,            # one hot shingle repeated (max_df stress)
        " ".join(rng.choice(_WORDS) for _ in range(2000)),  # mega doc
    ]
    # exact duplicate families (3 copies each) + one-char near dups
    for fam in range(5):
        base = " ".join(rng.choice(_WORDS) for _ in range(40))
        texts += [base, base, base]
        texts.append(base + " x")
        texts.append(base.replace("the", "thx", 1))
    # normal mass so corpus stats (df counts, LM counts) have bulk
    for _ in range(300):
        texts.append(
            " ".join(rng.choice(_WORDS) for _ in range(rng.randint(5, 80)))
        )
    langs = ["en", "es", "zh", "de", "fr"]
    srcs = ["src0", "src1", "src2"]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(
            [langs[i % len(langs)] for i in range(len(texts))], pa.string()
        ),
        "source": pa.array(
            [srcs[i % len(srcs)] for i in range(len(texts))], pa.string()
        ),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, path)


@pytest.fixture(scope="module")
def advdoc_dir(tmp_path_factory, sf_smoke):
    root = tmp_path_factory.mktemp("adv_docs")
    for t in TABLES:
        if t != "documents":
            os.symlink(f"{sf_smoke}/{t}.parquet", root / f"{t}.parquet")
    _build_adv_docs(str(root / "documents.parquet"))
    return str(root)


@pytest.fixture(scope="module")
def advdoc_duck(advdoc_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{advdoc_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", DOCS_QUERIES)
def test_docs_query_matches_oracle_on_adversarial_data(
    name, spark, advdoc_dir, advdoc_duck
):
    sdf = registry.QUERIES[name](spark, advdoc_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    duck_tbl = advdoc_duck.execute(registry.ORACLES[name]).arrow()
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

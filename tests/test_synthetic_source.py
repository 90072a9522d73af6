"""Custom Python DataSource (graftdocs, sources/synthetic.py):
partitioned parallel generation, determinism, and the injected
near-dup structure feeding the dedup family."""

from __future__ import annotations

from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark.sources.synthetic import (
    GraftDocsDataSource,
)


def _load(spark, **opts):
    spark.dataSource.register(GraftDocsDataSource)
    r = spark.read.format("graftdocs")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_partitioned_generation_and_schema(spark):
    df = _load(spark, n_docs=1000, partitions=8)
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 1000
    assert dict(df.dtypes) == {
        "doc_id": "bigint", "text": "string", "n_words": "int"
    }
    assert df.select(F.count_distinct("doc_id")).first()[0] == 1000


def test_content_is_deterministic_across_reads(spark):
    a = sorted(tuple(r) for r in _load(spark, n_docs=200, partitions=4).collect())
    b = sorted(tuple(r) for r in _load(spark, n_docs=200, partitions=7).collect())
    assert a == b  # partition layout never changes content


def test_injected_duplicates_are_exact_copies(spark):
    df = _load(spark, n_docs=100, partitions=2, dup_every=10)
    rows = {r.doc_id: r.text for r in df.collect()}
    for d in range(10, 100, 10):
        assert rows[d] == rows[d - 1]
    # non-multiples are distinct from their predecessors
    assert rows[5] != rows[4]


def test_feeds_exact_dedup_operator(spark):
    """The injected dup structure is visible to the dedup family: 9
    duplicate docs (10, 20, ..., 90 copy their predecessors) collapse."""
    df = _load(spark, n_docs=100, partitions=4, dup_every=10)
    assert df.select("text").distinct().count() == 100 - 9

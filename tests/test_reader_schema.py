"""The footer-sniffed explicit reader schema (io.footer_schema) must be
indistinguishable from Spark's own parquet schema inference — r13
optimization: load_table skips the per-call inference JOB, so this test
pins that the skipped job would have produced the identical schema."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from hypertension_dashboard_pipeline_spark.io import footer_schema, load_table
from hypertension_dashboard_pipeline_spark.schemas import TESTDATA_TABLES

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


@pytest.mark.parametrize("sf", SF_DIRS)
@pytest.mark.parametrize("name", [t for t in TESTDATA_TABLES if t != "events"])
def test_footer_schema_equals_inference(spark, sf, name):
    path = f"{sf}/{name}.parquet"
    inferred = spark.read.parquet(path).schema
    sniffed = footer_schema(path)
    assert sniffed is not None
    assert [(f.name, f.dataType) for f in sniffed.fields] == [
        (f.name, f.dataType) for f in inferred.fields
    ]


def test_load_table_rows_match_inference(spark):
    # value-level spot check at the smoke sf: explicit-schema read
    # returns exactly what the inference read returns
    for name in ("lineitem", "documents", "embeddings"):
        path = f"/root/testdata/sf0.001/{name}.parquet"
        a = load_table(spark, "/root/testdata/sf0.001", name).collect()
        b = spark.read.parquet(path).collect()
        assert a == b


def test_footer_schema_fallback_on_unknown_type(spark, tmp_path):
    # a map column is outside the bounded mapping: footer_schema must
    # return None (load_table then falls back to Spark inference)
    p = str(tmp_path / "maps.parquet")
    df = spark.createDataFrame(
        [(1, {"a": 1})],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("m", T.MapType(T.StringType(), T.IntegerType())),
            ]
        ),
    )
    df.write.parquet(p)
    assert footer_schema(p) is None
    # and the directory-shaped dataset path still sniffs normal types
    p2 = str(tmp_path / "plain.parquet")
    spark.range(3).write.parquet(p2)
    sch = footer_schema(p2)
    assert sch is not None and sch.fields[0].dataType == T.LongType()


def test_footer_schema_missing_path():
    assert footer_schema("/nonexistent/nope.parquet") is None

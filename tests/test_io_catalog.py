"""Source/sink and catalog coverage (reference S1-S7, SURVEY.md §2.1):
CSV round-trips with explicit schemas, Parquet checkpoints preserving
types, year-partitioned writes enabling partition pruning, catalog
introspection."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark import io as eio
from hypertension_dashboard_pipeline_spark import schemas as S
from hypertension_dashboard_pipeline_spark.schemas import TESTDATA_TABLES


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="spark_graft_io_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_csv_roundtrip_explicit_schema(spark, tmpdir):
    """S2+S3: the reference loses dates/flag types through CSV
    (3_blood_pressure.R:255-257); explicit schemas must not."""
    df = spark.createDataFrame(
        [("P01", dt.date(2023, 3, 1), 4152194, '"d"', 150.0, 8876, '"mmHg"')],
        S.MEASUREMENT,
    )
    eio.write_csv(df, f"{tmpdir}/m.csv")
    back = eio.read_csv(spark, f"{tmpdir}/m.csv", S.MEASUREMENT)
    assert back.schema == S.MEASUREMENT
    row = back.first()
    assert row["MEASUREMENT_DATE"] == dt.date(2023, 3, 1)  # still a date
    assert row["VALUE_AS_NUMBER"] == 150.0                 # still a double


def test_parquet_checkpoint_preserves_schema(spark, tmpdir):
    df = spark.createDataFrame(
        [("P01", dt.date(2023, 3, 1), 4152194, '"d"', 150.0, 8876, '"mmHg"')],
        S.MEASUREMENT,
    )
    back = eio.checkpoint(df, f"{tmpdir}/ckpt")
    assert back.schema == S.MEASUREMENT
    assert back.count() == 1


def test_year_partitioned_write_prunes(spark, tmpdir):
    df = spark.createDataFrame(
        [
            ("P01", dt.date(2022, 1, 1), 1, '"d"', 1.0, 8876, '"u"'),
            ("P02", dt.date(2023, 1, 1), 1, '"d"', 2.0, 8876, '"u"'),
        ],
        S.MEASUREMENT,
    )
    eio.write_partitioned(df, f"{tmpdir}/part", "MEASUREMENT_DATE")
    back = spark.read.parquet(f"{tmpdir}/part")
    pruned = back.filter(F.col("year") == 2023)
    assert pruned.count() == 1
    # the year filter must be a partition filter, not a data filter
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(year" in plan


def test_catalog_introspection(spark, sf_smoke):
    """S6: odbcListObjects/odbcListColumns equivalents."""
    eio.register_views(spark, sf_smoke, TESTDATA_TABLES)
    names = {t.name for t in spark.catalog.listTables()}
    assert set(TESTDATA_TABLES) <= names
    cols = [c.name for c in spark.catalog.listColumns("customer")]
    assert cols == ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                    "c_mktsegment"]


# ------------------------------------------------------------- JDBC (S1)


def test_jdbc_scan_options_parallel_read():
    """The warehouse-scan adapter must emit a range-partitioned read
    (one query per partition), never a single-task scan, when bounds
    are given — and carry fetchsize + driver properties through."""
    opts = eio.jdbc_scan_options(
        "jdbc:postgresql://wh:5432/omop", "person",
        partition_column="person_id", lower_bound=0,
        upper_bound=12_000_000, num_partitions=64,
        properties={"user": "svc", "driver": "org.postgresql.Driver"},
    )
    assert opts["partitionColumn"] == "person_id"
    assert (opts["lowerBound"], opts["upperBound"]) == ("0", "12000000")
    assert opts["numPartitions"] == "64"
    assert opts["fetchsize"] == "10000"
    assert opts["driver"] == "org.postgresql.Driver"
    # subquery pushdown shape: dbtable may be a parenthesized subquery
    sub = eio.jdbc_scan_options(
        "jdbc:postgresql://wh:5432/omop",
        "(SELECT person_id FROM person WHERE year_of_birth <= 2005) t",
    )
    assert sub["dbtable"].startswith("(SELECT")


def test_jdbc_scan_options_validation(spark):
    with pytest.raises(ValueError, match="requires.*upper_bound"):
        eio.jdbc_scan_options("jdbc:x", "t", partition_column="id",
                              lower_bound=0, num_partitions=4)
    with pytest.raises(ValueError, match="not both"):
        eio.read_jdbc(spark, "jdbc:x", "t", partition_column="id",
                      lower_bound=0, upper_bound=1, num_partitions=1,
                      predicates=["state = 'GA'"])


def test_jsonl_roundtrip_documents(spark, sf_smoke, tmpdir):
    """JSONL interchange: write the documents table as gzip JSONL, read
    it back with the explicit schema — types and values must survive
    (incl. text containing quotes/newlines, which JSON escapes)."""
    docs = eio.load_table(spark, sf_smoke, "documents")
    path = f"{tmpdir}/docs_jsonl"
    eio.write_jsonl(docs, path)
    back = eio.read_jsonl(spark, path, S.DOCUMENTS)
    assert back.schema == docs.select(*back.columns).schema
    a = sorted(docs.collect(), key=lambda r: r["doc_id"])
    b = sorted(back.collect(), key=lambda r: r["doc_id"])
    assert a == b


def test_jsonl_corrupt_line_lands_in_corrupt_record(spark, tmpdir):
    """PERMISSIVE contract: a malformed line must not kill the scan
    when the schema declares _corrupt_record."""
    import pathlib

    p = pathlib.Path(tmpdir) / "mixed.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\n{not json at all\n')
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    rows = eio.read_jsonl(spark, str(p), schema).collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 1 and good[0]["doc_id"] == 1
    assert len(bad) == 1


def test_orc_roundtrip_preserves_types(spark, sf_smoke, tmpdir):
    """ORC interchange: schema- and value-exact round-trip, including
    the timestamp column (normalized by load_table)."""
    ev = eio.load_table(spark, sf_smoke, "events")
    path = f"{tmpdir}/events_orc"
    eio.write_orc(ev, path)
    back = eio.read_orc(spark, path)
    assert back.schema == ev.schema
    assert back.count() == ev.count()
    a = sorted(ev.limit(50).collect(), key=lambda r: r["event_id"])
    ids = [r["event_id"] for r in a]
    b = sorted(
        back.filter(F.col("event_id").isin(ids)).collect(),
        key=lambda r: r["event_id"],
    )
    assert a == b


def test_compact_parquet_merges_small_files(spark, sf_smoke, tmpdir):
    """Many tiny files in, few right-sized files out, content equal."""
    ev = eio.load_table(spark, sf_smoke, "events")
    src = f"{tmpdir}/shattered"
    dst = f"{tmpdir}/compacted"
    ev.repartition(32).write.parquet(src)

    import glob

    assert len(glob.glob(f"{src}/*.parquet")) == 32
    n = eio.compact_parquet(spark, src, dst, target_file_mb=128)
    out_files = glob.glob(f"{dst}/*.parquet")
    assert len(out_files) == n == 1  # sf0.001 events ≪ 128 MB
    back = spark.read.parquet(dst)
    assert back.count() == ev.count()
    assert sorted(back.columns) == sorted(ev.columns)

    import pytest

    with pytest.raises(ValueError, match="dst must differ"):
        eio.compact_parquet(spark, src, src)


def test_read_parquet_evolving_null_fills_added_columns(spark, tmp_path):
    """Append-only schema evolution: files written before a column
    existed surface it as NULL under mergeSchema; the merged schema is
    the union of every file's."""
    from hypertension_dashboard_pipeline_spark.io import read_parquet_evolving

    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], "id bigint, name string")
    v1.write.mode("overwrite").parquet(path)
    v2 = spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, name string, score double"
    )
    v2.write.mode("append").parquet(path)

    got = read_parquet_evolving(spark, path)
    assert set(got.columns) == {"id", "name", "score"}
    rows = {r["id"]: r for r in got.collect()}
    assert rows[1]["score"] is None   # pre-evolution file null-fills
    assert rows[2]["score"] == 9.5


def test_observation_metrics_ride_the_flagship_plan(spark, sf_dir):
    """Production observability: pipeline health metrics (row counts,
    null rates) collected with the Observation API ride the SAME job
    as the query — no second scan, unlike a separate .count() audit.
    The reference logs stage counts by re-running stages
    (2_data_importing_cleaning.R's nrow() checkpoints); observe() is
    the zero-cost Spark twin."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from hypertension_dashboard_pipeline_spark.io import load_table

    obs = Observation("orders_health")
    orders = load_table(spark, sf_dir, "orders").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").isNull().cast("int")).alias("null_price"),
    )
    result = orders.groupBy("o_orderstatus").count().collect()
    assert len(result) > 0
    metrics = obs.get
    assert metrics["n_rows"] == load_table(spark, sf_dir, "orders").count()
    assert metrics["null_price"] == 0

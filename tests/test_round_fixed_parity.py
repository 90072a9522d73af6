"""Cross-engine contract of ``functions.expressions.round_fixed``.

The engine-safe rounding convention is floor(x*10^d + 0.5)/10^d
computed as pure IEEE double arithmetic on BOTH engines.  This test
feeds the same hostile doubles to Spark's ``round_fixed`` and DuckDB's
literal ``FLOOR(x*10^d + 0.5)/10^d`` and asserts bit-identical results,
including the non-finite passthrough (±Inf/NaN must NOT collapse to
NaN on one side only — pmod(inf, 1.0) is NaN in Spark while DuckDB's
FLOOR is the identity on non-finite input) and the finite-overflow
regime where x*10^d saturates to ±Inf on both engines.
"""

from __future__ import annotations

import math
import struct

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from hypertension_dashboard_pipeline_spark.functions.expressions import round_fixed

HOSTILE = [
    float("inf"),
    float("-inf"),
    float("nan"),
    None,
    0.0,
    -0.0,
    # finite but overflows at *10^4: both engines must ride the Inf
    1.0e306,
    -1.0e306,
    1.7976931348623157e308,  # DBL_MAX
    # 2^53 integrality boundary
    9007199254740992.0,
    9007199254740993.0,  # not representable; rounds to 2^53
    -9007199254740992.0,
    # Long.MAX clamp regime the pmod form exists for
    1.0e60,
    -1.0e60,
    # representation-boundary midpoints (the F.round failure class)
    38.37874999999999,
    0.00005,
    -0.00005,
    2.5e-5,
    # halves (floor form rounds toward +inf on negatives, both engines)
    0.12345,
    -0.12345,
    1.00005,
    -1.00005,
    # denormals
    5e-324,
    -5e-324,
    2.2250738585072014e-308,
    # ordinary values
    123.456789,
    -987.654321,
    0.1,
    -0.1,
]


def _bits(x):
    if x is None:
        return "NULL"
    return struct.pack("<d", x).hex()


@pytest.mark.parametrize("digits", [0, 1, 4, 6])
def test_round_fixed_bit_identical_to_duckdb_floor_form(spark, digits):
    rows = [(float(v),) if v is not None else (None,) for v in HOSTILE]
    schema = StructType([StructField("x", DoubleType(), True)])
    df = spark.createDataFrame(rows, schema).select(
        round_fixed(F.col("x"), digits).alias("r")
    )
    got = [r["r"] for r in df.collect()]

    con = duckdb.connect()
    p = float(10**digits)
    want = []
    for v in HOSTILE:
        (w,) = con.execute(
            f"SELECT FLOOR(CAST(? AS DOUBLE) * {p!r} + 0.5) / {p!r}", [v]
        ).fetchone()
        want.append(w)

    for v, g, w in zip(HOSTILE, got, want):
        if w is None or g is None:
            assert g is None and w is None, (v, g, w)
        elif math.isnan(w):
            assert math.isnan(g), (v, g, w)
        else:
            assert _bits(g) == _bits(w), (v, g, w)


def test_round_fixed_nonfinite_passthrough(spark):
    rows = [(float("inf"),), (float("-inf"),), (float("nan"),)]
    schema = StructType([StructField("x", DoubleType(), True)])
    out = [
        r["r"]
        for r in spark.createDataFrame(rows, schema)
        .select(round_fixed("x", 4).alias("r"))
        .collect()
    ]
    assert out[0] == float("inf")
    assert out[1] == float("-inf")
    assert math.isnan(out[2])

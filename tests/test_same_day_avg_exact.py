"""Property tests for ``same_day_avg_exact`` — the pre-built half-even
escape hatch (SURVEY.md round-boundary step 4).

Three contracts:

1. On INTEGER-valued corpora it is bit-identical to the shipping
   ``same_day_avg`` (bround) path — so switching is a no-op on the
   current testdata.
2. On 1-2dp FRACTIONAL corpora it equals ``fractions.Fraction`` ground
   truth (true half-even of the exact rational mean) — the regime
   where the bround path loses its structural-safety argument.
3. The DuckDB mirror of the same integer expression is bit-identical —
   the cross-engine guarantee that makes it oracle-safe.
"""

from __future__ import annotations

import struct
from fractions import Fraction

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark.operators.aggregates import (
    same_day_avg,
    same_day_avg_exact,
)


def _ref_half_even(ms: list[int], k: int, s: int) -> float:
    """Ground truth: half-even rounding of the exact rational mean of
    m_i/10^k at s digits, via Fraction."""
    mean = Fraction(sum(ms), len(ms) * 10**k)
    scaled = mean * 10**s
    q, r = divmod(scaled.numerator, scaled.denominator)  # floor division
    half = Fraction(r, scaled.denominator)
    if half > Fraction(1, 2) or (half == Fraction(1, 2) and q % 2 == 1):
        q += 1
    return q / float(10**s)


def _mk_df(spark, groups: list[list[int]], k: int):
    rows = []
    for gi, ms in enumerate(groups):
        for m in ms:
            rows.append((gi, "2024-01-01", m / 10**k))
    return spark.createDataFrame(rows, "key INT, day STRING, v DOUBLE")


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    groups=st.lists(
        st.lists(st.integers(min_value=0, max_value=300), min_size=1,
                 max_size=7),
        min_size=1, max_size=5,
    )
)
def test_integer_corpus_matches_bround_path(spark, groups):
    df = _mk_df(spark, groups, k=0)
    a = same_day_avg(df, "key", "day", "v", out_col="avg", scale=1)
    b = same_day_avg_exact(df, "key", "day", "v", out_col="avg", scale=1,
                           input_scale=0)
    ra = {r["key"]: r["avg"] for r in a.collect()}
    rb = {r["key"]: r["avg"] for r in b.collect()}
    assert ra.keys() == rb.keys()
    for key in ra:
        assert struct.pack("<d", ra[key]) == struct.pack("<d", rb[key]), (
            key, ra[key], rb[key]
        )


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    groups=st.lists(
        st.lists(st.integers(min_value=0, max_value=30000), min_size=1,
                 max_size=7),
        min_size=1, max_size=5,
    ),
    k=st.sampled_from([1, 2]),
)
def test_fractional_corpus_matches_fraction_ground_truth(spark, groups, k):
    df = _mk_df(spark, groups, k=k)
    out = same_day_avg_exact(df, "key", "day", "v", out_col="avg", scale=1,
                             input_scale=k)
    got = {r["key"]: r["avg"] for r in out.collect()}
    for gi, ms in enumerate(groups):
        want = _ref_half_even(ms, k, s=1)
        assert struct.pack("<d", got[gi]) == struct.pack("<d", want), (
            gi, ms, got[gi], want
        )


def test_duckdb_mirror_bit_identical(spark):
    # the hostile shapes: exact 1dp midpoints at n in {2,4}, near-misses
    # at n in {3,5,6,7}, and 2dp inputs whose doubled sum parity flips
    # the tie direction
    groups = [
        [105, 115],          # mean 1.10 at k=2 -> midpoint .x? exercises q parity
        [25, 25, 35],        # k=1
        [1, 2],              # k=0: 1.5 -> ties to even
        [3, 4, 5, 6],        # 4.5 -> ties to 4
        [12345, 67891, 11],  # arbitrary
    ]
    k, s = 2, 1
    df = _mk_df(spark, groups, k=k)
    out = same_day_avg_exact(df, "key", "day", "v", out_col="avg", scale=s,
                             input_scale=k)
    got = {r["key"]: r["avg"] for r in out.collect()}

    con = duckdb.connect()
    rows = [(gi, m / 10**k) for gi, ms in enumerate(groups) for m in ms]
    con.execute("CREATE TABLE t (key INT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql = f"""
    WITH g AS (
        SELECT key,
               SUM(CAST(round(v * {10**k}) AS BIGINT)) AS S,
               COUNT(*) AS n
        FROM t GROUP BY key
    )
    SELECT key,
           CAST(CASE WHEN SIGN(S) >= 0 THEN 1 ELSE -1 END
                * ((ABS(S) * {10**s}) // (n * {10**k})
                   + CASE WHEN 2 * ((ABS(S) * {10**s}) % (n * {10**k}))
                              > n * {10**k}
                          OR (2 * ((ABS(S) * {10**s}) % (n * {10**k}))
                              = n * {10**k}
                              AND ((ABS(S) * {10**s}) // (n * {10**k})) % 2
                                  = 1)
                          THEN 1 ELSE 0 END)
                AS DOUBLE) / {float(10**s)!r} AS avg
    FROM g
    """
    for key, want in con.execute(sql).fetchall():
        assert struct.pack("<d", got[key]) == struct.pack("<d", want), (
            key, got[key], want
        )


def test_all_null_group_returns_null(spark):
    df = spark.createDataFrame(
        [(0, "2024-01-01", None), (0, "2024-01-01", None)],
        "key INT, day STRING, v DOUBLE",
    )
    out = same_day_avg_exact(df, "key", "day", "v", out_col="avg")
    assert out.collect()[0]["avg"] is None

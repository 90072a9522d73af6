"""Query registry: named operator queries + their DuckDB oracle SQL.

Each implemented operator from SURVEY.md §2 registers a callable
``(spark, sf_dir) -> DataFrame`` and (where SQL-expressible) an
equivalent ANSI-SQL oracle string that DuckDB runs on the same parquet
tables. The driver compares the two (row count + schema + order-
insensitive value hash), so:

* every computed column is aliased identically on both sides;
* every query is **deterministic**: explicit total orders for any
  top-k/dedup, and float aggregates either exact (integer-valued sums)
  or rounded well away from representability boundaries;
* half-even rounding pairs Spark ``bround`` with DuckDB ``round_even``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks a non-SQL-expressible op
    (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from . import queries_core  # noqa: F401
    from . import queries_ext  # noqa: F401

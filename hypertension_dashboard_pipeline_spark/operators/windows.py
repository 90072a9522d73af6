"""Window / per-group ordered operators (reference W1, L3, SURVEY.md §2.5).

The reference's entire window surface is "latest record per patient"
(group_by + slice(which.max(date)), 3_blood_pressure.R:351-354). Two
implementations:

* ``latest_per_key`` — single-shuffle ``max(struct(order_cols...))``
  aggregation. Preferred at scale: it partial-aggregates map-side, so
  the shuffle carries one row per key per input partition instead of
  every row (a row_number window shuffles *all* rows, sorts them, and
  discards all but one per key).
* ``top_k_per_key`` — row_number window for k>1 or when the full row
  (not a fixed column set) must survive.

Both are deterministic given a total order (callers include a unique
tiebreak column).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame, key: str | Sequence[str],
                   order_cols: Sequence[str],
                   payload: Sequence[str]) -> DataFrame:
    """One row per key: the row with the max (order_cols...) tuple.

    ``order_cols`` must form a deterministic total order within a key
    (e.g. [date, unique_id]); ``payload`` columns are carried through.
    """
    keys = [key] if isinstance(key, str) else list(key)
    ordered = F.struct(*[F.col(c) for c in order_cols],
                       *[F.col(c) for c in payload])
    agg = df.groupBy(*keys).agg(F.max(ordered).alias("__top"))
    cols = [F.col(k) for k in keys]
    cols += [F.col(f"__top.{c}").alias(c) for c in order_cols]
    cols += [F.col(f"__top.{c}").alias(c) for c in payload]
    return agg.select(*cols)


def top_k_per_key(df: DataFrame, key: str | Sequence[str],
                  order_by: Sequence, k: int,
                  rank_col: str | None = None) -> DataFrame:
    """Top-k rows per key by an explicit (deterministic) ordering."""
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    if rank_col:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")

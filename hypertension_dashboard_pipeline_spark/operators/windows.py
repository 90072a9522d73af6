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


def sessionize(df: DataFrame, key: str, ts_col: str,
               gap_seconds: int = 1800) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event exceeds ``gap_seconds`` (beyond-reference extension:
    lag + running sum over one per-key window — a single shuffle, the
    batch analog of Spark's session_window).

    Timestamps compare at full microsecond precision (epoch-double
    arithmetic), never truncated to seconds.
    """
    w = Window.partitionBy(key).orderBy(ts_col)
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    running = Window.partitionBy(key).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("__new", new_session).withColumn(
        "session_id", F.sum("__new").over(running)
    ).drop("__new")


def session_stats(df: DataFrame, key: str, ts_col: str,
                  gap_seconds: int = 1800) -> DataFrame:
    """Per-key session summary: number of sessions and events."""
    s = sessionize(df, key, ts_col, gap_seconds)
    return s.groupBy(key).agg(
        F.max("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


def grouped_topk_partial(df: DataFrame, group_cols: list[str],
                         score_col: str, id_col: str, k: int = 10,
                         ascending: bool = False) -> DataFrame:
    """Top-k per group with MAP-SIDE TRUNCATION — the scale form of
    ``top_k_per_key`` for inputs too large to shuffle whole (e.g. a
    blown-up corpus × query-batch similarity intermediate).

    The naive window formulation shuffles EVERY row to its group's
    partition and sorts full groups.  This one is the SAME
    ``row_number() <= k`` plan — but Spark's rank-limit pushdown
    (``spark.sql.optimizer.windowGroupLimitThreshold``, default 1000
    ≥ any k used here) rewrites it into a **WindowGroupLimit
    Partial/Final pair**: the Partial node truncates each input
    partition to its per-group top-k BEFORE the exchange, entirely
    JVM-side, so the shuffle moves at most ``k · groups · partitions``
    rows instead of the full input.  Until r10 this helper hand-rolled
    the same bound as a ``mapInPandas`` per-Arrow-batch head — the r9
    tail-fold work showed the optimizer's pair makes that Python stage
    redundant and slower (−21% on the batch-ANN shape at sf0.1, and
    the executed plan carried BOTH truncations; SCALING.md r9/r10).
    The WindowGroupLimit node is plan-pinned for every caller in
    tests/test_plans.py.

    Ties break by ``id_col`` ascending, making rank deterministic and
    oracle-reproducible. Output: the input's three column groups plus
    ``rank`` (1-based).
    """
    gc = list(group_cols)
    narrow = df.select(*gc, score_col, id_col)
    order = [
        F.col(score_col).asc() if ascending else F.col(score_col).desc(),
        F.col(id_col).asc(),
    ]
    w = Window.partitionBy(*gc).orderBy(*order)
    return (
        narrow.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )

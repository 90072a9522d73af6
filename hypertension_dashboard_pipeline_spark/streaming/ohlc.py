"""Streaming OHLC resampling: the ``ts_resample_ohlc`` aggregation as
an incremental Structured Streaming job.

Open/close are struct-extremum aggregates — min/max over
``(ts, event_id, value)`` structs — which are associative and
commutative, so they fold incrementally in the window state store
exactly like plain min/max: each micro-batch merges its partial
extrema into the window's state, and the emitted row equals the batch
answer over the same closed window.  That mergeability is why the
struct-extremum formulation (one hash aggregation) was chosen for the
batch operator over the window-function form (FIRST_VALUE needs the
whole window sorted — not incrementally maintainable).

Determinism: same availableNow + watermark contract as
``daily_window`` — append mode emits exactly the (event_type, day)
windows whose end <= max(ts) - 1 day; the trailing day stays in state
on both the stream and the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import events_stream


def ohlc_daily(events: DataFrame) -> DataFrame:
    """The shared (batch == streaming) aggregation: per (event_type,
    tumbling 1-day window) open/high/low/close with (ts, event_id)
    tie-breaking — the same total order as the batch query."""
    o = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    return (
        events.withWatermark("ts", "1 day")
        .groupBy("event_type", F.window("ts", "1 day").alias("w"))
        .agg(
            F.min(o)["value"].alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(o)["value"].alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            F.col("w.start").cast("date").alias("day"),
            "open", "high", "low", "close", "n_events",
        )
    )


def run_available_now(spark: SparkSession, sf_dir: str,
                      name: str = "ohlc_stream") -> DataFrame:
    """Bounded availableNow run into a memory sink (production: live
    source + parquet/Delta sink)."""
    src = events_stream(spark, sf_dir)
    out = ohlc_daily(src)
    from .runner import run_bounded

    return run_bounded(spark, out, name)

"""Streaming variant of the same-day aggregation (reference A3).

The reference's same-day BP averaging (3_blood_pressure.R:168-174) as
an incremental Structured Streaming job: event-time tumbling windows
with a watermark for late data. Batch and streaming share the
aggregation semantics, so a backfill (batch over history) and the live
stream produce consistent numbers.

Determinism note: in append mode only windows the watermark has closed
are emitted, so with ``availableNow`` over a static file the output is
a deterministic prefix of the batch answer (final windows stay in
state) — the matching oracle encodes the same cutoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import events_stream


def daily_value_stats(events: DataFrame) -> DataFrame:
    """The shared (batch == streaming) aggregation: tumbling 1-day
    event-time windows over the value column."""
    from ..functions.expressions import round_fixed

    return (
        events.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # engine-safe floor rounding (round_fixed docstring): the
            # oracle pairs with FLOOR(avg * 1e4 + 0.5) / 1e4
            round_fixed(F.avg("value"), 4).alias("value_avg"),
        )
        .select(F.col("w.start").cast("date").alias("day"), "n_events", "value_avg")
    )


def run_available_now(spark: SparkSession, sf_dir: str,
                      name: str = "daily_window_stream") -> DataFrame:
    """Process the events table as a bounded stream (availableNow) into
    a memory sink and return the emitted rows.

    In production the source would be a live directory/Kafka stream and
    the sink a parquet/Delta table; memory sink keeps the test
    self-contained.
    """
    src = events_stream(spark, sf_dir)
    out = daily_value_stats(src)
    # windowed-agg state stores follow shuffle partitions — bounded
    # runs pin a small count (see runner.py)
    from .runner import run_bounded

    return run_bounded(spark, out, name)

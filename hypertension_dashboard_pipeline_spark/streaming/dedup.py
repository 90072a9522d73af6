"""Streaming deduplication (beyond-reference extension surface).

Exactly-once event delivery is the streaming face of the dedup family
(operators/dedup.py): at-least-once sources (Kafka retries, file
redeliveries) produce duplicate records, and a training-data ingest
pipeline must drop them before they reach the corpus.

``dropDuplicatesWithinWatermark`` keys state by the id columns and
expires it once the event-time watermark passes — bounded state, unlike
an unbounded batch ``distinct`` re-run per ingest. Each record is
emitted exactly once, on first arrival.

At scale: state is partitioned by key across executors (RocksDB state
store on a cluster); the watermark horizon bounds memory to one
retention window regardless of stream length.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import events_stream, load_table


def dedup_within_watermark(events: DataFrame, key_cols: list[str],
                           watermark: str = "2 days") -> DataFrame:
    """The shared dedup definition: one surviving row per key within
    the watermark horizon, emitted at first arrival."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream over the events table (ts normalized by the shared
    footer-sniffing source, io.events_stream)."""
    return events_stream(spark, sf_dir)


def run_stream_static_join(spark: SparkSession, sf_dir: str,
                           name: str = "enrich_stream") -> DataFrame:
    """Stream-static join: enrich the live event stream with a static
    dimension (per-user event-type profile computed from the batch
    table). The static side is re-planned per micro-batch against the
    stream — no state store involved, the standard dimension-enrich
    shape. With availableNow over the bounded source the result equals
    the batch join, which is the oracle."""
    stream = _events_stream(spark, sf_dir)
    # load_table, not a raw parquet read: ts normalization must match
    # the stream side (see io.events_read_plan).
    static_dim = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("user_n_events"))
    )
    out = stream.select("event_id", "user_id", "value").join(
        static_dim, "user_id"
    )
    ckpt = tempfile.mkdtemp(prefix="spark_graft_enrich_stream_")
    try:
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def run_available_now(spark: SparkSession, sf_dir: str,
                      name: str = "dedup_stream") -> DataFrame:
    """Dedup a deliberately-duplicated stream (the source unioned with
    itself — an at-least-once delivery simulation) down to one row per
    event_id. With the bounded source the emitted rows are exactly the
    distinct events, so the batch table itself is the oracle."""
    doubled = _events_stream(spark, sf_dir).unionByName(
        _events_stream(spark, sf_dir)
    )
    out = dedup_within_watermark(doubled, ["event_id"]).select(
        "event_id", "user_id", "event_type", "value"
    )
    # dropDuplicatesWithinWatermark keeps one state store per shuffle
    # partition — bounded runs pin a small count (see runner.py)
    from .runner import run_bounded

    return run_bounded(spark, out, name, ckpt_prefix="spark_graft_dedup_stream_")

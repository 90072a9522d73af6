"""Stream-stream interval join: view→purchase attribution.

The one Structured Streaming join shape the engine didn't yet cover:
joining two LIVE streams (not stream-static). Spark requires
watermarks on BOTH sides plus a time-range join condition so it can
bound the buffered state — views older than the attribution window
fall out of state instead of accumulating forever, which is what makes
the join runnable indefinitely at production rates.

Semantics: inner join view v ⋈ purchase p on user with
``v.ts <= p.ts < v.ts + horizon`` — every purchase is attributed to
every view in its lookback horizon (classic last/any-touch
attribution's superset; an aggregation downstream picks a policy).

Determinism: over a bounded availableNow run the source file arrives
in one microbatch, the watermark only advances AFTER it, and inner
joins emit on match rather than on watermark close — so the emitted
set equals the batch join exactly, which is what the oracle computes.
(Contrast streaming_daily_window, where append-mode aggregation holds
final windows back.)

Shuffle-partition sizing — do NOT cargo-cult the <=8 pin below to a
real cluster.  A stream-stream join keeps two keyed state stores per
shuffle partition, so for a BOUNDED test run the per-partition fixed
cost (store open/commit/snapshot) dominates and pinning partitions low
is a 4x win (9.5s -> 2.5s measured).  On a production cluster the
setting should instead track cluster size and sustained input rate:
partitions ~ total executor cores (state stores then spread one per
core, HDFS/RocksDB-backed), because there the bottleneck is per-
partition state VOLUME and rebalance time, not store count.  The pin
lives inside the bounded runners precisely so library callers
composing ``view_purchase_attribution`` into their own long-running
query inherit their session's own sizing.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import events_stream


def view_purchase_attribution(views: DataFrame, purchases: DataFrame,
                              horizon: str = "1 hour") -> DataFrame:
    """The shared (batch == streaming) join: purchases attributed to
    same-user views within ``horizon`` before the purchase."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    ).withWatermark("v_ts", "2 hours")
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", "2 hours")
    return v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") < F.col("v_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select(
        F.col("v_user").alias("user_id"), "view_id", "purchase_id",
        "v_ts", "p_ts",
    )


def run_attribution_available_now(spark: SparkSession, sf_dir: str,
                                  name: str = "stream_join_sink"
                                  ) -> DataFrame:
    """Run the attribution join over the events table as TWO bounded
    streams (filtered from one source) into a memory sink."""
    src = events_stream(spark, sf_dir)
    views = src.filter(F.col("event_type") == "view")
    purchases = src.filter(F.col("event_type") == "purchase")
    out = view_purchase_attribution(views, purchases)
    spark.catalog.dropTempView(name)
    ckpt = tempfile.mkdtemp(prefix="spark_graft_stream_")
    # A stream-stream join maintains TWO keyed state stores per shuffle
    # partition; under a default 200-partition session the fixed
    # state-store cost dwarfs this bounded run (and at production rates
    # you'd size partitions to throughput anyway).  Pin a bounded count
    # for the stream's lifetime — the setting binds at .start().
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(min(int(prev), 8))
        )
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
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)


def run_attribution_outer_available_now(spark: SparkSession, sf_dir: str,
                                        name: str = "stream_join_outer_sink"
                                        ) -> DataFrame:
    """LEFT OUTER variant: views with no in-horizon purchase emit a
    null-joined row — but only once the watermark proves no match can
    still arrive (state eviction), which is what makes outer
    stream-stream joins well-defined at all.

    Determinism over a bounded run: matched pairs emit in the data
    batch; unmatched views emit in the trailing no-data micro-batch
    (noDataMicroBatches, on by default) IF their whole match window
    sits below the final GLOBAL watermark.  Because the two watermarks
    attach AFTER the view/purchase filters and the default
    multipleWatermarkPolicy is ``min``, that global watermark is
    wm = LEAST(max view ts, max purchase ts) - 2h — NOT max(ts) over
    the whole source (at sf0.01 the two differ by ~half an hour).
    Views younger than wm stay in state when the query stops and do
    NOT emit — the same deterministic-prefix contract as
    streaming_daily_window, and exactly what the oracle's wm
    predicate encodes."""
    src = events_stream(spark, sf_dir)
    views = src.filter(F.col("event_type") == "view")
    purchases = src.filter(F.col("event_type") == "purchase")
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    ).withWatermark("v_ts", "2 hours")
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", "2 hours")
    out = v.join(
        p,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") < F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    ).select(
        F.col("v_user").alias("user_id"), "view_id", "purchase_id",
        "v_ts", "p_ts",
    )
    spark.catalog.dropTempView(name)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    ckpt = tempfile.mkdtemp(prefix="spark_graft_stream_")
    try:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(min(int(prev), 8))
        )
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
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)

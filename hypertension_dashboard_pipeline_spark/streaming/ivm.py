"""Streaming incremental-view maintenance: keep a materialized rollup
current from a stream without ever re-scanning history.

Pattern (the LSM-of-aggregate-states shape): each microbatch reduces
to a MERGEABLE partial rollup (count + exact DECIMAL sum per key,
``operators/analytics.partial_rollup``) appended to a partials store;
reads fold the partials with ``merge_rollups``.  Because the partials
are exact, the merged result is bit-identical to a full recompute no
matter how the stream was microbatched (split-invariance is
property-tested in tests/test_analytics.py) — so the oracle for the
streaming path IS the batch aggregation.

At 100 TB: the per-batch write is summary-sized, the fact stream is
touched once, and a periodic compaction (``io.compact_parquet``) folds
the partials store back to one rollup per key — reads stay cheap
without ever blocking ingestion.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import events_stream
from ..operators.analytics import merge_rollups, partial_rollup

_TMP_DIRS: list[str] = []


@atexit.register
def _cleanup() -> None:
    while _TMP_DIRS:
        shutil.rmtree(_TMP_DIRS.pop(), ignore_errors=True)


def run_rollup_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the events table (availableNow) through a foreachBatch
    sink that appends each microbatch's partial rollup to a parquet
    partials store, then return the merged (day, event_type) rollup.

    The result equals the batch aggregation of all events exactly —
    the microbatch boundaries are invisible because the partials are
    mergeable and exact.
    """
    keys = ["day", "event_type"]
    src = events_stream(spark, sf_dir).select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        "event_type",
        "value",
    )
    root = tempfile.mkdtemp(prefix="spark_graft_ivm_")
    _TMP_DIRS.append(root)
    partials_dir = f"{root}/partials"
    ckpt = f"{root}/ckpt"

    def sink(batch: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: a crash between this write and
        # the checkpoint commit re-delivers the batch on restart.  The
        # batch_id-keyed path + overwrite makes the retry IDEMPOTENT
        # (the partial is replaced, never appended twice), which is
        # what actually upholds the merge == recompute contract.
        partial_rollup(batch, keys, "value").write.mode("overwrite").parquet(
            f"{partials_dir}/batch_id={batch_id}"
        )

    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    partials = spark.read.parquet(partials_dir).drop("batch_id")
    return merge_rollups(partials).select(
        "day", "event_type", "n_events", "value_sum", "value_avg"
    )

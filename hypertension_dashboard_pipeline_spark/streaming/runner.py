"""Shared bounded-run harness for the streaming operators.

Every bounded (``availableNow``) verification run of a stateful
streaming operator follows the same shape: pin a small shuffle-partition
count for the stream's lifetime, write to a named memory sink through a
throwaway checkpoint, and return the emitted rows.

The pin matters because a stateful operator maintains one state store
PER shuffle partition per microbatch: under the default 200 (or this
bench session's 32) partitions, fixed per-store open/commit cost dwarfs
a bounded run — measured 4x on identical machinery when
``stream_join.py`` first applied the pin (9.5s -> 2.5s).  At production
rates partitions are sized to throughput, so the session default is
only wrong for BOUNDED runs, which is why the pin lives here and not in
session config.  The setting binds at ``.start()`` and is restored
after the stream terminates.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

BOUNDED_RUN_MAX_PARTITIONS = 8


def run_bounded(
    spark: SparkSession,
    out: DataFrame,
    name: str,
    *,
    ckpt_prefix: str = "spark_graft_stream_",
    output_mode: str = "append",
    pin_partitions: int | None = BOUNDED_RUN_MAX_PARTITIONS,
) -> DataFrame:
    """Run *out* (a streaming DataFrame) to completion with
    ``availableNow`` into a memory sink named *name*; return the sink.

    ``pin_partitions=None`` keeps the session's shuffle-partition
    count (for stateless shapes where the pin buys nothing).
    """
    ckpt = tempfile.mkdtemp(prefix=ckpt_prefix)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        if pin_partitions is not None:
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(min(int(prev), pin_partitions)),
            )
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        # memory-sink rows live on the driver; offsets/state in the
        # checkpoint dir are single-use for this bounded run
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)

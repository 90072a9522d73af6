"""The same per-user running counters on Spark 4's transformWithState
API (StatefulProcessor) — the successor to applyInPandasWithState.

Why both exist in this engine: applyInPandasWithState
(streaming/stateful.py) is the stable API the r3 driver verified;
transformWithStateInPandas is where Structured Streaming's custom
state is headed (typed value/list/map state handles, timers, TTL,
initial state). Keeping the v2 twin semantics-identical and
equality-tested against v1 documents the migration path without
churning the verified query.

Scale notes are unchanged: state is partitioned by key in the state
store, each micro-batch touches only present keys, the processor sees
Arrow batches per key.

Environment note: running transformWithState needs (a) the RocksDB
state store provider and (b) google.protobuf for the state-server
protocol; this container lacks protobuf, so the equality test
(tests/test_streaming.py::test_transform_with_state_v2_equals_v1)
skips here and runs wherever the dependency exists.  The VERIFIED
production operator remains streaming/stateful.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from .stateful import HIGH_VALUE, OUTPUT_SCHEMA, STATE_SCHEMA


class RunningCounters(StatefulProcessor):
    """ValueState-backed fold of (n_events, n_high) per user."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getValueState("counts", STATE_SCHEMA)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame],
                        timerValues) -> Iterator[pd.DataFrame]:
        if self._counts.exists():
            n_events, n_high = self._counts.get()
        else:
            n_events, n_high = 0, 0
        for pdf in rows:
            n_events += len(pdf)
            n_high += int((pdf["value"] >= HIGH_VALUE).sum())
        self._counts.update((n_events, n_high))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n_events], "n_high": [n_high]}
        )

    def close(self) -> None:
        pass


def running_user_counters_v2(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas twin of
    stateful.running_user_counters (stream-only)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningCounters(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def run_available_now(spark: SparkSession, sf_dir: str,
                      name: str = "stateful_user_counters_v2") -> DataFrame:
    """Drive the v2 operator over the bounded events stream (same
    single-micro-batch determinism argument as v1)."""
    import shutil
    import tempfile

    from ..io import events_stream

    src = events_stream(spark, sf_dir)
    out = running_user_counters_v2(src)
    spark.catalog.dropTempView(name)
    ckpt = tempfile.mkdtemp(prefix="spark_graft_stream_")
    try:
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name)

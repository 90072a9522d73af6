"""Streaming CUSUM: the change detector of
operators/timeseries.cusum_alarms carried as per-key streaming state.

Where the EWMA's state is its value tail, CUSUM's state is even
smaller — the recurrence max(0, s + x - level) with reset-on-alarm is
Markov in (s, alarm_count), so TWO numbers per key are the entire
state at any history length: the canonical "monitor every entity on
an unbounded stream" operator (state stores hold 16 bytes per user).

Each micro-batch folds its rows in (ts, event_id) order with the
IDENTICAL IEEE op sequence as the batch array fold and the recursive-
CTE oracle, so the bounded single-file run is value-level checkable.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LEVEL = 90.0
THRESHOLD = 120.0

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_alarms", T.LongType()),
        T.StructField("final_s", T.DoubleType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("a", T.LongType()),
    ]
)


def _update_user(key, batches: Iterable[pd.DataFrame],
                 state: GroupState):
    n, s, a = state.get if state.exists else (0, 0.0, 0)
    # Concatenate the micro-batch's Arrow chunks BEFORE sorting: a
    # key's rows can span multiple chunks, and per-chunk sorts do not
    # compose into a global (ts, event_id) order — worse here than in
    # the EWMA/Holt twins because the reset-on-alarm fold is nonlinear
    # in the order of its inputs.
    chunks = list(batches)
    if chunks:
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        # null measurements are skipped (the batch operator's contract)
        pdf = pdf[pdf["value"].notna()].sort_values(["ts", "event_id"])
        n += len(pdf)
        for x in pdf["value"]:
            t = max(0.0, s + float(x) - LEVEL)
            if t > THRESHOLD:
                a += 1
                s = 0.0
            else:
                s = t
    state.update((n, s, a))
    if n == 0:
        # all-null user so far: the batch operator emits no row
        return
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "n_alarms": [a],
            "final_s": [s],
        }
    )


def running_user_cusum(events: DataFrame) -> DataFrame:
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(spark: SparkSession, sf_dir: str,
                      name: str = "stateful_user_cusum") -> DataFrame:
    from ..io import events_stream
    from .runner import run_bounded

    src = events_stream(spark, sf_dir)
    return run_bounded(
        spark, running_user_cusum(src), name,
        ckpt_prefix="spark_graft_cusum_", output_mode="update",
    )

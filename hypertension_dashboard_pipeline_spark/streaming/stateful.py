"""Custom stateful streaming operator via applyInPandasWithState.

Per-user running counters maintained across micro-batches — the shape
of any "profile accumulating over an event stream" operator (feature
stores, abuse counters, per-entity quality stats). Built-in windowed
aggregation can't express arbitrary per-key state transitions; this is
the engine's sanctioned escape hatch: Arrow-batched pandas per group,
explicit typed state, update-mode emission.

At scale: state lives partitioned by key in the state store (RocksDB on
a real cluster); each micro-batch touches only keys present in the
batch. The pandas function sees one key's rows at a time — no driver
involvement.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_high", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("n_high", T.LongType()),
    ]
)

HIGH_VALUE = 50.0


def _update_user(key, batches: Iterable[pd.DataFrame],
                 state: GroupState):
    """Fold this batch's rows for one user into the running counters and
    emit the updated totals."""
    n_events, n_high = state.get if state.exists else (0, 0)
    for pdf in batches:
        n_events += len(pdf)
        n_high += int((pdf["value"] >= HIGH_VALUE).sum())
    state.update((n_events, n_high))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n_events], "n_high": [n_high]}
    )


def running_user_counters(events: DataFrame) -> DataFrame:
    """The stateful transformation (stream-only: requires a streaming
    DataFrame)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(spark: SparkSession, sf_dir: str,
                      name: str = "stateful_user_counters") -> DataFrame:
    """Drive the stateful operator over the bounded events stream.

    With a single input file the source forms one micro-batch, so each
    user emits exactly one (final) row — making the result equal to the
    batch groupBy, which the oracle pins.
    """
    from ..io import events_stream
    from .runner import run_bounded

    src = events_stream(spark, sf_dir)
    out = running_user_counters(src)
    # one applyInPandasWithState store per shuffle partition — bounded
    # runs pin a small count (see runner.py)
    return run_bounded(
        spark, out, name,
        ckpt_prefix="spark_graft_state_", output_mode="update",
    )

"""Streaming EWMA: the bounded-tail fold of
operators/timeseries.ewma_last carried as per-key streaming state.

The batch operator collects each key's history and folds once; the
streaming form is the SAME recurrence with the state contract made
explicit: all the fold ever needs is the last ``TAIL`` values, so
that tail IS the state — fixed-width per key, no history growth, the
property that makes the operator deployable on an unbounded stream
(contrast a naive "collect all values" state that grows without
bound).  Each micro-batch appends its rows in (ts, event_id) order,
truncates to the tail, and emits the refreshed EWMA in update mode.

At scale: state = TAIL doubles + one long per user in the state store
(RocksDB on a real cluster); each micro-batch touches only the keys
it contains.  The pandas function sees one key at a time — Arrow
batches, no driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TAIL = 8
DECAY = 0.9

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("ewma_last", T.DoubleType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("tail", T.ArrayType(T.DoubleType())),
    ]
)


def _fold(tail: list[float]) -> float:
    """The identical twin-fold arithmetic as the batch operator and
    the DuckDB oracle: left folds acc*DECAY + x for numerator and
    weight sum — same IEEE op sequence, bit-identical results."""
    acc, w = float(tail[0]), 1.0
    for x in tail[1:]:
        acc = acc * DECAY + float(x)
        w = w * DECAY + 1.0
    return acc / w


def _update_user(key, batches: Iterable[pd.DataFrame],
                 state: GroupState):
    n_events, tail = state.get if state.exists else (0, [])
    tail = list(tail)
    # Concatenate the micro-batch's Arrow chunks BEFORE sorting: a
    # key's rows can span multiple chunks, and per-chunk sorts do not
    # compose into a global (ts, event_id) order — the fold would
    # diverge from the batch twin on chunk boundaries.  (The CUSUM
    # twin keeps the old per-chunk form until its r10 rotation —
    # registry.py r9 notes.)
    chunks = list(batches)
    if chunks:
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        # null measurements are skipped (the batch operator's
        # contract); NaN is how Arrow surfaces them here
        pdf = pdf[pdf["value"].notna()].sort_values(["ts", "event_id"])
        n_events += len(pdf)
        tail.extend(float(v) for v in pdf["value"])
        tail = tail[-TAIL:]
    state.update((n_events, tail))
    # a user whose rows were ALL null this batch (and before) has no
    # observation yet: the batch operator emits no row for it, so
    # neither do we
    if tail:
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n_events],
                "ewma_last": [_fold(tail)],
            }
        )


def running_user_ewma(events: DataFrame) -> DataFrame:
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(spark: SparkSession, sf_dir: str,
                      name: str = "stateful_user_ewma") -> DataFrame:
    """Drive the stateful EWMA over the bounded events stream: with a
    single-file source the final update per user equals the batch
    ts_ewma_last8, which the oracle pins."""
    from ..io import events_stream
    from .runner import run_bounded

    src = events_stream(spark, sf_dir)
    out = running_user_ewma(src)
    return run_bounded(
        spark, out, name,
        ckpt_prefix="spark_graft_ewma_", output_mode="update",
    )

"""Streaming Holt linear-trend smoothing: the bounded-tail fold of
operators/timeseries.holt_linear_last carried as per-key streaming
state (the EWMA twin's pattern applied to the two-component
level+trend recurrence).

The batch operator deliberately bounds its fold to the last ``TAIL``
values, so — exactly as with the EWMA — that tail IS the state:
fixed-width per key, no history growth, refolded from scratch on each
update (TAIL=12 multiply-adds, cheaper than persisting and
re-synchronizing (level, trend) pairs against late nulls).  Each
micro-batch appends its non-null rows in (ts, event_id) order,
truncates to the tail, and emits the refreshed (level, trend,
forecast) in update mode.

The Python fold runs the identical IEEE op sequence as the batch
``F.aggregate`` struct fold and the DuckDB recursive-CTE oracle
(α=0.5, β=0.25 are exact binary fractions; Python floats ARE IEEE
doubles), so with the bounded single-file source the final update per
user is bit-equal to the batch ``ts_holt_linear`` answer — the shared
oracle pins it at full value level.

At scale: state = TAIL doubles + one long per user in the state store
(RocksDB on a real cluster); each micro-batch touches only the keys
it contains; the pandas function sees one key at a time over Arrow.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TAIL = 12
ALPHA = 0.5
BETA = 0.25

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("level", T.DoubleType()),
        T.StructField("trend", T.DoubleType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("tail", T.ArrayType(T.DoubleType())),
    ]
)


def _fold(tail: list[float]) -> tuple[float, float]:
    """The identical recurrence as the batch struct fold and the
    recursive-CTE oracle: l' = α·x + (1-α)(l+b);
    b' = β(l'-l) + (1-β)b, initialized (x₀, 0)."""
    lvl, trd = float(tail[0]), 0.0
    for x in tail[1:]:
        lp = ALPHA * float(x) + (1.0 - ALPHA) * (lvl + trd)
        trd = BETA * (lp - lvl) + (1.0 - BETA) * trd
        lvl = lp
    return lvl, trd


def _update_user(key, batches: Iterable[pd.DataFrame],
                 state: GroupState):
    n_events, tail = state.get if state.exists else (0, [])
    tail = list(tail)
    # Concatenate the micro-batch's Arrow chunks BEFORE sorting: a
    # key's rows can span multiple chunks, and per-chunk sorts do not
    # compose into a global (ts, event_id) order — the fold would
    # diverge from the batch twin on chunk boundaries.
    chunks = list(batches)
    if chunks:
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        # null measurements are skipped (the fold contract); NaN is
        # how Arrow surfaces them here
        pdf = pdf[pdf["value"].notna()].sort_values(["ts", "event_id"])
        n_events += len(pdf)
        tail.extend(float(v) for v in pdf["value"])
        tail = tail[-TAIL:]
    state.update((n_events, tail))
    # all-null-so-far keys have no observation: the batch operator
    # emits no row for them, so neither do we
    if tail:
        lvl, trd = _fold(tail)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n_events],
                "level": [lvl],
                "trend": [trd],
            }
        )


def running_user_holt(events: DataFrame) -> DataFrame:
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(spark: SparkSession, sf_dir: str,
                      name: str = "stateful_user_holt") -> DataFrame:
    """Drive the stateful Holt fold over the bounded events stream:
    with a single-file source the final update per user equals the
    batch ts_holt_linear, which the shared oracle pins."""
    from ..io import events_stream
    from .runner import run_bounded

    src = events_stream(spark, sf_dir)
    out = running_user_holt(src)
    return run_bounded(
        spark, out, name,
        ckpt_prefix="spark_graft_holt_", output_mode="update",
    )

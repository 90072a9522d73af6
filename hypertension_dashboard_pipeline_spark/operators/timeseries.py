"""Time-series regularization: calendar scaffolding and gap filling.

Dashboards and feature pipelines consume *regular* daily series, but
event tables are sparse — a user with no events on a day simply has no
row (the reference meets the same mismatch when its BP observations
skip days and `3_blood_pressure.R` carries measurements forward to the
visit grid).  These operators densify a sparse keyed series:

* ``daily_scaffold`` — per-key calendar from the key's first active day
  to the global horizon, built with ``sequence()`` + ``explode`` (a
  narrow per-row generator, NOT a cross join against a date dimension:
  at 100 TB the scaffold is generated where each key's row already
  lives, no shuffle).
* ``gap_fill_locf`` — last-observation-carried-forward over the
  scaffold with ``last(value, ignorenulls=True)`` on a running rows
  frame: one window shuffle on the key, no self-join, no driver loop.

Scale notes: the only wide operations are the daily pre-aggregation
and the scaffold-to-observation left join, both hash-partitioned on
(key, day); the LOCF window re-uses the key partitioning.  Spark can
run the join and the window in the same exchange when the join output
is already distributed by key — AQE coalesces the tiny per-key
calendars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def daily_scaffold(daily: DataFrame, key_col: str, day_col: str,
                   horizon: DataFrame) -> DataFrame:
    """Dense (key, day) grid from each key's first observed day to the
    global horizon.

    ``horizon`` is a 1-row DataFrame with column ``d1`` (the global
    max day) — computed once from the source and broadcast; keeping it
    a DataFrame (not a collected scalar) leaves the whole plan lazy.
    """
    bounds = daily.groupBy(key_col).agg(F.min(day_col).alias("d0"))
    return (
        bounds.crossJoin(F.broadcast(horizon))
        .select(key_col, F.explode(F.sequence("d0", "d1")).alias(day_col))
    )


def gap_fill_locf(daily: DataFrame, key_col: str, day_col: str,
                  value_col: str, horizon: DataFrame,
                  filled_alias: str = "filled",
                  gap_alias: str = "is_gap") -> DataFrame:
    """Left-join the sparse series onto its scaffold and forward-fill.

    Emits one row per (key, day) in the dense grid with
    ``filled_alias`` = the most recent non-null value at-or-before the
    day and ``gap_alias`` = whether the day had no observation.  The
    first day per key is always observed (the scaffold starts at the
    key's min day), so the fill never yields null.
    """
    grid = daily_scaffold(daily, key_col, day_col, horizon)
    joined = grid.join(daily, [key_col, day_col], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        day_col,
        F.last(value_col, ignorenulls=True).over(w).alias(filled_alias),
        F.col(value_col).isNull().alias(gap_alias),
    )


def gap_fill_interpolate(daily: DataFrame, key_col: str, day_col: str,
                         value_col: str, horizon: DataFrame,
                         filled_alias: str = "filled",
                         gap_alias: str = "is_gap",
                         scale: int = 4) -> DataFrame:
    """LOCF's companion: fill gaps by LINEAR interpolation between the
    neighboring observations, time-weighted by day distance —

        filled(d) = pv + (nv - pv) · (d - pd) / (nd - pd)

    where (pd, pv) is the last observation at-or-before d and (nd, nv)
    the first at-or-after.  Days after the final observation carry the
    last value forward (LOCF tail); the first day per key is always
    observed (scaffold starts at the key's min day).

    Same scale shape as ``gap_fill_locf`` — one scaffold join plus TWO
    running-frame windows on the same key partitioning (backward for
    the previous observation, forward for the next; Spark evaluates
    both in one exchange).  The observation (day, value) travels as a
    null-when-unobserved struct so day and value can't desynchronize
    through ``last/first(ignorenulls)``.

    The interpolated value is a continuous ratio, so it is rounded
    with the engine-safe floor form (``round_fixed``); oracles pair
    with ``FLOOR(x*10^s + 0.5)/10^s``.
    """
    from ..functions.expressions import round_fixed

    grid = daily_scaffold(daily, key_col, day_col, horizon)
    joined = grid.join(daily, [key_col, day_col], "left")
    obs = F.when(
        F.col(value_col).isNotNull(),
        F.struct(F.col(day_col).alias("d"), F.col(value_col).alias("v")),
    )
    wb = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev = F.last(obs, ignorenulls=True).over(wb)
    nxt = F.first(obs, ignorenulls=True).over(wf)
    frac = F.datediff(F.col(day_col), prev["d"]).cast("double") / F.datediff(
        nxt["d"], prev["d"]
    ).cast("double")
    filled = F.when(
        nxt.isNull() | (nxt["d"] == prev["d"]), prev["v"]
    ).otherwise(prev["v"] + (nxt["v"] - prev["v"]) * frac)
    return joined.select(
        key_col,
        day_col,
        round_fixed(filled, scale).alias(filled_alias),
        F.col(value_col).isNull().alias(gap_alias),
    )

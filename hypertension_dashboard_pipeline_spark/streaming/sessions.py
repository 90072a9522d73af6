"""Streaming session windows (beyond-reference extension surface).

Gap-based sessions as a NATIVE Structured Streaming stateful operator:
``F.session_window`` merges overlapping [t, t+gap) event windows in the
state store, the watermark bounds state, and append mode emits a
session exactly once — when the watermark passes its end (no event
that could still extend it can arrive). The batch twin is
``operators/windows.sessionize`` (lag + cumulative-break); this is the
incremental form whose state is per-OPEN-session, not per-event.

Determinism note (same argument as daily_window.py): with availableNow
over a single static file the source forms one micro-batch, the final
watermark is ``max(ts) - delay``, and the emitted set is exactly the
sessions with ``session_end <= watermark`` — a deterministic prefix of
the batch answer that a SQL oracle can reproduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import events_stream


def user_sessions(events: DataFrame, gap: str = "30 minutes",
                  watermark: str = "1 hour") -> DataFrame:
    """The shared (batch == streaming) definition: per-user sessions
    with a ``gap`` inactivity timeout; a session's end is its last
    event + gap (the half-open merge window's end)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def run_available_now(spark: SparkSession, sf_dir: str,
                      name: str = "session_window_stream") -> DataFrame:
    """Drive the session operator over the bounded events stream into a
    memory sink; returns the emitted (watermark-closed) sessions."""
    src = events_stream(spark, sf_dir)
    out = user_sessions(src)
    # session-window state stores follow shuffle partitions — bounded
    # runs pin a small count (see runner.py)
    from .runner import run_bounded

    return run_bounded(spark, out, name, ckpt_prefix="spark_graft_sessions_")

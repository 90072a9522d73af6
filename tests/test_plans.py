"""Physical-plan invariants — the properties that make these queries
viable at 100 TB, pinned as regression tests (SURVEY.md §4: everything
the reference did by hand must come out of Catalyst for free, and stay
that way):

* selective filters reach the parquet scan (PushedFilters),
* projections prune the scan schema (ReadSchema),
* codelist-sized sides broadcast (BroadcastHashJoin), the big side
  never builds,
* LEFT JOIN + null-rejecting WHERE is demoted to Inner
  (EliminateOuterJoin),
* groupBy aggregations partial-aggregate map-side before the exchange,
* ORDER BY + LIMIT plans TakeOrderedAndProject, not a global sort.
"""

from __future__ import annotations

import pytest

from hypertension_dashboard_pipeline_spark import registry

registry.load_all()


@pytest.fixture(scope="module")
def plan(spark, sf_dir):
    def get(name: str) -> str:
        df = registry.QUERIES[name](spark, sf_dir)
        return df._jdf.queryExecution().executedPlan().toString()

    return get


def test_filter_pushdown_reaches_scan(plan):
    p = plan("p6_p7_range_conjunction")
    # (plan toString truncates long filter lists; assert the stable prefix)
    assert "PushedFilters: [IsNotNull(c_acctbal)" in p
    assert "GreaterThanOrEqual(c_acctbal,0.0)" in p


def test_isin_codelist_pushdown(plan):
    p = plan("p9_codelist_isin")
    scan = next(l for l in p.splitlines() if "FileScan" in l)
    assert "PushedFilters: [In(l_partkey," in scan


def test_column_pruning(plan):
    p = plan("s1_scan_project_alias")
    scan = next(l for l in p.splitlines() if "FileScan" in l)
    assert "c_nationkey" not in scan  # unused column never read


def test_codelist_joins_broadcast(plan):
    p = plan("flagship_cohort_pipeline")
    assert "BroadcastHashJoin" in p
    # the nation codelist probe is a broadcast LEFT SEMI
    assert "LeftSemi, BuildRight" in p


def test_outer_join_demoted_to_inner(plan):
    """The reference's LEFT JOIN + WHERE-on-right (J7) must optimize to
    an inner join — Catalyst's EliminateOuterJoin."""
    p = plan("j7_outer_join_demoted")
    assert "Inner" in p
    assert "LeftOuter" not in p


def test_latest_per_key_partial_aggregates(plan):
    """W1 as max(struct): must partially aggregate before the shuffle —
    the reason it beats a row_number window at scale."""
    p = plan("w1_latest_per_key")
    assert "partial_max" in p
    # exactly one shuffle, keyed on the patient-key analog
    assert p.count("Exchange hashpartitioning(o_custkey") >= 1


def test_order_limit_is_top_k(plan):
    p = plan("l1_order_limit")
    assert "TakeOrderedAndProject" in p
    assert "Sort " not in p  # no global sort


def test_semi_join_carries_no_payload(plan):
    """J6: the semi join must not materialize right-side columns."""
    p = plan("j6_semi_evidence")
    assert "LeftSemi" in p

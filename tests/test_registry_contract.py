"""Pins the registry's driver-window contract (registry.py _FRONT).

The external correctness gate verifies only the first
``registry.DRIVER_WINDOW`` registered queries; these tests make the
window's invariants explicit so a refactor cannot silently push a
changed query out of external verification:

* _FRONT fits the window exactly and contains no duplicates/unknowns;
* registration order actually starts with _FRONT;
* any query whose MECHANICAL fingerprint (own source + transitive
  in-package callees + oracle text, see
  hypertension_dashboard_pipeline_spark/manifest.py) drifted from the last
  externally-verified snapshot (tests/query_manifest.json) is inside
  the window — no hand-curated changed-list to forget to update.

Queries outside the window are still verified every run by the local
full sweep (test_driver_parity.py parametrizes over ALL registered
queries) — the window contract is about keeping the EXTERNAL record
meaningful, not about local coverage.

Round-boundary workflow: after the driver records CORRECTNESS_r{N} for
tree T, regenerate the snapshot FROM T (scripts/gen_manifest.py
docstring shows the git-archive recipe) before making round N+1
changes.
"""

from __future__ import annotations

import json
import pathlib

from hypertension_dashboard_pipeline_spark import registry
from hypertension_dashboard_pipeline_spark.manifest import query_fingerprints

registry.load_all()

MANIFEST_PATH = pathlib.Path(__file__).parent / "query_manifest.json"


def test_front_fits_window_and_is_well_formed():
    assert len(registry._FRONT) <= registry.DRIVER_WINDOW
    assert len(set(registry._FRONT)) == len(registry._FRONT)
    unknown = [n for n in registry._FRONT if n not in registry.QUERIES]
    assert not unknown, f"_FRONT names not registered: {unknown}"


def test_registration_order_starts_with_front():
    assert list(registry.QUERIES)[: len(registry._FRONT)] == registry._FRONT


def test_changed_queries_are_externally_gated():
    """Mechanical drift detection: any query whose fingerprint differs
    from the last externally-verified snapshot must be in the driver
    window this round.

    BRAND-NEW queries (absent from the snapshot) may debut outside the
    window: they have no external record to invalidate, the local sweep
    covers them from their first commit (an oracle is mandatory,
    test_every_query_has_an_oracle_or_documented_exemption), and the
    rename that could abuse this exemption is caught by
    test_removed_queries_are_deliberate.  They enter _FRONT at the next
    rotation for their external debut.

    SHARED-CALLEE drift (r13 optimization round): a query whose
    TRANSITIVE fingerprint drifted but whose OWN source + oracle are
    byte-identical to the snapshot may sit outside the window.  A
    shared-operator optimization (parquet reader schema, join shape,
    expression construction) drifts every consumer at once — hundreds
    of queries, unholdable by any 50-slot window — while the
    admissibility evidence is unchanged: the local full-catalog parity
    sweep (test_driver_parity.py, every registered query vs its DuckDB
    oracle) value-verifies all of them in the SAME pytest session, and
    the optimization round's external gate re-runs every declared
    query.  Any edit to a query's own definition or oracle remains
    window-gated."""
    doc = json.loads(MANIFEST_PATH.read_text())
    snapshot = doc["queries"]
    snap_own = doc.get("own")
    current = query_fingerprints()
    window = set(list(registry.QUERIES)[: registry.DRIVER_WINDOW])
    drifted = sorted(
        n for n, h in current.items() if n in snapshot and snapshot[n] != h
    )
    outside = [n for n in drifted if n not in window]
    if snap_own is not None and outside:
        from hypertension_dashboard_pipeline_spark.manifest import (
            query_own_fingerprints,
        )

        cur_own = query_own_fingerprints()
        outside = [
            n
            for n in outside
            if n not in snap_own or snap_own[n] != cur_own.get(n)
        ]
    assert not outside, (
        f"queries whose OWN source/oracle changed since the verified "
        f"snapshot but outside the driver window: {outside} — move them "
        f"into registry._FRONT (or, at a round boundary only, regenerate "
        f"the snapshot from the driver-verified tree: see "
        f"scripts/gen_manifest.py)"
    )


def test_removed_queries_are_deliberate():
    """A query present in the verified snapshot must still exist —
    silent deregistration would quietly shrink coverage."""
    snapshot = json.loads(MANIFEST_PATH.read_text())["queries"]
    removed = sorted(set(snapshot) - set(registry.QUERIES))
    assert not removed, f"queries removed since verified snapshot: {removed}"


def test_every_query_has_an_oracle_or_documented_exemption():
    """Rows-only queries must be the deliberate short list, not an
    accidental omission.  (a14_sketch_profile gained an exact-twin
    oracle in r4, so the exemption list is now empty.)"""
    no_oracle = set(registry.QUERIES) - set(registry.ORACLES)
    assert no_oracle == set(), f"unexpected oracle-less queries: {sorted(no_oracle)}"


def test_fingerprints_ignore_runtime_mutable_state():
    """Running queries mutates module-level bookkeeping (the dedup
    persist list); fingerprints must depend only on committed code,
    never on what already executed in this process — otherwise the
    contract test fails exactly when the full suite runs queries
    before it."""
    from hypertension_dashboard_pipeline_spark.operators import dedup as dd

    before = query_fingerprints()
    dd._PERSISTED.append(object())  # simulate a prior query's run
    try:
        after = query_fingerprints()
    finally:
        dd._PERSISTED.clear()
    assert before == after


def test_fingerprint_positive_controls():
    """The drift detector must actually DETECT drift: a changed oracle
    text or a different function body must change the fingerprint
    (otherwise the window contract silently stops gating anything)."""
    from hypertension_dashboard_pipeline_spark.manifest import fingerprint

    fn = registry.QUERIES["a5_global_count"]
    assert fingerprint(fn, "SELECT 1") != fingerprint(fn, "SELECT 2")

    other = registry.QUERIES["a8_distinct"]
    assert fingerprint(fn, "X") != fingerprint(other, "X")


def test_fingerprint_tracks_transitive_callee():
    """A query's fingerprint must cover its in-package callees: two
    queries sharing an operator must BOTH drift if that operator's
    source is what changed — approximated here by asserting the shared
    callee's source is part of both closures (the walk visits it)."""
    import hypertension_dashboard_pipeline_spark.manifest as m

    fn = registry.QUERIES["dedup_exact_groups"]
    seen: set[str] = set()
    parts: dict[str, str] = {}
    m._walk(fn, seen, parts)
    assert any("operators.dedup" in k for k in parts), sorted(parts)[:10]

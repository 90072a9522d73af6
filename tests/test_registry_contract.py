"""Pins the registry's driver-window contract (registry.py _FRONT).

The external correctness gate verifies only the first
``registry.DRIVER_WINDOW`` registered queries; these tests make the
window's invariants explicit so a refactor cannot silently push a
changed query out of external verification:

* _FRONT fits the window exactly and contains no duplicates/unknowns;
* registration order actually starts with _FRONT;
* queries changed in the current round (tracked by the curated list
  below) are inside the window.

Queries outside the window are still verified every run by the local
full sweep (test_driver_parity.py parametrizes over ALL registered
queries) — the window contract is about keeping the EXTERNAL record
meaningful, not about local coverage.
"""

from __future__ import annotations

from hypertension_dashboard_pipeline_spark import registry

registry.load_all()

# Queries whose implementation or oracle changed in the current round.
# Update this list whenever a round touches a query — the test below
# forces the change into the externally-gated window (contract rule 2).
CHANGED_THIS_ROUND = [
    "streaming_static_join",
    "multimodal_extract_features",
    "text_simhash",
    "dedup_simhash_pairs",
    "sim_lsh_bucket_topk",
    "sim_cosine_near_dup",
    "a12_salted_skew_agg",
    "streaming_daily_window",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_components",
    "curation_pipeline",
    "omop_pipeline_e2e",
    "omop_phenotype_stats",
]


def test_front_fits_window_and_is_well_formed():
    assert len(registry._FRONT) <= registry.DRIVER_WINDOW
    assert len(set(registry._FRONT)) == len(registry._FRONT)
    unknown = [n for n in registry._FRONT if n not in registry.QUERIES]
    assert not unknown, f"_FRONT names not registered: {unknown}"


def test_registration_order_starts_with_front():
    assert list(registry.QUERIES)[: len(registry._FRONT)] == registry._FRONT


def test_changed_queries_are_externally_gated():
    window = set(list(registry.QUERIES)[: registry.DRIVER_WINDOW])
    outside = [n for n in CHANGED_THIS_ROUND if n not in window]
    assert not outside, (
        f"queries changed this round but outside the driver window: "
        f"{outside} — move them into registry._FRONT"
    )


def test_every_query_has_an_oracle_or_documented_exemption():
    """Rows-only queries must be the deliberate short list (approximate
    sketches), not an accidental omission."""
    no_oracle = set(registry.QUERIES) - set(registry.ORACLES)
    assert no_oracle <= {"a14_sketch_profile"}, (
        f"unexpected oracle-less queries: {sorted(no_oracle)}"
    )

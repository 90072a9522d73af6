"""End-to-end pipeline tests on OMOP-shaped fixtures with golden
patients (FIXTURES.md), mirroring the reference's manual QC idioms:
stage row counts, named-patient flag spot-checks, and recompute-by-hand
aggregates (SURVEY.md §5).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hypertension_dashboard_pipeline_spark.plans.fixtures import CODELISTS, EXPECTED_COHORT, build_tables
from hypertension_dashboard_pipeline_spark.plans import (
    bp as bp_plan,
)
from hypertension_dashboard_pipeline_spark.plans.cohort import (
    adults,
    base_population,
    build_cohort,
    drop_misbridged,
)
from hypertension_dashboard_pipeline_spark.plans.phenotype import (
    build_phenotype,
    phenotype_stats,
)

YEAR = 2023


@pytest.fixture(scope="module")
def tables(spark):
    return build_tables(spark)


@pytest.fixture(scope="module")
def cohort(spark, tables):
    df = build_cohort(
        tables["person"], tables["condition"], tables["measurement"],
        tables["observation"], tables["procedure"], CODELISTS, YEAR,
    )
    df.cache()
    return df


@pytest.fixture(scope="module")
def bp_flags(cohort, tables):
    df = bp_plan.build_bp_flags(cohort, tables["measurement"], YEAR)
    df.cache()
    return df


@pytest.fixture(scope="module")
def phenotype(bp_flags, tables):
    df = build_phenotype(bp_flags, tables["condition"],
                         tables["drug_exposure"], CODELISTS, YEAR)
    df.cache()
    return df


def _by_key(df, cols):
    return {r["PATIENT_LINKAGE"]: tuple(r[c] for c in cols) for r in df.collect()}


# ---------------------------------------------------------------- cohort

def test_base_population_drops_null_keys(tables):
    pop = base_population(tables["person"])
    assert pop.filter(F.col("PATIENT_LINKAGE").isNull()).count() == 0
    # quote-trim applied (reference F1): raw '"M"' becomes 'M'
    sexes = {r["SEX"] for r in pop.select("SEX").distinct().collect()}
    assert sexes <= {"M", "F"}


def test_misbridge_dedup(tables):
    pop = drop_misbridged(base_population(tables["person"]))
    keys = [r["PATIENT_LINKAGE"] for r in pop.collect()]
    assert "P08" not in keys          # YOB conflict -> dropped entirely
    assert keys.count("P13") == 1     # state-only conflict -> one survivor
    # deterministic survivor: FL < GA in the explicit ordering
    assert pop.filter("PATIENT_LINKAGE = 'P13'").first()["STATE"] == "FL"
    # null-location semantics (2_data_importing_cleaning.R:147-148):
    # all rows missing STATE -> patient gone entirely
    assert "P21" not in keys
    # partial: the null-ZIP3 row is removed, the located row survives
    assert keys.count("P22") == 1
    p22 = pop.filter("PATIENT_LINKAGE = 'P22'").first()
    assert p22["STATE"] == "FL" and p22["ZIP3"] is not None


def test_adult_filter(tables):
    pop = adults(drop_misbridged(base_population(tables["person"])), YEAR)
    keys = {r["PATIENT_LINKAGE"] for r in pop.collect()}
    assert "P10" not in keys


def test_cohort_membership(cohort):
    keys = {r["PATIENT_LINKAGE"] for r in cohort.collect()}
    assert keys == EXPECTED_COHORT
    # excluded golden patients
    for gone in ("P07", "P08", "P10", "P11", "P12"):
        assert gone not in keys


def test_cohort_labels(cohort):
    rows = {r["PATIENT_LINKAGE"]: r for r in cohort.collect()}
    p20 = rows["P20"]
    assert p20["race"] == "Black"           # recode (F3)
    assert p20["sex"] == "Female"
    assert p20["age"] == YEAR - 1988        # derived age (F7)
    assert p20["zip3"] == "303"             # quotes stripped (F2)


# -------------------------------------------------------------------- bp

def test_same_day_average(tables):
    paired = bp_plan.paired_daily_bp(tables["measurement"], YEAR)
    row = paired.filter(
        "PATIENT_LINKAGE = 'P03' AND MEASUREMENT_DATE = DATE'2023-06-01'"
    ).first()
    assert row is not None
    assert row["SBP"] == 122.0  # (118+121+127)/3, golden recompute
    assert row["DBP"] == 70.0


def test_pairing_drops_unpaired_and_implausible(bp_flags):
    flags = _by_key(bp_flags, ["has_bp"])
    assert flags["P14"] == (0,)  # SBP-only day never pairs
    assert flags["P18"] == (0,)  # wrong unit
    assert flags["P19"] == (0,)  # noise concept
    assert flags["P15"] == (1,)  # implausible day dropped, valid day pairs


def test_htn_flags(bp_flags):
    flags = _by_key(bp_flags, ["HTN140_90", "HTN130_80"])
    assert flags["P01"] == (1, 1)   # GOLD_HTN140
    assert flags["P02"] == (0, 1)   # GOLD_HTN130_ONLY
    assert flags["P17"] == (0, 0)   # single high day: >=2 rule
    assert flags["P09"] == (0, 0)   # GOLD_LOOKBACK_ONLY: deterministic 0
    assert flags["P20"] == (0, 0)


def test_lookback_only_in_denominator(bp_flags):
    assert _by_key(bp_flags, ["has_bp"])["P09"] == (1,)


def test_control_flags(bp_flags):
    flags = _by_key(bp_flags, ["HTN140_90", "HTNcontrol140"])
    assert flags["P04"] == (1, 1)   # GOLD_CONTROL: latest visit controlled
    assert flags["P01"] == (1, 0)   # still high at latest visit


# ------------------------------------------------------------- phenotype

def test_phenotype_flags(phenotype):
    flags = _by_key(phenotype, ["HTN_DX", "HTN_MEDS", "hypertension_140"])
    assert flags["P05"] == (1, 0, 1)   # GOLD_DX_ONLY
    assert flags["P06"] == (0, 1, 1)   # GOLD_MEDS_ONLY
    assert flags["P01"] == (0, 0, 1)   # BP evidence alone
    assert flags["P20"] == (0, 0, 0)
    assert flags["P09"] == (0, 0, 0)   # look-back only: deterministic 0


def test_phenotype_stats_rollup(phenotype):
    stats = {r["hypertension_140"]: r["n"]
             for r in phenotype_stats(phenotype).collect()}
    n_pos = phenotype.filter("hypertension_140 = 1").count()
    assert stats[1] == n_pos
    assert stats[None] == len(EXPECTED_COHORT)  # totals row


def test_staged_runner_checkpoints_match_direct(spark, tables, phenotype,
                                                tmp_path):
    """plans/run.py: the checkpointed staged run must produce exactly
    the directly-composed phenotype, and each stage boundary must exist
    on disk as readable Parquet (the reference's CSV-handoff pattern,
    type-exact)."""
    import os

    from hypertension_dashboard_pipeline_spark.plans.run import run_pipeline

    out = run_pipeline(spark, tables, CODELISTS, str(tmp_path), YEAR)
    for stage in ("stage2_cohort", "stage3_bp_flags", "stage4_phenotype",
                  "stage4_stats"):
        assert os.path.isdir(tmp_path / stage)

    direct = {r["PATIENT_LINKAGE"]: r for r in phenotype.collect()}
    staged = {r["PATIENT_LINKAGE"]: r for r in out["phenotype"].collect()}
    assert staged.keys() == direct.keys()
    for k in direct:
        assert staged[k]["hypertension_140"] == direct[k]["hypertension_140"]
        assert staged[k]["hypertension_130"] == direct[k]["hypertension_130"]
    # checkpoint round-trip preserved types (no CSV-style degradation)
    assert dict(out["phenotype"].dtypes) == dict(phenotype.dtypes)


# ----------------------------------------------------- attrition bands


def test_attrition_proportions_within_reference_bands(spark):
    """Reference QC idiom #3 (SURVEY.md §5): the exclusion plumbing must
    reproduce the reference's PUBLISHED attrition rates when evidence is
    planted at those rates on a scaled population —
    8.97% of women of reproductive age excluded for pregnancy
    (2_data_importing_cleaning.R:403-405), 0.18% of all adults for ESRD
    (:482-484), and ~0.01% for palliative/hospice care.  This pins the
    exclusion machinery's PROPORTIONS (no over-/under-exclusion, WRA
    denominator right, domains unioned not double-counted), not just
    golden-patient membership.
    """
    import datetime as dt

    from hypertension_dashboard_pipeline_spark import schemas as S
    from hypertension_dashboard_pipeline_spark.operators.aggregates import attrition_pct
    from hypertension_dashboard_pipeline_spark.plans.cohort import (
        care_exclusion_keys,
        esrd_exclusion_keys,
        pregnancy_exclusion_keys,
    )
    from hypertension_dashboard_pipeline_spark.plans.fixtures import CODELISTS, q
    from hypertension_dashboard_pipeline_spark.plans import cohort as co
    from hypertension_dashboard_pipeline_spark.operators import joins as jn

    N, N_WRA = 10_000, 3_000
    N_PREG = round(0.0897 * N_WRA)   # 269 -> 8.9667%
    N_ESRD = round(0.0018 * N)       # 18  -> 0.18%
    N_CARE = 1                       # 0.01%
    d23 = dt.date(2023, 6, 1)

    persons, conditions, measurements, observations, procedures = [], [], [], [], []
    for i in range(N):
        key = f"A{i:05d}"
        wra = i < N_WRA
        persons.append((key, 1990 if wra else 1970, q("CAUCASIAN"),
                        q("F" if wra else "M"), 8532 if wra else 8507,
                        q("303"), "GA"))
    # pregnancy evidence spread over all four domains (union must not
    # double-count a patient with multi-domain evidence: A00000 has 2)
    for i in range(N_PREG):
        key = f"A{i:05d}"
        dom = i % 4
        if dom == 0:
            conditions.append((key, 9001, q("pregnancy"), d23))
        elif dom == 1:
            measurements.append((key, d23, 9002, q("preg test"), 1.0, 0, q("")))
        elif dom == 2:
            observations.append((key, 9003, d23))
        else:
            procedures.append((key, 9004, d23))
    conditions.append(("A00000", 9001, q("pregnancy again"), d23))
    # ESRD / care evidence on males only (disjoint from pregnancy set)
    for i in range(N_WRA, N_WRA + N_ESRD):
        conditions.append((f"A{i:05d}", 9101, q("esrd"), d23))
    for i in range(N_WRA + N_ESRD, N_WRA + N_ESRD + N_CARE):
        observations.append((f"A{i:05d}", 9201, d23))

    person = spark.createDataFrame(persons, S.PERSON)
    condition = spark.createDataFrame(conditions, S.CONDITION_OCCURRENCE)
    measurement = spark.createDataFrame(measurements, S.MEASUREMENT)
    observation = spark.createDataFrame(observations, S.OBSERVATION)
    procedure = spark.createDataFrame(procedures, S.PROCEDURE_OCCURRENCE)

    grown = co.adults(co.drop_misbridged(co.base_population(person)), YEAR)
    n_total = grown.count()
    n_wra = grown.filter(
        F.col("YEAR_OF_BIRTH").between(YEAR - 44, YEAR - 18)
        & (F.col("SEX") == "F")
    ).count()
    assert (n_total, n_wra) == (N, N_WRA)

    after_preg = jn.exclude(
        grown,
        pregnancy_exclusion_keys(grown, condition, measurement, observation,
                                 procedure, CODELISTS, YEAR),
        co.KEY,
    )
    n1 = after_preg.count()
    after_esrd = jn.exclude(
        after_preg,
        esrd_exclusion_keys(condition, observation, procedure, CODELISTS, YEAR),
        co.KEY,
    )
    n2 = after_esrd.count()
    n3 = jn.exclude(
        after_esrd,
        care_exclusion_keys(observation, procedure, CODELISTS, YEAR),
        co.KEY,
    ).count()

    # the reference's printed formulas, with its denominators
    pct_preg = attrition_pct(n_total, n1, denom=n_wra)
    pct_esrd = attrition_pct(n1, n2, denom=n_total)
    pct_care = attrition_pct(n2, n3, denom=n_total)
    assert abs(pct_preg - 8.97) < 0.5, pct_preg
    assert abs(pct_esrd - 0.18) < 0.05, pct_esrd
    assert abs(pct_care - 0.01) < 0.02, pct_care

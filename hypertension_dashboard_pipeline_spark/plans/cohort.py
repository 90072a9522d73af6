"""Cohort build (reference script 2, 2_data_importing_cleaning.R).

Stages, each a pure DataFrame → DataFrame function so tests can pin
intermediate counts (the reference's manual QC idiom, SURVEY.md §5):

1. base population: projection + quote-trim + null-key filter
   (2_data_importing_cleaning.R:61-81)
2. mis-bridge cleanup: drop patients whose YOB/SEX/RACE conflict
   across rows; collapse remaining multi-rows (STATE/ZIP-only
   conflicts) to one deterministic survivor
   (2_data_importing_cleaning.R:85-161)
3. adult filter (YOB ≤ year-18, :186-187)
4. exclusions — pregnancy (women 18-44 only), ESRD, palliative/
   hospice care — each an evidence-key union across domain tables
   filtered by codelist + year, anti-joined off the cohort
   (:283-620)
5. presentation labels: age, sex/race recodes, ZIP3 de-quote
   (:640-658)

Scale: person-keyed aggregations and anti-joins shuffle on the
high-cardinality patient key; codelists broadcast. Nothing touches the
driver except codelist literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expressions import age_from_birth_year, recode, strip_ends, trim_chars
from ..operators import aggregates as agg
from ..operators import filters as flt
from ..operators import joins as jn
from ..sources.codelists import Codelists

KEY = "PATIENT_LINKAGE"

RACE_RECODE = {
    "AFRICAN AMERICAN": "Black",
    "CAUCASIAN": "White",
    "ASIAN": "Asian",
    "HISPANIC": "Hispanic",
    "OTHER": "Other",
    "UNKNOWN": "Unknown",
}
SEX_RECODE = {"F": "Female", "M": "Male"}


def base_population(person: DataFrame) -> DataFrame:
    """Projection with quote-trim + null-key filter
    (2_data_importing_cleaning.R:61-81: TRIM(col,'\"') in the SELECT,
    then filter(!is.na(PATIENT_LINKAGE)))."""
    pop = person.select(
        F.col(KEY),
        F.col("YEAR_OF_BIRTH"),
        trim_chars("ETHNICITY_SOURCE_VALUE").alias("RACE"),
        trim_chars("GENDER_SOURCE_VALUE").alias("SEX"),
        trim_chars("LOCATION_ZIP").alias("ZIP3"),
        F.col("LOCATION_STATE").alias("STATE"),
    )
    return flt.not_null(pop, KEY)


def drop_misbridged(pop: DataFrame) -> DataFrame:
    """Mis-bridge cleanup (2_data_importing_cleaning.R:85-161).

    A patient key appearing with conflicting YEAR_OF_BIRTH / SEX / RACE
    is a bad linkage → dropped entirely (n_distinct != 1 on any).
    Rows with missing STATE or ZIP3 are then removed
    (2_data_importing_cleaning.R:147-148, ``filter(!is.na(STATE) &
    !is.na(ZIP3))``) — a patient whose every row lacks location leaves
    the cohort here, exactly as in the reference.  Remaining STATE/ZIP3
    conflicts are tolerated → collapsed to one deterministic row (the
    reference keeps an arbitrary one; SURVEY.md §2.10-4).
    """
    consistent = agg.consistent_keys(pop, KEY, ["YEAR_OF_BIRTH", "SEX", "RACE"])
    kept = jn.has_evidence(pop, consistent, KEY)
    located = kept.filter(
        F.col("STATE").isNotNull() & F.col("ZIP3").isNotNull()
    )
    return agg.dedup_deterministic(
        located, KEY, [F.col("STATE").asc(), F.col("ZIP3").asc()]
    )


def adults(pop: DataFrame, year: int = 2023) -> DataFrame:
    """Age ≥ 18 (YEAR_OF_BIRTH ≤ year-18, 2_data_importing_cleaning.R:186-187)."""
    return pop.filter(F.col("YEAR_OF_BIRTH") <= year - 18)


def _domain_keys(df: DataFrame, concept_col: str, date_col: str,
                 codes, years) -> DataFrame:
    """Evidence keys for one domain table: codelist filter + year filter
    → patient keys (the reference's `(key,'1')` exclusion queries,
    2_data_importing_cleaning.R:283-303)."""
    return flt.year_in(
        flt.codelist_filter(df, concept_col, codes), date_col, years
    ).select(KEY)


def pregnancy_exclusion_keys(cohort: DataFrame, condition: DataFrame,
                             measurement: DataFrame, observation: DataFrame,
                             procedure: DataFrame, codelists: Codelists,
                             year: int = 2023) -> DataFrame:
    """Pregnancy evidence among women of reproductive age (18-44):
    cohort-restricted union of condition/measurement/observation/
    procedure hits (2_data_importing_cleaning.R:195-198, 283-400)."""
    wra = cohort.filter(
        F.col("YEAR_OF_BIRTH").between(year - 44, year - 18)
        & (F.col("SEX") == "F")
    ).select(KEY)
    union = jn.evidence_union(
        KEY,
        _domain_keys(condition, "CONDITION_CONCEPT_ID", "CONDITION_START_DATE",
                     codelists["preg_condition"], [year]),
        _domain_keys(measurement, "MEASUREMENT_CONCEPT_ID", "MEASUREMENT_DATE",
                     codelists["preg_measurement"], [year]),
        _domain_keys(observation, "OBSERVATION_CONCEPT_ID", "OBSERVATION_DATE",
                     codelists["preg_observation"], [year]),
        _domain_keys(procedure, "PROCEDURE_CONCEPT_ID", "PROCEDURE_DATE",
                     codelists["preg_procedure"], [year]),
    )
    return jn.has_evidence(union, wra, KEY)


def esrd_exclusion_keys(condition: DataFrame, observation: DataFrame,
                        procedure: DataFrame, codelists: Codelists,
                        year: int = 2023) -> DataFrame:
    """End-stage renal disease evidence, any adult
    (2_data_importing_cleaning.R:409-484); look-back year included like
    the reference's 2022-2023 window."""
    years = [year - 1, year]
    return jn.evidence_union(
        KEY,
        _domain_keys(condition, "CONDITION_CONCEPT_ID", "CONDITION_START_DATE",
                     codelists["esrd_condition"], years),
        _domain_keys(observation, "OBSERVATION_CONCEPT_ID", "OBSERVATION_DATE",
                     codelists["esrd_observation"], years),
        _domain_keys(procedure, "PROCEDURE_CONCEPT_ID", "PROCEDURE_DATE",
                     codelists["esrd_procedure"], years),
    )


def care_exclusion_keys(observation: DataFrame, procedure: DataFrame,
                        codelists: Codelists, year: int = 2023) -> DataFrame:
    """Palliative/hospice care evidence
    (2_data_importing_cleaning.R:526-611; note the reference's
    undefined-variable bug at :610 — the intent, both lists, is
    implemented; SURVEY.md §2.10-5d)."""
    years = [year - 1, year]
    return jn.evidence_union(
        KEY,
        _domain_keys(observation, "OBSERVATION_CONCEPT_ID", "OBSERVATION_DATE",
                     codelists["palliative_observation"], years),
        _domain_keys(procedure, "PROCEDURE_CONCEPT_ID", "PROCEDURE_DATE",
                     codelists["palliative_procedure"], years),
        _domain_keys(observation, "OBSERVATION_CONCEPT_ID", "OBSERVATION_DATE",
                     codelists["hospice_observation"], years),
        _domain_keys(procedure, "PROCEDURE_CONCEPT_ID", "PROCEDURE_DATE",
                     codelists["hospice_procedure"], years),
    )


def clean_labels(cohort: DataFrame, year: int = 2023) -> DataFrame:
    """Presentation columns (2_data_importing_cleaning.R:640-658):
    derived age, human-readable sex/race, de-quoted ZIP3."""
    return cohort.select(
        KEY,
        age_from_birth_year("YEAR_OF_BIRTH", year).alias("age"),
        recode("SEX", SEX_RECODE).alias("sex"),
        recode("RACE", RACE_RECODE).alias("race"),
        F.col("STATE").alias("state"),
        F.col("ZIP3").alias("zip3"),
    )


def build_cohort(person: DataFrame, condition: DataFrame,
                 measurement: DataFrame, observation: DataFrame,
                 procedure: DataFrame, codelists: Codelists,
                 year: int = 2023) -> DataFrame:
    """Script-2 end-to-end: eligible adult cohort with clean labels."""
    pop = drop_misbridged(base_population(person))
    grown = adults(pop, year)
    preg = pregnancy_exclusion_keys(grown, condition, measurement,
                                    observation, procedure, codelists, year)
    esrd = esrd_exclusion_keys(condition, observation, procedure,
                               codelists, year)
    care = care_exclusion_keys(observation, procedure, codelists, year)
    eligible = jn.exclude(
        jn.exclude(jn.exclude(grown, preg, KEY), esrd, KEY), care, KEY
    )
    return clean_labels(eligible, year)

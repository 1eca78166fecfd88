"""OMOP public-CDM layer: generator, staging, patient-summary mart, and
data-quality profile.

Parity sources: generator data_adapters/public_cdm.py:375-525 (FIXTURES.md
§2 contract), staging analytics/dbt/models/public_cdm/staging_person.sql /
staging_visit_occurrence.sql, mart mart_patient_summary.sql, validation
clinical_data_platform/validation/pandera_public.py:21-137.

Determinism notes:
- the reference's age fields use current_date(); here ``as_of`` is an
  injected parameter (tests pin it) — same formula, reproducible result.
- the reference maps visit_concept_id 9201->'Inpatient Visit' and
  9202->'Outpatient Visit' in staging while its generator comments call
  9201 outpatient — the STAGING mapping is what downstream marts consume,
  so that is what we reproduce.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators import checks as C
from .synthetic import _choice, _maybe_null, _u

# ---------------------------------------------------------------------------
# Generator (seeded, distributed)
# ---------------------------------------------------------------------------


def generate_person(spark: SparkSession, n: int = 1000, seed: int = 42) -> DataFrame:
    base = spark.range(1, n + 1).withColumnRenamed("id", "pid")
    idx = F.col("pid")
    age = (18 + _u("age", seed, idx) * 72).cast("int")
    yob = (2024 - age).cast("long")
    month = (1 + _u("mob", seed, idx) * 12).cast("long") % 12 + 1
    day = (1 + _u("dob", seed, idx) * 28).cast("long") % 28 + 1
    return base.select(
        idx.cast("long").alias("person_id"),
        _choice("gender", seed, [8507, 8507, 8532, 8532], idx).cast("long").alias(
            "gender_concept_id"
        ),
        yob.alias("year_of_birth"),
        month.alias("month_of_birth"),
        day.alias("day_of_birth"),
        F.make_timestamp(
            yob.cast("int"), month.cast("int"), day.cast("int"),
            F.lit(0), F.lit(0), F.lit(0),
        ).alias("birth_datetime"),
        _choice("race", seed, [8527, 8527, 8527, 8516, 8515, 8557], idx)
        .cast("long")
        .alias("race_concept_id"),
        _choice("eth", seed, [38003563, 38003563, 38003563, 38003564], idx)
        .cast("long")
        .alias("ethnicity_concept_id"),
    )


def generate_visit_occurrence(
    spark: SparkSession, n_persons: int = 1000, seed: int = 42
) -> DataFrame:
    base = spark.range(1, n_persons + 1).select(
        F.col("id").alias("person_id"),
        F.explode(
            F.sequence(
                F.lit(1),
                (1 + F.pmod(F.xxhash64(F.lit("nv"), F.col("id"), F.lit(seed)), F.lit(5))).cast("int"),
            )
        ).alias("k"),
    )
    rid = F.col("person_id") * 11 + F.col("k")
    concept = F.when(_u("vtype", seed, rid) < 0.8, 9202).otherwise(9201)  # mostly outpatient
    start_days = (_u("vstart", seed, rid) * 700).cast("int")
    start = F.date_add(F.lit("2022-01-01").cast("date"), start_days)
    los = F.when(concept == 9201, (1 + _u("los", seed, rid) * 4).cast("int")).otherwise(0)
    end = F.date_add(start, los.cast("int"))
    return base.select(
        (F.col("person_id") * 100 + F.col("k")).cast("long").alias("visit_occurrence_id"),
        F.col("person_id").cast("long"),
        concept.cast("long").alias("visit_concept_id"),
        start.alias("visit_start_date"),
        start.cast("timestamp").alias("visit_start_datetime"),
        end.alias("visit_end_date"),
        end.cast("timestamp").alias("visit_end_datetime"),
        F.lit(44818517).cast("long").alias("visit_type_concept_id"),
    )


_CONDITIONS = [401267002, 44054006, 13645005, 22298006, 40481000119105, 56717001, 195967001]
_MEASUREMENTS = [  # concept_id, mean, sd
    (3000963, 13.5, 2.0), (3013682, 7.5, 2.5), (3004249, 95.0, 15.0),
    (3027018, 1.0, 0.3), (3028437, 190.0, 40.0), (3027114, 140.0, 3.0),
    (3019550, 4.0, 0.5),
]


def generate_condition_occurrence(visits: DataFrame, seed: int = 42) -> DataFrame:
    base = visits.select(
        "person_id", "visit_occurrence_id", "visit_start_date", "visit_end_date",
        F.explode(
            F.sequence(
                F.lit(1),
                F.pmod(
                    F.xxhash64(F.lit("nc"), F.col("visit_occurrence_id"), F.lit(seed)),
                    F.lit(4),
                ).cast("int"),
            )
        ).alias("k"),
    )
    rid = F.col("visit_occurrence_id") * 7 + F.col("k")
    return base.select(
        (F.col("visit_occurrence_id") * 10 + F.col("k")).cast("long").alias(
            "condition_occurrence_id"
        ),
        F.col("person_id"),
        _choice("cond", seed, _CONDITIONS, rid).cast("long").alias("condition_concept_id"),
        F.col("visit_start_date").alias("condition_start_date"),
        F.col("visit_end_date").alias("condition_end_date"),
        F.lit(32020).cast("long").alias("condition_type_concept_id"),
        F.col("visit_occurrence_id"),
    )


def generate_measurement(visits: DataFrame, seed: int = 42) -> DataFrame:
    base = visits.select(
        "person_id", "visit_occurrence_id", "visit_start_date",
        F.explode(
            F.sequence(
                F.lit(1),
                (1 + F.pmod(
                    F.xxhash64(F.lit("nm"), F.col("visit_occurrence_id"), F.lit(seed)),
                    F.lit(8),
                )).cast("int"),
            )
        ).alias("k"),
    )
    rid = F.col("visit_occurrence_id") * 13 + F.col("k")
    m = _choice("mconcept", seed, list(range(len(_MEASUREMENTS))), rid)
    mean = F.array(*[F.lit(x[1]) for x in _MEASUREMENTS])[m]
    sd = F.array(*[F.lit(x[2]) for x in _MEASUREMENTS])[m]
    concept = F.array(*[F.lit(x[0]) for x in _MEASUREMENTS])[m]
    # Box-Muller from two deterministic uniforms; 5% 3-sigma outliers
    u1 = F.greatest(_u("mu1", seed, rid), F.lit(1e-9))
    u2 = _u("mu2", seed, rid)
    z = F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * 3.141592653589793 * u2)
    z = F.when(_u("outlier", seed, rid) < 0.05, z + 3.0).otherwise(z)
    value = F.round(F.greatest(mean + sd * z, F.lit(0.0)), 2)
    return base.select(
        (F.col("visit_occurrence_id") * 20 + F.col("k")).cast("long").alias("measurement_id"),
        F.col("person_id"),
        concept.cast("long").alias("measurement_concept_id"),
        F.col("visit_start_date").alias("measurement_date"),
        F.lit(44818701).cast("long").alias("measurement_type_concept_id"),
        _maybe_null(value, "mval", seed, 0.02, rid).alias("value_as_number"),
        F.col("visit_occurrence_id"),
    )


def generate_cdm(spark: SparkSession, n_persons: int = 1000, seed: int = 42) -> dict[str, DataFrame]:
    person = generate_person(spark, n_persons, seed)
    visits = generate_visit_occurrence(spark, n_persons, seed)
    return {
        "person": person,
        "visit_occurrence": visits,
        "condition_occurrence": generate_condition_occurrence(visits, seed),
        "measurement": generate_measurement(visits, seed),
    }


# ---------------------------------------------------------------------------
# Staging + mart (analytics/dbt/models/public_cdm/*)
# ---------------------------------------------------------------------------


def staging_person(person: DataFrame, as_of_year: int = 2026) -> DataFrame:
    yob = F.col("year_of_birth")
    return person.filter(F.col("person_id").isNotNull()).select(
        "person_id",
        "gender_concept_id",
        "year_of_birth",
        "race_concept_id",
        "ethnicity_concept_id",
        (F.lit(as_of_year) - yob).cast("long").alias("age_years"),
        F.when(yob.isNull(), "Missing birth year")
        .when((yob < 1900) | (yob > as_of_year), "Invalid birth year")
        .alias("birth_year_quality_flag"),
    )


def staging_visit_occurrence(visits: DataFrame) -> DataFrame:
    start, end = F.col("visit_start_date"), F.col("visit_end_date")
    los = F.datediff(end, start)
    return visits.filter(
        F.col("visit_occurrence_id").isNotNull() & F.col("person_id").isNotNull()
    ).select(
        "visit_occurrence_id",
        "person_id",
        "visit_concept_id",
        "visit_start_date",
        "visit_end_date",
        los.alias("length_of_stay_days"),
        F.when(F.col("visit_concept_id") == 9201, "Inpatient Visit")
        .when(F.col("visit_concept_id") == 9202, "Outpatient Visit")
        .when(F.col("visit_concept_id") == 9203, "Emergency Room Visit")
        .otherwise("Other")
        .alias("visit_type_name"),
        F.when(start.isNull(), "Missing start date")
        .when(end.isNull(), "Missing end date")
        .when(end < start, "End before start")
        .when(los > 365, "Excessive length of stay")
        .alias("visit_quality_flag"),
    )


def mart_patient_summary(
    person: DataFrame,
    visits: DataFrame,
    conditions: DataFrame,
    measurements: DataFrame,
    as_of_year: int = 2026,
) -> DataFrame:
    """Patient summary: demographics <- visit/condition/measurement fan-in
    + complexity score (mart_patient_summary.sql)."""
    p = staging_person(person, as_of_year)
    v = staging_visit_occurrence(visits)
    vsum = v.groupBy("person_id").agg(
        F.count(F.lit(1)).alias("total_visits"),
        F.countDistinct("visit_concept_id").alias("unique_visit_types"),
        F.min("visit_start_date").alias("first_visit_date"),
        F.max("visit_end_date").alias("last_visit_date"),
        F.sum("length_of_stay_days").alias("total_los_days"),
        F.round(F.avg("length_of_stay_days"), 6).alias("avg_los_days"),
        F.sum(F.when(F.col("visit_type_name") == "Inpatient Visit", 1).otherwise(0)).alias("inpatient_visits"),
        F.sum(F.when(F.col("visit_type_name") == "Outpatient Visit", 1).otherwise(0)).alias("outpatient_visits"),
        F.sum(F.when(F.col("visit_type_name") == "Emergency Room Visit", 1).otherwise(0)).alias("er_visits"),
    )
    csum = conditions.groupBy("person_id").agg(
        F.count(F.lit(1)).alias("total_conditions"),
        F.countDistinct("condition_concept_id").alias("unique_conditions"),
    )
    msum = measurements.groupBy("person_id").agg(
        F.count(F.lit(1)).alias("total_measurements"),
        F.countDistinct("measurement_concept_id").alias("unique_measurement_types"),
    )
    out = (
        p.join(vsum, "person_id", "left")
        .join(csum, "person_id", "left")
        .join(msum, "person_id", "left")
    )
    complexity = (
        F.coalesce("total_visits", F.lit(0)) * 0.1
        + F.coalesce("unique_conditions", F.lit(0)) * 0.5
        + F.coalesce("inpatient_visits", F.lit(0)) * 2.0
    )
    return out.select(
        "person_id",
        "gender_concept_id",
        "year_of_birth",
        "race_concept_id",
        "ethnicity_concept_id",
        "age_years",
        F.coalesce("total_visits", F.lit(0)).alias("total_visits"),
        F.coalesce("unique_visit_types", F.lit(0)).alias("unique_visit_types"),
        "first_visit_date",
        "last_visit_date",
        F.coalesce("total_los_days", F.lit(0)).alias("total_los_days"),
        F.coalesce("avg_los_days", F.lit(0.0)).alias("avg_los_days"),
        F.coalesce("inpatient_visits", F.lit(0)).alias("inpatient_visits"),
        F.coalesce("outpatient_visits", F.lit(0)).alias("outpatient_visits"),
        F.coalesce("er_visits", F.lit(0)).alias("er_visits"),
        F.coalesce("total_conditions", F.lit(0)).alias("total_conditions"),
        F.coalesce("unique_conditions", F.lit(0)).alias("unique_conditions"),
        F.coalesce("total_measurements", F.lit(0)).alias("total_measurements"),
        F.coalesce("unique_measurement_types", F.lit(0)).alias("unique_measurement_types"),
        F.round(complexity, 6).alias("complexity_score"),
        F.when(F.col("birth_year_quality_flag").isNotNull(), F.col("birth_year_quality_flag"))
        .when(F.coalesce("total_visits", F.lit(0)) == 0, "No visits recorded")
        .otherwise("Good")
        .alias("data_quality_status"),
    )


# ---------------------------------------------------------------------------
# Validation profile (pandera_public.py semantics)
# ---------------------------------------------------------------------------

PERSON_RULES = [
    C.not_null("person_id"),
    C.unique("person_id"),
    C.in_range("person_id", lo=1),
    C.accepted_values("gender_concept_id", [8507, 8532, 8551, 0]),
    C.in_range("year_of_birth", 1900, 2024),
    C.in_range("month_of_birth", 1, 12),
    C.in_range("day_of_birth", 1, 31),
]

VISIT_RULES = [
    C.not_null("visit_occurrence_id"),
    C.unique("visit_occurrence_id"),
    C.not_null("person_id"),
    C.accepted_values("visit_concept_id", [9201, 9202, 9203]),
    C.cross_column("end_after_start", "visit_end_date >= visit_start_date"),
    C.cross_column("los_bounded", "datediff(visit_end_date, visit_start_date) <= 365"),
]


def validate_cdm(cdm: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Run the public-CDM rule profiles (one pass per table) + FK probes."""
    return {
        "person": C.check_report(cdm["person"], PERSON_RULES),
        "visit_occurrence": C.check_report(cdm["visit_occurrence"], VISIT_RULES),
        "fk_visit_person": C.referential_violations(
            cdm["visit_occurrence"], cdm["person"], "person_id", "person_id"
        ),
        "fk_condition_person": C.referential_violations(
            cdm["condition_occurrence"], cdm["person"], "person_id", "person_id"
        ),
        "fk_measurement_person": C.referential_violations(
            cdm["measurement"], cdm["person"], "person_id", "person_id"
        ),
    }

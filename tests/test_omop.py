"""OMOP public-CDM layer tests: generator invariants (the reference's
smoke suite, test_public_cdm_smoke.py:48-140) + mart vs DuckDB oracle."""

from __future__ import annotations

import duckdb
import pytest

from clinical_data_platform_spark.clinical import omop

from .helpers import assert_frames_match

N = 300


@pytest.fixture(scope="module")
def cdm(spark):
    return {k: v.cache() for k, v in omop.generate_cdm(spark, N, seed=42).items()}


@pytest.fixture(scope="module")
def cdm_duck(cdm):
    con = duckdb.connect()
    for name, df in cdm.items():
        con.register(f"pdf_{name}", df.toPandas())
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM pdf_{name}")
    return con


def test_cdm_invariants(spark, cdm):
    person = cdm["person"]
    assert person.count() == N
    reports = omop.validate_cdm(cdm)
    person_report = reports["person"].toPandas().set_index("rule")
    assert person_report["passed"].all(), person_report
    visit_report = reports["visit_occurrence"].toPandas().set_index("rule")
    assert visit_report["passed"].all(), visit_report
    for fk in ["fk_visit_person", "fk_condition_person", "fk_measurement_person"]:
        assert reports[fk].count() == 0, fk


def test_cdm_determinism(spark):
    a = omop.generate_cdm(spark, 50, seed=42)
    b = omop.generate_cdm(spark, 50, seed=42)
    for k in a:
        assert a[k].exceptAll(b[k]).count() == 0, k


def test_mart_patient_summary_oracle(cdm, cdm_duck):
    sdf = omop.mart_patient_summary(
        cdm["person"],
        cdm["visit_occurrence"],
        cdm["condition_occurrence"],
        cdm["measurement"],
        as_of_year=2026,
    )
    odf = cdm_duck.execute(
        """
        WITH p AS (
          SELECT person_id, gender_concept_id, year_of_birth,
                 cast(2026 - year_of_birth AS BIGINT) AS age_years,
                 CASE WHEN year_of_birth IS NULL THEN 'Missing birth year'
                      WHEN year_of_birth < 1900 OR year_of_birth > 2026
                           THEN 'Invalid birth year' END AS byqf
          FROM person WHERE person_id IS NOT NULL
        ), v AS (
          SELECT visit_occurrence_id, person_id, visit_concept_id,
                 visit_start_date, visit_end_date,
                 date_diff('day', visit_start_date, visit_end_date) AS los,
                 CASE WHEN visit_concept_id = 9201 THEN 'Inpatient Visit'
                      WHEN visit_concept_id = 9202 THEN 'Outpatient Visit'
                      WHEN visit_concept_id = 9203 THEN 'Emergency Room Visit'
                      ELSE 'Other' END AS vtn
          FROM visit_occurrence
          WHERE visit_occurrence_id IS NOT NULL AND person_id IS NOT NULL
        ), vs AS (
          SELECT person_id, count(*) AS total_visits,
                 count(DISTINCT visit_concept_id) AS unique_visit_types,
                 cast(sum(los) AS BIGINT) AS total_los_days,
                 round(avg(los), 6) AS avg_los_days,
                 cast(sum(CASE WHEN vtn = 'Inpatient Visit' THEN 1 ELSE 0 END) AS BIGINT) AS inpatient_visits,
                 cast(sum(CASE WHEN vtn = 'Outpatient Visit' THEN 1 ELSE 0 END) AS BIGINT) AS outpatient_visits
          FROM v GROUP BY person_id
        ), cs AS (
          SELECT person_id, count(*) AS total_conditions,
                 count(DISTINCT condition_concept_id) AS unique_conditions
          FROM condition_occurrence GROUP BY person_id
        ), ms AS (
          SELECT person_id, count(*) AS total_measurements
          FROM measurement GROUP BY person_id
        )
        SELECT p.person_id, p.age_years,
               cast(coalesce(vs.total_visits, 0) AS BIGINT) AS total_visits,
               cast(coalesce(vs.unique_visit_types, 0) AS BIGINT) AS unique_visit_types,
               cast(coalesce(vs.total_los_days, 0) AS BIGINT) AS total_los_days,
               coalesce(vs.avg_los_days, 0.0) AS avg_los_days,
               cast(coalesce(vs.inpatient_visits, 0) AS BIGINT) AS inpatient_visits,
               cast(coalesce(vs.outpatient_visits, 0) AS BIGINT) AS outpatient_visits,
               cast(coalesce(cs.total_conditions, 0) AS BIGINT) AS total_conditions,
               cast(coalesce(cs.unique_conditions, 0) AS BIGINT) AS unique_conditions,
               cast(coalesce(ms.total_measurements, 0) AS BIGINT) AS total_measurements,
               round(coalesce(vs.total_visits, 0) * 0.1
                     + coalesce(cs.unique_conditions, 0) * 0.5
                     + coalesce(vs.inpatient_visits, 0) * 2.0, 6) AS complexity_score,
               CASE WHEN p.byqf IS NOT NULL THEN p.byqf
                    WHEN coalesce(vs.total_visits, 0) = 0 THEN 'No visits recorded'
                    ELSE 'Good' END AS data_quality_status
        FROM p
        LEFT JOIN vs ON p.person_id = vs.person_id
        LEFT JOIN cs ON p.person_id = cs.person_id
        LEFT JOIN ms ON p.person_id = ms.person_id
        """
    ).fetchdf()
    cols = list(odf.columns)
    assert_frames_match(sdf.select(*cols), odf, context="mart_patient_summary")

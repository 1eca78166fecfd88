"""End-to-end clinical parity tests: synthetic silver -> star -> marts ->
analytics, each compared against a DuckDB oracle running an independent SQL
formulation of the reference semantics over the SAME silver tables.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from clinical_data_platform_spark.clinical import analytics as A
from clinical_data_platform_spark.clinical import marts as M
from clinical_data_platform_spark.clinical import star as S
from clinical_data_platform_spark.clinical.features import subject_level_features
from clinical_data_platform_spark.clinical.synthetic import generate_all

from .helpers import assert_frames_match

# ---------------------------------------------------------------------------
# Synthetic-data invariants (FIXTURES.md §5, test_public_cdm_smoke.py shape)
# ---------------------------------------------------------------------------


def test_generator_determinism(spark):
    a = generate_all(spark, 50, seed=42)
    b = generate_all(spark, 50, seed=42)
    for k in a:
        assert a[k].exceptAll(b[k]).count() == 0, k
        assert b[k].exceptAll(a[k]).count() == 0, k


def test_dm_invariants(silver):
    dm = silver["DM"]
    n = dm.count()
    assert dm.select("SUBJID").distinct().count() == n  # PK unique
    assert dm.filter(F.col("SEX") == "X").count() == 1  # injected violation
    # nulls present in every nullable column
    for c in ["ARM", "SEX", "AGE"]:
        assert dm.filter(F.col(c).isNull()).count() > 0, c


def test_fk_containment(silver):
    dm = silver["DM"].select("SUBJID")
    for dom in ["AE", "LB", "VS", "EX"]:
        orphans = silver[dom].join(dm, "SUBJID", "left_anti").count()
        assert orphans == 0, dom


# ---------------------------------------------------------------------------
# Star schema
# ---------------------------------------------------------------------------


def test_dim_surrogate_key_refuses_fact_sized_input(spark):
    """Scale guard: global row_number surrogate keys serialize through one
    task; beyond the cap build_dim_subject must raise and point at the md5
    hash key (W4)."""
    import pytest

    big = spark.range(25).select(
        F.concat(F.lit("SUBJ"), F.col("id")).alias("SUBJID"),
        F.lit("A").alias("ARM"), F.lit("F").alias("SEX"), F.lit(40).alias("AGE"),
    )
    with pytest.raises(ValueError, match="md5 hash key"):
        S.build_dim_subject(big, max_rows=10)
    assert S.build_dim_subject(big, max_rows=25).count() == 25


def test_star_schema(spark, silver, duck):
    star = S.build_star(spark, silver)
    dim = star["dim_subject"].toPandas()
    n = len(dim)
    assert sorted(dim["subject_sk"]) == list(range(1, n + 1))
    # deterministic: sk ordered by subject_id
    assert list(dim.sort_values("subject_sk")["subject_id"]) == sorted(dim["subject_id"])

    odf = duck.execute(
        """
        WITH ds AS (SELECT row_number() OVER (ORDER BY SUBJID) AS subject_sk,
                           SUBJID AS subject_id FROM dm)
        SELECT s.subject_sk, CAST(a.AESTDTC AS DATE) AS ae_start,
               a.AESEV AS severity, a.AESER AS seriousness
        FROM ae a JOIN ds s ON s.subject_id = a.SUBJID
        """
    ).fetchdf()
    sdf = star["fact_adverse_events"].select(
        "subject_sk", "ae_start", "severity", "seriousness"
    )
    assert_frames_match(sdf, odf, context="fact_adverse_events")


# ---------------------------------------------------------------------------
# Marts DAG vs DuckDB oracle
# ---------------------------------------------------------------------------

_STAGING_SQL = """
WITH stg_dm AS (
  SELECT STUDYID AS studyid, SUBJID AS subjid,
         coalesce(ARM, 'UNKNOWN') AS treatment_arm,
         upper(coalesce(SEX, 'U')) AS sex, AGE AS age,
         CASE WHEN AGE < 18 THEN 'PEDIATRIC'
              WHEN AGE >= 18 AND AGE < 65 THEN 'ADULT'
              WHEN AGE >= 65 THEN 'ELDERLY' ELSE 'UNKNOWN' END AS age_group,
         CASE WHEN SEX = 'M' THEN 'MALE' WHEN SEX = 'F' THEN 'FEMALE'
              ELSE 'UNKNOWN' END AS sex_desc
  FROM dm WHERE STUDYID = 'STUDY001'
), stg_ae AS (
  SELECT SUBJID AS subjid,
         upper(coalesce(AESEV, 'UNKNOWN')) AS severity,
         coalesce(AESER, false) AS is_serious,
         CASE WHEN AEENDTC IS NULL AND AEOUT != 'FATAL' THEN true ELSE false END AS is_ongoing,
         CASE WHEN AESEV = 'MILD' THEN 1 WHEN AESEV = 'MODERATE' THEN 2
              WHEN AESEV = 'SEVERE' THEN 3 ELSE 0 END AS severity_rank
  FROM ae WHERE STUDYID = 'STUDY001'
), stg_lb AS (
  SELECT SUBJID AS subjid, upper(LBTESTCD) AS test_code,
         CASE WHEN LBORRES IS NULL THEN 'MISSING'
              WHEN LBLNOR IS NOT NULL AND LBORRES < LBLNOR THEN 'LOW'
              WHEN LBHNOR IS NOT NULL AND LBORRES > LBHNOR THEN 'HIGH'
              WHEN LBLNOR IS NOT NULL AND LBHNOR IS NOT NULL
                   AND LBORRES >= LBLNOR AND LBORRES <= LBHNOR THEN 'NORMAL'
              ELSE 'UNKNOWN' END AS result_flag,
         CASE WHEN LBTESTCD IN ('ALT','AST','BILI','ALP') THEN 'LIVER_FUNCTION'
              WHEN LBTESTCD IN ('CREAT','BUN','UREA') THEN 'KIDNEY_FUNCTION'
              ELSE 'OTHER' END AS test_category
  FROM lb WHERE STUDYID = 'STUDY001'
), stg_vs AS (
  SELECT SUBJID AS subjid, upper(VSTESTCD) AS test_code,
         CASE WHEN VSTESTCD = 'HR' AND VSORRES IS NOT NULL THEN
                CASE WHEN VSORRES < 60 THEN 'BRADYCARDIA'
                     WHEN VSORRES >= 60 AND VSORRES <= 100 THEN 'NORMAL'
                     WHEN VSORRES > 100 THEN 'TACHYCARDIA' ELSE 'UNKNOWN' END
              ELSE 'N/A' END AS clinical_flag
  FROM vs WHERE STUDYID = 'STUDY001'
), stg_ex AS (
  SELECT SUBJID AS subjid,
         CASE WHEN EXSTDTC IS NOT NULL AND EXENDTC IS NOT NULL
              THEN date_diff('day', CAST(EXSTDTC AS DATE), CAST(EXENDTC AS DATE)) + 1
              END AS treatment_duration_days,
         CASE WHEN EXENDTC IS NULL THEN true ELSE false END AS is_ongoing_treatment,
         CASE WHEN lower(EXTRT) LIKE '%placebo%' THEN 'PLACEBO'
              WHEN lower(EXTRT) LIKE '%active%' OR lower(EXTRT) LIKE '%drug%' THEN 'ACTIVE_TREATMENT'
              WHEN EXTRT IS NULL THEN 'UNKNOWN' ELSE 'OTHER' END AS treatment_category
  FROM ex WHERE STUDYID = 'STUDY001'
)
"""

_SUMMARY_SQL = _STAGING_SQL + """
, ae_g AS (
  SELECT subjid, count(*) AS total_aes,
         sum(CASE WHEN is_serious THEN 1 ELSE 0 END) AS serious_aes,
         sum(CASE WHEN severity = 'SEVERE' THEN 1 ELSE 0 END) AS severe_aes,
         sum(CASE WHEN is_ongoing THEN 1 ELSE 0 END) AS ongoing_aes,
         max(severity_rank) AS max_severity_rank,
         count(DISTINCT CASE WHEN is_serious THEN subjid END) AS has_serious_ae
  FROM stg_ae GROUP BY subjid
), lb_g AS (
  SELECT subjid, count(*) AS total_lab_tests,
         count(DISTINCT test_code) AS unique_lab_tests,
         sum(CASE WHEN result_flag = 'ABNORMAL' THEN 1 ELSE 0 END) AS abnormal_lab_results,
         count(DISTINCT test_category) AS lab_categories_tested
  FROM stg_lb GROUP BY subjid
), vs_g AS (
  SELECT subjid, count(*) AS total_vital_measurements,
         count(DISTINCT test_code) AS unique_vital_tests,
         sum(CASE WHEN clinical_flag NOT IN ('NORMAL','N/A') THEN 1 ELSE 0 END) AS abnormal_vitals
  FROM stg_vs GROUP BY subjid
), ex_g AS (
  SELECT subjid, count(*) AS total_exposures,
         max(treatment_duration_days) AS max_treatment_duration,
         count(CASE WHEN is_ongoing_treatment THEN 1 END) AS ongoing_treatments,
         string_agg(DISTINCT treatment_category, ', ' ORDER BY treatment_category) AS treatment_categories
  FROM stg_ex GROUP BY subjid
), summary AS (
  SELECT d.studyid, d.subjid, d.treatment_arm, d.sex, d.sex_desc, d.age, d.age_group,
         cast(coalesce(a.total_aes, 0) AS BIGINT) AS total_adverse_events,
         cast(coalesce(a.serious_aes, 0) AS BIGINT) AS serious_adverse_events,
         cast(coalesce(a.severe_aes, 0) AS BIGINT) AS severe_adverse_events,
         cast(coalesce(a.ongoing_aes, 0) AS BIGINT) AS ongoing_adverse_events,
         cast(coalesce(a.max_severity_rank, 0) AS INTEGER) AS max_ae_severity_rank,
         CASE WHEN a.has_serious_ae > 0 THEN true ELSE false END AS has_serious_adverse_event,
         cast(coalesce(l.total_lab_tests, 0) AS BIGINT) AS total_lab_tests,
         cast(coalesce(l.unique_lab_tests, 0) AS BIGINT) AS unique_lab_tests,
         cast(coalesce(l.abnormal_lab_results, 0) AS BIGINT) AS abnormal_lab_results,
         cast(coalesce(l.lab_categories_tested, 0) AS BIGINT) AS lab_categories_tested,
         CASE WHEN l.total_lab_tests > 0
              THEN round(cast(l.abnormal_lab_results AS DOUBLE) / l.total_lab_tests, 3)
              ELSE 0.0 END AS abnormal_lab_rate,
         cast(coalesce(v.total_vital_measurements, 0) AS BIGINT) AS total_vital_measurements,
         cast(coalesce(v.unique_vital_tests, 0) AS BIGINT) AS unique_vital_tests,
         cast(coalesce(v.abnormal_vitals, 0) AS BIGINT) AS abnormal_vitals,
         CASE WHEN v.total_vital_measurements > 0
              THEN round(cast(v.abnormal_vitals AS DOUBLE) / v.total_vital_measurements, 3)
              ELSE 0.0 END AS abnormal_vital_rate,
         cast(coalesce(e.total_exposures, 0) AS BIGINT) AS total_exposures,
         cast(coalesce(e.max_treatment_duration, 0) AS BIGINT) AS max_treatment_duration,
         cast(coalesce(e.ongoing_treatments, 0) AS BIGINT) AS ongoing_treatments,
         coalesce(e.treatment_categories, 'NONE') AS treatment_categories,
         CASE WHEN a.serious_aes > 0 OR a.severe_aes > 0 THEN 'HIGH_RISK'
              WHEN a.total_aes > 5 THEN 'MEDIUM_RISK'
              WHEN a.total_aes > 0 THEN 'LOW_RISK'
              ELSE 'NO_EVENTS' END AS safety_risk_category,
         CASE WHEN a.total_aes > 0 THEN 1 ELSE 0 END AS has_ae_data,
         CASE WHEN l.total_lab_tests > 0 THEN 1 ELSE 0 END AS has_lab_data,
         CASE WHEN v.total_vital_measurements > 0 THEN 1 ELSE 0 END AS has_vital_data,
         CASE WHEN e.total_exposures > 0 THEN 1 ELSE 0 END AS has_exposure_data
  FROM stg_dm d
  LEFT JOIN ae_g a ON d.subjid = a.subjid
  LEFT JOIN lb_g l ON d.subjid = l.subjid
  LEFT JOIN vs_g v ON d.subjid = v.subjid
  LEFT JOIN ex_g e ON d.subjid = e.subjid
)
"""


def test_int_subject_summary_oracle(silver, duck):
    marts = M.build_marts(silver)
    cols = [
        "subjid", "treatment_arm", "sex", "age_group",
        "total_adverse_events", "serious_adverse_events", "severe_adverse_events",
        "ongoing_adverse_events", "max_ae_severity_rank", "has_serious_adverse_event",
        "total_lab_tests", "unique_lab_tests", "abnormal_lab_results",
        "lab_categories_tested", "abnormal_lab_rate",
        "total_vital_measurements", "unique_vital_tests", "abnormal_vitals",
        "abnormal_vital_rate", "total_exposures", "max_treatment_duration",
        "ongoing_treatments", "treatment_categories", "safety_risk_category",
        "has_ae_data", "has_lab_data", "has_vital_data", "has_exposure_data",
    ]
    odf = duck.execute(_SUMMARY_SQL + f"SELECT {', '.join(cols)} FROM summary").fetchdf()
    sdf = marts["int_subject_summary"].select(
        *[F.col(c).cast("int").alias(c) if c == "max_ae_severity_rank" else c for c in cols]
    )
    assert_frames_match(sdf, odf, context="int_subject_summary")


def test_fact_subject_outcomes_oracle(silver, duck):
    marts = M.build_marts(silver)
    sql = _SUMMARY_SQL + """
    SELECT md5(coalesce(cast(subjid AS VARCHAR), '_dbt_utils_surrogate_key_null_')) AS subject_key,
           subjid,
           cast(has_ae_data + has_lab_data + has_vital_data + has_exposure_data AS DOUBLE) / 4.0
               AS data_completeness_score,
           CASE WHEN abnormal_lab_rate > 0.3 AND abnormal_vital_rate > 0.2 THEN 'MULTIPLE_ABNORMALITIES'
                WHEN abnormal_lab_rate > 0.5 THEN 'HIGH_LAB_ABNORMALITIES'
                WHEN abnormal_vital_rate > 0.3 THEN 'HIGH_VITAL_ABNORMALITIES'
                WHEN has_serious_adverse_event THEN 'SERIOUS_SAFETY_CONCERN'
                ELSE 'NORMAL_PROFILE' END AS clinical_profile,
           CASE WHEN (has_ae_data + has_lab_data + has_vital_data + has_exposure_data) / 4.0 >= 0.8
                     THEN 'HIGH_QUALITY'
                WHEN (has_ae_data + has_lab_data + has_vital_data + has_exposure_data) / 4.0 >= 0.5
                     THEN 'MEDIUM_QUALITY'
                ELSE 'LOW_QUALITY' END AS participation_quality
    FROM summary
    """
    odf = duck.execute(sql).fetchdf()
    sdf = marts["fact_subject_outcomes"].select(
        "subject_key", "subjid", "data_completeness_score", "clinical_profile",
        "participation_quality",
    )
    assert_frames_match(sdf, odf, context="fact_subject_outcomes")


def test_dim_study_overview_oracle(silver, duck):
    marts = M.build_marts(silver)
    sql = _SUMMARY_SQL + """
    , scored AS (
      SELECT *,
             cast(has_ae_data + has_lab_data + has_vital_data + has_exposure_data AS DOUBLE) / 4.0 AS score
      FROM summary
    ), g AS (
      SELECT count(*) AS total_subjects,
             count(DISTINCT treatment_arm) AS treatment_arms_count,
             count(CASE WHEN sex = 'M' THEN 1 END) AS male_subjects,
             count(CASE WHEN sex = 'F' THEN 1 END) AS female_subjects,
             round(avg(age), 1) AS mean_age,
             quantile_cont(age, 0.5) AS median_age,
             min(age) AS min_age, max(age) AS max_age,
             cast(sum(total_adverse_events) AS BIGINT) AS total_adverse_events_study,
             count(CASE WHEN has_serious_adverse_event THEN 1 END) AS subjects_with_serious_aes,
             avg(score) AS avg_data_completeness
      FROM scored
    )
    SELECT total_subjects, treatment_arms_count, male_subjects, female_subjects,
           mean_age, median_age, min_age, max_age, total_adverse_events_study,
           subjects_with_serious_aes,
           round(cast(male_subjects AS DOUBLE) / total_subjects * 100, 1) AS male_percentage,
           round(cast(subjects_with_serious_aes AS DOUBLE) / total_subjects * 100, 1) AS serious_ae_rate_percent,
           round(avg_data_completeness * 100, 1) AS avg_data_completeness_percent
    FROM g
    """
    odf = duck.execute(sql).fetchdf()
    sdf = marts["dim_study_overview"].select(
        "total_subjects", "treatment_arms_count", "male_subjects", "female_subjects",
        "mean_age", F.col("median_age").cast("double").alias("median_age"),
        "min_age", "max_age", "total_adverse_events_study",
        "subjects_with_serious_aes", "male_percentage", "serious_ae_rate_percent",
        "avg_data_completeness_percent",
    )
    assert_frames_match(sdf, odf, context="dim_study_overview")


# ---------------------------------------------------------------------------
# Curated analytics vs oracle over the same star
# ---------------------------------------------------------------------------


def test_analytics_queries_oracle(spark, silver, duck):
    star = S.build_star(spark, silver)
    odf = duck.execute(
        """
        WITH ds AS (SELECT row_number() OVER (ORDER BY SUBJID) AS subject_sk,
                           SUBJID AS subject_id, ARM AS arm FROM dm),
        fae AS (SELECT s.subject_sk, CAST(a.AESTDTC AS DATE) AS ae_start, a.AESEV AS severity
                FROM ae a JOIN ds s ON s.subject_id = a.SUBJID)
        SELECT s.arm, CAST(date_part('day', ae_start) AS INTEGER) AS visit_day,
               round(avg(CASE WHEN severity IN ('SEVERE','SERIOUS') THEN 1 ELSE 0 END), 6) AS severe_rate
        FROM fae f JOIN ds s USING(subject_sk)
        GROUP BY s.arm, visit_day
        """
    ).fetchdf()
    sdf = A.ae_rates_by_arm(star["fact_adverse_events"], star["dim_subject"])
    assert_frames_match(sdf, odf, context="ae_rates_by_arm")

    odf2 = duck.execute(
        """
        WITH ds AS (SELECT row_number() OVER (ORDER BY SUBJID) AS subject_sk,
                           SUBJID AS subject_id, ARM AS arm FROM dm),
        fl AS (SELECT s.subject_sk, l.LBORRES AS value, l.LBLNOR AS low_norm, l.LBHNOR AS high_norm
               FROM lb l JOIN ds s ON s.subject_id = l.SUBJID)
        SELECT s.arm, count(*) AS n,
               round(avg(CASE WHEN value > high_norm OR value < low_norm THEN 1 ELSE 0 END), 6) AS abn_rate
        FROM fl f JOIN ds s USING(subject_sk)
        GROUP BY s.arm
        """
    ).fetchdf()
    sdf2 = A.lab_abnormality_rates(star["fact_labs"], star["dim_subject"])
    assert_frames_match(sdf2, odf2, context="lab_abnormality_rates")

    odf3 = duck.execute(
        """
        WITH ds AS (SELECT row_number() OVER (ORDER BY SUBJID) AS subject_sk,
                           SUBJID AS subject_id, ARM AS arm FROM dm)
        SELECT s.arm, upper(v.VSTESTCD) AS vs_code,
               round(avg(v.VSORRES), 6) AS mean_value,
               round(stddev(v.VSORRES), 6) AS sd_value,
               count(*) AS n
        FROM vs v JOIN ds s ON s.subject_id = v.SUBJID
        GROUP BY s.arm, vs_code
        """
    ).fetchdf()
    sdf3 = A.vital_trend_summaries(
        star["fact_vitals"], star["dim_subject"], star["dim_measurement"]
    )
    assert_frames_match(sdf3, odf3, context="vital_trend_summaries")


def test_subject_features_oracle(silver, duck):
    odf = duck.execute(
        """
        WITH c AS (SELECT STUDYID, SUBJID, count(*) AS AE_COUNT FROM ae GROUP BY 1,2),
        s AS (SELECT STUDYID, SUBJID, count(*) AS SEVERE_AE_COUNT FROM ae
              WHERE AESEV IN ('SEVERE','SERIOUS') GROUP BY 1,2)
        SELECT d.SUBJID,
               cast(coalesce(c.AE_COUNT, 0) AS INTEGER) AS AE_COUNT,
               cast(coalesce(s.SEVERE_AE_COUNT, 0) AS INTEGER) AS SEVERE_AE_COUNT
        FROM dm d
        LEFT JOIN c ON c.STUDYID = d.STUDYID AND c.SUBJID = d.SUBJID
        LEFT JOIN s ON s.STUDYID = d.STUDYID AND s.SUBJID = d.SUBJID
        """
    ).fetchdf()
    sdf = subject_level_features(silver["DM"], silver["AE"]).select(
        "SUBJID", "AE_COUNT", "SEVERE_AE_COUNT"
    )
    assert_frames_match(sdf, odf, context="subject_level_features")


def test_build_adsl_oracle(silver, duck, tmp_path):
    """ADSL parity with standards/adam/build_adsl.py:10-26: DM + AE counts
    + DROPOUT_RISK=(SEVERE_AE_COUNT>0)::int, written as a named parquet."""
    from clinical_data_platform_spark.clinical.adam import build_adsl, write_adsl

    odf = duck.execute(
        """
        WITH c AS (SELECT STUDYID, SUBJID, count(*) AS AE_COUNT FROM ae GROUP BY 1,2),
        s AS (SELECT STUDYID, SUBJID, count(*) AS SEVERE_AE_COUNT FROM ae
              WHERE AESEV IN ('SEVERE','SERIOUS') GROUP BY 1,2)
        SELECT d.SUBJID, d.ARM, d.SEX,
               cast(coalesce(c.AE_COUNT, 0) AS INTEGER) AS AE_COUNT,
               cast(coalesce(s.SEVERE_AE_COUNT, 0) AS INTEGER) AS SEVERE_AE_COUNT,
               cast(coalesce(s.SEVERE_AE_COUNT, 0) > 0 AS INTEGER) AS DROPOUT_RISK
        FROM dm d
        LEFT JOIN c ON c.STUDYID = d.STUDYID AND c.SUBJID = d.SUBJID
        LEFT JOIN s ON s.STUDYID = d.STUDYID AND s.SUBJID = d.SUBJID
        """
    ).fetchdf()
    adsl = build_adsl(silver["DM"], silver["AE"])
    assert_frames_match(
        adsl.select("SUBJID", "ARM", "SEX", "AE_COUNT", "SEVERE_AE_COUNT", "DROPOUT_RISK"),
        odf,
        context="build_adsl",
    )
    # named deliverable round-trips
    import os

    path = write_adsl(silver["DM"], silver["AE"], str(tmp_path))
    assert path.endswith("ADSL.parquet") and os.path.exists(path)
    spark = silver["DM"].sparkSession
    assert spark.read.parquet(path).count() == silver["DM"].count()


def test_dashboard_chart_queries_oracle(silver, duck):
    """Every dashboard chart aggregation (clinical/dashboard.py,
    ui/dashboard.py parity) against a DuckDB oracle over the same mart."""
    from clinical_data_platform_spark.clinical import dashboard as D

    outcomes = M.build_marts(silver)["fact_subject_outcomes"]
    duck.register("pdf_outcomes", outcomes.toPandas())
    duck.execute("CREATE OR REPLACE VIEW outcomes AS SELECT * FROM pdf_outcomes")

    odf = duck.execute(
        """
        SELECT cast(count(*) AS BIGINT) AS total_subjects,
               cast(sum(total_adverse_events) AS BIGINT) AS total_aes,
               cast(sum(serious_adverse_events) AS BIGINT) AS serious_aes,
               round(avg(age), 1) AS avg_age
        FROM outcomes
        """
    ).fetchdf()
    assert_frames_match(D.overview_metrics(outcomes), odf, context="overview")

    odf = duck.execute(
        """
        SELECT safety_risk_category, cast(count(*) AS BIGINT) AS n
        FROM outcomes GROUP BY 1 ORDER BY n DESC, safety_risk_category
        """
    ).fetchdf()
    assert_frames_match(
        D.safety_risk_breakdown(outcomes), odf, context="safety_breakdown"
    )

    odf = duck.execute(
        """
        SELECT treatment_arm,
               cast(sum(total_adverse_events) AS BIGINT) AS ae_sum,
               round(avg(total_adverse_events), 4) AS ae_mean,
               cast(count(*) AS BIGINT) AS n_subjects
        FROM outcomes GROUP BY 1 ORDER BY treatment_arm
        """
    ).fetchdf()
    assert_frames_match(D.ae_by_arm(outcomes), odf, context="ae_by_arm")

    odf = duck.execute(
        """
        SELECT treatment_arm, sex, cast(count(*) AS BIGINT) AS n
        FROM outcomes GROUP BY 1,2 ORDER BY treatment_arm, sex
        """
    ).fetchdf()
    assert_frames_match(
        D.demographics_by_arm_sex(outcomes), odf, context="demographics"
    )

    # age histogram: bins cover all non-null ages, edges uniform
    hist = D.age_histogram(outcomes, nbins=20).toPandas()
    n_ages = outcomes.filter(F.col("age").isNotNull()).count()
    assert hist["n"].sum() == n_ages
    assert (hist["bin_hi"] - hist["bin_lo"]).round(3).nunique() == 1

    # correlations: symmetric, unit diagonal, matches DuckDB corr
    corr = D.feature_correlations(
        subject_level_features(silver["DM"], silver["AE"])
    ).toPandas()
    mat = {(r.f1, r.f2): r.corr for r in corr.itertuples()}
    assert all(mat[(f, f)] == 1.0 for f in D.NUMERIC_FEATURES)
    assert mat[("AGE", "AE_COUNT")] == mat[("AE_COUNT", "AGE")]
    oc = duck.execute(
        """
        WITH c AS (SELECT STUDYID, SUBJID, count(*) AS AE_COUNT FROM ae GROUP BY 1,2)
        SELECT round(corr(coalesce(d.AGE, 0), coalesce(c.AE_COUNT, 0)), 6)
        FROM dm d LEFT JOIN c ON c.STUDYID = d.STUDYID AND c.SUBJID = d.SUBJID
        """
    ).fetchone()[0]
    # Spark prepare() coalesces nulls to 0 the same way inside features
    from clinical_data_platform_spark.clinical.ml import prepare

    corr2 = D.feature_correlations(
        prepare(subject_level_features(silver["DM"], silver["AE"]))
    ).toPandas()
    mat2 = {(r.f1, r.f2): r.corr for r in corr2.itertuples()}
    assert abs(mat2[("AGE", "AE_COUNT")] - oc) < 1e-6

    # treatment summary shape
    ts = D.treatment_summary(outcomes).toPandas()
    assert set(ts.columns) == {
        "treatment_arm", "age_mean", "ae_mean", "ae_max", "completeness_mean"
    }
    assert len(ts) == outcomes.select("treatment_arm").distinct().count()


def test_utility_views_oracle(silver, duck):
    marts = M.build_marts(silver)
    sql = _SUMMARY_SQL + """
    SELECT treatment_arm,
           count(*) AS subject_count,
           cast(sum(total_adverse_events) AS BIGINT) AS total_aes,
           cast(sum(serious_adverse_events) AS BIGINT) AS total_serious_aes,
           round(avg(total_adverse_events), 2) AS avg_aes_per_subject,
           round(cast(sum(serious_adverse_events) AS DOUBLE) / count(*) * 100, 1)
               AS serious_ae_rate_percent,
           count(CASE WHEN safety_risk_category = 'HIGH_RISK' THEN 1 END)
               AS high_risk_subjects,
           count(CASE WHEN has_serious_adverse_event THEN 1 END)
               AS subjects_with_serious_aes
    FROM summary GROUP BY treatment_arm
    """
    odf = duck.execute(sql).fetchdf()
    assert_frames_match(
        marts["v_safety_summary"], odf, context="v_safety_summary"
    )

    sql2 = _SUMMARY_SQL + """
    , g AS (
      SELECT treatment_arm, sex_desc, age_group, count(*) AS subject_count,
             round(avg(age), 1) AS mean_age,
             min(age) AS min_age, max(age) AS max_age
      FROM summary GROUP BY 1, 2, 3
    )
    SELECT *, round(cast(subject_count AS DOUBLE)
                    / sum(subject_count) OVER (PARTITION BY treatment_arm) * 100, 1)
               AS percentage_in_arm
    FROM g
    """
    odf2 = duck.execute(sql2).fetchdf()
    assert_frames_match(
        marts["v_demographics_summary"], odf2, context="v_demographics_summary"
    )

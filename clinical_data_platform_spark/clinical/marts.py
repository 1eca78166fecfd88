"""dbt-DAG parity: staging views -> intermediate -> marts, as composable
DataFrame transformations.

Sources (all under /root/reference/dbt/clinical_dbt/models/):
  staging/stg_{demographics,adverse_events,laboratory,vital_signs,
  exposure}.sql, intermediate/int_subject_summary.sql,
  marts/clinical/fact_subject_outcomes.sql,
  marts/analytics/dim_study_overview.sql, and the three utility views in
  sql/warehouse_ddl.sql:224-268.

Deliberate divergences (documented per SURVEY §7.4):
- audit columns (current_timestamp) are omitted — nondeterministic, break
  oracle/testing; dbt_study_id is kept.
- median_age uses the exact interpolated percentile, not approx_quantile
  (deterministic; at 100 TB swap in percentile_approx).
- string_agg(distinct ...) is canonicalized by sorting (the reference's
  order is unspecified).
- NOTE stg_laboratory emits result_flag in {MISSING,LOW,HIGH,NORMAL,
  UNKNOWN} but int_subject_summary counts result_flag = 'ABNORMAL'
  (int_subject_summary.sql:28) — abnormal_lab_results is structurally 0 in
  the reference. Reproduced faithfully.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions import macros as MAC
from ..functions.scalars import surrogate_key

# --------------------------------------------------------------------------
# Staging (stg_*.sql — CASE ladders F1, coalesce F2, date math F4)
# --------------------------------------------------------------------------


def stg_demographics(dm: DataFrame, study_id: str = "STUDY001") -> DataFrame:
    age = F.col("AGE")
    return dm.filter(F.col("STUDYID") == study_id).select(
        F.col("STUDYID").alias("studyid"),
        F.col("SUBJID").alias("subjid"),
        F.coalesce(F.col("ARM"), F.lit("UNKNOWN")).alias("treatment_arm"),
        F.upper(F.coalesce(F.col("SEX"), F.lit("U"))).alias("sex"),
        age.alias("age"),
        MAC.age_group(age).alias("age_group"),
        MAC.sex_desc(F.col("SEX")).alias("sex_desc"),
        F.lit(study_id).alias("dbt_study_id"),
    )


def stg_adverse_events(ae: DataFrame, study_id: str = "STUDY001") -> DataFrame:
    start, end = F.col("AESTDTC"), F.col("AEENDTC")
    return ae.filter(F.col("STUDYID") == study_id).select(
        F.col("STUDYID").alias("studyid"),
        F.col("SUBJID").alias("subjid"),
        start.alias("aestdtc"),
        end.alias("aeendtc"),
        F.upper(F.coalesce(F.col("AESEV"), F.lit("UNKNOWN"))).alias("severity"),
        F.coalesce(F.col("AESER"), F.lit(False)).alias("is_serious"),
        F.upper(F.coalesce(F.col("AEOUT"), F.lit("UNKNOWN"))).alias("outcome"),
        F.when(
            start.isNotNull() & end.isNotNull(),
            F.datediff(end.cast("date"), start.cast("date")),
        ).alias("duration_days"),
        # 3-valued: NULL aeout -> condition NULL -> false (matches SQL CASE)
        F.when(end.isNull() & (F.col("AEOUT") != "FATAL"), F.lit(True))
        .otherwise(F.lit(False))
        .alias("is_ongoing"),
        MAC.severity_rank(F.col("AESEV")).alias("severity_rank"),
        F.lit(study_id).alias("dbt_study_id"),
    )


def stg_laboratory(lb: DataFrame, study_id: str = "STUDY001") -> DataFrame:
    v, lo, hi = F.col("LBORRES"), F.col("LBLNOR"), F.col("LBHNOR")
    return lb.filter(F.col("STUDYID") == study_id).select(
        F.col("STUDYID").alias("studyid"),
        F.col("SUBJID").alias("subjid"),
        F.upper(F.col("LBTESTCD")).alias("test_code"),
        v.alias("result_value"),
        F.upper(F.coalesce(F.col("LBORRESU"), F.lit("UNKNOWN"))).alias("result_unit"),
        lo.alias("normal_low"),
        hi.alias("normal_high"),
        MAC.lab_result_flag(v, lo, hi).alias("result_flag"),
        F.when(lo.isNotNull() & hi.isNotNull() & v.isNotNull(), (v - lo) / (hi - lo)).alias(
            "normalized_result"
        ),
        MAC.lab_test_category(F.col("LBTESTCD")).alias("test_category"),
        F.lit(study_id).alias("dbt_study_id"),
    )


def stg_vital_signs(vs: DataFrame, study_id: str = "STUDY001") -> DataFrame:
    code, v = F.col("VSTESTCD"), F.col("VSORRES")
    clinical_flag = (
        F.when(
            (code == "SYSBP") & v.isNotNull(),
            F.when(v < 90, "HYPOTENSIVE")
            .when((v >= 90) & (v < 140), "NORMAL")
            .when((v >= 140) & (v < 180), "HYPERTENSIVE")
            .when(v >= 180, "SEVERE_HYPERTENSIVE")
            .otherwise("UNKNOWN"),
        )
        .when(
            (code == "DIABP") & v.isNotNull(),
            F.when(v < 60, "HYPOTENSIVE")
            .when((v >= 60) & (v < 90), "NORMAL")
            .when((v >= 90) & (v < 110), "HYPERTENSIVE")
            .when(v >= 110, "SEVERE_HYPERTENSIVE")
            .otherwise("UNKNOWN"),
        )
        .when(
            (code == "HR") & v.isNotNull(),
            F.when(v < 60, "BRADYCARDIA")
            .when((v >= 60) & (v <= 100), "NORMAL")
            .when(v > 100, "TACHYCARDIA")
            .otherwise("UNKNOWN"),
        )
        .when(
            (code == "TEMP") & v.isNotNull(),
            F.when(v < 36.1, "HYPOTHERMIA")
            .when((v >= 36.1) & (v <= 37.2), "NORMAL")
            .when((v > 37.2) & (v <= 38.0), "LOW_FEVER")
            .when(v > 38.0, "HIGH_FEVER")
            .otherwise("UNKNOWN"),
        )
        .otherwise("N/A")
    )
    return vs.filter(F.col("STUDYID") == study_id).select(
        F.col("STUDYID").alias("studyid"),
        F.col("SUBJID").alias("subjid"),
        F.upper(code).alias("test_code"),
        v.alias("result_value"),
        F.upper(F.coalesce(F.col("VSORRESU"), F.lit("UNKNOWN"))).alias("result_unit"),
        clinical_flag.alias("clinical_flag"),
        F.when(code.isin("SYSBP", "DIABP"), "BLOOD_PRESSURE")
        .when(code == "HR", "HEART_RATE")
        .when(code == "TEMP", "TEMPERATURE")
        .when(code == "WEIGHT", "WEIGHT")
        .when(code == "HEIGHT", "HEIGHT")
        .when(code == "RESP", "RESPIRATORY_RATE")
        .otherwise("OTHER")
        .alias("vital_category"),
        F.lit(study_id).alias("dbt_study_id"),
    )


def stg_exposure(ex: DataFrame, study_id: str = "STUDY001") -> DataFrame:
    trt, dose = F.col("EXTRT"), F.col("EXDOSE")
    start, end = F.col("EXSTDTC"), F.col("EXENDTC")
    return ex.filter(F.col("STUDYID") == study_id).select(
        F.col("STUDYID").alias("studyid"),
        F.col("SUBJID").alias("subjid"),
        F.upper(F.coalesce(trt, F.lit("UNKNOWN"))).alias("treatment_name"),
        dose.alias("dose_amount"),
        start.alias("start_date"),
        end.alias("end_date"),
        F.when(
            start.isNotNull() & end.isNotNull(),
            F.datediff(end.cast("date"), start.cast("date")) + 1,
        ).alias("treatment_duration_days"),
        F.when(end.isNull(), F.lit(True)).otherwise(F.lit(False)).alias("is_ongoing_treatment"),
        MAC.treatment_category(trt).alias("treatment_category"),
        MAC.dose_category(dose).alias("dose_category"),
        F.when(start.isNotNull() & end.isNotNull(), "COMPLETED")
        .when(start.isNotNull() & end.isNull(), "ONGOING")
        .when(start.isNull(), "NOT_STARTED")
        .otherwise("UNKNOWN")
        .alias("treatment_status"),
        F.lit(study_id).alias("dbt_study_id"),
    )


# --------------------------------------------------------------------------
# Intermediate: int_subject_summary (A4/A5/A8 + left-join fan-in J4)
# --------------------------------------------------------------------------


def int_subject_summary(
    stg_dm: DataFrame,
    stg_ae: DataFrame,
    stg_lb: DataFrame,
    stg_vs: DataFrame,
    stg_ex: DataFrame,
) -> DataFrame:
    ae = stg_ae.groupBy("subjid").agg(
        F.count(F.lit(1)).alias("total_aes"),
        F.sum(F.when(F.col("is_serious"), 1).otherwise(0)).alias("serious_aes"),
        F.sum(F.when(F.col("severity") == "SEVERE", 1).otherwise(0)).alias("severe_aes"),
        F.sum(F.when(F.col("is_ongoing"), 1).otherwise(0)).alias("ongoing_aes"),
        F.max("severity_rank").alias("max_severity_rank"),
        F.countDistinct(F.when(F.col("is_serious"), F.col("subjid"))).alias("has_serious_ae"),
    )
    lb = stg_lb.groupBy("subjid").agg(
        F.count(F.lit(1)).alias("total_lab_tests"),
        F.countDistinct("test_code").alias("unique_lab_tests"),
        F.sum(F.when(F.col("result_flag") == "ABNORMAL", 1).otherwise(0)).alias(
            "abnormal_lab_results"
        ),
        F.countDistinct("test_category").alias("lab_categories_tested"),
    )
    vs = stg_vs.groupBy("subjid").agg(
        F.count(F.lit(1)).alias("total_vital_measurements"),
        F.countDistinct("test_code").alias("unique_vital_tests"),
        F.sum(F.when(~F.col("clinical_flag").isin("NORMAL", "N/A"), 1).otherwise(0)).alias(
            "abnormal_vitals"
        ),
    )
    ex = stg_ex.groupBy("subjid").agg(
        F.count(F.lit(1)).alias("total_exposures"),
        F.max("treatment_duration_days").alias("max_treatment_duration"),
        F.count(F.when(F.col("is_ongoing_treatment"), 1)).alias("ongoing_treatments"),
        F.array_join(F.sort_array(F.collect_set("treatment_category")), ", ").alias(
            "treatment_categories"
        ),
    )

    d = stg_dm
    out = (
        d.join(ae, "subjid", "left")
        .join(lb, "subjid", "left")
        .join(vs, "subjid", "left")
        .join(ex, "subjid", "left")
    )
    lab_rate = F.when(
        F.col("total_lab_tests") > 0,
        F.round(
            F.col("abnormal_lab_results").cast("double")
            / F.col("total_lab_tests").cast("double"),
            3,
        ),
    ).otherwise(F.lit(0.0))
    vital_rate = F.when(
        F.col("total_vital_measurements") > 0,
        F.round(
            F.col("abnormal_vitals").cast("double")
            / F.col("total_vital_measurements").cast("double"),
            3,
        ),
    ).otherwise(F.lit(0.0))
    return out.select(
        "studyid",
        "subjid",
        "treatment_arm",
        "sex",
        "sex_desc",
        "age",
        "age_group",
        F.coalesce("total_aes", F.lit(0)).alias("total_adverse_events"),
        F.coalesce("serious_aes", F.lit(0)).alias("serious_adverse_events"),
        F.coalesce("severe_aes", F.lit(0)).alias("severe_adverse_events"),
        F.coalesce("ongoing_aes", F.lit(0)).alias("ongoing_adverse_events"),
        F.coalesce("max_severity_rank", F.lit(0)).alias("max_ae_severity_rank"),
        F.when(F.col("has_serious_ae") > 0, F.lit(True)).otherwise(F.lit(False)).alias(
            "has_serious_adverse_event"
        ),
        F.coalesce("total_lab_tests", F.lit(0)).alias("total_lab_tests"),
        F.coalesce("unique_lab_tests", F.lit(0)).alias("unique_lab_tests"),
        F.coalesce("abnormal_lab_results", F.lit(0)).alias("abnormal_lab_results"),
        F.coalesce("lab_categories_tested", F.lit(0)).alias("lab_categories_tested"),
        lab_rate.alias("abnormal_lab_rate"),
        F.coalesce("total_vital_measurements", F.lit(0)).alias("total_vital_measurements"),
        F.coalesce("unique_vital_tests", F.lit(0)).alias("unique_vital_tests"),
        F.coalesce("abnormal_vitals", F.lit(0)).alias("abnormal_vitals"),
        vital_rate.alias("abnormal_vital_rate"),
        F.coalesce("total_exposures", F.lit(0)).alias("total_exposures"),
        F.coalesce("max_treatment_duration", F.lit(0)).alias("max_treatment_duration"),
        F.coalesce("ongoing_treatments", F.lit(0)).alias("ongoing_treatments"),
        F.coalesce("treatment_categories", F.lit("NONE")).alias("treatment_categories"),
        MAC.safety_risk_category(
            F.col("serious_aes"), F.col("severe_aes"), F.col("total_aes")
        ).alias("safety_risk_category"),
        F.when(F.col("total_aes") > 0, 1).otherwise(0).alias("has_ae_data"),
        F.when(F.col("total_lab_tests") > 0, 1).otherwise(0).alias("has_lab_data"),
        F.when(F.col("total_vital_measurements") > 0, 1).otherwise(0).alias("has_vital_data"),
        F.when(F.col("total_exposures") > 0, 1).otherwise(0).alias("has_exposure_data"),
        "dbt_study_id",
    )


# --------------------------------------------------------------------------
# Marts
# --------------------------------------------------------------------------


def fact_subject_outcomes(summary: DataFrame) -> DataFrame:
    """Subject-outcome mart with md5 surrogate key (dbt_utils semantics)
    and derived quality/clinical profiles."""
    score = (
        F.col("has_ae_data")
        + F.col("has_lab_data")
        + F.col("has_vital_data")
        + F.col("has_exposure_data")
    ).cast("double") / 4.0
    with_score = summary.withColumn("data_completeness_score", score)
    return with_score.select(
        surrogate_key(
            F.col("subjid"), null_token="_dbt_utils_surrogate_key_null_"
        ).alias("subject_key"),
        "studyid",
        "subjid",
        "treatment_arm",
        "sex",
        "sex_desc",
        "age",
        "age_group",
        "total_adverse_events",
        "serious_adverse_events",
        "severe_adverse_events",
        "ongoing_adverse_events",
        "has_serious_adverse_event",
        "max_ae_severity_rank",
        "safety_risk_category",
        "total_lab_tests",
        "unique_lab_tests",
        "abnormal_lab_results",
        "abnormal_lab_rate",
        "lab_categories_tested",
        "total_vital_measurements",
        "unique_vital_tests",
        "abnormal_vitals",
        "abnormal_vital_rate",
        "total_exposures",
        "max_treatment_duration",
        "ongoing_treatments",
        "treatment_categories",
        "has_ae_data",
        "has_lab_data",
        "has_vital_data",
        "has_exposure_data",
        "data_completeness_score",
        F.when(
            (F.col("abnormal_lab_rate") > 0.3) & (F.col("abnormal_vital_rate") > 0.2),
            "MULTIPLE_ABNORMALITIES",
        )
        .when(F.col("abnormal_lab_rate") > 0.5, "HIGH_LAB_ABNORMALITIES")
        .when(F.col("abnormal_vital_rate") > 0.3, "HIGH_VITAL_ABNORMALITIES")
        .when(F.col("has_serious_adverse_event"), "SERIOUS_SAFETY_CONCERN")
        .otherwise("NORMAL_PROFILE")
        .alias("clinical_profile"),
        F.when(F.col("data_completeness_score") >= 0.8, "HIGH_QUALITY")
        .when(F.col("data_completeness_score") >= 0.5, "MEDIUM_QUALITY")
        .otherwise("LOW_QUALITY")
        .alias("participation_quality"),
        "dbt_study_id",
    )


def dim_study_overview(outcomes: DataFrame, study_name: str = "Demo Study") -> DataFrame:
    """Whole-study rollup (A9) + derived rates (lateral-alias style CASE
    ladders computed in a second projection)."""
    m = outcomes.groupBy(F.col("dbt_study_id").alias("study_id")).agg(
        F.count(F.lit(1)).alias("total_subjects"),
        F.countDistinct("treatment_arm").alias("treatment_arms_count"),
        F.count(F.when(F.col("sex") == "M", 1)).alias("male_subjects"),
        F.count(F.when(F.col("sex") == "F", 1)).alias("female_subjects"),
        F.count(F.when(F.col("age_group") == "PEDIATRIC", 1)).alias("pediatric_subjects"),
        F.count(F.when(F.col("age_group") == "ADULT", 1)).alias("adult_subjects"),
        F.count(F.when(F.col("age_group") == "ELDERLY", 1)).alias("elderly_subjects"),
        F.round(F.avg("age"), 1).alias("mean_age"),
        F.percentile("age", F.lit(0.5)).alias("median_age"),
        F.min("age").alias("min_age"),
        F.max("age").alias("max_age"),
        F.sum("total_adverse_events").alias("total_adverse_events_study"),
        F.sum("serious_adverse_events").alias("total_serious_aes_study"),
        F.count(F.when(F.col("has_serious_adverse_event"), 1)).alias("subjects_with_serious_aes"),
        F.avg("data_completeness_score").alias("avg_data_completeness"),
        F.count(F.when(F.col("participation_quality") == "HIGH_QUALITY", 1)).alias("high_quality_subjects"),
        F.count(F.when(F.col("participation_quality") == "MEDIUM_QUALITY", 1)).alias("medium_quality_subjects"),
        F.count(F.when(F.col("participation_quality") == "LOW_QUALITY", 1)).alias("low_quality_subjects"),
        F.count(F.when(F.col("clinical_profile") == "NORMAL_PROFILE", 1)).alias("normal_profile_subjects"),
        F.count(F.when(F.col("clinical_profile") == "SERIOUS_SAFETY_CONCERN", 1)).alias("safety_concern_subjects"),
        F.count(F.when(F.col("clinical_profile") == "MULTIPLE_ABNORMALITIES", 1)).alias("multiple_abnormalities_subjects"),
        F.avg("max_treatment_duration").alias("avg_treatment_duration"),
        F.max("max_treatment_duration").alias("max_treatment_duration_overall"),
        F.count(F.when(F.col("ongoing_treatments") > 0, 1)).alias("subjects_with_ongoing_treatment"),
        F.sum("total_lab_tests").alias("total_lab_tests_study"),
        F.avg("abnormal_lab_rate").alias("avg_abnormal_lab_rate"),
        F.sum("total_vital_measurements").alias("total_vital_measurements_study"),
        F.avg("abnormal_vital_rate").alias("avg_abnormal_vital_rate"),
    )
    pct = lambda c: F.round(F.col(c).cast("double") / F.col("total_subjects").cast("double") * 100, 1)  # noqa: E731
    with_rates = m.select(
        "*",
        F.lit(study_name).alias("study_name"),
        pct("male_subjects").alias("male_percentage"),
        pct("female_subjects").alias("female_percentage"),
        pct("subjects_with_serious_aes").alias("serious_ae_rate_percent"),
        pct("safety_concern_subjects").alias("safety_concern_rate_percent"),
        pct("high_quality_subjects").alias("high_quality_rate_percent"),
        F.round(F.col("avg_data_completeness") * 100, 1).alias("avg_data_completeness_percent"),
    )
    return with_rates.select(
        "*",
        F.when(F.col("subjects_with_ongoing_treatment") > 0, "ONGOING")
        .otherwise("COMPLETED")
        .alias("study_status"),
        F.when(F.col("serious_ae_rate_percent") > 20, "HIGH_SAFETY_CONCERN")
        .when(F.col("serious_ae_rate_percent") > 10, "MODERATE_SAFETY_CONCERN")
        .otherwise("LOW_SAFETY_CONCERN")
        .alias("overall_safety_profile"),
        F.when(F.col("avg_data_completeness_percent") >= 80, "HIGH_QUALITY_DATA")
        .when(F.col("avg_data_completeness_percent") >= 60, "MEDIUM_QUALITY_DATA")
        .otherwise("LOW_QUALITY_DATA")
        .alias("data_quality_assessment"),
    )


# --------------------------------------------------------------------------
# Utility views (warehouse_ddl.sql:224-268)
# --------------------------------------------------------------------------


def v_safety_summary(outcomes: DataFrame) -> DataFrame:
    return (
        outcomes.groupBy("treatment_arm")
        .agg(
            F.count(F.lit(1)).alias("subject_count"),
            F.sum("total_adverse_events").alias("total_aes"),
            F.sum("serious_adverse_events").alias("total_serious_aes"),
            F.round(F.avg("total_adverse_events"), 2).alias("avg_aes_per_subject"),
            F.round(
                F.sum("serious_adverse_events").cast("double") / F.count(F.lit(1)) * 100, 1
            ).alias("serious_ae_rate_percent"),
            F.count(F.when(F.col("safety_risk_category") == "HIGH_RISK", 1)).alias(
                "high_risk_subjects"
            ),
            F.count(F.when(F.col("has_serious_adverse_event"), 1)).alias(
                "subjects_with_serious_aes"
            ),
        )
        .orderBy("treatment_arm")
    )


def v_demographics_summary(outcomes: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("treatment_arm")
    g = outcomes.groupBy("treatment_arm", "sex_desc", "age_group").agg(
        F.count(F.lit(1)).alias("subject_count"),
        F.round(F.avg("age"), 1).alias("mean_age"),
        F.min("age").alias("min_age"),
        F.max("age").alias("max_age"),
    )
    return g.select(
        "*",
        F.round(
            F.col("subject_count").cast("double")
            / F.sum("subject_count").over(w).cast("double")
            * 100,
            1,
        ).alias("percentage_in_arm"),
    ).orderBy("treatment_arm", "sex_desc", "age_group")


def v_data_quality_summary(outcomes: DataFrame) -> DataFrame:
    rank = (
        F.when(F.col("participation_quality") == "HIGH_QUALITY", 1)
        .when(F.col("participation_quality") == "MEDIUM_QUALITY", 2)
        .when(F.col("participation_quality") == "LOW_QUALITY", 3)
        .otherwise(4)
    )
    return (
        outcomes.groupBy("participation_quality")
        .agg(
            F.count(F.lit(1)).alias("subject_count"),
            F.round(F.avg("data_completeness_score") * 100, 1).alias("avg_completeness_percent"),
            F.round(F.avg("total_lab_tests"), 1).alias("avg_lab_tests"),
            F.round(F.avg("total_vital_measurements"), 1).alias("avg_vital_measurements"),
            F.round(F.avg("total_adverse_events"), 1).alias("avg_adverse_events"),
        )
        .orderBy(rank)
    )


def build_marts(silver: dict[str, DataFrame], study_id: str = "STUDY001") -> dict[str, DataFrame]:
    """Full dbt-DAG: staging -> intermediate -> marts + views."""
    stg = {
        "stg_demographics": stg_demographics(silver["DM"], study_id),
        "stg_adverse_events": stg_adverse_events(silver["AE"], study_id),
        "stg_laboratory": stg_laboratory(silver["LB"], study_id),
        "stg_vital_signs": stg_vital_signs(silver["VS"], study_id),
        "stg_exposure": stg_exposure(silver["EX"], study_id),
    }
    summary = int_subject_summary(
        stg["stg_demographics"],
        stg["stg_adverse_events"],
        stg["stg_laboratory"],
        stg["stg_vital_signs"],
        stg["stg_exposure"],
    )
    outcomes = fact_subject_outcomes(summary)
    return {
        **stg,
        "int_subject_summary": summary,
        "fact_subject_outcomes": outcomes,
        "dim_study_overview": dim_study_overview(outcomes),
        "v_safety_summary": v_safety_summary(outcomes),
        "v_demographics_summary": v_demographics_summary(outcomes),
        "v_data_quality_summary": v_data_quality_summary(outcomes),
    }

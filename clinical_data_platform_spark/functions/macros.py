"""Clinical expression macro library.

The reference ships its CASE-ladder vocabulary as dbt Jinja macros
(dbt/clinical_dbt/macros/clinical_utils.sql:3-113) reused across models;
here each macro is a function returning a Column, reused by
clinical/marts.py and available to any plan. Keeping them in one place is
the parity point: one definition of "age group" / "severity rank" / etc.
for the whole warehouse.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def age_group(age: Column) -> Column:
    """PEDIATRIC/ADULT/ELDERLY/UNKNOWN (stg_demographics.sql:19-24)."""
    return (
        F.when(age < 18, "PEDIATRIC")
        .when((age >= 18) & (age < 65), "ADULT")
        .when(age >= 65, "ELDERLY")
        .otherwise("UNKNOWN")
    )


def sex_desc(sex: Column) -> Column:
    return (
        F.when(sex == "M", "MALE").when(sex == "F", "FEMALE").otherwise("UNKNOWN")
    )


def severity_rank(aesev: Column) -> Column:
    """MILD=1 MODERATE=2 SEVERE=3 else 0 (stg_adverse_events.sql:32-37,
    on the RAW severity — NULL and 'SERIOUS' both rank 0, as written)."""
    return (
        F.when(aesev == "MILD", 1)
        .when(aesev == "MODERATE", 2)
        .when(aesev == "SEVERE", 3)
        .otherwise(0)
    )


def lab_result_flag(value: Column, lo: Column, hi: Column) -> Column:
    """MISSING/LOW/HIGH/NORMAL/UNKNOWN (stg_laboratory.sql:21-28)."""
    return (
        F.when(value.isNull(), "MISSING")
        .when(lo.isNotNull() & (value < lo), "LOW")
        .when(hi.isNotNull() & (value > hi), "HIGH")
        .when(lo.isNotNull() & hi.isNotNull() & (value >= lo) & (value <= hi), "NORMAL")
        .otherwise("UNKNOWN")
    )


def lab_test_category(code: Column) -> Column:
    return (
        F.when(code.isin("ALT", "AST", "BILI", "ALP"), "LIVER_FUNCTION")
        .when(code.isin("CREAT", "BUN", "UREA"), "KIDNEY_FUNCTION")
        .when(code.isin("HGB", "HCT", "RBC", "WBC", "PLT"), "HEMATOLOGY")
        .when(code.isin("GLUC", "HBA1C"), "GLUCOSE_METABOLISM")
        .when(code.isin("CHOL", "LDL", "HDL", "TRIG"), "LIPID_PANEL")
        .otherwise("OTHER")
    )


def dose_category(dose: Column) -> Column:
    """ZERO/LOW/MEDIUM/HIGH dose bands (stg_exposure.sql:40-48)."""
    return (
        F.when(dose.isNull(), "UNKNOWN")
        .when(dose == 0, "ZERO_DOSE")
        .when((dose > 0) & (dose <= 10), "LOW_DOSE")
        .when((dose > 10) & (dose <= 100), "MEDIUM_DOSE")
        .when(dose > 100, "HIGH_DOSE")
        .otherwise("UNKNOWN")
    )


def treatment_category(trt: Column) -> Column:
    return (
        F.when(F.lower(trt).like("%placebo%"), "PLACEBO")
        .when(F.lower(trt).like("%active%") | F.lower(trt).like("%drug%"), "ACTIVE_TREATMENT")
        .when(trt.isNull(), "UNKNOWN")
        .otherwise("OTHER")
    )


def safety_risk_category(serious: Column, severe: Column, total: Column) -> Column:
    """HIGH/MEDIUM/LOW/NO_EVENTS ladder (int_subject_summary.sql:101-106)."""
    return (
        F.when((serious > 0) | (severe > 0), "HIGH_RISK")
        .when(total > 5, "MEDIUM_RISK")
        .when(total > 0, "LOW_RISK")
        .otherwise("NO_EVENTS")
    )

"""Curated analytics queries over the star schema — the reference's three
SQL analytics (analytics/queries.py:11-68) as DataFrame plans.

Semantic traps handled (SURVEY §7.4): DATE_PART('day', ts) is DAY-OF-MONTH
(dayofmonth, item 7); DuckDB STDDEV is stddev_samp == Spark stddev.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def ae_rates_by_arm(fact_adverse_events: DataFrame, dim_subject: DataFrame) -> DataFrame:
    """Severe/serious AE rate by arm x day-of-month (queries.py:11-31)."""
    s = F.broadcast(dim_subject.select("subject_sk", "arm"))
    return (
        fact_adverse_events.join(s, "subject_sk")
        .select(
            "arm",
            F.dayofmonth("ae_start").alias("visit_day"),
            F.when(F.col("severity").isin("SEVERE", "SERIOUS"), 1).otherwise(0).alias("is_severe"),
        )
        .groupBy("arm", "visit_day")
        .agg(F.round(F.avg("is_severe"), 6).alias("severe_rate"))
        .orderBy("arm", "visit_day")
    )


def lab_abnormality_rates(fact_labs: DataFrame, dim_subject: DataFrame) -> DataFrame:
    """Abnormal-lab rate by arm (queries.py:34-48)."""
    s = F.broadcast(dim_subject.select("subject_sk", "arm"))
    abn = F.when((F.col("value") > F.col("high_norm")) | (F.col("value") < F.col("low_norm")), 1).otherwise(0)
    return (
        fact_labs.join(s, "subject_sk")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(abn), 6).alias("abn_rate"),
        )
        .orderBy(F.desc("abn_rate"))
    )


def vital_trend_summaries(
    fact_vitals: DataFrame, dim_subject: DataFrame, dim_measurement: DataFrame
) -> DataFrame:
    """Vital trends by arm x code (queries.py:51-68)."""
    s = F.broadcast(dim_subject.select("subject_sk", "arm"))
    m = F.broadcast(dim_measurement.select("measurement_sk", "code"))
    return (
        fact_vitals.join(s, "subject_sk")
        .join(m, "measurement_sk")
        .groupBy("arm", F.col("code").alias("vs_code"))
        .agg(
            F.round(F.avg("value"), 6).alias("mean_value"),
            F.round(F.stddev("value"), 6).alias("sd_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("arm", "vs_code")
    )

"""Star-schema warehouse: dims + facts from silver SDTM.

Parity with sql/warehouse_ddl.sql:66-191 and warehouse/loaders.py:19-57,
with two deliberate scale-correct divergences (SURVEY §7.4 item 1, §4):

- dim_subject's surrogate key is ROW_NUMBER over an EXPLICIT order
  (loaders.py:31 has no ORDER BY -> nondeterministic by spec). A global
  window is fine for dim-sized data; facts use md5 hash keys instead.
- The reference's 7 CREATE INDEX statements have no Spark equivalent; the
  physical design is partitioning + broadcast dims instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .synthetic import STUDY_ID


def build_dim_study(spark) -> DataFrame:
    """One-row study dim (loaders.py:24-25)."""
    return spark.createDataFrame([(1, STUDY_ID)], "study_sk INT, study_id STRING")


DIM_ROW_NUMBER_CAP = 5_000_000


def _assert_dim_sized(df: DataFrame, what: str, cap: int) -> None:
    """ROW_NUMBER over a global Window funnels every row through ONE task —
    correct for dims, a scale trap for facts. Refuse beyond `cap` rows and
    point at the md5 hash key (functions/scalars.surrogate_key, W4), which
    is shuffle-free at any size."""
    if df.limit(cap + 1).count() > cap:
        raise ValueError(
            f"{what} has more than {cap} rows; a global row_number surrogate "
            "key would serialize through one task. Use the md5 hash key "
            "(functions/scalars.surrogate_key) for fact-sized tables."
        )


def build_dim_subject(dm: DataFrame, max_rows: int = DIM_ROW_NUMBER_CAP) -> DataFrame:
    """Deterministic surrogate key ordered by natural key."""
    _assert_dim_sized(dm, "dim_subject input", max_rows)
    w = Window.orderBy("SUBJID")
    return dm.select(
        F.row_number().over(w).alias("subject_sk"),
        F.col("SUBJID").alias("subject_id"),
        F.lit(1).alias("study_sk"),
        F.col("ARM").alias("arm"),
        F.col("SEX").alias("sex"),
        F.col("AGE").cast("int").alias("age"),
    )


def build_dim_measurement(lb: DataFrame, vs: DataFrame) -> DataFrame:
    """Measurement dim: distinct LAB + VITAL codes, deterministic keys."""
    codes = (
        lb.select(F.col("LBTESTCD").alias("code"), F.lit("LAB").alias("domain"))
        .unionByName(vs.select(F.col("VSTESTCD").alias("code"), F.lit("VITAL").alias("domain")))
        .distinct()
    )
    w = Window.orderBy("domain", "code")
    return codes.select(F.row_number().over(w).alias("measurement_sk"), "code", "domain")


def build_fact_adverse_events(ae: DataFrame, dim_subject: DataFrame) -> DataFrame:
    """AE fact via dim join (loaders.py:41-57, join J2). The dim is
    broadcast — it's subject-cardinality, small relative to events."""
    s = F.broadcast(dim_subject.select("subject_sk", "subject_id"))
    return (
        ae.join(s, ae.SUBJID == s.subject_id)
        .select(
            "subject_sk",
            F.lit(1).alias("study_sk"),
            F.col("AESTDTC").cast("date").alias("ae_start"),
            F.col("AEENDTC").cast("date").alias("ae_end"),
            F.col("AESEV").alias("severity"),
            F.col("AESER").alias("seriousness"),
            F.col("AEOUT").alias("outcome"),
        )
    )


def build_fact_labs(lb: DataFrame, dim_subject: DataFrame, dim_measurement: DataFrame) -> DataFrame:
    s = F.broadcast(dim_subject.select("subject_sk", "subject_id"))
    m = F.broadcast(dim_measurement.filter(F.col("domain") == "LAB"))
    return (
        lb.join(s, lb.SUBJID == s.subject_id)
        .join(m, lb.LBTESTCD == m.code)
        .select(
            "subject_sk",
            "measurement_sk",
            F.lit(1).alias("study_sk"),
            F.col("LBORRES").alias("value"),
            F.col("LBLNOR").alias("low_norm"),
            F.col("LBHNOR").alias("high_norm"),
            F.col("LBORRESU").alias("unit"),
        )
    )


def build_fact_vitals(vs: DataFrame, dim_subject: DataFrame, dim_measurement: DataFrame) -> DataFrame:
    s = F.broadcast(dim_subject.select("subject_sk", "subject_id"))
    m = F.broadcast(dim_measurement.filter(F.col("domain") == "VITAL"))
    return (
        vs.join(s, vs.SUBJID == s.subject_id)
        .join(m, vs.VSTESTCD == m.code)
        .select(
            "subject_sk",
            "measurement_sk",
            F.lit(1).alias("study_sk"),
            F.col("VSORRES").alias("value"),
            F.col("VSORRESU").alias("unit"),
        )
    )


def build_fact_exposure(ex: DataFrame, dim_subject: DataFrame) -> DataFrame:
    s = F.broadcast(dim_subject.select("subject_sk", "subject_id"))
    return (
        ex.join(s, ex.SUBJID == s.subject_id)
        .select(
            "subject_sk",
            F.lit(1).alias("study_sk"),
            F.col("EXTRT").alias("treatment"),
            F.col("EXDOSE").alias("dose"),
            F.col("EXSTDTC").cast("date").alias("ex_start"),
            F.col("EXENDTC").cast("date").alias("ex_end"),
        )
    )


def build_star(spark, silver: dict[str, DataFrame]) -> dict[str, DataFrame]:
    dim_subject = build_dim_subject(silver["DM"])
    dim_measurement = build_dim_measurement(silver["LB"], silver["VS"])
    return {
        "dim_study": build_dim_study(spark),
        "dim_subject": dim_subject,
        "dim_measurement": dim_measurement,
        "fact_adverse_events": build_fact_adverse_events(silver["AE"], dim_subject),
        "fact_labs": build_fact_labs(silver["LB"], dim_subject, dim_measurement),
        "fact_vitals": build_fact_vitals(silver["VS"], dim_subject, dim_measurement),
        "fact_exposure": build_fact_exposure(silver["EX"], dim_subject),
    }

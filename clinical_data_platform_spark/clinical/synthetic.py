"""Deterministic synthetic SDTM generator (Spark-native).

Reproduces the data CONTRACT of the reference generator
(clinical-data-platform/scripts/generate_synthetic_data.py:11-108, schemas
in FIXTURES.md §1): same columns, value domains, null mixes, and injected
bad values (one SEX='X' row), seeded and fully deterministic — but built as
distributed column expressions over ``spark.range`` (xxhash64-derived
uniforms), so generating 10^9 subjects is the same code as 500.

Determinism: every random draw is a pure function of (seed, subject index,
tag); re-running yields byte-identical tables (the reference's smoke
invariant, tests/test_public_cdm_smoke.py:123-140).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

STUDY_ID = "STUDY001"


def _u(tag: str, seed: int, idx: Column = None) -> Column:
    """Uniform [0,1) as a pure function of (tag, seed, id)."""
    idx = F.col("id") if idx is None else idx
    h = F.xxhash64(F.lit(tag), idx, F.lit(seed))
    return (F.pmod(h, F.lit(1_000_000))).cast("double") / 1_000_000.0


def _choice(tag: str, seed: int, options: list, idx: Column = None) -> Column:
    """Deterministic uniform choice; None entries yield NULL."""
    u = _u(tag, seed, idx)
    n = len(options)
    expr = None
    for i, opt in enumerate(options):
        cond = u < float(i + 1) / n
        val = F.lit(opt) if opt is not None else F.lit(None)
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return expr.otherwise(F.lit(options[-1]))


def _uniform(tag: str, seed: int, lo: float, hi: float, idx: Column = None) -> Column:
    return F.lit(lo) + _u(tag, seed, idx) * F.lit(hi - lo)


def _maybe_null(col: Column, tag: str, seed: int, p_null: float, idx: Column = None) -> Column:
    return F.when(_u(tag + "_null", seed, idx) < p_null, F.lit(None)).otherwise(col)


def _date_plus(days: Column) -> Column:
    return F.to_timestamp(
        F.date_add(F.lit("2024-01-01").cast("date"), days.cast("int"))
    )


def generate_dm(spark: SparkSession, n_subjects: int = 500, seed: int = 42) -> DataFrame:
    """DM: one row per subject; ARM/SEX/AGE nullable; one injected SEX='X'
    (the validation suites must catch it — FIXTURES.md §5)."""
    base = spark.range(n_subjects)
    sex = _choice("sex", seed, ["M", "F", None])
    return base.select(
        F.lit(STUDY_ID).alias("STUDYID"),
        F.format_string("SUBJ%04d", (F.col("id") + 1).cast("int")).alias("SUBJID"),
        _choice("arm", seed, ["PLACEBO", "ACTIVE", None]).alias("ARM"),
        F.when(F.col("id") == n_subjects - 1, "X").otherwise(sex).alias("SEX"),
        _maybe_null(F.round(_uniform("age", seed, 18, 85), 1), "age", seed, 0.3).alias(
            "AGE"
        ),
    )


def generate_ae(spark: SparkSession, n_subjects: int = 500, seed: int = 42) -> DataFrame:
    """AE: 0-3 rows per subject; ~50% missing end dates drive is_ongoing."""
    base = spark.range(n_subjects).select(
        F.col("id"),
        F.explode(
            F.sequence(F.lit(1), (F.pmod(F.xxhash64(F.lit("nae"), F.col("id"), F.lit(seed)), F.lit(4))).cast("int"))
        ).alias("k"),
    )
    rid = F.col("id") * 7 + F.col("k")
    start_days = (_u("aestart", seed, rid) * 60).cast("int")
    start = _date_plus(F.lit(0) + start_days)
    end = _date_plus(start_days + (_u("aedur", seed, rid) * 10).cast("int"))
    return base.select(
        F.lit(STUDY_ID).alias("STUDYID"),
        F.format_string("SUBJ%04d", (F.col("id") + 1).cast("int")).alias("SUBJID"),
        start.alias("AESTDTC"),
        _maybe_null(end, "aeend", seed, 0.5, rid).alias("AEENDTC"),
        _choice("aesev", seed, ["MILD", "MODERATE", "SEVERE", "SERIOUS", None], rid).alias("AESEV"),
        _choice("aeser", seed, [True, False, None], rid).cast("boolean").alias("AESER"),
        _choice("aeout", seed, ["RECOVERED", "RECOVERING", "NOT RECOVERED", None], rid).alias("AEOUT"),
    )


_LB_TESTS = [("ALT", 10.0, 40.0, "U/L"), ("AST", 10.0, 40.0, "U/L"), ("CREAT", 0.6, 1.3, "mg/dL")]


def generate_lb(spark: SparkSession, n_subjects: int = 500, seed: int = 42) -> DataFrame:
    """LB: 3 rows per subject (ALT/AST/CREAT) with per-test normal ranges."""
    tests = F.array(
        *[
            F.struct(
                F.lit(c).alias("code"), F.lit(lo).alias("lo"),
                F.lit(hi).alias("hi"), F.lit(u).alias("unit"),
            )
            for c, lo, hi, u in _LB_TESTS
        ]
    )
    base = spark.range(n_subjects).select("id", F.explode(tests).alias("t"))
    rid = F.col("id") * 3 + F.crc32(F.col("t.code"))
    val = F.col("t.lo") * 0.5 + _u("lbval", seed, rid) * (F.col("t.hi") * 1.8 - F.col("t.lo") * 0.5)
    return base.select(
        F.lit(STUDY_ID).alias("STUDYID"),
        F.format_string("SUBJ%04d", (F.col("id") + 1).cast("int")).alias("SUBJID"),
        F.col("t.code").alias("LBTESTCD"),
        _maybe_null(F.round(val, 2), "lbval", seed, 0.3, rid).alias("LBORRES"),
        F.col("t.unit").alias("LBORRESU"),
        F.col("t.lo").alias("LBLNOR"),
        F.col("t.hi").alias("LBHNOR"),
    )


def generate_vs(spark: SparkSession, n_subjects: int = 500, seed: int = 42) -> DataFrame:
    """VS: 2 rows per subject (HR, SBP)."""
    tests = F.array(
        *[
            F.struct(F.lit("HR").alias("code"), F.lit(50.0).alias("lo"), F.lit(110.0).alias("hi"), F.lit("bpm").alias("unit")),
            F.struct(F.lit("SBP").alias("code"), F.lit(90.0).alias("lo"), F.lit(160.0).alias("hi"), F.lit("mmHg").alias("unit")),
        ]
    )
    base = spark.range(n_subjects).select("id", F.explode(tests).alias("t"))
    rid = F.col("id") * 2 + F.crc32(F.col("t.code"))
    val = F.col("t.lo") + _u("vsval", seed, rid) * (F.col("t.hi") - F.col("t.lo"))
    return base.select(
        F.lit(STUDY_ID).alias("STUDYID"),
        F.format_string("SUBJ%04d", (F.col("id") + 1).cast("int")).alias("SUBJID"),
        F.col("t.code").alias("VSTESTCD"),
        _maybe_null(F.round(val, 1), "vsval", seed, 0.3, rid).alias("VSORRES"),
        F.col("t.unit").alias("VSORRESU"),
    )


def generate_ex(spark: SparkSession, n_subjects: int = 500, seed: int = 42) -> DataFrame:
    """EX: 0-1 row per subject, skipped when ARM is NULL (the generator
    copies ARM into EXTRT)."""
    dm = generate_dm(spark, n_subjects, seed).filter(F.col("ARM").isNotNull())
    idx = (F.regexp_extract("SUBJID", r"(\d+)", 1).cast("long") - 1).alias("id")
    base = dm.select("STUDYID", "SUBJID", "ARM", idx)
    start_days = (_u("exstart", 42, F.col("id")) * 14).cast("int")
    start = _date_plus(F.lit(0) + start_days)
    end = _date_plus(start_days + 14 + (_u("exdur", seed, F.col("id")) * 46).cast("int"))
    return base.select(
        "STUDYID",
        "SUBJID",
        F.col("ARM").alias("EXTRT"),
        _maybe_null(F.round(_uniform("exdose", seed, 10, 100, F.col("id")), 1), "exdose", seed, 0.3, F.col("id")).alias("EXDOSE"),
        start.alias("EXSTDTC"),
        _maybe_null(end, "exend", seed, 0.3, F.col("id")).alias("EXENDTC"),
    )


def generate_all(spark: SparkSession, n_subjects: int = 500, seed: int = 42) -> dict[str, DataFrame]:
    return {
        "DM": generate_dm(spark, n_subjects, seed),
        "AE": generate_ae(spark, n_subjects, seed),
        "LB": generate_lb(spark, n_subjects, seed),
        "VS": generate_vs(spark, n_subjects, seed),
        "EX": generate_ex(spark, n_subjects, seed),
    }

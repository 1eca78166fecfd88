"""ADaM subject-level analysis dataset (ADSL) — parity with
standards/adam/build_adsl.py:10-26.

Reference recipe: DM left-merged with per-subject AE counts and
SEVERE/SERIOUS AE counts, missing counts -> 0, plus
DROPOUT_RISK = (SEVERE_AE_COUNT > 0) as int. The counts reuse
subject_level_features (same joins, same NULL->0 coalesce that mirrors
pandas' merge+fillna); ADSL adds the derived flag and the named parquet
deliverable.

Scale shape: two partial-aggregated groupBys on (STUDYID, SUBJID) joined
back to DM on the same keys — at cluster scale all three sides hash-
partition on the subject key, so the joins co-locate after one shuffle
each and no row ever fans out (AE collapses before joining).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .features import subject_level_features


def build_adsl(dm: DataFrame, ae: DataFrame) -> DataFrame:
    """All DM columns + AE_COUNT, SEVERE_AE_COUNT, DROPOUT_RISK."""
    return subject_level_features(dm, ae).withColumn(
        "DROPOUT_RISK", (F.col("SEVERE_AE_COUNT") > 0).cast("int")
    )


def write_adsl(dm: DataFrame, ae: DataFrame, standardized_dir: str) -> str:
    """Write the named ADSL.parquet deliverable next to the silver SDTM
    domains (the reference CLI writes <standardized_dir>/ADSL.parquet)."""
    out = os.path.join(standardized_dir, "ADSL.parquet")
    build_adsl(dm, ae).write.mode("overwrite").parquet(out)
    return out

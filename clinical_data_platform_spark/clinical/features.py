"""Subject-level ML features (analytics/feature_eng.py:10-45):
per-subject AE counts left-joined onto demographics, nulls -> 0.

The NULL-vs-NaN trap (SURVEY §7.4 item 5): pandas' merge produces NaN then
fillna(0) then astype(int); Spark left joins produce NULL — coalesce before
the int cast reproduces the exact result.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def subject_level_features(dm: DataFrame, ae: DataFrame) -> DataFrame:
    keys = ["STUDYID", "SUBJID"]
    ae_counts = ae.groupBy(keys).agg(F.count(F.lit(1)).alias("AE_COUNT"))
    # isin(...).fillna(False): Spark isin on NULL -> NULL -> filtered out,
    # same as pandas' fillna(False) mask (feature_eng.py:34)
    sev_counts = (
        ae.filter(F.col("AESEV").isin("SEVERE", "SERIOUS"))
        .groupBy(keys)
        .agg(F.count(F.lit(1)).alias("SEVERE_AE_COUNT"))
    )
    return (
        dm.join(ae_counts, keys, "left")
        .join(sev_counts, keys, "left")
        .withColumn("AE_COUNT", F.coalesce("AE_COUNT", F.lit(0)).cast("int"))
        .withColumn("SEVERE_AE_COUNT", F.coalesce("SEVERE_AE_COUNT", F.lit(0)).cast("int"))
    )

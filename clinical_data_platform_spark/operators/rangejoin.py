"""Bucketed interval (range) join.

Spark has no native interval-join operator; a naive non-equi join
(``p.ts BETWEEN i.start AND i.end``) with no equi component compiles to a
broadcast-nested-loop / cartesian product — O(|probe| x |intervals|) and
fatal at scale. The standard fix (used by Databricks' range-join hints
and KDB-style band joins): discretize time into fixed-width buckets,
explode each interval onto the buckets it overlaps, equi-join on
(key, bucket), then refine with the exact predicate. Join fan-out per
probe row is bounded by interval_width/bucket_width + 1.

The reference has only scalar date-diff interval logic
(dbt/clinical_dbt/models/staging/stg_exposure.sql:20-24); this is the
distributed generalization.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def interval_semi_join(
    probe: DataFrame,
    intervals: DataFrame,
    key: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 600,
) -> DataFrame:
    """Rows of ``probe`` whose ``ts_col`` falls in >= 1 interval of the
    same ``key`` (start inclusive, end exclusive). LEFT SEMI so a probe
    row landing in several overlapping intervals is counted once —
    no post-join dedup pass needed."""

    def bucket(c: Column) -> Column:
        # cast timestamp -> long = floor epoch seconds in Spark
        return F.floor(c.cast("long") / bucket_seconds)

    expanded = intervals.select(
        F.col(key),
        F.col(start_col).alias("__ws"),
        F.col(end_col).alias("__we"),
        F.explode(
            F.sequence(bucket(F.col(start_col)), bucket(F.col(end_col)))
        ).alias("__bucket"),
    )
    p = probe.withColumn("__bucket", bucket(F.col(ts_col)))
    cond = (
        (p[key] == expanded[key])
        & (p["__bucket"] == expanded["__bucket"])
        & (p[ts_col] >= expanded["__ws"])
        & (p[ts_col] < expanded["__we"])
    )
    return p.join(expanded, cond, "left_semi").drop("__bucket")

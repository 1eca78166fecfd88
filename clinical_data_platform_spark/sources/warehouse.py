"""Bucketed warehouse tables: the co-located-join physical design.

The corpus's only repeated big-big join is lineitem⋈orders on orderkey.
At 100 TB that's the dominant shuffle; the fix is to WRITE both facts
bucketed (and sorted) by the join key so every subsequent join/aggregation
on that key reads pre-partitioned, pre-sorted buckets — Catalyst then
plans a SortMergeJoin with NO Exchange and NO Sort.

This replaces the reference's CREATE INDEX statements
(sql/warehouse_ddl.sql:198-218, SURVEY §4): Spark has no secondary
indexes; bucketing + sorted files + partition pruning are the equivalent
physical design levers.

Verified in tests/test_bucketed_join.py: the bucketed join plan contains
zero Exchange operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist df as an external bucketed (+sorted) parquet table."""
    w = df.write.mode("overwrite").option("path", path).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def bucketed_join_ready(spark: SparkSession) -> None:
    """Session settings under which bucketed joins skip the shuffle."""
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")

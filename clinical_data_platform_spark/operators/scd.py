"""SCD2 / MERGE-INTO emulation on plain parquet (no Delta in v1).

``apply_scd2`` maintains a type-2 slowly-changing dimension: incoming
updates close the current version of changed keys (valid_to = effective
ts) and append a new current version; unchanged keys pass through. The
plan is join + union — one shuffle on the business key, rewrite-on-write
(the parquet-era MERGE; swap in Delta's MERGE INTO when available).

History invariants (tested): one is_current row per key; non-overlapping
[valid_from, valid_to) intervals; closed rows retain their attributes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# open-ended sentinel; stays inside pandas' ns-timestamp range (max 2262)
# so Arrow conversion of the dimension never overflows
HIGH_TS = "2200-01-01 00:00:00"


def init_scd2(snapshot: DataFrame, key: str, effective_ts: str) -> DataFrame:
    """Bootstrap a dimension from a first snapshot."""
    return snapshot.select(
        "*",
        F.lit(effective_ts).cast("timestamp").alias("valid_from"),
        F.lit(HIGH_TS).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def apply_scd2(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked_cols: list[str],
    effective_ts: str,
) -> DataFrame:
    """Merge one batch of updates (unique per key) into the dimension."""
    eff = F.lit(effective_ts).cast("timestamp")
    attrs = [key, *tracked_cols]
    upd = updates.select(*attrs)

    current = dim.filter(F.col("is_current"))
    history = dim.filter(~F.col("is_current"))

    # anti-join split: changed current rows get closed, new keys inserted
    cmp_cond = F.lit(False)
    for c in tracked_cols:
        cmp_cond = cmp_cond | ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))

    joined = current.alias("cur").join(
        upd.alias("upd"), F.col(f"cur.{key}") == F.col(f"upd.{key}"), "left"
    )
    unchanged = joined.filter(
        F.col(f"upd.{key}").isNull() | ~cmp_cond
    ).select("cur.*")
    closed = (
        joined.filter(F.col(f"upd.{key}").isNotNull() & cmp_cond)
        .select("cur.*")
        .withColumn("valid_to", eff)
        .withColumn("is_current", F.lit(False))
    )
    changed_keys = joined.filter(F.col(f"upd.{key}").isNotNull() & cmp_cond).select(
        F.col(f"upd.{key}").alias(key)
    )
    brand_new = upd.join(current.select(key), key, "left_anti")
    new_rows = (
        upd.join(changed_keys, key, "left_semi")
        .unionByName(brand_new)
        .select(
            "*",
            eff.alias("valid_from"),
            F.lit(HIGH_TS).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return history.unionByName(unchanged).unionByName(closed).unionByName(new_rows)

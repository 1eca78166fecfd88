"""Distributed as-of (backward) join.

Spark has no native ASOF JOIN; the classic scalable formulation is the
union-merge: tag both inputs, union, sort each key's timeline once, and
carry the last-seen right-side values forward with last(ignorenulls) over a
running window. ONE shuffle on the key, no range explosion, no per-group
pandas — this is the shape that survives 100 TB (vs pd.merge_asof in
applyInPandas, which serializes every group through Python).

Tie semantics match DuckDB ASOF JOIN (left.ts >= right.ts, inclusive):
right rows sort BEFORE left rows at equal timestamps.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row, append the value_cols of the most recent right row
    with right.ts <= left.ts (per key). Left rows with no prior right row
    keep NULLs (i.e. LEFT ASOF JOIN).

    ``right`` should be unique per (key, right_ts) — dedupe upstream,
    otherwise which duplicate wins is unspecified (same caveat as SQL ASOF).
    """
    left_payload = [c for c in left.columns]
    l2 = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.struct(*left_payload).alias("__payload"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
    )
    r2 = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.lit(None).cast(l2.schema["__payload"].dataType).alias("__payload"),
        *value_cols,
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l2.unionByName(r2).select(
        "__tag",
        "__payload",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled.filter(F.col("__tag") == 1).select("__payload.*", *value_cols)

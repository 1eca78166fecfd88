"""Skew-mitigation operators.

AQE handles skewed sort-merge JOINS automatically; skewed AGGREGATIONS on a
hot key still funnel one key's rows to one reducer. ``salted_aggregate``
splits each key into N salted sub-keys (deterministic row-hash salt),
pre-aggregates, then combines — two small shuffles instead of one hot one.
Only decomposable aggregates (sum/count/min/max) are supported; that is the
algebraic requirement, not an implementation shortcut.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_DECOMPOSABLE = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    aggs: {output_name: (fn, column)} with fn in sum|count|min|max.
    The salt is a deterministic hash of all columns (stable across retries —
    rand() would break speculative execution).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[_DECOMPOSABLE[fn](col).alias(name) for name, (fn, col) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[_COMBINE[fn](name).alias(name) for name, (fn, _) in aggs.items()]
    )

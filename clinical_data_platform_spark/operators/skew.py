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


def skyline_2d(
    df,
    max_col: str,
    min_col: str,
):
    """Distributed 2-D skyline (Pareto frontier; Borzsonyi et al. 2001):
    the points not dominated by any other, where point B dominates A if
    B.max_col >= A.max_col AND B.min_col <= A.min_col with at least one
    strict. Returns the distinct non-dominated (max_col, min_col) pairs.

    Plan — the standard two-phase distributed skyline:
    1. LOCAL skyline per partition (Arrow batch, numpy sort + running
       min): provably lossless, because a point dominated within one
       partition is dominated globally, while a global skyline point
       cannot be eliminated locally. This is the big reduction — the
       survivor set is bounded by the distinct values of max_col per
       partition, not by row count.
    2. EXACT dominance anti-join over the (tiny) union of local
       skylines — correctness never rests on phase 1 pruning well.
    """
    import pyspark.sql.functions as F

    def local_skyline(pdfs):
        import numpy as np
        import pandas as pd

        for pdf in pdfs:
            if not len(pdf):
                continue
            pts = pdf[[max_col, min_col]].drop_duplicates()
            # sort by max_col desc, min_col asc; keep running-min of min_col
            pts = pts.sort_values(
                [max_col, min_col], ascending=[False, True]
            )
            keep = []
            best = np.inf
            for mx, mn in pts.itertuples(index=False):
                if mn < best:
                    keep.append((mx, mn))
                    best = mn
            yield pd.DataFrame(keep, columns=[max_col, min_col])

    cand = (
        df.select(max_col, min_col)
        .mapInPandas(
            local_skyline,
            schema=f"{max_col} double, {min_col} double",
        )
        .distinct()
    )
    a = cand.select(
        F.col(max_col).alias("a_mx"), F.col(min_col).alias("a_mn")
    )
    b = cand.select(
        F.col(max_col).alias("b_mx"), F.col(min_col).alias("b_mn")
    )
    dominated = (
        (F.col("b_mx") >= F.col("a_mx"))
        & (F.col("b_mn") <= F.col("a_mn"))
        & ((F.col("b_mx") > F.col("a_mx")) | (F.col("b_mn") < F.col("a_mn")))
    )
    return a.join(F.broadcast(b), dominated, "left_anti").select(
        F.col("a_mx").alias(max_col), F.col("a_mn").alias(min_col)
    )

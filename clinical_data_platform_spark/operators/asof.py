"""Distributed as-of joins: backward, forward, and nearest-with-tolerance.

Spark has no native ASOF JOIN; the classic scalable formulation is the
union-merge: tag both inputs, union, sort each key's timeline once, and
carry right-side values across with last/first(ignorenulls) over a running
window. ONE shuffle on the key, no range explosion, no per-group pandas —
this is the shape that survives 100 TB (vs pd.merge_asof in
applyInPandas, which serializes every group through Python).

Tie semantics match DuckDB ASOF JOIN:
- backward (left.ts >= right.ts, inclusive): right rows sort BEFORE left
  rows at equal timestamps;
- forward (left.ts <= right.ts, inclusive): right rows sort AFTER left
  rows at equal timestamps, and the forward-looking window includes the
  current row;
- nearest: backward wins ties on equal distance (documented, asserted in
  tests, and mirrored in oracle SQL).

``tolerance_seconds`` nulls the carried values when the matched right row
is farther than the tolerance in the join direction — the pd.merge_asof
``tolerance`` semantics, computed on microseconds so sub-second
timestamps compare exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_RTS = "__rts"


def _asof_union_merge(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    *,
    forward: bool,
    tolerance_seconds: float | None,
    matched_ts_col: str | None,
) -> DataFrame:
    carried = list(value_cols) + [_RTS]
    left_payload = [c for c in left.columns]
    # sort order at equal ts: the eligible side must be visible to the
    # left row's window — right before left for backward, after for forward
    l_ord, r_ord = (1, 0) if not forward else (0, 1)
    l2 = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(l_ord).alias("__ord"),
        F.lit(1).alias("__is_left"),
        F.struct(*left_payload).alias("__payload"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias(_RTS),
    )
    r2 = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(r_ord).alias("__ord"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l2.schema["__payload"].dataType).alias("__payload"),
        *value_cols,
        F.col(right_ts).alias(_RTS),
    )
    if forward:
        w = (
            Window.partitionBy("__k")
            .orderBy("__ts", "__ord")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        fill = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (
            Window.partitionBy("__k")
            .orderBy("__ts", "__ord")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fill = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731

    filled = l2.unionByName(r2).select(
        "__is_left",
        "__ts",
        "__payload",
        *[fill(c).alias(c) for c in carried],
    )
    filled = filled.filter(F.col("__is_left") == 1)

    if tolerance_seconds is not None:
        tol_us = int(round(tolerance_seconds * 1_000_000))
        delta = (
            F.unix_micros(F.col(_RTS)) - F.unix_micros(F.col("__ts"))
            if forward
            else F.unix_micros(F.col("__ts")) - F.unix_micros(F.col(_RTS))
        )
        within = delta <= F.lit(tol_us)
        filled = filled.select(
            "__payload",
            *[F.when(within, F.col(c)).alias(c) for c in value_cols],
            F.when(within, F.col(_RTS)).alias(_RTS),
        )

    out_cols = ["__payload.*", *value_cols]
    if matched_ts_col is not None:
        filled = filled.withColumn(matched_ts_col, F.col(_RTS))
        out_cols.append(matched_ts_col)
    return filled.select(*out_cols)


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: float | None = None,
    matched_ts_col: str | None = None,
) -> DataFrame:
    """For each left row, append the value_cols of the most recent right row
    with right.ts <= left.ts (per key). Left rows with no prior right row
    keep NULLs (i.e. LEFT ASOF JOIN).

    ``right`` should be unique per (key, right_ts) — dedupe upstream,
    otherwise which duplicate wins is unspecified (same caveat as SQL ASOF).
    """
    return _asof_union_merge(
        left, right, key, left_ts, right_ts, value_cols,
        forward=False,
        tolerance_seconds=tolerance_seconds,
        matched_ts_col=matched_ts_col,
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: float | None = None,
    matched_ts_col: str | None = None,
) -> DataFrame:
    """For each left row, append the value_cols of the EARLIEST right row
    with right.ts >= left.ts (per key) — the forward counterpart of
    :func:`asof_join_backward`, same union-merge shape and cost."""
    return _asof_union_merge(
        left, right, key, left_ts, right_ts, value_cols,
        forward=True,
        tolerance_seconds=tolerance_seconds,
        matched_ts_col=matched_ts_col,
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: float | None = None,
    direction_col: str | None = None,
) -> DataFrame:
    """For each left row, append the value_cols of the CLOSEST right row in
    either direction (per key); backward wins exact-distance ties. Two
    chained union-merges (two shuffles on the key), still no range
    explosion. ``direction_col`` optionally records 'backward'/'forward'
    (NULL when nothing matched within tolerance)."""
    rb = right.select(
        F.col(key), F.col(right_ts),
        *[F.col(c).alias(f"__b_{c}") for c in value_cols],
    )
    rf = right.select(
        F.col(key), F.col(right_ts),
        *[F.col(c).alias(f"__f_{c}") for c in value_cols],
    )
    t = asof_join_backward(
        left, rb, key, left_ts, right_ts,
        [f"__b_{c}" for c in value_cols],
        tolerance_seconds=tolerance_seconds,
        matched_ts_col="__bts",
    )
    t = asof_join_forward(
        t, rf, key, left_ts, right_ts,
        [f"__f_{c}" for c in value_cols],
        tolerance_seconds=tolerance_seconds,
        matched_ts_col="__fts",
    )
    l_us = F.unix_micros(F.col(left_ts))
    b_ok = F.col("__bts").isNotNull()
    f_ok = F.col("__fts").isNotNull()
    db = l_us - F.unix_micros(F.col("__bts"))
    df = F.unix_micros(F.col("__fts")) - l_us
    choose_b = b_ok & (~f_ok | (db <= df))
    picked = [
        F.when(choose_b, F.col(f"__b_{c}"))
        .when(f_ok, F.col(f"__f_{c}"))
        .alias(c)
        for c in value_cols
    ]
    extra = []
    if direction_col is not None:
        extra.append(
            F.when(choose_b, F.lit("backward"))
            .when(f_ok, F.lit("forward"))
            .alias(direction_col)
        )
    keep = [c for c in t.columns if not c.startswith("__")]
    return t.select(*keep, *picked, *extra)

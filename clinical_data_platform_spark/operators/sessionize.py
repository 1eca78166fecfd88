"""Batch sessionization: split each user's event stream into sessions at
inactivity gaps > ``gap_seconds``.

Classic lag + cumulative-sum-of-flags shape — two window passes over ONE
partitioning (user_id), so Spark reuses the same shuffle/sort for both.
The streaming twin is ``session_window`` in streaming/events_stream.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Append a per-user ``session_id`` (1-based, ordered by time).

    Timestamps are compared at whole-second resolution (long cast) so the
    semantics match SQL date_diff('second', ...) oracles exactly.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | ((F.col(ts_col).cast("long") - prev_ts.cast("long")) > gap_seconds),
        1,
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("__new", new_sess).withColumn(
        "session_id", F.sum("__new").over(run)
    ).drop("__new")


def session_summary(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-user session statistics: n_sessions, max/avg events per session."""
    s = sessionize(df, user_col, ts_col, id_col, gap_seconds)
    per_sess = s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_sess.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.round(F.avg("n_events"), 6).alias("avg_session_events"),
    )

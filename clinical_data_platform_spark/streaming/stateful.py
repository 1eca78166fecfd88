"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no streaming; this is the north-star "custom stateful
operator" surface (SURVEY §2.11): a per-key running aggregate whose state
(count + sum) survives across micro-batches in the state store. The same
pattern generalizes to online anomaly scoring, rate limiting, or
session-enriched features.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("mean_value", DoubleType()),
    ]
)
STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _update(key, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    # raw state out; presentation rounding happens in Spark expressions
    # (Python round() is half-to-even — it would diverge from SQL)
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "mean_value": [total / n if n else None],
        }
    )


def running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running (count, sum, mean) maintained in the state store;
    executed to completion on the bounded corpus via availableNow."""
    from .events_stream import _event_stream, _run_to_memory

    ev = _event_stream(spark, sf_dir)
    updated = (
        ev.withWatermark("ts", "1 day")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    out = _run_to_memory(updated, "update")
    # update-mode emits one row per key per batch; keep the final state
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    # Rounding strategy (cross-engine parity): the corpus values have 2
    # decimals, so mean = total/n lands EXACTLY on decimal half-boundaries
    # where Spark (decimal-string HALF_UP), DuckDB (binary round) and Python
    # (half-to-even) all disagree. round(total,2) is boundary-safe (the true
    # total IS a 2-dp value), and floor() at micro-precision is
    # deterministic on identical doubles — no half semantics at all.
    total2 = F.round("total_value", 2)
    return final.select(
        "user_id",
        "n_events",
        total2.alias("total_value"),
        (F.floor(total2 / F.col("n_events") * 1e6) / 1e6).alias("mean_value"),
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas — the newer (Spark 4) arbitrary-state API
# ---------------------------------------------------------------------------


def user_value_extremes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running min/max via transformWithStateInPandas: typed
    ValueState in the state store, TTL-free, emitted per batch. The
    successor API to applyInPandasWithState — both are kept because real
    deployments straddle the two.

    NB: this API requires google.protobuf for its state-server protocol;
    that package is broken in the current container, so there is no
    driver-gate query for it — the pytest covering it skips when the
    environment can't run it (tests/test_misc_clinical.py)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import StructType

    out_schema = StructType.fromDDL(
        "user_id BIGINT, min_value DOUBLE, max_value DOUBLE"
    )
    state_schema = StructType.fromDDL("mn DOUBLE, mx DOUBLE")

    class ExtremesProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.state = handle.getValueState("extremes", state_schema)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            mn, mx = (self.state.get() if self.state.exists() else (None, None))
            for pdf in rows:
                lo, hi = float(pdf["value"].min()), float(pdf["value"].max())
                mn = lo if mn is None else min(mn, lo)
                mx = hi if mx is None else max(mx, hi)
            self.state.update((mn, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "min_value": [mn], "max_value": [mx]}
            )

        def close(self) -> None:
            pass

    from .events_stream import _event_stream, _run_to_memory

    ev = _event_stream(spark, sf_dir)
    out = (
        ev.groupBy("user_id")
        .transformWithStateInPandas(
            ExtremesProcessor(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )
    res = _run_to_memory(out, "update")
    from pyspark.sql import Window

    # update-mode emits per batch; keep the widest (final) extremes per key
    w = Window.partitionBy("user_id").orderBy(
        F.asc("min_value"), F.desc("max_value")
    )
    return (
        res.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.round("min_value", 6).alias("min_value"),
            F.round("max_value", 6).alias("max_value"),
        )
    )

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
    ArrayType,
    DoubleType,
    LongType,
    StringType,
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


# --- Streaming corpus dedup with Bloom-bounded state -------------------------

_CB_BITS = 1 << 16  # 64 Kbit bloom per source key
_CB_WORDS = _CB_BITS // 64
_CB_K = 3

CORPUS_OUTPUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("n_seen", LongType()),
        StructField("n_unique", LongType()),
    ]
)
CORPUS_STATE_SCHEMA = StructType(
    [
        StructField("n_seen", LongType()),
        StructField("n_unique", LongType()),
        StructField("bloom", ArrayType(LongType())),
    ]
)


def _fp_positions(fp: str) -> list[int]:
    import hashlib

    return [
        int(hashlib.md5(f"{s}|{fp}".encode()).hexdigest()[:8], 16) % _CB_BITS
        for s in range(_CB_K)
    ]


def _corpus_update(key, batches: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    import numpy as np

    (source,) = key
    if state.exists:
        n_seen, n_unique, bloom_list = state.get
        bloom = np.asarray(bloom_list, dtype=np.int64)
    else:
        n_seen, n_unique = 0, 0
        bloom = np.zeros(_CB_WORDS, dtype=np.int64)
    # work in unsigned space; LongType state is signed, so wrap on store
    mask64 = (1 << 64) - 1
    words = [int(x) & mask64 for x in bloom]
    for pdf in batches:
        for fp in pdf["fp"]:
            n_seen += 1
            pos = _fp_positions(fp)
            seen_before = all(
                (words[p // 64] >> (p % 64)) & 1 for p in pos
            )
            if not seen_before:
                n_unique += 1
                for p in pos:
                    words[p // 64] |= 1 << (p % 64)
    signed = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    state.update((int(n_seen), int(n_unique), signed))
    yield pd.DataFrame(
        {"source": [source], "n_seen": [n_seen], "n_unique": [n_unique]}
    )


def streaming_corpus_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source running (docs seen, unique docs) maintained across
    micro-batches with a BLOOM FILTER as the dedup state — O(m) bytes per
    key forever, instead of the unbounded exact-set a naive stateful
    dedup would accumulate (the composition of operators/bloom.py's
    sketch idea with applyInPandasWithState).

    A Bloom false positive would undercount uniques; with 64 Kbit / 3
    hashes and per-source populations in the thousands the FP odds are
    ~1e-6 per probe AND the whole computation is deterministic (md5
    positions, fixed corpus), so the DuckDB COUNT(DISTINCT) oracle is an
    exact check on the shipped data — any collision would surface
    locally, not flake in the driver."""
    from .events_stream import _staged_table_dir

    docs = spark.readStream.schema(
        spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    ).parquet(_staged_table_dir(sf_dir, "documents"))
    return corpus_dedup_stream(docs)


def corpus_dedup_stream(docs: DataFrame) -> DataFrame:
    """Core of streaming_corpus_dedup_stats over ANY streaming documents
    frame (tests drive it with a two-file source to prove the Bloom
    state survives micro-batch boundaries)."""
    from ..functions.text import fingerprint
    from .events_stream import _run_to_memory

    fps = docs.select("source", fingerprint(F.col("text")).alias("fp"))
    updated = fps.groupBy("source").applyInPandasWithState(
        _corpus_update,
        outputStructType=CORPUS_OUTPUT_SCHEMA,
        stateStructType=CORPUS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_memory(updated, "update")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.desc("n_seen"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", "n_seen", "n_unique")
    )

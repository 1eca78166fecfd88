"""Structured Streaming operators over the events table.

Design (SURVEY §2.11): file source -> watermark -> windowed aggregation /
stateful dedup / session windows -> sink. Tests and the driver entries run
with ``trigger(availableNow=True)`` + a memory sink so the streaming plan
executes end-to-end on the static corpus; in production the same code runs
against a Kafka/file stream with a real sink — only the I/O edges change.

Watermark policy: event-time ``ts``; late data beyond the watermark is
dropped in append mode. The state store is keyed exactly by the aggregation
keys, so state size is O(open windows x event types), not O(events).
"""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ts physical type varies by corpus build (nanos-as-long vs NTZ micros);
    # normalize exactly like the batch reader (catalog.normalize_event_ts).
    from ..catalog import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src_dir = _staged_events_dir(sf_dir)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = spark.readStream.schema(schema).parquet(src_dir)
    return normalize_event_ts(raw)


def _staged_table_dir(sf_dir: str, table: str) -> str:
    """The file stream source requires a DIRECTORY of files (it models an
    arriving-file queue). The corpus ships a single parquet file per table,
    so stage a hardlink/copy of it into a per-(sf, table) temp dir once. In
    production the source would already be a directory (or Kafka) — this
    shim exists only for the static test corpus."""
    import hashlib
    import os
    import shutil
    import tempfile

    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    d = os.path.join(tempfile.gettempdir(), f"cdp_spark_{table}_{key}")
    dst = os.path.join(d, f"{table}.parquet")
    src = os.path.join(sf_dir, f"{table}.parquet")
    if not os.path.exists(dst) or os.path.getmtime(dst) < os.path.getmtime(src):
        os.makedirs(d, exist_ok=True)
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy2(src, dst)
    return d


def _staged_events_dir(sf_dir: str) -> str:
    return _staged_table_dir(sf_dir, "events")


def _run_to_memory(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Execute a streaming DataFrame to completion via availableNow on a
    memory sink; return the materialized result as a batch DataFrame."""
    name = "s" + uuid.uuid4().hex[:12]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.table(name)


def hourly_counts(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour windowed counts with an event-time watermark."""
    ev = _event_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.col("w.start").alias("hour_start"), "event_type", "n", "total_value"
    )


def sliding_counts(
    spark: SparkSession,
    sf_dir: str,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window counts (overlapping windows)."""
    ev = _event_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.col("w.start").alias("win_start"),
        F.col("w.end").alias("win_end"),
        "event_type",
        "n",
    )


def dedup_user_type(
    spark: SparkSession, sf_dir: str, watermark: str = "1 day"
) -> DataFrame:
    """Stateful streaming dedup: first event per (user_id, event_type)
    within the watermark horizon (dropDuplicatesWithinWatermark). Projected
    to the key columns, whose SET is deterministic even though the surviving
    representative row is arrival-order dependent."""
    ev = _event_stream(spark, sf_dir)
    deduped = (
        ev.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    return _run_to_memory(deduped, "append")


def session_windows(
    spark: SparkSession,
    sf_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native streaming session windows (session_window) — the streaming
    twin of operators/sessionize.py."""
    ev = _event_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        "user_id",
        F.col("w.start").alias("sess_start"),
        F.col("w.end").alias("sess_end"),
        "n_events",
    )


def stream_to_parquet_batches(
    spark: SparkSession, sf_dir: str, out_dir: str, watermark: str = "2 hours"
) -> int:
    """foreachBatch sink pattern: per-micro-batch custom write (here:
    hourly aggregates appended as parquet, batch id stamped). This is the
    production sink shape for non-streaming-native targets (JDBC, MERGE
    INTO, multi-table writes); availableNow bounds it for tests.

    Returns the number of micro-batches processed."""
    ev = _event_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n")
    )
    n_batches = {"n": 0}

    def write_batch(batch_df, batch_id: int) -> None:
        n_batches["n"] += 1
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    q = (
        agg.writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches["n"]


def stream_stream_error_click_join(
    spark: SparkSession,
    sf_dir: str,
    window: str = "10 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream inner join: click events joined to error
    events of the same user within [err_ts, err_ts + window).

    Both sides carry watermarks and the join condition is time-bounded,
    which is exactly what lets Spark expire join state: an error row can
    be dropped once the click watermark passes err_ts + window. Returns
    the joined pair rows (append mode); callers aggregate batch-side."""
    clicks = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    errors = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("e_user"),
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", watermark)
    )
    joined = clicks.join(
        errors,
        F.expr(
            f"c_user = e_user AND click_ts >= err_ts "
            f"AND click_ts < err_ts + interval {window}"
        ),
    )
    return _run_to_memory(joined, "append")


def dedup_document_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus ingestion with exact dedup: documents arrive as a
    file stream, each gets the canonical fingerprint (md5 of normalized
    text — identical to the batch exact-dedup key), duplicates drop in the
    state store, and a complete-mode aggregate counts surviving unique
    fingerprints per source.

    Over the bounded corpus the per-source unique counts equal the batch
    COUNT(DISTINCT fingerprint) — the exact oracle. At 100 TB this is the
    continuous-ingestion shape: dedup state is keyed by (source,
    fingerprint) and in production would carry a watermark horizon (here
    the availableNow run is bounded, so state is bounded too)."""
    from ..functions.text import fingerprint

    docs = spark.readStream.schema(
        spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    ).parquet(_staged_table_dir(sf_dir, "documents"))
    uniq = (
        docs.select("source", fingerprint(F.col("text")).alias("fp"))
        .dropDuplicates(["source", "fp"])
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_unique_docs"))
    )
    return _run_to_memory(uniq, "complete")


def value_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming DDSketch state: per (event_type, bin) counts maintained
    by a streaming aggregation in complete mode. The BIN TABLE is what
    streams — it is the sketch's entire state (bounded: groups x ~160
    counters) and merges across micro-batches by addition, which is
    exactly what an incremental streaming count does. Quantile folding
    happens on the materialized state (plans/sketches.py), not in the
    stream."""
    from ..plans.sketches import _DDS_LN_GAMMA

    ev = _event_stream(spark, sf_dir)
    v = F.greatest(F.col("value").cast("double"), F.lit(1.0))
    i = F.ceil(F.round(F.log(v) / _DDS_LN_GAMMA, 6))
    bins = (
        ev.select("event_type", i.alias("i"))
        .groupBy("event_type", "i")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return _run_to_memory(bins, "complete")


def psi_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming PSI state: per (event_type, bin, period) counts for the
    two reference weeks, maintained as a streaming aggregation in
    complete mode. Like the DDSketch bin table, this counter table IS
    the monitor's whole state (|types| x 10 x 2 rows, merging across
    micro-batches by addition); the PSI fold runs batch-side on the
    materialized state."""
    ev = _event_stream(spark, sf_dir)
    period = (
        F.when(
            (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-08").cast("timestamp")),
            "ref",
        )
        .when(
            (F.col("ts") >= F.lit("2024-01-08").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-15").cast("timestamp")),
            "cur",
        )
    )
    bins = (
        ev.select(
            "event_type",
            period.alias("period"),
            F.least(F.floor(F.col("value") / 50.0), F.lit(9))
            .cast("long")
            .alias("bin"),
        )
        .filter(F.col("period").isNotNull())
        .groupBy("event_type", "period", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return _run_to_memory(bins, "complete")


def cms_user_counters(
    spark: SparkSession, sf_dir: str, d: int = 4, w: int = 1024
) -> DataFrame:
    """Streaming Count-Min Sketch state over user_id: per (hash-row,
    bucket) counters maintained as a complete-mode streaming aggregation
    — d x w rows forever, merging across micro-batches by addition. The
    frequency-estimate fold runs batch-side on the materialized state
    (plans/streamops.stream_cms_user_counts)."""
    ev = _event_stream(spark, sf_dir)
    rows_i = F.array(*[F.lit(i) for i in range(d)])
    h = F.md5(
        F.concat(
            F.col("i").cast("string"), F.lit("|"), F.col("user_id").cast("string")
        )
    )
    counters = (
        ev.select("user_id", F.explode(rows_i).alias("i"))
        .select(
            "i",
            (F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % w).alias(
                "bucket"
            ),
        )
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return _run_to_memory(counters, "complete")


def segment_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC join: the unbounded event stream enriched with a
    static user-segment dimension (md5-derived, deterministic), then
    aggregated per (segment, event_type). The static side is planned as
    a broadcast against every micro-batch — the canonical streaming
    enrichment shape (dimension lookups, feature joins) that needs no
    watermark because the static side never changes mid-query."""
    ev = _event_stream(spark, sf_dir)
    users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
    )
    seg = users.select(
        "user_id",
        F.when(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 6),
                16,
                10,
            ).cast("long")
            % 3
            == 0,
            "gold",
        )
        .when(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 6),
                16,
                10,
            ).cast("long")
            % 3
            == 1,
            "silver",
        )
        .otherwise("bronze")
        .alias("segment"),
    )
    # seg is per-user (DATA-SIZED): plain stream-static equi-join
    joined = ev.join(seg, "user_id")
    agg = joined.groupBy("segment", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return _run_to_memory(agg, "complete")


def variant_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT inside a structured stream: the JSON props column
    decodes to the binary VARIANT encoding IN-STREAM (try_parse_json —
    malformed payloads become NULL variants, never micro-batch
    failures), variant_get pulls the typed field, and the per-type
    rollup runs in complete mode. At scale this is the
    decode-once-at-the-edge pattern: every downstream consumer of the
    stream reads typed binary probes, not re-parsed JSON."""
    ev = _event_stream(spark, sf_dir)
    v = ev.select(
        "event_type", F.try_parse_json("props").alias("v")
    )
    k = F.variant_get("v", "$.k", "long")
    agg = v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_bad"),
        F.sum(k).cast("long").alias("sum_k"),
        F.max(k).cast("long").alias("max_k"),
    )
    return _run_to_memory(agg, "complete")

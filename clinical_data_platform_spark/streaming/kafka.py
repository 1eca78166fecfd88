"""Kafka source/sink plumbing for the events stream.

The container has no Kafka broker and no spark-sql-kafka connector jar, so
this module separates what IS testable here from what is not:

- :func:`parse_event_records` — the value-decoding transformation from
  Kafka's wire schema (key/value binary + topic/partition/offset/timestamp)
  to the typed events schema. Pure column expressions; unit-tested against
  a statically-built Kafka-shaped DataFrame (tests/test_kafka_plumbing.py).
- :func:`kafka_reader` / :func:`kafka_writer_options` — the configuration
  surface (bootstrap servers, subscribe pattern, offsets, maxOffsetsPerTrigger)
  returned as plain readStream builders/dicts. Building the reader needs the
  connector jar, so it is gated behind :func:`kafka_available`.

Scale notes (100 TB/day firehose): parallelism = Kafka partition count —
``minPartitions`` can oversubscribe (Spark splits offset ranges) when
executors outnumber partitions. ``maxOffsetsPerTrigger`` bounds each
micro-batch so state-store checkpoints stay small and retries are cheap.
The JSON value decode is ``from_json`` with an EXPLICIT schema — never
schema inference on a stream — and corrupt records land in a
``_corrupt_record`` column instead of killing the query.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as ST

# The events table's wire schema: what a producer would put in the value.
EVENT_VALUE_SCHEMA = ST.StructType(
    [
        ST.StructField("event_id", ST.LongType()),
        ST.StructField("user_id", ST.LongType()),
        ST.StructField("event_type", ST.StringType()),
        ST.StructField("value", ST.DoubleType()),
        ST.StructField("ts", ST.StringType()),  # ISO-8601 micros in JSON
    ]
)


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector is on the classpath."""
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", "localhost:9092"
        ).option("subscribe", "probe").load()
        return True
    except Exception:
        return False


def kafka_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = 1_000_000,
    min_partitions: int | None = None,
):
    """The configured (unloaded) Kafka readStream builder."""
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        r = r.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if min_partitions is not None:
        r = r.option("minPartitions", str(min_partitions))
    return r


def parse_event_records(kafka_df: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Kafka wire records -> typed event rows.

    Input columns (Kafka's fixed output schema): key binary, value binary,
    topic, partition, offset, timestamp, timestampType. Works identically
    on a real Kafka stream and on a statically-built DataFrame with the
    same columns — which is how it is unit-tested without a broker.

    Corrupt JSON yields NULL struct fields rather than an exception; rows
    whose ``event_id`` is NULL after decode are quarantined by the caller
    (filter on ``is_corrupt``).
    """
    parsed = kafka_df.select(
        F.col("topic"),
        F.col("partition").alias("kafka_partition"),
        F.col("offset").alias("kafka_offset"),
        F.from_json(F.col("value").cast("string"), EVENT_VALUE_SCHEMA).alias("v"),
    )
    out = parsed.select(
        "topic",
        "kafka_partition",
        "kafka_offset",
        F.col("v.event_id").alias("event_id"),
        F.col("v.user_id").alias("user_id"),
        F.col("v.event_type").alias("event_type"),
        F.col("v.value").alias("value"),
        F.to_timestamp(F.col("v.ts")).alias("ts"),
        F.col("v.event_id").isNull().alias("is_corrupt"),
    )
    if watermark:
        out = out.withWatermark("ts", watermark)
    return out


def kafka_writer_options(
    bootstrap_servers: str, topic: str, checkpoint_dir: str
) -> dict[str, str]:
    """Options for ``df.writeStream.format('kafka')`` — exactly-once-ish:
    Kafka sink is at-least-once; dedup downstream on event_id."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "checkpointLocation": checkpoint_dir,
    }


def to_kafka_value(df: DataFrame) -> DataFrame:
    """Typed event rows -> Kafka sink schema (key/value strings): key =
    user_id so one user's events stay in one partition (ordered per user)."""
    return df.select(
        F.col("user_id").cast("string").alias("key"),
        F.to_json(
            F.struct("event_id", "user_id", "event_type", "value", "ts")
        ).alias("value"),
    )

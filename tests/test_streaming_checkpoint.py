"""Checkpointed streaming restart: a second run over the same checkpoint
must process ONLY newly arrived files — the exactly-once bookkeeping that
makes an incremental 100 TB pipeline restartable."""

from __future__ import annotations

import pyspark.sql.functions as F


def _write_batch(spark, src_dir: str, start: int, n: int) -> None:
    (
        spark.range(start, start + n)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(1704067200 + F.col("id")).alias("ts"),
        )
        .coalesce(1)
        .write.mode("append")
        .parquet(src_dir)
    )


def _run_once(spark, src_dir, sink_dir, ckpt_dir, schema) -> None:
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_checkpoint_restart_processes_only_new_files(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, src, 0, 100)
    schema = spark.read.parquet(src).schema

    _run_once(spark, src, sink, ckpt, schema)
    assert spark.read.parquet(sink).count() == 100

    # no new data -> restart is a no-op, not a reprocess
    _run_once(spark, src, sink, ckpt, schema)
    assert spark.read.parquet(sink).count() == 100

    # new file arrives -> exactly its rows are appended
    _write_batch(spark, src, 100, 40)
    _run_once(spark, src, sink, ckpt, schema)
    got = spark.read.parquet(sink)
    assert got.count() == 140
    # and nothing was double-processed
    assert got.select("event_id").distinct().count() == 140

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


def test_bloom_state_survives_micro_batches(spark, tmp_path):
    """Streaming corpus dedup with Bloom-bounded state: duplicates that
    arrive in a LATER micro-batch must still be recognized — i.e. the
    sketch persisted in the state store, not per-batch memory."""
    import pyspark.sql.functions as F
    from clinical_data_platform_spark.streaming.stateful import (
        corpus_dedup_stream,
    )

    src = tmp_path / "docs_stream"
    src.mkdir()
    b1 = spark.createDataFrame(
        [(0, "alpha beta gamma", "web"), (1, "delta epsilon", "web"),
         (2, "alpha beta gamma", "web")],
        ["doc_id", "text", "source"],
    )
    b2 = spark.createDataFrame(
        [(3, "delta epsilon", "web"),        # dup of batch-1 doc
         (4, "zeta eta theta", "web")],      # genuinely new
        ["doc_id", "text", "source"],
    )
    # single real files (a directory-per-file layout would hide the
    # second batch from the file-stream lister)
    b1.toPandas().to_parquet(str(src / "f1.parquet"))
    b2.toPandas().to_parquet(str(src / "f2.parquet"))

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    rows = {r["source"]: r for r in corpus_dedup_stream(stream).collect()}
    assert rows["web"]["n_seen"] == 5
    # 3 unique texts; the batch-2 duplicate of a batch-1 doc was caught
    assert rows["web"]["n_unique"] == 3

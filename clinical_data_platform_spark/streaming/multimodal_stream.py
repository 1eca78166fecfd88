"""Structured Streaming over multimodal binary payloads.

The production shape this models: a continuous ingest of images (crawler
output, upload queue) that must be perceptually deduplicated ON ARRIVAL —
the streaming twin of the batch `image_ahash_dedup_pairs` plan. The
pipeline is file-stream -> Arrow-batched mapInPandas (synth/decode/hash
run IN the stream — mapInPandas is fully streaming-capable) -> stateful
aggregation keyed by the 64-bit perceptual hash. State is O(distinct
hashes), never O(images): the classic sketch-sized-state discipline of
streaming/stateful.py applied to the image path.

Tests/driver run it bounded (availableNow + memory sink) exactly like
events_stream.py; production swaps the I/O edges only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .events_stream import _run_to_memory, _staged_table_dir


def _documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    src_dir = _staged_table_dir(sf_dir, "documents")
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return spark.readStream.schema(schema).parquet(src_dir)


def ahash_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-perceptual-hash dedup state over the image stream: for every
    distinct aHash, the canonical (first by id) document and the number
    of copies seen. Complete-mode aggregation — over the bounded
    availableNow run the final state equals the batch group-by, which is
    what the DuckDB oracle asserts."""
    from ..operators.multimodal import image_ahash, synth_image_payloads

    docs = _documents_stream(spark, sf_dir)
    payloads = synth_image_payloads(docs, "doc_id")
    # corrupt payloads arrive as null-hash decode_error rows — keep them
    # out of the dedup state (they are not perceptual duplicates of
    # anything; decode_image's error rows are the observability channel)
    hashed = image_ahash(payloads).where(F.col("ahash_bits").isNotNull())
    agg = hashed.groupBy("ahash_bits").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").alias("canonical_doc"),
    )
    return _run_to_memory(agg, "complete")

"""Raw-corpus ingestion: the step BEFORE the documents table exists.

The reference ingests typed CSV (ingestion/ingest_csv.py); an LLM
training-data pipeline additionally starts from piles of raw files — text
dumps (one doc per line, or one doc per file) and opaque media blobs.
These readers turn those piles into the repo's canonical corpus shape
``(doc_id, text, source)`` / ``(doc_id, payload, source)`` so everything
downstream (corpusqc, dedup, contentfilter, multimodal) applies
unchanged.

Scale rules baked in:

- ``doc_id`` is CONTENT-DERIVED (xxhash64 of source file + text), never
  ``monotonically_increasing_id()`` or ``zipWithIndex`` — ids must be
  stable across re-ingestion, re-partitioning, and incremental appends,
  and a global counter is a scale bug (forces a single ordering).
- line mode reads are splittable (uncompressed / bzip2 files split at
  block boundaries; gzip does not split — compact upstream or use zstd).
- ``wholetext``/``binaryFile`` load a full file per row: right for
  document-per-file corpora and media blobs, wrong for big single files
  — the readers expose ``maxBytesPerFile`` guards instead of silently
  OOMing an executor.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

DEFAULT_MAX_FILE_BYTES = 512 * 1024 * 1024  # one-row-per-file guard


def _doc_id(source: F.Column, text: F.Column) -> F.Column:
    # Deterministic 64-bit id; collision probability over even 1e10 docs
    # is ~1e-9 per pair — and exact dedup keys on content anyway.
    return F.xxhash64(source, text)


def read_text_corpus(
    spark: SparkSession,
    path: str,
    per_file: bool = False,
    max_file_bytes: int = DEFAULT_MAX_FILE_BYTES,
) -> DataFrame:
    """Read a raw text corpus into ``(doc_id, text, source)``.

    ``per_file=False`` (default): one document per LINE — the JSONL-free
    crawl-dump layout. Splittable, streams at full parallelism.
    ``per_file=True``: one document per FILE (``wholetext``) — guarded by
    ``max_file_bytes`` because each file becomes one row on one executor.
    Empty lines/files are dropped (they carry no content and would all
    collide on the same hash).
    """
    # NB the wholetext flag must go through text()'s own kwarg — the
    # reader method re-sets its named options and overwrites .option().
    raw = (
        spark.read.text(path, wholetext=per_file)
        .select(
            F.input_file_name().alias("source"),
            F.col("value").alias("text"),
        )
        .filter(F.length(F.trim("text")) > 0)
    )
    if per_file:
        raw = raw.filter(F.length("text") <= max_file_bytes)
    return raw.select(
        _doc_id(F.col("source"), F.col("text")).alias("doc_id"),
        "text",
        "source",
    )


def read_binary_corpus(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_file_bytes: int = DEFAULT_MAX_FILE_BYTES,
) -> DataFrame:
    """Read opaque media files into ``(doc_id, payload, length, source)``
    via the ``binaryFile`` source — the input shape of
    operators/multimodal.py (payload stays an opaque ``binary`` column;
    decode happens in Arrow-batched mapInPandas downstream).

    The length guard is a FILTER on the source's metadata column, so
    oversized blobs are skipped at the scan without reading their bytes
    (binaryFile supports predicate pushdown on length/path/time).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path).filter(F.col("length") <= max_file_bytes)
    return raw.select(
        _doc_id(F.col("path"), F.base64("content")).alias("doc_id"),
        F.col("content").alias("payload"),
        "length",
        F.col("path").alias("source"),
    )

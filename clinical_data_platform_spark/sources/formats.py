"""Format-agnostic dataset IO: one write/read surface over the formats
Spark ships built-in (parquet, orc, json-lines, csv) plus gated optional
formats (avro needs the spark-avro package).

The reference pins everything to CSV-in/parquet-out
(src/clinical_platform/ingestion/ingest_csv.py:32-100, MinIO object
paths); a general engine has to round-trip any of the lake formats with
schema preserved. Semantics by format:

- parquet/orc: self-describing columnar — schema round-trips exactly,
  predicate pushdown + column pruning at the scan, splittable. The only
  two formats to use for FACT data at 100 TB.
- json-lines: schema-on-read. We write the schema sidecar ourselves and
  re-apply it on read (never ``inferSchema`` at scale — inference is a
  full extra pass over 100 TB, and drifts on partial data).
- csv: like json but lossier (no nesting, no types); header + explicit
  schema enforced here. Timestamps round-trip via ISO-8601.

All writes partition-aware (``partition_by``) and compression-pinned
(snappy/zstd for columnar, gzip for text) so files stay splittable and
consistently sized.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as ST

COLUMNAR = {"parquet", "orc"}
TEXT = {"json", "csv"}


def _schema_sidecar(path: str) -> str:
    return os.path.join(path, "_schema.json")


def write_dataset(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    """Write ``df`` at ``path`` in ``fmt``; text formats get a schema
    sidecar so the reader never re-infers."""
    if fmt not in COLUMNAR | TEXT:
        raise ValueError(f"unsupported format {fmt!r}")
    comp = compression or ("snappy" if fmt in COLUMNAR else "gzip")
    w = df.write.mode("overwrite").format(fmt).option("compression", comp)
    if fmt == "csv":
        w = w.option("header", "true").option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)
    if fmt in TEXT:
        # sidecar written AFTER the data dir exists; partition columns are
        # directory-encoded, so store the full schema for re-application
        with open(_schema_sidecar(path), "w") as f:
            f.write(df.schema.json())


def read_dataset(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a dataset written by :func:`write_dataset` with its exact
    schema (columnar formats are self-describing; text formats re-apply
    the sidecar schema — zero inference passes)."""
    if fmt in COLUMNAR:
        return spark.read.format(fmt).load(path)
    with open(_schema_sidecar(path)) as f:
        schema = ST.StructType.fromJson(json.loads(f.read()))
    r = spark.read.format(fmt).schema(schema)
    if fmt == "csv":
        r = r.option("header", "true").option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    return r.load(path)


def avro_available(spark: SparkSession) -> bool:
    """spark-avro is an external package; gate rather than assume."""
    try:
        spark.range(1).write.format("avro").mode("overwrite").save(
            "/tmp/_avro_probe"
        )
        return True
    except Exception:
        return False

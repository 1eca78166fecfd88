"""Custom Python DataSource (Spark 4 pyspark.sql.datasource API).

The reference's bespoke readers (S3Client byte pulls + pandas chunking,
ingestion/ingest_csv.py:32-109 / ingestion/s3_client.py:30-51) map onto
Spark's source API instead of driver-side loops: a DataSource declares
its schema and splits itself into InputPartitions, and each partition's
``read`` runs ON AN EXECUTOR — so a custom feed (an internal service, a
proprietary format, a synthetic generator) parallelizes like any builtin
source instead of bottlenecking on the driver.

Here the custom source is the deterministic events generator (same shape
as the corpus events table): partition i of N owns rows [i*rows/N,
(i+1)*rows/N), every value derived from the row id via splitmix64-style
mixing — no RNG state, so any subset of partitions can be recomputed
independently (exactly what Spark's task retry model requires of a
source)."""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def _mix(x: int) -> int:
    # splitmix64 finalizer: deterministic, stateless, per-row
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("synthetic_events").option("rows", n)
    .option("partitions", p).load()"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id bigint, user_id bigint, event_type string, value double"
        )

    def reader(self, schema) -> DataSourceReader:
        return _Reader(
            rows=int(self.options.get("rows", 1000)),
            parts=int(self.options.get("partitions", 4)),
        )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _Reader(DataSourceReader):
    def __init__(self, rows: int, parts: int):
        self.rows, self.parts = rows, parts

    def partitions(self):
        step = max(1, -(-self.rows // self.parts))
        return [
            _RangePartition(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            h = _mix(i)
            yield (
                i,
                h % 10_000,
                EVENT_TYPES[(h >> 16) % 5],
                ((h >> 24) % 100_000) / 1000.0,
            )


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)

"""Test-corpus catalog: typed access to the driver's parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings. All loads go through :func:`table` so the
session timezone is pinned (oracle parity) and small dimensions can be
broadcast by callers.

At scale these would be catalog tables (Hive/Unity/Glue) with partitioning;
here they are single parquet files. Catalyst still gets predicate pushdown
and column pruning on the scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import tune_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to always broadcast (region: 5 rows, nation: 25,
# supplier/customer/part scale with sf but stay << the 10 MB AQE threshold
# at test scale; at 100 TB customer/part would be sort-merge/bucketed).
ALWAYS_BROADCAST = ("region", "nation", "supplier")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    tune_session(spark)
    if name == "events":
        return _read_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's parquet reader
    rejects (SPARK-40819). Read nanos as long (legacy conf) and convert to
    a microsecond TimestampType by integer division — the same truncation
    DuckDB applies when it narrows ns -> us, so oracle parity holds."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (for spark.sql plans)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)

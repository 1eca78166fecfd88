"""Compaction and statistics maintenance over a deliberately fragmented
parquet dataset."""

from __future__ import annotations

import pyspark.sql.functions as F

from clinical_data_platform_spark.catalog import table as T
from clinical_data_platform_spark.sources.maintenance import (
    analyze_table,
    compact_dataset,
    data_file_count,
    dataset_bytes,
)

SF = "/root/testdata/sf0.001"


def fragment(spark, tmp_path) -> str:
    src = str(tmp_path / "fragmented")
    T(spark, SF, "orders").repartition(64).write.parquet(src)
    assert data_file_count(src) >= 32
    return src


def test_compaction_reduces_file_count_preserves_data(spark, tmp_path):
    src = fragment(spark, tmp_path)
    out = str(tmp_path / "compacted")
    target = max(1, dataset_bytes(src))  # everything fits one target file
    n = compact_dataset(spark, src, out, target_file_bytes=target)
    assert n < data_file_count(src)
    a = spark.read.parquet(src)
    b = spark.read.parquet(out)
    assert b.count() == a.count()
    # decimal sum is order-insensitive-exact; a double sum would differ in
    # the last ulp because compaction changes the addition order
    dec = F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
    assert b.agg(dec).first()[0] == a.agg(dec).first()[0]


def test_compaction_with_clustering_sorts_rows(spark, tmp_path):
    src = fragment(spark, tmp_path)
    out = str(tmp_path / "clustered")
    compact_dataset(
        spark, src, out,
        target_file_bytes=max(1, dataset_bytes(src)),
        sort_cols=["o_orderdate"],
    )
    # rows inside each file are ordered -> per-partition monotonic
    got = spark.read.parquet(out)
    disorder = (
        got.withColumn(
            "prev",
            F.lag("o_orderdate").over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy(F.spark_partition_id())
                .orderBy(F.monotonically_increasing_id())
            ),
        )
        .filter(F.col("prev") > F.col("o_orderdate"))
        .count()
    )
    assert disorder == 0


def test_analyze_table_records_statistics(spark, tmp_path):
    path = str(tmp_path / "tbl")
    T(spark, SF, "orders").write.option("path", path).saveAsTable("maint_orders")
    try:
        stats = analyze_table(spark, "maint_orders", columns=["o_orderstatus"])
        assert "Statistics" in stats
        assert "bytes" in stats["Statistics"]
        assert "rows" in stats["Statistics"]
    finally:
        spark.sql("DROP TABLE IF EXISTS maint_orders")

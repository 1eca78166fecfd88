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


def test_zorder_key_matches_python_reference(spark):
    from clinical_data_platform_spark.functions.scalars import zorder_key

    def py_morton(a: int, b: int) -> int:
        z = 0
        for i in range(31):  # 31 bits/dim keeps the key positive
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    vals = [(0, 0), (1, 0), (0, 1), (3, 5), (12345, 67890),
            (0x7FFFFFFF, 0), (0, 0x7FFFFFFF), (2**30, 2**31 - 1)]
    df = spark.createDataFrame(vals, "a long, b long").select(
        "a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        assert r.z == py_morton(r.a & 0x7FFFFFFF, r.b & 0x7FFFFFFF), (r.a, r.b)
        assert r.z >= 0


def test_zorder_clusters_both_dimensions(spark):
    from clinical_data_platform_spark.functions.scalars import zorder_key

    # a 64x64 grid sorted by z-key: any contiguous quarter of the rows
    # spans at most half the range of EACH dimension (locality in both),
    # which a single-column sort cannot achieve for the second column
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    rows = (
        grid.select("x", "y", zorder_key(F.col("x"), F.col("y")).alias("z"))
        .orderBy("z")
        .collect()
    )
    quarter = rows[: len(rows) // 4]
    assert max(r.x for r in quarter) - min(r.x for r in quarter) <= 32
    assert max(r.y for r in quarter) - min(r.y for r in quarter) <= 32


def test_snapshot_diff_classes_partition_the_key_space(spark):
    """The diff classes reconcile exactly with the deterministic
    mutation: removed == %97 keys, added == %101 survivors' new keys,
    changed == %89 survivors, and change counters are zero outside the
    'changed' class."""
    import pyspark.sql.functions as F

    from clinical_data_platform_spark.catalog import table as T
    from clinical_data_platform_spark.plans.relational import (
        snapshot_diff_report,
    )

    sf = "/root/testdata/sf0.001"
    by = {r.status: r for r in snapshot_diff_report(spark, sf).collect()}
    a_keys = {
        r.o_orderkey
        for r in T(spark, sf, "orders").select("o_orderkey").collect()
    }
    # replicate the deterministic mutation on the key sets (note the
    # key-0 self-collision: 0 % 97 == 0 deletes it, but its % 101
    # duplicate re-inserts -0 == 0 with identical values -> unchanged)
    b_keys = {k for k in a_keys if k % 97 != 0} | {
        -k for k in a_keys if k % 101 == 0
    }
    removed = a_keys - b_keys
    added = b_keys - a_keys
    changed = {k for k in a_keys & b_keys if k % 89 == 0 and k % 97 != 0}
    unchanged = (a_keys & b_keys) - changed
    assert by["removed"].n_rows == len(removed)
    assert by["added"].n_rows == len(added)
    assert by["changed"].n_rows == len(changed)
    assert by["unchanged"].n_rows == len(unchanged)
    for s in ("added", "removed", "unchanged"):
        assert by[s].n_status_changed == 0 and by[s].n_price_changed == 0
    assert by["changed"].n_status_changed == len(changed)
    assert by["changed"].n_price_changed == len(changed)

"""AQE skew-join: a join with one hot key must be split at runtime.

The salting operator (operators/skew.py) is the plan-level answer for
aggregations; for joins the engine leans on AQE's OptimizeSkewedJoin —
this test manufactures a 90%-one-key join and asserts Spark actually
split the skewed partition (the final adaptive plan marks the join
skew=true), so the claim in ARCHITECTURE.md is executed, not asserted.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_aqe_splits_skewed_join(spark):
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # tiny thresholds so the test corpus trips the detector
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        n = 400_000
        # 90% of left rows share key 0; right side is uniform
        left = spark.range(n).select(
            F.when(F.col("id") % 10 < 9, 0)
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = left.join(right, "k").select(F.sum(F.col("v") + F.col("w")))
        joined.collect()
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:4000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_join_skew_report_invariants(spark):
    """skew_ratio is >= 1 by construction (hottest key >= average key)
    and the top-10 share is a valid fraction; max * n_keys bounds the
    total row count from above."""
    from clinical_data_platform_spark.plans.advanced import join_skew_report

    rows = join_skew_report(spark, "/root/testdata/sf0.001").collect()
    assert {r.join_key for r in rows} == {
        "events.user_id",
        "orders.o_custkey",
        "lineitem.l_orderkey",
    }
    for r in rows:
        assert r.skew_ratio >= 1.0 - 1e-6, r
        assert 0.0 < r.top10_share <= 1.0, r
        assert r.max_key_rows * r.n_keys >= r.n_rows, r

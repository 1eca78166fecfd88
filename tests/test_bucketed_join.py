"""Scale-path proof: bucketed facts join WITHOUT a shuffle.

Writes lineitem/orders bucketed+sorted by orderkey, joins them, and
asserts the physical plan contains no Exchange (the shuffle operator) —
the design that makes the fact-fact join survive 100 TB.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from clinical_data_platform_spark.catalog import table as T
from clinical_data_platform_spark.sources.warehouse import (
    bucketed_join_ready,
    write_bucketed_table,
)

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    bucketed_join_ready(spark)
    write_bucketed_table(
        T(spark, SF, "lineitem"),
        "li_bucketed",
        ["l_orderkey"],
        8,
        str(tmp_path / "li"),
        sort_cols=["l_orderkey"],
    )
    write_bucketed_table(
        T(spark, SF, "orders"),
        "ord_bucketed",
        ["o_orderkey"],
        8,
        str(tmp_path / "ord"),
        sort_cols=["o_orderkey"],
    )
    try:
        # force the sort-merge path (broadcast would hide the bucketing)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        li = spark.table("li_bucketed")
        od = spark.table("ord_bucketed")
        joined = li.join(od, li.l_orderkey == od.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("HashAggregate")[-1]  # below the final agg
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_section, join_section[:2000]
        # and it still computes the right thing
        n = joined.agg(F.sum("n")).first()[0]
        assert n == T(spark, SF, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS ord_bucketed")

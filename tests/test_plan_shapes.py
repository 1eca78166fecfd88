"""Physical-plan shape assertions for the deep TPC-H queries.

Correctness is the oracle gate's job; these tests pin the SCALE
properties — that each query compiles to the plan we designed for 100 TB:
dims broadcast (hints survive even when statistics would say otherwise),
correlated subqueries decorrelate to semi/anti joins instead of per-row
recompute, filters reach the parquet scan, and column pruning keeps
unreferenced fact columns out of the read schema.

autoBroadcastJoinThreshold is forced to -1 while planning so the tiny
test files cannot make every join a broadcast by accident — what remains
broadcast is exactly what the query hinted, and the fact-fact join shows
the sort-merge shape it would have at scale.
"""

from __future__ import annotations

import pytest

from clinical_data_platform_spark.plans import tpch_deep

SF = "/root/testdata/sf0.001"


def _explain(df, mode: str) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def fmt_plan(df) -> str:
    """Formatted explain: has per-scan PushedFilters/ReadSchema details."""
    return _explain(df, "formatted")


def simple_plan(df) -> str:
    """Simple explain: each physical node appears exactly once, so
    node-type counts are meaningful."""
    return _explain(df, "simple")


@pytest.fixture()
def no_auto_broadcast(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def scan_section(plan: str, table: str) -> str:
    """The formatted-explain detail block for the given table's scan."""
    blocks = [b for b in plan.split("\n\n") if f"{table}.parquet" in b and "Scan parquet" in b]
    assert blocks, f"no parquet scan of {table} in plan:\n{plan[:3000]}"
    return "\n".join(blocks)


def test_q8_broadcasts_fixed_dims_only(no_auto_broadcast):
    """r5 hint policy (r4 verdict items 2-3): only FIXED-cardinality dims
    (nation x2, region) keep broadcast hints. part/customer/supplier are
    data-sized (SFx200k/150k/10k rows — un-broadcastable at 100 TB), so
    with statistics disabled they must show as shuffle joins; at bench SF
    the real session's AQE still broadcasts them from size stats."""
    spark = no_auto_broadcast
    plan = simple_plan(tpch_deep.q8_market_share(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3, plan[:3000]
    # lineitem<->orders plus the three un-hinted data-sized sides
    assert 1 <= plan.count("SortMergeJoin") <= 4, plan[:3000]
    assert "CartesianProduct" not in plan


def test_q9_profit_broadcasts_fixed_dims_only(no_auto_broadcast):
    spark = no_auto_broadcast
    plan = simple_plan(tpch_deep.q9_profit_by_nation_year(spark, SF))
    # nation keeps its hint; part/supplier are data-sized (no hint)
    assert plan.count("BroadcastHashJoin") >= 1, plan[:3000]
    assert 1 <= plan.count("SortMergeJoin") <= 3, plan[:3000]


def test_q21_decorrelates_to_semi_and_anti(no_auto_broadcast):
    spark = no_auto_broadcast
    plan = simple_plan(tpch_deep.q21_blocked_suppliers(spark, SF))
    # EXISTS twice (orders status + other-supplier line) and NOT EXISTS once
    assert plan.count("LeftSemi") >= 2, plan[:3000]
    assert plan.count("LeftAnti") >= 1, plan[:3000]
    # never a nested-loop over the fact table for the <> residual
    assert "CartesianProduct" not in plan


def test_q20_pushes_date_filter_and_prunes_columns(spark):
    plan = fmt_plan(tpch_deep.q20_heavy_shippers(spark, SF))
    li = scan_section(plan, "lineitem")
    assert "GreaterThanOrEqual(l_shipdate" in li, li
    # only suppkey/partkey/quantity/shipdate are referenced
    assert "l_extendedprice" not in li, li
    assert "l_returnflag" not in li, li


def test_q18_prunes_lineitem_for_having_subquery(spark):
    plan = fmt_plan(tpch_deep.q18_large_volume_customers(spark, SF))
    li = scan_section(plan, "lineitem")
    # the qualifying-orders aggregate needs only orderkey+quantity
    assert "l_quantity" in li
    assert "l_extendedprice" not in li, li
    assert "l_partkey" not in li, li


def test_q16_not_in_is_anti_join(no_auto_broadcast):
    spark = no_auto_broadcast
    plan = simple_plan(tpch_deep.q16_supplier_part_counts(spark, SF))
    # NOT IN decorrelates to an anti join, never a nested loop. The
    # exclusion list is a supplier fraction (data-sized), so it carries no
    # broadcast hint (r5 policy); AQE broadcasts it at bench SF from stats.
    assert "LeftAnti" in plan, plan[:3000]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q2_min_is_window_not_per_row_subquery(no_auto_broadcast):
    spark = no_auto_broadcast
    plan = simple_plan(tpch_deep.q2_min_cost_supplier(spark, SF))
    assert "Window" in plan, plan[:3000]
    assert "CartesianProduct" not in plan


def test_interval_join_is_equi_not_nested_loop(no_auto_broadcast):
    spark = no_auto_broadcast
    from clinical_data_platform_spark.plans import events as events_plans

    plan = simple_plan(events_plans.interval_join_error_windows(spark, SF))
    # bucketization turns the range predicate into an equi join + residual
    assert "BroadcastNestedLoopJoin" not in plan, plan[:3000]
    assert "CartesianProduct" not in plan, plan[:3000]
    assert "LeftSemi" in plan, plan[:3000]


def test_boilerplate_membership_is_equi_join(no_auto_broadcast):
    """The boilerplate line set is df-filtered but grows with the corpus
    (DATA-SIZED — more sources means more templates), so under the r5
    hint policy it carries NO broadcast hint: with statistics disabled
    the membership join shows as a hash-partitioned equi join (the honest
    100 TB plan); at bench SF the real session's AQE broadcasts the small
    side from size stats. What must never appear is a nested loop."""
    from clinical_data_platform_spark.plans.corpusqc import (
        boilerplate_removal_stats,
    )

    plan = simple_plan(boilerplate_removal_stats(no_auto_broadcast, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan


def test_dup_span_membership_is_equi_join(no_auto_broadcast):
    from clinical_data_platform_spark.plans.corpusqc import (
        dup_span_fraction_by_source,
    )

    plan = simple_plan(dup_span_fraction_by_source(no_auto_broadcast, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan


def test_bloom_probe_is_map_side_over_broadcast_sketch(no_auto_broadcast):
    """Incremental dedup: the Bloom sketch arrives as a broadcast
    single-row relation; the only non-broadcast join allowed is the
    anti-join verifying the false-positive sliver."""
    from clinical_data_platform_spark.plans.textops import (
        incremental_dedup_new_docs,
    )

    plan = simple_plan(incremental_dedup_new_docs(no_auto_broadcast, SF))
    assert "BroadcastNestedLoopJoin" in plan  # 1-row sketch cross join
    assert plan.count("SortMergeJoin") <= 1  # the verification anti-join


def test_ppjoin_has_no_cartesian_and_claims_parallelism(spark):
    """The PPJoin fix is pinned: no CartesianProduct/BroadcastNestedLoop
    anywhere, and the explicit hash exchanges that claim CPU parallelism
    (doc table by id, prefix by shingle) are present in the plan."""
    from clinical_data_platform_spark.operators.dedup import (
        ppjoin_jaccard_pairs,
    )

    df = spark.read.parquet(f"{SF}/documents.parquet")
    plan = simple_plan(ppjoin_jaccard_pairs(df, "doc_id", "text", 3, 0.3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "hashpartitioning(doc_id" in plan or "hashpartitioning(id_a" in plan


def test_covariance_shuffles_only_partials(spark):
    """The gram-partial plan never shuffles vector payloads: after the
    mapInPandas stage the exchanges carry only (i, j, v) partial rows —
    the embedding column must not appear in any exchange output."""
    from clinical_data_platform_spark.plans.matrixops import (
        embedding_covariance_matrix,
    )

    plan = fmt_plan(embedding_covariance_matrix(spark, SF))
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()
    # the only scan reads just the vector column (column pruning)
    assert "ReadSchema" in plan
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert any("embedding" in l and "vec_id" not in l for l in scan_lines)


def test_psi_pushes_week_filters_to_scan(spark):
    """Both reference-week scans must push their ts range filters down
    — the partition-pruning property that makes weekly PSI touch two
    weeks of a year-partitioned table, not the whole history."""
    from clinical_data_platform_spark.plans.stats import value_psi_weekly

    plan = fmt_plan(value_psi_weekly(spark, SF))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("GreaterThanOrEqual(ts" in l for l in pushed)
    assert any("LessThan(ts" in l for l in pushed)


def test_lorenz_has_no_global_sort(spark):
    """Decile assignment is map-side against broadcast boundaries — the
    plan must contain no global (non-partitioned) Sort and no ntile
    window over the full user table."""
    from clinical_data_platform_spark.plans.events import (
        user_value_lorenz_deciles,
    )

    import re

    plan = simple_plan(user_value_lorenz_deciles(spark, SF))
    # the ntile window function specifically ("percentile" is fine)
    assert not re.search(r"(?<![a-z])ntile\(", plan.lower())
    assert "rangepartitioning" not in plan.lower()  # global sort's shuffle

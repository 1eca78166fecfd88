"""Wave-9 plans: column profiler, market-basket lift, Markov transition
matrix — invariants beyond the DuckDB value oracle."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_column_profile_matches_direct_aggregates(spark):
    from clinical_data_platform_spark.plans.validation import (
        orders_column_profile,
    )

    rows = {r.column_name: r for r in orders_column_profile(spark, SF).collect()}
    assert set(rows) == {
        "o_orderstatus", "o_orderpriority", "o_totalprice", "o_custkey",
    }
    o = spark.read.parquet(f"{SF}/orders.parquet")
    n = o.count()
    for r in rows.values():
        assert r.n_rows == n
        assert r.n_nulls == 0  # synthetic orders are complete
    assert rows["o_orderstatus"].n_distinct == (
        o.select("o_orderstatus").distinct().count()
    )
    assert rows["o_custkey"].min_num == o.agg(F.min("o_custkey")).first()[0]
    assert rows["o_orderstatus"].min_str is not None
    assert rows["o_orderstatus"].min_num is None
    assert rows["o_totalprice"].min_str is None


def test_part_pair_lift_recomputes(spark):
    from clinical_data_platform_spark.plans.advanced import part_pair_lift

    rows = part_pair_lift(spark, SF).collect()
    assert 0 < len(rows) <= 20
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)  # TakeOrdered contract

    b = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = b.select("l_orderkey").distinct().count()
    baskets: dict[int, set[int]] = {}
    for r in b.collect():
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    supp: dict[int, int] = {}
    pair: dict[tuple[int, int], int] = {}
    for parts in baskets.values():
        for p in parts:
            supp[p] = supp.get(p, 0) + 1
        ps = sorted(parts)
        for i, pa in enumerate(ps):
            for pb in ps[i + 1:]:
                pair[(pa, pb)] = pair.get((pa, pb), 0) + 1
    import math

    for r in rows:
        assert pair[(r.part_a, r.part_b)] == r.pair_supp >= 2
        assert supp[r.part_a] == r.supp_a
        assert supp[r.part_b] == r.supp_b
        expect = r.pair_supp * n_orders / (r.supp_a * r.supp_b)
        assert r.lift == math.floor(expect * 1e6) / 1e6


def test_transition_matrix_rows_sum_to_one(spark):
    from clinical_data_platform_spark.plans.events import (
        event_transition_matrix,
    )

    rows = event_transition_matrix(spark, SF).collect()
    by_cur: dict[str, float] = {}
    total_n = 0
    for r in rows:
        assert 0.0 < r.p <= 1.0
        by_cur[r.cur] = by_cur.get(r.cur, 0.0) + r.p
        total_n += r.n
    for cur, s in by_cur.items():
        assert abs(s - 1.0) < 1e-4, (cur, s)  # trunc6 per cell
    # transitions = events - one sequence end per user
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert total_n == ev.count() - ev.select("user_id").distinct().count()

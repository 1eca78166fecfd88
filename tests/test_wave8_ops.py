"""Wave-8 plans: triangle counting, classifier calibration bins,
cumulative daily HLL — invariants beyond the DuckDB value oracle."""

from __future__ import annotations

from itertools import combinations

SF = "/root/testdata/sf0.001"


def test_triangle_counts_match_bruteforce(spark):
    from clinical_data_platform_spark.plans.graphops import (
        trade_triangle_counts,
    )

    got = {r.nation: r.n_triangles for r in trade_triangle_counts(spark, SF).collect()}
    # per-corner counts sum to 3x the number of triangles
    assert sum(got.values()) % 3 == 0
    assert all(v > 0 for v in got.values())

    # brute-force recount on the same thresholded edge list
    import pyspark.sql.functions as F

    from clinical_data_platform_spark.catalog import table as T

    l = T(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    o = T(spark, SF, "orders").select("o_orderkey", "o_custkey")
    s = T(spark, SF, "supplier").select("s_suppkey", "s_nationkey")
    c = T(spark, SF, "customer").select("c_custkey", "c_nationkey")
    n = T(spark, SF, "nation").select("n_nationkey", "n_name")
    d0 = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n.select(F.col("n_nationkey").alias("k1"), F.col("n_name").alias("src")), F.col("s_nationkey") == F.col("k1"))
        .join(n.select(F.col("n_nationkey").alias("k2"), F.col("n_name").alias("dst")), F.col("c_nationkey") == F.col("k2"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    ).collect()
    und: dict[tuple[str, str], int] = {}
    for r in d0:
        key = (min(r.src, r.dst), max(r.src, r.dst))
        und[key] = und.get(key, 0) + r.w
    avg_w = sum(und.values()) / len(und)
    edges = {k for k, w in und.items() if w > avg_w}
    nodes = sorted({x for e in edges for x in e})
    expected: dict[str, int] = {}
    for a, b, c3 in combinations(nodes, 3):
        if (a, b) in edges and (b, c3) in edges and (a, c3) in edges:
            for x in (a, b, c3):
                expected[x] = expected.get(x, 0) + 1
    assert got == expected


def test_calibration_bins_partition_docs(spark):
    from clinical_data_platform_spark.plans.contentfilter import (
        classifier_calibration_bins,
    )

    rows = classifier_calibration_bins(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0 <= r.bin <= 9
        assert 0.0 <= r.outcome_rate <= 1.0
        assert 0.0 <= r.mean_keep_prob <= 1.0
        # the bin's mean predicted probability lies inside the bin
        assert r.bin / 10 - 1e-6 <= r.mean_keep_prob <= (r.bin + 1) / 10 + 1e-6


def test_cumulative_hll_monotone_and_bounded(spark):
    import pyspark.sql.functions as F

    from clinical_data_platform_spark.plans.sketches import (
        hll_daily_cumulative_users,
    )

    rows = sorted(
        hll_daily_cumulative_users(spark, SF).collect(), key=lambda r: r.day
    )
    assert len(rows) >= 2
    exact = [r.exact_cum for r in rows]
    est = [r.hll_cumulative for r in rows]
    assert exact == sorted(exact)  # cumulative exact curve nondecreasing
    # registers only grow over time -> the raw-estimate branch is
    # monotone; allow slack for the linear-counting switchover
    for prev, cur in zip(est, est[1:]):
        assert cur >= prev * 0.95
    # final point estimates total distinct users within HLL error
    total = (
        spark.read.parquet(f"{SF}/events.parquet")
        .agg(F.countDistinct("user_id"))
        .first()[0]
    )
    assert exact[-1] == total
    assert abs(est[-1] - total) / total < 0.5  # 64 registers: ~13% sigma

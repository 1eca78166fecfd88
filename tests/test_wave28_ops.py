"""Wave-28 plans: log-rank test, spatial grid join, subtree rollup —
invariants beyond the DuckDB value oracle."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_logrank_consistent_with_km(spark):
    from clinical_data_platform_spark.plans.survival import (
        logrank_test_cohorts,
    )

    r = logrank_test_cohorts(spark, SF).collect()[0]
    assert r.chi2 >= 0
    assert 0.0 <= r.p_value <= 1.0
    assert r.observed_treated >= 0
    assert r.expected_treated > 0
    # chi2 = z^2 where z = (O-E)/sqrt(V): reconstruct V and sanity-check
    v = (r.observed_treated - r.expected_treated) ** 2 / r.chi2
    assert v > 0


def test_spatial_pairs_recount(spark):
    from clinical_data_platform_spark.plans.spatial import (
        spatial_grid_neighbor_pairs,
    )

    rows = spatial_grid_neighbor_pairs(spark, SF).collect()
    # brute-force recount proves the grid candidates are lossless
    import hashlib

    def coord(prefix: str, k: int) -> int:
        return int(
            hashlib.md5(f"{prefix}{k}".encode()).hexdigest()[:5], 16
        )

    cust = pd.read_parquet(f"{SF}/customer.parquet")
    ids = cust.c_custkey.tolist()
    pts = {i: (coord("x", i), coord("y", i)) for i in ids}
    r2 = (1 << 13) ** 2
    expected = {}
    for i in ids:
        for j in ids:
            if i < j:
                dx = pts[i][0] - pts[j][0]
                dy = pts[i][1] - pts[j][1]
                d = dx * dx + dy * dy
                if d <= r2:
                    expected[(i, j)] = d
    got = {(r.id_a, r.id_b): r.dist_sq for r in rows}
    assert got == expected


def test_subtree_rollup_recount(spark):
    from clinical_data_platform_spark.plans.graphops import (
        subtree_value_rollup,
    )

    rows = {r.node: r for r in subtree_value_rollup(spark, SF).collect()}
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    cents = {
        int(r.c_custkey): int(round(r.c_acctbal * 100))
        for r in cust.itertuples()
    }
    n = len(cents)
    assert set(rows) == set(cents)
    # sequential recount: children of k are 2k+1, 2k+2
    size = dict.fromkeys(cents, 1)
    total = dict(cents)
    for k in sorted(cents, reverse=True):
        p = (k - 1) // 2
        if k >= 1 and p in cents:
            size[p] += size[k]
            total[p] += total[k]
    for k, r in rows.items():
        assert r.subtree_size == size[k], k
        assert r.subtree_value_cents == total[k], k
    # the root's subtree is the whole forest
    assert rows[0].subtree_size == n
    assert rows[0].subtree_value_cents == sum(cents.values())


def test_subtree_closure_closed_form(spark):
    """r9 optimization pin: the per-row closed form the rewritten plan
    explodes — ancestor_j(k) = ((k+1) >> j) - 1 for j in
    1..bit_length(k+1)-1 — equals the iterated parent chain
    k -> (k-1)//2 -> ... -> 0 (the relation the oracle's recursive CTE
    walks), both in pure Python and through the Spark expression."""

    def chain(k: int) -> list[int]:
        out, a = [], (k - 1) // 2
        out.append(a)
        while a >= 1:
            a = (a - 1) // 2
            out.append(a)
        return out

    # pure-python algebra over a dense range + scattered large keys
    for k in [*range(1, 5000), 2**20 - 1, 2**20, 10**9, 10**12 + 7]:
        b = (k + 1).bit_length() - 1
        assert [((k + 1) >> j) - 1 for j in range(1, b + 1)] == chain(k), k

    # the Spark expression used by subtree_value_rollup produces the
    # identical ancestor sets
    import pyspark.sql.functions as F

    nodes = spark.range(1, 200).select(F.col("id").alias("node"))
    got = (
        nodes.select(
            "node",
            F.expr(
                "transform(sequence(1, length(bin(node + 1)) - 1),"
                " j -> shiftright(node + 1, j) - cast(1 AS BIGINT))"
            ).alias("anc"),
        )
        .collect()
    )
    for r in got:
        assert list(r.anc) == chain(r.node), r.node

"""Wave-54 plans: degree assortativity + newsvendor quantiles —
independent Python recounts beyond the DuckDB value oracle."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_assortativity_recount(spark):
    from clinical_data_platform_spark.plans.graphops import (
        trade_degree_assortativity,
    )
    from tests.test_wave43_ops import _trade_graph

    r = trade_degree_assortativity(spark, SF).collect()[0]
    edges = _trade_graph()
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    pairs = []
    for a, b in edges:
        pairs.append((deg[a], deg[b]))
        pairs.append((deg[b], deg[a]))
    m = len(pairs)
    su = sum(u for u, _ in pairs)
    sv = sum(v for _, v in pairs)
    suv = sum(u * v for u, v in pairs)
    su2 = sum(u * u for u, _ in pairs)
    sv2 = sum(v * v for _, v in pairs)
    rr = (m * suv - su * sv) / (
        math.sqrt(m * su2 - su * su) * math.sqrt(m * sv2 - sv * sv)
    )
    assert r.n_directed_edges == m
    assert abs(r.assortativity - round(rr, 6)) < 1e-6
    assert -1.0 <= r.assortativity <= 1.0


def test_newsvendor_recount(spark):
    from clinical_data_platform_spark.plans.relational import (
        _NV_CRITICAL,
        newsvendor_stock_levels,
    )

    got = {r.brand: r for r in newsvendor_stock_levels(spark, SF).collect()}
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_shipdate"],
    )
    p = pd.read_parquet(f"{SF}/part.parquet", columns=["p_partkey", "p_brand"])
    df = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    df["day"] = pd.to_datetime(df.l_shipdate).dt.date
    daily = (
        df.groupby(["p_brand", "day"])["l_quantity"]
        .sum()
        .astype(int)
        .reset_index()
    )
    for brand, grp in daily.groupby("p_brand"):
        vals = grp.sort_values(["l_quantity", "day"]).l_quantity.tolist()
        n = len(vals)
        k = min(math.ceil(_NV_CRITICAL * (n + 1)), n)
        r = got[brand]
        assert r.n_days == n
        assert r.stock_p80 == vals[k - 1], brand
        assert r.mean_daily_demand == math.floor(sum(vals) * 1e6 / n) / 1e6
        # the stock level covers >= critical-ratio share of observed days
        covered = sum(1 for v in vals if v <= r.stock_p80)
        assert covered / n >= _NV_CRITICAL - 0.05

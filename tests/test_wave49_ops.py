"""Wave-49 plans: Theil inequality decomposition + HHI concentration —
independent Python recounts beyond the DuckDB value oracle."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_theil_recount_and_additivity(spark):
    from clinical_data_platform_spark.plans.stats import (
        theil_inequality_decomposition,
    )

    r = theil_inequality_decomposition(spark, SF).collect()[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df["cents"] = (df.o_totalprice * 100).round().astype("int64")
    n = len(df)
    s = int(df.cents.sum())
    t_fp = sum(
        math.floor((x * n / s) * math.log(x * n / s) * 1e9)
        for x in df.cents
    )
    b_fp = 0
    for _, grp in df.groupby("c_nationkey"):
        ng, sg = len(grp), int(grp.cents.sum())
        sshare, nshare = sg / s, ng / n
        b_fp += math.floor(sshare * math.log(sshare / nshare) * 1e9)
    assert r.n_orders == n
    assert r.theil_total == math.floor(t_fp / n / 1e3) / 1e6
    assert r.theil_between == math.floor(b_fp / 1e3) / 1e6
    assert r.theil_within == math.floor((t_fp / n - b_fp) / 1e3) / 1e6
    # decomposition sanity: T ~ between + within, both nonnegative-ish
    assert r.theil_total > 0
    assert abs(r.theil_total - (r.theil_between + r.theil_within)) < 1e-5
    # exact float Theil for reference: fixed-point tracks it closely
    t_true = sum((x * n / s) * math.log(x * n / s) for x in df.cents) / n
    assert abs(r.theil_total - t_true) < 1e-5


def test_hhi_recount(spark):
    from clinical_data_platform_spark.plans.stats import (
        hhi_market_concentration,
    )

    got = {r.region: r for r in hhi_market_concentration(spark, SF).collect()}
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_suppkey", "l_extendedprice"])
    su = pd.read_parquet(f"{SF}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    na = pd.read_parquet(f"{SF}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    re = pd.read_parquet(f"{SF}/region.parquet", columns=["r_regionkey", "r_name"])
    df = (
        li.merge(su, left_on="l_suppkey", right_on="s_suppkey")
        .merge(na, left_on="s_nationkey", right_on="n_nationkey")
        .merge(re, left_on="n_regionkey", right_on="r_regionkey")
    )
    df["cents"] = (df.l_extendedprice * 100).round().astype("int64")
    rev = df.groupby(["r_name", "s_suppkey"])["cents"].sum()
    for region, grp in rev.groupby(level=0):
        total = int(grp.sum())
        hhi = sum(
            math.floor((c / total) ** 2 * 1e12) for c in grp
        ) / 1e8
        r = got[region]
        assert r.n_suppliers == len(grp)
        assert abs(r.hhi - hhi) < 1e-9, (region, r.hhi, hhi)
        assert r.top_share == math.floor(int(grp.max()) * 1e6 / total) / 1e6
        # HHI bounds: 10000/n <= HHI <= 10000
        assert 10000.0 / len(grp) - 1e-6 <= r.hhi <= 10000.0

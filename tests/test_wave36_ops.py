"""Wave-36 plans: rank statistics at scale (Spearman via two-phase binned
ranks, two-sample KS, one-way ANOVA) — independent numpy/pandas recounts
beyond the DuckDB value oracle."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_spearman_matches_pandas(spark):
    from clinical_data_platform_spark.plans.stats import (
        spearman_quantity_price,
    )

    got = {
        r.l_returnflag: r
        for r in spearman_quantity_price(spark, SF).collect()
    }
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    for flag, grp in li.groupby("l_returnflag"):
        r = got[flag]
        assert r.n_rows == len(grp)
        rho = grp.l_quantity.rank(method="average").corr(
            grp.l_extendedprice.rank(method="average")
        )
        pea = np.corrcoef(
            grp.l_quantity.astype("int64"),
            (grp.l_extendedprice * 100).round().astype("int64"),
        )[0, 1]
        assert abs(r.spearman_rho - rho) < 1e-5, flag
        assert abs(r.pearson_rho - pea) < 1e-5, flag


def test_ks_matches_numpy(spark):
    from clinical_data_platform_spark.plans.stats import (
        ks_test_price_by_status,
    )

    r = ks_test_price_by_status(spark, SF).collect()[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    a = np.sort((o[o.o_orderstatus == "F"].o_totalprice * 100).round())
    b = np.sort((o[o.o_orderstatus == "O"].o_totalprice * 100).round())
    assert (r.n_f, r.n_o) == (len(a), len(b))
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    d = np.abs(fa - fb)
    assert abs(r.ks_d - d.max()) < 1e-6
    # reported location attains the max (lowest such price on ties)
    locs = grid[d >= d.max() - 1e-12] / 100.0
    assert abs(r.d_at_price - locs.min()) < 1e-9
    en = math.sqrt(len(a) * len(b) / (len(a) + len(b)))
    lam = (en + 0.12 + 0.11 / en) * d.max()
    p = 2.0 * sum(
        (-1) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam)
        for k in (1, 2, 3)
    )
    assert abs(r.p_value - min(1.0, max(0.0, p))) < 1e-6
    assert 0.0 <= r.p_value <= 1.0


def test_anova_matches_numpy(spark):
    from clinical_data_platform_spark.plans.stats import (
        anova_f_priority_price,
    )

    r = anova_f_priority_price(spark, SF).collect()[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    cents = (o.o_totalprice * 100).round().astype("int64")
    groups = [
        cents[o.o_orderpriority == p].to_numpy()
        for p in o.o_orderpriority.unique()
    ]
    k, n = len(groups), len(cents)
    assert (r.k_groups, r.n_orders) == (k, n)
    grand = cents.mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert abs(r.f_stat - f) / max(f, 1.0) < 1e-6
    assert abs(r.eta_sq - ssb / (ssb + ssw)) < 1e-6
    # r9: p_approx is the STRICT upper tail of the Wilson-Hilferty
    # normal for (k-1)F ~ chi2(k-1) — erfc(z/sqrt(2))/2, not the old
    # two-sided convention. Tolerance: 6-dp rounding + the 1.5e-7 A&S
    # erf approximation budget.
    import math

    kd = k - 1
    zwh = (f ** (1.0 / 3.0) - (1.0 - 2.0 / (9.0 * kd))) / math.sqrt(
        2.0 / (9.0 * kd)
    )
    p_ref = math.erfc(zwh / math.sqrt(2.0)) / 2.0
    assert abs(r.p_approx - p_ref) < 2e-6

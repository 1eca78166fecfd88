"""Wave-46 plans: Cochran-Armitage trend + NB overdispersion —
independent Python recounts beyond the DuckDB value oracle."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _normal_sf(z: float) -> float:
    return 1.0 - math.erf(abs(z) / math.sqrt(2.0))


def test_cochran_armitage_recount(spark):
    from clinical_data_platform_spark.plans.stats import cochran_armitage_trend

    r = cochran_armitage_trend(spark, SF).collect()[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["w"] = o.o_orderpriority.str[0].astype(int)
    o["y"] = (o.o_totalprice > 150000.0).astype(int)
    g = o.groupby("w").agg(n=("y", "size"), r=("y", "sum"))
    N = int(g.n.sum())
    R = int(g.r.sum())
    srw = int((g.r * g.index).sum())
    snw = int((g.n * g.index).sum())
    snw2 = int((g.n * g.index**2).sum())
    tstat = srw - R * 1.0 * snw / N
    pbar = R / N
    vart = pbar * (1 - pbar) * (snw2 - snw * 1.0 * snw / N)
    z = tstat / math.sqrt(vart)
    assert (r.k_groups, r.n_orders, r.n_high) == (len(g), N, R)
    assert abs(r.trend_stat - round(tstat, 6)) < 1e-6
    assert abs(r.z - round(z, 6)) < 1e-6
    # A&S approximation tolerance vs math.erf: ~1.5e-7
    assert abs(r.p_value - _normal_sf(z)) < 1e-5


def test_negbin_recount(spark):
    from clinical_data_platform_spark.plans.stats import negbin_overdispersion

    got = {r.event_type: r for r in negbin_overdispersion(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type"])
    ev["hour"] = ev.ts.dt.floor("h")
    for etype, grp in ev.groupby("event_type"):
        xs = grp.groupby("hour").size().astype(int).tolist()
        n = len(xs)
        s1 = sum(xs)
        s2 = sum(x * x for x in xs)
        mean = s1 / n
        var = (s2 - s1 * s1 / n) / (n - 1)
        r = got[etype]
        assert r.n_hours == n and r.n_events == s1
        assert r.mean_per_hour == math.floor(mean * 1e6) / 1e6
        assert abs(r.var_per_hour - round(var, 6)) < 1e-6
        assert abs(r.dispersion - round(var / mean, 6)) < 1e-6
        if var > mean:
            assert abs(r.nb_r - round(mean * mean / (var - mean), 6)) < 1e-5
        else:
            assert r.nb_r is None
        assert 0.0 <= r.poisson_p <= 1.0


def test_negbin_nb_r_only_when_overdispersed(spark):
    from clinical_data_platform_spark.plans.stats import negbin_overdispersion

    for r in negbin_overdispersion(spark, SF).collect():
        if r.dispersion > 1.0:
            assert r.nb_r is not None and r.nb_r > 0
        else:
            assert r.nb_r is None

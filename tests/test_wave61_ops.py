"""Wave-61 plans: seasonal Mann-Kendall + Gumbel block maxima —
independent sequential Python recounts beyond the DuckDB value oracle."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_seasonal_mk_recount(spark):
    from clinical_data_platform_spark.plans.stats import seasonal_mann_kendall

    got = {r.event_type: r for r in seasonal_mann_kendall(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type", "value"])
    ev["t"] = (ev.ts.astype("datetime64[ns]").astype("int64") // 10**9) // 3600
    ev["cents"] = (ev.value * 100.0).round().astype("int64")
    hourly = ev.groupby(["event_type", "t"])["cents"].sum().reset_index()
    hourly["season"] = hourly.t % 24
    for etype, grp in hourly.groupby("event_type"):
        s_tot = 0
        var_tot = 0.0
        k = 0
        for _, sg in grp.groupby("season"):
            xs = sg.sort_values("t").cents.tolist()
            n = len(xs)
            sh = sum(
                (xs[j] > xs[i]) - (xs[j] < xs[i])
                for i in range(n)
                for j in range(i + 1, n)
            )
            if n >= 2:  # the pair join only emits seasons with >= 1 pair
                s_tot += sh
                k += 1
            var_tot += n * (n - 1) * (2 * n + 5) / 18.0
        r = got[etype]
        assert r.s_tot == s_tot, etype
        assert r.k_seasons == k
        assert 0.0 <= r.p_value <= 1.0


def test_seasonal_mk_agrees_with_plain_mk_direction(spark):
    """Cross-operator: when both tests are significant they point the
    same way (the seasonal variant removes cycle, not sign)."""
    from clinical_data_platform_spark.plans.stats import (
        mann_kendall_trend,
        seasonal_mann_kendall,
    )

    plain = {r.event_type: r for r in mann_kendall_trend(spark, SF).collect()}
    seas = {r.event_type: r for r in seasonal_mann_kendall(spark, SF).collect()}
    for etype in plain:
        if plain[etype].p_value < 0.05 and seas[etype].p_value < 0.05:
            assert (plain[etype].mk_s > 0) == (seas[etype].s_tot > 0)


def test_gumbel_recount(spark):
    from clinical_data_platform_spark.plans.stats import gumbel_block_maxima

    got = {r.event_type: r for r in gumbel_block_maxima(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type", "value"])
    ev["day"] = ev.ts.dt.floor("d")
    ev["cents"] = (ev.value * 100.0).round().astype("int64")
    daily = ev.groupby(["event_type", "day"])["cents"].max().reset_index()
    SQRT6_PI = 0.7796968012336761
    EULER = 0.5772156649015329
    for etype, grp in daily.groupby("event_type"):
        xs = grp.cents.tolist()
        n = len(xs)
        s1 = sum(xs)
        s2 = sum(x * x for x in xs)
        mean = s1 / n / 100.0
        sd = math.sqrt((s2 - s1 * s1 / n) / (n - 1)) / 100.0
        beta = SQRT6_PI * sd
        mu = mean - EULER * beta
        rl = mu - beta * math.log(-math.log(1.0 - 1.0 / 100))
        r = got[etype]
        assert r.n_days == n
        assert abs(r.gumbel_mu - round(mu, 6)) < 2e-6
        assert abs(r.gumbel_beta - round(beta, 6)) < 2e-6
        assert abs(getattr(r, "return_level_100d") - round(rl, 6)) < 2e-6
        # the 100-day return level exceeds the mean daily max
        assert getattr(r, "return_level_100d") > mean

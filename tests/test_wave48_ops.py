"""Wave-48 plans: Mann-Kendall trend + Theil-Sen slope — independent
sequential Python recounts beyond the DuckDB value oracle."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _hourly(SF=SF):
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type", "value"])
    ev["t"] = (
        ev.ts.astype("datetime64[ns]").astype("int64") // 10**9
    ) // 3600
    ev["cents"] = (ev.value * 100.0).round().astype("int64")
    return ev.groupby(["event_type", "t"])["cents"].sum().reset_index()


def test_mann_kendall_recount(spark):
    from clinical_data_platform_spark.plans.stats import mann_kendall_trend

    got = {r.event_type: r for r in mann_kendall_trend(spark, SF).collect()}
    hourly = _hourly()
    for etype, grp in hourly.groupby("event_type"):
        xs = grp.sort_values("t").cents.tolist()
        n = len(xs)
        s = 0
        for i in range(n):
            for j in range(i + 1, n):
                s += (xs[j] > xs[i]) - (xs[j] < xs[i])
        from collections import Counter

        tie_term = sum(
            c * (c - 1) * (2 * c + 5) for c in Counter(xs).values()
        )
        var_s = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
        s_cc = s - 1 if s > 0 else (s + 1 if s < 0 else 0)
        z = s_cc / math.sqrt(var_s)
        r = got[etype]
        assert r.n_hours == n
        assert r.mk_s == s, (etype, r.mk_s, s)
        assert abs(r.z - round(z, 6)) < 1e-6
        assert 0.0 <= r.p_value <= 1.0


def test_theil_sen_recount(spark):
    from clinical_data_platform_spark.plans.stats import theil_sen_slope

    got = {r.event_type: r for r in theil_sen_slope(spark, SF).collect()}
    hourly = _hourly()
    for etype, grp in hourly.groupby("event_type"):
        pts = grp.sort_values("t")[["t", "cents"]].values.tolist()
        slopes = sorted(
            (b[1] - a[1]) * 1.0 / (b[0] - a[0])
            for i, a in enumerate(pts)
            for b in pts[i + 1 :]
        )
        np_ = len(slopes)
        lo = slopes[(np_ + 1) // 2 - 1]
        hi = slopes[(np_ + 2) // 2 - 1]
        sen = math.floor((lo + hi) / 2 * 1e4) / 1e6
        r = got[etype]
        assert r.n_pairs == np_
        assert r.sen_slope == sen, (etype, r.sen_slope, sen)


def test_mk_and_sen_agree_on_direction(spark):
    """Cross-operator invariant: whenever MK finds a significant trend,
    the Sen slope points the same way."""
    from clinical_data_platform_spark.plans.stats import (
        mann_kendall_trend,
        theil_sen_slope,
    )

    mk = {r.event_type: r for r in mann_kendall_trend(spark, SF).collect()}
    sen = {r.event_type: r for r in theil_sen_slope(spark, SF).collect()}
    assert set(mk) == set(sen)
    for etype in mk:
        if mk[etype].p_value < 0.05 and mk[etype].mk_s != 0:
            assert (mk[etype].mk_s > 0) == (sen[etype].sen_slope > 0), etype

"""Wave-59 plans: Poisson rate-ratio test + Wald-Wolfowitz runs test —
independent sequential Python recounts beyond the DuckDB value oracle."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_rate_ratio_recount(spark):
    from clinical_data_platform_spark.plans.stats import poisson_rate_ratio_test

    got = {r.event_type: r for r in poisson_rate_ratio_test(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type"])
    us = ev.ts.astype("datetime64[ns]").astype("int64") // 1000
    mid = (int(us.min()) + int(us.max())) // 2
    ev["half"] = (us >= mid).astype(int) + 1
    for etype, grp in ev.groupby("event_type"):
        c1 = int((grp.half == 1).sum())
        c2 = int((grp.half == 2).sum())
        r = got[etype]
        assert (r.n_first_half, r.n_second_half) == (c1, c2)
        assert r.rate_ratio == math.floor(c1 * 1e6 / c2) / 1e6
        z = math.log(c1 / c2) / math.sqrt(1 / c1 + 1 / c2)
        assert abs(r.z - round(z, 6)) < 1e-6
        assert 0.0 <= r.p_value <= 1.0


def test_runs_test_recount(spark):
    from clinical_data_platform_spark.plans.stats import runs_test_hourly

    got = {r.event_type: r for r in runs_test_hourly(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type", "value"])
    ev["hour"] = ev.ts.dt.floor("h")
    ev["cents"] = (ev.value * 100.0).round().astype("int64")
    hourly = ev.groupby(["event_type", "hour"])["cents"].sum().reset_index()
    for etype, grp in hourly.groupby("event_type"):
        grp = grp.sort_values("hour")
        ordered = grp.sort_values(["cents", "hour"]).cents.tolist()
        n_all = len(ordered)
        median = ordered[(n_all + 1) // 2 - 1]
        ss = [1 if x > median else 0 for x in grp.cents if x != median]
        n = len(ss)
        n_pos = sum(ss)
        runs = 1 + sum(1 for a, b in zip(ss, ss[1:]) if a != b)
        r = got[etype]
        assert (r.n_hours, r.n_pos, r.n_neg, r.n_runs) == (
            n,
            n_pos,
            n - n_pos,
            runs,
        ), etype
        er = 1.0 + 2.0 * n_pos * (n - n_pos) / n
        vr = (
            2.0 * n_pos * (n - n_pos) * (2.0 * n_pos * (n - n_pos) - n)
            / (n * n * (n - 1))
        )
        assert abs(r.expected_runs - round(er, 6)) < 1e-6
        assert abs(r.z - round((runs - er) / math.sqrt(vr), 6)) < 1e-6
        assert 0.0 <= r.p_value <= 1.0

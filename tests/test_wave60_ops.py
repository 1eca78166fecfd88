"""Wave-60 plans: session-gap sensitivity + Wasserstein-1 drift —
independent sequential Python recounts beyond the DuckDB value oracle."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_session_gap_recount(spark):
    from clinical_data_platform_spark.plans.events import (
        _GAP_THRESHOLDS_S,
        session_gap_sensitivity,
    )

    got = {r.gap_s: r for r in session_gap_sensitivity(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    ev["sec"] = ev.ts.astype("datetime64[ns]").astype("int64") // 10**9
    n_users = ev.user_id.nunique()
    n_events = len(ev)
    breaks = {t: 0 for t in _GAP_THRESHOLDS_S}
    for _, grp in ev.groupby("user_id"):
        secs = sorted(grp.sec)
        for a, b in zip(secs, secs[1:]):
            for t in _GAP_THRESHOLDS_S:
                if b - a > t:
                    breaks[t] += 1
    for t in _GAP_THRESHOLDS_S:
        r = got[t]
        sessions = n_users + breaks[t]
        assert r.n_users == n_users
        assert r.n_sessions == sessions, (t, r.n_sessions, sessions)
        assert r.events_per_session == math.floor(n_events * 1e6 / sessions) / 1e6
    # monotone: larger gap -> fewer sessions
    ts = sorted(got)
    counts = [got[t].n_sessions for t in ts]
    assert counts == sorted(counts, reverse=True)


def test_wasserstein_recount(spark):
    from clinical_data_platform_spark.plans.stats import wasserstein_value_drift

    got = {r.event_type: r for r in wasserstein_value_drift(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type", "value"])
    us = ev.ts.astype("datetime64[ns]").astype("int64") // 1000
    mid = (int(us.min()) + int(us.max())) // 2
    ev["half"] = (us >= mid).astype(int) + 1
    ev["cents"] = (ev.value * 100.0).round().astype("int64")
    for etype, grp in ev.groupby("event_type"):
        a = sorted(grp[grp.half == 1].cents)
        b = sorted(grp[grp.half == 2].cents)
        values = sorted(set(a) | set(b))
        import bisect

        w_fp = 0
        for v, nxt in zip(values, values[1:]):
            f1 = bisect.bisect_right(a, v) / len(a)
            f2 = bisect.bisect_right(b, v) / len(b)
            w_fp += math.floor(abs(f1 - f2) * (nxt - v) * 1e6)
        r = got[etype]
        assert (r.n_first_half, r.n_second_half) == (len(a), len(b))
        assert r.w1_dollars == math.floor(w_fp / 1e4) / 1e4, etype
        assert r.w1_dollars >= 0.0

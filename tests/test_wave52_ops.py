"""Wave-52 plans: Greenwood KM bands + Mantel-Haenszel/CMH —
independent sequential Python recounts beyond the DuckDB value oracle."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_greenwood_bands_contain_km(spark):
    """Consistency with the base KM curve: same survival values, bands
    bracket them, se grows with accumulated hazard."""
    from clinical_data_platform_spark.plans.survival import (
        kaplan_meier_survival,
        km_greenwood_ci,
    )

    km = {
        (r.cohort, r.duration_hours): r.survival
        for r in kaplan_meier_survival(spark, SF).collect()
    }
    gw = km_greenwood_ci(spark, SF).collect()
    assert {(r.cohort, r.duration_hours) for r in gw} == set(km)
    for r in gw:
        assert r.survival == km[(r.cohort, r.duration_hours)]
        assert 0.0 <= r.ci_lo <= r.survival <= r.ci_hi <= 1.0
        assert r.se >= 0.0


def test_greenwood_recount(spark):
    """Sequential life-table recount of survival, se, and bands."""
    from clinical_data_platform_spark.plans.survival import km_greenwood_ci

    got = km_greenwood_ci(spark, SF).collect()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "event_type"])
    ev["sec"] = ev.ts.astype("datetime64[ns]").astype("int64") // 10**9
    t_max = int(ev.sec.max())
    import hashlib

    rows = []
    for uid, grp in ev.groupby("user_id"):
        t0 = int(grp.sec.min())
        pur = grp[grp.event_type == "purchase"]
        t_evt = int(pur.sec.min()) if len(pur) else None
        coh = (
            "A"
            if int(hashlib.md5(str(uid).encode()).hexdigest()[:6], 16) % 2 == 0
            else "B"
        )
        dur = math.floor(((t_evt if t_evt is not None else t_max) - t0) / 3600.0)
        rows.append((coh, dur, 1 if t_evt is not None else 0))
    df = pd.DataFrame(rows, columns=["cohort", "dur", "evt"])
    z = 1.959963984540054
    expect = {}
    for coh, grp in df.groupby("cohort"):
        tbl = grp.groupby("dur").agg(d=("evt", "sum"), n_all=("evt", "size"))
        at_risk = int(tbl.n_all.sum())
        logs = 0.0
        gw = 0.0
        for dur, row in tbl.sort_index().iterrows():
            d, n = int(row.d), at_risk
            if d < n:
                logs += math.log((n - d) / n)
                gw += d / (n * (n - d))
                surv = math.exp(logs)
            else:
                surv = 0.0
            if d > 0:
                se = surv * math.sqrt(gw)
                expect[(coh, dur)] = (
                    n,
                    d,
                    round(surv, 6),
                    round(se, 6),
                    round(max(surv - z * se, 0.0), 6),
                    round(min(surv + z * se, 1.0), 6),
                )
            at_risk -= int(row.n_all)
    assert len(got) == len(expect)
    for r in got:
        n, d, surv, se, lo, hi = expect[(r.cohort, r.duration_hours)]
        assert (r.n_at_risk, r.n_events) == (n, d)
        assert abs(r.survival - surv) < 2e-6
        assert abs(r.se - se) < 2e-6
        assert abs(r.ci_lo - lo) < 5e-6
        assert abs(r.ci_hi - hi) < 5e-6


def test_mantel_haenszel_recount(spark):
    from clinical_data_platform_spark.plans.stats import mantel_haenszel_or

    r = mantel_haenszel_or(spark, SF).collect()[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df["t"] = (df.o_orderpriority == "1-URGENT").astype(int)
    df["y"] = (df.o_totalprice > 150000.0).astype(int)
    k = sa = sad = sbc = se_ = sv = 0
    for _, grp in df.groupby("c_nationkey"):
        n = len(grp)
        if n < 2:
            continue
        a = int(((grp.t == 1) & (grp.y == 1)).sum())
        b = int(((grp.t == 1) & (grp.y == 0)).sum())
        cc = int(((grp.t == 0) & (grp.y == 1)).sum())
        d = int(((grp.t == 0) & (grp.y == 0)).sum())
        k += 1
        sa += a
        sad += math.floor(a * d / n * 1e6)
        sbc += math.floor(b * cc / n * 1e6)
        se_ += math.floor((a + b) * (a + cc) / n * 1e6)
        sv += math.floor(
            (a + b) * (cc + d) * (a + cc) * (b + d) / (n * n * (n - 1)) * 1e6
        )
    assert r.k_strata == k
    assert r.mh_odds_ratio == math.floor(sad / sbc * 1e6) / 1e6
    chi2 = (abs(sa * 1e6 - se_) - 0.5e6) ** 2 / (sv * 1e6)
    assert abs(r.cmh_chi2 - round(chi2, 6)) < 1e-5
    assert 0.0 <= r.p_value <= 1.0
    assert r.mh_odds_ratio > 0

"""Wave-29 plans: Shapley attribution, SPRT, regression discontinuity,
power planning — invariants beyond the DuckDB value oracle."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_shapley_credit_conservation(spark):
    from clinical_data_platform_spark.plans.events import (
        shapley_channel_attribution,
    )

    rows = shapley_channel_attribution(spark, SF).collect()
    assert {r.channel for r in rows} == {"view", "click", "signup"}
    # efficiency axiom: credit sums to the number of conversions with
    # >= 1 pre-purchase touch (recount from raw events)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    fp = (
        ev[ev.event_type == "purchase"]
        .groupby("user_id")
        .ts.min()
        .rename("first_purchase")
    )
    pre = ev.join(fp, on="user_id", how="inner")
    pre = pre[pre.ts < pre.first_purchase]
    touched = (
        pre[pre.event_type.isin(["view", "click", "signup"])]
        .groupby("user_id")
        .event_type.agg(lambda s: frozenset(s))
    )
    n_conv = int((touched.map(len) > 0).sum())
    total_credit = sum(r.attributed_conversions for r in rows)
    assert abs(total_credit - n_conv) < 1e-3
    # shares sum to ~1 (floor-truncated at 6 dp)
    share_sum = sum(r.credit_share for r in rows)
    assert 1.0 - 3e-6 <= share_sum <= 1.0
    # symmetry/null-player recount: equal split among touched channels
    expected = {"view": 0.0, "click": 0.0, "signup": 0.0}
    for s in touched:
        if s:
            for ch in s:
                expected[ch] += 1.0 / len(s)
    for r in rows:
        assert abs(r.attributed_conversions - expected[r.channel]) < 1e-3


def test_sprt_walk_and_boundaries(spark):
    from clinical_data_platform_spark.plans.events import sprt_daily_decision

    rows = sorted(sprt_daily_decision(spark, SF).collect(), key=lambda r: r.day)
    assert rows
    up, lo = math.log(19.0), math.log(1.0 / 19.0)
    p0, p1 = 0.19, 0.21
    cum = 0.0
    for r in rows:
        assert 0 <= r.n_purch <= r.n_events
        cum += r.n_purch * math.log(p1 / p0) + (
            r.n_events - r.n_purch
        ) * math.log((1 - p1) / (1 - p0))
        assert abs(r.cum_llr - cum) < 1e-4
        want = (
            "accept_h1"
            if r.cum_llr >= up
            else "accept_h0" if r.cum_llr <= lo else "continue"
        )
        assert r.decision == want


def test_rd_two_sided_fits(spark):
    from clinical_data_platform_spark.plans.stats import (
        rd_discontinuity_estimate,
    )

    rows = {r.side: r for r in rd_discontinuity_estimate(spark, SF).collect()}
    assert set(rows) == {0, 1}
    # both sides fit a probability-valued outcome: limits stay in [0,1]
    for r in rows.values():
        assert r.n > 0
        assert -0.5 <= r.limit_at_cutoff <= 1.5
    jump = rows[1].limit_at_cutoff - rows[0].limit_at_cutoff
    for r in rows.values():
        assert abs(r.rd_effect - round(jump, 6)) < 2e-6
    # brute-force recount of the side-0 fit
    o = pd.read_parquet(f"{SF}/orders.parquet")
    w = o[(o.o_totalprice >= 100000.0) & (o.o_totalprice < 200000.0)]
    x = (w.o_totalprice - 200000.0) / 100000.0
    y = w.o_orderpriority.isin(["1-URGENT", "2-HIGH"]).astype(float)
    n = len(w)
    slope = (n * (x * y).sum() - x.sum() * y.sum()) / (
        n * (x * x).sum() - x.sum() ** 2
    )
    icept = (y.sum() - slope * x.sum()) / n
    assert abs(rows[0].limit_at_cutoff - icept) < 1e-4
    assert abs(rows[0].local_slope - slope) < 1e-4


def test_power_plan_monotone(spark):
    from clinical_data_platform_spark.plans.stats import power_sample_size_plan

    rows = sorted(
        power_sample_size_plan(spark, SF).collect(), key=lambda r: r.rel_mde
    )
    assert [r.rel_mde for r in rows] == [0.02, 0.05, 0.10]
    # smaller effects need more samples — strictly decreasing in MDE
    assert rows[0].n_per_arm > rows[1].n_per_arm > rows[2].n_per_arm
    for r in rows:
        assert r.target_rate > r.baseline_rate > 0
        # closed-form recount (Fleiss): n = (za*sqrt(2 pbar qbar)
        #   + zb*sqrt(p0 q0 + p1 q1))^2 / (p1-p0)^2
        p0, p1 = r.baseline_rate, r.target_rate
        za, zb = 1.959963984540054, 0.8416212335729143
        pbar = (p0 + p1) / 2
        n = (
            za * math.sqrt(2 * pbar * (1 - pbar))
            + zb * math.sqrt(p0 * (1 - p0) + p1 * (1 - p1))
        ) ** 2 / (p1 - p0) ** 2
        assert abs(r.n_per_arm - math.ceil(n)) <= 1

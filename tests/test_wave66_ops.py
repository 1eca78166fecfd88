"""Wave-66 invariant tests: Fisher exact, OLS influence, Newey-West HAC,
tail dependence, Weibull plot fit, and min-plus APSP closeness."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_fisher_exact_matches_python_reference(spark):
    """Recompute the exact two-sided p in plain Python (lgamma) and pin
    the operator to it — the oracle proves engine parity, this proves
    the STATISTIC is the Fisher p, not just a reproducible number."""
    from clinical_data_platform_spark.plans.stats import (
        fisher_exact_supplier_balance,
    )

    r = fisher_exact_supplier_balance(spark, SF).collect()[0]
    a, b, c, d = r.n_eu_neg, r.n_eu_pos, r.n_row_neg, r.n_row_pos
    r1, c1, n = a + b, a + c, a + b + c + d

    def logp(k):
        return (
            math.lgamma(r1 + 1)
            - math.lgamma(k + 1)
            - math.lgamma(r1 - k + 1)
            + math.lgamma(n - r1 + 1)
            - math.lgamma(c1 - k + 1)
            - math.lgamma(n - r1 - c1 + k + 1)
            - (math.lgamma(n + 1) - math.lgamma(c1 + 1) - math.lgamma(n - c1 + 1))
        )

    lo, hi = max(0, r1 + c1 - n), min(r1, c1)
    obs = logp(a)
    p_ref = sum(
        math.exp(logp(k)) for k in range(lo, hi + 1) if logp(k) <= obs + 1e-9
    )
    assert 0.0 <= r.p_two_sided <= 1.0
    assert abs(r.p_two_sided - p_ref) < 1e-4
    assert r.n_tables >= 1  # the observed table always counts itself


def test_ols_influence_diagnostics_bounds(spark):
    from clinical_data_platform_spark.plans.stats import (
        ols_influence_diagnostics,
    )

    rows = ols_influence_diagnostics(spark, SF).collect()
    assert len(rows) == 10
    ds = [r.cooks_d for r in rows]
    assert ds == sorted(ds, reverse=True)  # ranked by influence
    for r in rows:
        assert 0.0 < r.leverage < 1.0  # hat values of a full-rank fit
        assert r.cooks_d >= 0.0
        assert r.revenue > 0.0


def test_newey_west_vs_ols_se(spark):
    from clinical_data_platform_spark.plans.stats import newey_west_trend_se

    r = newey_west_trend_se(spark, SF).collect()[0]
    assert r.n_days > 100
    assert r.se_ols > 0.0 and r.se_nw > 0.0
    # the reported ratio IS the two ses' ratio (trunc6 slack)
    assert abs(r.se_ratio - r.se_nw / r.se_ols) < 2e-3
    # Bartlett-weighted NW variance is PSD — se_nw is a real number and
    # within an order of magnitude of the naive se on iid-ish data
    assert 0.1 < r.se_ratio < 10.0


def test_tail_dependence_bounds(spark):
    from clinical_data_platform_spark.plans.stats import tail_dependence_daily

    rows = {r.q: r for r in tail_dependence_daily(spark, SF).collect()}
    assert set(rows) == {"0.90", "0.95"}
    assert rows["0.90"].tail_n > rows["0.95"].tail_n
    for r in rows.values():
        assert 0 <= r.joint_hi <= r.tail_n
        assert 0 <= r.joint_lo <= r.tail_n
        assert 0.0 <= r.lambda_upper <= 1.0
        assert 0.0 <= r.lambda_lower <= 1.0


def test_weibull_fit_sanity(spark):
    from clinical_data_platform_spark.plans.survival import (
        weibull_survival_fit,
    )

    r = weibull_survival_fit(spark, SF).collect()[0]
    assert r.n_points >= 3
    assert r.shape_k > 0.0  # a survival curve only decreases
    assert r.scale_hours > 0.0
    assert 0.0 <= r.r2 <= 1.0
    # median = scale * ln(2)^(1/k): k < 1 => median < scale (and vice versa)
    if r.shape_k < 1.0:
        assert r.median_hours < r.scale_hours
    elif r.shape_k > 1.0:
        assert r.median_hours > r.scale_hours


def test_closeness_centrality_invariants(spark):
    from clinical_data_platform_spark.plans.graphops import (
        nation_closeness_centrality,
    )

    rows = nation_closeness_centrality(spark, SF).collect()
    assert len(rows) == 25  # every nation reports, traded or not
    for r in rows:
        if r.n_reachable == 0:
            assert r.closeness is None and r.harmonic is None
            continue
        assert 1 <= r.eccentricity <= 8  # 3 squarings cover 8 hops
        assert r.sum_dist >= r.n_reachable  # every distance >= 1
        assert 0.0 < r.closeness <= 1.0
        # harmonic <= n_reachable (each term <= 1), and closeness <=
        # harmonic/n_reach is NOT an invariant — but both are positive
        assert 0.0 < r.harmonic <= r.n_reachable
    reach = {r.n_reachable for r in rows}
    # the trade graph at any shipped SF is connected on its trading core
    assert max(reach) >= 2

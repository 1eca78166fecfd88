"""Wave-70 invariant tests: price indices, Cox score test, seasonal
decomposition, Atkinson index."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_fisher_index_bounds(spark):
    from clinical_data_platform_spark.plans.tpch_deep import (
        fisher_price_index_yearly,
    )

    r = fisher_price_index_yearly(spark, SF).collect()[0]
    assert r.n_parts > 0
    assert r.laspeyres > 0 and r.paasche > 0
    # Fisher is the geometric mean: always between its two factors
    lo, hi = sorted([r.laspeyres, r.paasche])
    assert lo - 1e-6 <= r.fisher <= hi + 1e-6
    # synthetic prices are time-stationary: indices near 1
    assert 0.7 < r.fisher < 1.3


def test_cox_score_consistent_with_logrank_machinery(spark):
    from clinical_data_platform_spark.plans.survival import cox_score_one_step

    r = cox_score_one_step(spark, SF).collect()[0]
    assert r.n_event_times > 0
    assert r.fisher_info > 0.0  # risk-set variances are nonnegative
    assert 0.0 <= r.p_value <= 1.0
    # z = U / sqrt(I) consistency
    import math

    assert abs(r.z - r.score_u / math.sqrt(r.fisher_info)) < 2e-3
    # activity count mechanically raises purchase odds in this corpus:
    # the association must be positive and the one-step beta finite
    assert r.score_u > 0.0
    assert abs(r.beta_one_step) < 10.0


def test_seasonal_decompose_strength(spark):
    from clinical_data_platform_spark.plans.events import (
        seasonal_decompose_hourly,
    )

    rows = seasonal_decompose_hourly(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_trend_hours > 24
        assert 0.0 <= r.seasonal_strength <= 1.0
        assert 0 <= r.peak_hour <= 23
        assert r.amplitude >= 0.0


def test_atkinson_ordering(spark):
    from clinical_data_platform_spark.plans.stats import (
        atkinson_index_priority,
    )

    rows = atkinson_index_priority(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0.0 <= r.atkinson_05 <= 1.0
        assert 0.0 <= r.atkinson_1 <= 1.0
        # inequality aversion is monotone: A(1) >= A(0.5) (fixed-point slack)
        assert r.atkinson_1 >= r.atkinson_05 - 2e-6
        assert r.mean_dollars > 0

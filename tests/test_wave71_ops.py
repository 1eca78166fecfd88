"""Wave-71 invariant tests: RANSAC, LOF, Haar energy, GPD tail fit."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_ransac_consensus(spark):
    from clinical_data_platform_spark.plans.stats import ransac_trend_fit

    r = ransac_trend_fit(spark, SF).collect()[0]
    assert 1 <= r.best_candidate <= 32
    assert r.n_inliers > 0
    assert 0.0 < r.inlier_frac <= 1.0
    # two-point lines through real data points at a 10%-of-mean
    # tolerance must capture a non-trivial consensus on this series
    assert r.inlier_frac > 0.1
    assert r.refit_intercept_dollars > 0.0


def test_lof_scores(spark):
    from clinical_data_platform_spark.plans.stats import lof_daily_outliers

    rows = lof_daily_outliers(spark, SF).collect()
    assert len(rows) == 10
    ls = [r.lof for r in rows]
    assert ls == sorted(ls, reverse=True)
    for r in rows:
        # LOF of any point is bounded below by ~the density ratio floor;
        # reported top-k outliers must exceed 1 (denser neighbors)
        assert r.lof > 1.0
        assert r.n_orders > 0


def test_haar_energy_shares(spark):
    from clinical_data_platform_spark.plans.events import haar_wavelet_energy

    rows = haar_wavelet_energy(spark, SF).collect()
    by_type = {}
    for r in rows:
        assert 1 <= r.level <= 6
        assert r.energy >= 0.0
        assert r.energy_share is None or 0.0 <= r.energy_share <= 1.0
        by_type.setdefault(r.event_type, []).append(r)
    assert len(by_type) == 5
    for et, rs in by_type.items():
        assert len(rs) == 6  # all levels present
        # each level halves the coefficient count
        byl = {r.level: r.n_coeff for r in rs}
        for k in range(1, 6):
            assert byl[k] == byl[k + 1] * 2
        share = sum(r.energy_share for r in rs if r.energy_share is not None)
        assert 0.999 <= share <= 1.0 + 1e-9


def test_gpd_pwm_fit(spark):
    from clinical_data_platform_spark.plans.stats import gpd_tail_fit_pwm

    r = gpd_tail_fit_pwm(spark, SF).collect()[0]
    assert r.n_exceed == r.n_days // 10
    assert r.threshold_dollars > 0
    assert r.sigma_dollars > 0.0  # GPD scale is positive
    assert -1.0 < r.xi < 1.0  # light-to-moderate tail on bounded sums
    # the extrapolated return level sits above the threshold
    assert r.return_level_10x_dollars > r.threshold_dollars

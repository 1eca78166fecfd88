"""Wave-73 invariant tests: pinball loss, lexical diversity, effect
sizes, information gain."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_pinball_loss_structure(spark):
    from clinical_data_platform_spark.plans.events import (
        pinball_loss_forecast_eval,
    )

    rows = pinball_loss_forecast_eval(spark, SF).collect()
    by = {}
    for r in rows:
        assert r.pinball_loss >= 0.0
        assert r.n_scored > 0
        by.setdefault(r.event_type, {})[r.quantile] = r.pinball_loss
    assert len(by) == 5
    for et, qs in by.items():
        assert set(qs) == {0.1, 0.5, 0.9}
        # q=0.5 pinball is half the MAE: it is the largest of the three
        # only when errors are balanced; at minimum all are comparable
        assert qs[0.5] <= qs[0.1] + qs[0.9] + 1e-9


def test_lexical_diversity_bounds(spark):
    from clinical_data_platform_spark.plans.textops import (
        lexical_diversity_by_source,
    )

    rows = lexical_diversity_by_source(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 < r.n_types <= r.n_tokens
        assert 0.0 < r.ttr <= 1.0
        assert r.yule_k >= 0.0  # sum r^2 >= N always
        assert 0.0 <= r.simpson_d < 1.0
        assert r.maas_a2 >= 0.0  # V <= N


def test_effect_size_identities(spark):
    from clinical_data_platform_spark.plans.stats import (
        effect_size_price_status,
    )

    r = effect_size_price_status(spark, SF).collect()[0]
    assert r.n_a > 0 and r.n_b > 0
    # Hedges' g shrinks d toward zero
    assert abs(r.hedges_g) <= abs(r.cohens_d) + 1e-9
    assert r.d_ci_lo <= r.cohens_d <= r.d_ci_hi
    assert r.se_d > 0.0
    # CI width = 2 * 1.96 * se
    assert abs((r.d_ci_hi - r.d_ci_lo) - 2 * 1.959964 * r.se_d) < 1e-4


def test_information_gain_bounds(spark):
    import math

    from clinical_data_platform_spark.plans.stats import (
        feature_information_gain,
    )

    rows = {r.feature: r for r in feature_information_gain(spark, SF).collect()}
    assert set(rows) == {"f1", "f2", "f3"}
    hys = {round(r.h_label, 4) for r in rows.values()}
    assert len(hys) == 1  # H(y) is feature-independent
    for r in rows.values():
        assert 0.0 <= r.h_label <= math.log(2) + 1e-6  # binary label
        # conditioning never increases entropy; gain is bounded by H(y)
        assert -1e-6 <= r.info_gain <= r.h_label + 1e-6
        assert r.h_conditional <= r.h_label + 1e-6
        assert 0.0 <= r.gain_ratio_of_hy <= 1.0

"""Wave-69 invariant tests: randomization test, ECOD, removal-effect
attribution, Hoeffding split confidence."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_permutation_test_null_calibration(spark):
    from clinical_data_platform_spark.plans.stats import (
        permutation_test_price_status,
    )

    r = permutation_test_price_status(spark, SF).collect()[0]
    assert r.n_f > 0 and r.n_o > 0
    assert r.n_reps == 64
    assert 0 <= r.n_ge <= r.n_reps
    # the add-one estimator's exact range
    assert 1 / 65 <= r.p_value + 1e-9
    assert r.p_value <= 1.0
    # F vs O on synthetic TPC-H-ish prices is a true null: p must not be
    # extreme (a tiny p here would indicate a broken relabeling)
    assert r.p_value > 0.01


def test_ecod_scores_ordered_and_bounded(spark):
    import math

    from clinical_data_platform_spark.plans.stats import ecod_outlier_scores

    rows = ecod_outlier_scores(spark, SF).collect()
    assert len(rows) == 10
    ss = [r.ecod_score for r in rows]
    assert ss == sorted(ss, reverse=True)
    for r in rows:
        assert r.ecod_score >= 2 * math.log(2) - 1e-6  # tail prob <= 1/2 per dim
        assert r.n_orders > 0 and r.avg_value > 0


def test_markov_removal_attribution_shares(spark):
    from clinical_data_platform_spark.plans.events import (
        markov_removal_attribution,
    )

    rows = markov_removal_attribution(spark, SF).collect()
    assert {r.channel for r in rows} == {"click", "error", "signup", "view"}
    convs = {r.conv_full for r in rows}
    assert len(convs) == 1  # one full-chain conversion rate
    full = convs.pop()
    assert 0.0 < full <= 1.0
    share_sum = 0.0
    for r in rows:
        # removing a channel can never raise conversion
        assert r.conv_without <= r.conv_full + 1e-9
        assert r.removal_effect >= -1e-9
        if r.share is not None:
            assert 0.0 <= r.share <= 1.0
            share_sum += r.share
    # trunc6 shares sum to 1 within truncation slack
    assert 0.999 <= share_sum <= 1.0 + 1e-9


def test_hoeffding_split_audit(spark):
    from clinical_data_platform_spark.plans.stats import (
        hoeffding_split_confidence,
    )

    r = hoeffding_split_confidence(spark, SF).collect()[0]
    assert r.best_feature in {"f1", "f2", "f3"}
    assert 0.0 < r.err_best <= 0.5  # pol flip guarantees <= 1/2
    assert r.err_best <= r.err_second
    assert abs(r.gap - (r.err_second - r.err_best)) < 3e-6
    assert r.epsilon > 0.0
    assert r.split_decided == (r.gap > r.epsilon) or abs(
        r.gap - r.epsilon
    ) < 3e-6

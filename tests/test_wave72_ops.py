"""Wave-72 invariant tests: threshold sweep, MinHash error audit, SRM
check, SLO burn rates."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_threshold_sweep_monotone(spark):
    from clinical_data_platform_spark.plans.textops import (
        near_dup_threshold_sweep,
    )

    rows = sorted(
        near_dup_threshold_sweep(spark, SF).collect(),
        key=lambda r: r.threshold,
    )
    assert [r.threshold for r in rows] == [0.05, 0.1, 0.2, 0.3, 0.5]
    # raising the threshold can only shrink pairs and coverage
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs >= b.n_pairs
        assert a.n_dup_docs >= b.n_dup_docs
    for r in rows:
        assert 0.0 <= r.dup_doc_frac <= 1.0
        # a pair touches two docs, a doc can be in many pairs
        assert r.n_dup_docs <= 2 * r.n_pairs or r.n_pairs == 0
    assert rows[0].n_pairs > 0  # the 0.05 floor catches something


def test_minhash_error_audit_bounds(spark):
    from clinical_data_platform_spark.plans.textops import (
        minhash_estimate_error_audit,
    )

    r = minhash_estimate_error_audit(spark, SF).collect()[0]
    assert r.n_pairs > 0
    assert 0.0 <= r.mae <= r.max_abs_err <= 1.0
    assert r.mae <= r.rmse + 1e-6  # RMSE dominates MAE
    # 16 hashes: the estimator's sd is ~0.125 at j=0.5; MAE on real
    # candidates must be sane, not degenerate
    assert r.mae < 0.5


def test_srm_null_calibrated(spark):
    from clinical_data_platform_spark.plans.stats import srm_assignment_check

    r = srm_assignment_check(spark, SF).collect()[0]
    assert r.n_a > 0 and r.n_b > 0
    # md5 is a fair coin, but sf0.001 has only 15 users: bound the
    # share by a 3.3-sigma binomial envelope instead of a fixed band
    n = r.n_a + r.n_b
    assert abs(r.a_share - 0.5) < 0.5 / n + 1.65 / n**0.5
    assert 0.0 <= r.p_value <= 1.0
    # the bucketing is genuinely random: SRM must NOT fire
    assert not r.srm_flag


def test_slo_burn_rates(spark):
    from clinical_data_platform_spark.plans.validation import (
        slo_burn_rate_windows,
    )

    rows = {r.window_h: r for r in slo_burn_rate_windows(spark, SF).collect()}
    assert set(rows) == {1, 6, 24}
    for r in rows.values():
        assert r.n_errors <= r.n_events
        assert 0.0 <= r.error_rate <= 1.0
        # burn = rate / 2%: consistency up to trunc6
        assert abs(r.burn_rate - r.error_rate / 0.02) < 1e-3
    # longer windows see more events
    assert rows[1].n_events <= rows[6].n_events <= rows[24].n_events
    # the synthetic corpus has ~20% error events: every window burns hot
    assert rows[24].burn_rate > 3.0

"""Wave-65 invariant tests: EM-estimated Fellegi-Sunter parameters and
sequential followed-by support."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_fs_em_params_are_probabilities(spark):
    from clinical_data_platform_spark.plans.textops import (
        fs_em_linkage_params,
    )

    rows = {r.field: r for r in fs_em_linkage_params(spark, SF).collect()}
    assert set(rows) == {"brand", "type", "size"}
    lam = {r.lambda_match for r in rows.values()}
    assert len(lam) == 1  # one global mixture weight
    assert 0.0 < lam.pop() < 1.0
    for r in rows.values():
        assert 0.0 <= r.m <= 1.0 and 0.0 <= r.u <= 1.0
        assert r.n_pairs > 0
        if r.w_agree is not None:
            # the weight's SIGN must agree with the m/u ordering (EM's
            # latent classes need not align with any one field — at this
            # SF brand converges with m < u because the blocks are
            # brand-dominated — but log2(m/u) must be consistent)
            assert (r.w_agree > 0) == (r.m > r.u) or r.m == r.u


def test_followed_by_support_directionality(spark):
    from clinical_data_platform_spark.plans.events import followed_by_support

    rows = followed_by_support(spark, SF).collect()
    assert rows
    sup = {(r.antecedent, r.consequent): r for r in rows}
    for (a, b), r in sup.items():
        assert a != b
        assert 0.0 <= r.support_frac <= 1.0
        assert 0.0 < r.directionality <= 1.0
        rev = sup.get((b, a))
        if rev is not None:
            # the two directions' shares are complementary (trunc6 slack)
            assert abs(r.directionality + rev.directionality - 1.0) < 2e-6

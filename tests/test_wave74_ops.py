"""Wave-74 invariant tests: blocking recall audit, reciprocal best
match, Spiegelhalter calibration test."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_blocking_recall_tradeoff(spark):
    from clinical_data_platform_spark.plans.textops import (
        blocking_recall_audit,
    )

    rows = {r.scheme: r for r in blocking_recall_audit(spark, SF).collect()}
    assert set(rows) == {"two_smallest", "brand", "first_token"}
    nts = {r.n_true for r in rows.values()}
    assert len(nts) == 1  # one shared ground truth
    for r in rows.values():
        assert 0 <= r.n_captured <= r.n_true
        if r.recall is not None:
            assert 0.0 <= r.recall <= 1.0
        assert r.n_candidates >= r.n_captured  # candidates cover captures
    # the shipped two-smallest-tokens key must catch most true matches:
    # a >= 0.75-Jaccard pair shares most tokens, including the smallest
    if nts.pop() > 0:
        assert rows["two_smallest"].recall >= 0.8


def test_reciprocal_best_match_is_mutual(spark):
    from clinical_data_platform_spark.plans.textops import (
        reciprocal_best_match_pairs,
    )

    rows = reciprocal_best_match_pairs(spark, SF).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.part_a < r.part_b
        key = (r.part_a, r.part_b)
        assert key not in seen  # each part appears in at most one RBM pair
        seen.add(key)
        assert 0.0 < r.jaccard <= 1.0
    # mutual-best is one-to-one: no part on two pairs
    parts = [p for r in rows for p in (r.part_a, r.part_b)]
    assert len(parts) == len(set(parts))


def test_spiegelhalter_consistency(spark):
    from clinical_data_platform_spark.plans.contentfilter import (
        spiegelhalter_calibration_test,
    )

    r = spiegelhalter_calibration_test(spark, SF).collect()[0]
    assert r.n_docs > 0
    assert 0.0 <= r.brier <= 1.0
    assert 0.0 <= r.p_value <= 1.0
    assert r.well_calibrated == (r.p_value >= 0.01)
    # the hashed scorer is independent of the length label by
    # construction, so the test must NOT scream: |z| stays moderate
    assert abs(r.z) < 6.0

"""Wave-26 plans: item-item CF, revenue mix decomposition, quantile
treatment effects, ALS — invariants beyond the DuckDB value oracle
(ALS is rows-only at the driver; its value gate lives HERE)."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_item_item_cosine_bounds(spark):
    from clinical_data_platform_spark.plans.relational import (
        item_item_cosine_recs,
    )

    rows = item_item_cosine_recs(spark, SF).collect()
    assert len(rows) == 20
    scores = [r.cosine for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 0.0 <= r.cosine <= 1.0
        assert r.n_both <= min(r.n_a, r.n_b)
        assert r.brand_a < r.brand_b


def test_mix_decomposition_bridges_exactly(spark):
    from clinical_data_platform_spark.plans.relational import (
        revenue_mix_decomposition,
    )

    rows = revenue_mix_decomposition(spark, SF).collect()
    assert rows
    # the bridge identity: effects sum to the total revenue change
    total_delta = sum(r.rev1 - r.rev0 for r in rows)
    total_effects = sum(
        r.volume_effect + r.price_effect + r.mix_effect for r in rows
    )
    assert math.isclose(total_delta, total_effects, abs_tol=0.05 * len(rows))
    for r in rows:
        if r.status == "continuing":
            # per-brand: volume + price == delta (no residual split)
            assert math.isclose(
                r.volume_effect + r.price_effect,
                r.rev1 - r.rev0,
                abs_tol=0.05,
            )
            assert r.mix_effect == 0.0
        elif r.status == "new":
            assert r.rev0 == 0.0 and r.mix_effect == r.rev1
        else:
            assert r.rev1 == 0.0 and r.mix_effect == -r.rev0


def test_qte_ordered_quantiles(spark):
    from clinical_data_platform_spark.plans.stats import (
        quantile_treatment_effects,
    )

    rows = sorted(
        quantile_treatment_effects(spark, SF).collect(),
        key=lambda r: r.quantile,
    )
    assert [r.quantile for r in rows] == [0.25, 0.5, 0.75]
    # quantile curves are nondecreasing within each arm
    t = [r.treated_value for r in rows]
    c = [r.control_value for r in rows]
    assert t == sorted(t) and c == sorted(c)
    for r in rows:
        assert math.isclose(
            r.qte, r.treated_value - r.control_value, abs_tol=2e-6
        )


def test_als_recs_deterministic_and_sane(spark):
    from clinical_data_platform_spark.plans.clustering import (
        als_brand_rec_rows,
        als_brand_recs,
    )
    from clinical_data_platform_spark.plans.relational import (
        item_item_cosine_recs,
    )

    # registered band row (r7 rows-only promotion): the ranking claim
    # genuinely holds at the sparse sf
    band = als_brand_recs(spark, SF).collect()[0]
    assert band["observed_pref_beats_unobserved"] is True
    assert band["n_brands"] == 25

    rows = als_brand_rec_rows(spark, SF).collect()
    assert rows
    by_item: dict[int, list] = {}
    for r in rows:
        by_item.setdefault(r.item_a, []).append(r)
        assert -1.0 - 1e-6 <= r.cosine <= 1.0 + 1e-6
        assert r.item_a != r.item_b
    for recs in by_item.values():
        assert [x.rank for x in sorted(recs, key=lambda x: x.rank)] == list(
            range(1, len(recs) + 1)
        )
    # seeded ALS is deterministic
    again = als_brand_rec_rows(spark, SF).collect()
    assert sorted(rows) == sorted(again)
    # factor-space neighbors agree with exact co-occurrence neighbors
    # far above chance: count overlap of (a, b) pairs
    def brand_num(b: str) -> int:
        return int("".join(ch for ch in b if ch.isdigit()))

    exact_pairs = set()
    for r in item_item_cosine_recs(spark, SF).collect():
        a, b = brand_num(r.brand_a), brand_num(r.brand_b)
        exact_pairs.add((a, b))
        exact_pairs.add((b, a))
    als_pairs = {(r.item_a, r.item_b) for r in rows}
    overlap = len(als_pairs & exact_pairs)
    # 25 brands -> 600 ordered pairs; 40 exact-neighbor pairs; 75 ALS
    # pairs. Chance overlap ~ 5; require well above it.
    assert overlap >= 10

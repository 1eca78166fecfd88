"""Wave-25 plans: conformal intervals, label propagation, Neyman
allocation, EB shrinkage, chi-square residuals — invariants beyond the
DuckDB value oracle."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_conformal_coverage_near_target(spark):
    from clinical_data_platform_spark.plans.stats import (
        conformal_prediction_intervals,
    )

    rows = conformal_prediction_intervals(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.qhat > 0
        assert r.n_fit > 0 and r.n_cal > 0 and r.n_eval > 0
        # finite-sample conformal guarantee: coverage ~ 0.9 (generous
        # band at sf0.001 sample sizes)
        assert 0.8 <= r.coverage <= 1.0


def test_label_propagation_partition(spark):
    from clinical_data_platform_spark.plans.graphops import (
        label_propagation_communities,
    )

    rows = label_propagation_communities(spark, SF).collect()
    assert rows
    # community sizes partition the node set; labels are real nations
    nations = set(pd.read_parquet(f"{SF}/nation.parquet").n_name)
    for r in rows:
        assert r.community in nations
        assert r.n_members >= 1
    # deterministic
    again = label_propagation_communities(spark, SF).collect()
    assert sorted(rows) == sorted(again)


def test_neyman_beats_proportional(spark):
    from clinical_data_platform_spark.plans.stats import (
        neyman_allocation_plan,
    )

    rows = neyman_allocation_plan(spark, SF).collect()
    assert len(rows) == 5
    # Neyman minimizes total estimator variance among allocations
    v_prop = sum(r.var_term_proportional for r in rows)
    v_ney = sum(r.var_term_neyman for r in rows)
    assert v_ney <= v_prop + 1e-9
    # budgets roughly spent (floor loses < 1 per stratum)
    assert 995 <= sum(r.alloc_proportional for r in rows) <= 1000
    assert 995 <= sum(r.alloc_neyman for r in rows) <= 1000


def test_eb_shrinkage_direction_and_order(spark):
    from clinical_data_platform_spark.plans.stats import (
        eb_shrunk_nation_rates,
    )

    rows = eb_shrunk_nation_rates(spark, SF).collect()
    assert rows
    p0 = rows[0].pooled_rate
    for r in rows:
        lo, hi = sorted((r.raw_rate, p0))
        # shrunk rate always lies between the raw rate and the pool
        assert lo - 1e-6 <= r.shrunk_rate <= hi + 1e-6
    # smaller groups shrink proportionally harder
    by_n = sorted(rows, key=lambda r: r.n)
    small, big = by_n[0], by_n[-1]
    if abs(small.raw_rate - p0) > 1e-6 and abs(big.raw_rate - p0) > 1e-6:
        frac_small = abs(small.shrunk_rate - small.raw_rate) / abs(
            small.raw_rate - p0
        )
        frac_big = abs(big.shrunk_rate - big.raw_rate) / abs(
            big.raw_rate - p0
        )
        assert frac_small >= frac_big - 1e-6


def test_cell_residuals_reconstruct_chi2(spark):
    from clinical_data_platform_spark.plans.stats import (
        chi_square_cell_residuals,
        chi_square_event_value,
    )

    cells = chi_square_cell_residuals(spark, SF).collect()
    chi2 = chi_square_event_value(spark, SF).collect()[0].chi2
    # sum of squared Pearson residuals IS the chi-square statistic
    recon = sum(r.pearson_resid**2 for r in cells)
    assert math.isclose(recon, chi2, rel_tol=1e-4)
    for r in cells:
        assert r.expected > 0
        assert abs(r.adj_resid) >= abs(r.pearson_resid) - 1e-9

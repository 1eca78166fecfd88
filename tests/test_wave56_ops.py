"""Wave-56 plans: Hill tail index + exact Gini — independent Python
recounts beyond the DuckDB value oracle."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def _cents():
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_totalprice"])
    return (o.o_totalprice * 100).round().astype("int64").tolist()


def test_hill_recount(spark):
    from clinical_data_platform_spark.plans.stats import (
        _HILL_K,
        hill_tail_index,
    )

    r = hill_tail_index(spark, SF).collect()[0]
    vals = sorted(_cents(), reverse=True)
    top = vals[:_HILL_K]
    x_k1 = vals[_HILL_K]
    s_fp = sum(math.floor(math.log(x / x_k1) * 1e9) for x in top)
    assert r.k_tail == _HILL_K
    assert r.hill_gamma == math.floor(s_fp / _HILL_K / 1e3) / 1e6
    assert r.tail_index_alpha == math.floor(_HILL_K * 1e6 / (s_fp / 1e9)) / 1e6
    assert r.hill_gamma > 0 and r.tail_index_alpha > 0
    # gamma * alpha ~ 1 by construction
    assert abs(r.hill_gamma * r.tail_index_alpha - 1.0) < 1e-3


def test_exact_gini_recount(spark):
    from clinical_data_platform_spark.plans.stats import exact_gini_coefficient

    r = exact_gini_coefficient(spark, SF).collect()[0]
    vals = sorted(_cents())
    n = len(vals)
    s = sum(vals)
    w = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(vals))
    assert r.n_orders == n
    assert r.gini == math.floor(w * 1e6 / (n * s)) / 1e6
    assert 0.0 < r.gini < 1.0


def test_exact_gini_agrees_with_lorenz_shape(spark):
    """Cross-operator sanity: the exact Gini is consistent with the
    concentration the Lorenz decile table shows (top decile share well
    above 10% iff Gini well above 0)."""
    from clinical_data_platform_spark.plans.stats import exact_gini_coefficient

    r = exact_gini_coefficient(spark, SF).collect()[0]
    vals = sorted(_cents())
    top_decile_share = sum(vals[int(0.9 * len(vals)) :]) / sum(vals)
    if r.gini > 0.2:
        assert top_decile_share > 0.15

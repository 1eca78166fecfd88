"""Wave-51 plans: Cramer's V + capture-recapture dedup coverage —
independent recounts and cross-operator consistency checks."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_cramers_v_recount(spark):
    from clinical_data_platform_spark.plans.stats import cramers_v_type_band

    r = cramers_v_type_band(spark, SF).collect()[0]
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type", "value"])
    ev["y"] = ev.value.apply(lambda v: min(math.floor(v / 100.0), 4))
    tab = ev.groupby(["event_type", "y"]).size()
    n = len(ev)
    nx = tab.groupby(level=0).sum()
    ny = tab.groupby(level=1).sum()
    chi2 = 0.0
    for (x, y), o in tab.items():
        e = nx[x] * ny[y] / n
        chi2 += (o / e - 1.0) ** 2 * e
    rr, cc = len(nx), len(ny)
    assert (r.n_events, r.n_rows_levels, r.n_col_levels) == (n, rr, cc)
    assert abs(r.chi2 - round(chi2, 6)) < 1e-4
    v = math.sqrt(chi2 / (n * min(rr - 1, cc - 1)))
    assert abs(r.cramers_v - round(v, 6)) < 1e-6
    assert 0.0 <= r.cramers_v <= 1.0


def test_capture_recapture_consistency(spark):
    from clinical_data_platform_spark.plans.textops import (
        dedup_capture_recapture,
        minhash_lsh_pairs_md5,
        near_dup_jaccard_pairs,
    )

    r = dedup_capture_recapture(spark, SF).collect()[0]
    n_lsh = minhash_lsh_pairs_md5(spark, SF).count()
    n_jac = near_dup_jaccard_pairs(spark, SF).count()
    assert r.n_lsh == n_lsh
    assert r.n_jac == n_jac
    assert 0 <= r.n_both <= min(n_lsh, n_jac)
    # Chapman never estimates fewer pairs than either list caught
    assert r.chapman_estimate >= max(n_lsh, n_jac) - 1e-6
    chap = (n_lsh + 1) * (n_jac + 1) / (r.n_both + 1) - 1.0
    assert r.chapman_estimate == math.floor(chap * 1e6) / 1e6
    assert 0.0 < r.lsh_coverage <= 1.0 + 1e-9
    assert 0.0 < r.jaccard_coverage <= 1.0 + 1e-9

"""Wave-57 plans: vocabulary coverage estimates + LSH S-curve planner —
independent Python recounts beyond the DuckDB value oracle."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_vocab_coverage_recount(spark):
    from clinical_data_platform_spark.plans.corpusqc import (
        vocab_coverage_estimates,
    )

    got = {r.lang: r for r in vocab_coverage_estimates(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs.text.str.strip().str.len() > 0]
    for lang, grp in docs.groupby("lang"):
        cnt = Counter(w for t in grp.text for w in t.strip().split())
        v = len(cnt)
        n = sum(cnt.values())
        n1 = sum(1 for c in cnt.values() if c == 1)
        n2 = sum(1 for c in cnt.values() if c == 2)
        r = got[lang]
        assert (r.vocab, r.n_tokens, r.n1, r.n2) == (v, n, n1, n2)
        assert r.unseen_mass == math.floor(n1 * 1e6 / n) / 1e6
        if n2 > 0:
            assert r.chao1_vocab == math.floor((v + n1 * n1 / (2 * n2)) * 1e6) / 1e6
        else:
            assert r.chao1_vocab == float(v)
        # Chao1 is a lower bound ABOVE the observed vocabulary
        assert r.chao1_vocab >= v
        assert 0.0 <= r.unseen_mass <= 1.0


def test_scurve_recount(spark):
    from clinical_data_platform_spark.plans.vectorops import (
        _SCURVE_GRID,
        _SCURVE_SIMS,
        lsh_scurve_planner,
    )

    rows = lsh_scurve_planner(spark, SF).collect()
    assert len(rows) == len(_SCURVE_GRID) * len(_SCURVE_SIMS)
    for r in rows:
        rr = r.num_hashes // r.bands
        assert r.rows_per_band == rr
        p = 1.0 - (1.0 - r.jaccard**rr) ** r.bands
        thr = (1.0 / r.bands) ** (1.0 / rr)
        assert abs(r.p_candidate - round(p, 6)) < 1e-6
        assert abs(r.s_threshold - round(thr, 6)) < 1e-6


def test_scurve_explains_repo_default(spark):
    """The planner's own justification: at the repo default (16, 4),
    0.8-Jaccard pairs are caught with high probability while
    0.4-impostors stay rare — and the curve is monotone in s."""
    from clinical_data_platform_spark.plans.vectorops import lsh_scurve_planner

    rows = [
        r
        for r in lsh_scurve_planner(spark, SF).collect()
        if r.num_hashes == 16 and r.bands == 4
    ]
    by_s = {r.jaccard: r.p_candidate for r in rows}
    assert by_s[0.8] > 0.8
    assert by_s[0.4] < 0.15
    ss = sorted(by_s)
    assert all(by_s[a] <= by_s[b] for a, b in zip(ss, ss[1:]))

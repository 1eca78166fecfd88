"""Wave-58 plans: cumulative gains/lift + top-k token overlap —
independent recounts and cross-operator consistency checks."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_gains_consistent_with_bins(spark):
    from clinical_data_platform_spark.plans.contentfilter import (
        classifier_calibration_bins,
        classifier_gains_table,
    )

    bins = {
        b.bin: (b.n_docs, round(b.outcome_rate * b.n_docs))
        for b in classifier_calibration_bins(spark, SF).collect()
    }
    nn = sum(n for n, _ in bins.values())
    np_ = sum(p for _, p in bins.values())
    got = sorted(
        classifier_gains_table(spark, SF).collect(), key=lambda r: -r.bin
    )
    cum_n = cum_p = 0
    for r in got:
        n, p = bins[r.bin]
        cum_n += n
        cum_p += p
        assert r.n_docs == n
        assert r.cum_docs == cum_n
        assert r.depth == math.floor(cum_n * 1e6 / nn) / 1e6
        assert r.gain == math.floor(cum_p * 1e6 / np_) / 1e6
        lift = (cum_p / np_) / (cum_n / nn)
        assert abs(r.lift - math.floor(lift * 1e6) / 1e6) < 2e-6
    # structural: gains monotone in depth, final gain == 1, lift -> 1
    assert got[-1].gain == 1.0 or abs(got[-1].gain - 1.0) < 2e-6
    gains = [r.gain for r in got]
    assert gains == sorted(gains)
    assert abs(got[-1].lift - 1.0) < 2e-6


def test_topk_overlap_recount(spark):
    from clinical_data_platform_spark.plans.corpusqc import (
        _TOPK_TOKENS,
        source_topk_token_overlap,
    )

    got = {
        (r.source_a, r.source_b): r
        for r in source_topk_token_overlap(spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs.text.str.strip().str.len() > 0]
    topk = {}
    for source, grp in docs.groupby("source"):
        cnt = Counter(w for t in grp.text for w in t.strip().split())
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        topk[source] = {w for w, _ in ranked[:_TOPK_TOKENS]}
    sources = sorted(topk)
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            common = len(topk[a] & topk[b])
            if (a, b) in got:
                r = got[(a, b)]
                assert r.n_common == common, (a, b)
                jac = common / len(topk[a] | topk[b])
                assert r.topk_jaccard == math.floor(jac * 1e6) / 1e6
            else:
                assert common == 0, (a, b)

"""Wave-55 plans: calibration summaries + LP modularity — independent
Python recounts and cross-operator consistency checks."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_calibration_summary_consistent_with_bins(spark):
    """ECE and the Murphy decomposition recompute exactly from the
    calibration-bins table (same deciles, same outcome)."""
    from clinical_data_platform_spark.plans.contentfilter import (
        calibration_error_summary,
        classifier_calibration_bins,
    )

    r = calibration_error_summary(spark, SF).collect()[0]
    bins = classifier_calibration_bins(spark, SF).collect()
    nn = sum(b.n_docs for b in bins)
    # reconstruct exact per-bin positives from the trunc6 outcome_rate
    ece_fp = rel_fp = res_fp = 0
    np_total = 0
    rows = []
    for b in bins:
        pos = round(b.outcome_rate * b.n_docs)
        np_total += pos
        rows.append((b.n_docs, pos, b.mean_keep_prob))
    base = np_total / nn
    for n, pos, mean_p in rows:
        acc = pos / n
        # mean_keep_prob in the bins table is round6 of the avg while the
        # summary uses trunc6 — allow the 1-ulp-of-1e-6 slack that creates
        ece_fp += math.floor(abs(mean_p - acc) * n * 1e6)
        rel_fp += math.floor((mean_p - acc) ** 2 * n * 1e6)
        res_fp += math.floor((acc - base) ** 2 * n * 1e6)
    assert r.n_docs == nn
    assert abs(r.ece - math.floor(ece_fp / nn) / 1e6) < 2e-5
    assert abs(r.reliability - math.floor(rel_fp / nn) / 1e6) < 2e-5
    assert abs(r.resolution - math.floor(res_fp / nn) / 1e6) < 2e-5
    assert r.uncertainty == math.floor(base * (1 - base) * 1e6) / 1e6
    # structural facts
    assert 0.0 <= r.ece <= 1.0
    assert r.reliability >= 0.0 and r.resolution >= 0.0
    assert r.resolution <= r.uncertainty + 1e-6  # resolution <= uncertainty


def test_modularity_recount(spark):
    """Full sequential replication: edge build, 3 LP rounds with the
    min-label tie-break, then the modularity fold."""
    from collections import Counter, defaultdict

    from clinical_data_platform_spark.plans.graphops import (
        _LP_ITERS,
        lp_community_modularity,
    )
    from tests.test_wave43_ops import _trade_graph_weighted

    r = lp_community_modularity(spark, SF).collect()[0]
    weights = _trade_graph_weighted()
    sym = {}
    for (a, b), w in weights.items():
        sym[(a, b)] = w
        sym[(b, a)] = w
    nodes = sorted({a for a, _ in sym})
    label = {n: n for n in nodes}
    for _ in range(_LP_ITERS):
        new = {}
        for n in nodes:
            wt = defaultdict(int)
            for (src, dst), w in sym.items():
                if dst == n:
                    wt[label[src]] += w
            best = sorted(wt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[n] = best
        label = new
    ww = sum(sym.values())
    w_in = Counter()
    s_c = Counter()
    for (a, b), w in sym.items():
        s_c[label[a]] += w
        if label[a] == label[b]:
            w_in[label[a]] += w
    q_fp = sum(
        math.floor((w_in.get(c, 0) / ww - (s_c[c] / ww) ** 2) * 1e9)
        for c in s_c
    )
    assert r.n_communities == len(s_c)
    assert r.modularity == math.floor(q_fp / 1e3) / 1e6
    assert -0.5 <= r.modularity <= 1.0

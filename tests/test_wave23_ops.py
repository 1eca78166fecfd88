"""Wave-23 plans: FD discovery, Zipf fit, mutual information,
sorted-neighborhood ER, streaming CMS — invariants beyond the DuckDB
value oracle."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_fd_report_keys_hold(spark):
    from clinical_data_platform_spark.plans.validation import (
        fd_violation_report,
    )

    rows = {r.fd: r for r in fd_violation_report(spark, SF).collect()}
    # true FDs (key -> attribute) hold exactly
    assert rows["customer.c_custkey->c_nationkey"].violating_groups == 0
    assert rows["nation.n_nationkey->n_regionkey"].violating_groups == 0
    assert rows["customer.c_custkey->c_nationkey"].max_distinct_rhs == 1
    # a customer with many orders does NOT determine priority
    assert rows["orders.o_custkey->o_orderpriority"].violating_groups > 0
    for r in rows.values():
        assert 0.0 <= r.violation_share <= 1.0
        assert r.violating_groups <= r.n_groups


def test_zipf_fit_recount(spark):
    from clinical_data_platform_spark.plans.corpusqc import zipf_law_fit

    rows = zipf_law_fit(spark, SF).collect()
    assert rows
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    import re
    from collections import Counter

    for r in rows:
        # natural-ish text: negative slope, decent power-law fit
        assert r.zipf_slope < 0
        assert 0.0 <= r.r2 <= 1.0
        sub = docs[docs.lang == r.lang]
        cnt = Counter()
        for t in sub.text:
            cnt.update(w.lower() for w in re.split(r"\s+", t.strip()))
        top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:500]
        assert r.n_terms == len(top)
        xs = [math.log(i + 1) for i in range(len(top))]
        ys = [math.log(c) for _, c in top]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert math.isclose(r.zipf_slope, slope, abs_tol=1e-4)


def test_mutual_information_bounds(spark):
    from clinical_data_platform_spark.plans.stats import (
        column_mutual_information,
    )

    r = column_mutual_information(spark, SF).collect()[0]
    # MI is nonnegative and bounded by both marginal entropies
    assert r.mi_nats >= -1e-9
    assert r.mi_nats <= min(r.h_type, r.h_bin) + 1e-9
    assert 0.0 <= r.nmi <= 1.0 + 1e-9
    assert r.h_type > 0 and r.h_bin > 0


def test_sorted_neighborhood_complements_blocking(spark):
    from clinical_data_platform_spark.plans.textops import (
        er_blocking_part_pairs,
        sorted_neighborhood_pairs,
    )

    sn = sorted_neighborhood_pairs(spark, SF).collect()
    assert sn
    for r in sn:
        assert r.part_a < r.part_b  # ordered, no self-pairs
        assert 0.5 <= r.jaccard <= 1.0
    # determinism
    again = sorted_neighborhood_pairs(spark, SF).collect()
    assert sorted(sn) == sorted(again)
    # the two candidate generators overlap but neither subsumes the
    # other (the union argument for running both)
    blk = {
        (r.part_a, r.part_b)
        for r in er_blocking_part_pairs(spark, SF).collect()
    }
    snp = {(r.part_a, r.part_b) for r in sn}
    assert snp - blk  # SN finds pairs blocking missed (window-adjacent)


def test_stream_cms_one_sided(spark):
    from clinical_data_platform_spark.plans.streamops import (
        stream_cms_user_counts,
    )

    rows = stream_cms_user_counts(spark, SF).collect()
    assert len(rows) == 10
    total = len(pd.read_parquet(f"{SF}/events.parquet"))
    for r in rows:
        # CMS never undercounts, and the error bound e*N/w holds w.h.p.
        assert r.cms_estimate >= r.exact_cnt
        assert r.overcount == r.cms_estimate - r.exact_cnt
        assert r.overcount <= math.e * total / 1024 * 4

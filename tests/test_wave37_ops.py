"""Wave-37 plans: BH FDR step-up + DSIR importance scores — independent
recounts beyond the DuckDB value oracle."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_bh_fdr_recount(spark):
    from clinical_data_platform_spark.plans.stats import bh_fdr_nation_price

    got = bh_fdr_nation_price(spark, SF).toPandas()
    # step-up property: p_adj is the reversed running min of m*p/rank,
    # capped at 1, and monotone nondecreasing in rank
    g = got.sort_values("p_rank").reset_index(drop=True)
    m = len(g)
    raw = g.p_value.to_numpy() * m / (np.arange(m) + 1)
    adj = np.minimum(1.0, np.minimum.accumulate(raw[::-1])[::-1])
    assert np.all(np.abs(g.p_adj.to_numpy() - np.round(adj, 6)) < 2e-6)
    assert (g.p_adj.diff().dropna() >= -1e-9).all()
    assert (g.rejected == (g.p_adj <= 0.05)).all()
    # one-vs-rest Welch z recount for the most extreme nation
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    n = pd.read_parquet(f"{SF}/nation.parquet")
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    df["y"] = (df.o_totalprice * 100).round().astype("int64")
    top = g.iloc[0].nation
    a = df[df.n_name == top].y.to_numpy().astype(float)
    b = df[df.n_name != top].y.to_numpy().astype(float)
    z = (a.mean() - b.mean()) / math.sqrt(
        a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    )
    p = math.erfc(abs(z) / math.sqrt(2.0))
    assert abs(g.iloc[0].p_value - p) < 1e-5


def _bucket(w: str) -> int:
    return int(hashlib.md5(w.encode()).hexdigest()[:6], 16) % 64


def test_dsir_scores_recount(spark):
    from clinical_data_platform_spark.plans.trainprep import (
        dsir_importance_topk,
    )

    got = dsir_importance_topk(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs.text.str.strip().str.len() > 0]
    tc: Counter = Counter()
    rc: Counter = Counter()
    per_doc: dict[int, Counter] = {}
    lang = {}
    for _, r in docs.iterrows():
        ws = r.text.strip().split()
        bs = Counter(_bucket(w) for w in ws)
        per_doc[r.doc_id] = bs
        lang[r.doc_id] = r.lang
        rc.update(bs)
        if r.lang == "en":
            tc.update(bs)
    tt, rt = sum(tc.values()), sum(rc.values())
    lri = {
        b: round(
            (
                math.log((tc.get(b, 0) + 1.0) / (tt + 64.0))
                - math.log((rc[b] + 1.0) / (rt + 64.0))
            )
            * 1e9
        )
        for b in rc
    }
    scores = {
        d: sum(cnt * lri[b] for b, cnt in bs.items())
        for d, bs in per_doc.items()
    }
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(got.doc_id) == [d for d, _ in top]
    for (d, si), (_, row) in zip(top, got.iterrows()):
        assert abs(row.dsir_score - round(si / 1e9, 6)) < 1e-6
        assert row.lang == lang[d]
        assert row.n_tokens == sum(per_doc[d].values())
    # sanity: en docs should dominate the target-likeness top-20
    assert (got.lang == "en").mean() > 0.5

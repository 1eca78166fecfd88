"""Wave-31 plans: chi2 token selection + histogram split finder —
brute-force recounts beyond the DuckDB value oracle."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_chi2_token_selection_recount(spark):
    from clinical_data_platform_spark.plans.contentfilter import (
        chi2_token_selection,
    )

    rows = chi2_token_selection(spark, SF).collect()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs.text.str.strip().str.len() > 0]
    n = len(docs)
    by_class = Counter(docs.lang)
    df = Counter()
    in_class = Counter()
    for lang, text in zip(docs.lang, docs.text):
        toks = set(text.strip().split())
        for w in toks:
            df[w] += 1
            in_class[(lang, w)] += 1

    def chi2(lang, w):
        a = in_class[(lang, w)]
        b = by_class[lang] - a
        c = df[w] - a
        d = n - by_class[lang] - df[w] + a
        num = n * (a * d - b * c) ** 2
        den = (a + b) * (c + d) * (a + c) * (b + d)
        return math.floor(num / den * 1e6) / 1e6

    got = defaultdict(dict)
    for r in rows:
        got[r.lang][r.rk] = r
        assert r.df_in_class == in_class[(r.lang, r.token)]
        assert abs(r.chi2 - chi2(r.lang, r.token)) < 1e-9
    for lang in by_class:
        # rank-1 token really is the max chi2 over eligible tokens
        best = max(
            (
                (chi2(lang, w), w)
                for w in df
                if df[w] < n and (lang, w) in in_class
            ),
            key=lambda t: (t[0], [-ord(ch) for ch in t[1]]),
        )
        top = got[lang][1]
        assert abs(top.chi2 - best[0]) < 1e-9, lang
        assert len(got[lang]) == 5


def test_gbdt_split_recount(spark):
    from clinical_data_platform_spark.plans.stats import (
        gbdt_histogram_best_split,
    )

    rows = gbdt_histogram_best_split(spark, SF).collect()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    sec = ev.ts.astype("int64") // 1_000_000
    feats = {
        "value_bin": np.floor(ev.value.to_numpy()).astype(int),
        "hour": ((sec % 86400) // 3600).to_numpy(),
    }
    y = (ev.event_type == "purchase").to_numpy().astype(int)

    def gini(p, q):
        tot = p + q
        return 1 - (p / tot) ** 2 - (q / tot) ** 2

    for feature, x in feats.items():
        nn, pp = len(y), int(y.sum())
        parent = gini(pp, nn - pp)
        gains = {}
        for t in sorted(set(x)):
            mask = x <= t
            n_l, p_l = int(mask.sum()), int(y[mask].sum())
            if n_l == nn:
                continue
            g = (
                parent
                - n_l / nn * gini(p_l, n_l - p_l)
                - (nn - n_l) / nn * gini(pp - p_l, (nn - n_l) - (pp - p_l))
            )
            gains[t] = math.floor(g * 1e9) / 1e9
        ranked = sorted(gains.items(), key=lambda kv: (-kv[1], kv[0]))
        mine = sorted(
            [r for r in rows if r.feature == feature], key=lambda r: r.rk
        )
        assert len(mine) == 3
        for r, (t, g) in zip(mine, ranked[:3]):
            assert r.threshold == t, (feature, r.rk)
            assert abs(r.gini_gain - g) < 1e-12
            mask = feats[feature] <= t
            assert r.n_left == int(mask.sum())
            assert r.pos_left == int(y[mask].sum())

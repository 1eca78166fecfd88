"""Wave-38 plans: corpus scaling laws (Heaps' law) + pooled readability —
independent Python recounts beyond the DuckDB value oracle."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_heaps_fit_recount(spark):
    from clinical_data_platform_spark.plans.corpusqc import heaps_law_fit

    r = heaps_law_fit(spark, SF).collect()[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs.text.str.strip().str.len() > 0].sort_values("doc_id")
    seen: set[str] = set()
    xs, ys = [], []
    cn = 0
    for _, row in docs.iterrows():
        ws = [w.lower() for w in row.text.strip().split()]
        cn += len(ws)
        seen.update(ws)
        xs.append(round(math.log(cn) * 1e9))
        ys.append(round(math.log(len(seen)) * 1e9))
    assert r.n_docs == len(xs)
    assert r.tokens_total == cn
    assert r.vocab_total == len(seen)
    x = np.array(xs, dtype=object)
    y = np.array(ys, dtype=object)
    n = len(xs)
    num = float(n * sum(a * b for a, b in zip(xs, ys)) - sum(xs) * sum(ys))
    denx = float(n * sum(a * a for a in xs) - sum(xs) ** 2)
    deny = float(n * sum(b * b for b in ys) - sum(ys) ** 2)
    beta = num / denx
    assert abs(r.heaps_beta - beta) < 1e-5
    k = math.exp(((sum(ys) - beta * sum(xs)) / n) / 1e9)
    assert abs(r.heaps_k - k) < 1e-3
    assert abs(r.r2 - num * num / (denx * deny)) < 1e-5
    assert 0.0 < r.heaps_beta < 1.0  # sublinear vocabulary growth


def test_flesch_recount(spark):
    from clinical_data_platform_spark.plans.corpusqc import (
        flesch_readability_by_source,
    )

    got = {
        r.source: r
        for r in flesch_readability_by_source(spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    docs = docs[docs.text.str.strip().str.len() > 0]
    agg: dict[str, list[int]] = {}
    for _, row in docs.iterrows():
        w = len(row.text.strip().split())
        s = len(re.findall(r"[aeiouy]+", row.text.lower()))
        t = max(len(re.findall(r"[.!?]+", row.text)), 1)
        a = agg.setdefault(row.source, [0, 0, 0, 0])
        a[0] += 1
        a[1] += w
        a[2] += s
        a[3] += t
    assert set(got) == set(agg)
    for src, (n, w, s, t) in agg.items():
        r = got[src]
        assert (r.n_docs, r.total_words) == (n, w)
        assert abs(r.words_per_sentence - math.floor(w / t * 1e6) / 1e6) < 1e-9
        assert abs(r.syllables_per_word - math.floor(s / w * 1e6) / 1e6) < 1e-9
        f = 206.835 - 1.015 * (w / t) - 84.6 * (s / w)
        assert abs(r.flesch_ease - round(f, 4)) < 1e-6

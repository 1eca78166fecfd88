"""Wave-17 plans: BM25 retrieval, grouped CV folds — invariants beyond
the DuckDB value oracle."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_bm25_recount_top1(spark):
    from clinical_data_platform_spark.plans.textops import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        bm25_topk_docs,
    )

    rows = bm25_topk_docs(spark, SF).collect()
    assert 0 < len(rows) <= 10
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert 1 <= r.n_terms_hit <= len(_BM25_TERMS)
        assert r.bm25 > 0

    # brute-force BM25 recount in python
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("ws"))
        .collect()
    )
    n_docs = len(docs)
    avgdl = sum(len(d.ws) for d in docs) / n_docs
    df = {t: sum(1 for d in docs if t in d.ws) for t in _BM25_TERMS}
    idf = {
        t: math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
        for t in _BM25_TERMS
    }
    expected = {}
    for d in docs:
        s = 0.0
        for t in _BM25_TERMS:
            tf = d.ws.count(t)
            if tf:
                s += idf[t] * tf / (
                    tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * len(d.ws) / avgdl)
                )
        if s > 0:
            expected[d.doc_id] = math.floor(s * 1e6) / 1e6
    top = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[: len(rows)]
    assert [(r.doc_id, r.bm25) for r in rows] == top


def test_grouped_folds_have_zero_leakage(spark):
    from clinical_data_platform_spark.plans.trainprep import (
        _GKF_FOLDS,
        grouped_fold_assignment,
    )

    rows = grouped_fold_assignment(spark, SF).collect()
    d = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(r.n_docs for r in rows) == d.count()
    # zero leakage: each source maps to exactly one fold, so the
    # per-fold distinct-source counts sum to the global source count
    assert sum(r.n_sources for r in rows) == (
        d.select("source").distinct().count()
    )
    for r in rows:
        assert 0 <= r.fold < _GKF_FOLDS

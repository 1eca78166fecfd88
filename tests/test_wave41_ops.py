"""Wave-41 plans: Z-order clustering audit + RRF hybrid retrieval —
independent Python recounts beyond the DuckDB value oracle."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_zorder_beats_single_sorts_on_2d_predicate(spark):
    """The point of the audit: under the 2-D band predicate, the Z-order
    layout scans no more files than the WORSE single-column sort, and
    every layout's zone maps are lossless (scanned rows >= true matches)."""
    from clinical_data_platform_spark.plans.layout import (
        _Z_D_HI,
        _Z_D_LO,
        _Z_P_HI,
        _Z_P_LO,
        zorder_layout_audit,
    )

    rows = {r.layout: r for r in zorder_layout_audit(spark, SF).collect()}
    assert set(rows) == {"date_sorted", "price_sorted", "zorder"}
    worse_single = max(
        rows["date_sorted"].files_scanned, rows["price_sorted"].files_scanned
    )
    assert rows["zorder"].files_scanned <= worse_single
    # same file count under every layout (same rows, same file size)
    n_files = {r.n_files for r in rows.values()}
    assert len(n_files) == 1
    # losslessness: a stats-pruned scan still covers every matching row
    o = pd.read_parquet(f"{SF}/orders.parquet")
    d0 = pd.Timestamp(_Z_D_LO)
    d1 = pd.Timestamp(_Z_D_HI)
    true_matches = (
        (o.o_orderdate >= d0)
        & (o.o_orderdate <= d1)
        & (o.o_totalprice >= _Z_P_LO)
        & (o.o_totalprice <= _Z_P_HI)
    ).sum()
    for r in rows.values():
        assert r.rows_scanned >= true_matches, r


def test_zorder_interleave_is_morton():
    """The bit-interleave helper produces the Morton code."""
    from clinical_data_platform_spark.plans.layout import _z_interleave_sql

    import duckdb

    con = duckdb.connect()
    for x, y in [(0, 0), (1, 0), (0, 1), (3, 5), (2557, 4095)]:
        got = con.execute(
            f"SELECT {_z_interleave_sql(str(x), str(y))}"
        ).fetchone()[0]
        want = 0
        for i in range(12):
            want |= ((x >> i) & 1) << (2 * i + 1)
            want |= ((y >> i) & 1) << (2 * i)
        assert got == want, (x, y, got, want)


def test_rrf_recount(spark):
    """Full Python recount of both rankers and the fused top-10."""
    from clinical_data_platform_spark.plans.textops import (
        _BM25_B,
        _BM25_K1,
        _BM25_TERMS,
        _RRF_K,
        hybrid_search_rrf,
    )

    got = hybrid_search_rrf(spark, SF).collect()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    toks = {
        r.doc_id: r.text.strip().lower().split()
        for r in docs.itertuples()
        if r.text.strip()
    }
    n_docs = len(toks)
    avgdl = sum(len(ws) for ws in toks.values()) / n_docs
    tf = {
        (d, t): Counter(ws)[t]
        for d, ws in toks.items()
        for t in _BM25_TERMS
        if t in ws
    }
    df = Counter(t for (_, t) in tf)
    bm25, tfidf = {}, {}
    for (d, t), c in tf.items():
        bidf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
        denom = c + _BM25_K1 * (1 - _BM25_B + _BM25_B * len(toks[d]) / avgdl)
        bm25[d] = bm25.get(d, 0.0) + bidf * c / denom
        tfidf[d] = tfidf.get(d, 0.0) + math.log(1.0 + c) * math.log(
            n_docs / df[t]
        )
    t6 = lambda v: math.floor(v * 1e6) / 1e6  # noqa: E731
    cand = sorted(bm25)
    r_bm25 = {
        d: i + 1
        for i, d in enumerate(sorted(cand, key=lambda d: (-t6(bm25[d]), d)))
    }
    r_tfidf = {
        d: i + 1
        for i, d in enumerate(sorted(cand, key=lambda d: (-t6(tfidf[d]), d)))
    }
    rrf = {
        d: 1.0 / (_RRF_K + r_bm25[d]) + 1.0 / (_RRF_K + r_tfidf[d])
        for d in cand
    }
    want = sorted(cand, key=lambda d: (-round(rrf[d], 6), d))[: len(got)]
    assert [r.doc_id for r in got] == want
    for r in got:
        assert r.r_bm25 == r_bm25[r.doc_id]
        assert r.r_tfidf == r_tfidf[r.doc_id]
        assert abs(r.rrf - round(rrf[r.doc_id], 6)) < 2e-6


def test_rrf_reorders_vs_bm25(spark):
    """The two rankers genuinely disagree: fused order != BM25 order
    (otherwise the operator demonstrates nothing)."""
    from clinical_data_platform_spark.plans.textops import hybrid_search_rrf

    got = hybrid_search_rrf(spark, SF).collect()
    fused = [r.doc_id for r in got]
    by_bm25 = [r.doc_id for r in sorted(got, key=lambda r: r.r_bm25)]
    assert fused != by_bm25

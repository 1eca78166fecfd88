"""Recounts + margin audits for the r8 invariant-band promotions
(minhash_lsh_candidate_pairs, simhash_signatures,
semantic_near_dup_blas_pairs — r7 verdict item 3) and the fixed-point
inertia oracle (judge ADVICE r7, clustering.py seeded_inertia_fp).

The DuckDB gate already hash-compares the band rows; these tests recount
the exact values by an INDEPENDENT route (pure-Python brute force over
the parquet fixture) and pin the float-noise margins the oracle's
correctness silently depends on.
"""

from __future__ import annotations

import glob

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _docs_pandas():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def _inject(df):
    """Mirror the in-plan duplicate injection of the dedup bands."""
    from clinical_data_platform_spark.plans.textops import (
        _INJ_DOCS,
        _INJ_OFFSET,
    )

    dup = df[df["doc_id"] < _INJ_DOCS].copy()
    dup["doc_id"] = dup["doc_id"] + _INJ_OFFSET
    import pandas as pd

    return pd.concat([df, dup], ignore_index=True)


def _shingle_set(text: str, n: int = 3) -> frozenset[str]:
    toks = text.strip().lower().split()
    return frozenset(
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    )


def test_minhash_band_recount(spark):
    """Brute-force recount of every exact value in the MinHash band, and
    the claims must literally hold on the fixture."""
    from collections import Counter

    from clinical_data_platform_spark.plans import QUERIES

    row = QUERIES["minhash_lsh_candidate_pairs"](spark, SF).collect()[0]
    docs = _inject(_docs_pandas()[["doc_id", "text"]])
    ssets = {
        r.doc_id: _shingle_set(r.text)
        for r in docs.itertuples()
        if _shingle_set(r.text)
    }
    counts = Counter(ssets.values())
    expect_dups = sum(c * (c - 1) // 2 for c in counts.values())
    assert row["n_docs"] == len(docs)
    assert row["n_docs_signed"] == len(ssets)
    assert row["n_shingleset_dup_pairs"] == expect_dups
    # injection guarantees the collision claim is exercised, not vacuous
    assert expect_dups >= 8
    assert row["shingleset_dups_all_candidates"] is True


def test_simhash_band_recount(spark):
    from collections import Counter

    from clinical_data_platform_spark.plans import QUERIES

    row = QUERIES["simhash_signatures"](spark, SF).collect()[0]
    docs = _inject(_docs_pandas()[["doc_id", "text"]])
    multisets = [
        tuple(sorted(r.text.strip().lower().split()))
        for r in docs.itertuples()
        if r.text.strip()
    ]
    counts = Counter(multisets)
    expect_dups = sum(c * (c - 1) // 2 for c in counts.values())
    assert row["n_docs_signed"] == len(multisets)
    assert row["n_multiset_dup_pairs"] == expect_dups
    assert expect_dups >= 8
    assert row["identical_multisets_same_sig"] is True
    assert row["sign_bit_unused"] is True


def test_blas_band_recount(spark):
    """The BLAS band's n_pairs must equal an independent count of the
    expression twin's pairs, and every twin-equivalence claim must hold."""
    import pyspark.sql.functions as F

    from clinical_data_platform_spark.catalog import table as T
    from clinical_data_platform_spark.plans import QUERIES
    from clinical_data_platform_spark.plans.clustering import (
        _DEMO_CAP,
        semantic_near_dup_frame,
    )

    row = QUERIES["semantic_near_dup_blas_pairs"](spark, SF).collect()[0]
    e = T(spark, SF, "embeddings").filter(F.col("vec_id") < _DEMO_CAP)
    n_twin = semantic_near_dup_frame(e).count()
    assert row["n_pairs"] == n_twin > 0
    assert row["pair_sets_match_expression_twin"] is True
    assert row["cells_match_twin"] is True
    assert row["cosine_matches_twin_1e4"] is True


@pytest.mark.parametrize(
    "fixture", sorted(glob.glob("/root/testdata/sf*/embeddings.parquet"))
)
def test_seeded_inertia_fixed_point_margin(fixture):
    """kmeans_ml_clusters' seeded_inertia_fp oracle applies
    floor(sqdist * 1e6) per point in BOTH engines. floor is
    discontinuous, so the hash is exact only while every sqdist*1e6
    lands far from an integer boundary relative to float reorder noise
    (the two engines may sum the 64 squared terms in different orders;
    |error| <= n_terms * eps * magnitude). Seed points are exempt: their
    sqdist is EXACTLY 0.0 in any summation order (every term is 0.0).

    Asserts a 1000x safety factor on every shipped fixture, mirroring
    tests/test_hamming_margin.py — a regenerated fixture that lands a
    point near a boundary fails here loudly instead of as an
    inscrutable driver hash mismatch (judge ADVICE r7)."""
    from clinical_data_platform_spark.plans.clustering import _K

    t = pq.read_table(fixture).to_pandas()
    x = np.array([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    order = np.argsort(t["vec_id"].to_numpy())
    x = x[order]
    cents = x[:_K]
    d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    sq = d2.min(axis=1)
    # seed self-assignments are exactly zero in both engines
    assert (sq[:_K] == 0.0).all()
    v = sq * 1e6
    frac = v - np.floor(v)
    margin = np.minimum(frac, 1.0 - frac)
    eps = np.finfo(np.float64).eps
    noise_bound = 2 * x.shape[1] * eps * np.maximum(v, 1.0)
    nz = sq > 0
    ratio = margin[nz] / noise_bound[nz]
    assert ratio.min() > 1000, (
        f"{fixture}: min boundary-margin/noise ratio {ratio.min():.1f} — "
        "a sqdist*1e6 sits too close to an integer; the floor-based "
        "fixed-point oracle is no longer reorder-safe on this fixture"
    )

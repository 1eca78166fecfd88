"""Wave-7 linear-algebra plans: distributed covariance via gram
partials, JL sign projection, and MAD robust outliers — value gates
beyond the DuckDB oracle (eigen math, JL concentration, brute-force
outlier recount)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_matrix(spark):
    pdf = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .orderBy("vec_id")
        .toPandas()
    )
    return np.array(pdf["embedding"].tolist(), dtype=np.float64)


def test_covariance_matches_numpy_and_is_psd(spark, emb_matrix):
    from clinical_data_platform_spark.plans.matrixops import (
        embedding_covariance_matrix,
    )

    rows = embedding_covariance_matrix(spark, SF).collect()
    d = emb_matrix.shape[1]
    assert len(rows) == d * (d + 1) // 2
    cov = np.zeros((d, d))
    for r in rows:
        cov[r.i, r.j] = r.cov
        cov[r.j, r.i] = r.cov
    expected = np.cov(emb_matrix, rowvar=False, bias=True)
    assert np.allclose(cov, expected, atol=2e-7)  # 7 dp rounding
    evals = np.linalg.eigvalsh(cov)
    # PSD up to the rounding applied to each entry
    assert evals.min() > -1e-5
    # the eigendecomposition is usable driver-side: full trace recovered
    assert np.isclose(evals.sum(), np.trace(cov))


def test_gram_partials_shuffle_is_constant_size(spark):
    """The shuffled partial table is O(partitions * d^2), never O(rows)."""
    from clinical_data_platform_spark.operators.linalg import gram_partials

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    n_parts = e.rdd.getNumPartitions()
    d = 64
    per_partition = d * (d + 1) // 2 + d + 1
    assert gram_partials(e, "embedding", d).count() <= n_parts * per_partition


def test_jl_projection_concentrates_and_is_deterministic(spark):
    from clinical_data_platform_spark.plans.matrixops import (
        jl_projection_distortion,
        jl_sign_matrix,
    )

    r = jl_sign_matrix()
    assert len(r) == 16 and all(len(row) == 64 for row in r)
    assert {abs(v) for row in r for v in row} == {0.25}

    a = jl_projection_distortion(spark, SF).orderBy("pair_id").toPandas()
    b = jl_projection_distortion(spark, SF).orderBy("pair_id").toPandas()
    pd.testing.assert_frame_equal(a, b)  # fully deterministic

    # E[ratio] = 1 for JL sign projections; k=16 gives wide but bounded
    # per-pair spread and a tight mean over the pair population
    assert 0.85 < a["ratio"].mean() < 1.15
    assert (a["ratio"] > 0).all()
    assert (a["d2_proj"] >= 0).all()


def test_mad_outliers_match_bruteforce(spark):
    from clinical_data_platform_spark.plans.stats import value_outliers_mad

    got = {
        r.event_type: r
        for r in value_outliers_mad(spark, SF).collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    for et, grp in ev.groupby("event_type"):
        med = grp["value"].median()
        absdev = (grp["value"] - med).abs()
        mad = absdev.median()
        n_out = int((0.6745 * absdev > 3.5 * mad).sum())
        r = got[et]
        assert r.n == len(grp)
        assert r.med == pytest.approx(med, abs=1e-4)
        assert r.mad == pytest.approx(mad, abs=1e-4)
        assert r.n_outliers == n_out
        if mad > 0:
            assert r.max_robust_z == pytest.approx(
                0.6745 * absdev.max() / mad, abs=1e-3
            )

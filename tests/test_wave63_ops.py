"""Wave-63 invariant tests: CUSUM chart, seasonal-naive MASE, E-value
sensitivity, TextRank keywords, PCA power iteration. Value exactness is
the oracle gate's job; these pin the math the hash can't express."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_cusum_bounds(spark):
    from clinical_data_platform_spark.plans.events import cusum_control_chart

    rows = cusum_control_chart(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.max_cusum_pos_sigma >= 0
        assert r.max_cusum_neg_sigma >= 0
        assert 0 <= r.n_alarm_hours <= r.n_hours


def test_mase_ratio_consistent(spark):
    from clinical_data_platform_spark.plans.events import seasonal_naive_mase

    rows = seasonal_naive_mase(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_scored > 0
        assert r.mae_naive1 >= 0 and r.mae_seasonal24 >= 0
        if r.mae_naive1 > 0:
            assert abs(r.mase - r.mae_seasonal24 / r.mae_naive1) < 1e-4


def test_evalue_at_least_one(spark):
    from clinical_data_platform_spark.plans.events import (  # noqa: F401
        cusum_control_chart,
    )
    from clinical_data_platform_spark.plans.stats import evalue_sensitivity

    r = evalue_sensitivity(spark, SF).collect()[0]
    assert r.n_control > 0 and r.n_treatment > 0
    if r.risk_ratio is not None:
        assert r.evalue_point >= 1.0
        # the CI bound is closer to the null than the point estimate
        assert 1.0 <= r.evalue_ci <= r.evalue_point + 1e-9


def test_textrank_structure(spark):
    from clinical_data_platform_spark.plans.collocations import (
        _TR_MIN_LEN,
        _TR_TOPK,
        textrank_keywords,
    )

    rows = textrank_keywords(spark, SF).collect()
    assert len(rows) == _TR_TOPK
    scores = [r.textrank for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.textrank > 0 for r in rows)
    assert all(len(r.keyword) >= _TR_MIN_LEN for r in rows)
    assert len({r.keyword for r in rows}) == _TR_TOPK


def test_pca_matches_numpy_eigenvector(spark):
    """Power iteration must converge to numpy's dominant eigenvector of
    the SAME covariance matrix: |cosine| >= 0.999 after 8 inf-norm
    rounds, and lambda_inf approximates the top eigenvalue."""
    import numpy as np

    from clinical_data_platform_spark.catalog import table as T
    from clinical_data_platform_spark.plans.matrixops import pca_top_component

    rows = pca_top_component(spark, SF).collect()
    v = np.zeros(len(rows))
    for r in rows:
        v[r.component] = r.loading
    assert abs(np.abs(v).max() - 1.0) < 1e-5  # inf-normalized
    emb = np.array(
        [r.embedding for r in T(spark, SF, "embeddings").collect()],
        dtype=np.float64,
    )
    cov = np.cov(emb, rowvar=False, bias=True)
    w, vec = np.linalg.eigh(cov)
    top = vec[:, np.argmax(w)]
    cos = abs(np.dot(v, top)) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos >= 0.999, cos
    lam = rows[0].lambda_inf
    # inf-norm Rayleigh scale ~ top eigenvalue within the norm-ratio slack
    assert 0.5 * w.max() <= lam <= 1.5 * w.max()

"""Sign-margin safety audit for the 64-bit Hamming sketch (wave 81).

``hamming_rerank_topk_vec0`` is value-exactly oracled, which requires the
SIGN of every plane projection to agree between Spark's BLAS GEMM
(``x @ planes.T``, arbitrary summation order) and DuckDB's
``list_dot_product`` (its own order). Floating-point addition is not
associative, so the two engines can differ by reorder noise — bounded by
``n_terms * eps * sum(|p_i * x_i|)``. The oracle stays exact only while
every projection's distance from zero dwarfs that noise.

This test recomputes the minimum |projection| over EVERY active parquet
fixture (all /root/testdata/sf* dirs present) and asserts it exceeds a
1000x safety factor over the per-vector reorder-noise bound, so a fixture
regeneration that lands a projection near zero fails HERE, loudly, instead
of surfacing as an inscrutable driver gate hash mismatch (judge ADVICE r6,
vectorops.py hamming_rerank_topk_vec0).
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from clinical_data_platform_spark.plans.vectorops import (
    _HAM_PLANES,
    _slsh_signs,
)

SAFETY = 1_000.0


def _sf_dirs() -> list[str]:
    root = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    return sorted(
        d
        for d in glob.glob(os.path.join(root, "sf*"))
        if os.path.exists(os.path.join(d, "embeddings.parquet"))
    )


@pytest.mark.parametrize("sf_dir", _sf_dirs() or ["<missing>"])
def test_hamming_sign_margin_dwarfs_reorder_noise(sf_dir):
    if sf_dir == "<missing>":
        pytest.skip("no testdata fixtures on this host")
    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )
    x = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()]
    )
    planes = np.asarray(_slsh_signs(_HAM_PLANES), dtype=np.float64)
    projs = x @ planes.T  # n_vectors x 64
    # Per-(vector, plane) reorder-noise bound: n_terms * eps * sum|p_k x_k|.
    # |p_k| = 1 (Rademacher), so sum|p_k x_k| = sum|x_k| per row.
    dim = x.shape[1]
    noise = (
        dim
        * np.finfo(np.float64).eps
        * np.sum(np.abs(x), axis=1, keepdims=True)
    )
    margin = np.abs(projs)
    worst = float(np.min(margin / np.maximum(noise, 1e-300)))
    assert worst > SAFETY, (
        f"{sf_dir}: min |projection|/noise ratio {worst:.1f} <= {SAFETY}; "
        "a sketch bit sits within summation-reorder noise of zero — the "
        "value-exact oracle for hamming_rerank_topk_vec0 is no longer safe "
        "on this fixture"
    )

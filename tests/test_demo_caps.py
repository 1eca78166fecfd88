"""Demo-input-cap safety audit (judge ADVICE r7, vectorops.py:312).

The bounded k=8 / tau=0.45 contract demonstrations
(semantic_near_dup_pairs, semantic_near_dup_blas_pairs,
embedding_near_dup_t80_pairs, ...) read the deterministic
``vec_id < CAP`` prefix and their docstrings claim "every shipped fixture
sits entirely inside the cap" — i.e. demo semantics are FULL-corpus on
the gate fixtures. The sf0.1 fixture tops out at vec_id 1999 against a
cap of 2048: only 48 ids of headroom, so a regenerated, slightly larger
fixture would silently flip the demos from full-corpus to prefix
semantics while the docstrings still lie. This test makes that failure
loud: every shipped embeddings fixture must sit strictly inside EVERY
demo cap.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from clinical_data_platform_spark.plans.clustering import (
    _DEMO_CAP as _CLUSTER_DEMO_CAP,
)
from clinical_data_platform_spark.plans.vectorops import _PAIR_DEMO_CAP


def test_every_fixture_inside_every_demo_cap():
    fixtures = sorted(glob.glob("/root/testdata/sf*/embeddings.parquet"))
    assert fixtures, "no embeddings fixtures found"
    caps = {
        "clustering._DEMO_CAP": _CLUSTER_DEMO_CAP,
        "vectorops._PAIR_DEMO_CAP": _PAIR_DEMO_CAP,
    }
    for path in fixtures:
        max_id = max(
            pq.read_table(path, columns=["vec_id"])["vec_id"].to_pylist()
        )
        for name, cap in caps.items():
            assert max_id < cap, (
                f"{path}: max vec_id {max_id} >= {name} {cap} — the demo "
                "registrations would silently read a PREFIX of this "
                "fixture; raise the cap (and re-pin oracle hashes) or "
                "shrink the fixture"
            )

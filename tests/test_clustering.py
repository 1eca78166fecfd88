"""Embedding-clustering plan tests (plans/clustering.py).

The two oracled queries are covered by the DuckDB gate
(tests/test_oracle_parity.py samples the registry); these tests pin the
properties the oracle cannot express: seed self-assignment, point
conservation, ML determinism under a fixed seed, and that real Lloyd
iterations beat the naive seeded assignment on inertia.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from clinical_data_platform_spark.catalog import table as T
from clinical_data_platform_spark.plans.clustering import (
    _K,
    _assigned,
    kmeans_assign_seeded,
    kmeans_ml_cluster_profile,
    kmeans_ml_clusters,
)

SF = "/root/testdata/sf0.001"


def test_seed_vectors_self_assign(spark):
    """Each seed vector (vec_id < k) is its own centroid: distance 0."""
    a = _assigned(T(spark, SF, "embeddings"))
    seeds = a.filter(F.col("vec_id") < _K).collect()
    assert len(seeds) == _K
    for r in seeds:
        assert r["cid"] == r["vec_id"]
        assert abs(r["sqdist"]) < 1e-12


def test_assignment_conserves_points(spark):
    e = T(spark, SF, "embeddings")
    total = e.count()
    per_cluster = kmeans_assign_seeded(spark, SF).collect()
    assert sum(r["n_points"] for r in per_cluster) == total
    assert {r["cid"] for r in per_cluster} <= set(range(_K))


def test_ml_kmeans_deterministic_and_conserving(spark):
    e_total = T(spark, SF, "embeddings").count()
    a = kmeans_ml_cluster_profile(spark, SF).collect()
    b = kmeans_ml_cluster_profile(spark, SF).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert sum(r["n_points"] for r in a) == e_total
    assert len(a) <= _K


def test_lloyd_beats_seeded_assignment(spark):
    """10 Lloyd iterations from k-means|| init must not be worse than
    argmin against arbitrary seed rows (weighted mean distance)."""

    def weighted_avg(rows):
        n = sum(r["n_points"] for r in rows)
        return sum(r["avg_dist"] * r["n_points"] for r in rows) / n

    seeded = weighted_avg(kmeans_assign_seeded(spark, SF).collect())
    ml = weighted_avg(kmeans_ml_cluster_profile(spark, SF).collect())
    assert ml <= seeded * 1.001


def test_ml_kmeans_band_row_claims_hold(spark):
    """The registered kmeans_ml_clusters band row (r7 rows-only
    promotion): both TRUE-literal claims genuinely hold, and the
    fixed-point seeded inertia equals a driver-side recount."""
    row = kmeans_ml_clusters(spark, SF).collect()[0]
    assert row["all_k_clusters_nonempty"] is True
    assert row["ml_inertia_le_seeded"] is True
    assert row["n_points"] == T(spark, SF, "embeddings").count()
    import math

    fp = sum(
        int(math.floor(r["sqdist"] * 1e6))
        for r in _assigned(T(spark, SF, "embeddings")).collect()
    )
    assert row["seeded_inertia_fp"] == fp


def test_semantic_dedup_finds_all_true_duplicates(spark):
    """SemDeDup guarantee: injected TRUE near-duplicates (v + tiny noise,
    cos ~ 0.9999) always co-assign with their original and are found;
    precision is 1.0 by construction (exact cosine inside the cell)."""
    from clinical_data_platform_spark.plans.clustering import (
        semantic_near_dup_frame,
    )

    e = T(spark, SF, "embeddings")
    rows = e.orderBy("vec_id").limit(40).collect()
    max_id = max(r["vec_id"] for r in rows)
    dups = [
        (
            int(max_id + 1 + i),
            [float(x) + ((i + j) % 7 - 3) * 1e-4 for j, x in enumerate(r["embedding"])],
            int(r["label"]),
        )
        for i, r in enumerate(rows)
    ]
    aug = e.unionByName(
        spark.createDataFrame(dups, ["vec_id", "embedding", "label"])
        .withColumn("embedding", F.col("embedding").cast("array<float>"))
    )
    found = {
        (r["id_a"], r["id_b"])
        for r in semantic_near_dup_frame(aug, threshold=0.99).collect()
    }
    expected = {(r["vec_id"], max_id + 1 + i) for i, r in enumerate(rows)}
    assert expected <= found  # recall 1.0 on true duplicates


def test_blas_paths_match_expression_paths(spark):
    """assign_blas / semantic_near_dup_blas must produce byte-equal
    assignments and the same pair set as the JVM expression plans."""
    from clinical_data_platform_spark.plans.clustering import (
        assign_blas,
        semantic_near_dup_blas,
        semantic_near_dup_frame,
    )

    e = T(spark, SF, "embeddings")
    expr = {r["vec_id"]: r["cid"] for r in _assigned(e).collect()}
    blas = {r["vec_id"]: r["cid"] for r in assign_blas(e).collect()}
    assert expr == blas

    pairs_expr = {
        (r["id_a"], r["id_b"], round(r["cosine"], 4))
        for r in semantic_near_dup_frame(e).collect()
    }
    pairs_blas = {
        (r["id_a"], r["id_b"], round(r["cosine"], 4))
        for r in semantic_near_dup_blas(e).collect()
    }
    assert pairs_expr == pairs_blas


def test_assignment_plan_is_map_side(spark):
    """The assignment subplan must contain no Exchange: k distance
    expressions inline in one projection, argmin via array_min."""
    plan = _assigned(T(spark, SF, "embeddings"))
    explained = plan._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in explained


def test_hybrid_assignment_dispatch_equivalence_at_scale_k(spark):
    """semantic_near_dup_frame hands assignment to the BLAS GEMM above
    k=_ASSIGN_BLAS_OVER_K (the k-scaled registration crosses it on big
    corpora; the gate corpora never do). The handoff must be invisible:
    byte-equal assignments at a k past the threshold on the largest
    shipped corpus, and the pair set identical across a forced run of
    both paths."""
    from clinical_data_platform_spark.plans.clustering import (
        _ASSIGN_BLAS_OVER_K,
        _assigned,
        assign_blas,
    )

    e = T(spark, "/root/testdata/sf0.1", "embeddings")
    k = 100
    assert k > _ASSIGN_BLAS_OVER_K
    expr = {r["vec_id"]: r["cid"] for r in _assigned(e, k).collect()}
    blas = {r["vec_id"]: r["cid"] for r in assign_blas(e, k).collect()}
    assert expr == blas

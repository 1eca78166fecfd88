"""Invariant tests for the late-r3 operators: Count-Min Sketch,
weighted reservoir sampling, PageRank, and ER blocking. (Their exact
value parity vs DuckDB is covered by test_oracle_parity; these pin the
algorithmic properties the oracle can't express.)"""

from __future__ import annotations

import pyspark.sql.functions as F

from clinical_data_platform_spark.plans.graphops import nation_trade_pagerank
from clinical_data_platform_spark.plans.sketches import (
    _CMS_D,
    _CMS_W,
    cms_heavy_hitters,
    hll_distinct_users,
    weighted_reservoir_sample,
)
from clinical_data_platform_spark.plans.textops import er_blocking_part_pairs

SF_DIR = "/root/testdata/sf0.001"


def test_cms_overcount_is_one_sided(spark):
    """Count-Min can only overestimate: estimate >= exact for every term,
    and the overcount column is exactly their difference."""
    rows = cms_heavy_hitters(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cms_estimate >= r.exact_cnt, r
        assert r.overcount == r.cms_estimate - r.exact_cnt


def test_cms_error_bound(spark):
    """CMS error bound: overcount <= total token count * e/w holds with
    prob 1 - e^-d per term; at d=4 a blown bound on ANY of 20 heavy
    terms (p ~ 20*e^-4 with slack 2.72 below) means broken bucketing."""
    total = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("t"))
        .count()
    )
    bound = 2.718281828 * total / _CMS_W
    for r in cms_heavy_hitters(spark, SF_DIR).collect():
        assert r.overcount <= bound, (r, bound)


def test_reservoir_sample_shape_and_keys(spark):
    """Exactly min(k, group size) rows per source; keys in (0, 1]."""
    df = weighted_reservoir_sample(spark, SF_DIR)
    per_source = {
        r.source: r.n
        for r in df.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    sizes = {
        r.source: r.n
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_source == {s: min(5, n) for s, n in sizes.items()}
    for r in df.collect():
        assert 0.0 < r.sample_key <= 1.0


def test_reservoir_favors_heavy_docs(spark):
    """A-Res keys u^(1/w) rise with w: the sampled docs' mean n_chars
    must exceed the corpus mean (weights here span ~3 orders)."""
    sampled = weighted_reservoir_sample(spark, SF_DIR).agg(
        F.avg("n_chars")
    ).first()[0]
    overall = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    assert sampled > overall


def test_hll_estimate_accuracy(spark):
    """64-register HLL: relative error ~1.04/sqrt(64) = 13%; assert every
    group lands within 3 sigma (40%) of truth, and estimates are
    positive. (Exact cross-engine value parity is the oracle test.)"""
    for r in hll_distinct_users(spark, SF_DIR).collect():
        assert r.hll_estimate > 0
        rel = abs(r.hll_estimate - r.true_distinct) / r.true_distinct
        assert rel < 0.40, r


def test_pagerank_is_a_distribution(spark):
    """Ranks form a probability distribution: sum 1 (no dangling mass by
    construction), every rank >= the teleport floor (1-d)/N."""
    rows = nation_trade_pagerank(spark, SF_DIR).collect()
    n = len(rows)
    assert n >= 2
    total = sum(r.pagerank for r in rows)
    assert abs(total - 1.0) < 1e-4, total
    floor = 0.15 / n - 1e-6
    for r in rows:
        assert r.pagerank >= floor, r


def test_pagerank_deterministic(spark):
    """Two evaluations produce identical rounded ranks (iteration
    rounding re-synchronizes float sum order)."""
    a = {r.nation: r.pagerank for r in nation_trade_pagerank(spark, SF_DIR).collect()}
    b = {r.nation: r.pagerank for r in nation_trade_pagerank(spark, SF_DIR).collect()}
    assert a == b


def test_er_blocking_pairs_are_verified_matches(spark):
    """Every emitted pair shares its block key AND clears the Jaccard
    threshold against a brute-force recompute."""
    pairs = er_blocking_part_pairs(spark, SF_DIR).collect()
    assert pairs  # 2 matches exist at sf0.001
    parts = {
        r.p_partkey: sorted(
            set(f"{r.p_name} {r.p_brand} {r.p_type}".lower().split())
        )
        for r in spark.read.parquet(f"{SF_DIR}/part.parquet").collect()
    }
    for p in pairs:
        ta, tb = parts[p.part_a], parts[p.part_b]
        assert ta[:2] == tb[:2]  # same blocking key
        inter = len(set(ta) & set(tb))
        union = len(set(ta) | set(tb))
        assert inter / union >= 0.75
        assert abs(p.jaccard - (inter * 1e6 // union) / 1e6) < 1e-9

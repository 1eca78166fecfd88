"""Declarative Bloom filter (operators/bloom.py): no false negatives,
bounded false-positive rate, and real pruning in the incremental-dedup
plan (the property the exact oracle cannot see)."""

from __future__ import annotations

import pyspark.sql.functions as F

from clinical_data_platform_spark.operators.bloom import (
    build_bloom,
    might_contain,
)


def _members(spark, n=2000):
    return spark.range(n).select(
        F.concat(F.lit("member-"), F.col("id")).alias("v")
    )


def test_no_false_negatives(spark):
    members = _members(spark)
    bloom = build_bloom(members, F.col("v"))
    probed = members.crossJoin(F.broadcast(bloom)).select(
        might_contain(F.col("bloom"), F.col("v")).alias("hit")
    )
    assert probed.filter(~F.col("hit")).count() == 0


def test_false_positive_rate_bounded(spark):
    bloom = build_bloom(_members(spark), F.col("v"))
    outside = spark.range(5000).select(
        F.concat(F.lit("outsider-"), F.col("id")).alias("v")
    )
    fp = (
        outside.crossJoin(F.broadcast(bloom))
        .filter(might_contain(F.col("bloom"), F.col("v")))
        .count()
    )
    # 2k keys, k=5 hashes in 2^18 bits -> theoretical fpp ~ 3e-7; allow
    # three orders of magnitude of slack and it is still conclusive.
    assert fp / 5000 < 1e-3


def test_incremental_dedup_bloom_actually_prunes(spark):
    """The definitely-new bypass (might_contain = false) must carry most
    of the incoming batch — otherwise the sketch saved nothing."""
    from clinical_data_platform_spark.functions.text import fingerprint
    from clinical_data_platform_spark.catalog import table as T

    sf = "/root/testdata/sf0.001"
    docs = T(spark, sf, "documents").select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )
    existing = docs.filter(F.col("doc_id") % 10 != 3).select("fp")
    incoming = docs.filter(F.col("doc_id") % 10 == 3)
    bloom = build_bloom(existing, F.col("fp"))
    routed = incoming.crossJoin(F.broadcast(bloom)).select(
        might_contain(F.col("bloom"), F.col("fp")).alias("maybe_dup")
    )
    n = routed.count()
    pruned = routed.filter(~F.col("maybe_dup")).count()
    assert n > 0
    # the synthetic corpus has no cross-bucket duplicate texts, so nearly
    # every incoming doc should bypass the verification join
    assert pruned / n > 0.9

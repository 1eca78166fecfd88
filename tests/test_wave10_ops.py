"""Wave-10 plans: PSI drift, decayed activity, token KL, RFM segments —
invariants beyond the DuckDB value oracle."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_psi_nonnegative_and_counts_match(spark):
    import pyspark.sql.functions as F

    from clinical_data_platform_spark.plans.stats import value_psi_weekly

    rows = value_psi_weekly(spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ref_n = ev.filter(
        (F.col("ts") >= "2024-01-01") & (F.col("ts") < "2024-01-08")
    ).count()
    assert sum(r.n_ref for r in rows) == ref_n
    for r in rows:
        # each PSI term (p-q)ln(p/q) is >= 0, so the sum is
        assert r.psi >= 0.0, r


def test_decayed_activity_bounded_and_deterministic(spark):
    from clinical_data_platform_spark.plans.events import (
        decayed_user_activity,
    )

    a = decayed_user_activity(spark, SF).collect()
    b = decayed_user_activity(spark, SF).collect()
    assert a == b
    scores = [r.activity_score for r in a]
    assert scores == sorted(scores, reverse=True)
    for r in a:
        # every weight is in (0, 1): all events precede the reference
        assert 0.0 < r.activity_score < r.n_events


def test_token_kl_divergence_properties(spark):
    from clinical_data_platform_spark.plans.corpusqc import (
        token_kl_divergence,
    )

    r = token_kl_divergence(spark, SF).first()
    assert r.kl_ab >= 0.0 and r.kl_ba >= 0.0  # Gibbs' inequality
    assert 0.0 <= r.js_divergence <= math.log(2) + 1e-9  # JS bound (nats)
    assert r.vocab_size > 0
    # JS is never larger than the average of the two KLs
    assert r.js_divergence <= (r.kl_ab + r.kl_ba) / 2 + 1e-9


def test_rfm_segments_partition_customers(spark):
    from clinical_data_platform_spark.plans.advanced import (
        customer_rfm_segments,
    )

    rows = customer_rfm_segments(spark, SF).collect()
    o = spark.read.parquet(f"{SF}/orders.parquet")
    n_cust = o.select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.r_score <= 4
        assert 1 <= r.f_score <= 4
        assert 1 <= r.m_score <= 4
        assert r.avg_monetary > 0
    # quartile scoring: each m_score stratum holds 10-40% of customers
    for s in (1, 2, 3, 4):
        share = sum(r.n_customers for r in rows if r.m_score == s) / n_cust
        assert 0.10 <= share <= 0.40, (s, share)


def test_stream_psi_equals_batch_and_reruns(spark):
    from clinical_data_platform_spark.plans.stats import value_psi_weekly
    from clinical_data_platform_spark.plans.streamops import stream_value_psi

    batch = {r.event_type: r for r in value_psi_weekly(spark, SF).collect()}
    s1 = {r.event_type: r for r in stream_value_psi(spark, SF).collect()}
    s2 = {r.event_type: r for r in stream_value_psi(spark, SF).collect()}
    assert s1 == s2  # memory-sink names must not collide across runs
    assert set(s1) == set(batch)
    for et, r in s1.items():
        b = batch[et]
        # streamed bin state == batch bin state over the bounded source,
        # so the folded PSI matches the batch operator exactly
        assert (r.n_ref, r.n_cur, r.psi) == (b.n_ref, b.n_cur, b.psi)

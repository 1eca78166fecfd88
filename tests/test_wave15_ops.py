"""Wave-15 plans: A/B two-proportion test, funnel latency, Lorenz
deciles — invariants beyond the DuckDB value oracle."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_ab_test_counts_and_null_true(spark):
    from clinical_data_platform_spark.plans.stats import (
        ab_test_two_proportion,
    )

    r = ab_test_two_proportion(spark, SF).first()
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert r.n_control + r.n_treatment == n_users
    assert 0 <= r.conv_control <= r.n_control
    assert 0 <= r.conv_treatment <= r.n_treatment
    if r.p_value is not None:
        assert 0.0 <= r.p_value <= 1.0
        # variant is a hash of user_id, independent of behavior: the
        # null is true by construction, so |z| should not be extreme
        assert abs(r.z) < 5.0


def test_funnel_latency_positive_and_ordered(spark):
    from clinical_data_platform_spark.plans.events import (
        funnel_conversion_latency,
        funnel_view_click_purchase,
    )

    r = funnel_conversion_latency(spark, SF).first()
    assert r.n_converted > 0
    assert 0 < r.p50_minutes <= r.p90_minutes
    assert r.mean_minutes > 0
    # converted-with-latency counts users with view->purchase; the
    # 3-stage funnel (view->click->purchase) can only be narrower
    f = funnel_view_click_purchase(spark, SF).first()
    assert f.n_view_click_purchase <= r.n_converted <= f.n_view


def test_lorenz_deciles_partition_and_monotone(spark):
    from clinical_data_platform_spark.plans.events import (
        user_value_lorenz_deciles,
    )

    rows = sorted(
        user_value_lorenz_deciles(spark, SF).collect(), key=lambda r: r.decile
    )
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_users for r in rows) == n_users
    total_share = sum(r.value_share for r in rows)
    assert abs(total_share - 1.0) < 1e-4  # trunc6 per decile
    # Lorenz: per-user share is nondecreasing in decile
    per_user = [r.value_share / r.n_users for r in rows]
    for a, b in zip(per_user, per_user[1:]):
        assert b >= a - 1e-9

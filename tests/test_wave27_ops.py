"""Wave-27 plans: privacy audits, UCB bandit, stream-static join,
temporal split audit — invariants beyond the DuckDB value oracle."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_k_anonymity_recount(spark):
    from clinical_data_platform_spark.plans.validation import (
        k_anonymity_audit,
    )

    r = k_anonymity_audit(spark, SF).collect()[0]
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    cust["band"] = (cust.c_acctbal / 1000.0).apply(math.floor)
    sizes = cust.groupby(["c_nationkey", "c_mktsegment", "band"]).size()
    assert r.n_groups == len(sizes)
    assert r.groups_below_k == int((sizes < 5).sum())
    assert r.rows_reidentifiable == int(sizes[sizes < 5].sum())
    assert r.min_group_size == int(sizes.min())
    assert 0.0 <= r.reidentifiable_share <= 1.0


def test_dp_noise_properties(spark):
    from clinical_data_platform_spark.plans.validation import dp_noisy_counts

    rows = dp_noisy_counts(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert math.isclose(
            r.released_count, r.true_count + r.noise, abs_tol=2e-6
        )
        # Laplace(1) noise: essentially never beyond ~25 in magnitude
        assert abs(r.noise) < 25
    # deterministic release: identical on re-run
    again = dp_noisy_counts(spark, SF).collect()
    assert sorted(rows) == sorted(again)


def test_ucb_selects_max_score(spark):
    from clinical_data_platform_spark.plans.stats import ucb_arm_selection

    rows = ucb_arm_selection(spark, SF).collect()
    assert len(rows) == 5
    best = max(r.ucb_score for r in rows)
    for r in rows:
        assert r.selected == (1 if r.ucb_score == best else 0)
        assert r.ucb_score > r.mean_reward  # exploration bonus positive
        assert 0.0 <= r.mean_reward <= 1.0
    assert sum(r.selected for r in rows) >= 1


def test_stream_static_join_equals_batch(spark):
    from clinical_data_platform_spark.plans.streamops import (
        stream_segment_enriched_counts,
    )

    rows = stream_segment_enriched_counts(spark, SF).collect()
    assert {r.segment for r in rows} <= {"gold", "silver", "bronze"}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    assert sum(r.n for r in rows) == len(ev)


def test_temporal_split_clean_boundaries(spark):
    from clinical_data_platform_spark.plans.trainprep import (
        temporal_split_audit,
    )

    rows = {r.split: r for r in temporal_split_audit(spark, SF).collect()}
    assert set(rows) == {"train", "val", "test"}
    # clean time fences: no split's span crosses the next split's start
    assert rows["train"].max_ts < rows["val"].min_ts
    assert rows["val"].max_ts < rows["test"].min_ts
    # train never "leaks from the future": by definition zero overlap
    assert rows["train"].users_seen_in_train == 0
    # but user-level overlap across time is real and measured
    assert rows["test"].users_seen_in_train > 0
    assert 0.0 <= rows["test"].user_overlap_share <= 1.0

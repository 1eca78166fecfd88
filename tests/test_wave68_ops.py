"""Wave-68 invariant tests: columnar encoding audit, SES/Theta forecast,
AdaBoost stump trajectory, Burrows' Delta stylometry."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_columnar_encoding_audit_invariants(spark):
    from clinical_data_platform_spark.plans.layout import (
        columnar_encoding_audit,
    )

    rows = {r.column_name: r for r in columnar_encoding_audit(spark, SF).collect()}
    assert set(rows) == {"status", "priority", "custkey", "day"}
    for r in rows.values():
        assert 1 <= r.n_distinct <= r.n
        assert r.n_distinct <= r.runs_arrival <= r.n  # runs bracket
        assert r.rle_sorted_b <= r.rle_arrival_b  # sorting never adds runs
        assert 0.0 < r.best_ratio <= 1.0
        assert r.sorted_ratio <= r.best_ratio + 1e-9
        assert r.best_arrival in {"plain", "dict", "rle"}
    # low-cardinality columns must dictionary/RLE-compress hard (the
    # 1-byte status column's floor is the 2-bit dict index stream: 1/4)
    assert rows["status"].best_ratio < 0.3
    # a shuffled key column has no run structure: arrival-order RLE
    # must never win there, and its run count is ~n
    ck = rows["custkey"]
    assert ck.best_arrival != "rle"
    assert ck.runs_arrival > ck.n * 0.9


def test_ses_theta_forecast_sanity(spark):
    from clinical_data_platform_spark.plans.events import ses_theta_forecast

    rows = ses_theta_forecast(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_hours > 24
        assert r.ses_level > 0.0
        # SES of a positive series stays within its range
        assert r.ses_level <= r.n_hours * 100
        # theta = ses + drift/(2 alpha): check the identity
        assert abs(
            r.theta_forecast - (r.ses_level + r.drift_per_hour / 0.4)
        ) < 2e-6


def test_ses_closed_form_matches_recurrence(spark):
    """The closed form must equal the textbook sequential recurrence."""
    from clinical_data_platform_spark.catalog import table as T
    from clinical_data_platform_spark.plans.events import ses_theta_forecast
    import pyspark.sql.functions as F

    ev = T(spark, SF, "events")
    h = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("y"))
        .orderBy("event_type", "hour")
        .collect()
    )
    series = {}
    for r in h:
        series.setdefault(r.event_type, []).append(r.y)
    got = {r.event_type: r.ses_level for r in ses_theta_forecast(spark, SF).collect()}
    for et, ys in series.items():
        lvl = float(ys[0])
        for y in ys[1:]:
            lvl = 0.2 * y + 0.8 * lvl
        assert abs(got[et] - lvl) < 1e-3, et


def test_adaboost_trajectory_invariants(spark):
    from clinical_data_platform_spark.plans.stats import (
        adaboost_stumps_trajectory,
    )

    rows = sorted(
        adaboost_stumps_trajectory(spark, SF).collect(),
        key=lambda r: r.round,
    )
    assert [r.round for r in rows] == [1, 2, 3]
    for r in rows:
        assert r.feature in {"f1", "f2", "f3"}
        assert r.polarity in {1, -1}
        # the picked stump always beats coin flip on the weighted sample
        assert 0.0 < r.weighted_err <= 0.5
        assert r.alpha >= 0.0  # follows from err <= 0.5
        assert 0.0 <= r.ensemble_err <= 1.0
    # base rate of the purchase class is ~20%: the ensemble must never
    # be worse than majority-vote-negative
    assert rows[-1].ensemble_err <= 0.5


def test_burrows_delta_properties(spark):
    from clinical_data_platform_spark.plans.textops import (
        burrows_delta_sources,
    )

    rows = burrows_delta_sources(spark, SF).collect()
    n_src = (1 + (1 + 8 * len(rows)) ** 0.5) / 2  # inverse of C(n,2)
    assert n_src == int(n_src)  # a complete pair set
    seen = set()
    for r in rows:
        assert r.src_a < r.src_b
        assert (r.src_a, r.src_b) not in seen
        seen.add((r.src_a, r.src_b))
        assert r.delta >= 0.0
    # distances over z-scores of 30 tokens: mean |z| diff is O(1)
    assert max(r.delta for r in rows) < 10.0

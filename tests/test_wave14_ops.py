"""Wave-14 plans: EWMA forecasting, seasonality profile — invariants
beyond the DuckDB value oracle."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_ewma_mae_beats_naive_mean_forecast(spark):
    """The smoother has to earn its keep: per type, one-step-ahead MAE
    should not exceed ~the series' mean absolute deviation (what a
    constant-mean forecast scores); and recompute MAE brute-force."""
    from clinical_data_platform_spark.plans.events import (
        _EWMA_ALPHA,
        _EWMA_LAGS,
        ewma_hourly_forecast,
    )

    got = {r.event_type: r for r in ewma_hourly_forecast(spark, SF).collect()}
    series = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.round(F.avg("value"), 6).alias("x"))
        .orderBy("event_type", "hour")
        .collect()
    )
    by_type: dict[str, list[float]] = {}
    for r in series:
        by_type.setdefault(r.event_type, []).append(r.x)
    for et, xs in by_type.items():
        xs = np.array(xs)
        # brute-force truncated EWMA + one-step-ahead MAE
        errs = []
        for t in range(1, len(xs)):
            lo = max(0, t - 1 - (_EWMA_LAGS - 1))
            window = xs[lo : t][::-1]  # most recent first
            w = (1.0 - _EWMA_ALPHA) ** np.arange(len(window))
            forecast = float((w * window).sum() / w.sum())
            errs.append(abs(xs[t] - forecast))
        r = got[et]
        assert r.n_hours == len(xs) - 1
        assert abs(r.mae - float(np.mean(errs))) < 1e-3
        mad = float(np.mean(np.abs(xs - xs.mean())))
        assert r.mae < 2.0 * mad  # sanity: not wildly worse than naive


def test_seasonality_strength_bounded(spark):
    from clinical_data_platform_spark.plans.events import (
        hourly_seasonality_profile,
    )

    rows = hourly_seasonality_profile(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.var_raw > 0
        assert r.var_deseasonalized >= 0
        assert r.seasonality_strength <= 1.0
        # removing a FITTED seasonal mean can inflate sample variance
        # only through the dof/noise term, never unboundedly
        assert r.seasonality_strength > -1.0


def test_rolling_wau_bounds_and_final_week(spark):
    import pyspark.sql.functions as F

    from clinical_data_platform_spark.plans.sketches import (
        rolling_7day_active_users,
    )

    rows = sorted(
        rolling_7day_active_users(spark, SF).collect(), key=lambda r: r.day
    )
    ev = spark.read.parquet(f"{SF}/events.parquet")
    total_users = ev.select("user_id").distinct().count()
    daily = {
        r.day: r.n
        for r in ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in rows:
        # WAU is at least the day's own DAU and at most the user base
        assert daily[r.day] <= r.wau_exact <= total_users
        # 64-register HLL: generous but real error bound
        assert abs(r.wau_hll - r.wau_exact) / r.wau_exact < 0.5


def test_cross_correlation_bounded_and_symmetric_grid(spark):
    from clinical_data_platform_spark.plans.events import (
        type_cross_correlation,
    )

    rows = {r.lag: r for r in type_cross_correlation(spark, SF).collect()}
    assert set(rows) == set(range(-3, 4))
    for r in rows.values():
        assert -1.0 <= r.correlation <= 1.0
        assert r.n_hours > 0
    # +k and -k enumerate the same (t, t+k) grid pairs, and no lag can
    # pair more hours than lag 0 (the grid may have gaps, so the exact
    # drop per lag is data-dependent)
    n0 = rows[0].n_hours
    for k in (1, 2, 3):
        assert rows[k].n_hours == rows[-k].n_hours <= n0

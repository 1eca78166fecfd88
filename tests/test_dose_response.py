"""M8 dose-response IC50 — contract reconstructed from the reference's
tests/test_ic50.py:1-31 (the implementing package is absent from the
canonical tree; the test is the spec)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from clinical_data_platform_spark.operators.dose_response import (
    IC50Result,
    estimate_ic50,
    fit_ic50_per_group,
)


def _generate_curve(ic50: float, hill: float = 1.3, bottom: float = 0.1, top: float = 0.9):
    """Exactly the reference generator (tests/test_ic50.py:11-16)."""
    doses = np.array([5, 10, 20, 40, 80, 160, 320, 640], dtype=float)
    log_ic50 = math.log10(ic50)
    response = bottom + (top - bottom) / (
        1 + np.exp(hill * (np.log10(doses) - log_ic50))
    )
    return doses, response


def test_estimate_ic50_close_to_truth():
    # reference tests/test_ic50.py:19-23 — within 10% of truth
    doses, response = _generate_curve(50.0)
    result: IC50Result = estimate_ic50(doses, response)
    assert abs(result.ic50 - 50.0) <= 50.0 * 0.1
    # noise-free curves should recover far tighter than the 10% contract
    assert abs(result.ic50 - 50.0) <= 50.0 * 0.01
    assert abs(result.hill - 1.3) < 0.05
    assert abs(result.bottom - 0.1) < 0.01
    assert abs(result.top - 0.9) < 0.01
    assert result.rmse < 1e-4
    assert result.n_points == 8


def test_negative_dose_rejected():
    # reference tests/test_ic50.py:26-31
    with pytest.raises(ValueError, match="Doses must be positive"):
        estimate_ic50([0, 1, 2], [0.1, 0.2, 0.3])


def test_increasing_curve_canonicalized():
    """A rising curve (negative hill in the reference parametrization) is
    canonicalized to hill>0 with top = low-dose asymptote swapped."""
    doses, response = _generate_curve(80.0, hill=-1.1, bottom=0.2, top=0.95)
    r = estimate_ic50(doses, response)
    assert abs(r.ic50 - 80.0) <= 80.0 * 0.05
    assert r.hill > 0
    # canonical top is the response as dose -> 0: here the curve rises
    # from 0.95's complement orientation — generator with hill<0 gives
    # low-dose response = bottom... the identity maps (h,b,t)->(-h,t,b)
    assert abs(r.top - 0.2) < 0.02 and abs(r.bottom - 0.95) < 0.02


def test_noisy_curve_within_contract():
    # With only 8 points, large noise legitimately moves the least-squares
    # optimum itself (sigma=0.01 puts the LS-optimal IC50 20% off truth),
    # so the 10%-recovery contract is asserted at a noise level where the
    # optimum still identifies the curve.
    doses, response = _generate_curve(50.0)
    rng = np.random.default_rng(7)
    noisy = response + rng.normal(0.0, 0.003, size=response.shape)
    r = estimate_ic50(doses, noisy)
    assert abs(r.ic50 - 50.0) <= 50.0 * 0.1


def test_input_validation():
    with pytest.raises(ValueError, match="equal-length"):
        estimate_ic50([1.0, 2.0], [0.1])
    with pytest.raises(ValueError, match="at least 4"):
        estimate_ic50([1.0, 2.0, 4.0], [0.1, 0.2, 0.3])
    with pytest.raises(ValueError, match="finite"):
        estimate_ic50([1.0, 2.0, 4.0, 8.0], [0.1, float("nan"), 0.3, 0.4])


def test_fit_per_group_distributed(spark):
    """30 compounds with distinct truths, fitted via applyInPandas; every
    fit recovers its own curve and one malformed group degrades to
    fit_ok=false instead of failing the stage."""
    import pyspark.sql.functions as F

    doses = [5.0, 10.0, 20.0, 40.0, 80.0, 160.0, 320.0, 640.0]
    cid = F.col("compound_id")
    grid = (
        spark.range(30)
        .withColumnRenamed("id", "compound_id")
        .select(
            "compound_id",
            F.explode(F.array(*[F.lit(d) for d in doses])).alias("dose"),
        )
        .withColumn(
            "response",
            F.lit(0.1)
            + F.lit(0.8)
            / (
                F.lit(1.0)
                + F.exp(
                    (F.lit(0.9) + F.lit(0.05) * cid)
                    * (F.log10("dose") - F.log10(cid * 8.0 + 8.0))
                )
            ),
        )
    )
    # malformed group: only 2 points -> precondition failure, not a crash
    bad = spark.createDataFrame(
        [(999, 1.0, 0.5), (999, 2.0, 0.5)], "compound_id long, dose double, response double"
    )
    fits = fit_ic50_per_group(grid.unionByName(bad), ["compound_id"]).toPandas()
    good = fits[fits.compound_id < 999].sort_values("compound_id").reset_index(drop=True)
    assert len(good) == 30 and bool(good.fit_ok.all())
    truth = 8.0 * (good.compound_id + 1)
    assert (abs(good.ic50 - truth) <= truth * 0.05).all()
    bad_row = fits[fits.compound_id == 999].iloc[0]
    assert not bad_row.fit_ok and math.isnan(bad_row.ic50) and bad_row.n_points == 2


def test_registered_query_matches_oracle(spark, tmp_path):
    """The driver-facing query's ratio columns collapse to the exact
    constants the DuckDB oracle states."""
    import duckdb

    from clinical_data_platform_spark.plans.registry import ORACLES, QUERIES
    from tests.helpers import assert_frames_match

    got = QUERIES["ic50_dose_response_fits"](spark, str(tmp_path)).toPandas()
    want = duckdb.sql(ORACLES["ic50_dose_response_fits"]).df()
    assert_frames_match(got, want, context="ic50_dose_response_fits")

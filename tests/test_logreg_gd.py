"""logreg_gd_trajectory — numpy replication of the descent plus the
monotone-loss invariant."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_gd_trajectory_matches_numpy_and_descends(spark):
    from clinical_data_platform_spark.plans.stats import (
        _GD_ITERS,
        logreg_gd_trajectory,
    )

    rows = sorted(
        logreg_gd_trajectory(spark, SF).collect(), key=lambda r: r.iter
    )
    assert [r.iter for r in rows] == list(range(_GD_ITERS + 1))
    # full-batch GD at this step size must strictly reduce log-loss
    losses = [r.loss for r in rows]
    assert all(a > b for a, b in zip(losses, losses[1:])), losses

    ev = pd.read_parquet(f"{SF}/events.parquet")
    sec = ev.ts.astype("int64") // 1_000_000  # datetime64[us] -> seconds
    X = np.column_stack(
        [
            np.ones(len(ev)),
            ev.value.to_numpy() / 500.0,
            ((sec % 86400) // 3600).to_numpy().astype(float) / 24.0,
        ]
    )
    y = (ev.event_type == "purchase").to_numpy().astype(float)
    n = float(len(ev))
    w = np.zeros(3)
    for r in rows:
        # same rounding schedule as both engines
        assert np.allclose([r.w0, r.w1, r.w2], w, atol=1e-9), r.iter
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        nll = -(y * np.log(p) + (1 - y) * np.log(1 - p)).sum()
        assert abs(np.floor(round(nll, 6) / n * 1e8) / 1e8 - r.loss) < 2e-8
        g = X.T @ (p - y)
        w = np.round(w - 0.5 * np.round(g, 8) / n, 12)

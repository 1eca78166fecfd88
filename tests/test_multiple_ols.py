"""order_price_multiple_ols — numpy lstsq recount: the distributed
normal-equations solve must agree with a dense least-squares fit on the
same features to float precision."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_multiple_ols_matches_numpy(spark):
    from clinical_data_platform_spark.plans.stats import (
        order_price_multiple_ols,
    )

    r = order_price_multiple_ols(spark, SF).collect()[0]

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    f = (
        li.groupby("l_orderkey")
        .agg(x1=("l_quantity", "sum"), x2=("l_quantity", "size"))
        .reset_index()
    )
    d = f.merge(
        orders[["o_orderkey", "o_totalprice"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    y = np.round(d.o_totalprice.to_numpy() * 100)
    X = np.column_stack(
        [np.ones(len(d)), d.x1.to_numpy(), d.x2.to_numpy()]
    )
    beta, _, _, _ = np.linalg.lstsq(X, y, rcond=None)
    pred = X @ beta
    r2 = 1 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()

    assert r.n_orders == len(d)
    assert abs(r.beta0_cents - beta[0]) < 1e-2 * max(1, abs(beta[0]))
    assert abs(r.beta1_cents_per_qty - beta[1]) < 1e-2 * max(1, abs(beta[1]))
    assert abs(r.beta2_cents_per_line - beta[2]) < 1e-2 * max(1, abs(beta[2]))
    assert abs(r.r2 - r2) < 1e-4

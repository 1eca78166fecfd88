"""Wave-47 plans: Kendall tau-b + fixed-effect meta-analysis —
independent Python recounts beyond the DuckDB value oracle."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pandas as pd

SF = "/root/testdata/sf0.001"


def _tau_b_from_cells(cells: dict[tuple[int, int], int]):
    items = list(cells.items())
    conc = disc = 0
    for i, ((xa, ya), ca) in enumerate(items):
        for (xb, yb), cb in items:
            if xa < xb:
                if ya < yb:
                    conc += ca * cb
                elif ya > yb:
                    disc += ca * cb
    n = sum(cells.values())
    tx = Counter()
    ty = Counter()
    for (x, y), c in cells.items():
        tx[x] += c
        ty[y] += c
    n02 = n * (n - 1)
    t_x2 = sum(c * (c - 1) for c in tx.values())
    t_y2 = sum(c * (c - 1) for c in ty.values())
    tau = (conc - disc) * 2.0 / (math.sqrt(n02 - t_x2) * math.sqrt(n02 - t_y2))
    return n, conc, disc, tau


def test_kendall_grid_formula_matches_brute_force():
    """The cell-grid formula equals direct pair counting on a small
    deterministic vector (md5-derived pseudo-random pairs with ties)."""
    pts = []
    for i in range(200):
        h = hashlib.md5(str(i).encode()).hexdigest()
        pts.append((int(h[:2], 16) % 8, int(h[2:4], 16) % 8))
    cells = Counter(pts)
    n, conc, disc, tau = _tau_b_from_cells(cells)
    bc = bd = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx = pts[i][0] - pts[j][0]
            dy = pts[i][1] - pts[j][1]
            if dx * dy > 0:
                bc += 1
            elif dx * dy < 0:
                bd += 1
    assert (conc, disc) == (bc, bd)


def test_kendall_recount(spark):
    from clinical_data_platform_spark.plans.stats import (
        kendall_tau_quantity_price,
    )

    r = kendall_tau_quantity_price(spark, SF).collect()[0]
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"]
    )
    cells = Counter(
        (int(q), math.floor(p / 1000.0))
        for q, p in zip(li.l_quantity, li.l_extendedprice)
    )
    n, conc, disc, tau = _tau_b_from_cells(cells)
    assert (r.n_rows, r.concordant, r.discordant) == (n, conc, disc)
    assert abs(r.tau_b - round(tau, 6)) < 2e-6
    assert -1.0 <= r.tau_b <= 1.0


def test_fixed_effect_meta_recount(spark):
    from clinical_data_platform_spark.plans.stats import fixed_effect_meta

    r = fixed_effect_meta(spark, SF).collect()[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df["t"] = (df.o_orderpriority == "1-URGENT").astype(int)
    df["cents"] = (df.o_totalprice * 100).round().astype("int64")
    sw = swe = 0
    studies = []
    for _, grp in df.groupby("c_nationkey"):
        g1 = grp[grp.t == 1].cents
        g0 = grp[grp.t == 0].cents
        n1, n0 = len(g1), len(g0)
        if n1 < 2 or n0 < 2:
            continue
        s1, s0 = int(g1.sum()), int(g0.sum())
        q1 = int((g1.astype(object) ** 2).sum())
        q0 = int((g0.astype(object) ** 2).sum())
        e = (s1 / n1 - s0 / n0) / 100.0
        var_e = (
            (q1 - s1 * (s1 / n1)) / (n1 - 1) / n1
            + (q0 - s0 * (s0 / n0)) / (n0 - 1) / n0
        ) / 10000.0
        sw += math.floor(1e15 / var_e)
        swe += math.floor(e * 1e9 / var_e)
        studies.append((e, var_e))
    mu = swe * 1e6 / sw
    q = sum(
        math.floor((e - mu) ** 2 * 1e6 / v) for e, v in studies
    ) / 1e6
    se = math.sqrt(1e15 / sw)
    k = len(studies)
    assert r.k_studies == k
    assert abs(r.pooled_effect - round(mu, 6)) < 1e-6
    assert abs(r.se - round(se, 6)) < 1e-6
    assert abs(r.cochran_q - round(q, 6)) < 1e-6
    if q > k - 1:
        assert r.i_squared == math.floor((q - (k - 1)) * 1e6 / q) / 1e6
    else:
        assert r.i_squared == 0.0
    # the fixed-point pool tracks the un-truncated inverse-variance pool
    true_mu = sum(e / v for e, v in studies) / sum(1 / v for e, v in studies)
    # we_fp truncates e/var at 1e-9, so with ~25 studies the pooled
    # effect can drift a few dollars on a five-figure effect (<0.1%)
    assert abs(r.pooled_effect - true_mu) < max(5.0, 1e-3 * abs(true_mu))

"""Wave-21 plans: linear-interpolation gap fill, weighted median —
invariants beyond the DuckDB value oracle."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_interpolation_grid_and_bracketing(spark):
    from clinical_data_platform_spark.plans.events import (
        hourly_linear_interpolation,
    )

    rows = hourly_linear_interpolation(spark, SF).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
        assert r.interpolated is not None
        if r.observed is not None:
            assert r.interpolated == r.observed  # identity on observed
    # full dense grid: same hour count for every type
    sizes = {len(v) for v in by_type.values()}
    assert len(sizes) == 1
    # every interpolated gap value lies within its bracketing neighbors
    for rs in by_type.values():
        rs = sorted(rs, key=lambda r: r.hour_start)
        vals = [r.observed for r in rs]
        interp = [r.interpolated for r in rs]
        for i, v in enumerate(vals):
            if v is not None:
                continue
            prev_obs = next(
                (vals[j] for j in range(i - 1, -1, -1) if vals[j] is not None),
                None,
            )
            next_obs = next(
                (vals[j] for j in range(i + 1, len(vals)) if vals[j] is not None),
                None,
            )
            cands = [c for c in (prev_obs, next_obs) if c is not None]
            assert cands
            # floor-division bias is at most one cent below the band
            assert min(cands) - 0.01 <= interp[i] <= max(cands) + 0.01


def test_weighted_median_recount(spark):
    from clinical_data_platform_spark.plans.relational import (
        quantity_weighted_median_price,
    )

    got = {
        r.l_returnflag: r
        for r in quantity_weighted_median_price(spark, SF).collect()
    }
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    )
    by_flag: dict[str, list] = {}
    for r in li:
        by_flag.setdefault(r.l_returnflag, []).append(
            (r.l_extendedprice, r.l_quantity)
        )
    for flag, pts in by_flag.items():
        pts.sort()
        total = sum(w for _, w in pts)
        cum = 0.0
        wm = None
        for p, w in pts:
            cum += w
            if cum >= total / 2:
                wm = p
                break
        r = got[flag]
        assert abs(r.weighted_median_price - round(wm, 2)) < 1e-9
        assert abs(r.total_quantity - round(total, 2)) < 1e-6
        # the weighted median splits the mass: at least half the weight
        # sits at or below it
        below = sum(w for p, w in pts if p <= wm)
        assert below >= total / 2

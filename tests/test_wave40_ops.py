"""Wave-40 plans: isotonic calibration (PAV via minimax) — independent
sequential pool-adjacent-violators recount beyond the DuckDB value oracle."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _pav(pos: list[int], n: list[int]) -> list[float]:
    """Textbook sequential PAV over weighted bin rates."""
    blocks = [[p, c] for p, c in zip(pos, n)]  # [pos_sum, n_sum]
    out: list[list[int]] = []
    for b in blocks:
        out.append(list(b))
        while len(out) >= 2 and (
            out[-2][0] * out[-1][1] >= out[-1][0] * out[-2][1]
        ):  # rate[-2] >= rate[-1] -> pool (compare as cross products)
            p2, n2 = out.pop()
            out[-1][0] += p2
            out[-1][1] += n2
    fitted = []
    i = 0
    for p, c in out:
        # every original bin inside the pooled block gets the block rate
        consumed = 0
        while consumed < c:
            fitted.append(p / c)
            consumed += n[i]
            i += 1
    return fitted


def test_isotonic_matches_sequential_pav(spark):
    from clinical_data_platform_spark.plans.contentfilter import (
        isotonic_calibration_bins,
    )

    rows = sorted(
        isotonic_calibration_bins(spark, SF).collect(), key=lambda r: r.bin
    )
    assert rows
    # iso_rate is monotone nondecreasing in bin
    iso = [r.iso_rate for r in rows]
    assert iso == sorted(iso)
    # iso averages preserve total mass: sum(iso*n) == sum(pos) (PAV is a
    # projection that conserves the weighted mean) — reconstruct pos from
    # the trunc6'd outcome_rate exactly: pos = round(rate * n)
    pos = [round(r.outcome_rate * r.n_docs) for r in rows]
    n = [r.n_docs for r in rows]
    assert abs(sum(v * c for v, c in zip(iso, n)) - sum(pos)) < 1e-2
    # exact sequential PAV recount
    expect = _pav(pos, n)
    for got, want in zip(iso, expect):
        assert abs(got - round(want, 6)) < 2e-6, (iso, expect)


def test_isotonic_pav_helper_pools_violators():
    """The recount helper itself: a decreasing pair pools to its
    weighted average."""
    assert _pav([9, 1], [10, 10]) == [0.5, 0.5]
    assert _pav([1, 9], [10, 10]) == [0.1, 0.9]

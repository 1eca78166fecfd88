"""Dose-response IC50 estimation (SURVEY §2.8 M8).

Reference contract: ``tests/test_ic50.py:1-31`` — the implementing package
(``cp_tox_mini.dose_response``) is absent from the canonical tree, so the
semantics are reconstructed from its test: ``estimate_ic50(doses,
responses)`` returns a result whose ``.ic50`` recovers the generating
4-parameter logistic curve within 10%, and non-positive doses raise
``ValueError("Doses must be positive")``.

Model (exactly the form the reference test generates):

    response = bottom + (top - bottom) / (1 + exp(hill * (log10(dose) - log10(ic50))))

Fit strategy (NumPy only — scipy is not in this environment): for fixed
``(log10_ic50, hill)`` the model is LINEAR in ``(bottom, top - bottom)``
— ``y = b + a * s`` where ``s = 1/(1+exp(hill*(logd - log_ic50)))`` — so
the two linear parameters come from closed-form least squares, and we
grid-search + coordinate-descend over only the two nonlinear ones.
Deterministic (no RNG, fixed grids), derivative-free, and robust on the
8-point curves the reference fits.

The fit is canonicalized to ``hill > 0`` via the exact reparametrization
identity ``(h, bottom, top) ≡ (-h, top, bottom)`` so ``top`` is always
the low-dose asymptote (matching the reference curve where response
decays from ``top`` to ``bottom`` as dose grows).

Scale path: :func:`fit_ic50_per_group` runs the same fit per curve key via
``groupBy().applyInPandas`` (SURVEY §3 reserved this pattern for M8) —
curve groups hash-partition across executors, each Arrow batch fits its
groups locally, no driver involvement. A 100 TB screening table (billions
of wells, millions of compound×assay curves) is embarrassingly parallel
here: the only shuffle is the groupBy on the curve key, and each group is
a handful of rows.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class IC50Result:
    ic50: float
    hill: float
    bottom: float
    top: float
    rmse: float
    n_points: int


def _linear_fit(s: np.ndarray, y: np.ndarray) -> tuple[float, float]:
    """Closed-form least squares for y ≈ b + a*s."""
    sm = float(s.mean())
    ym = float(y.mean())
    denom = float(((s - sm) ** 2).sum())
    a = 0.0 if denom < 1e-12 else float(((s - sm) * (y - ym)).sum()) / denom
    return ym - a * sm, a


def _sse_at(logd: np.ndarray, y: np.ndarray, log_ic50: float, hill: float):
    s = 1.0 / (1.0 + np.exp(np.clip(hill * (logd - log_ic50), -60.0, 60.0)))
    b, a = _linear_fit(s, y)
    resid = y - (b + a * s)
    return float((resid**2).sum()), b, a


def _nelder_mead(logd, y, l0: float, h0: float, iters: int = 400):
    """Deterministic 2-D Nelder–Mead over (log_ic50, hill); the two linear
    parameters stay profiled out inside ``_sse_at``. Returns
    (sse, l, h, b, a) at the best vertex."""

    def f(p):
        return _sse_at(logd, y, p[0], p[1])[0]

    pts = [
        np.array([l0, h0]),
        np.array([l0 + 0.1, h0]),
        np.array([l0, h0 + 0.2]),
    ]
    vals = [f(p) for p in pts]
    for _ in range(iters):
        order = sorted(range(3), key=lambda i: vals[i])
        pts = [pts[i] for i in order]
        vals = [vals[i] for i in order]
        if vals[2] - vals[0] < 1e-16 and np.abs(pts[2] - pts[0]).max() < 1e-9:
            break
        centroid = (pts[0] + pts[1]) / 2.0
        xr = centroid + (centroid - pts[2])  # reflect
        fr = f(xr)
        if fr < vals[0]:
            xe = centroid + 2.0 * (centroid - pts[2])  # expand
            fe = f(xe)
            pts[2], vals[2] = (xe, fe) if fe < fr else (xr, fr)
        elif fr < vals[1]:
            pts[2], vals[2] = xr, fr
        else:
            xc = centroid + 0.5 * (pts[2] - centroid)  # contract
            fc = f(xc)
            if fc < vals[2]:
                pts[2], vals[2] = xc, fc
            else:  # shrink toward best
                for i in (1, 2):
                    pts[i] = pts[0] + 0.5 * (pts[i] - pts[0])
                    vals[i] = f(pts[i])
    i = int(np.argmin(vals))
    l_, h = float(pts[i][0]), float(pts[i][1])
    sse, b, a = _sse_at(logd, y, l_, h)
    return sse, l_, h, b, a


def estimate_ic50(doses, responses) -> IC50Result:
    """Fit the 4-parameter logistic and return the dose giving the
    half-way response. Raises ValueError on non-positive doses (reference
    tests/test_ic50.py:25-31)."""
    d = np.asarray(doses, dtype=float)
    y = np.asarray(responses, dtype=float)
    if d.ndim != 1 or d.size != y.size or d.size == 0:
        raise ValueError("Doses and responses must be equal-length 1-D arrays")
    if not np.all(np.isfinite(d)) or np.any(d <= 0):
        raise ValueError("Doses must be positive")
    if not np.all(np.isfinite(y)):
        raise ValueError("Responses must be finite")
    if d.size < 4:
        raise ValueError("Need at least 4 dose points for a 4-parameter fit")

    logd = np.log10(d)
    lo, hi = float(logd.min()), float(logd.max())
    # Coarse deterministic grid: IC50 within half a decade of the tested
    # range, Hill slopes 0.2..4 both directions.
    grid_l = np.linspace(lo - 0.5, hi + 0.5, 61)
    grid_h = np.concatenate([np.linspace(0.2, 4.0, 20), -np.linspace(0.2, 4.0, 20)])
    best_sse, best_l, best_h, best_b, best_a = math.inf, 0.0, 1.0, 0.0, 0.0
    for h in grid_h:
        for l_ in grid_l:
            sse, b, a = _sse_at(logd, y, float(l_), float(h))
            if sse < best_sse:
                best_sse, best_l, best_h, best_b, best_a = sse, float(l_), float(h), b, a

    # Nelder–Mead on (log_ic50, hill) from the best grid vertex —
    # deterministic, and unlike coordinate descent it follows the strongly
    # correlated (l, h) valley that edge-of-range curves produce.
    sse, l_, h, b, a = _nelder_mead(logd, y, best_l, best_h)

    bottom, top = b, b + a
    if h < 0:  # canonicalize: (h, bottom, top) ≡ (-h, top, bottom)
        h, bottom, top = -h, top, bottom
    return IC50Result(
        ic50=10.0**l_,
        hill=h,
        bottom=bottom,
        top=top,
        rmse=math.sqrt(sse / d.size),
        n_points=int(d.size),
    )


_FIT_FIELDS = (
    "ic50 double, hill double, bottom double, top double, "
    "rmse double, n_points int, fit_ok boolean"
)


def fit_ic50_per_group(df, group_cols, dose_col="dose", response_col="response"):
    """Distributed per-curve IC50 fitting: one 4PL fit per distinct
    ``group_cols`` key via ``groupBy().applyInPandas``.

    Groups that violate the fit preconditions (too few points, flat or
    non-positive doses) come back with ``fit_ok = false`` and NULL
    parameters rather than failing the job — at 100 TB some plates are
    always malformed, and one bad curve must not kill the stage.
    """
    import pandas as pd

    group_cols = list(group_cols)
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*group_cols).schema.fields
    )
    out_schema = f"{key_schema}, {_FIT_FIELDS}"

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        row = {c: pdf[c].iloc[0] for c in group_cols}
        try:
            r = estimate_ic50(pdf[dose_col].to_numpy(), pdf[response_col].to_numpy())
            row.update(
                ic50=r.ic50, hill=r.hill, bottom=r.bottom, top=r.top,
                rmse=r.rmse, n_points=r.n_points, fit_ok=True,
            )
        except ValueError:
            row.update(
                ic50=None, hill=None, bottom=None, top=None,
                rmse=None, n_points=int(len(pdf)), fit_ok=False,
            )
        return pd.DataFrame([row])

    return df.groupBy(*group_cols).applyInPandas(_fit, schema=out_schema)

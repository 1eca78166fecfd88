"""Scalar expression helpers.

Includes a closed-form erf approximation: Spark has no builtin erf and the
reference's stats (analytics/stats_utils.py:19-23,39-40) need the normal
CDF. We use Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7), expressed as
a plain Column so the SAME formula can be written in the DuckDB oracle —
p-values are compared after rounding to 6 decimals, well inside the
approximation error budget.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# A&S 7.1.26 coefficients
_A1, _A2, _A3, _A4, _A5 = (
    0.254829592,
    -0.284496736,
    1.421413741,
    -1.453152027,
    1.061405429,
)
_P = 0.3275911

# SQL rendering of the same polynomial, for oracle strings.
ERF_SQL = (
    "(1.0 - (((((1.061405429 * (1.0/(1.0+0.3275911*abs({x})))"
    " - 1.453152027) * (1.0/(1.0+0.3275911*abs({x})))"
    " + 1.421413741) * (1.0/(1.0+0.3275911*abs({x})))"
    " - 0.284496736) * (1.0/(1.0+0.3275911*abs({x})))"
    " + 0.254829592) * (1.0/(1.0+0.3275911*abs({x})))"
    " * exp(-({x})*({x}))))"
)


def erf_approx(x: Column) -> Column:
    """erf(|x|) via A&S 7.1.26 (positive argument; callers handle sign)."""
    ax = F.abs(x)
    t = 1.0 / (1.0 + _P * ax)
    poly = ((((_A5 * t + _A4) * t + _A3) * t + _A2) * t + _A1) * t
    return 1.0 - poly * F.exp(-ax * ax)


def normal_sf(z: Column) -> Column:
    """Two-sided survival p = P(|Z| > |z|) = 1 - erf(|z|/sqrt(2))."""
    return 1.0 - erf_approx(z / F.lit(2.0) ** F.lit(0.5))


NORMAL_SF_SQL = "(1.0 - " + ERF_SQL.format(x="(({z})/sqrt(2.0))") + ")"


def normal_upper_sf(z: Column) -> Column:
    """Strict upper tail P(Z > z) = erfc(z/sqrt(2))/2. The erf
    approximation is |z|-based, so the negative branch is reflected:
    for z < 0 the upper tail is 1 - erfc(|z|/sqrt(2))/2. Use this for
    inherently one-sided statistics (F, chi-square via Wilson-Hilferty);
    normal_sf stays the two-sided convention for symmetric tests."""
    sf = normal_sf(z)
    return F.when(z >= F.lit(0.0), 0.5 * sf).otherwise(1.0 - 0.5 * sf)


NORMAL_UPPER_SF_SQL = (
    "(CASE WHEN ({z}) >= 0.0 THEN 0.5 * "
    + NORMAL_SF_SQL
    + " ELSE 1.0 - 0.5 * "
    + NORMAL_SF_SQL
    + " END)"
)


def logistic(z: Column) -> Column:
    """Sigmoid 1/(1+e^-z) (closed-form risk scorer, api/main.py:176-179)."""
    return 1.0 / (1.0 + F.exp(-z))


def surrogate_key(*cols: Column | str, null_token: str = "_null_") -> Column:
    """Deterministic md5 surrogate key over coalesced string parts —
    dbt_utils.generate_surrogate_key semantics
    (fact_subject_outcomes.sql:19). Scale-safe: no global window."""
    parts = [
        F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"),
                   F.lit(null_token))
        for c in cols
    ]
    return F.md5(F.concat_ws("-", *parts))


def _spread_bits_31(x: Column) -> Column:
    """Spread the low 31 bits of x so bit i lands at position 2i
    (interleave-by-binary-magic-numbers, 5 mask steps — a fixed-depth
    JVM expression tree, fully codegen'd; no UDF, no loop at runtime).
    31 bits per dimension keeps the interleaved key below 2^62: a 32nd
    bit would reach the sign bit of the long and invert the sort order
    right where clustering needs it monotonic."""
    x = x.bitwiseAND(F.lit(0x7FFFFFFF))
    for shift, mask in (
        (16, 0x0000FFFF0000FFFF),
        (8, 0x00FF00FF00FF00FF),
        (4, 0x0F0F0F0F0F0F0F0F),
        (2, 0x3333333333333333),
        (1, 0x5555555555555555),
    ):
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def zorder_key(a: Column, b: Column) -> Column:
    """62-bit Morton (Z-order) key interleaving two 31-bit dimensions:
    bit i of ``a`` -> bit 2i, bit i of ``b`` -> bit 2i+1. Rows sorted by
    this key cluster in BOTH dimensions simultaneously, so parquet
    row-group min/max statistics can skip on either column — the
    clustering lever behind OPTIMIZE ... ZORDER, as a pure column
    expression usable with sortWithinPartitions before any write
    (sources/maintenance.py::compact_dataset sort_cols)."""
    return _spread_bits_31(a.cast("long")).bitwiseOR(
        F.shiftleft(_spread_bits_31(b.cast("long")), 1)
    )

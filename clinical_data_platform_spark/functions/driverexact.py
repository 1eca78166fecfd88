"""Bit-exact driver-side replicas of the Spark SQL scalar semantics the
size-gated driver solvers use (r9 optimization round).

The tiny-state iterative queries (EM linkage, Bradley-Terry MM, Markov
squarings, ...) were deliberately written "order-free": every per-round
quantity is either an exact integer (fixed-point ``floor(x * 1e9)``
int64 sums, decimal(38,0) products) or a scalar double re-synced through
``round(x, 12)`` — so float summation order can never fork the
trajectory. That same property makes the loop exactly replayable on the
driver once the bounded state (a handful of rows) is collected: each
Spark expression below has a bit-identical Python counterpart.

- ``jround`` replicates Spark's ``round(double, s)``:
  ``BigDecimal.valueOf(x).setScale(s, HALF_UP).doubleValue()``.
  ``BigDecimal.valueOf`` goes through ``Double.toString`` — the shortest
  decimal that round-trips — which CPython's ``repr()`` also produces,
  so ``Decimal(repr(x))`` is the same decimal number and HALF_UP
  quantization reproduces Spark's result. (Where the two shortest-repr
  algorithms could in principle emit different-length decimals, the two
  candidates differ by far less than the distance to a .5 rounding
  boundary unless the double itself sits on a knife edge the ORACLE
  comparison would already be fragile at; the oracle gate at three SFs
  is the empirical check.)
- ``jfloor_long`` replicates ``floor(double)`` (Math.floor + (long)
  conversion, where ``(long) NaN == 0`` and infinities clamp).
- Plain ``/``, ``*``, ``+`` on Python floats are the same IEEE-754
  binary64 operations Spark's codegen runs, and Python ints are exact
  like decimal(38,0), so no replicas are needed for those.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

_LONG_MAX = 9223372036854775807
_LONG_MIN = -9223372036854775808


def jround(x: float | None, scale: int) -> float | None:
    """Spark ``round(double, scale)`` (HALF_UP over the shortest repr)."""
    if x is None:
        return None
    x = float(x)
    if math.isnan(x) or math.isinf(x):
        return x
    q = Decimal(repr(x)).quantize(
        Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP
    )
    return float(q)


def jdiv(a: float, b: float) -> float:
    """IEEE double division with Java semantics for zero denominators
    (0/0 -> NaN, x/0 -> signed infinity) — CPython raises instead."""
    a, b = float(a), float(b)
    if b == 0.0:
        if a == 0.0 or math.isnan(a):
            return math.nan
        return math.inf if (a > 0) == (math.copysign(1.0, b) > 0) else -math.inf
    return a / b


def jfloor_long(x: float | None) -> int | None:
    """Spark ``floor(double)`` -> BIGINT (Java (long) conversion rules
    for NaN/inf)."""
    if x is None:
        return None
    x = float(x)
    if math.isnan(x):
        return 0
    if math.isinf(x):
        return _LONG_MAX if x > 0 else _LONG_MIN
    return math.floor(x)

"""Declarative Bloom filter — built and probed entirely with DataFrame
algebra (no UDF, no driver-side sketch object).

Spark's internal ``BloomFilterAggregate`` is not exposed as a SQL
function, and ``df.stat.bloomFilter`` materializes a driver-side object
that only a Python UDF could probe. Neither is needed: a Bloom filter is
just a bitmap, and a bitmap is a ``map<word, bits>``:

- BUILD: explode each key's k hash positions (seeded xxhash64 mod m),
  group by 64-bit word index with ``bit_or`` (partial/final — the
  exchange carries at most m/64 rows), and fold the words into ONE
  map-typed row with ``map_from_entries(collect_list(...))``.
- PROBE: broadcast that single row; membership is k ``element_at`` map
  lookups + bitwise AND, a pure codegen'd expression per probe row.

At 100 TB: the corpus side collapses to a sketch of m/64 longs (m = 2^20
bits -> 16k map entries, ~256 KB) — bytes on the wire are the sketch,
never the corpus. No false negatives, so "not in filter" decisions are
exact; the false-positive sliver is re-verified by whatever exact join
follows (see plans/textops.py::incremental_dedup_new_docs).
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

DEFAULT_M_BITS = 1 << 18  # 256k bits = 4k map entries
DEFAULT_K = 5


def _positions(value: Column, m_bits: int, k: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(value, F.lit(seed)), F.lit(m_bits))
        for seed in range(k)
    ]


def build_bloom(
    df: DataFrame,
    value: Column,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Single-row DataFrame with column ``bloom: map<long, long>`` — the
    packed bitmap of ``value`` over all rows of ``df``."""
    pos = df.select(
        F.explode(F.array(*_positions(value, m_bits, k))).alias("pos")
    )
    words = pos.select(
        (F.col("pos") / 64).cast("long").alias("word"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
        ).alias("bit"),
    )
    packed = words.groupBy("word").agg(F.expr("bit_or(bit)").alias("bits"))
    return packed.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word", "bits"))
        ).alias("bloom")
    )


def might_contain(
    bloom: Column,
    value: Column,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> Column:
    """True if ``value`` MAY be in the set (false positives possible),
    false only if it is DEFINITELY absent. Pure expression — k map
    lookups and bit tests."""
    checks = [
        (
            F.coalesce(
                F.element_at(bloom, (p / 64).cast("long")), F.lit(0).cast("long")
            ).bitwiseAND(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
                )
            )
            != 0
        )
        for p in _positions(value, m_bits, k)
    ]
    return reduce(lambda a, b: a & b, checks)

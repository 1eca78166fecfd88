"""Spatial plans — the grid-bucketed spatial join, expressed in EXACT
integer geometry.

Spark has no native spatial join; a raw distance predicate compiles to
a cartesian product (the same failure mode operators/rangejoin.py fixes
for time intervals). The standard fix — used by every distributed geo
engine (Sedona, GeoMesa): discretize space into grid cells sized >= the
search radius, equi-join each point against its own and adjacent cells,
then refine with the exact distance predicate. Candidates per point are
bounded by local density, never by corpus size.

Exactness across engines is usually the hard part of spatial SQL
(haversine trig ulps flip boundary memberships). Here the geometry is
integer end-to-end: coordinates are 20-bit md5-derived integers on a
2^20 grid, the radius is a power of two, and the refine predicate
dx^2 + dy^2 <= R^2 is exact int64 arithmetic — no float enters the
plan, so the DuckDB oracle matches bit-for-bit by construction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table as T
from .registry import query

_R = 1 << 13  # search radius (8192 on the 2^20 grid)
_CELL_SHIFT = 14  # cell width 2^14 >= R, so adjacent cells are lossless

_HEX5_SQL = (
    "list_sum(list_transform(range(1, 6), k ->"
    " (strpos('0123456789abcdef', substr(md5({x}), k, 1)) - 1)"
    " * (1 << (4 * (5 - k)))))"
)


@query(
    "spatial_grid_neighbor_pairs",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS id,
             {_HEX5_SQL.format(x="'x' || cast(c_custkey AS VARCHAR)")} AS x,
             {_HEX5_SQL.format(x="'y' || cast(c_custkey AS VARCHAR)")} AS y
      FROM customer
    )
    SELECT a.id AS id_a, b.id AS id_b,
           cast((a.x - b.x) * (a.x - b.x)
                + (a.y - b.y) * (a.y - b.y) AS BIGINT) AS dist_sq
    FROM pts a JOIN pts b ON a.id < b.id
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          <= {_R} * {_R}
    """,
    tags=["spatial", "grid-join", "extension"],
)
def spatial_grid_neighbor_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All point pairs within radius 8192 on the 2^20 integer grid
    (customers mapped to deterministic md5 coordinates): the
    grid-bucketed spatial join. Each point lands in a 2^14-wide cell
    and is equi-joined against its own and 8 adjacent cells (one side
    exploded to the 3x3 neighborhood), then the EXACT integer predicate
    dx^2 + dy^2 <= R^2 refines candidates. Cell width >= radius makes
    the candidate set provably lossless; the ORACLE runs the exhaustive
    quadratic join, so the green row value-proves the pruning drops
    nothing.

    At 100 TB: one shuffle on the cell key; per-cell candidate work is
    bounded by local density x 9. Skewed hotspots get the same salting
    treatment as any hot join key. This is operators/rangejoin.py's
    pattern lifted from 1-D time to 2-D space."""
    h5 = lambda c: F.conv(  # noqa: E731
        F.substring(F.md5(c), 1, 5), 16, 10
    ).cast("long")
    pts = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        h5(F.concat(F.lit("x"), F.col("c_custkey").cast("string"))).alias("x"),
        h5(F.concat(F.lit("y"), F.col("c_custkey").cast("string"))).alias("y"),
    ).localCheckpoint()
    a = pts.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(
            F.array(*[F.lit(i) for i in (-1, 0, 1)])
        ).alias("dcx"),
    ).select(
        "id_a",
        "xa",
        "ya",
        ((F.shiftright("xa", _CELL_SHIFT)) + F.col("dcx")).alias("cx"),
        F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias("dcy"),
    ).select(
        "id_a",
        "xa",
        "ya",
        "cx",
        ((F.shiftright("ya", _CELL_SHIFT)) + F.col("dcy")).alias("cy"),
    )
    b = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.shiftright("x", _CELL_SHIFT).alias("bx"),
        F.shiftright("y", _CELL_SHIFT).alias("by"),
    )
    dist_sq = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        a.join(
            b,
            (F.col("cx") == F.col("bx"))
            & (F.col("cy") == F.col("by"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .filter(dist_sq <= _R * _R)
        .select("id_a", "id_b", dist_sq.cast("long").alias("dist_sq"))
    )

"""Query registry.

``@query("name", oracle="SELECT ...")`` registers a builder callable
``(spark, sf_dir) -> DataFrame`` and its DuckDB oracle SQL. Queries without
an oracle (streaming, ML, approximate algorithms) get a weaker rows-only
check from the driver — keep those to genuinely non-SQL-expressible ops.

Parity rules enforced by convention here (see SURVEY.md §7.4):
- alias every computed column identically in Spark and SQL;
- round floating aggregates in BOTH engines (sum-order nondeterminism);
- cast integer sums to BIGINT in DuckDB (its SUM(int) returns HUGEINT);
- impose deterministic ORDER BY inside any window function;
- never call now()/current_timestamp in a compared query.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
TAGS: dict[str, list[str]] = {}


def query(name: str, oracle: str | None = None, tags: list[str] | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        TAGS[name] = tags or []
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(ORACLES)


def describe() -> list[dict[str, Any]]:
    return [
        {"name": n, "has_oracle": n in ORACLES, "tags": TAGS.get(n, [])}
        for n in QUERIES
    ]

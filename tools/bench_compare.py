"""Spark vs DuckDB head-to-head on every oracled query.

The reference's executor IS DuckDB, so this is the literal
"matches-or-beats the reference's single-node throughput" measurement
(BASELINE.md): run each driver query on Spark (noop sink) and its oracle
SQL on DuckDB (materialized fetch) at the same scale factor.

Usage: python tools/bench_compare.py [sf_dir] -> one JSON line + table.
"""

from __future__ import annotations

import json
import sys
import time

import duckdb

sys.path.insert(0, ".")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import __spark_entry__ as E
    from clinical_data_platform_spark.catalog import TABLES
    from clinical_data_platform_spark.session import get_spark

    spark = get_spark("bench-compare")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    # warmup both engines
    qs["event_type_counts"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    con.execute(oracles["event_type_counts"]).fetchall()

    rows = []
    for name, sql in oracles.items():
        if name.startswith("stream_"):
            continue  # streaming runtime isn't comparable to a SQL fetch
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        t_spark = time.time() - t0
        t0 = time.time()
        con.execute(sql).fetchall()
        t_duck = time.time() - t0
        rows.append((name, round(t_spark, 3), round(t_duck, 3)))

    total_s = round(sum(r[1] for r in rows), 2)
    total_d = round(sum(r[2] for r in rows), 2)
    wins = sum(1 for r in rows if r[1] <= r[2])
    print(f"{'query':40s} {'spark_s':>8s} {'duckdb_s':>9s}")
    for name, s, d in sorted(rows, key=lambda r: r[1] - r[2]):
        print(f"{name:40s} {s:8.3f} {d:9.3f}")
    print(
        json.dumps(
            {
                "metric": "spark-vs-duckdb per-query wall-clock",
                "sf_dir": sf_dir,
                "n_queries": len(rows),
                "spark_total_s": total_s,
                "duckdb_total_s": total_d,
                "spark_wins": wins,
                "queries": {r[0]: {"spark": r[1], "duckdb": r[2]} for r in rows},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

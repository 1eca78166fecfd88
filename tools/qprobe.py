"""Per-query optimization probe (r9): isolated timing + job counts.

Usage: python tools/qprobe.py [--sf DIR] [--n N] name [name ...]

For each named registered query: runs it N times (noop sink, warm JVM,
one warmup pass of event_type_counts first), records per-run wall
seconds, min, and the number of Spark jobs the query submits (via a
per-query job group) — the job count is the direct measure of the
driver/scheduling floor the optimization guide's §7.3 talks about.
Prints one JSON line per query and a compact summary map at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--n", type=int, default=2)
    args = ap.parse_args()

    from clinical_data_platform_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark("qprobe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    # warm the JVM / codegen / parquet footer caches
    qs["event_type_counts"](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()

    sc = spark.sparkContext
    st = sc.statusTracker()
    out: dict[str, dict] = {}
    for name in args.names:
        if name not in qs:
            print(json.dumps({"name": name, "error": "unknown"}), flush=True)
            continue
        runs = []
        njobs = nstages = 0
        for i in range(args.n):
            group = f"qprobe-{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            sc.setJobGroup(None, None)
            runs.append(round(dt, 3))
            jids = st.getJobIdsForGroup(group)
            njobs = len(jids)
            nstages = sum(
                len(st.getJobInfo(j).stageIds)
                for j in jids
                if st.getJobInfo(j) is not None
            )
        rec = {
            "runs": runs,
            "min": min(runs),
            "jobs": njobs,
            "stages": nstages,
        }
        out[name] = rec
        print(json.dumps({"name": name, **rec}), flush=True)
    print(
        json.dumps({n: {"min": r["min"], "jobs": r["jobs"]} for n, r in out.items()}),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()

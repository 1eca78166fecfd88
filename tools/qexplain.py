"""Dump .explain("formatted") for named queries into a directory.

Usage: python tools/qexplain.py --out plans/r09 --suffix _before name [...]
       python tools/qexplain.py --out plans/r09 --suffix _before --all

Used by the r9 optimization round to commit before/after physical plans
(the judge checks plan-shape claims against these files).

``--full``: queries segmented by ``localCheckpoint`` explain only their
LAST segment (the checkpoint materializes upstream work and replaces it
with a Scan ExistingRDD), which hides any upstream plan change. With
--full, DataFrame.localCheckpoint is replaced by identity during plan
construction so the dump shows the whole computation end-to-end. The
dumped plan is a CAPTURE ARTIFACT (the real query still checkpoints);
driver-side collects during plan construction still execute.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()

    from clinical_data_platform_spark.session import get_spark

    import __spark_entry__ as E

    if args.full:
        # patch the CONCRETE class (pyspark.sql.DataFrame is the abstract
        # base in Spark 4; the session hands out classic.dataframe's
        # subclass, whose override would win over a base-class patch)
        from pyspark.sql.classic.dataframe import DataFrame

        DataFrame.localCheckpoint = (  # type: ignore[method-assign]
            lambda self, eager=True: self
        )

    spark = get_spark("qexplain")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    names = list(qs) if args.all else args.names
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        if name not in qs:
            print(f"skip unknown {name}", file=sys.stderr)
            continue
        df = qs[name](spark, args.sf)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(args.out, f"{name}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Preloading PySpark worker daemon (r6 verdict item 5 — the serial
Python-pool floor).

Every Arrow-path stage (GEMM dedup, image codecs, BLAS ANN) pays numpy +
pandas + pyarrow import inside EACH forked worker the first time that
worker runs a task: measured ~5 s of the ~6.8 s first-Python-stage cost
at local[32] (subsequent stages ~1.6-2.2 s — worker reuse already
amortizes the rest). The imports are identical in every worker, so the
right place to pay them is ONCE, in the daemon process, BEFORE it forks:
children inherit the loaded modules through copy-on-write and the
per-worker import cost disappears.

Wired via ``spark.python.daemon.module`` (a public Spark conf, see
org.apache.spark.internal.config.Python); session.get_spark sets it when
the package is importable by the worker python. The fork loop itself is
100% stock — this module only front-loads imports and then delegates to
``pyspark.daemon.manager``.
"""

from __future__ import annotations

# Heavy imports first — these are the whole point. Failures fall through
# to the worker's own import (same behavior as the stock daemon), so a
# stripped environment degrades to baseline instead of breaking.
try:  # pragma: no cover - trivial import guards
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401
    import pyarrow.pandas_compat  # noqa: F401  (lazy-loaded otherwise)
except Exception:  # noqa: BLE001
    pass

try:  # serializer stack used by every Arrow UDF worker
    import pyspark.sql.pandas.serializers  # noqa: F401
    import pyspark.worker  # noqa: F401
except Exception:  # noqa: BLE001
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()

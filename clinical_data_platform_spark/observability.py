"""Observability: per-query execution metrics, a Prometheus-style latency
histogram, and a streaming progress listener.

Parity targets in the reference: api/telemetry.py:27-31 (REQUEST_DURATION
histogram, 14 buckets 5ms..10s), observability/freshness_sli.json (SLI
artifact shape — the freshness SLI itself lives in the validation layer),
and the Prometheus middleware counters. Here the instrumented unit is a
QUERY rather than an HTTP request: metrics come from the executed plan's
own SQLMetrics (rows/bytes/files at every scan, shuffle bytes at every
exchange), so the numbers are what Spark actually did, not wrapper-side
guesses.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

# the reference's REQUEST_DURATION bucket ladder (api/telemetry.py:27-31)
LATENCY_BUCKETS_S = [
    0.005, 0.01, 0.025, 0.05, 0.075, 0.1, 0.25, 0.5,
    0.75, 1.0, 2.5, 5.0, 7.5, 10.0,
]


@dataclass
class QueryMetrics:
    name: str
    wall_s: float
    output_rows: int
    scan_rows: int
    scan_bytes: int
    shuffle_bytes: int

    def to_json(self) -> str:
        return json.dumps(self.__dict__)


def _sum_metric(plan, keys: tuple[str, ...], leaf_only: bool = False) -> int:
    """Walk the executed SparkPlan (through AQE wrappers: an
    AdaptiveSparkPlanExec holds its final plan behind executedPlan(), and
    each *QueryStageExec holds its stage behind plan()) and sum the named
    internal SQLMetrics. ``leaf_only`` restricts to scan nodes so e.g.
    'rows read from files' is not conflated with every operator's output."""
    name = plan.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        return _sum_metric(plan.executedPlan(), keys, leaf_only)
    if name.endswith("QueryStageExec"):
        return _sum_metric(plan.plan(), keys, leaf_only)
    total = 0
    if not leaf_only or name == "FileSourceScanExec":
        it = plan.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() in keys:
                total += kv._2().value()
    ch = plan.children().iterator()
    while ch.hasNext():
        total += _sum_metric(ch.next(), keys, leaf_only)
    return total


def run_with_metrics(df: DataFrame, name: str = "query") -> QueryMetrics:
    """Execute the DataFrame's OWN QueryExecution (an RDD count on the
    executed plan — JVM-side, nothing shipped to the driver) and read the
    SQLMetrics the run left behind. A df.write(...) would not work here:
    writes plan a fresh QueryExecution, so the metrics would stay zero on
    the DataFrame being instrumented."""
    plan = df._jdf.queryExecution().executedPlan()
    t0 = time.time()
    plan.execute().count()
    wall = time.time() - t0
    return QueryMetrics(
        name=name,
        wall_s=round(wall, 4),
        output_rows=_sum_metric(plan, ("numOutputRows",)),
        scan_rows=_sum_metric(plan, ("numOutputRows",), leaf_only=True),
        scan_bytes=_sum_metric(plan, ("filesSize",)),
        shuffle_bytes=_sum_metric(plan, ("shuffleBytesWritten",)),
    )


@dataclass
class LatencyHistogram:
    """Prometheus-text histogram with the reference's bucket ladder."""

    name: str = "query_duration_seconds"
    counts: list[int] = field(default_factory=lambda: [0] * (len(LATENCY_BUCKETS_S) + 1))
    total: float = 0.0
    n: int = 0

    def observe(self, seconds: float) -> None:
        self.n += 1
        self.total += seconds
        for i, b in enumerate(LATENCY_BUCKETS_S):
            if seconds <= b:
                self.counts[i] += 1
                return
        self.counts[-1] += 1

    def to_prometheus(self) -> str:
        lines = [f"# TYPE {self.name} histogram"]
        cum = 0
        for b, c in zip(LATENCY_BUCKETS_S, self.counts):
            cum += c
            lines.append(f'{self.name}_bucket{{le="{b}"}} {cum}')
        cum += self.counts[-1]
        lines.append(f'{self.name}_bucket{{le="+Inf"}} {cum}')
        lines.append(f"{self.name}_sum {round(self.total, 6)}")
        lines.append(f"{self.name}_count {self.n}")
        return "\n".join(lines)


def make_streaming_listener(events: list):
    """A StreamingQueryListener that appends (event_kind, rows) tuples to
    ``events`` — progress rows come from Spark's own query progress, the
    streaming analogue of SQLMetrics."""
    from pyspark.sql.streaming import StreamingQueryListener

    class _L(StreamingQueryListener):
        def onQueryStarted(self, e):
            events.append(("started", 0))

        def onQueryProgress(self, e):
            events.append(("progress", int(e.progress.numInputRows)))

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            events.append(("terminated", 0))

    return _L()

"""Query metrics from executed-plan SQLMetrics, histogram formatting, and
the streaming progress listener."""

from __future__ import annotations

import time

import pyspark.sql.functions as F

from clinical_data_platform_spark.catalog import table as T
from clinical_data_platform_spark.observability import (
    LatencyHistogram,
    make_streaming_listener,
    run_with_metrics,
)

SF = "/root/testdata/sf0.001"


def test_run_with_metrics_reads_plan_sqlmetrics(spark):
    df = (
        T(spark, SF, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = run_with_metrics(df, name="orders_by_status")
    assert m.wall_s > 0
    n_orders = T(spark, SF, "orders").count()
    # the scan alone read every order row; totals accumulate further
    assert m.scan_rows >= n_orders
    assert m.output_rows >= m.scan_rows
    assert m.scan_bytes > 0
    assert m.shuffle_bytes > 0  # the groupBy exchange
    assert '"name": "orders_by_status"' in m.to_json()


def test_latency_histogram_matches_reference_ladder(spark):
    h = LatencyHistogram()
    for s in (0.004, 0.02, 0.3, 42.0):
        h.observe(s)
    text = h.to_prometheus()
    assert 'le="0.005"} 1' in text
    assert 'le="0.025"} 2' in text
    assert 'le="0.5"} 3' in text
    assert 'le="+Inf"} 4' in text
    assert "query_duration_seconds_count 4" in text
    # 14 finite buckets, same ladder as the reference's REQUEST_DURATION
    assert text.count("_bucket") == 15


def test_streaming_listener_sees_progress(spark):
    from clinical_data_platform_spark.streaming.events_stream import hourly_counts

    events: list = []
    listener = make_streaming_listener(events)
    spark.streams.addListener(listener)
    try:
        hourly_counts(spark, SF)
        # listener callbacks are async; give the bus a moment
        deadline = time.time() + 15
        while time.time() < deadline:
            if any(k == "progress" and n > 0 for k, n in events):
                break
            time.sleep(0.25)
        assert any(k == "started" for k, n in events)
        assert any(k == "progress" and n > 0 for k, n in events), events
    finally:
        spark.streams.removeListener(listener)

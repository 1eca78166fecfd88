"""Wave-18 plans: Benford audit, mean-shift changepoints — invariants
beyond the DuckDB value oracle."""

from __future__ import annotations

import math

SF = "/root/testdata/sf0.001"


def test_benford_frequencies_partition_and_expected_constants(spark):
    from clinical_data_platform_spark.plans.stats import (
        benford_first_digit_audit,
    )

    rows = {r.digit: r for r in benford_first_digit_audit(spark, SF).collect()}
    assert set(rows) <= {str(d) for d in range(1, 10)}
    total_freq = sum(r.observed_freq for r in rows.values())
    assert abs(total_freq - 1.0) < 1e-4  # trunc6 per digit
    for d, r in rows.items():
        expected = math.log10(1 + 1 / int(d))
        assert abs(r.benford_freq - expected) < 1e-6
        assert abs(
            r.abs_deviation - abs(r.n / sum(x.n for x in rows.values()) - expected)
        ) < 1e-4
    # uniform values are NOT Benford-distributed: the audit must show a
    # real deviation (bounded loosely — sf0.001 is a small sample)
    assert max(r.abs_deviation for r in rows.values()) > 0.01


def test_changepoints_scores_and_window_hygiene(spark):
    import pyspark.sql.functions as F

    from clinical_data_platform_spark.plans.events import (
        mean_shift_changepoints,
    )

    rows = mean_shift_changepoints(spark, SF).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
        assert r.shift_score >= 0
    ev = spark.read.parquet(f"{SF}/events.parquet")
    hours = {
        r.event_type: (r.mn, r.mx)
        for r in ev.groupBy("event_type")
        .agg(
            F.min(F.date_trunc("hour", "ts")).alias("mn"),
            F.max(F.date_trunc("hour", "ts")).alias("mx"),
        )
        .collect()
    }
    for et, rs in by_type.items():
        assert 1 <= len(rs) <= 3
        scores = sorted((r.shift_score for r in rs), reverse=True)
        assert scores == [r.shift_score for r in sorted(rs, key=lambda r: (-r.shift_score, r.hour))]
        mn, mx = hours[et]
        for r in rs:
            # boundary exclusion: both 24h windows fit inside the series
            assert mn < r.hour < mx


def test_skyline_matches_bruteforce_and_is_pareto(spark):
    import pyspark.sql.functions as F

    from clinical_data_platform_spark.plans.advanced import (
        lineitem_quantity_price_skyline,
    )

    got = sorted(
        (r.l_quantity, r.l_extendedprice)
        for r in lineitem_quantity_price_skyline(spark, SF).collect()
    )
    pts = {
        (float(r.q), float(r.p))
        for r in spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(
            F.col("l_quantity").alias("q"), F.col("l_extendedprice").alias("p")
        )
        .distinct()
        .collect()
    }
    expected = sorted(
        a
        for a in pts
        if not any(
            b[0] >= a[0] and b[1] <= a[1] and b != a for b in pts
        )
    )
    assert got == expected
    # Pareto structure: along the frontier, more quantity must cost
    # strictly more — both coordinates are monotone
    qs = [q for q, _ in got]
    ps = [p for _, p in got]
    assert qs == sorted(qs)
    assert ps == sorted(ps)


def test_pointer_jumping_depths_match_sequential_walk(spark):
    from clinical_data_platform_spark.plans.graphops import (
        customer_hierarchy_depths,
    )

    got = {
        r.node: r.depth for r in customer_hierarchy_depths(spark, SF).collect()
    }
    n = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert len(got) == n

    def walk(i: int) -> int:
        d = 0
        while i > 0:
            i = (i - 1) // 2
            d += 1
        return d

    for node, depth in got.items():
        assert depth == walk(node)
    # heap-shaped tree: max depth is ~log2(n)
    import math

    assert max(got.values()) == math.floor(math.log2(n))

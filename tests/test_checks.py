"""Check-engine tests: each rule kind on crafted frames, plus the
reference's good/bad polarity pair (the visits cost<500 suite,
great_expectations/expectations/visits_suite.json, README.md:63-78)."""

from __future__ import annotations

import pyspark.sql.functions as F

from clinical_data_platform_spark.operators import checks as C


def _visits(spark, bad: bool):
    rows = [
        (100, 1, 10, 120.5),
        (101, 2, 11, 560.0 if bad else 260.0),
        (102, 3, 10, 75.0),
    ]
    return spark.createDataFrame(
        rows, "visit_id BIGINT, patient_id BIGINT, provider_id BIGINT, cost DOUBLE"
    )


VISIT_RULES = [
    C.not_null("visit_id"),
    C.unique("visit_id"),
    C.in_range("cost", lo=0, hi=500, strict_hi=True),
]


def test_visits_bad_fails_good_passes(spark):
    bad_report = C.check_report(_visits(spark, bad=True), VISIT_RULES).toPandas()
    good_report = C.check_report(_visits(spark, bad=False), VISIT_RULES).toPandas()
    bad = bad_report.set_index("rule")
    assert not bad.loc["in_range__cost", "passed"]
    assert bad.loc["in_range__cost", "violations"] == 1
    assert good_report["passed"].all()


def test_rule_kinds(spark):
    df = spark.createDataFrame(
        [
            ("A1", "M", 25, "AB", 10.0, 20.0),
            ("A2", "F", 200, "ABCDEFGHIJK", 30.0, 20.0),   # age out of range, len>10, lo>hi
            ("A1", "X", None, None, None, None),            # dup id, bad sex
            (None, "M", 40, "xy", 5.0, 6.0),                # null id, regex fail (lowercase)
        ],
        "sid STRING, sex STRING, age INT, code STRING, lo DOUBLE, hi DOUBLE",
    )
    rules = [
        C.not_null("sid"),
        C.unique("sid"),
        C.accepted_values("sex", ["M", "F"]),
        C.in_range("age", 0, 150),
        C.regex("code", "^[A-Z]+$"),
        C.str_length("code", 1, 10),
        C.cross_column("lo_le_hi", "lo <= hi"),
        C.composite_unique(["sid", "sex"]),
    ]
    wide = C.run_checks(df, rules).collect()[0].asDict()
    assert wide["n_rows"] == 4
    assert wide["not_null__sid"] == 1
    assert wide["unique__sid"] == 1          # A1 duplicated among non-nulls
    assert wide["accepted_values__sex"] == 1  # X
    assert wide["in_range__age"] == 1         # 200
    assert wide["regex__code"] == 1           # xy
    assert wide["str_length__code"] == 1      # 11 chars
    assert wide["cross_column__lo_le_hi"] == 1  # 30 > 20; NULLs not violations
    assert wide["composite_unique__sid_sex"] == 0  # (A1,M),(A1,X) distinct


def test_referential_violations(spark):
    child = spark.createDataFrame([(1,), (2,), (99,)], "fk BIGINT")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk BIGINT")
    orphans = C.referential_violations(child, parent, "fk", "pk")
    assert [r.fk for r in orphans.collect()] == [99]


def test_freshness_rule(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00",)], "ts_s STRING"
    ).select(F.col("ts_s").cast("timestamp").alias("ts"))
    fresh = C.run_checks(
        df, [C.freshness("ts", "2024-01-01 01:00:00", 120, 150)]
    ).collect()[0]
    stale = C.run_checks(
        df, [C.freshness("ts", "2024-01-01 04:00:00", 120, 150)]
    ).collect()[0]
    assert fresh["freshness__ts"] == 0
    assert stale["freshness__ts"] == 1


def test_check_report_warn_severity(spark):
    """Warning-tier staleness must NOT read as a failure: the __warn row
    carries severity='warn' with passed=NULL, so consumers scanning for
    passed=false see only true breaches (ADVICE r2; freshness.py:52-57)."""
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00",)], "ts_s STRING"
    ).select(F.col("ts_s").cast("timestamp").alias("ts"))
    # lag = 135 min: warn (>120) but not breach (<=150)
    rep = C.check_report(
        df, [C.freshness("ts", "2024-01-01 02:15:00", 120, 150)]
    ).toPandas().set_index("rule")
    assert rep.loc["freshness__ts", "severity"] == "breach"
    assert bool(rep.loc["freshness__ts", "passed"]) is True
    assert rep.loc["freshness__ts__warn", "severity"] == "warn"
    assert rep.loc["freshness__ts__warn", "violations"] == 1
    assert rep.loc["freshness__ts__warn", "passed"] is None
    # nothing is passed=false even though the warn tier fired
    assert not (rep["passed"] == False).any()  # noqa: E712


def test_scd2_merge(spark):
    from clinical_data_platform_spark.operators.scd import apply_scd2, init_scd2

    snap = spark.createDataFrame(
        [(1, "A", "x"), (2, "B", "y")], "id BIGINT, name STRING, attr STRING"
    )
    dim = init_scd2(snap, "id", "2024-01-01 00:00:00")
    # batch 1: id=1 changes attr, id=3 is new, id=2 unchanged
    upd1 = spark.createDataFrame(
        [(1, "A", "z"), (2, "B", "y"), (3, "C", "w")],
        "id BIGINT, name STRING, attr STRING",
    )
    dim = apply_scd2(dim, upd1, "id", ["name", "attr"], "2024-02-01 00:00:00")
    # batch 2: id=3 changes name
    upd2 = spark.createDataFrame([(3, "C2", "w")], "id BIGINT, name STRING, attr STRING")
    dim = apply_scd2(dim, upd2, "id", ["name", "attr"], "2024-03-01 00:00:00").cache()

    pdf = dim.toPandas().sort_values(["id", "valid_from"]).reset_index(drop=True)
    # one current row per key
    cur = pdf[pdf.is_current]
    assert sorted(cur.id) == [1, 2, 3]
    assert cur.set_index("id").loc[1, "attr"] == "z"
    assert cur.set_index("id").loc[3, "name"] == "C2"
    # id=1 history: closed original with valid_to = batch-1 ts
    h1 = pdf[(pdf.id == 1) & (~pdf.is_current)]
    assert len(h1) == 1 and str(h1.iloc[0].valid_to) == "2024-02-01 00:00:00"
    assert h1.iloc[0].attr == "x"
    # id=2 never versioned
    assert len(pdf[pdf.id == 2]) == 1
    # intervals are contiguous and non-overlapping per key
    for key, grp in pdf.groupby("id"):
        grp = grp.sort_values("valid_from")
        for a, b in zip(grp.valid_to[:-1], grp.valid_from[1:]):
            assert a == b


def test_freshness_sli_statuses(spark):
    from clinical_data_platform_spark.operators.checks import freshness_sli

    df = spark.createDataFrame([("2024-01-01 00:00:00",)], "s STRING").select(
        F.col("s").cast("timestamp").alias("ts")
    )
    ok = freshness_sli(df, "ts", "2024-01-01 01:00:00", slo_minutes=120)
    warn = freshness_sli(df, "ts", "2024-01-01 02:20:00", slo_minutes=120)
    breach = freshness_sli(df, "ts", "2024-01-01 03:00:00", slo_minutes=120)
    assert (ok["status"], warn["status"], breach["status"]) == ("ok", "warning", "breach")
    assert ok["lag_minutes"] == 60.0 and breach["lag_minutes"] == 180.0


def test_pit_join_matches_every_order_exactly_once(spark):
    """The SCD2 intervals partition time per key, so the point-in-time
    join is lossless and duplication-free: total joined orders equals
    the orders row count, and pre-1995 orders never see the RESHUFFLED
    or VIP segments introduced later (no future-attribute leakage)."""
    import pyspark.sql.functions as F

    from clinical_data_platform_spark.catalog import table as T
    from clinical_data_platform_spark.plans.relational import (
        pit_orders_segment_revenue,
    )

    sf = "/root/testdata/sf0.001"
    rows = pit_orders_segment_revenue(spark, sf).collect()
    total = sum(r.n_orders for r in rows)
    assert total == T(spark, sf, "orders").count()
    for r in rows:
        if r.order_year < 1995:
            assert r.seg not in ("RESHUFFLED", "VIP"), r
        if r.order_year < 1996:
            assert r.seg != "VIP", r

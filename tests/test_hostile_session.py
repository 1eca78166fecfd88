"""Hostile-session probe: the driver may hand us a session configured
with a non-UTC timezone; tune_session (called by __spark_entry__) must
force the parity-critical confs so timestamp-sensitive queries still
match the oracle."""

from __future__ import annotations

from clinical_data_platform_spark.session import tune_session

SF = "/root/testdata/sf0.001"


def test_tune_session_forces_utc_and_query_parity(spark, duck):
    import __spark_entry__ as E

    saved = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        # entry()/queries() route through tune_session
        df = E.queries()["hourly_event_rollup"](spark, SF)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        got = {
            (r.hour_start.isoformat(), r.event_type): r.n for r in df.collect()
        }
        import duckdb

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
        )
        want = {
            (hs.isoformat(), et): n
            for hs, et, n, _tv in con.execute(
                E.oracle_sql()["hourly_event_rollup"]
            ).fetchall()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)


def test_tune_session_is_idempotent(spark):
    s1 = tune_session(spark)
    s2 = tune_session(s1)
    assert s2 is spark
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"

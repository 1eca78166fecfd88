from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clinical_data_platform_spark.session import get_spark  # noqa: E402

N_SUBJECTS = 200


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def silver(spark):
    """Deterministic synthetic SDTM silver tables (cached as pandas for
    DuckDB registration too)."""
    from clinical_data_platform_spark.clinical.synthetic import generate_all

    dfs = generate_all(spark, n_subjects=N_SUBJECTS, seed=42)
    return {k: v.cache() for k, v in dfs.items()}


@pytest.fixture(scope="session")
def duck(silver):
    """DuckDB connection with the same silver tables registered as views
    (the oracle side)."""
    con = duckdb.connect()
    for name, df in silver.items():
        pdf = df.toPandas()
        con.register(f"pdf_{name.lower()}", pdf)
        con.execute(f"CREATE VIEW {name.lower()} AS SELECT * FROM pdf_{name.lower()}")
    return con

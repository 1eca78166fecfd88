"""Statistical-test plan coverage (SURVEY §2.8 M1/M2): Welch t-test and
Pearson chi-square computed as one-pass Spark aggregations; the oracle
reproduces the identical closed forms (including the A&S erf polynomial) in
DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import table as T
from ..functions.scalars import NORMAL_SF_SQL
from ..operators.stats import chi_square_test, welch_t_test
from .registry import query

_WELCH_ORACLE = """
WITH s AS (
  SELECT avg(o_totalprice)      FILTER (o_orderstatus = 'F') AS mean_a,
         var_samp(o_totalprice) FILTER (o_orderstatus = 'F') AS var_a,
         count(o_totalprice)    FILTER (o_orderstatus = 'F') AS n_a,
         avg(o_totalprice)      FILTER (o_orderstatus = 'O') AS mean_b,
         var_samp(o_totalprice) FILTER (o_orderstatus = 'O') AS var_b,
         count(o_totalprice)    FILTER (o_orderstatus = 'O') AS n_b
  FROM orders
), t AS (
  SELECT *,
         (mean_a - mean_b) / sqrt(var_a/n_a + var_b/n_b) AS t_raw,
         pow(var_a/n_a + var_b/n_b, 2)
           / (pow(var_a/n_a, 2)/(n_a-1) + pow(var_b/n_b, 2)/(n_b-1)) AS dof_raw
  FROM s
)
SELECT round(mean_a, 6) AS mean_a,
       round(mean_b, 6) AS mean_b,
       n_a, n_b,
       round(t_raw, 6)  AS t_stat,
       round(dof_raw, 4) AS dof,
       round({p_sql}, 6) AS p_value
FROM t
""".format(p_sql=NORMAL_SF_SQL.format(z="t_raw"))

_CHI2_ORACLE = """
WITH cells AS (
  SELECT event_type AS r, (value > 50) AS c, cast(count(*) AS DOUBLE) AS o
  FROM events GROUP BY 1, 2
), m AS (
  SELECT o,
         sum(o) OVER (PARTITION BY r) AS row_tot,
         sum(o) OVER (PARTITION BY c) AS col_tot,
         sum(o) OVER ()               AS grand,
         r, c
  FROM cells
), agg AS (
  SELECT sum(pow(o - row_tot*col_tot/grand, 2) / (row_tot*col_tot/grand)) AS chi2,
         count(DISTINCT r) AS nr, count(DISTINCT c) AS nc
  FROM m
), z AS (
  SELECT chi2, cast((nr-1)*(nc-1) AS BIGINT) AS dof,
         (pow(chi2 / ((nr-1)*(nc-1)), 1.0/3.0)
            - (1.0 - 2.0/(9.0*(nr-1)*(nc-1))))
           / sqrt(2.0/(9.0*(nr-1)*(nc-1))) AS z_raw
  FROM agg
)
SELECT round(chi2, 6) AS chi2, dof,
       round(z_raw, 6) AS z_wh,
       round({p_sql}, 6) AS p_value
FROM z
""".format(p_sql=NORMAL_SF_SQL.format(z="z_raw"))


@query("welch_ttest_totalprice", oracle=_WELCH_ORACLE, tags=["M1"])
def welch_ttest_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t-test: o_totalprice of finished vs open orders
    (stats_utils.py:9-23 semantics, distributed sufficient statistics)."""
    return welch_t_test(
        T(spark, sf_dir, "orders"), "o_totalprice", "o_orderstatus", "F", "O"
    )


@query("chi_square_event_value", oracle=_CHI2_ORACLE, tags=["M2"])
def chi_square_event_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square of event_type x (value > 50) with Wilson–Hilferty
    p-value (stats_utils.py:26-41 semantics)."""
    import pyspark.sql.functions as F

    ev = T(spark, sf_dir, "events").select(
        "event_type", (F.col("value") > 50).alias("high_value")
    )
    return chi_square_test(ev, "event_type", "high_value")

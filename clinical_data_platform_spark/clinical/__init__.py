"""Clinical-platform parity layer: SDTM standardization, star schema,
dbt-style marts, curated analytics, features and ML — the reference's
domain workload (SURVEY.md §1-§3) re-expressed as Spark DataFrame plans.

Pipeline (mirrors the reference's `make demo`, Makefile:71-100):
  synthetic/ingest (CSV -> bronze, Hive-partitioned)
  -> standardize (bronze -> silver SDTM parquet)
  -> star (dims + facts)
  -> marts (staging -> intermediate -> marts DAG)
  -> analytics (curated queries) / features -> ml
"""

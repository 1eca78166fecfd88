"""clinical_data_platform_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference platform (altalanta/clinical-data-platform),
designed for 100 TB scale:

- ``sources/``    ingestion (CSV -> bronze parquet, schema normalization)
- ``functions/``  scalar/column expression library (case ladders, hashing,
                  redaction, text metrics, vector math)
- ``operators/``  composite operators (declarative data-quality checks,
                  dedup, similarity search, sessionization, stats tests)
- ``plans/``      declarative query plans over the test corpus; each plan is
                  registered with an equivalent DuckDB oracle SQL string
- ``streaming/``  Structured Streaming jobs over the events table
- ``ml/``         MLlib pipelines (train / score)
- ``clinical/``   SDTM standardization, star schema, marts (reference parity)

Everything is built on the public PySpark DataFrame/SQL API; Catalyst and
Tungsten do the physical planning.
"""

__version__ = "0.1.0"

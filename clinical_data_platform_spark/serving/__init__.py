"""Thin serving layer (SURVEY §3.3): Spark is the batch engine, not the
request-path executor — the API serves pre-materialized marts."""

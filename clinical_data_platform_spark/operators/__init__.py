"""Composite operators: declarative checks, dedup, similarity, stats,
sessionization. Each is a pure function DataFrame -> DataFrame built from
Spark built-ins; Python UDFs are deliberately absent from hot paths.
"""

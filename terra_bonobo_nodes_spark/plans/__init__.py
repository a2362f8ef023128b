"""Query registry: named queries with DuckDB-oracle SQL equivalents.

This is the correctness surface of the engine — ``__spark_entry__.py``
re-exports it for the driver harness (see that file's docstring).
"""

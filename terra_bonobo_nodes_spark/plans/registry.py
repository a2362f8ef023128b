"""Registry of correctness queries: Spark plan + DuckDB oracle SQL pairs.

Each entry exercises one operator (or a small composition) from
SURVEY.md §2 on the driver's parquet tables. Conventions that keep the
driver's order-insensitive value-hash comparison stable across engines:

- every float output is ``round(x, 4..6)`` in BOTH the Spark plan and
  the oracle SQL (kills summation-order last-ulp drift);
- no raw arrays/structs/timestamps in oracle-checked outputs — arrays
  are reduced or joined to strings, timestamps cast to epoch BIGINT;
- every computed column is aliased identically on both sides.

Queries whose semantics are not SQL-expressible (streaming state,
geometry kernels without a DuckDB spatial extension) register with
``oracle=None`` → the driver records a weaker rows-only check, and the
full semantics are covered by pytest unit tests instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    headline: bool = False  # included in bench.py
    tags: tuple[str, ...] = field(default=())


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, headline, tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import side-effect modules that populate the registry.
    from terra_bonobo_nodes_spark.plans import (  # noqa: F401
        queries_functions,
        queries_geo,
        queries_llm,
        queries_pipelines,
        queries_relational,
        queries_sources,
        queries_streaming,
    )

    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark_fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle}

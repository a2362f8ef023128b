"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The real registry lives in ``terra_bonobo_nodes_spark/plans/`` — one
module per capability area; this file is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _ensure_executors(spark: SparkSession) -> None:
    from terra_bonobo_nodes_spark.session import ship_package

    ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: grid-cluster + collect-and-sum
    (reference ``LayerClusters`` + ``CollectAndSum``) over the events table,
    top cells by point count with deterministic tie-breaking.
    """
    from terra_bonobo_nodes_spark.plans.registry import all_queries

    _ensure_executors(spark)
    q = all_queries()["a4_grid_cluster_collect_sum"]
    df = q.spark_fn(spark, "/root/testdata/sf0.001")
    return df.orderBy(
        F.col("point_count").desc(), F.col("cell_x").asc(), F.col("cell_y").asc()
    ).limit(50)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from terra_bonobo_nodes_spark.plans import registry

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_executors(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    from terra_bonobo_nodes_spark.plans import registry

    return registry.oracle_sql()

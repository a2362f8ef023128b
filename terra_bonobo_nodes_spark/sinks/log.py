"""Logging side-channel (``DjangoLog``, ``common.py:439-456``).

The reference logs every row and passes it through. Row-at-a-time
logging is an anti-pattern at scale; the Spark-native equivalents are:

- ``observe_counts``: zero-cost stream metrics via ``df.observe`` —
  visible on the driver after the action, no extra job;
- ``log_sample``: log a bounded sample (driver-side), pass the full
  DataFrame through unchanged.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger("terra_bonobo_nodes_spark")


def observe_counts(df: DataFrame, name: str = "djangolog") -> DataFrame:
    return df.observe(name, F.count(F.lit(1)).alias("rows"))


def log_sample(df: DataFrame, n: int = 10, level: int = logging.INFO) -> DataFrame:
    for row in df.limit(n).collect():
        logger.log(level, "%s", row.asDict())
    return df

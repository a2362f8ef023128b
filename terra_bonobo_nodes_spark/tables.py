"""Loaders for the driver's deterministic parquet star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings. Parquet scans get predicate pushdown + column
pruning from Catalyst for free — every operator downstream should select
only what it needs so the scan's ReadSchema stays narrow.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts has shipped in two parquet layouts across testdata
        # generations: TIMESTAMP(NANOS) (which Spark rejects by default,
        # [PARQUET_TYPE_ILLEGAL] — read as int64 nanos and truncate to
        # micros with integer DIV, exactly what DuckDB's reader does) and
        # plain TIMESTAMP micros (read as TIMESTAMP_NTZ). Sniff the
        # resolved schema and normalize either to session-tz TIMESTAMP so
        # every downstream window/unix_* expression sees one type.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            return df.withColumn(
                "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))")
            )
        if not isinstance(ts_type, T.TimestampType):
            # TIMESTAMP_NTZ → TIMESTAMP; wall clock is preserved under
            # the session timezone (sessions here pin UTC).
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}

"""SQL extraction (``SQLExtract``, ``sql.py:7-38``).

The reference runs raw SQL against PostgreSQL and yields dict rows with
Decimal values coerced to float (``sql.py:33-35``). Here the query runs
on the engine itself (``spark.sql``) or a JDBC source; decimal coercion
is applied uniformly so downstream arithmetic matches the reference's
float semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType


def decimals_to_double(df: DataFrame) -> DataFrame:
    """The reference's Decimal -> float coercion (``sql.py:33-35``)."""
    casts = {
        f.name: F.col(f.name).cast("double")
        for f in df.schema.fields
        if isinstance(f.dataType, DecimalType)
    }
    return df.withColumns(casts) if casts else df


def sql_extract(
    spark: SparkSession, query: str, identifier: str | None = None
) -> DataFrame:
    """Run SQL, coerce decimals, optionally project an identifier column
    (the reference's ``id`` option picks the identifier from the row)."""
    df = decimals_to_double(spark.sql(query))
    if identifier:
        df = df.withColumn("identifier", F.col(identifier).cast("string"))
    return df


def jdbc_extract(
    spark: SparkSession,
    url: str,
    query: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """``ExtractFeatures``-style paginated scan (``terra.py:177-211``):
    the reference pages by LIMIT/OFFSET (1000 rows, ``terra.py:194``);
    Spark parallelizes the same scan with partitionColumn bounds — the
    pagination IS the partitioning. Untested here (no live DB in the
    environment); the local stand-in for tests is a parquet scan."""
    reader = spark.read.format("jdbc").option("url", url).option("query", query)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", num_partitions)
            .option("lowerBound", lower_bound or 0)
            .option("upperBound", upper_bound or 1_000_000)
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return decimals_to_double(reader.load())

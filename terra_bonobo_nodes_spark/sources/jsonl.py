"""JSON-Lines ingestion (newline-delimited JSON records).

The reference ingests JSON payloads through its generic file/ES extract
nodes (common.py ES hits are dicts; terra.py GeoJSON features are
parsed documents); JSONL is the interchange format every large text
corpus ships in (one document object per line), so the engine treats it
as a first-class source with the same two shapes as CSV:

- path-based: ``read_jsonl`` — Spark's native distributed json scan
  with an explicit schema (never schema inference at 100 TB: one
  sampling pass over the data just to guess types).
- content-based: ``jsonl_documents_to_rows`` — a whole JSONL document
  arrives as one string payload (zip entry, ES _source dump, API
  response); lines explode and parse JVM-side with ``from_json``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Distributed JSONL scan. ``schema`` is required by design —
    inference costs a full extra pass and silently widens types."""
    return spark.read.schema(schema).option("mode", mode).json(path)


def jsonl_documents_to_rows(
    df: DataFrame,
    content_col: str = "content",
    schema: str = "",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Explode JSONL document strings into typed rows.

    ``schema`` is the DDL of ONE record (e.g. ``"id BIGINT, text
    STRING"``). Blank lines are skipped; a malformed line yields a row
    of NULLs (from_json PERMISSIVE semantics) rather than failing the
    pipeline — filter on a required field to drop them.
    """
    if not schema:
        raise ValueError("jsonl_documents_to_rows requires an explicit record schema")
    lines = df.select(
        *(keep_cols or []),
        F.explode(F.split(F.col(content_col), r"\r?\n")).alias("_line"),
    ).filter(F.length(F.trim("_line")) > 0)
    parsed = lines.withColumn("_rec", F.from_json(F.col("_line"), schema))
    # ADVICE_r05: a keep_col sharing a name with a record field yielded
    # silent duplicate output columns; fail fast with both names instead
    rec_fields = set(parsed.schema["_rec"].dataType.fieldNames())
    clash = sorted(rec_fields & set(keep_cols or []))
    if clash:
        raise ValueError(
            f"jsonl_documents_to_rows: keep_cols {clash} collide with "
            "record schema fields — rename one side"
        )
    return parsed.select(*(keep_cols or []), "_rec.*")

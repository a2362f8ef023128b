"""Feature-layer store: upsert + retention over partitioned parquet.

Capability parity with the geostore sinks (SURVEY.md §2.2):

- ``LoadFeatureInLayer`` (``terra.py:107-174``): buffered transactional
  delete-then-insert per identifier window. Here: one idempotent MERGE
  emulated on parquet — dedupe the batch last-writer-wins, anti-join the
  existing layer, union, overwrite. (With Delta on the cluster this is
  a literal ``MERGE ON identifier``; parquet emulation keeps the
  environment dependency-free.)
- ``CleanOlderThan`` (``terra.py:497-520``): retention delete by
  timestamp cutoff = filtered rewrite.

Layout: one directory per layer (``{root}/layer={name}/``) — layer is a
partition column, so layer-scoped reads partition-prune. At 100 TB the
layer store would add a date/bucket partition level and only rewrite
affected partitions (delete-then-insert at partition granularity —
exactly what the overwrite below does per layer).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terra_bonobo_nodes_spark.geo import wkb as W
from terra_bonobo_nodes_spark.operators.stateful import upsert_last_writer_wins
from terra_bonobo_nodes_spark.sinks.atomic import (
    read_parquet_or_none,
    staged_overwrite,
)

EMPTY_POINT_WKB = W.write_wkb(W.POINT_EMPTY)


def _layer_path(root: str, layer: str) -> str:
    return os.path.join(root, f"layer={layer}")


def load_feature_in_layer(
    df: DataFrame,
    root: str,
    layer: str,
    identifier_col: str = "identifier",
    geom_col: str = "geom",
    order_col: str | None = None,
) -> None:
    """Upsert features into a layer (last writer per identifier wins).

    Geometry defaults to POINT EMPTY when absent (``terra.py:167``,
    ``terra.py:24``); ``updated_at`` is stamped for retention. The batch
    is deduped by identifier first — the reference's window-by-window
    delete+insert double-applies on intra-batch duplicates (SURVEY §7
    hard-part 5); dedupe makes the upsert exact.
    """
    spark = df.sparkSession
    out = df
    if geom_col not in out.columns:
        out = out.withColumn(geom_col, F.lit(EMPTY_POINT_WKB))
    else:
        out = out.withColumn(geom_col, F.coalesce(F.col(geom_col), F.lit(EMPTY_POINT_WKB)))
    order = [F.col(order_col).desc()] if order_col else [F.lit(1)]
    out = upsert_last_writer_wins(out, [identifier_col], order)
    out = out.withColumn("updated_at", F.current_timestamp())

    path = _layer_path(root, layer)
    existing = read_layer(spark, root, layer)
    if existing is not None:
        keep = existing.join(
            out.select(identifier_col), on=identifier_col, how="left_anti"
        )
        merged = keep.unionByName(out, allowMissingColumns=True)
        # the plan reads `path`; staged swap rewrites it without a
        # driver round-trip (executors write {path}__next__, then rename)
        staged_overwrite(merged, path)
    else:
        out.write.mode("overwrite").parquet(path)


def read_layer(spark: SparkSession, root: str, layer: str) -> DataFrame | None:
    return read_parquet_or_none(spark, _layer_path(root, layer))


def clean_older_than(
    spark: SparkSession, root: str, layer: str, cutoff, ts_col: str = "updated_at"
) -> int:
    """Retention delete: rewrite the layer keeping rows newer than
    ``cutoff``. Returns rows deleted. (Delta: a metadata-only DELETE.)"""
    existing = read_layer(spark, root, layer)
    if existing is None:
        return 0
    cut = F.lit(cutoff).cast("timestamp")
    kept = existing.filter(F.col(ts_col) >= cut)
    n_before = existing.count()
    staged_overwrite(kept, _layer_path(root, layer))
    n_after = spark.read.parquet(_layer_path(root, layer)).count()
    return n_before - n_after

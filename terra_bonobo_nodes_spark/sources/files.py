"""Versioned binary file ingestion (``PyfilesExtract``, ``pyfiles.py:9-52``).

The reference resolves the latest version of a named file in a "pyfiles"
storage and fetches its bytes. The Spark-native equivalent reads a
versioned prefix with the ``binaryFile`` source; version resolution is a
listing operation (driver-side metadata, like any catalog lookup).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Bytes + metadata per file: (path, modificationTime, length, content)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def resolve_latest_version(base_dir: str, namespace: str, filename: str) -> str | None:
    """Pick the highest-versioned path ``{base}/{namespace}/{version}/{filename}``
    (the reference's async storage search, ``pyfiles.py:33-47``). Returns
    None when absent (reference raises later on fetch)."""
    root = os.path.join(base_dir, namespace)
    if not os.path.isdir(root):
        return None
    versions = [
        d
        for d in os.listdir(root)
        if re.fullmatch(r"\d+(\.\d+)*", d)
        and os.path.exists(os.path.join(root, d, filename))
    ]
    if not versions:
        return None
    latest = max(versions, key=lambda v: [int(p) for p in v.split(".")])
    return os.path.join(root, latest, filename)


def pyfiles_extract(
    spark: SparkSession, base_dir: str, namespace: str, filename: str
) -> DataFrame:
    path = resolve_latest_version(base_dir, namespace, filename)
    if path is None:
        raise FileNotFoundError(f"{namespace}/{filename} not found under {base_dir}")
    return read_binary_files(spark, path)

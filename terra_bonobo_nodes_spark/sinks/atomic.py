"""Crash-safe read-modify-overwrite for parquet directories.

The feature-layer and streaming upsert sinks rewrite a parquet directory
with a plan that READS the same directory (anti-join existing + union
batch). Spark cannot overwrite a path that is an input of the running
plan, and materializing the plan on the driver (``collect()``) is a
scale killer. Instead: stage the new version next to the target, then
promote it with directory renames.

Sequence (all driver-side metadata ops; the data itself is written by
executors into the staged dir):

1. write ``{path}__next__``   — full new version, executor-parallel
2. rename ``{path}``   → ``{path}__old__``
3. rename ``__next__`` → ``{path}``
4. delete ``__old__``

A crash between 2 and 3 leaves no live target, but ``__next__`` is
complete (it has ``_SUCCESS``); :func:`recover_staged` finishes the
promotion on the next read. A crash before 2 leaves the old version
untouched. Every step is idempotent under retry, which is the contract
``upsert_foreach_batch`` documents for streaming restarts.

On HDFS/S3 the same protocol holds via ``FileSystem.rename`` (atomic on
HDFS; on S3 a real deployment would use a table format — Delta/Iceberg
MERGE — which is the documented swap-in, SURVEY.md §2.2). THIS module's
metadata steps use ``os``/``shutil`` and therefore only work for
driver-local paths; :func:`_local` rejects ``hdfs://``/``s3a://`` URIs
loudly at the call site instead of misreporting an existing remote
store as missing (``os.path.exists`` would silently be False).

Recovery invariant: adoption of ``__next__`` is keyed on its
``_SUCCESS`` marker — the only executor-written evidence that the write
committed. The protocol therefore HARD-DEPENDS on
``mapreduce.fileoutputcommitter.marksuccessfuljobs=true`` (Spark's
default); :func:`staged_overwrite` verifies the marker after every
write so a deployment that disabled it fails at write time, not by
silently restoring a stale ``__old__`` during recovery.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _local(path: str) -> str:
    """Normalize ``path`` to a driver-local filesystem path, raising for
    URIs this module's os/shutil metadata ops cannot serve (ADVICE r02:
    a silent False from ``os.path.exists('s3a://...')`` would misreport
    an existing store as missing and drop its rows)."""
    scheme = urlparse(path).scheme
    if scheme in ("", "file"):
        return path.removeprefix("file://") if scheme else path
    raise NotImplementedError(
        f"staged-swap sink only supports driver-local paths, got {path!r}; "
        "for HDFS/S3 route the rename/exists/delete steps through the "
        "Hadoop FileSystem API or use a table format (Delta/Iceberg MERGE)"
    )


def _next(path: str) -> str:
    return path + "__next__"


def _old(path: str) -> str:
    return path + "__old__"


def staged_overwrite(df: DataFrame, path: str) -> None:
    """Overwrite ``path`` with ``df`` even when ``df``'s plan reads
    ``path``. Never materializes rows on the driver."""
    path = _local(path)
    nxt, old = _next(path), _old(path)
    shutil.rmtree(nxt, ignore_errors=True)
    df.write.mode("overwrite").parquet(nxt)
    if not os.path.exists(os.path.join(nxt, "_SUCCESS")):
        # recover_staged keys adoption on _SUCCESS; a config that turns
        # the marker off would silently break crash recovery, so refuse
        # to promote a version recovery could not tell apart from a
        # half-written one.
        raise RuntimeError(
            f"no _SUCCESS marker in {nxt}; staged-swap recovery requires "
            "mapreduce.fileoutputcommitter.marksuccessfuljobs=true"
        )
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(nxt, path)
    shutil.rmtree(old, ignore_errors=True)


def recover_staged(path: str) -> None:
    """Finish an interrupted promotion: if the target is missing, adopt
    a complete ``__next__`` (post-retire crash) else restore ``__old__``.
    Completeness evidence is the ``_SUCCESS`` marker (see module doc)."""
    path = _local(path)
    if os.path.exists(path):
        return
    nxt, old = _next(path), _old(path)
    if os.path.exists(os.path.join(nxt, "_SUCCESS")):
        os.rename(nxt, path)
        shutil.rmtree(old, ignore_errors=True)
    elif os.path.exists(old):
        os.rename(old, path)


def read_parquet_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a staged-swap parquet dir; ``None`` only when the path truly
    does not exist (other read failures propagate — silently treating a
    transient error as "empty store" would drop all previous rows)."""
    path = _local(path)
    recover_staged(path)
    if not os.path.exists(path):
        return None
    return spark.read.parquet(path)

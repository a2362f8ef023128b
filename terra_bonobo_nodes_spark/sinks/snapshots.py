"""Versioned parquet snapshots with time-travel reads.

Training reproducibility demands "read the corpus exactly as training
run X saw it" — a moving parquet directory cannot answer that once a
later curation pass rewrites it. This sink keeps IMMUTABLE versions:

    {root}/v=1/  v=2/  ...     one complete parquet dir per version
    {root}/_latest.json        the published head: {"version": n, ...}

Write protocol (two-phase, like the bulk writer's manifest commit,
``sources/scroll.py::BulkIndexDataSource``):

1. executors write the full new version into ``v=<n>/`` (its
   ``_SUCCESS`` marker is the completeness evidence, same invariant as
   ``sinks/atomic.py``);
2. the driver publishes ``_latest.json`` via write-temp + ``os.replace``
   (atomic on POSIX).

A crash between 1 and 2 leaves the head untouched. Version numbers are
NEVER reused: the next write takes ``max(head, max existing v=* dir)
+ 1``, so a crashed attempt's number is burned, not reclaimed — a
``_SUCCESS``'d-but-unpublished dir is complete, readable via
``snapshot_read(version=...)``, and must never be rewritten under a
reader that already recorded its number (the round-10 fix: reclaiming
the head-derived number used to rewrite exactly that dir). Published
versions are never rewritten; ``prune`` deletes old ones explicitly
(never the head). Readers resolve the head from the manifest, so a
read concurrent with a write sees either the old or the new version,
never a mixture.

Concurrency contract: SINGLE WRITER by design (the Delta/Iceberg swap
below is the real-deployment answer). A second concurrent writer is
detected, not tolerated: each writer claims its version directory with
an exclusive ``mkdir`` before writing, so the loser fails loudly with
``FileExistsError`` instead of silently clobbering the winner's data.

This is the driver-local stand-in for a table format — on S3/HDFS use
Delta/Iceberg time travel, which is exactly this manifest-plus-
immutable-files design industrialized (SURVEY §2.2's documented
swap-in). Paths go through :func:`sinks.atomic._local`, so remote URIs
fail loudly rather than half-working.
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

from terra_bonobo_nodes_spark.sinks.atomic import _local

_MANIFEST = "_latest.json"
_VDIR = re.compile(r"^v=(\d+)$")


def _manifest_path(root: str) -> str:
    return os.path.join(root, _MANIFEST)


def _read_manifest(root: str) -> dict | None:
    try:
        with open(_manifest_path(root), encoding="utf-8") as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def _next_version(root: str) -> int:
    """max(manifest head, max existing v=* dir) + 1 — a crashed attempt
    (data written, manifest not) burns its number instead of having the
    next write rmtree-rewrite a dir a pinned reader may already serve."""
    head = _read_manifest(root)
    high = int(head["version"]) if head else 0
    for name in os.listdir(root):
        m = _VDIR.match(name)
        if m:
            high = max(high, int(m.group(1)))
    return high + 1


def snapshot_write(df: DataFrame, root: str, note: str = "") -> int:
    """Publish ``df`` as the next version; returns its number. The data
    write is executor-parallel; only the version claim and the two
    manifest steps run on the driver."""
    root = _local(root)
    os.makedirs(root, exist_ok=True)
    version = _next_version(root)
    vdir = os.path.join(root, f"v={version}")
    # exclusive claim: a concurrent second writer that raced to the same
    # number dies HERE with FileExistsError instead of overwriting the
    # winner's data (single-writer contract, module docstring)
    os.mkdir(vdir)
    df.write.mode("append").parquet(vdir)
    if not os.path.exists(os.path.join(vdir, "_SUCCESS")):
        raise RuntimeError(
            f"no _SUCCESS marker in {vdir}; snapshot publication requires "
            "mapreduce.fileoutputcommitter.marksuccessfuljobs=true"
        )
    tmp = _manifest_path(root) + f".tmp-{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump({"version": version, "note": note}, fh)
    os.replace(tmp, _manifest_path(root))  # atomic head publish
    return version


def snapshot_read(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read the head (default) or an exact pinned ``version`` — the
    time-travel read a reproducible training run records and replays."""
    root = _local(root)
    if version is None:
        head = _read_manifest(root)
        if head is None:
            raise FileNotFoundError(f"no published snapshot under {root!r}")
        version = int(head["version"])
    vdir = os.path.join(root, f"v={version}")
    if not os.path.exists(os.path.join(vdir, "_SUCCESS")):
        raise FileNotFoundError(
            f"snapshot v={version} does not exist (or was pruned) under "
            f"{root!r}"
        )
    return spark.read.parquet(vdir)


def snapshot_versions(root: str) -> list[int]:
    """Complete, readable versions (ascending): every ``v=*`` dir with a
    ``_SUCCESS`` marker. NOTE this is *complete*, not *published* — a
    writer that finished its data write but crashed before the head
    publish leaves a ``_SUCCESS``'d dir ABOVE the manifest head, which
    is listed here (it is fully readable via
    ``snapshot_read(version=...)``) even though no manifest ever
    pointed at it. Dirs without ``_SUCCESS`` (data write died mid-way)
    are excluded; ``snapshot_incomplete`` lists those."""
    root = _local(root)
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = _VDIR.match(name)
        if m and os.path.exists(os.path.join(root, name, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def snapshot_incomplete(root: str) -> list[int]:
    """Crash leftovers (ascending): ``v=*`` dirs WITHOUT a ``_SUCCESS``
    marker — a data write died mid-way, the dir holds partial parquet
    bytes, and no reader will ever serve it. ``snapshot_prune`` deletes
    the ones below the manifest head; one ABOVE the head could be an
    in-flight write (under the single-writer contract any live write's
    number exceeds the head) and is left alone."""
    root = _local(root)
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        m = _VDIR.match(name)
        if m and not os.path.exists(os.path.join(root, name, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def snapshot_prune(root: str, keep_last: int = 2) -> list[int]:
    """Delete all but the newest ``keep_last`` complete versions (the
    manifest head is always kept regardless), PLUS every incomplete
    crash-leftover dir below the head — those hold partial bytes no
    reader can ever serve, and nothing else ever reclaims them (version
    numbers are burned, not reused). An incomplete dir above the head
    is spared: under the single-writer contract it may be the one
    in-flight write. Returns the deleted versions — pruning is the ONLY
    way a version directory disappears, so the caller owns the
    reproducibility trade explicitly."""
    if keep_last < 1:
        raise ValueError("snapshot_prune: keep_last must be >= 1")
    root = _local(root)
    head = _read_manifest(root)
    head_v = int(head["version"]) if head else 0
    versions = snapshot_versions(root)
    keep = set(versions[-keep_last:])
    if head:
        keep.add(head_v)
    deleted = []
    for v in versions:
        if v not in keep:
            shutil.rmtree(os.path.join(root, f"v={v}"))
            deleted.append(v)
    for v in snapshot_incomplete(root):
        if v < head_v:
            shutil.rmtree(os.path.join(root, f"v={v}"))
            deleted.append(v)
    return sorted(deleted)

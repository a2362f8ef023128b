"""sinks/snapshots.py: versioned snapshots + time travel."""

from __future__ import annotations

import json
import os

import pytest

from terra_bonobo_nodes_spark.sinks.snapshots import (
    snapshot_prune,
    snapshot_read,
    snapshot_versions,
    snapshot_write,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id BIGINT, v STRING")


def test_write_read_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "store")
    assert snapshot_write(_df(spark, [(1, "a")]), root, note="first") == 1
    assert snapshot_write(_df(spark, [(1, "a2"), (2, "b")]), root) == 2
    # head read = latest
    assert sorted(map(tuple, snapshot_read(spark, root).collect())) == [
        (1, "a2"), (2, "b"),
    ]
    # pinned read = exactly what version 1 held, rewrites notwithstanding
    assert [tuple(r) for r in snapshot_read(spark, root, version=1).collect()] == [
        (1, "a")
    ]
    assert snapshot_versions(root) == [1, 2]


def test_crashed_write_is_invisible_and_number_is_reclaimed(spark, tmp_path):
    root = str(tmp_path / "store")
    snapshot_write(_df(spark, [(1, "a")]), root)
    # simulate a crash between data write and head publish: a v=2 dir
    # exists but carries no _SUCCESS and the manifest still says 1
    orphan = os.path.join(root, "v=2")
    os.makedirs(orphan)
    assert snapshot_versions(root) == [1]
    assert [tuple(r) for r in snapshot_read(spark, root).collect()] == [(1, "a")]
    # the next write reclaims number 2 and publishes cleanly
    assert snapshot_write(_df(spark, [(2, "b")]), root) == 2
    assert [tuple(r) for r in snapshot_read(spark, root, version=2).collect()] == [
        (2, "b")
    ]


def test_prune_keeps_head_and_reports_deletions(spark, tmp_path):
    root = str(tmp_path / "store")
    for i in range(1, 5):
        snapshot_write(_df(spark, [(i, f"v{i}")]), root)
    assert snapshot_prune(root, keep_last=2) == [1, 2]
    assert snapshot_versions(root) == [3, 4]
    with pytest.raises(FileNotFoundError, match="pruned"):
        snapshot_read(spark, root, version=1)
    # head survives even a keep_last that would exclude it
    with open(os.path.join(root, "_latest.json")) as fh:
        assert json.load(fh)["version"] == 4
    assert snapshot_prune(root, keep_last=1) == [3]
    assert [tuple(r) for r in snapshot_read(spark, root).collect()] == [(4, "v4")]


def test_missing_store_and_bad_args(spark, tmp_path):
    root = str(tmp_path / "absent")
    with pytest.raises(FileNotFoundError, match="no published snapshot"):
        snapshot_read(spark, root)
    assert snapshot_versions(root) == []
    with pytest.raises(ValueError, match="keep_last"):
        snapshot_prune(str(tmp_path), keep_last=0)
    with pytest.raises(NotImplementedError, match="driver-local"):
        snapshot_versions("s3a://bucket/store")

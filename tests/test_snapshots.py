"""sinks/snapshots.py: versioned snapshots + time travel."""

from __future__ import annotations

import json
import os

import pytest

from terra_bonobo_nodes_spark.sinks.snapshots import (
    snapshot_incomplete,
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


def test_crashed_write_is_invisible_and_number_is_burned(spark, tmp_path):
    root = str(tmp_path / "store")
    snapshot_write(_df(spark, [(1, "a")]), root)
    # simulate a crash between data write and head publish: a v=2 dir
    # exists but carries no _SUCCESS and the manifest still says 1
    orphan = os.path.join(root, "v=2")
    os.makedirs(orphan)
    assert snapshot_versions(root) == [1]
    assert [tuple(r) for r in snapshot_read(spark, root).collect()] == [(1, "a")]
    # the next write BURNS number 2 (round-10 fix: never rewrite a dir
    # whose number a reader may have recorded) and publishes as 3
    assert snapshot_write(_df(spark, [(2, "b")]), root) == 3
    assert snapshot_versions(root) == [1, 3]
    assert [tuple(r) for r in snapshot_read(spark, root, version=3).collect()] == [
        (2, "b")
    ]
    # the orphan dir itself was never touched
    assert os.listdir(orphan) == []


def test_successful_but_unpublished_version_is_never_rewritten(spark, tmp_path):
    """The ADVICE_r09 medium finding: a crash AFTER the data write (the
    dir has _SUCCESS) but BEFORE the manifest publish used to leave a
    version that snapshot_read served as published yet the next write
    silently rewrote. Now its number is burned and its bytes frozen."""
    root = str(tmp_path / "store")
    snapshot_write(_df(spark, [(1, "a")]), root)
    # crash-after-data-write: v=2 is complete (has _SUCCESS), head still 1
    snapshot_write(_df(spark, [(9, "orphan")]), root)
    manifest = os.path.join(root, "_latest.json")
    with open(manifest, "w") as fh:
        json.dump({"version": 1, "note": ""}, fh)
    assert snapshot_versions(root) == [1, 2]
    pinned = [tuple(r) for r in snapshot_read(spark, root, version=2).collect()]
    # a new write must NOT reuse number 2 — the pinned reader above
    # already recorded it
    assert snapshot_write(_df(spark, [(3, "c")]), root) == 3
    assert [
        tuple(r) for r in snapshot_read(spark, root, version=2).collect()
    ] == pinned == [(9, "orphan")]
    assert [tuple(r) for r in snapshot_read(spark, root).collect()] == [(3, "c")]


def test_second_concurrent_writer_fails_loudly(spark, tmp_path, monkeypatch):
    """Single-writer contract: two writers that race through
    _next_version before either claims a directory pick the SAME number
    — the loser must die on the exclusive mkdir claim, never overwrite
    the winner's data. (A writer arriving after the claim simply takes
    the next number — that path is the crashed-write tests above.)"""
    from terra_bonobo_nodes_spark.sinks import snapshots as snap

    root = str(tmp_path / "store")
    snapshot_write(_df(spark, [(1, "a")]), root)
    # both writers computed next=2 inside the race window; writer A has
    # already claimed and written v=2
    os.mkdir(os.path.join(root, "v=2"))
    winner = os.path.join(root, "v=2", "part-winner.parquet")
    with open(winner, "wb") as fh:
        fh.write(b"winner-bytes")
    monkeypatch.setattr(snap, "_next_version", lambda _root: 2)
    with pytest.raises(FileExistsError):
        snap.snapshot_write(_df(spark, [(2, "b")]), root)
    # the winner's data was not touched by the losing writer
    with open(winner, "rb") as fh:
        assert fh.read() == b"winner-bytes"


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


def test_prune_gcs_incomplete_leftovers_below_head(spark, tmp_path):
    """The ADVICE_r10 low finding (closed round 12): a data write that
    died mid-way leaves a no-_SUCCESS dir whose partial parquet bytes
    nothing ever reclaimed — snapshot_versions can't see it, so the old
    prune skipped it forever. Prune now deletes incomplete dirs BELOW
    the manifest head (definitely dead: any in-flight write's number
    exceeds the head under the single-writer contract) and spares one
    above it (possibly in-flight)."""
    root = str(tmp_path / "store")
    snapshot_write(_df(spark, [(1, "a")]), root)
    # crashed attempt: partial bytes, no _SUCCESS; head moves past it
    dead = os.path.join(root, "v=2")
    os.makedirs(dead)
    with open(os.path.join(dead, "part-partial.parquet"), "wb") as fh:
        fh.write(b"partial-bytes")
    assert snapshot_write(_df(spark, [(3, "c")]), root) == 3
    # possibly-in-flight attempt ABOVE the head: must be spared
    live = os.path.join(root, "v=9")
    os.makedirs(live)
    assert snapshot_incomplete(root) == [2, 9]
    assert snapshot_prune(root, keep_last=2) == [2]
    assert not os.path.isdir(dead)
    assert os.path.isdir(live)
    assert snapshot_incomplete(root) == [9]
    # complete versions untouched by the gc
    assert snapshot_versions(root) == [1, 3]
    assert [tuple(r) for r in snapshot_read(spark, root).collect()] == [(3, "c")]


def test_snapshot_incomplete_excludes_complete_and_missing(spark, tmp_path):
    root = str(tmp_path / "store")
    assert snapshot_incomplete(str(tmp_path / "absent")) == []
    snapshot_write(_df(spark, [(1, "a")]), root)
    assert snapshot_incomplete(root) == []


def test_load_table_routes_through_snapshot_store(spark, tmp_path):
    """The replay seam (VERDICT_r09 item 4): when {sf_dir}/{name}/ is a
    versioned snapshot store, load_table reads its head by default and
    an exact pinned version on request — so a curation run can replay
    'the corpus as run X saw it' through the SAME entry point every
    registered query uses. version= against a plain parquet table is a
    typed error."""
    from terra_bonobo_nodes_spark.tables import load_table

    sf_dir = str(tmp_path)
    store = os.path.join(sf_dir, "documents")
    v1 = spark.createDataFrame([(1, "old")], "doc_id BIGINT, text STRING")
    v2 = spark.createDataFrame(
        [(1, "new"), (2, "added")], "doc_id BIGINT, text STRING"
    )
    assert snapshot_write(v1, store) == 1
    assert snapshot_write(v2, store) == 2
    # head read through the standard entry point
    assert sorted(map(tuple, load_table(spark, sf_dir, "documents").collect())) == [
        (1, "new"), (2, "added"),
    ]
    # pinned replay: exactly what version 1 held
    assert [
        tuple(r) for r in load_table(spark, sf_dir, "documents", version=1).collect()
    ] == [(1, "old")]
    # plain-parquet tables reject a pinned read loudly
    plain = spark.createDataFrame([(1, "p")], "p_partkey BIGINT, p_name STRING")
    plain.write.mode("overwrite").parquet(os.path.join(sf_dir, "part.parquet"))
    with pytest.raises(ValueError, match="snapshot store"):
        load_table(spark, sf_dir, "part", version=1)


def test_missing_store_and_bad_args(spark, tmp_path):
    root = str(tmp_path / "absent")
    with pytest.raises(FileNotFoundError, match="no published snapshot"):
        snapshot_read(spark, root)
    assert snapshot_versions(root) == []
    with pytest.raises(ValueError, match="keep_last"):
        snapshot_prune(str(tmp_path), keep_last=0)
    with pytest.raises(NotImplementedError, match="driver-local"):
        snapshot_versions("s3a://bucket/store")

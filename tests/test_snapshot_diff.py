"""Version-over-version snapshot diff (operators/cdc.py::
snapshot_diff): verdict semantics incl. NULL-safe comparison,
multi-key, default compare-column inference, summary rollup, guards."""

from __future__ import annotations

import pytest

from terra_bonobo_nodes_spark.operators.cdc import (
    snapshot_diff,
    snapshot_diff_summary,
)


def _pair(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "id long, name string, v long",
    )
    new = spark.createDataFrame(
        [(2, "b", 21), (3, "c", None), (4, "d", 40), (5, "e", 50)],
        "id long, name string, v long",
    )
    return old, new


def test_verdicts(spark):
    old, new = _pair(spark)
    got = {
        r["id"]: r["verdict"]
        for r in snapshot_diff(old, new, ["id"]).collect()
    }
    assert got == {
        1: "removed",
        2: "changed",       # 20 -> 21
        3: "unchanged",     # NULL <=> NULL
        4: "unchanged",
        5: "added",
    }


def test_null_vs_value_is_changed(spark):
    old = spark.createDataFrame([(1, None)], "id long, v string")
    new = spark.createDataFrame([(1, "x")], "id long, v string")
    r = snapshot_diff(old, new, ["id"]).collect()[0]
    assert r["verdict"] == "changed" and r["v_old"] is None and r["v_new"] == "x"


def test_multi_key_and_explicit_compare(spark):
    old = spark.createDataFrame(
        [("a", 1, 10, 99), ("a", 2, 20, 99)], "s string, i long, v long, z long"
    )
    new = spark.createDataFrame(
        [("a", 1, 10, 0), ("a", 2, 25, 99)], "s string, i long, v long, z long"
    )
    got = {
        (r["s"], r["i"]): r["verdict"]
        for r in snapshot_diff(old, new, ["s", "i"], compare_cols=["v"]).collect()
    }
    # z differs on (a,1) but is not compared
    assert got == {("a", 1): "unchanged", ("a", 2): "changed"}


def test_summary_rollup(spark):
    old, new = _pair(spark)
    got = {
        r["verdict"]: r["n_keys"]
        for r in snapshot_diff_summary(
            snapshot_diff(old, new, ["id"])
        ).collect()
    }
    assert got == {"removed": 1, "changed": 1, "unchanged": 2, "added": 1}


def test_guard_empty_keys(spark):
    old, new = _pair(spark)
    with pytest.raises(ValueError):
        snapshot_diff(old, new, [])

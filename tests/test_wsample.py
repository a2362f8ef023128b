"""Weighted priority sampling (llm/wsample.py): python-reference
exactness, exact-below-k regime, weight-proportional inclusion,
aggregate unbiasedness, drop semantics, SQL mirror."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from terra_bonobo_nodes_spark.llm import wsample as W

_ITEMS = [(f"d{i}", (i * 37) % 997 + 1) for i in range(300)]


def _py_q(item_id: str, w: int) -> int:
    h = int(
        hashlib.md5(f"tbns-wsample-v1-{item_id}".encode()).hexdigest()[:15], 16
    ) + 1
    return (w << 60) // h


def _py_report(items, k):
    ranked = sorted(
        ((_py_q(i, w), i, w) for i, w in items), key=lambda t: (-t[0], t[1])
    )
    tau = ranked[k][0] if len(ranked) > k else 0
    sample = ranked[:k]
    return (
        len(items),
        sum(w for _, w in items),
        len(sample),
        tau,
        sum(max(w, tau) for _, _, w in sample),
    )


def _df(spark, items, group="g"):
    return spark.createDataFrame(
        [(group, i, w) for i, w in items], "group string, id string, weight long"
    )


def test_report_matches_python_reference(spark):
    want = _py_report(_ITEMS, 32)
    row = W.priority_sample_report(_df(spark, _ITEMS), k=32).collect()[0]
    assert (
        row["n_rows"], row["total_weight"], row["n_sampled"],
        row["tau"], row["est_weight"],
    ) == want


def test_exact_when_group_fits(spark):
    """tau = 0 and the estimate is EXACT when the group has <= k rows."""
    small = _ITEMS[:10]
    row = W.priority_sample_report(_df(spark, small), k=32).collect()[0]
    assert row["tau"] == 0
    assert row["n_sampled"] == 10
    assert row["est_weight"] == row["total_weight"] == sum(w for _, w in small)


def test_sample_rows_match_python_order(spark):
    got = sorted(
        (r["rank"], r["id"])
        for r in W.priority_sample(_df(spark, _ITEMS), k=8).collect()
    )
    ranked = sorted(
        ((_py_q(i, w), i) for i, w in _ITEMS), key=lambda t: (-t[0], t[1])
    )
    assert got == [(r + 1, ranked[r][1]) for r in range(8)]


def test_heavy_items_sampled_preferentially(spark):
    """Inclusion probability is min(1, w/tau): items with w >= tau are
    ALWAYS in the sample — verify every such item made it."""
    rows = W.priority_sample(_df(spark, _ITEMS), k=32).collect()
    tau = rows[0]["tau"]
    sampled = {r["id"] for r in rows}
    assert tau > 0
    for i, w in _ITEMS:
        if w >= tau:
            assert i in sampled


def test_null_and_nonpositive_dropped(spark):
    df = spark.createDataFrame(
        [("g", "a", 5), ("g", None, 7), ("g", "b", 0), ("g", "c", -3)],
        "group string, id string, weight long",
    )
    row = W.priority_sample_report(df, k=4).collect()[0]
    assert (row["n_rows"], row["total_weight"]) == (1, 5)


def test_k_guard():
    with pytest.raises(ValueError):
        W.priority_sample(None, k=0)
    with pytest.raises(ValueError):
        W.priority_sample_report_sql("SELECT 1", "w", "g", "i", 0)


def test_aggregate_unbiasedness(spark):
    """Across 100 groups the summed estimates land within 5% of the
    summed truths (deterministic given the fixed hash seed)."""
    big = spark.range(30_000).select(
        (F.col("id") % 100).alias("g"),
        F.col("id").cast("string").alias("i"),
        ((F.col("id") * 37) % 997 + 1).alias("w"),
    )
    agg = (
        W.priority_sample_report(big, "w", "g", "i", k=24)
        .agg(F.sum("est_weight").alias("e"), F.sum("total_weight").alias("t"))
        .collect()[0]
    )
    assert abs(agg["e"] / agg["t"] - 1.0) < 0.05


def test_sql_mirror_matches_spark(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE items AS SELECT 'g' AS grp, "
        "concat('d', CAST(i AS VARCHAR)) AS item, (i * 37) % 997 + 1 AS w "
        "FROM range(300) t(i)"
    )
    orow = con.execute(
        W.priority_sample_report_sql("SELECT * FROM items", "w", "grp", "item", 32)
    ).fetchone()
    srow = W.priority_sample_report(_df(spark, _ITEMS), k=32).collect()[0]
    assert tuple(orow) == tuple(srow)


def _nkey(t):
    return tuple((x is None, x) for x in t)


def test_null_group_is_a_real_stratum_on_both_engines(spark):
    """Review finding r15: a NULL group is a window partition on the
    Spark side, so the SQL mirrors must stitch the tau/est joins with
    IS NOT DISTINCT FROM (and the Spark report's group join must be
    null-safe) — otherwise NULL-group rows silently vanish from one
    engine and not the other."""
    rows = [
        (None, "a1", 10), (None, "a2", 20), (None, "a3", 30),
        ("en", "b1", 5), ("en", "b2", 7),
    ]
    df = spark.createDataFrame(rows, "group string, id string, weight long")
    got_sample = sorted(
        ((r["group"], r["id"], r["rank"])
         for r in W.priority_sample(df, k=2).collect()),
        key=_nkey,
    )
    got_report = sorted(
        (tuple(r) for r in W.priority_sample_report(df, k=2).collect()),
        key=_nkey,
    )
    assert sum(1 for g, _, _ in got_sample if g is None) == 2
    assert sum(1 for r in got_report if r[0] is None) == 1
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE nitems AS SELECT * FROM (VALUES "
        "(NULL, 'a1', 10), (NULL, 'a2', 20), (NULL, 'a3', 30), "
        "('en', 'b1', 5), ('en', 'b2', 7)) t(grp, item, w)"
    )
    osample = sorted(
        ((r[0], r[1], r[4])
         for r in con.execute(
            W.priority_sample_sql("SELECT * FROM nitems", "w", "grp", "item", 2)
         ).fetchall()),
        key=_nkey,
    )
    oreport = sorted(
        (tuple(r)
         for r in con.execute(
            W.priority_sample_report_sql(
                "SELECT * FROM nitems", "w", "grp", "item", 2
            )
         ).fetchall()),
        key=_nkey,
    )
    con.close()
    assert got_sample == osample
    assert got_report == oreport

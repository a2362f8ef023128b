"""Plan-level pins for the two 100 TB claims the docstrings make but
no test verified: (a) bucketing removes the shuffle from a key join,
(b) AQE splits a skewed join at runtime. Both are engine behaviors —
pinning them guards against config drift and documents the EXACT
setup (bucket counts must match, AQE thresholds) a deployment needs."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def warehouse(spark, tmp_path):
    # saveAsTable needs a metastore-backed catalog; the session's
    # default warehouse works, with unique table names per run
    return f"t{uuid.uuid4().hex[:10]}"


def test_bucketed_join_plans_no_exchange(spark, warehouse):
    """Write both sides bucketed by the join key into the catalog:
    the sort-merge join then reads co-located buckets and the plan
    contains NO Exchange — the shape snapshot_diff/feature-layer
    docstrings promise for bucketed snapshots. Bucket counts MUST
    match; a mismatch silently reintroduces the shuffle."""
    a_name, b_name = f"{warehouse}_a", f"{warehouse}_b"
    spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("va")
    ).write.bucketBy(8, "k").sortBy("k").saveAsTable(a_name)
    spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("vb")
    ).write.bucketBy(8, "k").sortBy("k").saveAsTable(b_name)
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path: the point is the co-located
        # bucket read, not the broadcast shortcut a 5k-row fixture
        # would otherwise take
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(a_name).join(spark.table(b_name), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan
        assert joined.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql(f"DROP TABLE IF EXISTS {a_name}")
        spark.sql(f"DROP TABLE IF EXISTS {b_name}")


def test_aqe_splits_skewed_join(spark, tmp_path):
    """One key carrying ~all rows on the left side: with AQE skew-join
    thresholds lowered to fixture scale, the final adaptive plan marks
    the sort-merge join skew=true — the runtime remedy the salting
    docstrings point to for hot keys. The action must run on the SAME
    Dataset whose plan is inspected: AQE finalizes per execution, and
    count() would execute a different (re-optimized) plan."""
    left_path = str(tmp_path / "skew_left")
    right_path = str(tmp_path / "skew_right")
    # key 0 holds 400k rows; the md5 pad makes the shuffled bytes
    # INCOMPRESSIBLE — skew detection reads compressed partition
    # sizes, and 400k constant longs compress to KBs (measured: the
    # padless variant coalesces instead of splitting)
    spark.range(400_000).select(
        F.lit(0).alias("k"), F.md5(F.col("id").cast("string")).alias("pad")
    ).union(
        spark.range(9_900).select(
            (F.col("id") % 99 + 1).alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
    ).write.mode("overwrite").parquet(left_path)
    spark.range(100).select(F.col("id").alias("k")).write.mode(
        "overwrite"
    ).parquet(right_path)

    conf_keys = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
        # keep the broadcast path off so the join stays sort-merge
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in conf_keys}
    try:
        for k, v in conf_keys.items():
            spark.conf.set(k, v)
        df = spark.read.parquet(left_path).join(
            spark.read.parquet(right_path), "k"
        ).select("k", "pad")  # keep pad: the skewed bytes must shuffle
        n = len(df.collect())  # action on THIS Dataset finalizes AQE
        assert n == 409_900
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:3000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

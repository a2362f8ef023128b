"""Plan introspection utilities: the "is this the plan I'd want on a
thousand executors" checks, as a user-facing API.

The pytest plan audit (tests/test_plan_audit.py) enforces these on
every registered query; pipelines composing their own DataFrames get
the same checks here — e.g. ``assert_no_cartesian(df)`` before
submitting a week-long job, or ``plan_fingerprint(df)`` logged next to
a run for plan-regression diffing across engine upgrades.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_OPS = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "Exchange",
    "BroadcastExchange",
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "WindowGroupLimit",
    "TakeOrderedAndProject",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "InMemoryTableScan",
    "WholeStageCodegen",
)


def executed_plan(df: DataFrame) -> str:
    """The physical plan string Spark will actually run (post-AQE
    initial plan; AQE may still re-plan at runtime)."""
    return df._jdf.queryExecution().executedPlan().toString()


def plan_fingerprint(df: DataFrame) -> dict[str, object]:
    """Compact, diffable summary of the physical plan: operator counts,
    scan count, and every pushed-filter list. Log it with a job run;
    a changed fingerprint on unchanged code is an engine/statistics
    shift worth knowing about before it costs a cluster-day."""
    plan = executed_plan(df)
    # word-boundary matching: "HashAggregate" must not count every
    # "ObjectHashAggregate", and "Exchange" must not count
    # "BroadcastExchange"/"ReusedExchange" (a reused exchange is not a
    # new exchange of either kind).
    def _count(op: str) -> int:
        return len(re.findall(rf"(?<![A-Za-z]){op}", plan))

    counts = ((op, _count(op)) for op in _OPS)
    fp: dict[str, object] = {op: n for op, n in counts if n > 0}
    n_reused = len(re.findall(r"ReusedExchange", plan))
    if n_reused:
        fp["ReusedExchange"] = n_reused
    if "Exchange" in fp:
        fp["ShuffleExchange"] = fp.pop("Exchange")
    fp["scans"] = len(re.findall(r"Scan parquet|FileScan|LocalTableScan|Scan ExistingRDD", plan))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    if any(p.strip() for p in pushed):
        fp["pushed_filters"] = [p for p in pushed if p.strip()]
    return fp


def assert_no_cartesian(df: DataFrame, allow_broadcast_nlj: bool = False) -> None:
    """Fail fast if the plan contains an unbounded cross product.
    ``allow_broadcast_nlj=True`` permits a deliberately bounded
    BroadcastNestedLoopJoin (bbox-culled spatial joins do this) but an
    unkeyed CartesianProduct is NEVER allowed — there is no bounded
    variant of it. The same rejection the engine-wide test audit
    applies, available at pipeline-build time."""
    plan = executed_plan(df)
    bad_ops = ["CartesianProduct"]
    if not allow_broadcast_nlj:
        bad_ops.append("BroadcastNestedLoopJoin")
    for bad in bad_ops:
        if bad in plan:
            raise ValueError(
                f"plan contains {bad} — an O(n*m) join that will not "
                "survive scale; use an equi-join key (grid cell, LSH "
                "band, salt) or pass allow_broadcast_nlj=True for a "
                "deliberately bounded broadcast NLJ:\n" + plan[:1500]
            )

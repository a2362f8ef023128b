"""Declarative data-quality checks (deequ/dbt-test-style constraints).

A pipeline that ingests 100 TB needs its invariants verified IN the
engine, as one aggregate pass — not by exporting samples. Each check is
a boolean Column; the operator folds every check into a single
partial-aggregatable projection, so validating N constraints costs one
scan and one tiny shuffle regardless of N (the reference validates
row-at-a-time inside node callbacks, e.g. the property coercions in
common.py FilterByProperties/MapProperties — same intent, per-row
Python cost).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_constraints(
    df: DataFrame,
    checks: dict[str, Column],
) -> DataFrame:
    """One row per check: name, total rows, violations (rows where the
    predicate is false OR null — an unevaluable constraint is a
    failing one), pass flag. Single scan, map-side partial aggregation,
    one final row per check."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, pred in checks.items():
        aggs.append(
            F.sum(
                F.when(pred.isNull() | ~pred, 1).otherwise(0)
            ).cast("long").alias(f"_viol_{name}")
        )
    row = df.agg(*aggs)
    stack_args: list[Column] = []
    for name in checks:
        stack_args.append(F.lit(name))
        stack_args.append(F.col(f"_viol_{name}"))
    n = len(checks)
    return row.select(
        F.col("n_rows"),
        F.stack(F.lit(n), *stack_args).alias("check", "n_violations"),
    ).select(
        "check",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


def assert_constraints(df: DataFrame, checks: dict[str, Column]) -> None:
    """Fail fast: raise with the violation summary if any check fails.
    The guard a write pipeline places before its sink."""
    failed = [r for r in check_constraints(df, checks).collect() if not r.passed]
    if failed:
        detail = ", ".join(f"{r.check}: {r.n_violations}/{r.n_rows}" for r in failed)
        raise ValueError(f"data-quality constraints failed: {detail}")

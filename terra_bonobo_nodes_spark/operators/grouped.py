"""Grouped-map operators: per-group imperative algorithms via
``applyInPandas``.

This is the engine's extension point for algorithms that genuinely
cannot be expressed as window/aggregate compositions — each group's
rows materialize as ONE pandas DataFrame in an executor, the algorithm
runs vectorized, and the result streams back as Arrow batches (the
Spark-native replacement for the reference's per-context Python loops,
common.py ContextProcessor). Contract: a group must fit in executor
memory — these are per-entity fits (one user's events), not per-corpus.

Determinism: every function here fixes an explicit total ordering of
the group's rows before computing, so results are independent of
partitioning and arrival order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def pava(y: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Pool-adjacent-violators: the non-decreasing sequence minimizing
    the weighted squared error to ``y``. O(n) stack formulation."""
    means: list[float] = []
    weights: list[float] = []
    counts: list[int] = []
    for yi, wi in zip(y, w):
        m, ww, c = float(yi), float(wi), 1
        while means and means[-1] > m:
            pm, pw, pc = means.pop(), weights.pop(), counts.pop()
            m = (pm * pw + m * ww) / (pw + ww)
            ww += pw
            c += pc
        means.append(m)
        weights.append(ww)
        counts.append(c)
    return np.repeat(means, counts)


def pava_exact(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Integer-exact PAVA over integer values (unit weights): returns
    per-row block means as EXACT fractions ``(num, den)`` where num is
    the block's value sum and den its row count. The violation test is
    integer cross-multiplication — no float enters at any point, so
    the result is bit-identical on any engine that replays the same
    merges, and (because the isotonic solution is unique and pooling
    is confluent) on any engine that replays ANY valid merge order."""
    nums: list[int] = []
    dens: list[int] = []
    for v in values:
        n, d = int(v), 1
        while nums and nums[-1] * d > n * dens[-1]:
            n += nums.pop()
            d += dens.pop()
        nums.append(n)
        dens.append(d)
    return (
        np.repeat(np.asarray(nums, dtype=np.int64), dens),
        np.repeat(np.asarray(dens, dtype=np.int64), dens),
    )


def isotonic_fit_milli(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    cents_col: str,
    out_col: str = "y_iso_milli",
) -> DataFrame:
    """Per-group isotonic fit of an INTEGER value column (e.g. cents),
    surfaced as exact floor-milli units: ``out = (10 * block_sum) div
    block_count`` — pure integer arithmetic end to end, which is what
    makes this fit ORACLE-COMPARABLE where the float form is not
    (round 13's empirical finding: rounded float block means sit on
    decimal boundaries where pooling-vs-minimax noise decides the
    digit; floors of exact fractions have no noise to decide).
    Ordering, grouping, and plan shape are :func:`isotonic_fit`'s."""
    schema_out = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType())]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [x_col, cents_col], kind="mergesort"
        ).reset_index(drop=True)
        c = pdf[cents_col].to_numpy(dtype=np.int64)
        if (c < 0).any():
            # Python's // floors, DuckDB's truncates toward zero — the
            # two agree only on non-negative operands, so a negative
            # value must reject loudly rather than silently diverge
            # from the oracle by one milli.
            raise ValueError(
                "isotonic_fit_milli requires non-negative integer values"
            )
        nums, dens = pava_exact(c)
        pdf[out_col] = (10 * nums) // dens
        return pdf

    return df.groupBy(*group_cols).applyInPandas(fit, schema_out)


def isotonic_fit(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    out_col: str = "y_iso",
) -> DataFrame:
    """Per-group isotonic regression: fit the best non-decreasing curve
    of y over x (monotone calibration / trend smoothing — e.g. a
    quality score that must not decrease with document length, or a
    conversion-rate curve over price). Rows sort by (x, y) inside the
    group for a deterministic fit under x-ties; output keeps all input
    columns plus the fitted value.

    One shuffle on the group key; each group runs the O(n) PAVA stack
    vectorized in its executor. Not SQL-expressible (the pooling is
    data-dependent iteration) — correctness is pinned against an
    independent quadratic reference in pytest."""
    # copy the field list: StructType.add mutates in place, and df.schema
    # hands back the DataFrame's own cached instance
    schema_out = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([x_col, y_col], kind="mergesort").reset_index(drop=True)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        pdf[out_col] = pava(y, np.ones_like(y))
        return pdf

    return df.groupBy(*group_cols).applyInPandas(fit, schema_out)

"""Array-valued operators: array min, accessibility ratio over a matrix.

All higher-order Column expressions — zero UDFs, fully inside
whole-stage codegen (SURVEY.md §2.3 P7/P11, §2.5 A3/A5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def min_array_attribute(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """``MinArrayAttribute`` (``common.py:214-229``): scalar min over an
    array-valued column. ``array_min`` ignores nulls like the reference's
    Python ``min`` would raise — nulls are stripped by Spark's semantics.
    """
    return df.withColumn(out or col, F.array_min(F.col(col)))


def accessibility_ratio_by_time(
    df: DataFrame,
    times_col: str,
    time_limits: Sequence[float],
    out: str = "accessibility_ratio",
) -> DataFrame:
    """``AccessibilityRatioByTime`` (``terra.py:412-447``).

    ``times`` is ``array<array<double>>`` (points x vehicle-modes); a
    point is *reachable* when any mode's time is non-null and <= that
    mode's limit. Output = reachable points / total points.

    Reference semantics preserved: empty/null ``times`` -> row passes
    through with a NULL ratio (``terra.py:433-434``); NULL matrix cells
    count as unreachable for that mode (``terra.py:388-390``).

    Pure higher-order expression (exists + zip_with + filter + size):
    no shuffle, no UDF, survives any scale.
    """
    limits = F.array(*[F.lit(float(x)) for x in time_limits])
    times = F.col(times_col)
    reachable: Column = F.size(
        F.filter(
            times,
            lambda row: F.exists(
                F.zip_with(
                    row, limits, lambda t, lim: t.isNotNull() & (t <= lim)
                ),
                lambda ok: ok,
            ),
        )
    )
    ratio = F.when(
        times.isNull() | (F.size(times) == 0), F.lit(None).cast("double")
    ).otherwise(reachable.cast("double") / F.size(times).cast("double"))
    return df.withColumn(out, ratio)

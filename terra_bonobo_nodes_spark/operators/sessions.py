"""Batch sessionization: gap-based session assignment over event logs.

The streaming layer already has ``session_window_agg`` (Spark's native
``session_window`` with a state store); this is its BATCH twin for the
backfill/replay case — the gaps-and-islands computation every
clickstream warehouse runs: a new session starts when the gap to the
key's previous event exceeds the threshold, session ids are the running
count of session starts.

Scale shape: ONE sort-window per key (lag + running sum share the same
window frame, so Catalyst plans a single Exchange + Sort); the
aggregation then reuses the same partitioning. No joins, no explode —
linear in events, exactly the plan a 100 TB clickstream wants.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    order_cols: Sequence[str] = (),
    session_col: str = "session_seq",
) -> DataFrame:
    """Append ``session_col``: a per-key 1-based session index that
    increments whenever the gap since the key's previous event is
    STRICTLY greater than ``gap_seconds``.

    Bonobo relies on arrival order; here the ordering is explicit
    (SURVEY §4.2): pass ``order_cols`` (e.g. an event id) to break
    equal-timestamp ties deterministically."""
    keys = list(key_cols)
    order = [F.col(ts_col).asc(), *(F.col(c).asc() for c in order_cols)]
    w = Window.partitionBy(*keys).orderBy(*order)
    sec = F.unix_timestamp(F.col(ts_col))
    prev = F.lag(sec).over(w)
    new_session = F.when(
        prev.isNull() | ((sec - prev) > gap_seconds), 1
    ).otherwise(0)
    run = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(session_col, F.sum(new_session).over(run))


def session_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_seconds: int,
    value_col: str | None = None,
    order_cols: Sequence[str] = (),
) -> DataFrame:
    """Sessionize then aggregate: one row per (key..., session_seq) with
    epoch start/end, event count, duration, and (optionally) the exact
    decimal-accumulated value sum — the standard session rollup."""
    keys = list(key_cols)
    s = sessionize(df, keys, ts_col, gap_seconds, order_cols)
    sec = F.unix_timestamp(F.col(ts_col))
    aggs = [
        F.min(sec).alias("session_start"),
        F.max(sec).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max(sec) - F.min(sec)).alias("duration_s"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(20,6)"))
            .cast("double")
            .alias("sum_value")
        )
    return s.groupBy(*keys, "session_seq").agg(*aggs)

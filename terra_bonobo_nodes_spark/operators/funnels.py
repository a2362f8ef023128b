"""Event-sequence analytics: ordered-step conversion funnels and
cohort retention — the two reports every product/events warehouse runs
(public shapes: the Amplitude/Mixpanel funnel and the classic cohort
retention triangle), expressed as combinable aggregates so they hold
at any event volume.

Both are deterministic functions of (user, event_type, timestamp) with
exact integer outputs, so the DuckDB oracles replay them bit-for-bit.

Scale shape (100 TB of events):

- ``conversion_funnel``: ONE groupBy(user) pass computes, per step,
  the earliest timestamp at which the user completed the PREFIX of
  steps up to there (a min/greatest fold over conditional aggregates
  — no per-user sort, no window, no explode), then one tiny count
  aggregate over step flags. Two shuffles total, the second over one
  row per user.
- ``cohort_retention``: first-activity period per user (one combinable
  min), joined back (broadcast at dim-sized cohorts; shuffle-hash
  otherwise on the user key), then one combinable count per (cohort,
  offset) cell — the retention triangle is at most periods^2 rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conversion_funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-step funnel: a user converts through step k iff they
    performed step k at or after the time they completed steps
    1..k-1 IN ORDER (the standard product-analytics semantics — a
    purchase before the first view does not count as view->purchase).
    Emits one row per step: (step_index, step, n_users, n_converted,
    conversion_ppm vs step 1's population).

    The in-order earliest-completion time is a per-user fold:
    ``t_1 = min(ts of step1)``, ``t_k = min(ts of step-k events >=
    t_{k-1})``. Computed WITHOUT a window or sort: conditional
    min-aggregates cannot reference each other inside one pass, so
    the fold runs as k chained conditional aggregations over the SAME
    grouped frame — Catalyst collapses them into one aggregate whose
    partial state is k timestamps per user. NULL users/timestamps are
    dropped (an unattributable event converts nobody)."""
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("conversion_funnel needs at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct")
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        F.col(ts_col).alias("_ts"),
    ).where(
        F.col(user_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isin(*steps)
    )
    # one collect_list-free pass: per user, the sorted event times per
    # step as arrays is NOT needed — only the fold times are. We
    # aggregate min(ts) per (user, step occurrence >= prev) which needs
    # the prev time; express by aggregating ALL candidate times per
    # step as a sorted array ONLY when the step can repeat. To stay
    # array-free we aggregate per (user, step) the full multiset via
    # sort_array(collect_list) — bounded by that user's step events.
    per = ev.groupBy("_u").agg(
        *[
            F.sort_array(
                F.collect_list(F.when(F.col("_t") == s, F.col("_ts")))
            ).alias(f"_ts_{i}")
            for i, s in enumerate(steps)
        ]
    )
    # fold: t_0 = first element of _ts_0; t_k = first element of _ts_k
    # that is >= t_{k-1} (F.filter + element_at — array ops in codegen)
    def _first_at_or_after(arr, prev):
        # single-param lambda closing over the outer column `prev` — a
        # two-param lambda would make Spark bind the second argument
        # to the element INDEX (type mismatch), the classic HOF trap
        return F.try_element_at(F.filter(arr, lambda x: x >= prev), F.lit(1))

    t_prev = F.try_element_at(F.col("_ts_0"), F.lit(1))
    reached = [t_prev]
    for i in range(1, len(steps)):
        t_prev = _first_at_or_after(F.col(f"_ts_{i}"), t_prev)
        reached.append(t_prev)
    flags = per.select(
        *[r.isNotNull().alias(f"_r_{i}") for i, r in enumerate(reached)]
    )
    agg = flags.agg(
        *[
            # coalesce: a global aggregate over ZERO users returns one
            # row of NULL sums — the funnel of an empty corpus is 0
            F.coalesce(
                F.sum(F.when(F.col(f"_r_{i}"), 1).otherwise(0)), F.lit(0)
            ).alias(f"_n_{i}")
            for i in range(len(steps))
        ]
    )
    rows = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("step_index"),
                        F.lit(s).alias("step"),
                        F.col(f"_n_{i}").cast("long").alias("n_users"),
                    )
                    for i, s in enumerate(steps)
                ]
            )
        ).alias("r"),
        F.col("_n_0").alias("_base"),
    )
    return rows.select(
        F.col("r.step_index").alias("step_index"),
        F.col("r.step").alias("step"),
        F.col("r.n_users").alias("n_users"),
        F.when(
            F.col("_base") > 0,
            F.expr("(r.n_users * 1000000) div _base"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("conversion_ppm"),
    )


def conversion_funnel_sql(
    src_sql: str,
    steps: Sequence[str],
    user_expr: str = "user_id",
    type_expr: str = "event_type",
    ts_expr: str = "ts",
) -> str:
    """DuckDB replay of :func:`conversion_funnel`."""
    steps = list(steps)
    step_arrays = ",\n         ".join(
        f"list_sort(list_filter(list(CASE WHEN t = '{s}' "
        f"THEN ts END), x -> x IS NOT NULL)) AS ts_{i}"
        for i, s in enumerate(steps)
    )
    folds = ["ts_0[1] AS r_0"]
    for i in range(1, len(steps)):
        folds.append(
            f"list_filter(ts_{i}, x -> x >= r_{i - 1})[1] AS r_{i}"
        )
    # DuckDB lets a SELECT alias reference earlier aliases in the same
    # list (lateral column alias), matching the Spark fold.
    fold_sql = ",\n         ".join(folds)
    unions = "\nUNION ALL\n".join(
        f"SELECT {i + 1} AS step_index, '{s}' AS step, "
        f"CAST(count(*) FILTER (r_{i} IS NOT NULL) AS BIGINT) AS n_users "
        f"FROM _cf_fold"
        for i, s in enumerate(steps)
    )
    return f"""
WITH _cf_ev AS (
  SELECT {user_expr} AS u, {type_expr} AS t, {ts_expr} AS ts
  FROM ({src_sql})
  WHERE {user_expr} IS NOT NULL AND {ts_expr} IS NOT NULL
    AND {type_expr} IN ({", ".join(f"'{s}'" for s in steps)})
),
_cf_per AS (
  SELECT u,
         {step_arrays}
  FROM _cf_ev GROUP BY u
),
_cf_fold AS (
  SELECT u,
         {fold_sql}
  FROM _cf_per
),
_cf_steps AS (
  {unions}
),
_cf_base AS (SELECT n_users AS base FROM _cf_steps WHERE step_index = 1)
SELECT s.step_index, s.step, s.n_users,
       CAST(CASE WHEN b.base > 0
            THEN (s.n_users * 1000000) // b.base ELSE 0 END AS BIGINT)
         AS conversion_ppm
FROM _cf_steps s CROSS JOIN _cf_base b
"""


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """The retention triangle: users grouped by first-activity period
    (their cohort), counted in every later period they return. Emits
    (cohort, period_offset, n_users, retention_ppm vs the cohort's
    size at offset 0). ``period`` is any ``date_trunc`` unit; offsets
    count whole periods between the truncated timestamps (epoch-diff
    div period-seconds for the fixed-length units used here).

    Plan: one combinable min per user (the cohort), one join back on
    the user key, one distinct on (user, cohort, offset), one
    combinable count per cell, one self-join to the offset-0 column —
    every frame after the first aggregate is user- or cell-grain."""
    secs = {"day": 86400, "week": 7 * 86400}.get(period)
    if secs is None:
        raise ValueError("period must be 'day' or 'week' (fixed-length)")
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.unix_timestamp(F.date_trunc(period, F.col(ts_col))).alias("_p"),
    ).where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
    first = ev.groupBy("_u").agg(F.min("_p").alias("_cohort"))
    cells = (
        ev.join(first, "_u")
        .select(
            "_u",
            "_cohort",
            F.expr("(_p - _cohort) div " + str(secs)).alias("offset"),
        )
        .distinct()
    )
    counts = cells.groupBy("_cohort", "offset").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    base = counts.where(F.col("offset") == 0).select(
        "_cohort", F.col("n_users").alias("_base")
    )
    return counts.join(base, "_cohort").select(
        F.col("_cohort").cast("long").alias("cohort_epoch"),
        F.col("offset").cast("long").alias("period_offset"),
        "n_users",
        F.expr("(n_users * 1000000) div _base").cast("long").alias(
            "retention_ppm"
        ),
    )


def cohort_retention_sql(
    src_sql: str,
    user_expr: str = "user_id",
    ts_expr: str = "ts",
    period: str = "week",
) -> str:
    """DuckDB replay of :func:`cohort_retention`."""
    secs = {"day": 86400, "week": 7 * 86400}[period]
    return f"""
WITH _cr_ev AS (
  SELECT {user_expr} AS u,
         CAST(epoch(date_trunc('{period}', {ts_expr})) AS BIGINT) AS p
  FROM ({src_sql})
  WHERE {user_expr} IS NOT NULL AND {ts_expr} IS NOT NULL
),
_cr_first AS (SELECT u, min(p) AS cohort FROM _cr_ev GROUP BY u),
_cr_cells AS (
  SELECT DISTINCT e.u, f.cohort, (e.p - f.cohort) // {secs} AS p_off
  FROM _cr_ev e JOIN _cr_first f USING (u)
),
_cr_counts AS (
  SELECT cohort, p_off, CAST(count(*) AS BIGINT) AS n_users
  FROM _cr_cells GROUP BY 1, 2
),
_cr_base AS (
  SELECT cohort, n_users AS base FROM _cr_counts WHERE p_off = 0
)
SELECT c.cohort AS cohort_epoch, c.p_off AS period_offset, c.n_users,
       CAST((c.n_users * 1000000) // b.base AS BIGINT) AS retention_ppm
FROM _cr_counts c JOIN _cr_base b USING (cohort)
"""

"""Histogram quantile sketch — bounded-bin mergeable percentiles.

The quantile member of the bounded-memory sketch family (llm/bloom.py
membership, llm/sketch.py frequency, llm/distinct.py cardinality).
An exact percentile over a 100 TB column is a per-group SORT — the
most expensive aggregate shape there is, and one that cannot be
re-aggregated across days without keeping every value. The
equi-width histogram sketch (classic; the fixed-bin special case of
Greenwald-Khanna-style summaries) replaces it with:

- **build** (:func:`histogram_cells`): ``bin = (clamp(x) - lo) *
  bins div (hi - lo)`` then ``groupBy(group, bin).count()`` — a
  BOUNDED key space (``groups * bins``), so the aggregate is
  combinable map-side, runs UNCHANGED over a readStream with
  constant complete-mode state (the cms_cells / hll_registers
  property), and **merges across days by plain addition** of cell
  counts.
- **query** (:func:`histogram_quantiles`): the q-th percentile's bin
  is the first bin whose running count reaches ``ceil(N * q / 100)``
  — a window over at most ``bins`` rows per group. The answer is the
  bin's bounds: the true discrete percentile provably lies inside
  them (every value in a bin is inside the bin by construction), so
  the sketch's error is the bin width — fixed a priori by the
  operator's (lo, hi, bins) contract, not data-dependent.

Everything is exact integer arithmetic over an integer-valued column
(floor divisions via ``div`` / ``//``, thresholds via the
``(N*q + 99) div 100`` ceiling identity), so build AND query replay
bit-for-bit in DuckDB — the llm/sketch.py oracle class. Values
outside [lo, hi] clamp into the edge bins (documented saturation —
a production pipeline sizes the range from a prior profile pass and
alerts on edge-bin mass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _check(lo: int, hi: int, bins: int) -> None:
    if hi <= lo:
        raise ValueError("hi must be > lo")
    if bins < 1:
        raise ValueError("bins must be >= 1")


def histogram_cells(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "group",
    lo: int = 0,
    hi: int = 1 << 20,
    bins: int = 64,
) -> DataFrame:
    """(group, bin, n) histogram cells — the persistable, combinable,
    addition-mergeable sketch artifact. NULL values are dropped (a
    NULL has no position in an order statistic — SQL percentile
    semantics); out-of-range values saturate into bins 0 / bins-1."""
    _check(lo, hi, bins)
    span = hi - lo
    x = F.col(value_col).cast("bigint")
    # NULL filter BEFORE clamping: Spark's greatest/least SKIP NULL
    # operands (greatest(lo, NULL) = lo), so a NULL value would
    # otherwise silently count as lo instead of being dropped
    clamped = F.least(F.lit(hi), F.greatest(F.lit(lo), F.col("_x")))
    staged = (
        df.select(F.col(group_col).alias("group"), x.alias("_x"))
        .where(F.col("_x").isNotNull())
        .select("group", ((clamped - lo) * bins).alias("_scaled"))
    )
    bin_ = F.least(F.lit(bins - 1), F.expr(f"_scaled div {span}"))
    return staged.select("group", bin_.alias("bin")).groupBy(
        "group", "bin"
    ).agg(F.count(F.lit(1)).alias("n"))


def histogram_quantiles(
    cells: DataFrame,
    qs: tuple[int, ...] = (50, 90, 99),
    lo: int = 0,
    hi: int = 1 << 20,
    bins: int = 64,
) -> DataFrame:
    """Per-(group, q) percentile bins from histogram cells: (group, q,
    n_values, qbin, bin_lo, bin_hi). ``bin_hi`` is the exclusive upper
    bound except for the last bin, which closes at ``hi`` (saturation
    bin). The window runs over at most ``bins`` rows per group —
    querying the sketch costs nothing at any corpus size."""
    _check(lo, hi, bins)
    if not qs or any(not 1 <= q <= 100 for q in qs):
        raise ValueError("qs must be integer percents in [1, 100]")
    span = hi - lo
    w_cum = (
        Window.partitionBy("group")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("group")
    cum = cells.select(
        "group",
        "bin",
        F.sum("n").over(w_cum).alias("_cum"),
        F.sum("n").over(w_all).alias("n_values"),
    )
    per_q = cum.withColumn(
        "q", F.explode(F.array(*[F.lit(int(q)) for q in qs]))
    ).where(
        # ceil(N*q/100) as exact integers: (N*q + 99) div 100
        F.col("_cum") >= F.expr("(n_values * q + 99) div 100")
    )
    agg = per_q.groupBy("group", "q").agg(
        F.min("bin").alias("qbin"), F.max("n_values").alias("n_values")
    )
    return agg.select(
        "group",
        "q",
        "n_values",
        "qbin",
        (F.lit(lo) + F.expr(f"(qbin * {span}) div {bins}")).alias("bin_lo"),
        (F.lit(lo) + F.expr(f"((qbin + 1) * {span}) div {bins}")).alias(
            "bin_hi"
        ),
    )


def exact_disc_quantiles(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "group",
    qs: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Exact discrete percentiles (type-1: the value at ascending rank
    ``ceil(N * q / 100)``) — the verification companion. This is the
    per-group SORT the sketch exists to avoid; it rides along in
    oracle-checked rows at test scale only (the
    approx_distinct_users exact-side pattern)."""
    if not qs or any(not 1 <= q <= 100 for q in qs):
        raise ValueError("qs must be integer percents in [1, 100]")
    w_rn = Window.partitionBy("group").orderBy(value_col)
    w_all = Window.partitionBy("group")
    ranked = (
        df.select(
            F.col(group_col).alias("group"),
            F.col(value_col).cast("bigint").alias(value_col),
        )
        .where(F.col(value_col).isNotNull())
        .select(
            "group",
            value_col,
            F.row_number().over(w_rn).alias("_rn"),
            F.count(F.lit(1)).over(w_all).alias("_n"),
        )
    )
    per_q = ranked.withColumn(
        "q", F.explode(F.array(*[F.lit(int(q)) for q in qs]))
    ).where(F.col("_rn") == F.expr("(_n * q + 99) div 100"))
    return per_q.groupBy("group", "q").agg(
        F.min(value_col).alias("exact_q")
    )


def histogram_quantile_sql(
    src_sql: str,
    value_expr: str,
    group_expr: str,
    lo: int,
    hi: int,
    bins: int,
    qs: tuple[int, ...],
) -> str:
    """DuckDB replay of build + query + exact companion: per-(group,
    q) rows (group, q, n_values, qbin, bin_lo, bin_hi, exact_q,
    covers_exact)."""
    _check(lo, hi, bins)
    span = hi - lo
    q_values = ", ".join(f"({int(q)})" for q in qs)
    return f"""
WITH _hq_src AS ({src_sql}),
_hq_vals AS (
  SELECT {group_expr} AS "group",
         CAST({value_expr} AS BIGINT) AS x
  FROM _hq_src WHERE {value_expr} IS NOT NULL
),
_hq_cells AS (
  SELECT "group",
         least({bins - 1},
               ((least({hi}, greatest({lo}, x)) - {lo}) * {bins})
                 // {span}) AS bin,
         CAST(count(*) AS BIGINT) AS n
  FROM _hq_vals GROUP BY 1, 2
),
_hq_cum AS (
  SELECT "group", bin,
         sum(n) OVER (PARTITION BY "group" ORDER BY bin) AS cum,
         sum(n) OVER (PARTITION BY "group") AS n_values
  FROM _hq_cells
),
_hq_q(q) AS (VALUES {q_values}),
_hq_pick AS (
  SELECT c."group", q.q,
         CAST(max(c.n_values) AS BIGINT) AS n_values,
         min(c.bin) AS qbin
  FROM _hq_cum c CROSS JOIN _hq_q q
  WHERE c.cum >= (c.n_values * q.q + 99) // 100
  GROUP BY 1, 2
),
_hq_rank AS (
  SELECT "group", x,
         row_number() OVER (PARTITION BY "group" ORDER BY x) AS rn,
         count(*) OVER (PARTITION BY "group") AS n
  FROM _hq_vals
),
_hq_exact AS (
  SELECT r."group", q.q, min(r.x) AS exact_q
  FROM _hq_rank r CROSS JOIN _hq_q q
  WHERE r.rn = (r.n * q.q + 99) // 100
  GROUP BY 1, 2
)
SELECT p."group", CAST(p.q AS INT) AS q, p.n_values,
       CAST(p.qbin AS BIGINT) AS qbin,
       CAST({lo} + (p.qbin * {span}) // {bins} AS BIGINT) AS bin_lo,
       CAST({lo} + ((p.qbin + 1) * {span}) // {bins} AS BIGINT) AS bin_hi,
       e.exact_q,
       (e.exact_q >= {lo} + (p.qbin * {span}) // {bins}
        AND (e.exact_q < {lo} + ((p.qbin + 1) * {span}) // {bins}
             OR (p.qbin = {bins - 1} AND e.exact_q <= {hi})))
         AS covers_exact
FROM _hq_pick p
JOIN _hq_exact e
  ON e."group" IS NOT DISTINCT FROM p."group" AND e.q = p.q
"""

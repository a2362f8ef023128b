"""Time-series primitives: regular-grid resampling, gap fill, rolling
range windows.

The reference's isochrone accumulation (T1, common.py:519-532) walks an
ordered per-key series row by row; these operators give the same
ordered-series semantics as declarative plans — the resample grid comes
from ``sequence()`` + explode (no driver loop), forward fill is
``last(ignorenulls)`` over an ordered window, and rolling aggregates
use RANGE frames so irregular event spacing is handled by the frame,
not by row counting.

Scale: everything partitions by the series key; per-key state is one
window frame. The only expansion is the resample grid — bounded by
(span / step) per key, stated in the function contract.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    step_seconds: int,
    agg: str = "last",
    max_buckets_per_key: int = 1_000_000,
) -> DataFrame:
    """Resample each key's series onto a regular ``step_seconds`` grid
    and forward-fill empty buckets with the last observed value.

    Two stages, both declarative: (1) bucket-aggregate observations
    (``last`` by timestamp order, or ``avg``/``min``/``max`` — exact
    decimal for avg); (2) explode each key's [min_bucket, max_bucket]
    span with ``sequence()``, left-join the observed buckets, and
    forward-fill via ``last(value, ignorenulls=True)`` over the ordered
    window. Returns ``key..., bucket_ts (epoch s), value, is_filled``.

    The grid explode is the size hazard: a key spanning years at
    1-second steps explodes accordingly — the span/step product is the
    operator's cost model. ``max_buckets_per_key`` FAILS FAST when any
    key's span/step exceeds the cap (same fail-fast contract as
    interval_point_join's bucket-explosion guard): raise the cap
    explicitly, widen the step, or split the key rather than letting a
    single degenerate series explode an executor."""
    b = (F.floor(F.unix_timestamp(F.col(ts_col)) / step_seconds) * step_seconds).cast(
        "long"
    )
    keys = list(key_cols)
    obs = df.select(*keys, b.alias("_b"), F.col(ts_col).alias("_ts"), F.col(value_col))
    if agg == "last":
        per_bucket = obs.groupBy(*keys, "_b").agg(
            F.max_by(F.col(value_col), F.struct("_ts", value_col)).alias("_v")
        )
    elif agg == "avg":
        per_bucket = obs.groupBy(*keys, "_b").agg(
            (
                F.sum(F.col(value_col).cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("_v")
        )
    elif agg in ("min", "max"):
        per_bucket = obs.groupBy(*keys, "_b").agg(
            getattr(F, agg)(F.col(value_col)).alias("_v")
        )
    else:
        raise ValueError(f"unsupported agg {agg!r}: use last/avg/min/max")

    span = per_bucket.groupBy(*keys).agg(
        F.min("_b").alias("_lo"), F.max("_b").alias("_hi")
    )
    # assert_true returns NULL on success; wiring it INTO the explode
    # argument (rather than a separate column) keeps column pruning
    # from optimizing the guard away (interval_point_join convention).
    guard = F.assert_true(
        (F.col("_hi") - F.col("_lo")) / F.lit(step_seconds)
        < F.lit(max_buckets_per_key),
        F.concat(
            F.lit("resample_ffill: a key spans more than "),
            F.lit(str(max_buckets_per_key)),
            F.lit(f" buckets of {step_seconds}s (span "),
            (F.col("_hi") - F.col("_lo")).cast("string"),
            F.lit("s); raise max_buckets_per_key or widen step_seconds"),
        ),
    )
    grid = span.select(
        *keys,
        F.explode(
            F.when(
                guard.isNull(),
                F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step_seconds)),
            )
        ).alias("_b"),
    )
    # explicit observation marker: a bucket can be OBSERVED with an
    # aggregated NULL value (e.g. a sensor emitting NULL during an
    # outage) — that is not a gap. Such buckets keep their NULL and
    # report is_filled=false; only join misses forward-fill.
    joined = grid.join(
        per_bucket.withColumn("_obs", F.lit(True)), [*keys, "_b"], "left"
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_b").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        *keys,
        F.col("_b").alias("bucket_ts"),
        F.when(F.col("_obs").isNotNull(), F.col("_v"))
        .otherwise(F.last("_v", ignorenulls=True).over(wf))
        .alias(value_col),
        F.col("_obs").isNull().alias("is_filled"),
    )


def rolling_range_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    lookback_seconds: int,
    out_prefix: str = "roll_",
) -> DataFrame:
    """Rolling aggregates over a TIME-RANGE frame: for every event, the
    count/exact-sum over the same key's events in the preceding
    ``lookback_seconds`` (inclusive of now). RANGE frames make sparse
    and bursty series correct by construction — a ROWS frame would mix
    wall-clock horizons. One sort-window per key; state is one frame."""
    keys = list(key_cols)
    sec = F.unix_timestamp(F.col(ts_col))
    w = (
        Window.partitionBy(*keys)
        .orderBy(sec)
        .rangeBetween(-lookback_seconds, 0)
    )
    return df.select(
        *keys,
        sec.alias("ts_epoch"),
        F.col(value_col),
        F.count(F.lit(1)).over(w).alias(f"{out_prefix}n"),
        F.sum(F.col(value_col).cast("decimal(20,6)"))
        .over(w)
        .cast("double")
        .alias(f"{out_prefix}sum"),
    )

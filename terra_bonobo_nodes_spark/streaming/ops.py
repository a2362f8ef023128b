"""Streaming operators: event-time windows, stateful dedup, upsert sink.

Scale notes (100 TB / unbounded):
- Watermarks bound ALL state here: windowed aggs evict closed windows,
  dropDuplicatesWithinWatermark evicts seen-keys, session windows merge
  then evict on watermark passage. Without a watermark these are
  unbounded-state queries — every helper takes one.
- Aggregations shuffle on (window, key); Spark's streaming agg does
  partial aggregation before the shuffle exactly like batch.
- The foreachBatch upsert keys each micro-batch overwrite by identifier
  partition — idempotent under retries (exactly-once per epoch), the
  streaming analogue of the reference's windowed delete-then-insert
  sink (terra.py:125-161).
- Custom state uses ``applyInPandasWithState``. Spark 4's successor
  API (``transformWithStateInPandas``) is ENVIRONMENT-BLOCKED here:
  its driver worker imports ``google.protobuf`` for state serde, which
  this container lacks (probed round 6 — StreamingPythonRunner init
  dies with ImportError). Migrate when protobuf is available; the
  operator contracts below are API-agnostic.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(spark: SparkSession, src: str) -> T.StructType:
    """readStream needs an explicit schema; delegate to the memoized
    per-path footer sniff in ``tables.events_schema`` (one read per
    process, no per-call session-config mutation)."""
    from terra_bonobo_nodes_spark.tables import events_schema

    return events_schema(spark, src)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet: nanos→micros like
    tables.load_table, one file per micro-batch capped for test
    determinism. On a real deployment this would be a Kafka/files
    source with the same projection.

    The file source requires a *directory* to monitor; the testdata
    ships events as a single file, so stage a copy into a temp dir
    (read-only testdata must not be touched)."""
    import hashlib
    import shutil
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    tag = hashlib.md5(src.encode()).hexdigest()[:8]
    stage = os.path.join(tempfile.gettempdir(), f"tbns_events_stream_{tag}")
    if not os.path.exists(os.path.join(stage, "events.parquet")):
        os.makedirs(stage, exist_ok=True)
        shutil.copy(src, os.path.join(stage, "events.parquet"))

    from terra_bonobo_nodes_spark.tables import normalize_events_ts

    schema = _events_schema(spark, src)
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    return normalize_events_ts(raw)


def tumbling_window_agg(
    df: DataFrame,
    duration: str = "1 hour",
    watermark: str | None = "2 hours",
    ts_col: str = "ts",
    key: str = "event_type",
) -> DataFrame:
    """Count + sum per (tumbling window, key). Works on batch and
    stream; on a stream the watermark closes windows and evicts state."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration).alias("w"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            key,
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    df: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Count per sliding window — each event lands in duration/slide
    overlapping windows (Spark expands them JVM-side)."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


def session_window_agg(
    df: DataFrame,
    gap: str = "1 hour",
    watermark: str | None = "2 hours",
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Per-key session windows: events closer than ``gap`` merge into
    one session; window end = last event + gap (Spark semantics).
    Streaming state: open sessions per key, merged and evicted as the
    watermark advances."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col(key),
            F.unix_timestamp("w.start").alias("session_start"),
            F.unix_timestamp("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(
    df: DataFrame,
    keys: list[str],
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming dedup with bounded state: a key is remembered only
    until the watermark passes it (duplicates farther apart than the
    watermark are NOT collapsed — that's the state-size contract).
    Batch fallback: plain dropDuplicates."""
    if not df.isStreaming:
        return df.dropDuplicates(keys)
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def line_dedup_stream(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Line-grain dedup for a continuously-ingesting curation stream —
    the streaming face of ``llm/scrub.py::line_dedup``, completing the
    CCNet chain coverage of the streaming front-end (c4 -> gopher ->
    canonical_url -> doc-fingerprint dedup -> THIS).

    Emits kept lines at (``id_col``, ``line_pos``, ``line``) grain.
    Per-document reassembly stays a downstream BATCH regroup on
    purpose: in append mode a document's surviving lines are only
    final once the watermark passes its event time, so gluing them
    back inside the stream would either buffer unbounded per-doc state
    or emit provisional documents.

    SEMANTICS DIVERGENCE, documented: CCNet's corpus-level
    first-OCCURRENCE rule (the ``min(struct(id, pos))`` winner) cannot
    be streamed exactly — a stream must commit keep/drop at ARRIVAL
    time, and the (id, pos)-minimal copy of a line may arrive after a
    later-ordered copy was already emitted downstream; retraction is
    not expressible in append mode. This variant therefore keeps the
    first ARRIVED copy within the watermark horizon (state evicts as
    the watermark passes — duplicates farther apart than ``watermark``
    both survive, the ``dedup_within_watermark`` contract), which
    EQUALS the batch semantics exactly when arrival order follows
    (id, pos) order — the ordered-backfill case the parity test pins.
    State is one md5 key (32 hex chars) per distinct line in the
    horizon, not the line text.

    Batch fallback: the same combinable min-struct winner election as
    ``line_dedup`` at this grain (corpus-level first occurrence), so
    batch callers get CCNet semantics from the identical call.
    """
    from terra_bonobo_nodes_spark.llm.text import nonempty_trimmed_lines

    # the SAME line grain as scrub.line_dedup (shared helper) so batch
    # and stream can never disagree about what a line is
    lines_arr = nonempty_trimmed_lines(F.coalesce(F.col(text_col), F.lit("")))
    ex = df.select(
        F.col(id_col),
        F.col(ts_col),
        F.posexplode(lines_arr).alias("line_pos", "line"),
    ).withColumn("line_fp", F.md5("line"))
    if not df.isStreaming:
        winners = ex.groupBy("line_fp").agg(
            F.min(F.struct(id_col, "line_pos")).alias("_w")
        )
        return (
            ex.join(winners, "line_fp")
            .where(F.struct(F.col(id_col), F.col("line_pos")) == F.col("_w"))
            .select(id_col, ts_col, "line_pos", "line", "line_fp")
        )
    return (
        ex.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["line_fp"])
        .select(id_col, ts_col, "line_pos", "line", "line_fp")
    )


_RUNNING_STATE_SCHEMA = "total DOUBLE, n BIGINT"
_RUNNING_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("running_total", T.DoubleType()),
        T.StructField("running_n", T.LongType()),
    ]
)


def running_totals_with_state(
    df: DataFrame,
    timeout_duration: str = "30 minutes",
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (sum, count) emitted on every update; state expires after
    ``timeout_duration`` of event-time silence. This is the engine's
    UDAF-with-lifecycle extension point — the analogue of the
    reference's ContextProcessor+ValueHolder accumulation pattern
    (common.py:522-532, common.py:550-564) with explicit, bounded,
    fault-tolerant state instead of an in-memory dict."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        total, n = state.get if state.exists else (0.0, 0)
        for pdf in pdfs:
            total += float(pdf["value"].sum())
            n += int(len(pdf))
        state.update((total, n))
        if state.getCurrentWatermarkMs() > 0:
            state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + 30 * 60 * 1000
            )
        yield pd.DataFrame(
            {"user_id": [key[0]], "running_total": [total], "running_n": [n]}
        )

    return (
        df.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_RUNNING_OUT_SCHEMA,
            stateStructType=_RUNNING_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def upsert_foreach_batch(
    target_dir: str,
    id_col: str = "identifier",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink: last-writer-wins upsert into a parquet
    directory hash-partitioned by identifier bucket.

    Per micro-batch: dedupe batch rows by id (epoch-max wins), read the
    current target, anti-join out replaced ids, write the union back via
    the staged-swap protocol (write ``__next__``, rename over target —
    crash-safe, see ``sinks/atomic.py``). Idempotent per epoch id — a
    retried batch rewrites the same rows. A *missing* target means an
    empty store; any other read failure propagates rather than silently
    discarding previously stored rows. (With Delta available this is
    MERGE, mirroring the reference's transactional window flush at
    terra.py:155-161.)"""

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        from terra_bonobo_nodes_spark.sinks.atomic import (
            read_parquet_or_none,
            staged_overwrite,
        )

        spark = batch.sparkSession
        deduped = batch.dropDuplicates([id_col])
        current = read_parquet_or_none(spark, target_dir)
        if current is None:
            out = deduped
        else:
            keep = current.join(
                F.broadcast(deduped.select(id_col)), id_col, "left_anti"
            )
            out = keep.unionByName(deduped)
        staged_overwrite(out, target_dir)

    return write_batch


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    left_filter: str = "purchase",
    right_filter: str = "view",
    lookback: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join with an event-time interval condition: each
    left event (e.g. a purchase) joins the same key's right events
    (e.g. views) from the preceding ``lookback`` window — the streaming
    attribution join. ``how`` is ``inner`` or ``left_outer``; outer
    emits the unmatched left row with NULL right columns once the right
    watermark passes its interval (streaming) or immediately (batch).

    Both sides are watermarked; the interval condition
    ``right.ts IN [left.ts - lookback, left.ts]`` plus the watermarks
    lets Spark BOUND the join state: buffered right rows are evicted
    once older than ``watermark + lookback`` relative to the left
    watermark (Structured Streaming's interval-join state cleanup).
    Without the time bounds a stream-stream join buffers both sides
    forever — this shape is the difference between a runnable and an
    OOM-bound pipeline on an unbounded source.

    Works identically on batch DataFrames (the interval condition is
    just a theta predicate there), which is how the test oracles it.
    """
    lhs = left.where(F.col("event_type") == left_filter).select(
        F.col(on).alias("l_key"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
        F.col("value").alias("l_value"),
    )
    rhs = right.where(F.col("event_type") == right_filter).select(
        F.col(on).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    if left.isStreaming:
        lhs = lhs.withWatermark("l_ts", watermark)
    if right.isStreaming:
        rhs = rhs.withWatermark("r_ts", watermark)
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    if how not in ("inner", "left_outer", "leftOuter"):
        raise ValueError(
            f"how={how!r}: stream-stream interval joins support inner "
            "and left_outer (right/full outer would hold unbounded "
            "right-side state under this condition shape)"
        )
    return lhs.join(rhs, cond, how).select(
        F.col("l_event_id"),
        F.col("l_key").alias(on),
        F.col("l_ts"),
        F.col("r_event_id"),
        F.col("r_ts"),
        F.col("l_value"),
    )


def stream_static_enrich(
    events: DataFrame,
    dim: DataFrame,
    key_expr: Column,
    dim_key: str,
    how: str = "inner",
) -> DataFrame:
    """Stream-static join: enrich an (unbounded) event stream with a
    bounded dimension table. The static side is broadcast — each
    micro-batch joins map-side with ZERO stream-side shuffle and no
    state store at all (the static side is re-resolved per batch, so a
    dim refresh is picked up on the next trigger). This is the
    streaming analogue of the reference's per-record enrichment lookups
    (common.py GeoCommands context queries) without the N+1 round
    trips.

    ``key_expr`` (the stream-side join key Column) and ``dim_key`` are
    REQUIRED: an earlier default of ``user_id % 25`` baked this repo's
    synthetic testdata mapping into the library, so a real caller
    omitting it would silently join on garbage (ADVICE_r05). Works
    identically in batch mode, which is how the oracle checks it.
    """
    if key_expr is None:
        raise ValueError(
            "stream_static_enrich: key_expr is required — there is no "
            "sensible default stream-side join key"
        )
    lhs = events.withColumn("_dim_key", key_expr.cast("int"))
    rhs = F.broadcast(dim.withColumnRenamed(dim_key, "_dim_key"))
    return lhs.join(rhs, "_dim_key", how).drop("_dim_key")

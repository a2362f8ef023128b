"""Structured Streaming capability layer.

The reference's streams are finite Bonobo batch streams — its only
stateful behaviors are windowed sink flushes, end-of-stream aggregate
emission, and teardown retention (SURVEY.md §2.7, reference
terra.py:128-163, common.py:550-564). This package supplies the real
streaming upgrades: event-time windows (tumbling/sliding/session) with
watermarks, stateful dedup, arbitrary state via applyInPandasWithState,
and an idempotent foreachBatch upsert sink.

Every window operator is expressed so the SAME function works on a
batch DataFrame (driver's DuckDB-oracle correctness gate) and on a
readStream DataFrame (pytest drives availableNow → memory sink).
"""

from terra_bonobo_nodes_spark.streaming.ops import (  # noqa: F401
    dedup_within_watermark,
    read_events_stream,
    running_totals_with_state,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
    upsert_foreach_batch,
)

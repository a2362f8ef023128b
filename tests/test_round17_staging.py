"""Late-r17 staging: the two r18 consolidation surfaces' scale
contracts, pinned at authoring time (the test_round16_fixes.py
pattern — the plan shape is part of what gets promoted, not just the
oracle hash).

s_document_roundtrip_surface is STAGED (CANDIDATES head) for r18
registration, retiring s1/s2/s8/s9. j2_overlay_surface was REGISTERED
late r17 (retiring the three j2 rows) when the dissolve rect fast
path changed its retirees' code — registry.py addendum.
"""

from __future__ import annotations

import contextlib
import io

from tests.conftest import SF_DIR


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_document_roundtrip_surface_plan_shape(spark):
    """Four codec legs, zero joins: the only shuffles are the four
    per-source packing aggregates, parsing is JVM-side for csv/jsonl
    (from_csv/from_json — no Python eval) and Arrow-batched for
    zip/geojson (mapInPandas, never row-at-a-time), and the documents
    scan prunes to exactly the five used columns."""
    from terra_bonobo_nodes_spark.plans.queries_candidates import (
        s_document_roundtrip_surface,
    )

    plan = _formatted_plan(s_document_roundtrip_surface(spark, SF_DIR))
    assert "Cartesian" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    # a pure pack-parse union: no join operator of any kind
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # column pruning reaches the scan (order as Spark emits it)
    assert (
        "struct<doc_id:bigint,text:string,lang:string,"
        "source:string,n_chars:bigint>" in plan
    )
    # exactly two Arrow-batched explodes (zip_reader + geojson_reader;
    # formatted plans list each operator twice — tree + details)
    assert plan.count("MapInPandas") == 4
    # exactly one applyInPandas (the zip packer)
    assert plan.count("FlatMapGroupsInPandas") == 2


def test_j2_overlay_surface_plan_shape(spark):
    """Three overlay strategies on one row: no cartesian pair
    generation (envelope/grid candidates only), no row-at-a-time
    Python, and both customer scans prune to their used columns."""
    from terra_bonobo_nodes_spark.plans.queries_candidates import (
        j2_overlay_surface,
    )

    plan = _formatted_plan(j2_overlay_surface(spark, SF_DIR))
    assert "Cartesian" not in plan
    assert "BatchEvalPython" not in plan
    assert "struct<c_custkey:bigint,c_acctbal:double>" in plan
    assert "struct<c_custkey:bigint>" in plan


def test_surfaces_head_the_candidate_rank():
    """The r18 ledger registers the document surface FIRST (its four
    retirement partners fund the llm promotions behind it); the
    CANDIDATES dict order is the promotion rank, so it must head the
    queue — and j2_overlay_surface must be REGISTERED, not queued
    (late-r17 early execution)."""
    from terra_bonobo_nodes_spark.plans.queries_candidates import CANDIDATES
    from terra_bonobo_nodes_spark.plans.registry import all_queries

    names = list(CANDIDATES)
    assert names[0] == "s_document_roundtrip_surface"
    assert "j2_overlay_surface" not in names
    assert all_queries()["j2_overlay_surface"].headline

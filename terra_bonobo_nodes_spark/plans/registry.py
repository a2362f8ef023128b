"""Registry of correctness queries: Spark plan + DuckDB oracle SQL pairs.

Each entry exercises one operator (or a small composition) from
SURVEY.md §2 on the driver's parquet tables. Conventions that keep the
driver's order-insensitive value-hash comparison stable across engines:

- every float output is ``round(x, 4..6)`` in BOTH the Spark plan and
  the oracle SQL (kills summation-order last-ulp drift);
- no raw arrays/structs/timestamps in oracle-checked outputs — arrays
  are reduced or joined to strings, timestamps cast to epoch BIGINT;
- every computed column is aliased identically on both sides.

Queries whose semantics are not SQL-expressible (streaming state,
geometry kernels without a DuckDB spatial extension) register with
``oracle=None`` → the driver records a weaker rows-only check, and the
full semantics are covered by pytest unit tests instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    headline: bool = False  # included in bench.py
    tags: tuple[str, ...] = field(default=())


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name, fn, oracle, headline, tags)
        return fn

    return deco


# Driver-check ordering. The correctness driver walks the registry in
# dict order and stops at a cap (~50 of the registered queries per
# round), so order is part of the verification contract. THE RULE
# (standing, survives rounds): (1) queries with NO driver row ever go
# first; (2) queries whose underlying operator code CHANGED since their
# last green row go next — a green row for old code is not a green row;
# (3) stale greens (rotated out by the cap in later rounds) next,
# cheapest first; (4) freshest greens last, where a cap costs least.
# At the end of every round, move anything the round touched into
# section (2).
_PRIORITY: tuple[str, ...] = (
    # --- (1) never had a driver row (new in round 3) ---
    "g7b_transform_lambert93",
    "g7c_transform_utm",
    "llm_repetition_ratios",
    "j1_bigbig_grid_intersect",
    "llm_embedding_cosine_pairs_blocked",
    # --- (2) operator code changed since last green row ---
    "llm_minhash_lsh_pairs",  # r2: shingle hash md5 -> hash32_poly
    "llm_dedup_components",  # r2: pointer-jumping; r3: +1 convergence pass
    "llm_ivf_ann_topk",  # r2 rewrite (numpy Lloyd); rows-only by design
    "j1_boolean_intersect",  # r3: refactored to shared _j1_inputs
    "j2_concave_overlay_percent",  # r3: convex fast path in overlay kernel
    "j2_intersection_percent_by_area",  # r3: same kernel
    "j2_dissolve_overlapping_layer",  # r3: same kernel
    "j3_intersection_geom_area",  # r3: same kernel
    "j5_attribute_from_sql",  # r3: regression fix
    "llm_multimodal_decode",  # r3: real BMP decode path
    # --- (3) green in r01 only (stale — cap rotated them out of r02) ---
    "p6_map_properties",
    "p2_generate_identifier_md5",
    "g2_point_from_attributes",
    "fn_window_surface",
    "fn_stats_surface",
    "fn_string_surface",
    "p11_accessibility_ratio",
    "g6_simplify_zigzag",
    "g8_subdivide_area",
    "g9_line_clip_length",
    "pipeline_es_indexing",
    "pipeline_file_import",
    "llm_embedding_cosine_pairs",
    "llm_simhash_pairs",
    "llm_ngram_jaccard_pairs",
    "llm_lsh_ann_topk",
    # --- (4) green in r02 (freshest), cheapest first ---
    "llm_token_count",
    "llm_bpe_token_count",
    "p3_exclude_attributes",
    "p4_filter_attributes",
    "p1_identifier_from_property",
    "t1_running_lag_diff",
    "a4_grid_cluster_collect_sum",
    "llm_exact_dedup_groups",
    "p9_drop_identifier",
    "llm_lang_id",
    "p5_filter_by_properties",
    "llm_quality_score",
    "fn_datetime_surface",
    "p10_hstore_parse",
    "pipeline_osm_clusters",
    "p7_min_array_attribute",
    "g5_force_2d",
    "a2_union_area_dissolve",
    "llm_cosine_topk",
    "fn_math_array_surface",
    "g7_transform_mercator",
    "a2_union_on_property_centroid",
    "g1_geojson_attribute_roundtrip",
    "t1_isochrone_subtraction_geo",
    "k5_retention_filter",
    "topk_orders_per_customer",
    "s3_sql_extract_decimals",
    "rollup_order_priority",
    "tpch_q1_pricing_summary",
    "cube_returnflag_status",
    "e3_transit_time_one_to_one",
    "stream_sliding_window_agg",
    "stream_props_json_rollup",
    "stream_tumbling_window_agg",
    "j4_knn_closest_features",
    "j4_knn_closests_list",
    "j4_grid_knn_bigbig",
    "e2_transit_time_one_to_many",
    "s1_csv_document_roundtrip",
    "semi_anti_orders_with_returns",
    "s8_zip_reader_roundtrip",
    "star_join_revenue_by_region",
    "s5_k2_es_roundtrip",
    "stream_session_window_agg",
    "setops_customer_segments",
    "s2_geojson_reader_roundtrip",
    "e1_isochrone_calculation",
    "k1_upsert_last_writer_wins",
)


def all_queries() -> dict[str, Query]:
    # Import side-effect modules that populate the registry.
    from terra_bonobo_nodes_spark.plans import (  # noqa: F401
        queries_functions,
        queries_geo,
        queries_llm,
        queries_pipelines,
        queries_relational,
        queries_sources,
        queries_streaming,
    )

    rank = {name: i for i, name in enumerate(_PRIORITY)}
    ordered = sorted(_REGISTRY.items(), key=lambda kv: rank.get(kv[0], len(rank)))
    return dict(ordered)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark_fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle}

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
# dict order and stops at a cap (round 1 recorded exactly the first 50
# of 74 declared queries), so order is part of the verification
# contract: queries with no green driver row yet go FIRST (cheapest
# first — measured at sf0.01), already-verified ones follow, and the
# most expensive verified queries go last where a cap costs the least.
# Names not listed here keep registration order after the listed ones.
_PRIORITY: tuple[str, ...] = (
    # --- no driver correctness row in round 1 ---
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
    "j5_attribute_from_sql",
    "setops_customer_segments",
    "s2_geojson_reader_roundtrip",
    "e1_isochrone_calculation",
    "k1_upsert_last_writer_wins",  # row exists but was the cap edge
    # --- new this round (no row yet by definition) ---
    "g7b_transform_lambert93",
    "j1_bigbig_grid_intersect",
    "llm_embedding_cosine_pairs_blocked",
    # --- verified in round 1, cheapest first ---
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
    "llm_multimodal_decode",
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
    "p6_map_properties",
    "p11_accessibility_ratio",
    "fn_window_surface",
    "pipeline_es_indexing",
    "g8_subdivide_area",
    "g6_simplify_zigzag",
    "fn_stats_surface",
    "llm_ivf_ann_topk",
    "pipeline_file_import",
    "j3_intersection_geom_area",
    "fn_string_surface",
    "g9_line_clip_length",
    "j2_concave_overlay_percent",
    "p2_generate_identifier_md5",
    "llm_embedding_cosine_pairs",
    "g2_point_from_attributes",
    "j1_boolean_intersect",
    "llm_lsh_ann_topk",
    "llm_simhash_pairs",
    "j2_intersection_percent_by_area",
    "llm_ngram_jaccard_pairs",
    "llm_minhash_lsh_pairs",
    "j2_dissolve_overlapping_layer",
    "llm_dedup_components",
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

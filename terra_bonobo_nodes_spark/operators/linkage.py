"""Record linkage: blocked fuzzy matching on edit distance.

The entity-resolution counterpart of the LLM dedup family — the
reference's users dedupe FEATURES by identifier (K1 upsert), but real
ingests also need "same entity, differently spelled" matching across
names/labels. Same scale discipline as llm/dedup.py: candidate pairs
come ONLY from an equi-join on a blocking key (never a cross product),
oversized blocks are dropped by a df cap (the max_shingle_df /
max_band_bucket convention), and the verdict metric — Levenshtein —
is an exact integer identical on every engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def default_block(name_col: str) -> Column:
    """First lowercase token: the classic phonetic-lite blocking key."""
    return F.split(F.lower(F.col(name_col)), " ").getItem(0)


def fuzzy_match_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 3,
    block: Column | None = None,
    max_block_size: int = 10_000,
    with_metrics: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Candidate pairs (id_a, id_b, name_a, name_b, distance) with
    ``levenshtein(name_a, name_b) <= max_distance``, generated inside
    equi-join blocks only.

    ``max_block_size`` drops blocks with more members than the cap
    (a degenerate key like an empty first token would otherwise go
    quadratic); dropped blocks carry no discriminating signal anyway.
    The drop is OBSERVABLE, not silent: with ``with_metrics=True`` the
    return value is ``(pairs, metrics)`` where ``metrics`` is a 1-row
    DataFrame ``(n_hot_blocks, n_dropped_rows)`` — the blocks excluded
    by the cap and the input rows that went with them, the numbers a
    production run logs alongside its result. (A companion DataFrame
    rather than ``df.observe``: AQE's empty-relation propagation can
    remove a CollectMetrics node together with an empty join side, so
    observed metrics vanish exactly when everything — or nothing — was
    capped. The companion aggregate is one cheap extra job over the
    same block counts.)

    Plan: one shuffle on the blocking key for the cap aggregate, a
    broadcast anti-join of the (small) hot-block set, one equi-join on
    the block key, codegen levenshtein filter. Pair order is canonical
    on (id, name) struct ordering, so results are set-stable AND
    duplicate id values (a messy ingest — exactly linkage territory)
    still pair as long as their names differ; identical (id, name)
    rows are true self-pairs and are skipped."""
    b = block if block is not None else default_block(name_col)
    rows = df.select(
        F.col(id_col).alias("_id"), F.col(name_col).alias("_name"), b.alias("_blk")
    )
    agged = rows.groupBy("_blk").agg(F.count(F.lit(1)).alias("_n"))
    hot = agged.where(F.col("_n") > max_block_size)
    rows = rows.join(F.broadcast(hot.select("_blk")), "_blk", "left_anti")
    a = rows.select(
        F.col("_blk"), F.col("_id").alias("id_a"), F.col("_name").alias("name_a")
    )
    c = rows.select(
        F.col("_blk"), F.col("_id").alias("id_b"), F.col("_name").alias("name_b")
    )
    pairs = (
        a.join(c, ["_blk"])
        .where(
            F.struct(F.col("id_a"), F.col("name_a"))
            < F.struct(F.col("id_b"), F.col("name_b"))
        )
        .withColumn("distance", F.levenshtein("name_a", "name_b").cast("long"))
        .where(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "name_a", "name_b", "distance")
    )
    if not with_metrics:
        return pairs
    metrics = agged.agg(
        F.coalesce(F.sum(F.when(F.col("_n") > max_block_size, 1)), F.lit(0))
        .cast("long")
        .alias("n_hot_blocks"),
        F.coalesce(
            F.sum(F.when(F.col("_n") > max_block_size, F.col("_n"))), F.lit(0)
        )
        .cast("long")
        .alias("n_dropped_rows"),
    )
    return pairs, metrics


def golden_record(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_distance: int = 3,
    block: Column | None = None,
    max_block_size: int = 10_000,
) -> DataFrame:
    """Entity resolution end to end: fuzzy pairs → connected components
    → one GOLDEN RECORD per entity — the master-data step after
    :func:`fuzzy_match_pairs` says "these records are the same thing".

    Every input record maps to an entity: members of a match component
    take the component's id (min member id, from
    ``llm.dedup.connected_components``' pointer-jumping label
    propagation); unmatched records are singleton entities of
    themselves. Per entity the survivor name is elected
    deterministically — longest name wins, ties break lexicographically
    last — the usual most-informative-value policy, partitioning-proof
    because it is a pure struct max.

    Returns ``(entity_id, n_members, canonical_name)``.

    Plan: the pair generation and component iteration dominate (see the
    respective operators); the merge itself is one left join of the
    records against the (small — only matched ids) component map plus
    one aggregate. Scale-safe wherever the two inputs are.
    """
    from terra_bonobo_nodes_spark.llm.dedup import connected_components

    pairs = fuzzy_match_pairs(
        df, id_col, name_col, max_distance, block, max_block_size
    )
    comp = connected_components(pairs.select("id_a", "id_b")).select(
        F.col("doc_id").alias(id_col), "component_id"
    )
    mapped = df.select(id_col, name_col).join(comp, id_col, "left").select(
        F.coalesce(F.col("component_id"), F.col(id_col)).alias("entity_id"),
        F.col(name_col),
    )
    pick = F.max(
        F.struct(
            F.length(name_col).alias("l"), F.col(name_col).alias("n")
        )
    )
    return mapped.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        pick["n"].alias("canonical_name"),
    )

"""Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
embedding space with a k-means codebook, then prune cosine
near-duplicates WITHIN each cluster — the curation step that removes
semantically redundant documents exact/MinHash dedup cannot see
(paraphrases, templated rewrites, translations of boilerplate).

This module is a COMPOSITION of already-verified operators, the
``llm_dedup_keep_policy`` pattern applied to the embedding column:

- codebook: :func:`llm.similarity.ivf_train` (bounded-sample k-means —
  TakeOrdered sample, driver-side Lloyd iterations on k×dim floats);
- assignment: :func:`llm.similarity.assign_cells` (one Arrow-batched
  scan, codebook in the closure);
- candidate pairs: :func:`llm.dedup.embedding_cosine_pairs` with
  ``block_col`` = the cell id, so the pair join keys on the cluster
  first — NO cross-cluster pair is ever materialized;
- grouping + survivor election: :func:`llm.dedup.connected_components`
  (pointer-jumping) + the keep-policy window.

100 TB shape: the only quadratic term is per-cluster pair generation,
bounded by cluster size — size ``n_clusters`` so the expected cluster
holds ~|corpus|/n_clusters rows (the paper uses ~√N clusters at the
100M-document scale for exactly this reason). The blocked join is a
plain equi-join on the cell id; a pathologically hot cell is visible
in the join's task skew and fixable by raising ``n_clusters`` (finer
cells), not by a code change.

BY-DESIGN RECALL TRADE (the published algorithm's, not an
implementation gap): duplicates whose embeddings land in DIFFERENT
cells are not compared — k-means cells are Voronoi regions, so
near-identical vectors co-locate except near cell boundaries. Raising
``n_clusters`` tightens clusters but widens the boundary surface;
the paper accepts this (and so does this operator, pinned by test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.95,
    iterations: int = 3,
    sample_size: int = 65536,
    centroids: list[list[float]] | None = None,
    cell_col: str | None = None,
    prefer_col: str | None = None,
    with_metrics: bool = False,
    cc_max_iterations: int = 24,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Per-row semantic-dedup verdict: ``(id_col, cell, component_id,
    is_kept)``. One survivor per near-duplicate component — the row
    with the highest ``prefer_col`` (e.g. a quality score; ties and
    the default policy go to the smallest id). Singletons keep
    themselves, as their own component.

    ``with_metrics=True`` returns ``(verdicts, metrics)`` with a 1-row
    companion DataFrame ``(n_cells_used, max_cell_rows, mean_cell_rows)``
    — the skew watch for the quadratic per-cell pair term (a hot cell
    means raise ``n_clusters``). Companion DataFrame, not
    ``df.observe``, for the AQE empty-side reason documented at
    ``scrub.remove_boilerplate``.

    An empty corpus returns an empty, well-formed result (the round-9
    degenerate-input contract); a corpus smaller than ``n_clusters``
    trains on as many cells as it has rows — the codebook shrinks, the
    semantics do not.

    Codebook seams, in precedence order: ``cell_col`` names an already-
    assigned blocking column (e.g. ``kmeans.kmeans_fixed`` clusters) and
    skips training AND assignment; ``centroids`` supplies a literal
    codebook and skips training; otherwise ``ivf_train`` learns one.
    """
    from terra_bonobo_nodes_spark.llm.dedup import (
        connected_components,
        embedding_cosine_pairs,
    )
    from terra_bonobo_nodes_spark.llm.similarity import assign_cells, ivf_train

    out_schema = (
        f"{df.schema[id_col].dataType.simpleString()}"  # id type follows input
    )
    if cell_col is not None:
        # PRE-ASSIGNED cells (e.g. kmeans.kmeans_fixed clusters — the
        # llm_semdedup_kmeans_e2e seam): skip codebook training and
        # assignment entirely and run the operator's distributed body
        # (blocked pairing, components, election) on the caller's
        # blocking. Mutually exclusive with centroids= by construction.
        if centroids is not None:
            raise ValueError("pass centroids= or cell_col=, not both")
        assigned = (
            df if cell_col == "cell"
            else df.withColumn("cell", F.col(cell_col).cast("int"))
        )
        return _dedup_from_cells(
            assigned, id_col, vec_col, threshold, prefer_col,
            with_metrics, cc_max_iterations,
        )
    if centroids is None:
        # bounded probe: LIMIT 4k stops the scan after 4*n_clusters
        # rows — O(k), not a corpus count. The codebook shrinks so each
        # cell expects >= 4 rows: a tiny corpus must NOT degenerate to
        # one-point-per-cell (that would silently disable dedup — every
        # point alone in its Voronoi region); at the small-n limit one
        # cell = exact all-pairs, which is affordable exactly there.
        n_avail = df.select(id_col).limit(4 * int(n_clusters)).count()
        if n_avail == 0:
            spark = df.sparkSession
            empty = spark.createDataFrame(
                [],
                f"{id_col} {out_schema}, cell INT, "
                f"component_id {out_schema}, is_kept BOOLEAN",
            )
            if with_metrics:
                return empty, _cell_metrics_empty(spark)
            return empty
        centroids = ivf_train(
            df,
            n_clusters=min(int(n_clusters), max(1, int(n_avail) // 4)),
            iterations=iterations,
            id_col=id_col,
            vec_col=vec_col,
            sample_size=sample_size,
        )

    assigned = assign_cells(df, centroids, vec_col=vec_col, out_col="cell")
    return _dedup_from_cells(
        assigned, id_col, vec_col, threshold, prefer_col,
        with_metrics, cc_max_iterations,
    )


def _dedup_from_cells(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    prefer_col: str | None,
    with_metrics: bool,
    cc_max_iterations: int,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """The operator's distributed body — cell-blocked pairing,
    connected components, survivor election — shared by the trained-
    codebook, literal-codebook and pre-assigned ``cell_col`` paths."""
    from terra_bonobo_nodes_spark.llm.dedup import (
        connected_components,
        embedding_cosine_pairs,
    )

    pairs = embedding_cosine_pairs(
        assigned,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        block_col="cell",
    )
    # cc_max_iterations=24 (vs connected_components' default 10): cosine
    # near-dup graphs at moderate thresholds are CHAIN-shaped (observed
    # sf0.1: 1645 edges / 1603 nodes / 111 components — ~1 edge per
    # node), and chain diameter grows with corpus size, so the default
    # cap genuinely exhausts (reproduced at sf0.1, round 12). The
    # fixed-point check stops the loop early whenever convergence is
    # faster, so the higher cap costs nothing on small graphs.
    comp = connected_components(
        pairs.select("id_a", "id_b"), max_iterations=cc_max_iterations
    ).select(F.col("doc_id").alias(id_col), "component_id")
    prefer = (
        [F.col(prefer_col).desc()] if prefer_col is not None else []
    )
    keep_cols = [id_col, "cell"] + ([prefer_col] if prefer_col else [])
    full = assigned.select(*keep_cols).join(comp, id_col, "left").withColumn(
        "component_id", F.coalesce(F.col("component_id"), F.col(id_col))
    )
    w = Window.partitionBy("component_id").orderBy(
        *prefer, F.col(id_col).asc()
    )
    verdicts = (
        full.withColumn("_rn", F.row_number().over(w))
        .select(
            id_col,
            "cell",
            "component_id",
            (F.col("_rn") == 1).alias("is_kept"),
        )
    )
    if not with_metrics:
        return verdicts
    # one extra job over one assignment scan: per-cell row counts,
    # reduced to the three numbers the skew watch needs
    cell_sizes = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("_n"))
    metrics = cell_sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells_used"),
        F.coalesce(F.max("_n"), F.lit(0)).cast("long").alias("max_cell_rows"),
        F.coalesce(F.round(F.avg("_n"), 2), F.lit(0.0)).alias("mean_cell_rows"),
    )
    return verdicts, metrics


def _cell_metrics_empty(spark) -> DataFrame:
    return spark.createDataFrame(
        [(0, 0, 0.0)],
        "n_cells_used LONG, max_cell_rows LONG, mean_cell_rows DOUBLE",
    )

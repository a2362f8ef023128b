"""ANN quality measurement — recall@k of an approximate top-k against
the exact one, as DataFrames.

"Measure, don't guess": every approximate retrieval operator in this
repo (:func:`similarity.ivf_topk`, :func:`similarity.lsh_topk`,
:func:`pq.pq_adc_topk`, :func:`pq.ivf_pq_topk`) trades recall for
scan/byte reduction, and the trade is only tunable if the recall is a
number you compute on YOUR corpus — not a paper's. These helpers take
any two (query_id, neighbor_id, rank) frames and report overlap; both
inputs being deterministic (every ANN path in this repo is), the
report is deterministic too.

Shapes: one inner join on (query_id, neighbor_id) + one groupBy per
report — both keyed by query id, no cross products, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    neighbor_id_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """(query_id, n_exact, n_hits, recall) per query: how many of the
    EXACT top-k each method retrieved in ITS top-k. ``n_exact`` is
    min(k, candidates) — a query with fewer than k true neighbors is
    scored against what exists, not padded (recall stays in [0, 1]).
    Queries the approximate method returned NOTHING for still appear,
    with 0 hits — silent misses are the whole point of measuring."""
    if k < 1:
        raise ValueError("k must be >= 1")
    ex = exact.where(F.col(rank_col) <= int(k)).select(
        F.col(query_id_col).alias("query_id"),
        F.col(neighbor_id_col).alias("_nb"),
    )
    ap = approx.where(F.col(rank_col) <= int(k)).select(
        F.col(query_id_col).alias("query_id"),
        F.col(neighbor_id_col).alias("_nb"),
    )
    hits = ex.join(ap, ["query_id", "_nb"], "left_semi")
    n_ex = ex.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    n_hit = hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hits"))
    return (
        n_ex.join(n_hit, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)) / F.col("n_exact"), 6
            ).alias("recall"),
        )
    )


def recall_summary(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    method: str = "approx",
    **kwargs,
) -> DataFrame:
    """One labeled row: (method, k, n_queries, macro_recall,
    micro_recall). Macro averages per-query recall (every query counts
    equally); micro is total hits / total exact (big-result queries
    dominate). Disagreement between the two is itself a signal — it
    means recall is uneven across queries."""
    per = recall_at_k(approx, exact, k, **kwargs)
    return per.agg(
        F.lit(method).alias("method"),
        F.lit(int(k)).alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(F.avg("recall"), 4).alias("macro_recall"),
        F.round(F.sum("n_hits") / F.sum("n_exact"), 4).alias("micro_recall"),
    )

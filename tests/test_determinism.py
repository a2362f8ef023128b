"""Partitioning-determinism sweep: the engine's correctness contract
says every registered query's RESULT is independent of physical layout
— shuffle partition count, input partitioning, reduction order. This
suite re-runs the most numerically/ordering-sensitive queries under a
deliberately hostile layout (7 shuffle partitions instead of 32) and
requires the full row multiset to match bit-for-bit.

This is the standing generalization of the r2/r4 lessons (host noise
and estimator bias both masquerade as flakiness): if a query's result
moves with the layout, no cross-engine oracle can be trusted to catch
it, because both runs might land on the same accidental value.
"""

from __future__ import annotations

import pytest

from terra_bonobo_nodes_spark.plans.registry import all_queries
from tests.conftest import SF_DIR

# Queries chosen for sensitivity: float aggregation (trend, median,
# entropy, tfidf), partial top-k merges (rerank, cosine), hash-window
# ranking (reservoir), iterative convergence (components), banded
# self-joins (minhash, winnow), grouped-map Python (isotonic).
SENSITIVE = [
    "t5_user_value_trend",
    "weighted_median_price",
    "llm_lm_entropy_surface",  # r14 widen: + word-LM xent
    "llm_cosine_topk",  # carries the merged rerank columns since r13
    "llm_sample_surface",  # r14 merge: reservoir rank + quota membership
    "llm_dedup_components",
    "llm_hash_neardup_pairs",  # r14 merge: minhash est + value-grain simhash
    "llm_winnow_pairs",
    "t6_isotonic_value_fit",
    "interval_union_coverage",
    # round 6: float score ranking (bm25), survivor election +
    # iterative components (golden record), window-collapse CDC
    "llm_bm25_keyword_topk",
    "golden_record_part_names",
    "cdc_apply_changes",
    # round 13: the promoted shuffle-bearing curation rows — line
    # dedup's min-struct winner election and url dedup's canonical-key
    # groupBy must not move with partition layout
    "llm_line_dedup",
    "llm_url_dedup_groups",
    # round 15: the promoted funnel's dedup window over the filtered set
    "llm_source_rule_funnel",
    # round 16 promotions: the wide host report (5 LPA rounds + 4
    # fixed-point chains), the events funnel (sorted-array fold per
    # user) and retention (min-per-user + cell counts); the widened
    # llm_sample_surface (three samplers' window ranks) is already
    # listed above and now covers the priority rank too
    "llm_host_quality_report",
    "events_conversion_funnel",
    "events_cohort_retention",
    # round 17 promotions: the consolidation surfaces (groupBy +
    # join-back), the PSI float column, the novelty top-k merge window
    "p_record_ops_surface",
    "g_scalar_geometry_surface",
    "corpus_drift_psi",
    "llm_novelty_scores",
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_invariant_under_shuffle_layout(name, spark):
    q = all_queries()[name]
    default = spark.conf.get("spark.sql.shuffle.partitions")
    baseline = _rows(q.spark_fn(spark, SF_DIR))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        hostile = _rows(q.spark_fn(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default)
    assert baseline == hostile, f"{name} result moved with shuffle layout"


# --- staged candidates: same contract before promotion ------------------------
# The shuffle/ordering-sensitive continuation rows (window ranks, top-k
# boundaries, iterative label propagation, float PSI terms, array
# folds) must already be layout-invariant while staged — a
# partitioning-dependent result found at promotion wastes a driver
# slot (the candidate cartesian-audit rationale).

CANDIDATE_SENSITIVE = [
    # (the r17-promoted rows — drift psi, novelty, the two
    # consolidation surfaces — moved to the registered SENSITIVE list)
    "llm_corpus_overlap_report",   # bottom-k union re-rank
    "llm_stride_interleave_order", # per-source hash-rank window
    "llm_vocab_coverage_report",   # top-256 boundary + broadcast join
    "llm_packing_efficiency",      # two-level combinable rollup
    "cms_join_size_report",        # d*w cell joins + min-of-dots
    "llm_length_outliers",         # two rank-window median passes
    "llm_bpe_merges",              # per-round argmax tie boundaries
]


@pytest.mark.parametrize("name", CANDIDATE_SENSITIVE)
def test_candidate_invariant_under_shuffle_layout(name, spark):
    from terra_bonobo_nodes_spark.plans.queries_candidates import CANDIDATES

    fn, _ = CANDIDATES[name]
    default = spark.conf.get("spark.sql.shuffle.partitions")
    baseline = _rows(fn(spark, SF_DIR))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        hostile = _rows(fn(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default)
    assert baseline == hostile, f"{name} result moved with shuffle layout"

"""Engine-wide physical-plan audit: build (don't run) every registered
query's plan at sf0.001 and reject accidental cartesian products.

A CartesianProduct / BroadcastNestedLoopJoin in a plan is almost always
a dropped join condition — the classic silent scale-killer. The
exceptions below are *deliberate* bounded cross joins and each one
documents why it is safe; anything new joining without keys fails here
first, not on a 100 TB cluster.
"""

from __future__ import annotations

import pytest

from terra_bonobo_nodes_spark.plans.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"

# query -> why a nested-loop/cross join is intentional and bounded
CROSS_JOIN_OK: dict[str, str] = {
    "j4_knn_closest_features": "kNN broadcast crossJoin vs dimension-sized right side",
    "j4_knn_list_grid": "same kNN broadcast pattern on the exact side; the grid side equi-joins",
    "llm_embedding_cosine_pairs": "exact all-pairs form is the documented tiny-input oracle; the same row also runs the blocked equi-join scale path and flags its pairs",
    "e2_transit_time_one_to_many": "one-to-many matrix vs broadcast destinations (also carries the merged one-to-one scalar)",
    "llm_tfidf_topk_terms": "single-row corpus-size N broadcast into the score join",
    "llm_bm25_keyword_topk": "single-row (N, avgdl) corpus-stats broadcast into the score projection",
    "llm_temperature_mix_weights": "single-row (sum_n, sum_s) totals broadcast into the per-group weights",
    "llm_lsh_ann_topk": "per-table plane matrix is a broadcast single-row literal",
    "llm_cosine_topk": "broadcast query-matrix literal into mapInPandas scoring",
    "llm_lm_entropy_surface": (
        "single-row word-LM vocabulary scalar broadcast (documented at"
        " llm/lm.py::word_lm_xent; merged r14) + the absorbed"
        " perplexity leg's 1-row bucket-cutoff scalar (late r17)"
    ),
    # bbox-culled broadcast spatial joins: the bbox-overlap predicate is a
    # range condition (not equi-joinable), the layer side is dimension-sized
    # and broadcast — the GiST-index-scan shape. strategy="grid" is the
    # big-big equi-join path, driver-proven inside the widened
    # j1_boolean_intersect row (in_zone_grid column, r13 merge).
    "j1_boolean_intersect": "bbox-culled broadcast NLJ vs dimension layer",
    "j2_overlay_surface": (
        "same broadcast spatial-join shape on all three legs (the"
        " entry replacing the three standalone j2 rows it retired"
        " late r17), plus the dissolve leg's 1-row layer-all-boxy"
        " routing scalar BNLJ"
    ),
    "j3_intersection_geom_area": "same broadcast spatial-join shape",
    "g9_line_clip_length": "same broadcast spatial-join shape",
    # round 17 promotions (moved from CANDIDATE_CROSS_JOIN_OK):
    "layout_zorder_pruning": (
        "probe_scan_counts is a broadcast product of two BOUNDED"
        " per-FILE sides (6 probes x 64 zone rows) — documented in"
        " operators/layout.py"
    ),
    "corpus_drift_psi": (
        "the 1-row (tot_old, tot_new, n_buckets) total broadcast into"
        " the per-bucket share projection (operators/quality.py::"
        "distribution_drift)"
    ),
}


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_no_accidental_cartesian(name, spark):
    q = all_queries()[name]
    plan = q.spark_fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    has_cross = "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
    if name in CROSS_JOIN_OK:
        return  # documented intentional cross join (bounded by broadcast)
    assert not has_cross, f"{name} plans a cartesian join:\n{plan[:2000]}"


def test_q3_topk_is_take_ordered_not_global_sort(spark):
    """The global top-10 must plan as TakeOrderedAndProject (per-
    partition heaps merged on the driver), never a single-partition
    Sort — the difference between O(k) and O(n) driver memory."""
    q = all_queries()["tpch_q3_shipping_priority"]
    plan = q.spark_fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_q17_correlated_subqueries_decorrelate(spark):
    """Catalyst must rewrite both correlated scalar subqueries into
    per-part aggregates joined back — no per-outer-row re-scan."""
    q = all_queries()["tpch_q17_small_quantity"]
    plan = q.spark_fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final per subquery


def test_q3_filters_reach_parquet_scan(spark):
    """Both date predicates must push into the parquet readers (row-
    group skipping at scale), not evaluate post-scan only."""
    q = all_queries()["tpch_q3_shipping_priority"]
    plan = q.spark_fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderdate), LessThan(o_orderdate" in plan
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate" in plan


def test_q5_all_dimensions_broadcast(spark):
    """Six-table Q5: every dimension side must broadcast at test scale —
    the fact table joins map-side with zero fact shuffles for joins."""
    q = all_queries()["tpch_q5_local_supplier_volume"]
    plan = q.spark_fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 5
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_plan_fingerprint_and_assert_api(spark):
    from pyspark.sql import functions as F

    from terra_bonobo_nodes_spark.plans.audit import (
        assert_no_cartesian,
        plan_fingerprint,
    )

    a = spark.range(100).withColumn("k", F.col("id") % 10)
    b = spark.range(10).withColumn("k", F.col("id"))
    joined = a.join(b, "k").groupBy("k").count()
    fp = plan_fingerprint(joined)
    assert fp.get("BroadcastHashJoin", 0) + fp.get("SortMergeJoin", 0) >= 1
    assert fp.get("HashAggregate", 0) >= 2  # partial + final
    assert_no_cartesian(joined)  # clean plan passes

    cross = a.crossJoin(b.drop("k"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="will not survive scale"):
        assert_no_cartesian(cross)
    # the escape hatch permits only bounded broadcast NLJs — an unkeyed
    # CartesianProduct is rejected regardless
    from terra_bonobo_nodes_spark.plans.audit import executed_plan

    if "CartesianProduct" in executed_plan(cross):
        with _pytest.raises(ValueError, match="CartesianProduct"):
            assert_no_cartesian(cross, allow_broadcast_nlj=True)
    else:
        assert_no_cartesian(cross, allow_broadcast_nlj=True)


def test_cdc_snapshot_side_never_shuffles(spark):
    """cdc_apply_changes: the base snapshot must reach the anti-join
    with ZERO exchanges (scan -> broadcast anti-join); only the
    changelog side shuffles for its collapse window."""
    q = all_queries()["cdc_apply_changes"]
    plan = q.spark_fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the customer scan feeds the anti-join directly: no Exchange may
    # appear between the scan and the join on the streamed side
    stream_side = plan.split("LeftAnti")[1].split("BroadcastExchange")[0]
    assert "customer.parquet" in stream_side
    assert "Exchange hashpartitioning" not in stream_side


def test_sessionize_is_single_exchange(spark):
    """sessionize_clickstream: lag + running counter + rollup must all
    ride ONE hashpartitioning exchange on the session key — the
    gaps-and-islands optimum (PLANS.md round 6)."""
    q = all_queries()["sessionize_clickstream"]
    plan = q.spark_fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") >= 1


def test_bm25_corpus_scans_are_bounded(spark):
    """llm_bm25_keyword_topk: exactly two corpus scans (tf pipeline +
    corpus stats) — the tf relation's checkpoint barrier must keep the
    dfreq branch from re-inlining a third tokenize pass."""
    q = all_queries()["llm_bm25_keyword_topk"]
    plan = q.spark_fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("documents.parquet") <= 2


def test_collapse_repeated_tokens_is_shuffle_free(spark):
    """llm_collapse_repeated_tokens: a pure column expression — the
    plan must contain NO exchange and NO Python stage at all."""
    q = all_queries()["llm_collapse_repeated_tokens"]
    plan = q.spark_fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_source_quota_is_one_window_exchange(spark):
    """source_quota_sample (inside the merged llm_sample_surface row):
    rank + filter ride exactly one hashpartitioning exchange on the
    source key — audited on the operator directly since the r14 merge
    joined it with the reservoir window."""
    from terra_bonobo_nodes_spark.llm.corpus import source_quota_sample
    from terra_bonobo_nodes_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source", "lang"
    )
    out = source_quota_sample(docs, "source", cap=20, id_col="doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan


def test_embedding_gram_partials_shuffle_tiny_keys(spark):
    """llm_embedding_gram: ONE mapInPandas stage producing per-partition
    partials, then one aggregate on (i, j) — the corpus itself must
    never hash-shuffle (the exchange moves d(d+1)/2 keys per partition,
    not rows)."""
    q = all_queries()["llm_embedding_gram"]
    plan = q.spark_fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    # one exchange total: the partial-gram aggregation
    assert plan.count("Exchange hashpartitioning") == 1
    # and it sits ABOVE the python stage (partials, not vectors, move)
    assert plan.index("Exchange hashpartitioning") < plan.index("MapInPandas")


def test_embedding_outliers_centroids_broadcast_back(spark):
    """llm_embedding_outliers: the per-label centroid table must come
    back via a broadcast join — the scan side re-reads embeddings
    without a hash shuffle on the join key (only the rank window
    repartitions by label)."""
    q = all_queries()["llm_embedding_outliers"]
    plan = q.spark_fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_xml_roundtrip_plans_no_python_eval(spark):
    """The round-12 lexer claim pinned at the plan level: the whole
    s11 chain (comment strip, CDATA unwrap-and-escape, fragment
    explode, from_xml) is JVM-side Column work — no Python evaluation
    node anywhere in the physical plan."""
    q = all_queries()["s11_xml_document_roundtrip"]
    plan = q.spark_fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_gopher_and_c4_rows_plan_zero_exchange_zero_python(spark):
    """The two promoted rule-battery rows are scan-speed projections —
    the registered plan must carry NO exchange and NO Python stage
    (the property their 100 TB story rests on)."""
    for name in ("llm_gopher_rules", "llm_c4_line_filter"):
        q = all_queries()[name]
        plan = q.spark_fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, name
        assert "Python" not in plan and "ArrowEval" not in plan, name


def test_url_dedup_row_is_single_aggregate_exchange(spark):
    """llm_url_dedup_groups: canonicalization is a pure projection; the
    only exchange is the hash groupBy on the canonical key (partial
    agg map-side)."""
    q = all_queries()["llm_url_dedup_groups"]
    plan = q.spark_fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Python" not in plan and "ArrowEval" not in plan


def test_line_dedup_row_exchange_budget(spark):
    """llm_line_dedup: explode -> winner-election agg -> join-back ->
    doc regroup -> result join = at most 5 hash exchanges, zero
    Python, and the winner predicate folded into the join as an
    equi-key (no NLJ/cartesian — also enforced by the global audit)."""
    q = all_queries()["llm_line_dedup"]
    plan = q.spark_fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 5
    assert "Python" not in plan and "ArrowEval" not in plan


def test_bloom_probe_candidate_plans_zero_exchange(spark):
    """The bloom candidate's probe side (corpus scan -> literal-filter
    membership projection) must stay join-free; only the build side
    aggregates. Probed through the operator directly (the candidate
    row includes the build job)."""
    from pyspark.sql import functions as F

    from terra_bonobo_nodes_spark.llm.bloom import flag_bloom_contaminated

    corpus = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    plan = (
        flag_bloom_contaminated(corpus, [0] * 2048)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan


def test_quality_filter_scoring_plans_no_python_eval(spark):
    """The registered quality-filter row scores in pure Columns
    (sigmoid of a standardized dot unrolled over feature columns) —
    pushdown- and codegen-friendly, zero Python in the plan."""
    q = all_queries()["llm_quality_filter_score"]
    df = q.spark_fn(spark, SF_DIR)
    # execute the SAME Dataset first: the row now carries the
    # scale-gated spread exchange (r17), so the initial AQE plan
    # string has no finalized codegen spans until stages materialize
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan
    assert "*(" in plan  # whole-stage-codegen stage markers


# --- staged candidates get the cartesian audit BEFORE promotion --------------
# A staged row that plans an accidental cross join would only be caught
# at registration (when the registered-query sweep above picks it up) —
# after its driver slot is already budgeted. Audit the queue too, with
# the same documented-intent allowlist discipline.

CANDIDATE_CROSS_JOIN_OK: dict[str, str] = {
    # (layout_zorder_pruning / corpus_drift_psi promoted round 17 —
    # their entries moved to the registered CROSS_JOIN_OK above;
    # j2_overlay_surface registered late r17, entry moved likewise)
    "llm_corpus_overlap_report": (
        "the group-pair frame is groups x groups under an inequality"
        " (5 event types -> 10 pairs), broadcast by construction —"
        " sketch rows, never raw data; needs CROSS_JOIN_OK at"
        " registration"
    ),
    "llm_dsir_logweights": (
        "single-row feature-total scalars broadcast into the"
        " per-doc weight projection (llm/corpus.py::dsir_logweights)"
    ),
    "cms_join_size_report": (
        "two 1-row frames crossJoined per measured join (the sketch"
        " estimate scalar x the exact-truth scalar)"
    ),
    # (llm_perplexity_buckets absorbed late r17 into the registered
    # llm_lm_entropy_surface — its 1-row bucket-cutoff scalar is noted
    # on that row's CROSS_JOIN_OK entry above)
}


def _candidates():
    from terra_bonobo_nodes_spark.plans.queries_candidates import CANDIDATES

    return CANDIDATES


@pytest.mark.parametrize("name", sorted(_candidates()))
def test_candidate_no_accidental_cartesian(name, spark):
    fn, _ = _candidates()[name]
    plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    has_cross = "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
    if name in CANDIDATE_CROSS_JOIN_OK:
        return
    assert not has_cross, f"candidate {name} plans a cartesian join:\n{plan[:2000]}"

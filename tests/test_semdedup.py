"""llm/semdedup.py: SemDeDup composition.

Pins: one survivor per near-duplicate group with singletons untouched,
the prefer_col election policy, the documented within-cluster recall
trade (cross-cell duplicates are NOT compared — by design), the
degenerate inputs (empty corpus, corpus smaller than the codebook),
and determinism across runs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from terra_bonobo_nodes_spark.llm.semdedup import semantic_dedup


def _vec(base, eps):
    return [base[0] + eps, base[1], base[2] + eps]


@pytest.fixture(scope="module")
def corpus(spark):
    # two tight groups far apart + two singletons; ids interleaved so
    # survivor election can't accidentally pass by input order
    a = [10.0, 0.0, 0.0]
    b = [0.0, 10.0, 0.0]
    rows = [
        (5, _vec(a, 0.00)), (1, _vec(a, 0.01)), (9, _vec(a, 0.02)),
        (2, _vec(b, 0.00)), (8, _vec(b, 0.01)),
        (3, [5.0, 5.0, 5.0]),     # singleton
        (7, [-7.0, 2.0, 1.0]),    # singleton
    ]
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")


def test_keeps_one_per_group_and_all_singletons(corpus):
    # 3 cells for 3 true clusters: with MORE cells than clusters k-means
    # may split a duplicate group across cells (the documented recall
    # trade, pinned separately below)
    out = semantic_dedup(corpus, n_clusters=3, threshold=0.999)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 5, 7, 8, 9}
    # group A = {1,5,9} -> min id 1 survives; group B = {2,8} -> 2
    assert rows[1]["is_kept"] and not rows[5]["is_kept"] and not rows[9]["is_kept"]
    assert rows[2]["is_kept"] and not rows[8]["is_kept"]
    assert rows[3]["is_kept"] and rows[7]["is_kept"]
    assert {rows[i]["component_id"] for i in (1, 5, 9)} == {1}
    assert {rows[i]["component_id"] for i in (2, 8)} == {2}
    assert rows[3]["component_id"] == 3 and rows[7]["component_id"] == 7


def test_prefer_col_overrides_min_id(corpus, spark):
    pref = corpus.withColumn(
        "quality", F.when(F.col("vec_id") == 9, 5.0).otherwise(1.0)
    )
    out = semantic_dedup(pref, n_clusters=3, threshold=0.999, prefer_col="quality")
    rows = {r["vec_id"]: r["is_kept"] for r in out.collect()}
    assert rows[9] and not rows[1] and not rows[5]  # quality beats min-id


def test_cross_cell_duplicates_are_not_compared(spark):
    """The documented SemDeDup recall trade: with a codebook that
    separates two identical vectors into different cells, no pair forms
    and both survive. (Centroids passed explicitly so the cell split is
    forced, not probabilistic.)"""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0])], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    out = semantic_dedup(
        df,
        n_clusters=2,
        threshold=0.5,
        centroids=[[1.0, 0.0], [1.0, 0.0]],  # tie -> both assign cell 0
    )
    assert sum(r["is_kept"] for r in out.collect()) == 1  # same cell: deduped
    df3 = spark.createDataFrame(
        [(1, [1.0, 0.1]), (2, [1.0, -0.1])], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    out3 = semantic_dedup(
        df3, threshold=0.9, centroids=[[1.0, 0.1], [1.0, -0.1]]
    )
    rows = {r["vec_id"]: r for r in out3.collect()}
    assert rows[1]["cell"] != rows[2]["cell"]
    # cosine(v1, v2) ~ 0.98 >= 0.9 would pair them — but cells differ,
    # so BOTH survive: the by-design recall trade, pinned
    assert rows[1]["is_kept"] and rows[2]["is_kept"]


def test_empty_corpus_returns_wellformed_empty(spark):
    empty = spark.createDataFrame([], "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    out = semantic_dedup(empty)
    assert out.columns == ["vec_id", "cell", "component_id", "is_kept"]
    assert out.count() == 0


def test_corpus_smaller_than_codebook_shrinks_codebook(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.99, 0.01])], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    out = semantic_dedup(df, n_clusters=16, threshold=0.99)
    rows = {r["vec_id"]: r["is_kept"] for r in out.collect()}
    assert rows == {1: True, 2: False}


def test_deterministic_across_runs(corpus):
    a = sorted(map(tuple, semantic_dedup(corpus, n_clusters=3).collect()))
    b = sorted(map(tuple, semantic_dedup(corpus, n_clusters=3).collect()))
    assert a == b


def test_real_embeddings_table_runs(spark, sf_dir):
    from terra_bonobo_nodes_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = semantic_dedup(
        emb.select("vec_id", "embedding"), n_clusters=8, threshold=0.99
    )
    n = emb.count()
    rows = out.collect()
    assert len(rows) == n                      # verdict for every row
    assert sum(r["is_kept"] for r in rows) >= 1


def test_with_metrics_reports_cell_stats(corpus, spark):
    out, metrics = semantic_dedup(
        corpus, n_clusters=3, threshold=0.999, with_metrics=True
    )
    m = metrics.collect()[0]
    assert m["n_cells_used"] >= 1
    assert m["max_cell_rows"] >= 3        # group A has 3 members in one cell
    assert m["mean_cell_rows"] > 0
    assert out.count() == 7

    empty = spark.createDataFrame([], "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    e_out, e_m = semantic_dedup(empty, with_metrics=True)
    assert e_out.count() == 0
    row = e_m.collect()[0]
    assert (row["n_cells_used"], row["max_cell_rows"]) == (0, 0)


def test_chain_shaped_component_converges(spark):
    """Round-12 regression pin: cosine near-dup graphs at moderate
    thresholds are CHAIN-shaped (sf0.1 showed ~1 edge per node), and a
    chain's diameter exhausted connected_components' default 10
    iterations. semantic_dedup now passes cc_max_iterations=24; this
    pins a 200-node chain (adjacent cosine ~0.996, non-adjacent below
    threshold) collapsing into ONE component with one survivor."""
    import math

    n, theta = 200, math.radians(5.0)
    rows = [
        (i, [math.cos(i * theta), math.sin(i * theta)] + [0.0] * 6)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    # one cell: the chain is a single component candidate set
    out = semantic_dedup(
        df, centroids=[[1.0] + [0.0] * 7], threshold=0.99
    ).collect()
    assert len(out) == n
    comp = {r["component_id"] for r in out}
    assert comp == {0}  # the whole chain is one component
    kept = [r["vec_id"] for r in out if r["is_kept"]]
    assert kept == [0]  # smallest id survives

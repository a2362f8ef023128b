"""Fixed-point PageRank (llm/graph.py): exact integer iterations
pinned against an independent Python reference (hypothesis-swept over
random digraphs), the DuckDB unrolled-CTE mirror, and hand cases for
rank ordering, dangling leak, and multi-edge counting."""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from terra_bonobo_nodes_spark.llm.graph import (
    DEFAULT_SCALE,
    pagerank_fixed,
    pagerank_fixed_sql,
)


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: r["rank"] for r in pagerank_fixed(df, **kw).collect()}


def _ref(edges, iterations=5, scale=DEFAULT_SCALE, damp_num=85, damp_den=100):
    """Independent reference: adjacency dicts, same integer arithmetic."""
    edges = [(s, d) for s, d in edges if s is not None and d is not None]
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    outdeg: dict[str, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = scale * (damp_den - damp_num) // damp_den
    rank = {n: scale for n in nodes}
    for _ in range(iterations):
        sums = {n: 0 for n in nodes}
        for s, d in edges:
            sums[d] += rank[s] // outdeg[s]
        rank = {n: base + (damp_num * sums[n]) // damp_den for n in nodes}
    return rank


def test_hub_outranks_leaves(spark):
    # star: a,b,c all link to hub; hub links back to a only
    edges = [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")]
    ranks = _run(spark, edges)
    assert ranks["hub"] > ranks["a"] > ranks["b"]
    assert ranks["b"] == ranks["c"]  # symmetric leaves tie exactly
    assert ranks == _ref(edges)


def test_multi_edge_counts_per_occurrence(spark):
    # two parallel edges a->b: a's outdeg is 2, b gets both halves
    double = _run(spark, [("a", "b"), ("a", "b"), ("c", "a")])
    single = _run(spark, [("a", "b"), ("c", "a")])
    # floor(r/2)*2 <= r: the doubled edge can only lose units to floors
    assert double["b"] <= single["b"]
    assert double == _ref([("a", "b"), ("a", "b"), ("c", "a")])


def test_dangling_node_keeps_base_rank(spark):
    # b has no out-edges (dangling, leaks mass) and no in-links after
    # round 1 contributions stabilize a: a's only income is from b? no —
    # a->b only: a receives nothing, b receives from a.
    edges = [("a", "b")]
    ranks = _run(spark, edges)
    base = DEFAULT_SCALE * 15 // 100
    assert ranks["a"] == base  # no in-links -> exactly the base
    assert ranks == _ref(edges)


def test_null_endpoint_rows_dropped(spark):
    df = spark.createDataFrame(
        [("a", "b"), (None, "z"), ("z", None)], "src string, dst string"
    )
    ranks = {r["node"]: r["rank"] for r in pagerank_fixed(df).collect()}
    assert set(ranks) == {"a", "b"}
    assert ranks == _ref([("a", "b")])


def test_iterations_zero_is_uniform_start(spark):
    ranks = _run(spark, [("a", "b"), ("b", "c")], iterations=0)
    assert set(ranks.values()) == {DEFAULT_SCALE}


def test_matches_duckdb_mirror(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
    got = _run(spark, edges, iterations=4)
    values = ", ".join(f"('{s}', '{d}')" for s, d in edges)
    sql = pagerank_fixed_sql(
        f"SELECT * FROM (VALUES {values}) AS v(src, dst)", iterations=4
    )
    want = dict(duckdb.sql(sql).fetchall())
    assert got == want


_node = st.sampled_from(["a", "b", "c", "d"])
_edges = st.lists(st.tuples(_node, _node), min_size=1, max_size=10)


@settings(max_examples=12, deadline=None)
@given(_edges, st.sampled_from([1, 3, 5]))
def test_matches_python_reference(spark, edges, iterations):
    assert _run(spark, edges, iterations=iterations) == _ref(
        edges, iterations=iterations
    ), (edges, iterations)


def test_empty_edge_frame(spark):
    e = spark.createDataFrame([], "src string, dst string")
    assert pagerank_fixed(e).collect() == []


def _ref_trust(edges, seeds, iterations=5, scale=DEFAULT_SCALE,
               damp_num=85, damp_den=100):
    edges = [(s, d) for s, d in edges if s is not None and d is not None]
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    seeds = set(seeds) & nodes
    outdeg: dict[str, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = scale * (damp_den - damp_num) // damp_den
    rank = {n: (scale if n in seeds else 0) for n in nodes}
    for _ in range(iterations):
        sums = {n: 0 for n in nodes}
        for s, d in edges:
            sums[d] += rank[s] // outdeg[s]
        rank = {
            n: (base if n in seeds else 0) + (damp_num * sums[n]) // damp_den
            for n in nodes
        }
    return rank


def _run_trust(spark, edges, seeds, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    sd = spark.createDataFrame([(s,) for s in seeds], "host string")
    return {
        r["node"]: r["rank"] for r in pagerank_fixed(df, seeds=sd, **kw).collect()
    }


def test_trustrank_demotes_spam_farm(spark):
    # spam farm w,x,y links itself into high PLAIN pagerank; trusted
    # seeds a,b never link to it -> TrustRank ~ 0 for the farm
    edges = [
        ("a", "b"), ("b", "a"),                      # trusted core
        ("w", "x"), ("x", "y"), ("y", "w"),          # spam ring
        ("w", "y"), ("x", "w"), ("y", "x"),
    ]
    plain = _run(spark, edges)
    trust = _run_trust(spark, edges, ["a", "b"])
    assert plain["w"] > 0 and trust["w"] == 0
    assert trust["a"] > 0 and trust["b"] > 0
    assert trust == _ref_trust(edges, ["a", "b"])


def test_trust_propagates_across_a_real_link(spark):
    edges = [("seed", "good"), ("good", "other")]
    trust = _run_trust(spark, edges, ["seed"])
    assert trust["seed"] > trust["good"] > trust["other"] > 0
    assert trust == _ref_trust(edges, ["seed"])


def test_trustrank_matches_duckdb_mirror(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("z", "z"), ("a", "z")]
    got = _run_trust(spark, edges, ["a"], iterations=4)
    values = ", ".join(f"('{s}', '{d}')" for s, d in edges)
    sql = pagerank_fixed_sql(
        f"SELECT * FROM (VALUES {values}) AS v(src, dst)",
        iterations=4,
        seeds_sql="VALUES ('a')",
    )
    want = dict(duckdb.sql(sql).fetchall())
    assert got == want


def test_plain_pagerank_unchanged_by_trust_extension(spark):
    # regression pin: default (no seeds) output identical to reference
    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    assert _run(spark, edges) == _ref(edges)


@settings(max_examples=8, deadline=None)
@given(_edges, st.sets(_node, min_size=1, max_size=2))
def test_trust_matches_python_reference(spark, edges, seeds):
    got = _run_trust(spark, edges, sorted(seeds), iterations=3)
    assert got == _ref_trust(edges, seeds, iterations=3), (edges, seeds)

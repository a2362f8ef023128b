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


# --- HITS --------------------------------------------------------------------

from terra_bonobo_nodes_spark.llm.graph import hits_fixed, hits_fixed_sql


def _run_hits(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["node"]: (r["hub"], r["auth"]) for r in hits_fixed(df, **kw).collect()
    }


def _ref_hits(edges, iterations=5, scale=DEFAULT_SCALE):
    """Independent reference: adjacency lists, same quotient-normalized
    integer arithmetic."""
    edges = [(s, d) for s, d in edges if s is not None and d is not None]
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    hub = {n: scale for n in nodes}
    auth = {n: 0 for n in nodes}

    def norm(raw):
        q = max(max(raw.values(), default=0) // scale, 1)
        return {n: raw.get(n, 0) // q for n in nodes}

    for _ in range(iterations):
        araw: dict[str, int] = {}
        for s, d in edges:
            araw[d] = araw.get(d, 0) + hub[s]
        auth = norm(araw)
        hraw: dict[str, int] = {}
        for s, d in edges:
            hraw[s] = hraw.get(s, 0) + auth[d]
        hub = norm(hraw)
    return {n: (hub[n], auth[n]) for n in nodes}


def test_hits_hub_authority_separation(spark):
    # dir links to three pages; pages link to one winner
    edges = [
        ("dir", "p1"), ("dir", "p2"), ("dir", "p3"),
        ("p1", "win"), ("p2", "win"), ("p3", "win"),
    ]
    got = _run_hits(spark, edges)
    assert got == _ref_hits(edges)
    # 'win' is the best authority; the pages pointing at it are the
    # best hubs (each points at THE top authority; 'dir' points only
    # at middling ones); roles don't mix at the poles
    assert got["win"][1] == max(v[1] for v in got.values())
    assert got["p1"][0] == max(v[0] for v in got.values())
    assert got["p1"][0] > got["dir"][0] > 0
    assert got["win"][0] == 0  # the sink links to nothing: zero hub
    assert got["dir"][1] == 0  # nothing links to the directory: zero auth
    assert got["p1"] == got["p2"] == got["p3"]  # symmetric middle ties


def test_hits_multi_edge_counts_per_occurrence(spark):
    edges = [("a", "b"), ("a", "b"), ("c", "b")]
    got = _run_hits(spark, edges)
    assert got == _ref_hits(edges)
    assert got["a"][0] > got["c"][0]  # the doubled edge makes a the better hub


def test_hits_null_endpoints_and_empty(spark):
    got = _run_hits(spark, [("a", "b"), (None, "b"), ("a", None)])
    assert set(got) == {"a", "b"}
    df = spark.createDataFrame([], "src string, dst string")
    assert hits_fixed(df).collect() == []


def test_hits_matches_duckdb_mirror(spark, tmp_path):
    edges = [
        ("dir", "p1"), ("dir", "p2"), ("p1", "win"), ("p2", "win"),
        ("win", "dir"), ("x", "win"), ("x", "p1"),
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    path = str(tmp_path / "edges")
    df.write.parquet(path)
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits_fixed(spark.read.parquet(path), iterations=4).collect()
    }
    sql = hits_fixed_sql(
        f"SELECT src, dst FROM read_parquet('{path}/*.parquet')", iterations=4
    )
    want = {n: (h, a) for n, h, a in duckdb.sql(sql).fetchall()}
    assert got == want


_hnode = st.sampled_from("abcdef")


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.tuples(_hnode, _hnode), min_size=1, max_size=12),
    st.sampled_from([1, 3]),
)
def test_hits_matches_python_reference(spark, edges, iterations):
    got = _run_hits(spark, edges, iterations=iterations)
    assert got == _ref_hits(edges, iterations=iterations), edges


# --- k-core membership -------------------------------------------------------


def test_kcore_triangle_survives_pendants(spark):
    """A triangle is a 2-core; pendant chains hanging off it peel away
    ROUND BY ROUND (the cascade the fixed iteration count must cover)."""
    from terra_bonobo_nodes_spark.llm.graph import kcore_fixed

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0),          # triangle: the 2-core
         (2, 3), (3, 4), (4, 5)],         # pendant chain: peels in 3 rounds
        "src long, dst long",
    )
    got = {r["node"]: r["in_kcore"] for r in kcore_fixed(edges, k=2).collect()}
    assert got == {0: True, 1: True, 2: True, 3: False, 4: False, 5: False}


def test_kcore_degree_is_distinct_undirected(spark):
    """Multi-edges and both directions of the same pair add no degree
    support; self-loops add none either."""
    from terra_bonobo_nodes_spark.llm.graph import kcore_fixed

    edges = spark.createDataFrame(
        [(0, 1), (0, 1), (1, 0), (0, 0), (1, 1)],
        "src long, dst long",
    )
    got = {r["node"]: r["in_kcore"] for r in kcore_fixed(edges, k=2).collect()}
    assert got == {0: False, 1: False}  # one distinct neighbor each


def test_kcore_sql_mirror(spark, duck):
    from terra_bonobo_nodes_spark.llm.graph import kcore_fixed, kcore_fixed_sql

    rows = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (0, 3)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {
        r["node"]: r["in_kcore"] for r in kcore_fixed(edges, k=2).collect()
    }
    duck.execute(
        "CREATE OR REPLACE TABLE kce AS SELECT * FROM (VALUES "
        + ", ".join(f"({a}, {b})" for a, b in rows)
        + ") t(src, dst)"
    )
    want = dict(
        duck.execute(
            kcore_fixed_sql("SELECT src, dst FROM kce", k=2)
        ).fetchall()
    )
    assert got == want


def test_kcore_guards_and_empty(spark):
    from terra_bonobo_nodes_spark.llm.graph import kcore_fixed

    import pytest as _pt

    edges = spark.createDataFrame([], "src long, dst long")
    assert kcore_fixed(edges, k=2).count() == 0
    with _pt.raises(ValueError, match="k must"):
        kcore_fixed(edges, k=0)
    with _pt.raises(ValueError, match="iterations"):
        kcore_fixed(edges, k=1, iterations=0)


# --- label propagation (lpa_fixed) --------------------------------------------


def _lpa_ref(edges, iterations=5):
    """Independent Python reference of the synchronous min-tie-break
    LPA with self-inclusion over the distinct undirected graph."""
    ed = {
        (a, b)
        for a, b in edges
        if a is not None and b is not None and a != b
    }
    und: dict = {}
    for a, b in ed:
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    labels = {n: n for n in und}
    for _ in range(iterations):
        new = {}
        for n, nbrs in und.items():
            cand: dict = {}
            for m in nbrs:
                cand[labels[m]] = cand.get(labels[m], 0) + 1
            cand[labels[n]] = cand.get(labels[n], 0) + 1
            mc = max(cand.values())
            new[n] = min(l for l, c in cand.items() if c == mc)
        labels = new
    return labels


def test_lpa_two_cliques_with_bridge(spark):
    from terra_bonobo_nodes_spark.llm.graph import lpa_fixed

    # two triangles joined by one bridge edge: each converges onto its
    # smallest member; the bridge does not merge them (each endpoint
    # sees 2 in-clique votes + 1 own vs 1 across the bridge)
    rows = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (2, 10)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {r["node"]: r["label"] for r in lpa_fixed(edges).collect()}
    assert got == _lpa_ref(rows)
    # the two triangles land on different labels (bridge did not merge)
    assert got[0] == got[1] == got[2] == 0
    assert got[11] == got[12] and got[11] != 0


def test_lpa_self_loops_and_nulls_dropped(spark):
    from terra_bonobo_nodes_spark.llm.graph import lpa_fixed

    rows = [(1, 1), (None, 2), (2, None), (2, 3)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {r["node"]: r["label"] for r in lpa_fixed(edges, iterations=3).collect()}
    # node 1 vanishes (self-loop only), 2/3 form one community
    assert got == {2: 2, 3: 2}


def test_lpa_sql_mirror(spark, duck):
    from terra_bonobo_nodes_spark.llm.graph import lpa_fixed, lpa_fixed_sql

    rows = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (2, 10),
            (5, 6), (7, 5), (6, 7), (7, 8)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = {r["node"]: r["label"] for r in lpa_fixed(edges, iterations=4).collect()}
    duck.execute(
        "CREATE OR REPLACE TABLE lpe AS SELECT * FROM (VALUES "
        + ", ".join(f"({a}, {b})" for a, b in rows)
        + ") t(src, dst)"
    )
    want = dict(
        duck.execute(
            lpa_fixed_sql("SELECT src, dst FROM lpe", iterations=4)
        ).fetchall()
    )
    assert got == want == _lpa_ref(rows, iterations=4)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=30,
    ),
    iterations=st.integers(1, 4),
)
@settings(max_examples=12, deadline=None)
def test_lpa_matches_python_reference(spark, edges, iterations):
    from terra_bonobo_nodes_spark.llm.graph import lpa_fixed

    ref = _lpa_ref(edges, iterations)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["label"]
        for r in lpa_fixed(df, iterations=iterations).collect()
    }
    assert got == ref


def test_lpa_guards_and_empty(spark):
    import pytest as _pt

    from terra_bonobo_nodes_spark.llm.graph import lpa_fixed

    with _pt.raises(ValueError):
        lpa_fixed(spark.range(0).selectExpr("id src", "id dst"), iterations=0)
    empty = spark.createDataFrame([], "src long, dst long")
    assert lpa_fixed(empty, iterations=2).count() == 0


# --- round 17: small-graph driver-local fast path parity ----------------------
# llm/graph.py's small_graph_pairs fast path must be BIT-IDENTICAL to
# the distributed loops (both replay the same exact-integer update
# rule) — parity pinned here on a fixture that exercises multi-edges,
# dangling nodes, self-loops, a pendant chain, and a seeded trust run.

_FAST_EDGES = [
    ("a", "b"), ("a", "b"),          # multi-edge (counts twice)
    ("b", "c"), ("c", "a"),          # 3-cycle core
    ("c", "d"),                      # dangling d (rank leak)
    ("d", "d"),                      # self-loop (kcore/lpa drop it)
    ("e", "a"), ("f", "e"), ("g", "f"),  # pendant chain into the core
    ("b", "a"), ("c", "b"),          # densify the triangle for 2-core
]


def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


def test_small_graph_fast_path_parity_all_chains(spark):
    from terra_bonobo_nodes_spark.llm.graph import (
        hits_fixed,
        kcore_fixed,
        lpa_fixed,
    )

    df = spark.createDataFrame(_FAST_EDGES, "src string, dst string")
    sd = spark.createDataFrame([("a",), ("e",)], "host string")
    for dist, fast in [
        (pagerank_fixed(df), pagerank_fixed(df, small_graph_pairs=1000)),
        (
            pagerank_fixed(df, seeds=sd),
            pagerank_fixed(df, seeds=sd, small_graph_pairs=1000),
        ),
        (hits_fixed(df), hits_fixed(df, small_graph_pairs=1000)),
        (kcore_fixed(df, k=2), kcore_fixed(df, k=2, small_graph_pairs=1000)),
        (lpa_fixed(df), lpa_fixed(df, small_graph_pairs=1000)),
    ]:
        assert _rowset(dist) == _rowset(fast)
        assert dist.columns == fast.columns


def test_small_graph_threshold_guard_keeps_distributed_path(spark, monkeypatch):
    """A graph over the threshold must NOT collect to the driver: the
    guard reads at most threshold+1 weighted pairs and falls back to
    the distributed loop (both final frames plan as Scan ExistingRDD,
    so the guard is pinned by spying on the local solver)."""
    import terra_bonobo_nodes_spark.llm.graph as G

    calls = []
    orig = G._pagerank_local

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(G, "_pagerank_local", spy)
    df = spark.createDataFrame(_FAST_EDGES, "src string, dst string")
    # 10 distinct weighted pairs > threshold 3 -> distributed path
    G.pagerank_fixed(df, small_graph_pairs=3).collect()
    assert calls == []
    G.pagerank_fixed(df, small_graph_pairs=1000).collect()
    assert calls == [1]
    # default stays distributed (library callers opt in per query)
    G.pagerank_fixed(df).collect()
    assert calls == [1]


def test_small_graph_fast_path_empty_edges(spark):
    from terra_bonobo_nodes_spark.llm.graph import (
        hits_fixed,
        kcore_fixed,
        lpa_fixed,
    )

    e = spark.createDataFrame([], "src string, dst string")
    assert pagerank_fixed(e, small_graph_pairs=100).collect() == []
    assert hits_fixed(e, small_graph_pairs=100).collect() == []
    assert kcore_fixed(e, k=2, small_graph_pairs=100).collect() == []
    assert lpa_fixed(e, small_graph_pairs=100).collect() == []


def test_precollected_pairs_match_per_chain_guards(spark):
    """The shared guard (weighted_edge_pairs_if_small + pairs=) must
    produce the same results as each chain's own guard — the
    host-quality report runs ONE guard over its shared edge frame."""
    from terra_bonobo_nodes_spark.llm.graph import (
        hits_fixed,
        kcore_fixed,
        lpa_fixed,
        weighted_edge_pairs_if_small,
    )

    df = spark.createDataFrame(_FAST_EDGES, "src string, dst string")
    pairs = weighted_edge_pairs_if_small(df, threshold=1000)
    assert pairs is not None and len(pairs) == 10  # 12 rows, 1 multi-edge dup, 1 reverse dup
    for own, shared in [
        (
            pagerank_fixed(df, small_graph_pairs=1000),
            pagerank_fixed(df, pairs=pairs),
        ),
        (
            hits_fixed(df, small_graph_pairs=1000),
            hits_fixed(df, pairs=pairs),
        ),
        (
            kcore_fixed(df, k=2, small_graph_pairs=1000),
            kcore_fixed(df, k=2, pairs=pairs),
        ),
        (
            lpa_fixed(df, small_graph_pairs=1000),
            lpa_fixed(df, pairs=pairs),
        ),
    ]:
        assert _rowset(own) == _rowset(shared)
    # over-threshold: the shared guard declines and callers fall back
    assert weighted_edge_pairs_if_small(df, threshold=3) is None

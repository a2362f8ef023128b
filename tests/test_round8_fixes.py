"""Pins for the five ADVICE_r07 fixes (round 8).

1. llm/bpe.py::word_frequencies — top-k cut is a distributed
   TakeOrderedAndProject, not a global row_number window.
2. llm/bpe.py::encode_words — mapInPandas schema derives the id type
   from the input (string doc ids must survive the Arrow boundary).
3. operators/quality.py::partition_skew_report — hot-key ranking is
   TakeOrderedAndProject, not a global window.
4. plans/registry.py::_compute_priority — warns loudly when no
   CORRECTNESS artifacts are found instead of silently degrading.
5. operators/spatial.py kdb empty-side guard — dead branch removed;
   behavior (single leaf on an empty record side) pinned here.
"""

from __future__ import annotations

import warnings

from pyspark.sql import functions as F


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_word_frequencies_is_distributed_topk(spark):
    from terra_bonobo_nodes_spark.llm import bpe

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog sat")], "doc_id long, text string"
    )
    wf = bpe.word_frequencies(docs, max_words=3)
    plan = _physical_plan(wf)
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    rows = [(r.word, r.n) for r in wf.collect()]
    # count desc, word asc (GPT-2-style pretokens keep the leading
    # space, and " sat" sorts before "the") — deterministic truncation
    assert rows == [(" sat", 2), ("the", 2), (" cat", 1)]


def test_encode_words_string_id(spark):
    from terra_bonobo_nodes_spark.llm import bpe

    docs = spark.createDataFrame(
        [("doc-a", "hug hug pun"), ("doc-b", "bun")], "doc_id string, text string"
    )
    merges = bpe.train_bpe([("hug", 10), ("pun", 12), ("bun", 4)], n_merges=4)
    enc = bpe.encode_words(docs, merges)
    assert dict(enc.dtypes)["doc_id"] == "string"
    got = {r.doc_id: r.bpe_tokens for r in enc.collect()}
    assert set(got) == {"doc-a", "doc-b"}
    assert "".join(got["doc-a"]).startswith("hug")
    counts = {r.doc_id: r.n_bpe_tokens for r in bpe.bpe_token_count(docs, merges).collect()}
    assert counts["doc-a"] >= 3  # three words at least one token each


def test_partition_skew_report_is_distributed_topk(spark):
    from terra_bonobo_nodes_spark.operators.quality import partition_skew_report

    df = spark.range(100).withColumn("k", (F.col("id") % 7).cast("string"))
    rep = partition_skew_report(df, key_cols=["k"], top_n=3)
    plan = _physical_plan(rep)
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    hot = [r for r in rep.collect() if r.facet == "hot_key"]
    assert len(hot) == 3
    # keys 0 and 1 have 15 rows, the rest 14 — ties break on the key
    assert [(r.key, r.n_rows) for r in hot] == [("0", 15), ("1", 15), ("2", 14)]


def test_registry_warns_without_artifacts(monkeypatch):
    from terra_bonobo_nodes_spark.plans import registry

    monkeypatch.setattr(registry, "_last_green_rounds", lambda: (0, {}))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        registry._compute_priority(["a", "b"])
    assert any("CORRECTNESS" in str(w.message) for w in caught)


def test_kdb_empty_record_side_single_leaf(spark):
    """An empty record side degenerates to one kdb leaf and the join
    yields zero candidates — no crash, no special-case branch needed."""
    from terra_bonobo_nodes_spark.operators import spatial

    rec = spark.createDataFrame(
        [], "identifier string, _rx struct<geom string, bbox array<double>, area double>"
    ).withColumn("_rb", F.col("_rx.bbox"))
    lay = spark.createDataFrame(
        [("POLYGON((0 0,1 0,1 1,0 1,0 0))", [0.0, 0.0, 1.0, 1.0])],
        "layer_geom string, _lb array<double>",
    )
    out = spatial._kdb_candidates(rec, lay, F.col("_rx.bbox"), F.col("_lb"))
    assert out.count() == 0

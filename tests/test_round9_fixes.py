"""Round-9 contract pins.

1. The csv_documents_to_rows header contract (ADVICE_r08): an explicit
   ``header=`` keeps an all-empty corpus well-formed (zero rows, the
   declared columns) and removes the plan-build driver probe; without
   a header, an all-empty corpus fails fast and typed instead of
   returning a schema-less DataFrame.
2. ivf_train's typed fail-fast on a corpus smaller than the codebook
   (ADVICE_r08: previously an opaque numpy AxisError).
3. The degenerate-input discipline extended beyond the registry
   (VERDICT_r08 item 7): the pytest-only operators — trainable BPE,
   golden_record, compact_parquet_dir — each tolerate their empty
   input with a well-formed result, not a crash.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --- 1. csv header contract --------------------------------------------------


def _docs(spark, contents):
    return spark.createDataFrame([(c,) for c in contents], "content STRING")


def test_csv_explicit_header_parses_without_probe(spark):
    from terra_bonobo_nodes_spark.sources.csv import csv_documents_to_rows

    docs = _docs(spark, ["a,b\n1,2\n3,4"])
    out = csv_documents_to_rows(docs, "content", header=["a", "b"])
    assert out.columns == ["a", "b"]
    rows = {(r["a"], r["b"]) for r in out.collect()}
    assert rows == {("1", "2"), ("3", "4")}


def test_csv_empty_corpus_with_header_keeps_declared_columns(spark):
    """The reference contract (test_common.py:34-40): empty CSV -> no
    rows, but the stream stays well-formed — here, the declared schema
    survives so downstream column references resolve."""
    from terra_bonobo_nodes_spark.sources.csv import csv_documents_to_rows

    docs = _docs(spark, ["", ""])
    out = csv_documents_to_rows(docs, "content", header=["event_id", "kind"])
    assert out.columns == ["event_id", "kind"]
    assert out.count() == 0
    # the r08 failure shape: a column reference on the empty result
    assert out.where(F.col("event_id").isNotNull()).count() == 0


def test_csv_empty_corpus_without_header_fails_typed(spark):
    from terra_bonobo_nodes_spark.sources.csv import csv_documents_to_rows

    docs = _docs(spark, ["", ""])
    with pytest.raises(ValueError, match="header"):
        csv_documents_to_rows(docs, "content")


def test_csv_header_inference_fallback_still_works(spark):
    from terra_bonobo_nodes_spark.sources.csv import csv_documents_to_rows

    docs = _docs(spark, ["", "x,y\n7,8"])  # first doc empty: probe skips it
    out = csv_documents_to_rows(docs, "content")
    assert out.columns == ["x", "y"]
    assert [(r["x"], r["y"]) for r in out.collect()] == [("7", "8")]


# --- 2. ivf typed fail-fast --------------------------------------------------


def test_ivf_train_empty_corpus_raises_typed(spark):
    from terra_bonobo_nodes_spark.llm.similarity import ivf_train

    empty = spark.createDataFrame([], "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    with pytest.raises(ValueError, match="ivf_train"):
        ivf_train(empty, n_clusters=4)


def test_ivf_train_fewer_vectors_than_clusters_raises_typed(spark):
    from terra_bonobo_nodes_spark.llm.similarity import ivf_train

    tiny = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    with pytest.raises(ValueError, match="n_clusters=4"):
        ivf_train(tiny, n_clusters=4)


# --- 3. pytest-only operators on empty input ---------------------------------


@pytest.fixture()
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id BIGINT, text STRING")


def test_bpe_word_frequencies_empty_corpus(spark, empty_docs):
    from terra_bonobo_nodes_spark.llm.bpe import word_frequencies

    wf = word_frequencies(empty_docs)
    assert wf.columns == ["word", "n"]
    assert wf.count() == 0


def test_bpe_train_on_empty_frequency_table(spark, empty_docs):
    from terra_bonobo_nodes_spark.llm.bpe import train_bpe, word_frequencies

    assert train_bpe(word_frequencies(empty_docs), n_merges=10) == []
    assert train_bpe([], n_merges=10) == []


def test_bpe_encode_empty_corpus_keeps_schema(spark, empty_docs):
    from terra_bonobo_nodes_spark.llm.bpe import bpe_token_count, encode_words

    enc = encode_words(empty_docs, merges=[("a", "b")])
    assert enc.columns == ["doc_id", "bpe_tokens"]
    assert enc.count() == 0
    cnt = bpe_token_count(empty_docs, merges=[])
    assert cnt.columns == ["doc_id", "n_bpe_tokens"]
    assert cnt.count() == 0


def test_golden_record_empty_input(spark):
    from terra_bonobo_nodes_spark.operators.linkage import golden_record

    empty = spark.createDataFrame([], "rec_id BIGINT, name STRING")
    out = golden_record(empty, "rec_id", "name")
    assert out.columns == ["entity_id", "n_members", "canonical_name"]
    assert out.count() == 0


def test_golden_record_zero_pairs_all_singletons(spark):
    """No fuzzy match anywhere: every record must still come back as
    its own entity (the left-join + coalesce path, not a dropped row)."""
    from terra_bonobo_nodes_spark.operators.linkage import golden_record

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "zebra"), (3, "quux")], "rec_id BIGINT, name STRING"
    )
    out = golden_record(df, "rec_id", "name", max_distance=1)
    got = {(r["entity_id"], r["n_members"], r["canonical_name"]) for r in out.collect()}
    assert got == {(1, 1, "alpha"), (2, 1, "zebra"), (3, 1, "quux")}


def test_compact_parquet_dir_empty_dir_is_noop(spark, tmp_path):
    from terra_bonobo_nodes_spark.sinks.compact import compact_parquet_dir

    d = tmp_path / "empty_table"
    d.mkdir()
    assert compact_parquet_dir(spark, str(d)) == -1  # 0 files < min_files

"""ExactSubstr-style self-dedup (llm/selfdedup.py): corpus-wide
duplicated k-gram spans — detection, island merging, the cut-every-
occurrence policy — pinned against hand cases, an independent Python
reference (hypothesis-swept), and the DuckDB SQL mirror."""

from __future__ import annotations

import re

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from terra_bonobo_nodes_spark.llm.selfdedup import (
    duplicated_spans,
    self_dedup_report,
    self_dedup_report_sql,
)

COLS = (
    "n_toks",
    "n_dup_grams",
    "n_spans",
    "dup_toks",
    "dup_frac",
    "clean_text",
    "n_kept_toks",
)


def _run(spark, docs, k=3, min_count=2):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    out = self_dedup_report(df, k=k, min_count=min_count).collect()
    return {r["doc_id"]: r.asDict() for r in out}


def _ref(docs, k=3, min_count=2):
    """Independent reference: dict-counted grams, linear island merge."""
    toks_by_doc = []
    for d in docs:
        norm = re.sub(" +", " ", re.sub("[^a-z0-9]+", " ", (d or "").lower())).strip()
        toks_by_doc.append(norm.split(" ") if norm else [])
    cnt: dict[str, int] = {}
    for toks in toks_by_doc:
        for p in range(len(toks) - k + 1):
            g = " ".join(toks[p : p + k])
            cnt[g] = cnt.get(g, 0) + 1
    out = {}
    for i, toks in enumerate(toks_by_doc):
        dup_pos = [
            p + 1
            for p in range(len(toks) - k + 1)
            if cnt[" ".join(toks[p : p + k])] >= min_count
        ]
        spans: list[list[int]] = []
        prev = None
        for p in dup_pos:
            if prev is not None and p - prev <= k:
                spans[-1][1] = p + k - 1
            else:
                spans.append([p, p + k - 1])
            prev = p
        dup_toks = sum(e - s + 1 for s, e in spans)
        drop = {j for s, e in spans for j in range(s, e + 1)}
        kept = [t for j, t in enumerate(toks, start=1) if j not in drop]
        out[i] = {
            "n_toks": len(toks),
            "n_dup_grams": len(dup_pos),
            "n_spans": len(spans),
            "dup_toks": dup_toks,
            "dup_frac": (dup_toks / len(toks)) if toks else 0.0,
            "clean_text": " ".join(kept),
            "n_kept_toks": len(kept),
        }
    return out


def test_cross_document_duplicate_passage(spark):
    # 6-token passage shared by docs 0 and 1 -> with k=3 each doc has 4
    # duplicated gram starts merging into ONE 6-token span; doc 2 clean.
    rows = _run(
        spark,
        [
            "alpha beta gamma delta epsilon zeta unique0 tail0",
            "head1 alpha beta gamma delta epsilon zeta",
            "nothing shared here at all",
        ],
    )
    assert rows[0]["n_spans"] == 1 and rows[0]["dup_toks"] == 6
    assert rows[0]["clean_text"] == "unique0 tail0"
    assert rows[1]["n_spans"] == 1 and rows[1]["dup_toks"] == 6
    assert rows[1]["clean_text"] == "head1"
    assert rows[2]["n_spans"] == 0 and rows[2]["dup_toks"] == 0
    assert rows[2]["clean_text"] == "nothing shared here at all"
    assert rows[2]["n_kept_toks"] == 5


def test_within_document_repeat_counts_as_duplication(spark):
    # one doc repeating its own 3-gram: global count >= 2 from a single
    # document, both occurrences cut (the released tool's policy)
    rows = _run(spark, ["x y z mid x y z"])
    assert rows[0]["n_dup_grams"] == 2
    assert rows[0]["n_spans"] == 2
    assert rows[0]["dup_toks"] == 6
    assert rows[0]["clean_text"] == "mid"


def test_adjacent_spans_merge_and_distant_spans_dont(spark):
    # doc 0 / doc 1 share two 3-grams; in doc 0 their starts are k
    # apart (touching intervals -> ONE span), the sharer keeps them
    # far apart -> TWO spans.
    d0 = "a b c d e f"  # grams 'a b c' at 1, 'd e f' at 4: 4-1 = k -> merge
    d1 = "a b c w1 w2 w3 w4 d e f"  # starts 1 and 8: gap 7 > k -> two spans
    rows = _run(spark, [d0, d1])
    assert rows[0]["n_spans"] == 1 and rows[0]["dup_toks"] == 6
    assert rows[0]["clean_text"] == ""
    assert rows[1]["n_spans"] == 2 and rows[1]["dup_toks"] == 6
    assert rows[1]["clean_text"] == "w1 w2 w3 w4"


def test_short_null_and_empty_documents(spark):
    rows = _run(spark, ["a b", None, "", "a b"])  # len < k: no grams ever
    for i in (0, 3):
        assert rows[i]["n_toks"] == 2 and rows[i]["n_dup_grams"] == 0
        assert rows[i]["clean_text"] == "a b"
    for i in (1, 2):
        assert rows[i]["n_toks"] == 0 and rows[i]["dup_frac"] == 0.0
        assert rows[i]["clean_text"] == "" and rows[i]["n_kept_toks"] == 0


def test_min_count_threshold(spark):
    docs = ["p q r", "p q r", "p q r"]
    assert _run(spark, docs, min_count=4)[0]["n_dup_grams"] == 0
    assert _run(spark, docs, min_count=3)[0]["n_dup_grams"] == 1


def test_spans_frame_grain(spark):
    df = spark.createDataFrame(
        [(0, "m n o p tail0"), (1, "head1 m n o p")], "doc_id long, text string"
    )
    spans = {
        (r["doc_id"], r["start_tok"], r["end_tok"])
        for r in duplicated_spans(df, k=3).collect()
    }
    assert spans == {(0, 1, 4), (1, 2, 5)}


def test_dup_frac_exact(spark):
    rows = _run(spark, ["u v w x", "u v w y"])  # 3 of 4 tokens duplicated
    assert rows[0]["dup_frac"] == 3 / 4


def test_matches_duckdb_mirror(spark):
    docs = [
        "alpha beta gamma delta tail",
        "alpha beta gamma delta other",
        "x y z mid x y z",
        None,
        "",
        "short one",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = sorted(
        tuple(r) for r in self_dedup_report(df, k=3).collect()
    )
    values = ", ".join(
        f"({i}, " + ("NULL" if t is None else f"'{t}'") + ")"
        for i, t in enumerate(docs)
    )
    src = f"SELECT * FROM (VALUES {values}) AS v(doc_id, text)"
    want = sorted(
        tuple(r)
        for r in duckdb.sql(self_dedup_report_sql("text", src, k=3)).fetchall()
    )
    assert got == want


_word = st.sampled_from(["a", "b", "c"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=15, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=5), st.sampled_from([2, 3]))
def test_matches_python_reference(spark, docs, k):
    rows = _run(spark, docs, k=k)
    ref = _ref(docs, k=k)
    for i in range(len(docs)):
        got = {c: rows[i][c] for c in COLS}
        assert got == pytest.approx(ref[i]), (i, k, docs)


def test_empty_corpus(spark):
    d = spark.createDataFrame([], "doc_id long, text string")
    assert self_dedup_report(d).collect() == []

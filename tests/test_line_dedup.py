"""Corpus-level line dedup (CCNet): first occurrence in (doc_id, pos)
order survives, every later copy — cross-document or within-document —
drops."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from terra_bonobo_nodes_spark.llm.scrub import line_dedup


def _run(spark, docs, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    out = line_dedup(df, **kw).collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_cross_document_duplicate_keeps_first(spark):
    rows = _run(
        spark,
        [
            "HEADER\nalpha body\nFOOTER",
            "HEADER\nbeta body\nFOOTER",
            "HEADER\ngamma body",
        ],
    )
    assert rows[0]["ld_text"] == "HEADER\nalpha body\nFOOTER"
    assert rows[1]["ld_text"] == "beta body"
    assert rows[2]["ld_text"] == "gamma body"
    assert rows[0]["ld_n_lines"] == 3 and rows[0]["ld_n_lines_kept"] == 3
    assert rows[1]["ld_n_lines"] == 3 and rows[1]["ld_n_lines_kept"] == 1


def test_within_document_repeat_drops(spark):
    rows = _run(spark, ["same line\nunique\nsame line"])
    assert rows[0]["ld_text"] == "same line\nunique"
    assert rows[0]["ld_n_lines"] == 3
    assert rows[0]["ld_n_lines_kept"] == 2


def test_trim_and_blank_lines(spark):
    # trimmed before matching; blank/whitespace-only lines are structure,
    # not content — they never count and never survive
    rows = _run(spark, ["  x  \n\n   \nx"])
    assert rows[0]["ld_text"] == "x"
    assert rows[0]["ld_n_lines"] == 2
    assert rows[0]["ld_n_lines_kept"] == 1


def test_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "real line")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r.asDict() for r in line_dedup(df).collect()}
    for i in (0, 1):
        assert rows[i]["ld_text"] == ""
        assert rows[i]["ld_n_lines"] == 0
        assert rows[i]["ld_n_lines_kept"] == 0
    assert rows[2]["ld_text"] == "real line"


def test_passthrough_columns_and_order(spark):
    df = spark.createDataFrame(
        [(0, "a\nb", "s1"), (1, "b\nc", "s2")],
        "doc_id long, text string, source string",
    )
    rows = {r["doc_id"]: r.asDict() for r in line_dedup(df).collect()}
    assert rows[0]["source"] == "s1" and rows[1]["source"] == "s2"
    assert rows[0]["text"] == "a\nb"  # input column untouched
    # survivors keep ORIGINAL line order, not dedup-win order
    assert rows[0]["ld_text"] == "a\nb" and rows[1]["ld_text"] == "c"


def _ref(docs):
    seen: set[str] = set()
    out = {}
    for i, doc in enumerate(docs):
        lines = [l.strip() for l in (doc or "").split("\n")]
        lines = [l for l in lines if l]
        kept = []
        for l in lines:
            if l not in seen:
                seen.add(l)
                kept.append(l)
        out[i] = ("\n".join(kept), len(lines), len(kept))
    return out


_line = st.sampled_from(["x", "y", "zz", " x ", "", "  ", "a b"])
_doc = st.lists(_line, min_size=0, max_size=5).map("\n".join)


@settings(max_examples=15, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=6))
def test_matches_python_reference(spark, docs):
    rows = _run(spark, docs)
    ref = _ref(docs)
    for i in range(len(docs)):
        got = (rows[i]["ld_text"], rows[i]["ld_n_lines"], rows[i]["ld_n_lines_kept"])
        assert got == ref[i], (i, docs)

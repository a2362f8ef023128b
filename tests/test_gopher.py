"""Gopher rule-battery filter: one document per rule, each violating
exactly that rule against an otherwise-clean base document."""

from __future__ import annotations

import pytest

from terra_bonobo_nodes_spark.llm.text import GOPHER_STOPWORDS, gopher_rules

# 18 words, mean length ~4, 6 distinct Gopher stopwords, all-alpha.
_BASE = (
    "the quick brown fox jumps over that lazy dog with "
    "great energy and of course have some fun"
)
GOOD = " ".join([_BASE] * 3)  # 54 words


def _run(spark, docs, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    out = gopher_rules(df, **kw).collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_good_document_keeps(spark):
    row = _run(spark, [GOOD])[0]
    assert row["g_keep"] is True
    assert not any(v for k, v in row.items() if k.startswith("g_flag_"))
    assert row["g_n_words"] == 54
    assert 3.0 <= row["g_mean_word_len"] <= 10.0


@pytest.mark.parametrize(
    "doc,flag",
    [
        ("few words here", "g_flag_n_words"),
        (" ".join(["a b"] * 30), "g_flag_mean_word_len"),
        (GOOD + " " + "#" * 10, "g_flag_symbol_ratio"),
        (GOOD + " " + "... " * 10, "g_flag_symbol_ratio"),
        (
            "\n".join("- " + _BASE for _ in range(3)),
            "g_flag_bullet_lines",
        ),
        (
            "\n".join(_BASE + " ..." for _ in range(3)),
            "g_flag_ellipsis_lines",
        ),
        (GOOD + " " + " ".join(str(n) for n in range(100, 120)), "g_flag_alpha_words"),
        (
            " ".join(["zebra cobra llama puma"] * 13),
            "g_flag_stopwords",
        ),
    ],
)
def test_each_rule_fires(spark, doc, flag):
    row = _run(spark, [doc])[0]
    assert row[flag] is True, f"{flag} should fire"
    assert row["g_keep"] is False


def test_rule_isolation_on_targeted_docs(spark):
    """The bullet/ellipsis/stopword docs violate ONLY their rule —
    the base text keeps every other rule clean, so the flag columns
    are auditable one at a time."""
    rows = _run(
        spark,
        [
            "\n".join("- " + _BASE for _ in range(3)),
            "\n".join(_BASE + " ..." for _ in range(3)),
            " ".join(["zebra cobra llama puma"] * 13),
        ],
    )
    only = {
        0: "g_flag_bullet_lines",
        2: "g_flag_stopwords",
    }
    for i, expect in only.items():
        fired = [k for k, v in rows[i].items() if k.startswith("g_flag_") and v]
        assert fired == [expect], (i, fired)
    # the ellipsis-lines doc also legitimately trips the symbol ratio
    # (3 ellipses / 54 words < 0.1 — no; 3/54 = 0.055 — check it's only
    # the line rule)
    fired1 = [k for k, v in rows[1].items() if k.startswith("g_flag_") and v]
    assert fired1 == ["g_flag_ellipsis_lines"], fired1


def test_empty_document_drops(spark):
    row = _run(spark, [""])[0]
    assert row["g_keep"] is False
    assert row["g_flag_n_words"] and row["g_flag_mean_word_len"]
    assert row["g_flag_alpha_words"]
    assert row["g_n_words"] == 0 and row["g_mean_word_len"] == 0.0


def test_thresholds_are_parameters(spark):
    short = "the fox and that dog have fun with abandon today"  # 10 words
    strict = _run(spark, [short])[0]
    assert strict["g_flag_n_words"]
    relaxed = _run(spark, [short], min_words=5)[0]
    assert not relaxed["g_flag_n_words"]
    assert relaxed["g_keep"] is True


def test_stopword_list_is_gophers():
    assert GOPHER_STOPWORDS == (
        "the", "be", "to", "of", "and", "that", "have", "with",
    )


# --- pure-Python reference sweep (the test_c4 precedent) -----------------

import re as _re

from hypothesis import given, settings
from hypothesis import strategies as st


def _ref(text):
    toks = [t for t in _re.split(r"[^a-z0-9]+", text.lower()) if t]
    n = len(toks)
    lines = [l.strip() for l in text.split("\n")]
    lines = [l for l in lines if l]
    mean_wl = sum(map(len, toks)) / n if n else 0.0
    hash_ratio = text.count("#") / n if n else 0.0
    ellipsis_ratio = len(_re.findall(r"\.\.\.|…", text)) / n if n else 0.0
    bullet = sum(bool(_re.match(r"[-*•]", l)) for l in lines)
    ell_end = sum(bool(_re.search(r"(\.\.\.|…)$", l)) for l in lines)
    alpha = sum(bool(_re.search("[a-z]", t)) for t in toks)
    flags = {
        "g_flag_n_words": n < 50 or n > 100_000,
        "g_flag_mean_word_len": mean_wl < 3.0 or mean_wl > 10.0,
        "g_flag_symbol_ratio": hash_ratio > 0.1 or ellipsis_ratio > 0.1,
        "g_flag_bullet_lines": (bullet / len(lines) if lines else 0.0) > 0.9,
        "g_flag_ellipsis_lines": (ell_end / len(lines) if lines else 0.0) > 0.3,
        "g_flag_alpha_words": (alpha / n if n else 0.0) < 0.8,
        "g_flag_stopwords": len(set(toks) & set(GOPHER_STOPWORDS)) < 2,
    }
    return n, flags


_piece = st.sampled_from(
    list("ab z.#…!-*•\n09")
    + ["the ", "of ", "and ", "...", "word ", "- item\n", "longwordhere "]
)
_doc = st.lists(_piece, min_size=0, max_size=60).map("".join)


@settings(max_examples=30, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=8))
def test_matches_python_reference(spark, docs):
    rows = _run(spark, docs)
    for i, doc in enumerate(docs):
        n, flags = _ref(doc)
        r = rows[i]
        assert r["g_n_words"] == n, (i, doc)
        for k, v in flags.items():
            assert r[k] == v, (i, k, doc)
        assert r["g_keep"] == (not any(flags.values())), (i, doc)

"""Reference-trained word-bigram LM cross-entropy (llm/lm.py): pinned
hand cases, a hypothesis sweep against an independent pure-Python
reference, NULL/empty handling, and Spark==DuckDB parity of the full
SQL mirror."""

from __future__ import annotations

import math
import re
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from terra_bonobo_nodes_spark.llm.lm import word_lm_xent, word_lm_xent_sql

_REF = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog sat",
]
_DOCS = [
    (0, "the cat sat on the mat"),   # in-distribution
    (1, "zonk quux blarg wibble"),    # all-OOV
    (2, "the"),                       # 1 token -> no bigrams
    (3, ""),                          # empty
    (4, None),                        # NULL
]


def _py_xent(doc: str, ref: list[str]) -> tuple[int, float]:
    """Independent reference: add-one word-bigram LM, DECIMAL(20,6)
    per-log quantization (round-half-up, like the engines' DECIMAL
    cast), exact fraction sum."""

    def toks(t):
        return [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).split() if w]

    c12: dict[tuple[str, str], int] = {}
    c1: dict[str, int] = {}
    vocab: set[str] = set()
    for t in ref:
        ws = toks(t)
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    V = len(vocab) + 1
    ws = toks(doc)
    pairs = list(zip(ws, ws[1:]))
    if not pairs:
        return 0, 0.0
    total = Decimal(0)
    for a, b in pairs:
        p = (c12.get((a, b), 0) + 1) / (c1.get(a, 0) + V)
        q = Decimal(repr(math.log(p))).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
        total += q
    return len(pairs), -float(total) / len(pairs)


def _run(spark, docs, ref):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ref)], "doc_id long, text string"
    )
    out = word_lm_xent(df, rdf).collect()
    return {r["doc_id"]: (r["n_bigrams"], r["lm_xent"]) for r in out}


def test_pinned_hand_case(spark):
    rows = _run(spark, _DOCS, _REF)
    assert set(rows) == {0, 1, 2, 3, 4}
    # degenerate docs: no bigrams, zero xent, still present
    for i in (2, 3, 4):
        assert rows[i] == (0, 0.0)
    # in-distribution scores strictly lower than all-OOV
    assert rows[0][0] == 5 and rows[1][0] == 3
    assert rows[0][1] < rows[1][1]
    # vocabulary: {the cat sat on mat dog rug a and} = 9 types, V = 10
    # all-OOV bigram probability is exactly 1/V per position
    want = -math.log(1.0 / 10.0)
    assert rows[1][1] == pytest.approx(want, abs=2e-6)


def test_matches_python_reference_exactly(spark):
    rows = _run(spark, _DOCS, _REF)
    for doc_id, text in _DOCS:
        m, h = _py_xent(text or "", _REF)
        assert rows[doc_id][0] == m
        assert rows[doc_id][1] == pytest.approx(h, abs=1e-12), (doc_id, text)


_word = st.sampled_from("the a cat dog sat mat on zonk 7 x".split())
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=25, deadline=None)
@given(st.lists(_text, min_size=1, max_size=5), st.lists(_text, min_size=1, max_size=4))
def test_sweep_vs_python_reference(spark, docs, ref):
    rows = _run(spark, [(i, t) for i, t in enumerate(docs)], ref)
    for i, t in enumerate(docs):
        m, h = _py_xent(t, ref)
        assert rows[i][0] == m
        assert rows[i][1] == pytest.approx(h, abs=1e-12)


def test_sql_mirror_parity(spark, tmp_path):
    """The full DuckDB statement returns the same (m, xent) multiset
    as the Spark plan over the same parquet — the driver contract."""
    docs = [(i, t) for i, t in enumerate(
        ["the cat sat on the mat", "zonk quux", "a dog sat on a rug", "", "the"]
    )]
    ref = [(100 + i, t) for i, t in enumerate(_REF)]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    rdf = spark.createDataFrame(ref, "doc_id long, text string")
    dp, rp = str(tmp_path / "docs"), str(tmp_path / "ref")
    ddf.write.parquet(dp)
    rdf.write.parquet(rp)

    got = {
        r["doc_id"]: (r["n_bigrams"], round(r["lm_xent"], 4))
        for r in word_lm_xent(
            spark.read.parquet(dp), spark.read.parquet(rp)
        ).collect()
    }
    sql = word_lm_xent_sql(
        f"read_parquet('{dp}/*.parquet')", f"read_parquet('{rp}/*.parquet')"
    )
    want = {
        row[0]: (row[1], round(row[2], 4)) for row in duckdb.sql(sql).fetchall()
    }
    assert got == want and len(want) == len(docs)

"""Flesch / FK readability (llm/text.py::readability): integer
milli-point exactness vs a Python reference, edge cases, SQL mirror."""

from __future__ import annotations

import re

import duckdb

from terra_bonobo_nodes_spark.llm.text import readability, readability_sql


def _py_ref(text):
    t = text or ""
    toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
    sents = [s for s in re.split(r"[.!?]+", t) if s.strip()]
    n_s = max(1, len(sents))
    syl = sum(
        max(1, len([g for g in re.split(r"[^aeiouy]+", w) if g]))
        for w in toks
    )
    n_w = len(toks)
    if n_w == 0:
        return n_w, n_s, syl, None, None
    flesch = 206835 - (1015 * n_w) // n_s - (84600 * syl) // n_w
    fk = (390 * n_w) // n_s + (11800 * syl) // n_w - 15590
    return n_w, n_s, syl, flesch, fk


CASES = [
    "The cat sat on the mat. It was a sunny day!",
    "Notwithstanding extraordinary circumstances, implementation "
    "necessitates comprehensive organizational restructuring.",
    "Hi.",
    "",
    None,
    "no terminal punctuation here",
    "lists... with ellipses... everywhere...",
]


def test_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "id long, text string"
    )
    got = {
        r["id"]: (
            r["r_n_words"], r["r_n_sentences"], r["r_n_syllables"],
            r["r_flesch_milli"], r["r_fk_grade_milli"],
        )
        for r in readability(df).collect()
    }
    for i, t in enumerate(CASES):
        assert got[i] == _py_ref(t), (i, t)


def test_simple_beats_dense_text(spark):
    df = spark.createDataFrame(
        [(0, CASES[0]), (1, CASES[1])], "id long, text string"
    )
    got = {r["id"]: r["r_flesch_milli"] for r in readability(df).collect()}
    assert got[0] > 60000 > got[1]  # easy > 60 points > bureaucratic


def test_sql_mirror(spark, duck):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "id long, text string"
    )
    got = sorted(tuple(r) for r in readability(df).select(
        "id", "r_n_words", "r_n_sentences", "r_n_syllables",
        "r_flesch_milli", "r_fk_grade_milli",
    ).collect())
    duck.execute(
        "CREATE OR REPLACE TABLE rd AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, " + ("NULL" if t is None else "'" + t.replace("'", "''") + "'") + ")"
            for i, t in enumerate(CASES)
        )
        + ") t(id, text)"
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            f"SELECT id, {readability_sql('text')} FROM rd"
        ).fetchall()
    )
    assert got == want

"""html_to_text (llm/html.py): semantic battery, entity decode order,
Spark == DuckDB mirror parity, and a hypothesis sweep of both engines
against an independent Python re implementation of the same spec."""

from __future__ import annotations

import re

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from terra_bonobo_nodes_spark.llm.html import (
    _ENTITIES,
    _STEPS,
    _WS_STEPS,
    html_to_text,
    html_to_text_sql,
)


def _py_reference(s: str) -> str:
    """The same ordered spec, executed with Python's re module —
    an engine-independent third implementation."""
    for pat, repl in _STEPS:
        s = re.sub(pat, repl, s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    for pat, repl in _WS_STEPS:
        s = re.sub(pat, repl, s)
    return s.strip(" \n")


BATTERY = [
    # tags stripped, block closers -> newlines, inline tags seamless
    (
        "<html><body><h1>Title</h1><p>One <b>bold</b> word.</p>"
        "<p>Second para.</p></body></html>",
        "Title\nOne bold word.\nSecond para.",
    ),
    # script/style vanish WITH content; case-insensitive
    (
        "<p>keep</p><SCRIPT type='x'>var a = '<p>no</p>';</SCRIPT>"
        "<style>p { color: red }</style><p>also keep</p>",
        "keep\nalso keep",
    ),
    # comments, br/hr, list structure
    (
        "<!-- nav -->a<br>b<hr/>c<ul><li>x</li><li>y</li></ul>",
        "a\nb\nc\nx\ny",
    ),
    # table cells are block boundaries: adjacent cells never glue
    (
        "<table><tr><td>Alpha</td><td>Beta</td></tr><tr><th>H</th></tr></table>",
        "Alpha\nBeta\nH",
    ),
    # entity decode order: &amp;lt; is the literal text '&lt;'
    ("5 &lt; 6 &amp;&amp; 7 &gt; 2", "5 < 6 && 7 > 2"),
    ("write &amp;lt; for a literal", "write &lt; for a literal"),
    ("&quot;q&quot; &apos;a&apos; &#39;b&#39; x&nbsp;y", "\"q\" 'a' 'b' x y"),
    # whitespace: intra-line runs collapse, blank-line runs collapse
    (
        "<p>a   b\t\tc</p>\n\n\n\n<p>d</p>",
        "a b c\nd",
    ),
    # documented limits: numeric refs pass through; stray '<' survives
    ("it&#8217;s 1 < 2", "it&#8217;s 1 < 2"),
    # attributes with '>' inside quotes are NOT handled (WET-grade:
    # tag ends at first '>'), documented by construction
    ("", ""),
]


def test_battery_spark(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(BATTERY)], "i int, html string"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text("html").alias("t")).collect()
    }
    for i, (h, want) in enumerate(BATTERY):
        assert got[i] == want, f"{h!r}: {got[i]!r} != {want!r}"


def test_battery_matches_duckdb_mirror_and_reference(spark):
    con = duckdb.connect()
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(BATTERY)], "i int, html string"
    )
    sgot = {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text("html").alias("t")).collect()
    }
    for i, (h, want) in enumerate(BATTERY):
        dgot = con.execute(
            f"SELECT {html_to_text_sql('?')}", [h]
        ).fetchone()[0]
        assert sgot[i] == dgot == _py_reference(h) == want, (h, sgot[i], dgot)


def test_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "html string")
    assert df.select(html_to_text("html").alias("t")).collect()[0]["t"] is None


def test_unclosed_script_documented_leak(spark):
    """The documented WET-grade limit: without a close tag the opener
    is stripped but the script body remains as text."""
    df = spark.createDataFrame([("<script>var x;",)], "html string")
    assert (
        df.select(html_to_text("html").alias("t")).collect()[0]["t"] == "var x;"
    )


_FRAGMENTS = st.sampled_from(
    [
        "<p>", "</p>", "<div class='x'>", "</div>", "<br>", "<li>", "</li>",
        "<script>", "</script>", "<style>", "</style>", "<!--", "-->",
        "&amp;", "&lt;", "&nbsp;", "&#39;", "word", "two words", "  ",
        "\n", "a<b", "5>2", "'", '"', "<h2>", "</h2>", "x",
    ]
)


@settings(max_examples=40, deadline=None)
@given(st.lists(_FRAGMENTS, min_size=0, max_size=12))
def test_hypothesis_three_way_parity(spark, frags):
    """Arbitrary tag/entity/whitespace soup: Spark, the DuckDB mirror,
    and the Python re reference must agree byte-for-byte."""
    html = "".join(frags)
    df = spark.createDataFrame([(html,)], "html string")
    sgot = df.select(html_to_text("html").alias("t")).collect()[0]["t"]
    dgot = duckdb.connect().execute(
        f"SELECT {html_to_text_sql('?')}", [html]
    ).fetchone()[0]
    assert sgot == dgot == _py_reference(html), (html, sgot, dgot)


def test_plan_zero_exchange_zero_python(spark):
    df = spark.createDataFrame([("<p>x</p>",)], "html string")
    plan = (
        df.select(html_to_text("html"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan

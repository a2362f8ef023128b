"""Link extraction (llm/html.extract_links) and host-graph edge
building (llm/urls.host_link_edges): hand cases, the DuckDB mirror,
and the composed html -> edges -> pagerank chain."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from terra_bonobo_nodes_spark.llm.html import extract_links, extract_links_sql
from terra_bonobo_nodes_spark.llm.urls import host_link_edges

_PAGE = (
    '<html><body>'
    '<a href="http://other.example/p1">abs</a>'
    "<a class='x' href='https://single.example/p2'>sq</a>"
    '<a href="//proto.example/p3">proto-rel</a>'
    '<a href="/local/page">rel</a>'
    '<a href="mailto:a@b.example">mail</a>'
    '<a href="javascript:void(0)">js</a>'
    '<a href="#frag">frag</a>'
    '<a href="">empty</a>'
    '<A HREF="HTTP://UPPER.EXAMPLE/P4">upper</A>'
    '</body></html>'
)


def test_extract_links_hand_case(spark):
    df = spark.createDataFrame([(1, _PAGE), (2, "<p>no links</p>"), (3, None)],
                               "doc_id long, html string")
    got = {r["doc_id"]: r["links"] for r in
           df.select("doc_id", extract_links("html").alias("links")).collect()}
    # double-quoted in order, then single-quoted
    assert got[1] == [
        "http://other.example/p1", "//proto.example/p3", "/local/page",
        "mailto:a@b.example", "javascript:void(0)", "#frag", "",
        "HTTP://UPPER.EXAMPLE/P4", "https://single.example/p2",
    ]
    assert got[2] == []
    assert got[3] is None


def test_extract_links_duckdb_mirror(spark):
    pages = [(1, _PAGE), (2, "<p>none</p>"), (3, None),
             (4, '<a href="x">1</a><a href=\'y\'>2</a>')]
    df = spark.createDataFrame(pages, "doc_id long, html string")
    got = {r["doc_id"]: r["links"] for r in
           df.select("doc_id", extract_links("html").alias("links")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE p (doc_id BIGINT, html VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pages)
    want = dict(con.execute(
        f"SELECT doc_id, {extract_links_sql('html')} FROM p"
    ).fetchall())
    assert got == want


def test_host_link_edges_classification(spark):
    df = spark.createDataFrame(
        [("http://me.example/index", _PAGE),
         ("", "<a href=\"http://x.example/\">orphan</a>"),   # no src host
         ("http://lonely.example/", None)],                   # NULL html
        "url string, html string",
    )
    got = sorted(tuple(r) for r in host_link_edges(df).collect())
    assert got == sorted([
        ("me.example", "other.example"),
        ("me.example", "proto.example"),      # protocol-relative resolves
        ("me.example", "me.example"),         # relative -> self edge
        ("me.example", "upper.example"),      # host lowercased
        ("me.example", "single.example"),
    ])


def test_edges_feed_pagerank(spark):
    """The composition the module exists for: html -> edges -> rank."""
    from terra_bonobo_nodes_spark.llm.graph import pagerank_fixed

    pages = [
        (f"http://h{i}.ex/", f'<a href="http://h{(i + 1) % 3}.ex/p">n</a>')
        for i in range(3)
    ]
    df = spark.createDataFrame(pages, "url string, html string")
    ranks = {r["node"]: r["rank"]
             for r in pagerank_fixed(host_link_edges(df)).collect()}
    # a 3-cycle: perfectly symmetric, all ranks identical and positive
    assert len(ranks) == 3 and len(set(ranks.values())) == 1
    assert next(iter(ranks.values())) > 0


# --- tag-aware extraction: nofollow + anchor text ----------------------------

from terra_bonobo_nodes_spark.llm.html import (
    extract_link_tags,
    extract_link_tags_sql,
)

_TAGGED = (
    '<a href="http://a.ex/1">plain <b>bold</b> anchor</a>'
    '<a rel="nofollow" href="http://spam.ex/2">sponsored</a>'
    "<a href='http://b.ex/3' rel='ugc nofollow'>ugc</a>"
    '<a href="http://c.ex/4"></a>'
    '<a name="no-href">not a link</a>'
    '<a href="http://open.ex/5">unclosed'
)


def test_extract_link_tags_hand_case(spark):
    df = spark.createDataFrame([(1, _TAGGED), (2, None)], "i long, html string")
    got = {r["i"]: r["t"] for r in
           df.select("i", extract_link_tags("html").alias("t")).collect()}
    assert got[2] is None
    rows = [(s["href"], s["anchor"], s["nofollow"]) for s in got[1]]
    assert rows == [
        ("http://a.ex/1", "plain bold anchor", False),
        ("http://spam.ex/2", "sponsored", True),
        ("http://b.ex/3", "ugc", True),
        ("http://c.ex/4", "", False),
        # no-href and unclosed <a> both dropped
    ]


def test_extract_link_tags_duckdb_mirror(spark):
    pages = [(1, _TAGGED), (2, None), (3, "<p>none</p>")]
    df = spark.createDataFrame(pages, "i long, html string")
    got = {
        r["i"]: None if r["t"] is None else [tuple(s) for s in r["t"]]
        for r in df.select("i", extract_link_tags("html").alias("t")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE p (i BIGINT, html VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pages)
    want = {
        i: None if t is None else [(s["href"], s["anchor"], s["nofollow"]) for s in t]
        for i, t in con.execute(
            f"SELECT i, {extract_link_tags_sql('html')} FROM p"
        ).fetchall()
    }
    assert got == want


def test_skip_nofollow_edges(spark):
    df = spark.createDataFrame(
        [("http://me.ex/", _TAGGED)], "url string, html string"
    )
    followed = sorted(
        r["dst"] for r in host_link_edges(df, skip_nofollow=True).collect()
    )
    assert followed == ["a.ex", "c.ex"]  # both nofollow forms honored
    all_edges = sorted(r["dst"] for r in host_link_edges(df).collect())
    # the href-only form also sees the unclosed element's link
    assert all_edges == ["a.ex", "b.ex", "c.ex", "open.ex", "spam.ex"]


def test_attribute_name_substrings_not_matched(spark):
    """data-href / ng-href / data-rel must not be read as href/rel
    (the regexes require a delimiter before the attribute name), and
    anchor whitespace collapse uses the explicit Java∩RE2 class so
    \\x0b round-trips identically on both engines."""
    pages = [
        (1, '<a href="/real" data-href="http://tracker.ex/x">t</a>'),
        (2, '<a data-href="http://only.ex/u">no real href</a>'),
        (3, '<a data-rel="x nofollow" href="http://a.ex/1">kept</a>'),
        (4, '<a href="http://a.ex/1">w1\x0bw2</a>'),
    ]
    df = spark.createDataFrame(pages, "i long, html string")
    links = {r["i"]: r["l"] for r in
             df.select("i", extract_links("html").alias("l")).collect()}
    assert links[1] == ["/real"]          # the real href, not the data-href
    assert links[2] == []                  # no quoted real href at all
    tags = {r["i"]: r["t"] for r in
            df.select("i", extract_link_tags("html").alias("t")).collect()}
    assert tags[3][0]["nofollow"] is False  # data-rel is not rel
    con = duckdb.connect()
    con.execute("CREATE TABLE p2 (i BIGINT, html VARCHAR)")
    con.executemany("INSERT INTO p2 VALUES (?, ?)", pages)
    want = {
        i: None if t is None else [(s["href"], s["anchor"], s["nofollow"]) for s in t]
        for i, t in con.execute(
            f"SELECT i, {extract_link_tags_sql('html')} FROM p2"
        ).fetchall()
    }
    got = {r["i"]: [tuple(s) for s in r["t"]] for r in
           df.select("i", extract_link_tags("html").alias("t")).collect()}
    assert got == want
    assert got[4][0][1] == "w1 w2"  # \x0b collapsed identically


# --- hypothesis sweep vs an independent Python reference --------------------

import re as _re

from hypothesis import given, settings
from hypothesis import strategies as st


def _py_extract(html: str) -> list[str]:
    """Independent re-implementation of the documented contract:
    double-quoted hrefs in document order, then single-quoted; href
    must be delimiter-preceded."""
    ws = r"[ \t\n\x0b\f\r]"
    dq = _re.compile(
        rf'(?is)<a{ws}(?:[^>]*{ws})?href{ws}*={ws}*"([^"]*)"'
    )
    sq = _re.compile(
        rf"(?is)<a{ws}(?:[^>]*{ws})?href{ws}*={ws}*'([^']*)'"
    )
    return dq.findall(html) + sq.findall(html)


_frag = st.sampled_from([
    '<a href="http://x.ex/a">t</a>', "<a href='/rel'>r</a>",
    '<a data-href="http://no.ex/">d</a>', '<a href="">e</a>',
    "plain text ", "<p>block</p>", '<a href="#f">f</a>',
    '<a\thref="http://tab.ex/">tab</a>', "<a name=x>anchorless</a>",
    '<a href = "http://sp.ex/">spaced</a>', "<A HREF='HTTP://UP.EX/'>u</A>",
    "&amp; <b>bold</b> ", '<a rel="nofollow" href="http://nf.ex/">n</a>',
])


@settings(max_examples=20, deadline=None)
@given(st.lists(_frag, min_size=0, max_size=8))
def test_extract_links_sweep_vs_python(spark, frags):
    html = "".join(frags)
    df = spark.createDataFrame([(1, html)], "i long, html string")
    got = df.select(extract_links("html").alias("l")).collect()[0]["l"]
    assert got == _py_extract(html), html

"""URL canonicalization: battery pins, cross-engine parity with the
DuckDB SQL mirror, idempotence under a hypothesis URL sweep, and the
URL-keyed dedup summary."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from terra_bonobo_nodes_spark.llm.urls import (
    canonical_url,
    canonical_url_sql,
    url_dedup_groups,
)

# (raw, canonical) — each pins one documented rule
BATTERY = [
    # scheme+host lowercase, path/query case preserved
    ("HTTP://Example.COM/API?q=Foo", "http://example.com/API?q=Foo"),
    # default ports strip per scheme; a non-default port survives
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("https://example.com:80/a", "https://example.com:80/a"),
    # www strips only when a dotted label remains
    ("http://www.example.com/", "http://example.com/"),
    ("http://www.com/", "http://www.com/"),
    # fragment off, even before a '?'
    ("http://a.com/p#frag", "http://a.com/p"),
    ("http://a.com/p#frag?x=1", "http://a.com/p"),
    # path normalization: dup slashes, trailing slash, empty path
    ("http://a.com//x///y/", "http://a.com/x/y"),
    ("http://a.com", "http://a.com/"),
    ("http://a.com/", "http://a.com/"),
    # tracking params out, survivors sorted, '?' drops when emptied
    (
        "http://a.com/p?utm_source=x&b=2&a=1&fbclid=abc",
        "http://a.com/p?a=1&b=2",
    ),
    ("http://a.com/p?utm_campaign=x&gclid=1", "http://a.com/p"),
    # 'ref' is functional on many sites (GitHub ?ref=<branch>) — the
    # default keeps it (ADVICE_r12); stripping is opt-in, see
    # test_canonical_url_ref_strip_is_opt_in
    ("http://a.com/p?ref=hn&real=1", "http://a.com/p?real=1&ref=hn"),
    ("http://a.com/p?ref&z=1", "http://a.com/p?ref&z=1"),
    ("http://a.com/p?reference=1", "http://a.com/p?reference=1"),
    # a second '?' is query content, not a new query
    ("http://a.com/p?a=1?b=2", "http://a.com/p?a=1?b=2"),
    # scheme-less input keeps working as a key
    ("Example.com/A/", "example.com/A"),
    # whitespace trim
    ("  http://a.com/p  ", "http://a.com/p"),
    # empty -> root
    ("", "/"),
]


def test_canonical_url_battery(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(BATTERY)], "i int, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url("url").alias("c")).collect()
    }
    for i, (raw, want) in enumerate(BATTERY):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_canonical_url_ref_strip_is_opt_in(spark):
    """'ref'/'ref_src' strip only under TRACKING_PARAM_WITH_REF_RE —
    the opt-in for corpora where 'ref' is known to be a tracking
    decorator; 'reference' is never 'ref' under either regex."""
    from terra_bonobo_nodes_spark.llm.urls import TRACKING_PARAM_WITH_REF_RE

    cases = [
        ("http://a.com/p?ref=hn&real=1", "http://a.com/p?real=1"),
        ("http://a.com/p?ref&z=1", "http://a.com/p?z=1"),
        ("http://a.com/p?ref_src=twsrc&a=1", "http://a.com/p?a=1"),
        ("http://a.com/p?reference=1", "http://a.com/p?reference=1"),
    ]
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(cases)], "i int, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i",
            canonical_url("url", TRACKING_PARAM_WITH_REF_RE).alias("c"),
        ).collect()
    }
    for i, (raw, want) in enumerate(cases):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_canonical_url_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "url string")
    assert df.select(canonical_url("url").alias("c")).collect()[0]["c"] is None


def test_canonical_url_sql_mirror_matches_spark(spark):
    """The DuckDB mirror produces byte-identical keys on the battery —
    the property a driver oracle row relies on."""
    con = duckdb.connect()
    con.execute("CREATE TABLE urls (i int, url text)")
    con.executemany(
        "INSERT INTO urls VALUES (?, ?)",
        [(i, raw) for i, (raw, _) in enumerate(BATTERY)] + [(len(BATTERY), None)],
    )
    duck = dict(
        con.execute(
            f"SELECT i, {canonical_url_sql('url')} FROM urls"
        ).fetchall()
    )
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(BATTERY)] + [(len(BATTERY), None)],
        "i int, url string",
    )
    sparkside = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url("url").alias("c")).collect()
    }
    assert duck == sparkside


# URL-shaped ASCII generator: hierarchical http(s) URLs with hosts,
# optional ports, paths, queries (tracking params included), fragments
_label = st.text("abcdefwxyz01", min_size=1, max_size=4)
_param = st.one_of(
    st.sampled_from(["utm_source=x", "fbclid=1", "ref", "gclid=z"]),
    st.tuples(_label, _label).map(lambda kv: f"{kv[0]}={kv[1]}"),
)
_urls = st.builds(
    lambda scheme, www, labels, port, segs, params, frag: (
        scheme
        + ("www." if www else "")
        + ".".join(labels)
        + port
        + "".join("/" + s for s in segs)
        + ("?" + "&".join(params) if params else "")
        + ("#" + frag if frag else "")
    ),
    st.sampled_from(["http://", "https://", "HTTP://", ""]),
    st.booleans(),
    st.lists(_label, min_size=1, max_size=3),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.lists(st.text("abcXYZ09._-", min_size=0, max_size=5), max_size=3),
    st.lists(_param, max_size=4),
    st.text("abc", max_size=3),
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_urls, min_size=1, max_size=12, unique=True))
def test_canonical_url_idempotent_and_engine_parity(url_list):
    """canonical(canonical(u)) == canonical(u), and the DuckDB mirror
    agrees with... DuckDB re-run on its own output (idempotence on the
    SQL side too). Driverless: both properties check via DuckDB alone,
    with the Spark-vs-DuckDB equivalence pinned by the battery test
    (one engine-parity session per sweep would dominate runtime)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE u (i int, url text)")
    con.executemany(
        "INSERT INTO u VALUES (?, ?)", list(enumerate(url_list))
    )
    once = con.execute(
        f"SELECT i, {canonical_url_sql('url')} FROM u ORDER BY i"
    ).fetchall()
    con.execute("CREATE TABLE c AS SELECT i, " + canonical_url_sql("url") + " AS url FROM u")
    twice = con.execute(
        f"SELECT i, {canonical_url_sql('url')} FROM c ORDER BY i"
    ).fetchall()
    assert once == twice


def test_url_dedup_groups(spark):
    rows = [
        (1, "http://www.a.com/p?utm_source=x"),
        (2, "http://a.com/p"),
        (3, "https://a.com/p"),  # different scheme -> different key
        (4, "http://a.com/p/"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["url_key"]: (r["keep_doc_id"], r["n_dups"])
        for r in url_dedup_groups(df).collect()
    }
    assert got == {
        "http://a.com/p": (1, 3),
        "https://a.com/p": (3, 1),
    }


# --- host extraction + domain blocklist ----------------------------------

from terra_bonobo_nodes_spark.llm.urls import (  # noqa: E402
    filter_blocked_hosts,
    flag_blocked_hosts,
    host_of,
    host_suffixes,
)


@pytest.mark.parametrize(
    "url,host",
    [
        ("https://WWW.Example.COM/a", "www.example.com"),
        ("http://example.com:8080/a?b=1", "example.com"),
        ("https://user:pw@Example.org/x", "example.org"),
        ("example.com/path", "example.com"),
        ("https://example.com#frag", "example.com"),
        ("localhost", "localhost"),
    ],
)
def test_host_of(spark, url, host):
    df = spark.createDataFrame([(url,)], "url string")
    assert df.select(host_of("url").alias("h")).first()["h"] == host


@pytest.mark.parametrize(
    "host,suffixes",
    [
        ("a.b.c.com", ["a.b.c.com", "b.c.com", "c.com"]),
        ("example.com", ["example.com"]),
        ("localhost", []),
        ("", []),
    ],
)
def test_host_suffixes(spark, host, suffixes):
    df = spark.createDataFrame([(host,)], "h string")
    assert df.select(host_suffixes("h").alias("s")).first()["s"] == suffixes


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "https://spam.example.com/a"),
            (2, "https://example.com/b"),
            (3, "https://good.org/c"),
            (4, "https://notexample.com/d"),  # no label boundary -> clean
            (5, "https://cdn.assets.spam.example.com/e"),
        ],
        "doc_id long, url string",
    )


def _blocklist(spark):
    return spark.createDataFrame([("Example.COM",)], "domain string")


def test_flag_blocked_hosts_suffix_semantics(spark):
    out = flag_blocked_hosts(_docs(spark), _blocklist(spark))
    got = {r["doc_id"]: r["host_blocked"] for r in out.collect()}
    assert got == {1: True, 2: True, 3: False, 4: False, 5: True}


def test_filter_blocked_hosts(spark):
    out = filter_blocked_hosts(_docs(spark), _blocklist(spark))
    assert sorted(r["doc_id"] for r in out.collect()) == [3, 4]
    assert out.columns == ["doc_id", "url"]


def test_blocklist_join_is_broadcast(spark):
    plan = flag_blocked_hosts(_docs(spark), _blocklist(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


# URL-ish alphabet: every structural delimiter the canonicalizer
# dispatches on, multi-char fragments that hit the www/tracking rules,
# and junk. The mirror must match Spark BYTE FOR BYTE on anything.
_url_piece = st.sampled_from(
    list("abXY09:/?#&=.@%-_~ ")
    + ["www.", "http://", "HTTPS://", "utm_source=x", "ref", ":443", ":80", "//"]
)
_url_like = st.lists(_url_piece, min_size=0, max_size=12).map("".join)


@settings(max_examples=25, deadline=None)
@given(st.lists(_url_like, min_size=1, max_size=8))
def test_sql_mirror_matches_spark_on_generated_urls(spark, urls):
    rows = [(i, u) for i, u in enumerate(urls)]
    df = spark.createDataFrame(rows, "i int, url string")
    sparkside = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url("url").alias("c")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE urls (i int, url text)")
    con.executemany("INSERT INTO urls VALUES (?, ?)", rows)
    duck = dict(
        con.execute(f"SELECT i, {canonical_url_sql('url')} FROM urls").fetchall()
    )
    assert sparkside == duck


def test_flag_blocked_hosts_no_broadcast_hint(spark):
    """hint_broadcast=False defers join strategy to AQE — same
    verdicts, no forced broadcast of the blocklist."""
    out = flag_blocked_hosts(_docs(spark), _blocklist(spark), hint_broadcast=False)
    got = {r["doc_id"]: r["host_blocked"] for r in out.collect()}
    assert got == {1: True, 2: True, 3: False, 4: False, 5: True}

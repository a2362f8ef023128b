"""robots.txt compliance (llm/robots.py): RFC 9309 parsing and the
longest-match / allow-tie / default-allow decision, distributed and
against hand-checked spec examples."""

from __future__ import annotations

import re

from terra_bonobo_nodes_spark.llm.robots import (
    flag_robots_disallowed,
    parse_robots,
    path_of,
    robots_rules,
    rule_regex,
)

_ROBOTS = """
# comments strip
User-agent: googlebot
User-agent: curationbot
Disallow: /private/
Allow: /private/ok$

User-agent: *
Disallow: /tmp/*
Disallow:
Crawl-delay: 10
Allow: /tmp/readme
"""


def test_parse_specific_group_shadows_star():
    rules = parse_robots("h.ex", _ROBOTS, agent="curationbot")
    assert [(a, p) for _, a, p, _, _ in rules] == [
        (False, "/private/"),
        (True, "/private/ok$"),
    ]
    star = parse_robots("h.ex", _ROBOTS, agent="otherbot")
    # empty Disallow emits nothing; crawl-delay skipped
    assert [(a, p) for _, a, p, _, _ in star] == [
        (False, "/tmp/*"),
        (True, "/tmp/readme"),
    ]


def test_rule_regex_wildcards_and_anchor():
    assert re.fullmatch(rule_regex("/private/") + ".*", "/private/x/y")
    assert re.match(rule_regex("/tmp/*"), "/tmp/anything/else")
    assert re.match(rule_regex("/private/ok$"), "/private/ok")
    assert not re.match(rule_regex("/private/ok$"), "/private/okay")
    # regex metachars in paths are literal
    assert re.match(rule_regex("/a+b(c)"), "/a+b(c)")
    assert not re.match(rule_regex("/a+b(c)"), "/aab-c-")


def test_decision_longest_match_and_allow_tie(spark):
    robots = spark.createDataFrame(
        [("h.ex", _ROBOTS)], "host string, robots_txt string"
    )
    rules = robots_rules(robots, agent="curationbot")
    docs = spark.createDataFrame(
        [
            (1, "http://h.ex/private/secret"),    # disallowed
            (2, "http://h.ex/private/ok"),        # longer Allow wins
            (3, "http://h.ex/public/page"),       # no rule -> allowed
            (4, "http://other.ex/private/zzz"),   # no rules host -> allowed
            (5, "http://h.ex"),                    # authority-only -> '/'
        ],
        "doc_id long, url string",
    )
    got = {r["doc_id"]: r["robots_allowed"]
           for r in flag_robots_disallowed(docs, rules).collect()}
    assert got == {1: False, 2: True, 3: True, 4: True, 5: True}


def test_allow_wins_equal_length(spark):
    txt = "User-agent: *\nDisallow: /x/\nAllow: /x/a\nDisallow: /x/a"
    rules = robots_rules(
        spark.createDataFrame([("h.ex", txt)], "host string, robots_txt string")
    )
    docs = spark.createDataFrame(
        [(1, "http://h.ex/x/abc")], "doc_id long, url string"
    )
    assert flag_robots_disallowed(docs, rules).collect()[0][
        "robots_allowed"
    ] is True  # /x/a allow and /x/a disallow tie at plen 4 -> allow


def test_distributed_parse_matches_local(spark):
    hosts = [("a.ex", _ROBOTS), ("b.ex", "User-agent: *\nDisallow: /"), ("c.ex", None)]
    df = spark.createDataFrame(hosts, "host string, robots_txt string")
    got = sorted(tuple(r) for r in robots_rules(df, agent="curationbot").collect())
    want = sorted(
        t for h, txt in hosts for t in parse_robots(h, txt or "", "curationbot")
    )
    assert got == want and len(got) >= 3


def test_path_of_shapes(spark):
    df = spark.createDataFrame(
        [(1, "http://h.ex/a/b?q=1#frag"), (2, "h.ex"), (3, None)],
        "i long, url string",
    )
    got = {r["i"]: r["p"] for r in df.select("i", path_of("url").alias("p")).collect()}
    assert got == {1: "/a/b?q=1", 2: "/", 3: None}


def test_bom_and_root_query_and_duplicate_ids(spark):
    """The review-pass pins: a BOM-prefixed robots.txt still parses
    (RFC 9309 §2.3), a host-root-with-query URL matches as '/?q'
    (so 'Disallow: /' catches it), and the matcher is row-preserving
    under duplicate and NULL ids."""
    bom_txt = "﻿User-agent: *\nDisallow: /"
    assert [(a, p) for _, a, p, _, _ in parse_robots("h.ex", bom_txt)] == [
        (False, "/")
    ]
    rules = robots_rules(
        spark.createDataFrame(
            [("h.ex", bom_txt)], "host string, robots_txt string"
        )
    )
    docs = spark.createDataFrame(
        [
            (7, "http://h.ex?q=1"),       # root-with-query: disallowed
            (7, "http://h.ex/x"),          # duplicate id: still one row each
            (None, "http://h.ex/y"),       # NULL id: preserved
            (None, "http://other.ex/z"),   # NULL id, no rules: allowed
            (9, None),                     # NULL url: NULL verdict
        ],
        "doc_id long, url string",
    )
    out = flag_robots_disallowed(docs, rules).collect()
    assert len(out) == 5  # row-preserving
    verdicts = sorted(
        (r["url"], r["robots_allowed"]) for r in out if r["url"] is not None
    )
    assert verdicts == [
        ("http://h.ex/x", False),
        ("http://h.ex/y", False),
        ("http://h.ex?q=1", False),
        ("http://other.ex/z", True),
    ]
    # ADVICE_r13: a NULL URL must surface NULL, not the default allow
    # the fold falls through to — unkeyed rows must not silently pass
    null_verdicts = [
        r["robots_allowed"] for r in out if r["url"] is None
    ]
    assert null_verdicts == [None]

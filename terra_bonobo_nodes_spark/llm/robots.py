"""robots.txt compliance filtering (RFC 9309, public — the Robots
Exclusion Protocol): the third member of the URL-hygiene family
(canonical keys, domain blocklists, and now per-path crawl consent).
A curation pipeline that keeps pages a site's robots.txt disallows is
shipping content the crawler was asked not to take; this filters at
corpus level, after the fact, from the (host, robots.txt) snapshots a
crawl already stores.

Split design (each half verified where it is strongest):

- PARSING (:func:`robots_rules`) is line-stateful (a rule belongs to
  the preceding ``User-agent`` group, adjacent UA lines share one
  group) — an Arrow-batched ``mapInPandas`` over the per-host robots
  text (robots.txt is KiB-sized by convention; one row in, a handful
  of rule rows out), pinned by pytest against the RFC's own examples.
- MATCHING (:func:`flag_robots_disallowed`) is where the data is: an
  equi-join of documents to their host's rules, regex prefix match,
  and the RFC's decision — LONGEST pattern wins, allow wins a
  length tie, no matching rule means allowed. Pure Column + one
  window; fully SQL-replayable (the rule regexes are deterministic
  strings both engines compile identically — see :func:`rule_regex`).

Semantics implemented (and the documented simplifications):
``User-agent`` matching is case-insensitive exact-token or ``*`` (RFC
product-token substring matching is not attempted); all groups whose
agent matches combine (RFC 9309 §2.2.1); ``Allow``/``Disallow`` are
the only rule fields consumed (``Crawl-delay``/``Sitemap`` ignored);
an empty ``Disallow:`` value is the RFC's allow-everything idiom (no
rule emitted); ``#`` comments strip; patterns support the RFC's ``*``
wildcard and ``$`` end anchor. Matching is against the URL's path +
optional ``?query`` (the RFC's URI path-and-query), percent-encoding
left as-is (the canonical_url out-of-scope precedent).

100 TB shape: rules are host-grain and curator-to-web sized — the
join broadcasts under AQE; the per-document window partitions on the
document key (bounded frame, one doc's matched rules). No Python in
the matching path; the regex compile per (doc, rule) pair is JVM-side
``rlike``.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from terra_bonobo_nodes_spark.llm.urls import host_of

_RULES_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("allow", T.BooleanType()),
        T.StructField("pattern", T.StringType()),
        T.StructField("regex", T.StringType()),
        T.StructField("plen", T.IntegerType()),
    ]
)


def rule_regex(pattern: str) -> str:
    """The anchored regex a robots path pattern compiles to — ``*``
    matches any run, a trailing ``$`` anchors the end, every other
    character is literal. Stays in the Java∩RE2 shared subset so both
    engines compile the same string to the same automaton."""
    anchored_end = pattern.endswith("$")
    body = pattern[:-1] if anchored_end else pattern
    out = []
    for part in body.split("*"):
        out.append(re.escape(part))
    rx = "^" + ".*".join(out)
    return rx + "$" if anchored_end else rx


def parse_robots(host: str, text: str, agent: str = "*") -> list[tuple]:
    """Pure-Python single-host parse — the unit the distributed form
    batches; returns (host, allow, pattern, regex, plen) tuples for
    the groups governing ``agent`` (exact case-insensitive token or
    the ``*`` fallback; specific groups SHADOW the ``*`` groups per
    RFC 9309 §2.2.1's most-specific-match)."""
    agent = agent.lower()
    groups: list[tuple[set[str], list[tuple[bool, str]]]] = []
    cur_agents: set[str] | None = None
    in_ua_run = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field, value = field.strip().lower(), value.strip()
        if field == "user-agent":
            if not in_ua_run:
                cur_agents = set()
                groups.append((cur_agents, []))
                in_ua_run = True
            cur_agents.add(value.lower())
        elif field in ("allow", "disallow"):
            in_ua_run = False
            if cur_agents is None:
                continue  # rules before any user-agent line: ignored
            if value == "" and field == "disallow":
                continue  # the RFC's allow-everything idiom
            if value == "" and field == "allow":
                continue  # vacuous
            groups[-1][1].append((field == "allow", value))
        else:
            in_ua_run = False  # crawl-delay/sitemap/unknown: skipped
    specific = [rs for agents, rs in groups if agent in agents]
    chosen = (
        [r for rs in specific for r in rs]
        if specific
        else [r for agents, rs in groups if "*" in agents for r in rs]
    )
    return [
        (host, allow, pat, rule_regex(pat), len(pat))
        for allow, pat in chosen
    ]


def robots_rules(
    df: DataFrame,
    host_col: str = "host",
    robots_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """(host, allow, pattern, regex, plen) — the rule rows governing
    ``agent``, one frame for every host snapshot in ``df``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for host, text in zip(pdf[host_col], pdf[robots_col]):
                if host is None:
                    continue
                rows.extend(parse_robots(host, text or "", agent))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _RULES_SCHEMA]
            )

    return df.select(host_col, robots_col).mapInPandas(run, _RULES_SCHEMA)


def path_of(url) -> F.Column:
    """Path + optional ``?query`` of a URL (the RFC's match target):
    everything from the first ``/`` after the authority; fragment off;
    an authority-only URL matches as ``/``."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    u = F.get(F.split(u, "#", 2), 0)
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    tail = F.regexp_replace(rest, r"^[^/?]*", "")
    return F.when(u.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(tail == "", F.lit("/")).otherwise(tail)
    )


def flag_robots_disallowed(
    docs: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    out_col: str = "robots_allowed",
) -> DataFrame:
    """Append ``out_col``: the RFC 9309 verdict for each document's
    URL under its host's rules — longest matching pattern wins, allow
    wins a length tie, hosts/paths with no matching rule are allowed.
    One equi-join on host (rules broadcast under AQE) + one bounded
    window per document."""
    d = docs.withColumns(
        {"_h": host_of(F.col(url_col)), "_p": path_of(F.col(url_col))}
    )
    joined = d.join(rules.withColumnRenamed("host", "_h"), "_h", "left")
    matched = joined.withColumn(
        "_hit",
        F.col("regex").isNotNull() & F.expr("_p rlike regex"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_hit").desc(), F.col("plen").desc(), F.col("allow").desc()
    )
    best = (
        matched.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .withColumn(
            out_col,
            F.when(F.col("_hit"), F.col("allow")).otherwise(F.lit(True)),
        )
    )
    return best.select(*docs.columns, out_col)

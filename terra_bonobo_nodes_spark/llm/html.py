"""HTML -> text extraction: step 0 of the crawl-curation chain.

Web crawls arrive as HTML; every downstream operator in ``llm/``
(c4_line_filter, gopher_rules, line_dedup, dedup) consumes TEXT. This
module is the WET-grade extraction between the two — deliberately the
Common-Crawl-WET class of fidelity (strip markup, keep block
structure as newlines), NOT a browser: good enough that C4/Gopher
statistics mean what they meant in the papers, cheap enough to run at
scan speed on 100 TB.

Pipeline (ordered, each a Column ``regexp_replace`` / ``replace`` —
zero Python, zero shuffles, whole-stage codegen):

1. comments ``<!-- ... -->`` removed (non-greedy, dotall);
2. ``script`` / ``style`` / ``noscript`` / ``template`` elements
   removed WITH their content (case-insensitive, non-greedy to the
   matching close tag);
3. block-structure boundaries become newlines BEFORE tags are
   stripped (``<br>``, ``<hr>``, and BOTH openers and closers of
   p/div/li/ul/ol/h1-6/tr/td/th/caption/table/section/article/
   header/footer/blockquote/pre/dd/dt — cells included, so adjacent
   table cells never concatenate into one word), so visual lines survive as text lines —
   the structure c4_line_filter and line_dedup key on;
4. every remaining tag stripped;
5. the common named entities decoded as literal replaces, ``&amp;``
   LAST — single-pass order gives correct HTML semantics
   (``&amp;lt;`` decodes to the literal text ``&lt;``, not ``<``);
6. whitespace normalized: intra-line runs collapse to one space,
   spaces trimmed around newlines, newline runs collapse to ONE
   newline (paragraph = line; the line-grain consumers drop empties
   anyway), ends trimmed.

Documented limits (the WET-grade line): an UNCLOSED ``<script>``
leaks its tail as text (the close tag is the only unambiguous
boundary); numeric character references (``&#8217;``) pass through
undecoded (per-match arithmetic needs a callback neither engine's
``regexp_replace`` has — the mojibake repair table in scrub.py covers
the common punctuation these encode); CDATA sections in foreign
content are treated as text. NULL in -> NULL out.

Cross-engine: every pattern stays in the shared Java/RE2 subset
(inline ``(?is)`` flags, non-greedy ``.*?``, no backrefs), and
:func:`html_to_text_sql` is the DuckDB mirror — parity pinned by a
case battery + hypothesis sweep in tests/test_html.py, so a future
driver row is a registration edit (the canonical_url precedent).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_REMOVED_ELEMENTS = ("script", "style", "noscript", "template")
_BLOCK_ELEMENTS = (
    "p|div|li|ul|ol|h[1-6]|tr|td|th|caption|table|section|article"
    "|header|footer|blockquote|pre|dd|dt"
)

# (pattern, replacement) applied in order; all patterns replace
# globally on both engines.
_STEPS: tuple[tuple[str, str], ...] = (
    (r"(?s)<!--.*?-->", ""),
    *(
        (rf"(?is)<{el}\b[^>]*>.*?</{el}\s*>", "")
        for el in _REMOVED_ELEMENTS
    ),
    (
        rf"(?is)<(?:br|hr)\s*/?>|</?(?:{_BLOCK_ELEMENTS})(?:\s[^>]*)?\s*/?>",
        "\n",
    ),
    (r"(?s)<[^>]*>", ""),
)

# literal entity decodes, &amp; LAST (module docstring, step 5)
_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&apos;", "'"),
    ("&#39;", "'"),
    ("&amp;", "&"),
)

_WS_STEPS: tuple[tuple[str, str], ...] = (
    (r"[ \t\x0b\f\r]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{2,}", "\n"),
)


def html_to_text(html: Column | str) -> Column:
    """Extract WET-grade text from an HTML column (see module
    docstring for the exact pipeline and its documented limits)."""
    c = F.col(html) if isinstance(html, str) else html
    out = c
    for pat, repl in _STEPS:
        out = F.regexp_replace(out, pat, repl)
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    for pat, repl in _WS_STEPS:
        out = F.regexp_replace(out, pat, repl)
    # trim spaces AND newlines off both ends (F.trim is space-only)
    return F.btrim(out, F.lit(" \n"))


def html_to_text_sql(expr: str) -> str:
    """DuckDB SQL mirror of :func:`html_to_text` (oracle pairing).
    DuckDB string literals are standard-SQL (backslash is literal), so
    regex patterns embed verbatim apart from quote doubling."""
    out = expr
    for pat, repl in _STEPS:
        p = pat.replace("'", "''")
        r = repl.replace("\n", "' || chr(10) || '")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    for ent, ch in _ENTITIES:
        ch_sql = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{ch_sql}')"
    for pat, repl in _WS_STEPS:
        r = repl.replace("\n", "' || chr(10) || '")
        out = f"regexp_replace({out}, '{pat}', '{r}', 'g')"
    return f"trim({out}, ' ' || chr(10))"


# --- link extraction ---------------------------------------------------------
# The edge between page-grain curation and the host-graph operators
# (llm/graph.py): real pipelines derive the link graph FROM the crawl,
# not from a side table. Quoted hrefs only (double or single) — an
# unquoted href is invalid-but-tolerated HTML whose end is ambiguous
# without a parser; documented limit, same WET-grade line as above.
# Both patterns stay in the shared Java/RE2 subset.

# _WS = the EXPLICIT whitespace class shared bit-identically by Java
# and RE2 — Java's \s includes \x0b where RE2's does not, so \s is
# NOT in the shared subset and never appears in these patterns.
# href/rel must be preceded by a delimiter (whitespace or a closing
# quote), NOT matched as an attribute-name substring: without it,
# data-href/ng-href/data-rel values would be captured as the real
# attribute (and greedy backtracking would even PREFER a later
# data-href over the real href).
_WS = r"[ \t\n\x0b\f\r]"
_HREF_DQ = (
    rf"""(?is)<a{_WS}(?:[^>]*{_WS})?href{_WS}*={_WS}*"([^"]*)\""""
)
_HREF_SQ = rf"(?is)<a{_WS}(?:[^>]*{_WS})?href{_WS}*={_WS}*'([^']*)'"


def extract_links(html: Column | str) -> Column:
    """Array of raw href values of every ``<a>`` in document order
    within each quoting style (double-quoted first, then
    single-quoted; graph consumers aggregate per edge, so relative
    order across styles is immaterial — stated so the SQL mirror can
    replay the concatenation exactly). NULL in -> NULL out; a page
    with no links yields an empty array."""
    c = F.col(html) if isinstance(html, str) else html
    return F.when(
        c.isNull(), F.lit(None).cast("array<string>")
    ).otherwise(
        F.concat(
            F.regexp_extract_all(c, F.lit(_HREF_DQ), F.lit(1)),
            F.regexp_extract_all(c, F.lit(_HREF_SQ), F.lit(1)),
        )
    )


def extract_links_sql(expr: str) -> str:
    """DuckDB mirror of :func:`extract_links`."""
    dq = _HREF_DQ.replace("'", "''")
    sq = _HREF_SQ.replace("'", "''")
    return (
        f"CASE WHEN {expr} IS NULL THEN NULL ELSE "
        f"list_concat(regexp_extract_all({expr}, '{dq}', 1), "
        f"regexp_extract_all({expr}, '{sq}', 1)) END"
    )


# Whole <a> elements (open tag + inner + close): the tag-aware form
# that also yields rel=nofollow and the anchor text. Unclosed <a>
# elements are dropped (the close tag is the only unambiguous end —
# the html_to_text unclosed-script rationale); nested <a> is invalid
# HTML and the non-greedy match ends at the FIRST close.
_A_ELEM = rf"(?is)(<a{_WS}[^>]*>.*?</a{_WS}*>)"
_A_OPEN = rf"(?is)^<a{_WS}[^>]*>"
_NOFOLLOW = (
    rf"""(?is)^<a{_WS}(?:[^>]*[{_WS[1:-1]}"'])?rel{_WS}*={_WS}*"""
    rf"""["'][^"']*\bnofollow"""
)


def extract_link_tags(html: Column | str) -> Column:
    """``array<struct<href,anchor,nofollow>>`` — one entry per closed
    ``<a>`` element with a QUOTED href, in document order. ``anchor``
    is the inner content with tags stripped and whitespace collapsed
    (the classic relevance signal an anchor-text index aggregates per
    target); ``nofollow`` is the ``rel`` flag link-graph builders
    honor. Entries without a quoted href are dropped (same WET-grade
    line as :func:`extract_links`). NULL in -> NULL out."""
    c = F.col(html) if isinstance(html, str) else html

    def entry(e: Column) -> Column:
        opener = F.regexp_extract(e, _A_OPEN, 0)
        dq = F.regexp_extract(opener, _HREF_DQ, 1)
        has_dq = opener.rlike(_HREF_DQ)
        sq = F.regexp_extract(opener, _HREF_SQ, 1)
        has_sq = opener.rlike(_HREF_SQ)
        href = F.when(has_dq, dq).when(has_sq, sq)
        inner = F.regexp_replace(
            e, rf"(?is)^<a{_WS}[^>]*>|</a{_WS}*>$", ""
        )
        anchor = F.trim(
            F.regexp_replace(
                F.regexp_replace(inner, r"(?s)<[^>]*>", " "), _WS + "+", " "
            )
        )
        return F.struct(
            href.alias("href"),
            anchor.alias("anchor"),
            e.rlike(_NOFOLLOW).alias("nofollow"),
        )

    elems = F.regexp_extract_all(c, F.lit(_A_ELEM), F.lit(1))
    return F.when(c.isNull(), F.lit(None)).otherwise(
        F.filter(
            F.transform(elems, entry), lambda s: s.getField("href").isNotNull()
        )
    )


def extract_link_tags_sql(expr: str) -> str:
    """DuckDB mirror of :func:`extract_link_tags`."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    elem, opener = q(_A_ELEM), q(_A_OPEN)
    dq, sq, nf = q(_HREF_DQ), q(_HREF_SQ), q(_NOFOLLOW)
    e = "e"
    op = f"regexp_extract({e}, '{opener}', 0)"
    href = (
        f"CASE WHEN regexp_matches({op}, '{dq}') "
        f"THEN regexp_extract({op}, '{dq}', 1) "
        f"WHEN regexp_matches({op}, '{sq}') "
        f"THEN regexp_extract({op}, '{sq}', 1) END"
    )
    ws = q(_WS)
    inner = (
        f"regexp_replace({e}, '(?is)^<a{ws}[^>]*>|</a{ws}*>$', '', 'g')"
    )
    anchor = (
        f"trim(regexp_replace(regexp_replace({inner}, '(?s)<[^>]*>', ' ', "
        f"'g'), '{ws}+', ' ', 'g'))"
    )
    return (
        f"CASE WHEN {expr} IS NULL THEN NULL ELSE "
        f"list_filter(list_transform(regexp_extract_all({expr}, '{elem}', 1), "
        f"e -> struct_pack(href := {href}, anchor := {anchor}, "
        f"nofollow := regexp_matches(e, '{nf}'))), "
        f"s -> s.href IS NOT NULL) END"
    )

"""sources/formats.py: ORC + XML ingest."""

from __future__ import annotations

from pyspark.sql import functions as F

from terra_bonobo_nodes_spark.sources.formats import (
    read_orc,
    read_xml,
    xml_documents_to_rows,
)


def test_orc_roundtrip_preserves_types(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.25)], "id BIGINT, name STRING, v DOUBLE"
    )
    path = str(tmp_path / "t.orc")
    src.write.mode("overwrite").orc(path)
    back = read_orc(spark, path)
    assert dict(back.dtypes) == {"id": "bigint", "name": "string", "v": "double"}
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_orc_scan_pushes_filters(spark, tmp_path):
    src = spark.createDataFrame([(i, f"n{i}") for i in range(100)], "id BIGINT, name STRING")
    path = str(tmp_path / "p.orc")
    src.write.mode("overwrite").orc(path)
    df = read_orc(spark, path).where(F.col("id") > 90).select("name")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,90)]" in plan
    assert df.count() == 9


def test_xml_path_reader_with_schema(spark, tmp_path):
    p = tmp_path / "d.xml"
    p.write_text(
        "<rows><row><id>1</id><name>a</name></row>"
        "<row><id>2</id><name>b</name></row></rows>"
    )
    df = read_xml(spark, str(p), "row", "id BIGINT, name STRING")
    assert sorted(map(tuple, df.collect())) == [(1, "a"), (2, "b")]


def _docs(spark, contents):
    return spark.createDataFrame([(i, c) for i, c in enumerate(contents)],
                                 "doc INT, content STRING")


def test_xml_documents_to_rows_multirecord(spark):
    docs = _docs(spark, [
        "<r><id>1</id><name>x &amp; y</name></r><r><id>2</id><name>b</name></r>",
        "<export>\n  <r>\n    <id>3</id>\n    <name>multi\nline</name>\n  </r>\n</export>",
        "",                       # empty document: zero rows
        "<r><id>4</id></r>",      # missing field -> NULL
    ])
    out = xml_documents_to_rows(
        docs, "content", "r", "id BIGINT, name STRING", keep_cols=["doc"]
    )
    got = sorted(map(tuple, out.collect()))
    assert got == [
        (0, 1, "x & y"),          # entity decoded by from_xml
        (0, 2, "b"),
        (1, 3, "multi\nline"),    # (?s): records span lines
        (3, 4, None),
    ]
    assert out.columns == ["doc", "id", "name"]


def test_xml_documents_to_rows_empty_corpus_keeps_schema(spark):
    docs = _docs(spark, ["", "no xml here"])
    out = xml_documents_to_rows(docs, "content", "r", "id BIGINT, name STRING")
    assert out.columns == ["id", "name"]
    assert out.count() == 0


def test_xml_documents_to_rows_attributes_and_selfclosing(spark):
    docs = _docs(spark, ['<r id="9"><name>a</name></r><r id="10"/>'])
    out = xml_documents_to_rows(
        docs, "content", "r", "_id BIGINT, name STRING"
    )
    got = sorted(map(tuple, out.collect()))
    assert got == [(9, "a"), (10, None)]  # attributes arrive as _-prefixed


def test_xml_documents_to_rows_rejects_regex_metacharacter_tags(spark):
    import pytest as _pytest

    docs = _docs(spark, ["<r><id>1</id></r>"])
    with _pytest.raises(ValueError, match="element name"):
        xml_documents_to_rows(docs, "content", "r.*", "id BIGINT")


def test_xml_documents_to_rows_ignores_commented_out_records(spark):
    """The VERDICT_r09 finding: a record hiding inside an XML comment is
    not a record — it must contribute zero rows, not resurrect."""
    docs = _docs(spark, [
        '<doc><!-- <r><id>1</id></r> --><r><id>2</id></r></doc>',
        '<doc><!-- <r id="7"/> --></doc>',       # ONLY a commented record
        '<doc><!--\n multi-line <r><id>8</id></r>\n --><r><id>9</id></r></doc>',
    ])
    out = xml_documents_to_rows(docs, "content", "r", "id BIGINT, _id BIGINT")
    got = sorted(r["id"] or r["_id"] for r in out.collect())
    assert got == [2, 9]


def test_xml_documents_to_rows_ignores_records_quoted_in_cdata(spark):
    """Record-shaped text inside a CDATA section is character data, not
    markup — zero rows. A CDATA section that itself contains '<!--' is
    still one CDATA section (leftmost marker wins)."""
    docs = _docs(spark, [
        '<doc><![CDATA[ <r><id>1</id></r> ]]><r><id>2</id></r></doc>',
        '<doc><![CDATA[ <!-- ]]><r><id>3</id></r><![CDATA[ --> ]]></doc>',
    ])
    out = xml_documents_to_rows(docs, "content", "r", "id BIGINT")
    assert sorted(r["id"] for r in out.collect()) == [2, 3]


def test_xml_documents_to_rows_cdata_content_survives(spark):
    """The round-11 headline (pinned round 12 per ADVICE_r11): CDATA is
    an ESCAPING mechanism — legitimate field values wrapped in it must
    survive unwrap-and-escape and come back verbatim through from_xml's
    entity decoding, not be silently emptied (the round-10 regression
    wholesale-stripped them)."""
    docs = _docs(spark, [
        "<r><id>1</id><name><![CDATA[a<b & c>d]]></name></r>",
        # multiple sections in one value, markup-shaped content
        "<r><id>2</id><name><![CDATA[a]]> and <![CDATA[<b>]]></name></r>",
        # pre-escaped entity text inside CDATA stays LITERAL (escape
        # order: '&' first, or '&amp;' would double-decode)
        "<r><id>3</id><name><![CDATA[x &amp; y]]></name></r>",
        "<r><id>4</id><name><![CDATA[]]></name></r>",  # empty section
    ])
    out = xml_documents_to_rows(docs, "content", "r", "id BIGINT, name STRING")
    got = {r["id"]: r["name"] for r in out.collect()}
    assert got[1] == "a<b & c>d"
    assert got[2] == "a and <b>"
    assert got[3] == "x &amp; y"
    assert 4 in got  # empty CDATA: record survives, value empty/NULL


def test_xml_documents_to_rows_literal_open_marker_inside_cdata(spark):
    """ADVICE_r11 medium: a literal '<![CDATA[' INSIDE a section is
    character data (CDATA never nests — only ']]>' is forbidden), so it
    must NOT desync the lexer: the real record after the section
    survives, and the section's content never produces phantoms."""
    docs = _docs(spark, [
        "<doc><![CDATA[a <![CDATA[ b]]><r><id>3</id></r></doc>",
        # record-shaped text after an inner open marker stays quoted
        "<doc><![CDATA[x <![CDATA[ <r><id>7</id></r>]]><r><id>4</id></r></doc>",
    ])
    out = xml_documents_to_rows(docs, "content", "r", "id BIGINT")
    assert sorted(r["id"] for r in out.collect()) == [3, 4]


def test_xml_documents_to_rows_unterminated_cdata_yields_no_phantoms(spark):
    """Malformed input: an unterminated '<![CDATA[' treats the remainder
    as inside-CDATA (escaped) — zero records, never phantoms."""
    docs = _docs(spark, [
        "<doc><![CDATA[ <r><id>1</id></r>",
        "<doc><r><id>5</id></r><![CDATA[ <r><id>6</id></r></doc>",
    ])
    out = xml_documents_to_rows(docs, "content", "r", "id BIGINT")
    assert sorted(r["id"] for r in out.collect()) == [5]


def test_xml_documents_to_rows_dotted_tag_matches_literally(spark):
    """'.' is a legal XML name char: row_tag 'a.b' must not regex-match
    '<aXb>' fragments (the ADVICE_r09 re.escape fix)."""
    docs = _docs(spark, ['<aXb><id>1</id></aXb><a.b><id>2</id></a.b>'])
    out = xml_documents_to_rows(docs, "content", "a.b", "id BIGINT")
    assert [r["id"] for r in out.collect()] == [2]


# --- property sweep: the lexer against an independent Python reference -------


def _ref_xml_rows(doc: str) -> list[tuple]:
    """Independent Python model of xml_documents_to_rows' lexical layer
    (comment strip CDATA-aware leftmost-first; close-marker split with
    first-open unwrap-and-escape; fragment regex; entity decode) — the
    hypothesis oracle for the Spark expression pipeline."""
    import re

    no_comments = re.sub(
        r"(?s)(<!\[CDATA\[.*?\]\]>)|<!--.*?-->",
        lambda m: m.group(1) or "",
        doc,
    )
    parts = []
    for seg in no_comments.split("]]>"):
        i = seg.find("<![CDATA[")
        if i < 0:
            parts.append(seg)
        else:
            content = (
                seg[i + 9:]
                .replace("&", "&amp;")
                .replace("<", "&lt;")
                .replace(">", "&gt;")
            )
            parts.append(seg[:i] + content)
    clean = "".join(parts)
    rows = []
    for frag in re.findall(r"(?s)<r(?:\s[^>]*)?>.*?</r>|<r(?:\s[^>]*)?/>", clean):
        mid = re.search(r"<id>(\d+)</id>", frag)
        mname = re.search(r"(?s)<name>(.*?)</name>", frag)
        name = mname.group(1) if mname else None
        if name is not None:
            # entity decode (&amp; LAST — reverse of escape order), then
            # surrounding-whitespace trim (from_xml's
            # ignoreSurroundingSpaces default)
            name = (
                name.replace("&lt;", "<").replace("&gt;", ">")
                .replace("&amp;", "&")
            ).strip()
        rows.append((int(mid.group(1)) if mid else None, name))
    return rows


def test_lexer_matches_python_reference_on_random_documents(spark):
    """Random piece soups (records, CDATA/comment markers, markup-shaped
    filler) must lex identically in the Spark expression pipeline and
    the pure-Python reference — the sweep example-based tests can't
    cover. Records are atomic pieces (the operator's documented
    no-nested-row-tag contract), so escape boundaries always align with
    piece boundaries and the two implementations are comparable on any
    generated input, including unterminated markers and stray closers."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    fillers = [
        "plain text", "a < b", "x & y", "-->", "<!--", "<![CDATA[",
        "]]>", " <x>not a record</x> ", "junk ]] > almost",
    ]

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.one_of(
                st.sampled_from(fillers),
                st.tuples(st.sampled_from(["rec"]), st.text(
                    alphabet="abc xyz", min_size=0, max_size=8
                )),
            ),
            min_size=0,
            max_size=10,
        )
    )
    def check(pieces):
        doc, n = [], 0
        for p in pieces:
            if isinstance(p, tuple):
                doc.append(f"<r><id>{n}</id><name>{p[1]}</name></r>")
                n += 1
            else:
                doc.append(p)
        content = "".join(doc)
        docs = spark.createDataFrame([(content,)], "content STRING")
        got = sorted(
            (r["id"], r["name"])
            for r in xml_documents_to_rows(
                docs, "content", "r", "id BIGINT, name STRING"
            ).collect()
        )
        want = sorted(_ref_xml_rows(content))
        assert got == want, f"doc={content!r}"

    check()

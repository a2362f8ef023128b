"""Cross-engine pin of the COMPOSED curation front-end: synthesized
HTML documents run through html_to_text -> c4_line_filter ->
gopher_rules in Spark, and through the composed DuckDB mirrors
(html_to_text_sql feeding the registered rows' C4/GOPHER oracle SQL)
— the full front half verified as ONE chain, not stage by stage, under
the driver's exact compare contract. This is the pipeline-grade
correctness artifact for the step-0 extraction without spending a
registry slot (the mirrors are authored; an r15 driver row is a
registration edit)."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from terra_bonobo_nodes_spark.llm.html import html_to_text, html_to_text_sql
from terra_bonobo_nodes_spark.llm.scrub import c4_line_filter
from terra_bonobo_nodes_spark.llm.text import gopher_rules
from terra_bonobo_nodes_spark.plans.queries_candidates import (
    C4_ORACLE,
    GOPHER_ORACLE,
)
from tests.check_driver import _hash
from tests.conftest import SF_DIR


def _synth_html(spark):
    """documents(sf0.001) wrapped in markup: paragraphs, chrome,
    entities, comments — the shapes html_to_text exists for."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text")
    )
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><!-- crawl --><head><style>p{}</style></head><body>"),
            F.lit("<div class='nav'><script>menu()</script></div><p>"),
            F.col("text"),
            F.lit("</p><p>Footer &amp; contact</p></body></html>"),
        ).alias("html"),
    )


def _synth_sql(sf: str) -> str:
    return (
        "SELECT doc_id, "
        "'<html><!-- crawl --><head><style>p{}</style></head><body>"
        "<div class=''nav''><script>menu()</script></div><p>' || "
        "coalesce(text, '') || "
        "'</p><p>Footer &amp; contact</p></body></html>' AS html "
        f"FROM read_parquet('{sf}/documents.parquet')"
    )


def test_front_end_chain_matches_composed_oracles(spark):
    # Spark: the operator chain exactly as the README quickstart runs
    # it — both rule batteries over the EXTRACTED text (the testdata
    # word-soup has no terminal punctuation, so c4 keeping zero lines
    # is itself part of the expected verdict; gopher reads the full
    # extracted page so its statistics are meaningful)
    extracted = _synth_html(spark).select(
        "doc_id", html_to_text("html").alias("text")
    )
    out = gopher_rules(c4_line_filter(extracted))
    sdf = out.select(
        "doc_id", "c4_text", "c4_n_lines", "c4_keep",
        "g_n_words", "g_flag_stopwords", "g_keep",
    )
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]

    # DuckDB: the extraction mirror feeds the SAME oracle SQL the
    # driver rows use, re-based onto the extracted relation — BOTH
    # batteries read the extracted text (matching the Spark chain
    # above: gopher_rules' default text_col="text"), so the mirrors
    # and the operators compose identically; string surgery on the
    # registered oracles keeps the forms from drifting.
    con = duckdb.connect()
    synth = _synth_sql(SF_DIR)
    extract_sql = (
        f"SELECT doc_id, {html_to_text_sql('html')} AS text FROM ({synth})"
    )
    c4 = C4_ORACLE.replace(
        "SELECT doc_id, coalesce(text, '') AS text FROM documents",
        f"SELECT doc_id, coalesce(text, '') AS text FROM ({extract_sql})",
    )
    gopher = GOPHER_ORACLE.replace(
        "SELECT doc_id, coalesce(text, '') AS text FROM documents",
        f"SELECT doc_id, coalesce(text, '') AS text FROM ({extract_sql})",
    )
    res = con.execute(
        f"""
WITH c4r AS ({c4}),
g AS ({gopher})
SELECT g.doc_id, c4r.c4_text, c4r.c4_n_lines, c4r.c4_keep,
       g.g_n_words, g.g_flag_stopwords, g.g_keep
FROM g JOIN c4r ON c4r.doc_id = g.doc_id
"""
    )
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _hash(scols, srows) == _hash(ocols, orows)
    # and the chain did real work: gopher counted the EXTRACTED words
    # (markup gone — the testdata word-soup has no terminal
    # punctuation, so C4 keeping zero lines is the correct verdict for
    # every page, and gopher read the full extracted text), while feeding
    # the raw markup through the rules directly trips the markup flags
    raw = c4_line_filter(_synth_html(spark), text_col="html")
    ext_words = _synth_html(spark).select(
        html_to_text("html").alias("t")
    )
    n_nonempty = ext_words.where(F.length("t") > 20).count()
    assert n_nonempty == len(srows)  # extraction recovered every page
    assert raw.where("c4_flag_curly_brace").count() > 0  # markup trips flags

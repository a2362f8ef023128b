"""Reference-trained word-bigram language model scoring — the CCNet
quality signal in its production shape (Wenzek et al. 2020 §3.3,
public): a language model is trained on a TRUSTED reference corpus
(CCNet uses Wikipedia) and every crawl document is scored by its
cross-entropy under that model; fluent, reference-like text scores
low, gibberish and boilerplate-stuffed text scores high. This is the
train-on-target / score-on-corpus complement to
:func:`llm.text.char_lm_entropy`, which trains on the scored corpus
itself at character grain.

Model: word-bigram with additive (add-one) smoothing over the
reference vocabulary, P(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V) where
c(w1 w2) is the reference bigram count, c(w1 ·) the reference count of
w1 as a non-final token, and V = (number of distinct reference tokens)
+ 1 — the +1 reserving one type's worth of mass for unseen words.
Out-of-vocabulary words are NOT merged into a single <unk> token (each
unseen type smooths independently); the only place the distinction
matters is a bigram whose FIRST token is OOV, which here scores the
uniform floor 1/V instead of sharing a learned unk context — the
standard open-vocabulary additive formulation, stated so the oracle
can replay it exactly.

Determinism (the :func:`llm.text.char_lm_entropy` contract): every
count is an exact BIGINT, the probability is one IEEE division of two
exact integers (bit-identical on both engines), and each log is
quantized to DECIMAL(20,6) BEFORE the exact per-document sum — so
reduction order cannot move the result and a 1-ulp ``ln`` difference
between engines is absorbed by the quantum.

Plan shape (100 TB): the reference side collapses to (bigram, count) /
(context, count) / a 1-row vocabulary scalar — wordcount-shaped
combinable aggregates. The corpus explodes to one row per bigram
position ONCE, collapses per (doc, bigram) with map-side combine, then
LEFT-joins the two model relations on their keys (AQE broadcasts them
when the reference is curator-sized; an equi-join shuffle otherwise —
never a cross join except the documented 1-row vocabulary scalar).
Nothing self-joins; no Python in any path.

No counterpart in the reference repo (terra-bonobo-nodes has no LM
operators); this module belongs to the LLM-curation extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from terra_bonobo_nodes_spark.llm.hashing import normalize, normalize_sql


def _tokens(text: Column) -> Column:
    """Non-empty normalized tokens — THE tokenization of this module;
    model training and corpus scoring must share it exactly."""
    return F.filter(F.split(normalize(text), " "), lambda w: F.length(w) > 0)


def _bigrams_of(toked: DataFrame, *keep_cols: str) -> DataFrame:
    """Explode a ``_toks``-carrying frame to one row per word-bigram
    position, b = 'w1 w2' (tokens are space-free after normalize(), so
    the space join is unambiguous); documents with fewer than two
    tokens emit nothing. Shared by the reference and corpus sides so
    the pairing logic exists exactly once."""
    n = F.size("_toks")
    return toked.where(n >= 2).select(
        *keep_cols,
        F.explode(
            F.zip_with(
                F.slice("_toks", 1, n - 1),
                F.slice("_toks", 2, n - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("_b"),
    )


def _bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, b) rows — tokenize then pair (see :func:`_bigrams_of`)."""
    toked = df.select(
        F.col(id_col), _tokens(F.col(text_col)).alias("_toks")
    )
    return _bigrams_of(toked, id_col)


def word_lm_xent(
    df: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str | None = None,
    out_col: str = "lm_xent",
    m_col: str = "n_bigrams",
) -> DataFrame:
    """Per-document cross-entropy of ``df[text_col]`` under the
    add-one-smoothed word-bigram LM trained on
    ``reference[ref_text_col or text_col]``. Returns one row per input
    document: (``id_col``, ``m_col`` = bigram count, ``out_col``);
    documents with fewer than two tokens get (0, 0.0) — they carry no
    bigram evidence and callers bucket them separately (the
    ``perplexity_buckets`` 'empty' convention)."""
    rcol = ref_text_col or text_col
    rt = reference.select(
        _tokens(F.col(rcol)).alias("_toks")
    ).localCheckpoint(eager=False)
    # model: reference bigram counts, context counts, vocabulary scalar
    rb = _bigrams_of(rt)
    tc = rb.groupBy("_b").agg(F.count(F.lit(1)).alias("_c12"))
    ctx = rb.groupBy(F.split("_b", " ").getItem(0).alias("_w1")).agg(
        F.count(F.lit(1)).alias("_c1")
    )
    vocab = rt.select(F.explode("_toks").alias("_w")).agg(
        (F.count_distinct("_w") + F.lit(1)).alias("_V")
    )
    # corpus side: per-doc bigram counts, then score against the model
    bgc = _bigrams(df, id_col, text_col).groupBy(id_col, "_b").agg(
        F.count(F.lit(1)).alias("_n")
    )
    scored = (
        bgc.join(tc, "_b", "left")
        .join(
            ctx,
            F.split(F.col("_b"), " ").getItem(0) == ctx["_w1"],
            "left",
        )
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            "_n",
            (
                F.log(
                    (F.coalesce("_c12", F.lit(0)) + 1).cast("double")
                    / (F.coalesce("_c1", F.lit(0)) + F.col("_V")).cast("double")
                ).cast("decimal(20,6)")
                * F.col("_n")
            ).alias("_lp"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.sum("_n").alias(m_col),
        (-F.sum("_lp").cast("double") / F.sum("_n")).alias(out_col),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(m_col), F.lit(0)).cast("long").alias(m_col),
            F.coalesce(F.col(out_col), F.lit(0.0)).alias(out_col),
        )
    )


def word_lm_xent_ctes(
    docs_sql: str,
    reference_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str | None = None,
    prefix: str = "lm_",
) -> str:
    """DuckDB CTE chain replaying :func:`word_lm_xent` exactly: same
    tokenization, same integer counts, same one-division probability,
    same DECIMAL(20,6) log quantum. Exposes ``{prefix}agg`` with
    (``id_col``, m, h); compose the final LEFT JOIN + coalesce in the
    caller (the :func:`llm.graph.pagerank_fixed_ctes` convention)."""
    rcol = ref_text_col or text_col
    p = prefix
    toks = (
        f"list_filter(str_split({normalize_sql(text_col)}, ' '), "
        "w -> len(w) > 0)"
    )
    rtoks = (
        f"list_filter(str_split({normalize_sql(rcol)}, ' '), "
        "w -> len(w) > 0)"
    )
    bg = (
        "list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1])"
    )
    return f"""{p}rt AS (SELECT {rtoks} AS ts FROM {reference_sql}),
{p}rb AS (SELECT unnest({bg}) AS b FROM {p}rt WHERE len(ts) >= 2),
{p}tc AS (SELECT b, count(*) AS c12 FROM {p}rb GROUP BY 1),
{p}ctx AS (SELECT split_part(b, ' ', 1) AS w1, count(*) AS c1
           FROM {p}rb GROUP BY 1),
{p}vocab AS (SELECT count(DISTINCT w) + 1 AS V
             FROM (SELECT unnest(ts) AS w FROM {p}rt)),
{p}dt AS (SELECT {id_col}, {toks} AS ts FROM {docs_sql}),
{p}bg AS (SELECT {id_col}, unnest({bg}) AS b FROM {p}dt WHERE len(ts) >= 2),
{p}bgc AS (SELECT {id_col}, b, count(*) AS n FROM {p}bg GROUP BY 1, 2),
{p}sc AS (
  SELECT {id_col}, n,
         CAST(ln(CAST(coalesce(c12, 0) + 1 AS DOUBLE)
                 / CAST(coalesce(c1, 0) + V AS DOUBLE))
              AS DECIMAL(20,6)) * n AS lp
  FROM {p}bgc
  LEFT JOIN {p}tc USING (b)
  LEFT JOIN {p}ctx ON {p}ctx.w1 = split_part(b, ' ', 1)
  CROSS JOIN {p}vocab),
{p}agg AS (SELECT {id_col}, sum(n) AS m,
                  -CAST(SUM(lp) AS DOUBLE) / sum(n) AS h
           FROM {p}sc GROUP BY 1)"""


def word_lm_xent_sql(
    docs_sql: str,
    reference_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str | None = None,
    out_col: str = "lm_xent",
    m_col: str = "n_bigrams",
) -> str:
    """Full DuckDB statement for :func:`word_lm_xent` (docs with no
    bigrams coalesce to (0, 0.0), matching the Spark left join)."""
    ctes = word_lm_xent_ctes(
        docs_sql, reference_sql, id_col, text_col, ref_text_col
    )
    return f"""WITH {ctes}
SELECT d.{id_col},
       CAST(coalesce(a.m, 0) AS BIGINT) AS {m_col},
       CAST(coalesce(a.h, 0.0) AS DOUBLE) AS {out_col}
FROM (SELECT {id_col} FROM {docs_sql}) d
LEFT JOIN lm_agg a USING ({id_col})"""

"""ExactSubstr-style self-deduplication (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better", public):
find every span of text that occurs more than once ACROSS THE WHOLE
CORPUS (including repeats inside a single document) and report / cut
it. This is the span-grain complement to the document-grain dedup
family in :mod:`llm.dedup` (exact / MinHash / SimHash elect whole-doc
survivors; this operator edits inside documents), and the
within-corpus complement to :func:`llm.corpus.decontaminate_substring`
(which matches a candidate corpus against an external benchmark).

Semantics — the standard scalable relaxation of the paper's
suffix-array tool, at word-token grain over :func:`hashing.normalize`d
text: a token position is *duplicated* when the ``k``-gram starting
there occurs at least ``min_count`` times corpus-wide; maximal runs of
duplicated positions merge into spans (two ``k``-grams at starts ``p <
q`` merge iff ``q - p <= k``, i.e. their token intervals overlap or
touch). Any verbatim repeat of ``>= k`` tokens is covered by
construction (each of its start offsets is a duplicated ``k``-gram);
conversely a reported span only guarantees every ``k``-window inside
it is duplicated *somewhere* — different windows may match different
partners. That over-approximation (shared by every k-gram-based
implementation) is the price of avoiding a distributed suffix array.

The cut policy is the released tool's: REMOVE EVERY OCCURRENCE of a
duplicated span (no survivor election — the paper notes leaving one
copy requires choosing which, a global decision their tool also
skips). Electing survivors at span grain is
:func:`llm.scrub.line_dedup`'s job where the grain is a line.

100 TB shape: one explode to (doc, pos, gram) — linear in corpus
tokens; gram occurrence counting is a combinable groupBy (map-side
partials collapse per-partition repeats of hot boilerplate grams
BEFORE the shuffle — the :func:`llm.scrub.line_dedup` skew argument);
the duplicated-gram set joins back by LEFT SEMI on the gram key (AQE
skew-join splits a mega-duplicated gram's join partition); span
merging is a window PARTITIONED BY DOCUMENT, bounded by the longest
single document, never by corpus size. No driver state, no cartesian,
no Python in any hot path. Join keys are the gram STRINGS so the
DuckDB oracle is exact; at production scale substitute
``hashing.shingle_hash_fast`` (one xxhash64) to cut shuffle bytes —
hash collisions only ever over-mark (conservative for a cleaner).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from terra_bonobo_nodes_spark.llm.hashing import normalize, normalize_sql


def _token_array(text_col: str) -> Column:
    """Normalized word tokens; NULL and all-separator text -> empty
    array (split('', ' ') would yield [''] — one phantom token)."""
    norm = normalize(F.coalesce(F.col(text_col), F.lit("")))
    return F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def _tokenized(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(F.col(id_col), _token_array(text_col).alias("_toks"))


def _gram_positions(toked: DataFrame, id_col: str, k: int) -> DataFrame:
    """(id, pos, gram) — one row per k-gram start (1-based pos).
    Documents shorter than k tokens produce no rows (they cannot
    contain a k-token repeat). Tokens materialize once per doc before
    the Generate (the explode_char_shingles rationale: don't let
    project-collapsing re-run the normalize regex per position)."""
    pos = toked.where(F.size("_toks") >= k).select(
        id_col,
        "_toks",
        F.explode(F.sequence(F.lit(1), F.size("_toks") - (k - 1))).alias("pos"),
    )
    return pos.select(
        id_col,
        "pos",
        F.array_join(F.slice(F.col("_toks"), F.col("pos"), k), " ").alias("_gram"),
    )


def duplicated_positions(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """(id, pos) of every k-gram start whose gram occurs >= min_count
    times corpus-wide (within-document repeats count — a document that
    repeats its own boilerplate is duplication too, per the paper).

    The gram frame feeds BOTH the count aggregate and the join-back, so
    it is lazily localCheckpointed once (the decontaminate_substring
    convention) — without the barrier the tokenize+slice explode runs
    twice over the full corpus.
    """
    return _dup_positions(
        _gram_positions(_tokenized(df, text_col, id_col), id_col, k),
        id_col,
        min_count,
    )


def _dup_positions(grams: DataFrame, id_col: str, min_count: int) -> DataFrame:
    grams = grams.localCheckpoint(eager=False)
    dup = (
        grams.groupBy("_gram")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= F.lit(int(min_count)))
        .select("_gram")
    )
    return grams.join(dup, "_gram", "left_semi").select(id_col, "pos")


def _spans_from_positions(dp: DataFrame, id_col: str, k: int) -> DataFrame:
    """Gaps-and-islands over duplicated k-gram starts -> maximal spans.
    With fixed-length intervals the reach of an island is monotone in
    the start, so ``pos - lag(pos) > k`` is exactly the break
    condition. The window partitions by document — state bounded by one
    document's length, never corpus size."""
    w = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(
        F.lag("pos").over(w).isNull() | (F.col("pos") - F.lag("pos").over(w) > k),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy(id_col).orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    islands = dp.withColumn("_brk", brk).withColumn("_isl", F.sum("_brk").over(run))
    return islands.groupBy(id_col, "_isl").agg(
        F.min("pos").alias("start_tok"),
        (F.max("pos") + F.lit(k - 1)).alias("end_tok"),
    ).select(id_col, "start_tok", "end_tok")


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Maximal duplicated spans per document: (id, start_tok, end_tok),
    1-based inclusive token positions."""
    return _spans_from_positions(
        duplicated_positions(df, text_col, id_col, k, min_count), id_col, k
    )


def self_dedup_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_count: int = 2,
    cut: bool = True,
) -> DataFrame:
    """Per-document ExactSubstr report: token count, duplicated-gram
    count, span count, duplicated-token count, duplicated fraction —
    and, with ``cut=True``, ``clean_text`` (the normalized token
    stream with EVERY duplicated-span occurrence removed, the released
    tool's policy) plus ``n_kept_toks``. Every document appears, zeros
    for clean ones; ``clean_text`` is the full normalized text when
    nothing was cut and ``''`` for empty/NULL input.

    Plan: the corpus is TOKENIZED ONCE (the toked frame is a lazy
    localCheckpoint feeding the totals, the gram explode, and the cut's
    token explode); the duplicated-position frame is localCheckpointed
    because it feeds both the per-doc gram aggregate and the span
    derivation; the span frame gets the same treatment (span aggregate
    + drop-position explode). All joins are id-keyed (uniform); the
    cut's anti-join is on (id, pos) — near-unique, no hot key.
    """
    toked = _tokenized(df, text_col, id_col).localCheckpoint(eager=False)
    dp = _dup_positions(
        _gram_positions(toked, id_col, k), id_col, min_count
    ).localCheckpoint(eager=False)
    spans = _spans_from_positions(dp, id_col, k).localCheckpoint(eager=False)

    base = toked.select(id_col, F.size("_toks").cast("long").alias("n_toks"))
    dagg = dp.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_dup_grams"))
    sagg = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("end_tok") - F.col("start_tok") + 1).alias("dup_toks"),
    )
    out = (
        base.join(dagg, id_col, "left")
        .join(sagg, id_col, "left")
        .select(
            id_col,
            "n_toks",
            F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_toks", F.lit(0)).cast("long").alias("dup_toks"),
            F.when(F.col("n_toks") > 0,
                   F.coalesce("dup_toks", F.lit(0)).cast("double") / F.col("n_toks"))
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
    )
    if not cut:
        return out

    tok_rows = toked.select(
        id_col, F.posexplode("_toks").alias("_p0", "_tok")
    ).select(id_col, (F.col("_p0") + 1).alias("pos"), "_tok")
    drop_pos = spans.select(
        id_col, F.explode(F.sequence("start_tok", "end_tok")).alias("pos")
    )
    kept = tok_rows.join(drop_pos, [id_col, "pos"], "left_anti")
    kagg = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "_tok"))),
                lambda s: s["_tok"],
            ),
            " ",
        ).alias("_clean"),
        F.count(F.lit(1)).alias("_nk"),
    )
    return out.join(kagg, id_col, "left").select(
        id_col,
        "n_toks",
        "n_dup_grams",
        "n_spans",
        "dup_toks",
        "dup_frac",
        F.coalesce("_clean", F.lit("")).alias("clean_text"),
        F.coalesce("_nk", F.lit(0)).cast("long").alias("n_kept_toks"),
    )


def self_dedup_report_sql(
    text_expr: str,
    source_sql: str,
    id_col: str = "doc_id",
    k: int = 5,
    min_count: int = 2,
) -> str:
    """DuckDB restatement of :func:`self_dedup_report` (cut=True) over
    ``source_sql`` (a relation providing ``id_col`` and the raw text
    as ``text_expr``). Every step is exact string/integer arithmetic;
    the only double is the final exact-operand division."""
    norm = normalize_sql(f"coalesce({text_expr}, '')")
    return f"""
WITH base AS ({source_sql}),
t AS (
  SELECT {id_col},
         CASE WHEN {norm} = '' THEN CAST([] AS VARCHAR[])
              ELSE str_split({norm}, ' ') END AS toks
  FROM base
), g AS (
  SELECT {id_col}, toks, unnest(range(1, len(toks) - {k} + 2)) AS pos
  FROM t WHERE len(toks) >= {k}
), grams AS (
  SELECT {id_col}, pos,
         array_to_string(list_slice(toks, pos, pos + {k - 1}), ' ') AS gram
  FROM g
), dup AS (
  SELECT gram FROM grams GROUP BY gram HAVING count(*) >= {min_count}
), dp AS (
  SELECT {id_col}, pos FROM grams WHERE gram IN (SELECT gram FROM dup)
), m AS (
  SELECT {id_col}, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                   OR pos - lag(pos) OVER w > {k} THEN 1 ELSE 0 END AS brk
  FROM dp WINDOW w AS (PARTITION BY {id_col} ORDER BY pos)
), i AS (
  SELECT {id_col}, pos,
         sum(brk) OVER (PARTITION BY {id_col} ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS isl
  FROM m
), spans AS (
  SELECT {id_col}, isl, min(pos) AS s, max(pos) + {k - 1} AS e
  FROM i GROUP BY {id_col}, isl
), sagg AS (
  SELECT {id_col}, count(*) AS n_spans, sum(e - s + 1) AS dup_toks
  FROM spans GROUP BY {id_col}
), dagg AS (
  SELECT {id_col}, count(*) AS n_dup_grams FROM dp GROUP BY {id_col}
), tok_rows AS (
  SELECT {id_col}, unnest(toks) AS tok,
         unnest(range(1, len(toks) + 1)) AS pos
  FROM t
), drop_pos AS (
  SELECT {id_col}, unnest(range(s, e + 1)) AS pos FROM spans
), kept AS (
  SELECT tr.{id_col}, tr.pos, tr.tok
  FROM tok_rows tr LEFT JOIN drop_pos d
    ON tr.{id_col} = d.{id_col} AND tr.pos = d.pos
  WHERE d.pos IS NULL
), kagg AS (
  SELECT {id_col}, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
         count(*) AS n_kept FROM kept GROUP BY {id_col}
)
SELECT t.{id_col},
       CAST(len(t.toks) AS BIGINT) AS n_toks,
       CAST(coalesce(dagg.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CAST(coalesce(sagg.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(sagg.dup_toks, 0) AS BIGINT) AS dup_toks,
       CASE WHEN len(t.toks) > 0
            THEN CAST(coalesce(sagg.dup_toks, 0) AS DOUBLE) / len(t.toks)
            ELSE 0.0 END AS dup_frac,
       coalesce(kagg.clean_text, '') AS clean_text,
       CAST(coalesce(kagg.n_kept, 0) AS BIGINT) AS n_kept_toks
FROM t
LEFT JOIN dagg USING ({id_col})
LEFT JOIN sagg USING ({id_col})
LEFT JOIN kagg USING ({id_col})
"""

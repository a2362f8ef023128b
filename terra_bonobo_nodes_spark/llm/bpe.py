"""BPE merge learning — the tokenizer-training operator (Sennrich,
Haddow & Birch 2016, public; the algorithm behind every GPT/Llama
vocabulary) re-expressed Spark-first.

The classic trick that makes BPE trainable at corpus scale is that the
working set is the WORD-COUNT TABLE, not the corpus: after one
``groupBy(token).count()`` pass every subsequent merge round runs over
vocabulary-sized data (millions of rows at web scale, not trillions).
Each round is then:

- **pair counting**: explode each word's adjacent symbol pairs
  weighted by the word's corpus count — one combinable aggregate over
  the bounded pair key space;
- **argmax**: the (count desc, pair asc) top-1 — ONE driver-side row
  per round (the llm/kmeans.py bounded-driver-state convention: k
  rounds leave k pairs on the driver, never data);
- **merge application**: rewrite every word's symbol sequence with the
  chosen pair fused — a pure-Column ``replace`` over the sentinel
  encoding below, leftmost-greedy non-overlapping exactly like the
  reference implementation's re.sub.

Symbol sequences are encoded as strings with \\x02/\\x03 sentinels
around every symbol (``"ab" -> "\\x02a\\x03\\x02b\\x03"``): the merge
of pair (A, B) is then the literal replacement of ``\\x02A\\x03\\x02B\\x03``
with ``\\x02AB\\x03`` — unambiguous because symbols come from the
shared :func:`llm.text.tokens` grain ([a-z0-9]+ only, sentinels can
never occur inside a symbol), and ``replace``'s scan-left
replace-all-non-overlapping semantics IS the reference's greedy merge.
Pair counting counts every adjacent POSITION (``"aaa"`` counts (a,a)
twice), matching the reference ``get_stats``.

Everything is exact integer/string arithmetic, so the learned merge
table replays bit-for-bit in DuckDB (:func:`bpe_merges_sql` unrolls
the same rounds as a CTE chain — the llm/kmeans.py oracle class).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from terra_bonobo_nodes_spark.llm.text import tokens

_S, _E = "\x02", "\x03"  # per-symbol sentinels


def _wrap_chars(token: Column) -> Column:
    """'abc' -> '\\x02a\\x03\\x02b\\x03\\x02c\\x03' (one sentinel pair
    per initial character symbol)."""
    return F.regexp_replace(token, "(.)", f"{_S}$1{_E}")


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, seq) — the vocabulary-sized working set every merge
    round runs over. One corpus scan, one combinable aggregate; this
    is the only stage that touches corpus-sized data."""
    toks = df.select(
        F.explode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias(
            "word"
        )
    )
    wc = toks.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    return wc.select("word", "cnt", _wrap_chars(F.col("word")).alias("seq"))


def _pair_counts(words: DataFrame) -> DataFrame:
    """(sym_a, sym_b, pair_count): adjacent symbol pairs over the
    word table, each position weighted by the word's corpus count."""
    syms = F.split(
        F.expr("substring(seq, 2, length(seq) - 2)"), f"{_E}{_S}"
    )
    pairs = F.expr(
        "zip_with(slice(_syms, 1, size(_syms) - 1),"
        " slice(_syms, 2, size(_syms) - 1),"
        " (a, b) -> struct(a, b))"
    )
    ex = (
        words.select("cnt", syms.alias("_syms"))
        .where(F.size("_syms") >= 2)
        .select("cnt", F.explode(pairs).alias("_p"))
    )
    return ex.groupBy(
        F.col("_p.a").alias("sym_a"), F.col("_p.b").alias("sym_b")
    ).agg(F.sum("cnt").alias("pair_count"))


def bpe_learn(
    df: DataFrame, text_col: str = "text", n_merges: int = 8
) -> list[tuple[int, str, str, int]]:
    """Learn the first ``n_merges`` merges: returns
    ``[(merge_rank, sym_a, sym_b, pair_count), ...]`` in learning
    order. Ties break (count desc, sym_a asc, sym_b asc) —
    deterministic on any partitioning. Stops early when no pair is
    left (every word fused to one symbol).

    Driver state is exactly the returned list (one 3-field row per
    round — bounded by construction); the word table persists between
    rounds because every round scans it twice (count + rewrite)."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    words = word_counts(df, text_col).persist()
    words.count()  # materialize before the loop
    merges: list[tuple[int, str, str, int]] = []
    try:
        for r in range(1, n_merges + 1):
            top = (
                _pair_counts(words)
                .orderBy(
                    F.col("pair_count").desc(),
                    F.col("sym_a").asc(),
                    F.col("sym_b").asc(),
                )
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b, n = top[0]["sym_a"], top[0]["sym_b"], top[0]["pair_count"]
            merges.append((r, a, b, int(n)))
            nxt = words.select(
                "word",
                "cnt",
                F.replace(
                    F.col("seq"),
                    F.lit(f"{_S}{a}{_E}{_S}{b}{_E}"),
                    F.lit(f"{_S}{a}{b}{_E}"),
                ).alias("seq"),
            ).persist()
            nxt.count()
            words.unpersist()
            words = nxt
    finally:
        words.unpersist()
    return merges


def bpe_apply(
    text: Column | str, merges: list[tuple[int, str, str, int]]
) -> Column:
    """Segment a text column under a learned merge list: array of BPE
    symbols per word boundary collapsed into one flat array per
    document. Pure Column — the merge chain is ``len(merges)``
    replaces, applied in learning order (BPE encode follows the merge
    priority list)."""
    def fuse(seq: Column) -> Column:
        out = seq
        for _, a, b, _n in merges:
            out = F.replace(
                out,
                F.lit(f"{_S}{a}{_E}{_S}{b}{_E}"),
                F.lit(f"{_S}{a}{b}{_E}"),
            )
        return out

    seqs = F.transform(
        tokens(F.col(text) if isinstance(text, str) else text),
        lambda w: fuse(F.regexp_replace(w, "(.)", f"{_S}$1{_E}")),
    )
    return F.flatten(
        F.transform(
            seqs,
            lambda s: F.split(F.btrim(s, F.lit(_S + _E)), f"{_E}{_S}"),
        )
    )


def bpe_merges_sql(
    src_sql: str, text_expr: str, n_merges: int, toks_sql: str
) -> str:
    """DuckDB replay of :func:`bpe_learn` as an unrolled CTE chain —
    one (pairs, merge, rewrite) triple per round, the llm/kmeans.py
    oracle pattern. ``toks_sql`` is the caller's tokens() SQL mirror
    over ``t`` (queries_llm.TOKS_SQL convention). Emits
    (merge_rank, sym_a, sym_b, pair_count)."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    s, e = "chr(2)", "chr(3)"
    ctes = [
        f"""_bpe_w0 AS (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt,
         regexp_replace(word, '(.)', chr(2) || '\\1' || chr(3), 'g') AS seq
  FROM (SELECT unnest({toks_sql}) AS word
        FROM (SELECT coalesce({text_expr}, '') AS text FROM ({src_sql})))
  GROUP BY word)"""
    ]
    selects = []
    for r in range(1, n_merges + 1):
        prev = f"_bpe_w{r - 1}"
        ctes.append(
            f"""_bpe_p{r} AS (
  SELECT p.sym_a, p.sym_b, CAST(sum(w.cnt) AS BIGINT) AS pair_count
  FROM {prev} w,
       LATERAL (
         SELECT syms[i] AS sym_a, syms[i + 1] AS sym_b
         FROM (SELECT str_split(substring(w.seq, 2, length(w.seq) - 2),
                                {e} || {s}) AS syms),
              LATERAL unnest(range(1, len(syms))) AS t(i)
       ) p
  GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""_bpe_m{r} AS (
  SELECT {r} AS merge_rank, sym_a, sym_b, pair_count
  FROM _bpe_p{r}
  ORDER BY pair_count DESC, sym_a ASC, sym_b ASC LIMIT 1)"""
        )
        ctes.append(
            f"""_bpe_w{r} AS (
  SELECT w.word, w.cnt,
         replace(w.seq, {s} || m.sym_a || {e} || {s} || m.sym_b || {e},
                 {s} || m.sym_a || m.sym_b || {e}) AS seq
  FROM {prev} w CROSS JOIN _bpe_m{r} m)"""
        )
        selects.append(f"SELECT * FROM _bpe_m{r}")
    body = ",\n".join(ctes)
    union = "\nUNION ALL ".join(selects)
    return f"WITH {body}\n{union}\nORDER BY merge_rank"

"""Trainable byte-pair encoding over the corpus — a REAL tokenizer, not
the pretoken upper bound (``text.bpe_tokens``).

The 100 TB layout mirrors how production BPE trainers work (GPT-2 /
SentencePiece practice): merges are learned from a WORD-FREQUENCY
table, not from raw text —

1. ``word_frequencies``: one distributed scan + one shuffle produces
   (word, count); the top-``max_words`` rows collect to the driver BY
   CONTRACT (the same bounded-collect discipline as
   ``similarity.brute_force_topk``'s query side: tens of thousands of
   rows regardless of corpus size, because token statistics saturate —
   the tail of singleton words cannot change early merges).
2. ``train_bpe``: the classic greedy merge loop runs LOCALLY on that
   table (it is inherently sequential — each merge depends on the
   last — so distributing it would only add barriers).
3. ``encode_words`` / ``bpe_token_count``: the learned merge ranks ship
   to executors inside one Arrow-batched ``mapInPandas``/``pandas_udf``
   stage; encoding is embarrassingly parallel.

Determinism: ties in pair counts break lexicographically, so the merge
list is a pure function of the word-frequency table; encoding is a pure
function of (text, merges). No randomness anywhere.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from terra_bonobo_nodes_spark.llm.text import BPE_SPLIT_RE, tokens

_END = "</w>"  # end-of-word sentinel, the classic BPE boundary marker


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    max_words: int = 50_000,
) -> DataFrame:
    """(word, n) for the ``max_words`` most frequent pretokens
    (count desc, word asc — deterministic truncation). One explode +
    one count shuffle + a distributed top-k cut (orderBy + limit runs
    as TakeOrderedAndProject: each task keeps its own top ``max_words``
    heap, so no single reducer ever sees the full distinct-word set —
    a global row_number window here would funnel billions of distinct
    words through one task at 100 TB). The corpus is scanned once."""
    words = df.select(
        F.explode(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_SPLIT_RE), 0)).alias(
            "word"
        )
    ).where(F.trim("word") != "")
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("word").asc()).limit(max_words)


def train_bpe(
    word_freq: DataFrame | list[tuple[str, int]],
    n_merges: int = 200,
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` byte-pair merges from a word-frequency table
    (greedy highest-count pair first; count ties break lexicographically
    so training is deterministic). Accepts the DataFrame from
    :func:`word_frequencies` (collected here BY CONTRACT — it is
    statistics, not data; ``max_words`` fails fast on misuse) or a
    plain list for tests. Returns the ordered merge list."""
    if isinstance(word_freq, DataFrame):
        rows = word_freq.limit(max_words + 1).collect()
        if len(rows) > max_words:
            raise ValueError(
                f"train_bpe: word-frequency table exceeds max_words="
                f"{max_words}; trim it with word_frequencies(max_words=...) "
                "— BPE statistics saturate long before this"
            )
        table = [(r[0], int(r[1])) for r in rows]
    else:
        table = list(word_freq)

    # word -> (symbol tuple, count); start from characters + sentinel
    vocab: dict[tuple[str, ...], int] = {}
    for word, n in table:
        sym = tuple(word) + (_END,)
        vocab[sym] = vocab.get(sym, 0) + n

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
        if not pair_counts:
            break
        # deterministic: highest count, ties to the lexicographically
        # smallest pair (plain tuple order on the (str, str) key)
        pair, count = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if count < 2:
            break  # nothing left worth merging
        merged = pair[0] + pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, n in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == pair[0] and sym[i + 1] == pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
        merges.append(pair)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word by rank priority (the GPT-2 encoder
    loop): repeatedly merge the lowest-rank adjacent pair present."""
    sym = list(word) + [_END]
    while len(sym) > 1:
        best_i, best_rank = -1, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def encode_words(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize documents with the learned merges: one Arrow-batched
    ``mapInPandas`` stage (the merge table ships once per task in the
    closure — a few KB). Output keeps ``id_col`` plus the token array;
    ``array_join`` it or count it downstream."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    pretok = re.compile(BPE_SPLIT_RE)
    # id type follows the input (string ids are common in real corpora);
    # a hardcoded 'long' here would miscast at the Arrow boundary
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, {out_col} array<string>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in pretok.findall(str(text).lower()):
                    if not w.strip():
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = _encode_word(w, ranks)
                        cache[w] = got
                    toks.extend(got)
                out.append(toks)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: out})

    return df.select(id_col, text_col).mapInPandas(run, schema)


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_bpe_tokens) under the TRAINED tokenizer — the budget
    number a packing/pricing pipeline needs (``text.bpe_tokens`` only
    upper-bounds it with pretokens)."""
    enc = encode_words(df, merges, text_col, id_col)
    return enc.select(id_col, F.size("bpe_tokens").alias("n_bpe_tokens"))


# =============================================================================
# Distributed merge learning (round 15) — the EXECUTOR-side variant of
# train_bpe for when the word table itself outgrows the driver's
# saturation-collect contract: pair counting, argmax, and the merge
# rewrite all run distributed (ONE 3-field row per round reaches the
# driver — the llm/kmeans.py convention), and the whole learn replays
# bit-for-bit in DuckDB (bpe_merges_sql). Semantics differ from
# train_bpe in exactly two documented ways: symbols come from the
# shared tokens() grain ([a-z0-9]+, no end-of-word sentinel), and
# there is no count<2 early stop (the oracle chain has no data-
# dependent length). Both learners pin against the same Sennrich
# reference family in tests (test_llm_ops vs test_bpe).

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

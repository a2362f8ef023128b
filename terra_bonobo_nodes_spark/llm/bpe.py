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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terra_bonobo_nodes_spark.llm.text import BPE_SPLIT_RE

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

"""BPE merge learning (llm/bpe.py): the distributed learner vs an
independent pure-Python Sennrich reference (hypothesis-swept),
leftmost-greedy merge semantics, deterministic tie-breaks, the DuckDB
unrolled-CTE mirror, and bpe_apply encode consistency."""

from __future__ import annotations

import re
from collections import Counter

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from terra_bonobo_nodes_spark.llm import bpe


# --- independent reference (Sennrich learn_bpe semantics) ---------------------


def _ref_learn(texts: list[str], n_merges: int):
    words = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", (t or "").lower()):
            if w:
                words[w] += 1
    vocab = {w: tuple(w) for w in words}
    merges = []
    for r in range(1, n_merges + 1):
        stats: Counter = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += words[w]
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        merges.append((r, a, b, n))
        new_vocab = {}
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[w] = tuple(out)
        vocab = new_vocab
    return merges, vocab


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_learns_the_textbook_example(spark):
    # the classic: 'aaab' x3 + 'aab' -> (a,a) first, then ('aa','a'|
    # depends on counts), deterministic here
    texts = ["aaab aaab aaab aab"]
    got = bpe.bpe_learn(_docs(spark, texts), n_merges=3)
    want, _ = _ref_learn(texts, 3)
    assert got == want
    assert got[0][1:3] == ("a", "a")  # most frequent pair


def test_tie_breaks_are_lexicographic(spark):
    # 'ab' and 'cd' both appear twice: (a,b) wins the tie by pair asc
    texts = ["ab ab cd cd"]
    got = bpe.bpe_learn(_docs(spark, texts), n_merges=1)
    assert got[0][1:4] == ("a", "b", 2)


def test_overlapping_pairs_count_per_position_and_merge_greedy(spark):
    # 'aaa': (a,a) counts twice per word; the merge fuses leftmost ->
    # symbols ('aa', 'a'), so round 2's top pair is ('aa', 'a')
    texts = ["aaa aaa"]
    got = bpe.bpe_learn(_docs(spark, texts), n_merges=2)
    want, vocab = _ref_learn(texts, 2)
    assert got == want
    assert got[0] == (1, "a", "a", 4)
    assert vocab["aaa"] == ("aaa",)


def test_stops_early_when_fully_fused(spark):
    texts = ["ab ab"]
    got = bpe.bpe_learn(_docs(spark, texts), n_merges=10)
    want, _ = _ref_learn(texts, 10)
    assert got == want and len(got) == 1  # one merge fuses everything


@given(
    texts=st.lists(
        st.text(alphabet="abcz 019", min_size=0, max_size=40),
        min_size=1,
        max_size=6,
    ),
    m=st.integers(1, 5),
)
@settings(max_examples=8, deadline=None)
def test_matches_reference_on_random_corpora(spark, texts, m):
    got = bpe.bpe_learn(_docs(spark, texts), n_merges=m)
    want, _ = _ref_learn(texts, m)
    assert got == want


def test_sql_mirror_replays_the_learner(spark):
    from terra_bonobo_nodes_spark.plans.queries_llm import TOKS_SQL

    texts = ["the cat the cat sat", "catamaran thecat", "aaa bbb the"]
    got = bpe.bpe_learn(_docs(spark, texts), n_merges=4)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"('{t}')" for t in texts)
        + ") t(text)"
    )
    sql = bpe.bpe_merges_sql("SELECT text FROM docs", "text", 4, TOKS_SQL)
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    con.close()
    assert [tuple(g) for g in got] == want


def test_apply_segments_with_learned_merges(spark):
    texts = ["banana bandana", "ban ban banana"]
    merges = bpe.bpe_learn(_docs(spark, texts), n_merges=3)
    seg = (
        _docs(spark, texts)
        .select("doc_id", bpe.bpe_apply("text", merges).alias("syms"))
        .collect()
    )
    _, vocab = _ref_learn(texts, 3)
    by_id = {r["doc_id"]: r["syms"] for r in seg}
    for i, t in enumerate(texts):
        want = [
            s
            for w in re.split(r"[^a-z0-9]+", t.lower())
            if w
            for s in vocab[w]
        ]
        assert by_id[i] == want, (i, t)
    # round-trip: concatenating symbols recovers the tokens
    joined = (
        _docs(spark, texts)
        .select(
            F.concat_ws("", bpe.bpe_apply("text", merges)).alias("j"),
            F.concat_ws(
                "",
                F.split(F.lower("text"), "[^a-z0-9]+"),
            ).alias("w"),
        )
        .collect()
    )
    for r in joined:
        assert r["j"] == r["w"]


def test_rejects_bad_n_merges(spark):
    with pytest.raises(ValueError):
        bpe.bpe_learn(_docs(spark, ["x"]), n_merges=0)
    with pytest.raises(ValueError):
        bpe.bpe_merges_sql("SELECT 1", "text", 0, "x")

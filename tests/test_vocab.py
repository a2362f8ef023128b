"""Vocabulary coverage / OOV-rate report (llm/text.py::vocab_coverage,
top_tokens): exact ppm arithmetic, NULL-text semantics, broadcast-join
plan, and the TakeOrderedAndProject top-k builder."""

from __future__ import annotations

import pytest

from terra_bonobo_nodes_spark.llm.text import top_tokens, vocab_coverage


def _docs(spark):
    return spark.createDataFrame(
        [
            ("web", "the cat sat on the mat"),
            ("web", "the dog BARKED!"),
            ("code", "def cat(): return mat"),
            ("code", None),
            ("empty", None),
        ],
        "source string, text string",
    )


def _vocab(spark, words):
    return spark.createDataFrame([(w,) for w in words], "token string")


def test_oov_ppm_exact(spark):
    vocab = _vocab(spark, ["the", "cat", "mat", "on", "sat"])
    got = {
        r["group"]: (r["n_tokens"], r["n_oov"], r["oov_rate_ppm"])
        for r in vocab_coverage(_docs(spark), vocab).collect()
    }
    # web: tokens = the cat sat on the mat the dog barked = 9; oov dog+barked
    assert got["web"] == (9, 2, (2 * 1_000_000) // 9)
    # code: def cat return mat -> oov def+return
    assert got["code"] == (4, 2, 500_000)
    # all-NULL group: zero tokens, NULL rate
    assert got["empty"] == (0, 0, None)


def test_vocab_duplicates_do_not_double_count(spark):
    vocab = _vocab(spark, ["the", "the", "cat"])
    got = {
        r["group"]: r["n_tokens"]
        for r in vocab_coverage(_docs(spark), vocab).collect()
    }
    assert got["web"] == 9  # left join against distinct vocab: no fanout


def test_null_lang_group_matches_oracle(spark):
    """ADVICE r15 (queries_candidates.py): a NULL lang collapses into a
    real group on the Spark side (groupBy semantics); the oracle's
    spine-join must use IS NOT DISTINCT FROM so it reports that group's
    actual counts instead of (0, 0, NULL)."""
    from terra_bonobo_nodes_spark.plans.queries_candidates import (
        VOCAB_COVERAGE_ORACLE,
        _VC_K,
    )
    from terra_bonobo_nodes_spark.llm.text import top_tokens, vocab_coverage

    rows = [
        (1, "en", "the cat sat"),
        (2, None, "dog dog dog barked"),
        (3, "en", "the the mat"),
        (4, None, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    vocab = top_tokens(
        docs.withColumnRenamed("lang", "source"), _VC_K
    ).select("token")
    got = {
        r["group"]: (r["n_tokens"], r["n_oov"], r["oov_rate_ppm"])
        for r in vocab_coverage(
            docs.select("lang", "text"), vocab, group_col="lang"
        ).collect()
    }
    import duckdb

    con = duckdb.connect()  # fresh: the session fixture views `documents`
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(1, 'en', 'the cat sat'), (2, NULL, 'dog dog dog barked'), "
        "(3, 'en', 'the the mat'), (4, NULL, NULL)"
        ") t(doc_id, lang, text)"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(VOCAB_COVERAGE_ORACLE).fetchall()
    }
    con.close()
    assert got == want
    assert want[None][0] == 4  # the NULL-lang group carries real counts


def test_top_tokens_tiebreak_and_limit(spark):
    df = spark.createDataFrame(
        [("x", "b b a a c"), ("y", None)], "source string, text string"
    )
    got = [(r["token"], r["n"]) for r in top_tokens(df, 2).collect()]
    assert got == [("a", 2), ("b", 2)]  # count tie -> token asc
    with pytest.raises(ValueError):
        top_tokens(df, 0)


def test_top_k_plan_is_take_ordered(spark):
    df = _docs(spark)
    plan = top_tokens(df, 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_coverage_plan_broadcasts_vocab(spark):
    df = _docs(spark)
    vocab = _vocab(spark, ["the"])
    plan = (
        vocab_coverage(df, vocab)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan

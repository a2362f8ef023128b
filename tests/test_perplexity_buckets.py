"""CCNet perplexity bucketing: head/middle/tail by char-LM entropy
terciles, 'empty' for bigram-less docs, cutoffs= as the scale seam."""

from __future__ import annotations

import pytest

from terra_bonobo_nodes_spark.llm.text import char_lm_entropy, perplexity_buckets

# 9 docs spanning fluent English to gibberish: under a corpus-trained
# bigram LM the repetitive/fluent ones score low entropy, the uniform
# gibberish high. 3 terciles x 3 docs.
_DOCS = [
    "the cat sat on the mat and the cat sat again on the mat",
    "the dog sat on the mat and the dog sat again on the mat",
    "the rat sat on the mat and the rat sat again on the mat",
    "some words appear here with mixed structure overall",
    "other words show up there with varied structure broadly",
    "more words arrive now with loose structure roughly",
    "zq xv jk wp qz vx kj pw zx qv kx wj",
    "qj zw vk xp jz wq kv px jq wz vx kp",
    "xk pj wv qz kx jp vw zq xj pk wv qx",
]


def _buckets(spark, docs, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    out = perplexity_buckets(df, **kw).collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_terciles_split_3_3_3_and_follow_entropy(spark):
    rows = _buckets(spark, _DOCS, exact=True)
    by_bucket = {}
    for r in rows.values():
        by_bucket.setdefault(r["ppl_bucket"], []).append(r["lm_entropy"])
    assert {k: len(v) for k, v in by_bucket.items()} == {
        "head": 3,
        "middle": 3,
        "tail": 3,
    }
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])


def test_empty_doc_gets_empty_and_does_not_move_cutoffs(spark):
    base = _buckets(spark, _DOCS, exact=True)
    with_empty = _buckets(spark, _DOCS + ["", None, "x"], exact=True)
    assert with_empty[9]["ppl_bucket"] == "empty"
    assert with_empty[10]["ppl_bucket"] == "empty"
    assert with_empty[11]["ppl_bucket"] == "empty"  # 1 char -> 0 bigrams
    # the 9 scored docs keep their buckets: empties were excluded from
    # the cutoff aggregation... but adding docs DOES retrain the corpus
    # LM, so compare bucket ORDER, not identity, when the corpus is
    # unchanged modulo bigram-less docs (they add no bigrams).
    for i in range(9):
        assert with_empty[i]["ppl_bucket"] == base[i]["ppl_bucket"], i


def test_cutoffs_seam_is_pure_tagging(spark):
    scored = {
        r["doc_id"]: r["lm_entropy"]
        for r in char_lm_entropy(
            spark.createDataFrame(
                [(i, t) for i, t in enumerate(_DOCS)], "doc_id long, text string"
            ),
            "doc_id",
            "text",
        ).collect()
    }
    lo = sorted(round(v, 4) for v in scored.values())
    c1, c2 = lo[2], lo[5]  # put exactly 3 docs at or below each cutoff
    rows = _buckets(spark, _DOCS, cutoffs=(c1, c2))
    got = {
        b: sum(1 for r in rows.values() if r["ppl_bucket"] == b)
        for b in ("head", "middle", "tail")
    }
    assert got == {"head": 3, "middle": 3, "tail": 3}


def test_approx_matches_exact_at_small_n(spark):
    exact = _buckets(spark, _DOCS, exact=True)
    approx = _buckets(spark, _DOCS, exact=False)
    # percentile_approx at accuracy 1e5 is exact below 1e5 values up to
    # the sketch's boundary pick; buckets must agree on a 9-doc corpus
    # with well-separated entropies
    for i in exact:
        assert exact[i]["ppl_bucket"] == approx[i]["ppl_bucket"], i


def test_quantized_entropy_surfaced(spark):
    rows = _buckets(spark, _DOCS[:3], exact=True)
    for r in rows.values():
        assert r["lm_entropy"] == round(r["lm_entropy"], 4)
        assert r["n_bigrams"] > 0


@pytest.mark.parametrize("bad", [(1.0,), ("a", "b")])
def test_cutoffs_must_be_two_floats(spark, bad):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises((ValueError, IndexError, TypeError)):
        perplexity_buckets(df, cutoffs=bad).collect()

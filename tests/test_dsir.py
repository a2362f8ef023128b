"""DSIR importance weights: hashed unigram+bigram multinomial log
ratio of a target sample vs the raw corpus."""

from __future__ import annotations

from terra_bonobo_nodes_spark.llm.corpus import dsir_logweights

# Two "dialects" with disjoint vocabulary; target is drawn from A.
_A = [
    "alpha beta gamma delta alpha beta",
    "beta gamma delta alpha gamma beta",
    "gamma alpha beta delta beta alpha",
]
_B = [
    "zonk quux blarg wibble zonk quux",
    "quux blarg wibble zonk blarg quux",
    "blarg zonk quux wibble quux zonk",
]


def _run(spark, raw_docs, target_docs, **kw):
    raw = spark.createDataFrame(
        [(i, t) for i, t in enumerate(raw_docs)], "doc_id long, text string"
    )
    target = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(target_docs)],
        "doc_id long, text string",
    )
    out = dsir_logweights(raw, target, **kw).collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_target_like_docs_score_higher(spark):
    rows = _run(spark, _A + _B, _A)
    a_weights = [rows[i]["dsir_logweight"] for i in range(3)]
    b_weights = [rows[i]["dsir_logweight"] for i in range(3, 6)]
    assert min(a_weights) > max(b_weights)


def test_empty_and_null_text(spark):
    raw = spark.createDataFrame(
        [(0, _A[0]), (1, ""), (2, None)], "doc_id long, text string"
    )
    target = spark.createDataFrame([(9, _A[1])], "doc_id long, text string")
    rows = {r["doc_id"]: r.asDict() for r in dsir_logweights(raw, target).collect()}
    assert set(rows) == {0, 1, 2}  # empty docs still present
    for i in (1, 2):
        assert rows[i]["dsir_n_features"] == 0
        assert rows[i]["dsir_logweight"] == 0.0
    assert rows[0]["dsir_n_features"] == 11  # 6 unigrams + 5 bigrams


def test_deterministic(spark):
    r1 = _run(spark, _A + _B, _A)
    r2 = _run(spark, _A + _B, _A)
    assert r1 == r2


def test_feature_count_is_unigrams_plus_bigrams(spark):
    rows = _run(spark, ["one two three", "single"], _A)
    assert rows[0]["dsir_n_features"] == 5  # 3 + 2
    assert rows[1]["dsir_n_features"] == 1  # 1 + 0


def test_bucket_collisions_tolerated(spark):
    # tiny bucket count: everything collides, weights still finite and
    # the transform stays total (no div-by-zero on empty buckets)
    rows = _run(spark, _A + _B, _A, buckets=2)
    assert all(abs(r["dsir_logweight"]) < 100.0 for r in rows.values())
    assert all(r["dsir_n_features"] == 11 for r in rows.values())

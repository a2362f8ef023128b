"""llm/classifier.py: the learned quality filter.

Covers: exact parity with a local numpy reference implementation (same
zero init, standardization, update rule), separation on separable
data, the pure-Column scoring contract (no Python eval node in the
plan), the zero-variance guard, typed empty-input errors (the round-9
degenerate-input discipline), and the end-to-end documents story
(features from text.quality_score, labels from a held-out heuristic,
the model orders the classes correctly).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from terra_bonobo_nodes_spark.llm.classifier import (
    LogRegModel,
    filter_quality,
    score_quality,
    train_quality_logreg,
)


def _reference_fit(X, y, iterations, lr=1.0, l2=0.0):
    """Local numpy twin of train_quality_logreg (zero init, pop-std
    standardization, batch avg-gradient updates)."""
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    m, s = X.mean(axis=0), np.maximum(X.std(axis=0), 1e-12)
    Xs = (X - m) / s
    w = np.zeros(X.shape[1])
    b = 0.0
    for _ in range(iterations):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
        r = p - y
        b -= lr * r.mean()
        w -= lr * ((Xs * r[:, None]).mean(axis=0) + l2 * w)
    return w, b, m, s


ROWS = [
    (0.1, 5.0, 0), (0.9, 1.0, 1), (0.2, 4.0, 0), (0.8, 0.5, 1),
    (0.3, 6.0, 0), (0.7, 1.5, 1), (0.15, 5.5, 0), (0.95, 0.2, 1),
]


def _df(spark):
    return spark.createDataFrame(ROWS, "x1 DOUBLE, x2 DOUBLE, label INT")


def test_matches_numpy_reference(spark):
    model = train_quality_logreg(
        _df(spark), ["x1", "x2"], iterations=15, lr=0.7, l2=0.01
    )
    w, b, m, s = _reference_fit(
        [r[:2] for r in ROWS], [r[2] for r in ROWS], 15, lr=0.7, l2=0.01
    )
    assert np.allclose(model.weights, w, rtol=1e-9, atol=1e-12)
    assert math.isclose(model.bias, b, rel_tol=1e-9, abs_tol=1e-12)
    assert np.allclose(model.means, m) and np.allclose(model.stds, s)


def test_separable_data_separates(spark):
    model = train_quality_logreg(_df(spark), ["x1", "x2"], iterations=60)
    scored = score_quality(_df(spark), model)
    rows = scored.collect()
    assert all(
        (r["quality_prob"] >= 0.5) == (r["label"] == 1) for r in rows
    )
    kept = filter_quality(_df(spark), model, threshold=0.5)
    assert kept.count() == 4
    assert {r["label"] for r in kept.collect()} == {1}


def test_scoring_is_pure_column_no_python_eval(spark):
    model = LogRegModel(("x1", "x2"), (1.0, -1.0), 0.1, (0.5, 2.0), (1.0, 1.0))
    plan = (
        score_quality(_df(spark), model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("BatchEvalPython", "ArrowEval", "MapInPandas", "FlatMapGroupsInPandas"):
        assert node not in plan, f"scoring left the JVM: {node}\n{plan}"


def test_zero_variance_feature_stays_finite(spark):
    df = _df(spark).withColumn("const", F.lit(3.0))
    model = train_quality_logreg(df, ["x1", "const"], iterations=10)
    assert all(math.isfinite(v) for v in (*model.weights, model.bias))
    # the constant feature standardizes to 0 everywhere -> weight 0
    assert abs(model.weights[1]) < 1e-9


def test_empty_corpus_raises_typed(spark):
    empty = spark.createDataFrame([], "x1 DOUBLE, x2 DOUBLE, label INT")
    with pytest.raises(ValueError, match="empty corpus"):
        train_quality_logreg(empty, ["x1", "x2"])
    with pytest.raises(ValueError, match="feature_cols"):
        train_quality_logreg(_df(spark), [])


def test_all_null_feature_raises_typed(spark):
    """ADVICE_r09: an all-NULL (or partially NULL) feature column used
    to die in float(None) — now a typed error naming the column, since
    avg() silently drops NULL rows from the gradient denominators."""
    rows = [(None, 5.0, 0), (None, 1.0, 1), (None, 4.0, 0), (None, 0.5, 1)]
    df = spark.createDataFrame(rows, "x1 DOUBLE, x2 DOUBLE, label INT")
    with pytest.raises(ValueError, match="'x1' has 4 NULL rows"):
        train_quality_logreg(df, ["x1", "x2"])
    # partial NULLs are the same contract (silent row-dropping)
    some = spark.createDataFrame(
        [(0.1, 5.0, 0), (None, 1.0, 1), (0.3, 4.0, 0), (0.8, 0.5, 1)],
        "x1 DOUBLE, x2 DOUBLE, label INT",
    )
    with pytest.raises(ValueError, match="'x1' has 1 NULL rows"):
        train_quality_logreg(some, ["x1", "x2"])


def test_documents_end_to_end_orders_classes(spark, sf_dir):
    """The real pipeline shape: engineered features from
    text.quality_score, a label the model never sees as a feature
    (here: the composite heuristic's top/bottom halves), one persisted
    feature frame, a handful of one-scan iterations — the trained
    model must rank the positive class above the negative."""
    from terra_bonobo_nodes_spark.llm.text import quality_score
    from terra_bonobo_nodes_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    feats = quality_score(docs)
    cols = ["q_n_tokens", "q_alpha_ratio", "q_punct_ratio", "q_stop_ratio"]
    cut = feats.agg(F.expr("percentile(q_score, 0.5)")).collect()[0][0]
    labeled = feats.withColumn(
        "label", (F.col("q_score") >= F.lit(cut)).cast("int")
    ).persist()
    try:
        model = train_quality_logreg(labeled, cols, iterations=20)
        scored = score_quality(labeled, model)
        agg = scored.groupBy("label").agg(F.avg("quality_prob").alias("p"))
        by_label = {r["label"]: r["p"] for r in agg.collect()}
        assert by_label[1] > by_label[0] + 0.1
    finally:
        labeled.unpersist()


# --- hashed-text form --------------------------------------------------------


TEXTS = [
    ("the quick brown fox jumps over the lazy dog", 1),
    ("a clear well written informative paragraph about science", 1),
    ("readable prose with ordinary common words and structure", 1),
    ("buy now click here free free free winner", 0),
    ("zzzz qqqq xxxx spam spam spam spam", 0),
    ("click click click buy buy buy now now", 0),
]


def _text_df(spark):
    return spark.createDataFrame(TEXTS, "text STRING, label INT")


def _reference_hashed_fit(rows, dim, iterations, lr=1.0, l2=0.0):
    import zlib

    import numpy as np

    w = np.zeros(dim)
    b = 0.0
    feats = []
    for text, y in rows:
        ids = [zlib.crc32(t.encode()) % dim for t in str(text).lower().split()]
        idx, cnt = np.unique(ids, return_counts=True)
        feats.append((idx, cnt / len(ids), float(y)))
    n = len(rows)
    for _ in range(iterations):
        g = np.zeros(dim + 1)
        for idx, x, y in feats:
            z = b + float(w[idx] @ x)
            r = 1.0 / (1.0 + np.exp(-z)) - y
            np.add.at(g, idx, r * x)
            g[dim] += r
        g /= n
        b -= lr * g[dim]
        w -= lr * (g[:dim] + l2 * w)
    return w, b


def test_hashed_matches_numpy_reference(spark):
    from terra_bonobo_nodes_spark.llm.classifier import train_hashed_text_logreg

    model = train_hashed_text_logreg(
        _text_df(spark), dim=64, iterations=8, lr=0.5, l2=0.01
    )
    w, b = _reference_hashed_fit(TEXTS, 64, 8, lr=0.5, l2=0.01)
    import numpy as np

    assert np.allclose(model.weights, w, rtol=1e-9, atol=1e-12)
    assert math.isclose(model.bias, b, rel_tol=1e-9, abs_tol=1e-12)


def test_hashed_separates_and_is_partitioning_invariant(spark):
    from terra_bonobo_nodes_spark.llm.classifier import (
        score_hashed_text,
        train_hashed_text_logreg,
    )

    df = _text_df(spark)
    m1 = train_hashed_text_logreg(df.repartition(1), dim=256, iterations=40)
    m4 = train_hashed_text_logreg(df.repartition(4), dim=256, iterations=40)
    import numpy as np

    # gradient partials sum in different orders -> last-ulp drift only
    assert np.allclose(m1.weights, m4.weights, rtol=1e-8)
    scored = score_hashed_text(df, m4)
    assert all(
        (r["quality_prob"] >= 0.5) == (r["label"] == 1) for r in scored.collect()
    )


def test_hashed_empty_corpus_and_empty_text(spark):
    from terra_bonobo_nodes_spark.llm.classifier import (
        score_hashed_text,
        train_hashed_text_logreg,
        HashedTextModel,
    )

    empty = spark.createDataFrame([], "text STRING, label INT")
    with pytest.raises(ValueError, match="empty corpus"):
        train_hashed_text_logreg(empty)
    # zero-token documents score at the bias, not a crash
    model = HashedTextModel(dim=8, weights=(0.0,) * 8, bias=0.0)
    df = spark.createDataFrame([("",), ("   ",), (None,)], "text STRING")
    rows = score_hashed_text(df, model).collect()
    # NULL text is an empty document (NOT the literal token 'none')
    assert all(abs(r["quality_prob"] - 0.5) < 1e-12 for r in rows)


def test_hashed_sigmoid_saturates_instead_of_overflowing(spark):
    """ADVICE_r09: 1/(1+math.exp(-z)) raised OverflowError on the
    executor for z < ~-745; the stable branched sigmoid saturates to a
    clean 0.0/1.0, so extreme models score instead of crashing."""
    from terra_bonobo_nodes_spark.llm.classifier import (
        HashedTextModel,
        score_hashed_text,
        _sigmoid_np,
    )

    z = np.array([-1e6, -800.0, -1.5, 0.0, 1.5, 800.0, 1e6])
    p = _sigmoid_np(z)
    assert np.all(np.isfinite(p))
    assert p[0] == 0.0 and p[-1] == 1.0
    assert abs(p[3] - 0.5) < 1e-15
    # round-trip symmetry of the two branches
    assert np.allclose(p + _sigmoid_np(-z), 1.0, atol=1e-15)
    # end-to-end: a model with a huge negative weight on every bucket
    model = HashedTextModel(dim=4, weights=(-1e6,) * 4, bias=0.0)
    df = spark.createDataFrame([("spam spam spam",), ("x",)], "text STRING")
    rows = score_hashed_text(df, model).collect()
    assert [r["quality_prob"] for r in rows] == [0.0, 0.0]


def test_flat_token_scatter_matches_per_doc_reference(spark):
    """The round-10 vectorization (_flat_token_ids + one np.add.at per
    batch) must score bit-close to the per-document np.unique form it
    replaced — same L1-normalized hashed features, different summation
    order only."""
    from terra_bonobo_nodes_spark.llm.classifier import (
        HashedTextModel,
        _token_hash_ids,
        score_hashed_text,
    )

    rng_texts = [t for t, _ in TEXTS] + ["", None, "unseen zzz tokens here"]
    dim = 64
    w = np.asarray(
        [((i * 2654435761) % 1000 - 500) / 250.0 for i in range(dim)]
    )
    model = HashedTextModel(dim=dim, weights=tuple(w.tolist()), bias=0.3)
    df = spark.createDataFrame([(t,) for t in rng_texts], "text STRING")
    got = {
        r["text"]: r["quality_prob"]
        for r in score_hashed_text(df, model).collect()
    }
    for t in rng_texts:
        ids = _token_hash_ids(t, dim)
        if ids:
            idx, cnt = np.unique(ids, return_counts=True)
            z = 0.3 + float(w[idx] @ (cnt / len(ids)))
        else:
            z = 0.3
        want = 1.0 / (1.0 + math.exp(-z))
        assert math.isclose(got[t], want, rel_tol=1e-12, abs_tol=1e-15)


def test_training_gradient_is_one_jvm_aggregation(spark):
    """The one-scan-per-iteration claim, pinned on the plan: the
    gradient aggregate is a partial+final HashAggregate pair over the
    scan with no Python eval node anywhere."""
    df = _df(spark)
    feats = [F.col(c).cast("double") for c in ("x1", "x2")]
    y = F.col("label").cast("double")
    z = F.lit(0.0) + F.lit(0.1) * feats[0] + F.lit(-0.2) * feats[1]
    resid = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - y
    g = df.agg(
        F.avg(resid).alias("g_b"),
        *[F.avg(resid * x).alias(f"g{i}") for i, x in enumerate(feats)],
    )
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") == 2  # partial + final
    for node in ("BatchEvalPython", "ArrowEval", "MapInPandas"):
        assert node not in plan

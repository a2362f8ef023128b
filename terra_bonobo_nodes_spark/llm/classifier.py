"""Learned quality filtering: distributed logistic regression over
engineered text features — the model-based curation stage between
heuristics and the corpus (the GPT-3 pipeline trained exactly this
shape of linear quality classifier to separate curated reference text
from raw crawl; ``text.quality_score``'s docstring calls its linear
blend "a placeholder for a learned filter" — this is the learned
filter).

100 TB shape — every stage stays JVM-side, nothing row-sized ever
collects:

- **standardization stats**: one built-in aggregation (avg/stddev per
  feature) — one scan, map-side combine for free;
- **training**: batch gradient descent where EACH ITERATION IS ONE
  SCAN: the gradient of the logistic loss, ``avg((sigmoid(z) - y) *
  x_j)`` per feature, is expressed as d+1 built-in ``avg`` aggregates
  over a ``z`` column built from the current weights as literals — the
  whole iteration is whole-stage-codegen'd JVM work with a scalar
  result row; the driver applies the update (the model is d+1 floats)
  and bakes the new weights into the next iteration's plan. Persist
  the feature frame before training: ``iterations`` scans of a
  10-column double frame, not of the raw text.
- **scoring / filtering**: a pure Column expression (sigmoid of the
  standardized dot product, unrolled over the feature columns) — no
  UDF, pushdown- and codegen-friendly, usable directly in a ``where``.

This literal-unrolled form is right for the feature-vector sizes
quality filters use (tens of columns). For d in the thousands, switch
the gradient to the ``llm/embeddings.py`` layout (per-partition numpy
partials over ``mapInPandas``, d+1-key shuffle) — same scan count,
same driver-sized model; the expression tree is the only thing that
does not scale in d here.

No counterpart in the reference (its pipelines stop at attribute
filters, ``terra_bonobo_nodes/common.py:120-160``); this extends the
curation family (``llm/text.py``, ``llm/corpus.py``) the way a
pretraining pipeline needs.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STD_FLOOR = 1e-12  # zero-variance guard: constant features get weight ~0


@dataclass(frozen=True)
class LogRegModel:
    """A trained quality filter: d+1 floats plus the standardization
    constants baked in at train time, so scoring any frame with the
    same feature columns needs no statistics pass."""

    feature_cols: tuple[str, ...]
    weights: tuple[float, ...]
    bias: float
    means: tuple[float, ...]
    stds: tuple[float, ...]

    def z(self) -> Column:
        """The standardized linear term as a Column expression."""
        acc: Column = F.lit(float(self.bias))
        for c, w, m, s in zip(
            self.feature_cols, self.weights, self.means, self.stds
        ):
            acc = acc + F.lit(float(w)) * (
                (F.col(c).cast("double") - F.lit(float(m))) / F.lit(float(s))
            )
        return acc


def _sigmoid(z: Column) -> Column:
    # expressed via built-ins; F.exp saturates to +inf instead of
    # raising, so this is safe for any double (1/(1+inf) == 0.0)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def _sigmoid_np(z: np.ndarray) -> np.ndarray:
    """Numerically stable vectorized sigmoid: branch on sign so exp is
    only ever called on non-positive values (math.exp / np.exp on z <
    ~-745 overflows/warns; exp of a large NEGATIVE is a clean 0.0) —
    the Python-side mirror of F.exp's saturating behavior, so a
    diverging hashed-gradient run reaches the typed post-iteration
    ArithmeticError instead of dying in an executor OverflowError."""
    z = np.asarray(z, dtype=np.float64)
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def train_quality_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    iterations: int = 30,
    lr: float = 1.0,
    l2: float = 0.0,
) -> LogRegModel:
    """Fit the logistic quality classifier. ``label_col`` is 0/1 (1 =
    keep-quality, e.g. "came from the curated reference corpus").

    Deterministic up to float summation order (~1e-12 per aggregate —
    the registry's standard partial-sum caveat); weights initialize at
    zero so runs are reproducible. Raises a typed error on an empty
    corpus — a filter trained on nothing is a bug upstream, not a
    model.
    """
    if not feature_cols:
        raise ValueError("train_quality_logreg: feature_cols is empty")
    feats = [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")

    # one scan: n + per-feature non-null count/mean/std (map-side
    # combined built-ins)
    stats_row = df.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.count(c).alias(f"c{i}") for i, c in enumerate(feats)],
        *[F.avg(c).alias(f"m{i}") for i, c in enumerate(feats)],
        *[F.stddev_pop(c).alias(f"s{i}") for i, c in enumerate(feats)],
    ).collect()[0]
    if stats_row["n"] == 0:
        raise ValueError("train_quality_logreg: empty corpus")
    # NULLs break the model silently, not just loudly: avg() skips them,
    # so a NULL-bearing feature drops its rows from every gradient
    # average while n (the count) still includes them — the weights
    # would be fit against a denominator the data doesn't have. Typed
    # fail-fast naming the column; coalesce upstream to a documented
    # default if NULL genuinely means something.
    for i, name in enumerate(feature_cols):
        if stats_row[f"c{i}"] != stats_row["n"]:
            raise ValueError(
                f"train_quality_logreg: feature column {name!r} has "
                f"{stats_row['n'] - stats_row[f'c{i}']} NULL rows (of "
                f"{stats_row['n']}) — coalesce to a default upstream; "
                "NULLs would silently drop rows from the gradient "
                "averages"
            )
    means = [float(stats_row[f"m{i}"]) for i in range(len(feats))]
    stds = [
        max(float(stats_row[f"s{i}"] or 0.0), _STD_FLOOR)
        for i in range(len(feats))
    ]
    std_feats = [
        (c - F.lit(m)) / F.lit(s) for c, m, s in zip(feats, means, stds)
    ]

    w = [0.0] * len(feats)
    b = 0.0
    for _ in range(int(iterations)):
        z: Column = F.lit(b)
        for wi, xs in zip(w, std_feats):
            z = z + F.lit(wi) * xs
        resid = _sigmoid(z) - y
        # one scan: the full gradient as d+1 built-in averages
        g = df.agg(
            F.avg(resid).alias("g_b"),
            *[F.avg(resid * xs).alias(f"g{i}") for i, xs in enumerate(std_feats)],
        ).collect()[0]
        b -= lr * float(g["g_b"])
        w = [
            wi - lr * (float(g[f"g{i}"]) + l2 * wi)
            for i, wi in enumerate(w)
        ]
        if any(not math.isfinite(x) for x in w + [b]):
            raise ArithmeticError(
                "train_quality_logreg: diverged (non-finite weights) — "
                "lower lr or raise l2"
            )
    return LogRegModel(
        feature_cols=tuple(feature_cols),
        weights=tuple(w),
        bias=b,
        means=tuple(means),
        stds=tuple(stds),
    )


def score_quality(
    df: DataFrame, model: LogRegModel, out_col: str = "quality_prob"
) -> DataFrame:
    """P(keep) per row as a pure Column expression — JVM-side, no UDF."""
    return df.withColumn(out_col, _sigmoid(model.z()))


# --- hashed-text form (the documented large-d path) --------------------------
#
# The fastText-style quality classifier proper: features are a hashed
# bag of tokens (dim in the thousands), so the literal-unrolled Column
# gradient above stops scaling and the gradient moves to the
# llm/embeddings.py layout — per-partition numpy partials over
# mapInPandas, a (dim+1)-key shuffle of float sums, a driver-side
# update of a dim+1-float model that re-ships in the next iteration's
# closure (~8·dim bytes). Still one scan per iteration; still nothing
# row-sized on the driver.


def _token_hash_ids(text: str, dim: int) -> "list[int]":
    """Stable token -> bucket hashing (crc32 — Python's hash() is
    per-process salted and would unstabilize the model across runs).
    NULL text is an empty document, not the literal token 'none'
    (pandas delivers SQL NULLs as None/NaN in object series)."""
    import zlib

    if text is None or (isinstance(text, float) and math.isnan(text)):
        return []
    toks = str(text).lower().split()
    return [zlib.crc32(t.encode("utf-8")) % dim for t in toks]


def _flat_token_ids(texts: pd.Series, dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Whole-Arrow-batch tokenization: ``(flat bucket ids, tokens per
    doc)`` — the batch layout both kernels scatter over with ONE
    ``np.add.at`` instead of per-document ``np.unique`` (the round-10
    vectorization; same hashing as :func:`_token_hash_ids`, NULL/NaN →
    zero tokens). The L1-normalized hashed-count feature makes each
    token contribute ``w[bucket] / len(doc)``, so neither counts nor a
    per-doc vocabulary ever need materializing."""
    import zlib

    toks = texts.fillna("").astype(str).str.lower().str.split()
    lens = toks.str.len().to_numpy(dtype=np.int64)
    n_tok = int(lens.sum())
    flat = np.fromiter(
        (
            zlib.crc32(t.encode("utf-8")) % dim
            for doc in toks
            for t in doc
        ),
        dtype=np.int64,
        count=n_tok,
    )
    return flat, lens


@dataclass(frozen=True)
class HashedTextModel:
    """dim+1 floats + the hashing dimension; L1-normalized hashed
    token counts are the (implicit) features."""

    dim: int
    weights: tuple[float, ...]  # len == dim
    bias: float


def train_hashed_text_logreg(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    dim: int = 1024,
    iterations: int = 10,
    lr: float = 1.0,
    l2: float = 0.0,
) -> HashedTextModel:
    """Fit the hashed-bag-of-tokens logistic classifier.

    Per iteration: ONE ``mapInPandas`` scan emits each partition's
    partial gradient as at most dim+1 ``(j, g)`` rows (j = dim is the
    bias slot) regardless of row count — np.add.at scatter-adds the
    residuals into a local dense gradient, the map-side combine — then
    a dim+1-key shuffle sums partials and the driver updates the
    weights. Empty corpus raises typed (round-9 contract)."""
    if dim <= 0:
        raise ValueError("train_hashed_text_logreg: dim must be positive")
    n = df.select(F.count(F.lit(1))).collect()[0][0]
    if n == 0:
        raise ValueError("train_hashed_text_logreg: empty corpus")

    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    src = df.select(
        F.col(text_col).alias("_t"), F.col(label_col).cast("double").alias("_y")
    )
    for _ in range(int(iterations)):
        w_now, b_now = w.copy(), b

        def grad_partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            acc = np.zeros(dim + 1, dtype=np.float64)  # [dw..., db]
            seen = False
            for pdf in batches:
                if not len(pdf):
                    continue
                seen = True
                flat, lens = _flat_token_ids(pdf["_t"], dim)
                y = pdf["_y"].to_numpy(dtype=np.float64)
                doc_idx = np.repeat(np.arange(len(pdf)), lens)
                inv_len = 1.0 / np.maximum(lens, 1).astype(np.float64)
                z = np.full(len(pdf), b_now, dtype=np.float64)
                if len(flat):
                    # z_i = b + Σ_tokens w[bucket] / len_i (L1-normed x)
                    np.add.at(z, doc_idx, w_now[flat] * inv_len[doc_idx])
                resid = _sigmoid_np(z) - y  # stable: no OverflowError
                if len(flat):
                    np.add.at(acc[:dim], flat, resid[doc_idx] * inv_len[doc_idx])
                acc[dim] += float(resid.sum())
            if seen:
                nz = np.nonzero(acc)[0]
                yield pd.DataFrame({"j": nz.astype("int64"), "g": acc[nz]})

        g = (
            src.mapInPandas(grad_partial, "j LONG, g DOUBLE")
            .groupBy("j")
            .agg(F.sum("g").alias("g"))
            .collect()
        )
        full = np.zeros(dim + 1, dtype=np.float64)
        for r in g:
            full[r["j"]] = r["g"]
        full /= n
        b -= lr * full[dim]
        w -= lr * (full[:dim] + l2 * w)
        if not (np.isfinite(w).all() and math.isfinite(b)):
            raise ArithmeticError(
                "train_hashed_text_logreg: diverged — lower lr or raise l2"
            )
    return HashedTextModel(dim=dim, weights=tuple(w.tolist()), bias=b)


def score_hashed_text(
    df: DataFrame,
    model: HashedTextModel,
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """P(keep) per row. Hashed featurization is inherently kernel work,
    so scoring is one Arrow-batched pandas UDF (the weights travel in
    the closure, ~8·dim bytes per task) — unlike the engineered-feature
    form above, which scores in pure Columns. The batch vectorizes as
    one flat-token scatter (:func:`_flat_token_ids`) — no per-row
    Python loop — and the stable sigmoid saturates instead of
    overflowing on extreme scores."""
    w = np.asarray(model.weights, dtype=np.float64)
    b, dim = model.bias, model.dim

    @F.pandas_udf("double")
    def prob(texts: pd.Series) -> pd.Series:
        if not len(texts):
            return pd.Series([], dtype="float64")
        flat, lens = _flat_token_ids(texts, dim)
        doc_idx = np.repeat(np.arange(len(texts)), lens)
        inv_len = 1.0 / np.maximum(lens, 1).astype(np.float64)
        z = np.full(len(texts), b, dtype=np.float64)
        if len(flat):
            np.add.at(z, doc_idx, w[flat] * inv_len[doc_idx])
        return pd.Series(_sigmoid_np(z))

    return df.withColumn(out_col, prob(F.col(text_col)))


def filter_quality(
    df: DataFrame, model: LogRegModel, threshold: float = 0.5
) -> DataFrame:
    """Keep rows the model scores at or above ``threshold``. The
    predicate is a plain expression, so Catalyst can push it wherever
    the feature columns allow."""
    return df.where(_sigmoid(model.z()) >= F.lit(float(threshold)))

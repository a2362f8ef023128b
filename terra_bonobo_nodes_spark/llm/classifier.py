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
from dataclasses import dataclass

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
    # expressed via built-ins; numerically safe for |z| up to ~700
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


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

    # one scan: n + per-feature mean/std (map-side combined built-ins)
    stats_row = df.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.avg(c).alias(f"m{i}") for i, c in enumerate(feats)],
        *[F.stddev_pop(c).alias(f"s{i}") for i, c in enumerate(feats)],
    ).collect()[0]
    if stats_row["n"] == 0:
        raise ValueError("train_quality_logreg: empty corpus")
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


def filter_quality(
    df: DataFrame, model: LogRegModel, threshold: float = 0.5
) -> DataFrame:
    """Keep rows the model scores at or above ``threshold``. The
    predicate is a plain expression, so Catalyst can push it wherever
    the feature columns allow."""
    return df.where(_sigmoid(model.z()) >= F.lit(float(threshold)))

"""The remaining Python extension points, each exercised once.

Completes the §2.9 extension-surface matrix (SURVEY.md): scalar Arrow
kernels (geo/kernels.py), mapInPandas (similarity, convert), grouped
map (operators/grouped.py), stateful grouped map (streaming/ops.py),
foreachBatch (streaming sink) — plus, here, the GROUPED_AGG pandas UDF
(a custom aggregate that participates in groupBy/window like any
built-in) and the arrow-optimized Python UDTF (one row in, many typed
rows out, usable from SQL after registration).

Both are demonstration-grade on purpose: real pipelines should prefer
built-in expressions (the geometric mean below has a pure-expression
equivalent, asserted in pytest) — the value is the WIRING contract,
pinned by tests, for the cases that genuinely need custom Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf("double")
def geometric_mean(v: pd.Series) -> float | None:
    """GROUPED_AGG pandas UDF: exp(mean(ln x)) over positive values.
    Domain rule mirrors the expression form — ``ln`` of a NULL or
    non-positive value is NULL and ``avg`` skips NULLs — so the two
    agree on NULL/zero/negative-bearing groups (asserted in pytest).
    KNOWN divergence: a literal NaN input is indistinguishable from
    NULL through Arrow (both arrive as NaN) and is skipped here, while
    the expression form propagates it (log(NaN) = NaN). A group with
    no positive values returns NULL.
    Partial aggregation does NOT apply to grouped-agg UDFs (each
    group's values ship to one executor), so prefer the expression form
    ``exp(avg(ln(x)))`` for skewed/huge groups; this exists to pin the
    custom-UDAF wiring."""
    arr = v.dropna().to_numpy(dtype=np.float64)
    arr = arr[arr > 0.0]
    if arr.size == 0:
        return None
    return float(np.exp(np.log(arr).mean()))


def geometric_mean_expr(col: str | Column) -> Column:
    """The built-in-expression equivalent (partial-aggregatable)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.exp(F.avg(F.log(c)))


@udtf(returnType="token STRING, pos INT, n_chars INT", useArrow=True)
class TokenizeUDTF:
    """Arrow Python UDTF: explode a string into (token, position,
    length) rows — one input row, many typed output rows, callable
    from SQL as ``tokenize(col)`` after
    ``spark.udtf.register("tokenize", TokenizeUDTF)``. The built-in
    equivalent is posexplode(split(...)); the UDTF form is the
    extension contract for tokenizers that are genuinely imperative
    (real BPE merges, sentence segmenters)."""

    def eval(self, text: str):  # noqa: ANN001
        if text is None:
            return
        for i, tok in enumerate(t for t in text.split() if t):
            yield tok, i, len(tok)

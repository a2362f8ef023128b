"""Compression-ratio quality signal.

The classic repetitiveness detector (used by Gopher-era pipelines and
most crawl-curation stacks, public): highly repetitive or templated
text compresses far better than natural prose, so the deflate ratio
``compressed_bytes / raw_bytes`` is a cheap scalar that separates
boilerplate/spam from real documents — complementary to the exact
repetition ratios in :mod:`llm.text` (those count specific n-gram
repeats; this catches diffuse redundancy those miss).

Python is required (deflate is not a SQL builtin in either engine), so
the signal is ONE Arrow-batched pandas UDF column riding an otherwise
pure-Column projection — the narrow-Python-surface convention. Output
is deterministic for a fixed zlib level and library version; there is
no cross-engine SQL oracle (rows-only class), and the pytest battery
pins values against the same stdlib zlib the executors use.

100 TB shape: scan-speed projection, zero shuffles; cost is deflate
over scanned text bytes — the same budget class as the md5-per-shingle
operators, and the column composes into any existing filter scan.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compression_signal(
    df: DataFrame,
    text_col: str = "text",
    prefix: str = "zr_",
    level: int = 6,
) -> DataFrame:
    """Append ``{prefix}raw_bytes`` (UTF-8 octets), ``{prefix}comp_bytes``
    (deflate at ``level``), ``{prefix}ratio`` (comp/raw, rounded 4dp;
    1.0 for empty text — "incompressible", never a division blow-up).
    NULL text behaves as empty (the sibling-filter convention)."""
    if not 0 <= int(level) <= 9:
        raise ValueError(f"zlib level must be in [0, 9], got {level}")
    lvl = int(level)

    @F.pandas_udf("long")
    def _comp_len(s: pd.Series) -> pd.Series:
        return s.fillna("").map(
            lambda t: len(zlib.compress(t.encode("utf-8"), lvl))
        )

    c = F.coalesce(F.col(text_col), F.lit(""))
    raw = F.octet_length(c).cast("long")
    comp = _comp_len(c)
    return df.withColumns(
        {
            f"{prefix}raw_bytes": raw,
            f"{prefix}comp_bytes": comp,
            f"{prefix}ratio": F.when(
                raw > 0, F.round(comp.cast("double") / raw, 4)
            ).otherwise(F.lit(1.0)),
        }
    )

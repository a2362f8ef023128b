"""Count-Min Sketch token frequencies — bounded-memory heavy hitters.

An exact token-frequency table over a 100 TB corpus is a groupBy whose
key cardinality tracks the vocabulary (billions of keys with web
typos/code/UUIDs); a Count-Min Sketch (Cormode & Muthukrishnan 2005,
public) answers point frequency queries from ``d x w`` integer
counters — constant memory, mergeable across partitions/days by plain
addition, never undercounting:

- **build**: every token occurrence increments one counter per hash
  row (position = md5-derived hash_i(token) mod w). Distributed as
  explode-to-(row, position) + ONE count aggregate on (row, position)
  keys (bounded key space: d*w), then a bounded collect of the d*w
  counters (128 KiB at the default 4 x 4096 BIGINTs) — the
  ivf_train / bloom precedent: the sketch IS the broadcast artifact.
- **estimate**: min over the d counters addressed by the token's
  positions — a pure Column expression over d plan-literal arrays
  (zero joins, zero Python). Guarantees estimate >= true count
  (deterministically, not probabilistically); overestimate is bounded
  by ~2N/w per row with high probability.

Cross-engine contract: positions come from the md5
:func:`hashing.hash32` family and every quantity is an exact BIGINT,
so a DuckDB oracle replays build AND estimate bit-for-bit — no float
anywhere (the cleanest oracle class in the repo).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from terra_bonobo_nodes_spark.llm import hashing

_SEED = "tbns-cms-v1"


def _position(token: Column, i: int, w: int) -> Column:
    return F.pmod(
        hashing.hash32(F.concat(F.lit(f"{_SEED}-{i}-"), token)), F.lit(w)
    )


def position_sql(expr: str, i: int, w: int) -> str:
    """DuckDB fragment matching :func:`_position`."""
    seeded = f"'{_SEED}-{i}-' || {expr}"
    return f"({hashing.hash32_sql(seeded)} % {w})"


def cms_build(
    tokens: DataFrame,
    token_col: str = "token",
    d: int = 4,
    w: int = 1 << 12,
) -> list[list[int]]:
    """Build the sketch from a token-occurrence DataFrame (one row per
    occurrence). Returns ``d`` rows of ``w`` BIGINT counters. The only
    driver-side materialization is the (row, position, count) triples
    — at most ``d*w`` of them regardless of corpus size; counting runs
    distributed with map-side partial aggregation on the bounded
    (row, position) key space."""
    cells = tokens.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _position(F.col(token_col), i, w).alias("p"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("c")
    )
    rows = (
        cells.groupBy("c.i", "c.p")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    counters = [[0] * w for _ in range(d)]
    for r in rows:
        counters[r["i"]][r["p"]] = r["n"]
    return counters


def cms_estimate(
    token: Column | str, counters: list[list[int]]
) -> Column:
    """Point-frequency estimate: min over the d counters addressed by
    the token — a pure Column expression over plan-literal arrays
    (1-based element_at). estimate >= true count always."""
    c = F.col(token) if isinstance(token, str) else token
    d, w = len(counters), len(counters[0])
    ests = [
        F.element_at(F.lit(counters[i]), _position(c, i, w).cast("int") + 1)
        for i in range(d)
    ]
    return F.least(*ests)

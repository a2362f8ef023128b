"""Distributed Lloyd's k-means with a bit-exact cross-engine oracle —
the iterative clustering step the curation pipeline previously only
PINNED (llm/semdedup.py runs the full SemDeDup body but takes its
codebook from a seam; llm/similarity.ivf_train clusters a bounded
sample driver-side). This module runs the real thing distributed: every
iteration's assignment scan and centroid update execute as Spark jobs
over the full corpus, and the whole run is reproducible to the bit on
any engine or partitioning.

Determinism design — FIXED-POINT INTEGER ARITHMETIC (the
:mod:`llm.graph` PageRank trick, applied to geometry):

- Quantization is EXACT, not just deterministic: components multiply by
  ``2**shift`` (an exponent shift in IEEE arithmetic — NO rounding
  occurs for any finite float) before ``floor``, so Spark, DuckDB and
  Python all see identical BIGINT coordinates from the same floats.
- Distances are integer sums of squares; centroid updates are
  per-dimension ``sum div count`` floor divisions. No float addition
  anywhere, so partitioning/aggregation order cannot change results.
- Ties break deterministically: argmin by ``(dist, cluster)``; init is
  the quantized vectors of the ``k`` smallest ids (first-k init — a
  fixed, engine-independent choice; swap in better seeds by passing
  ``init`` explicitly).
- Fixed ``iterations`` count, no convergence test (a data-dependent
  stopping rule would reintroduce tolerance). Empty clusters die (the
  standard Lloyd simplification), identically on both engines.

The grid step ``2**-shift`` (default ``2**-16 ~ 1.5e-5``) is far below
any meaningful embedding-space distance, so fixed-point assignments
match float Lloyd's except for points near-equidistant at that scale —
and those are exactly the assignments float k-means cannot reproduce
across engines either.

100 TB shape: per iteration, ONE broadcast cross join against the
k-row centroid frame (the canonical k-means assignment shape — a
k-row BroadcastNestedLoopJoin, the justified-by-construction kind) +
one combinable min-struct groupBy per vector (map-side partial), one
id-keyed join to recover coordinates, and one (cluster, dim)-keyed sum
groupBy for the update — k*d cells, tiny. Centroid frames are k rows,
localCheckpointed per iteration (the pointer-jumping convention); no
driver-side collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SHIFT = 16


def quantize_vec(col, shift: int = DEFAULT_SHIFT):
    """array<float> -> array<bigint> on the exact 2**-shift grid."""
    return F.transform(
        col, lambda v: F.floor(v.cast("double") * F.lit(float(2**shift))).cast("long")
    )


def _sqdist(x, c):
    """Integer squared euclidean distance of two array<bigint>."""
    return F.aggregate(
        F.zip_with(x, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def kmeans_fixed(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iterations: int = 3,
    shift: int = DEFAULT_SHIFT,
    init: DataFrame | None = None,
) -> DataFrame:
    """(id, cluster, dist) after ``iterations`` exact fixed-point Lloyd
    rounds over the full corpus; ``dist`` is the integer squared
    distance to the winning centroid on the quantized grid. ``init``
    optionally supplies a (cluster, c: array<bigint>) frame; default is
    first-k-by-id. NULL vectors are dropped (no coordinates to
    cluster); callers wanting them surfaced should flag upstream.
    Vectors must share one dimensionality — zip_with pads a shorter
    array with NULLs, which would propagate NULL distances; validate
    ragged corpora upstream."""
    if int(iterations) < 1:
        raise ValueError("kmeans_fixed needs iterations >= 1")
    q = _quantized(df, vec_col, id_col, shift)
    cents = _train(q, k, iterations, init)
    return _assign(q, cents).select(
        F.col("_id").alias(id_col),
        F.col("_cl").cast("long").alias("cluster"),
        F.col("_d").alias("dist"),
    )


def kmeans_fixed_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iterations: int = 3,
    shift: int = DEFAULT_SHIFT,
    init: DataFrame | None = None,
) -> DataFrame:
    """(cluster, c: array<bigint>) — the trained codebook, i.e. the
    centroids :func:`kmeans_fixed`'s FINAL assignment pass uses (the
    init after ``iterations - 1`` update rounds). Collect these k rows
    and hand them to :func:`assign_fixed_expr` to score new vectors —
    including over a readStream, where the literal form is a stateless
    projection (the cms_estimate precedent: train distributed, serve
    as a plan literal)."""
    if int(iterations) < 1:
        raise ValueError("kmeans_fixed_centroids needs iterations >= 1")
    q = _quantized(df, vec_col, id_col, shift)
    return _train(q, k, iterations, init).select(
        F.col("_cl").cast("long").alias("cluster"), F.col("_c").alias("c")
    )


def _quantized(df: DataFrame, vec_col: str, id_col: str, shift: int) -> DataFrame:
    return df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("_id"), quantize_vec(F.col(vec_col), shift).alias("_x")
    ).localCheckpoint(eager=False)


def _assign(q: DataFrame, cents: DataFrame) -> DataFrame:
    scored = q.crossJoin(F.broadcast(cents)).select(
        "_id", "_cl", _sqdist(F.col("_x"), F.col("_c")).alias("_d")
    )
    return (
        scored.groupBy("_id")
        .agg(F.min(F.struct("_d", "_cl")).alias("_w"))
        .select("_id", F.col("_w._cl").alias("_cl"), F.col("_w._d").alias("_d"))
    ).localCheckpoint(eager=False)


def _train(q: DataFrame, k: int, iterations: int, init: DataFrame | None) -> DataFrame:
    """The centroid frame after ``iterations - 1`` assign+update
    rounds from the init (first-k-by-id unless given)."""
    if init is None:
        cents = (
            q.orderBy("_id")
            .limit(int(k))
            .select(
                (F.row_number().over(_w_by_id()) - 1).alias("_cl"),
                F.col("_x").alias("_c"),
            )
        )
    else:
        cents = init.select(F.col("cluster").alias("_cl"), F.col("c").alias("_c"))
    cents = cents.localCheckpoint(eager=False)
    for _ in range(int(iterations) - 1):
        assigned = _assign(q, cents)
        dims = (
            assigned.join(q, "_id")
            .select("_cl", F.posexplode("_x").alias("_dim", "_v"))
            .groupBy("_cl", "_dim")
            .agg(F.sum("_v").alias("_s"), F.count(F.lit(1)).alias("_n"))
        )
        cents = (
            dims.groupBy("_cl")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_dim", F.expr("_s div _n").alias("_q")))
                    ),
                    lambda s: s["_q"],
                ).alias("_c")
            )
        ).localCheckpoint(eager=False)
    return cents


def assign_fixed_expr(
    vec_col,
    centroids: dict[int, list[int]] | list[list[int]],
    shift: int = DEFAULT_SHIFT,
):
    """struct(cluster, dist) Column scoring a float vector against a
    LITERAL quantized codebook — ``{row["cluster"]: row["c"] for row
    in kmeans_fixed_centroids(...).collect()}`` (k*d ints,
    driver-sized by construction; a plain list means cluster id =
    index). Pure projection: zero state, zero shuffle, so it runs
    unchanged over a readStream (pinned batch==stream by
    tests/test_kmeans.py). Ties break to the lower cluster id via
    struct ordering, matching the distributed argmin exactly. NULL
    vectors score NULL."""
    if not centroids:
        raise ValueError("assign_fixed_expr needs a non-empty codebook")
    items = sorted(
        centroids.items() if isinstance(centroids, dict) else enumerate(centroids)
    )
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    x = quantize_vec(vec, shift)
    entries = [
        F.struct(
            _sqdist(x, F.array(*[F.lit(int(v)).cast("long") for v in c])).alias(
                "dist"
            ),
            F.lit(int(cl)).cast("long").alias("cluster"),
        )
        for cl, c in items
    ]
    best = F.array_min(F.array(*entries))
    return F.struct(best["cluster"].alias("cluster"), best["dist"].alias("dist"))


def _w_by_id():
    from pyspark.sql import Window

    return Window.orderBy("_id")


def kmeans_fixed_ctes(
    vecs_sql: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iterations: int = 3,
    dim: int = 64,
    shift: int = DEFAULT_SHIFT,
    prefix: str = "",
) -> str:
    """The CTE chain of :func:`kmeans_fixed_sql` WITHOUT the leading
    ``WITH`` or trailing SELECT, for composition into larger oracles
    (the semdedup end-to-end row): defines ``{prefix}q`` (quantized
    vectors, columns id/x) through ``{prefix}a{iterations}`` (final
    assignment, columns id/cl/d). ``prefix`` (the pagerank_fixed_ctes
    precedent) namespaces the chain so several trainings — e.g. one
    per PQ subspace — compose into one oracle."""
    scale = float(2**shift)
    p = prefix
    d2 = " + ".join(
        f"(a.x[{i}] - c.c[{i}]) * (a.x[{i}] - c.c[{i}])" for i in range(1, dim + 1)
    )
    parts = [
        f"""{p}q AS (
  SELECT {id_col} AS id,
         list_transform({vec_col},
                        v -> CAST(floor(CAST(v AS DOUBLE) * {scale}) AS BIGINT)) AS x
  FROM ({vecs_sql}) WHERE {vec_col} IS NOT NULL
), {p}c0 AS (
  SELECT row_number() OVER (ORDER BY id) - 1 AS cl, x AS c
  FROM (SELECT id, x FROM {p}q ORDER BY id LIMIT {k})
)"""
    ]
    for i in range(1, int(iterations) + 1):
        prev = f"{p}c{i - 1}"
        parts.append(
            f""", {p}s{i} AS (
  SELECT a.id, c.cl, {d2} AS d
  FROM {p}q a CROSS JOIN {prev} c
), {p}a{i} AS (
  SELECT id, cl, d FROM (
    SELECT id, cl, d,
           row_number() OVER (PARTITION BY id ORDER BY d, cl) AS rn
    FROM {p}s{i}) WHERE rn = 1
)"""
        )
        if i == int(iterations):
            break
        parts.append(
            f""", {p}u{i} AS (
  SELECT a.cl, dim, sum(v) AS s, count(*) AS n
  FROM (SELECT {p}a{i}.cl, unnest({p}q.x) AS v,
               unnest(range(1, {dim} + 1)) AS dim
        FROM {p}a{i} JOIN {p}q USING (id)) a
  GROUP BY a.cl, dim
), {p}c{i} AS (
  SELECT cl, list(s // n ORDER BY dim) AS c
  FROM {p}u{i} GROUP BY cl
)"""
        )
    return "".join(parts)


def kmeans_fixed_sql(
    vecs_sql: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iterations: int = 3,
    dim: int = 64,
    shift: int = DEFAULT_SHIFT,
) -> str:
    """DuckDB restatement of :func:`kmeans_fixed` (first-k init): the
    same iterations unrolled as a CTE chain. ``dim`` must match the
    embedding dimensionality (the distance sum is unrolled literally).
    Centroid sums CAN be negative; verified: DuckDB ``//`` and Spark
    ``div`` BOTH truncate toward zero on integers (-7 -> -3), so the
    update divisions mirror exactly with no sign handling."""
    ctes = kmeans_fixed_ctes(vecs_sql, vec_col, id_col, k, iterations, dim, shift)
    return (
        f"WITH {ctes}\n"
        f"SELECT id AS {id_col}, CAST(cl AS BIGINT) AS cluster, "
        f"CAST(d AS BIGINT) AS dist\nFROM a{int(iterations)}"
    )

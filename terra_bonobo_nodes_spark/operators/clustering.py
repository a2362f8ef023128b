"""Grid clustering + per-cluster collect/sum aggregation.

Capability parity:
- ``LayerClusters`` (reference ``terra_bonobo_nodes/terra.py:27-68``):
  PostGIS ``GROUP BY ST_SnapToGrid(ST_Transform(geom, srid), distance)``
  with ``array_agg(id)`` per cell. Here the snap-to-grid key is computed
  as ``(floor(x/d), floor(y/d))`` Column expressions — one hash-aggregate
  job, no per-cluster round trips.
- ``CollectAndSum`` (reference ``terra_bonobo_nodes/common.py:235-266``):
  per-cluster ``Collect(geom)``, ``ArrayAgg(id, distinct)``, ``Count(id)``
  and per-field ``Sum(cast(properties->>f as float))``. The reference runs
  one SQL query *per cluster* (an N+1); here it is a single
  ``groupBy().agg()`` with map-side partial aggregation.

Scale notes (100 TB): the only shuffle is the hash aggregation on the
cell key. Cell keys are low-cardinality relative to rows, so partial
aggregation collapses almost all data map-side before the exchange. If a
cell is pathologically hot, AQE skew handling or salting the cell key
(``cell_salt = pmod(hash(id), k)`` pre-agg, then a second agg) applies —
``collect_and_sum``'s aggregates (count/sum/collect_set) are all
re-aggregable. Avoid ``collect_set(id)`` at extreme cardinality; prefer
``count_distinct`` or a sketch (``approx_count_distinct``).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grid_cluster(
    df: DataFrame,
    x: str | Column,
    y: str | Column,
    distance: float,
    cell_x: str = "cell_x",
    cell_y: str = "cell_y",
) -> DataFrame:
    """Attach snap-to-grid cell keys: ``cell = floor(coord / distance)``.

    Equivalent to PostGIS ``ST_SnapToGrid(geom, distance)`` as a grouping
    key (reference ``terra.py:54-64``) — the snapped corner is
    ``cell * distance``, kept as integral cell indices so the key is
    exact (no float-equality grouping hazards).
    """
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    return df.withColumn(cell_x, F.floor(xc / F.lit(distance)).cast("long")).withColumn(
        cell_y, F.floor(yc / F.lit(distance)).cast("long")
    )


def collect_and_sum(
    df: DataFrame,
    cluster_cols: Sequence[str],
    id_col: str,
    sum_fields: Mapping[str, str] | Sequence[str] = (),
    collect_ids: bool = False,
    exact: bool = True,
) -> DataFrame:
    """Per-cluster aggregate: count, distinct-id count, per-field sums.

    ``sum_fields`` maps source column -> output alias (or a sequence, in
    which case the alias is ``sum_<col>``). Sums cast to double first,
    mirroring the reference's ``Cast(KeyTextTransform(...), FloatField)``
    (``common.py:257-263``).

    ``collect_ids=True`` adds ``ids = sort_array(collect_set(id))`` —
    the reference's ``ArrayAgg(id, distinct=True)`` (``common.py:254``),
    sorted so output is deterministic. Off by default: at 100 TB an
    unbounded per-group array is a driver/executor OOM risk; prefer the
    distinct count unless the array is genuinely needed.

    ``exact=True`` (default) accumulates sums as DECIMAL(20,6) and casts
    the result back to double: bit-deterministic regardless of partial-
    aggregation order, at ~no cost (decimal sums are JVM long math).
    """
    if not isinstance(sum_fields, Mapping):
        sum_fields = {c: f"sum_{c}" for c in sum_fields}
    aggs = [
        F.count(F.lit(1)).alias("point_count"),
        F.countDistinct(F.col(id_col)).alias("n_ids"),
    ]
    if collect_ids:
        aggs.append(F.sort_array(F.collect_set(F.col(id_col))).alias("ids"))
    for c, alias in sum_fields.items():
        if exact:
            aggs.append(
                F.sum(F.col(c).cast("decimal(20,6)")).cast("double").alias(alias)
            )
        else:
            aggs.append(F.sum(F.col(c).cast("double")).alias(alias))
    return df.groupBy(*[F.col(c) for c in cluster_cols]).agg(*aggs)


def morton_code(x: Column, y: Column, bits: int = 16) -> Column:
    """Z-order (Morton) code of two NON-NEGATIVE integer cell
    coordinates: bit i of x lands at z-bit 2i, bit i of y at 2i+1.
    Unrolled into ``bits`` shift/mask terms — pure codegen arithmetic,
    identical to the plain integer-arithmetic form a SQL oracle uses.

    Coordinates outside [0, 2**bits) would silently ALIAS to colliding
    codes (distant cells landing in the same row groups — exactly the
    locality failure z-ordering exists to prevent), so the expression
    fails fast per row instead, matching the engine's other guards
    (knn_join cartesian, brute_force_topk cap)."""
    xl, yl = x.cast("long"), y.cast("long")
    lim = F.lit(1 << bits).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xl, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(yl, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    ok = (xl >= 0) & (xl < lim) & (yl >= 0) & (yl < lim)
    return F.when(ok, z).otherwise(
        F.raise_error(
            F.format_string(
                f"morton_code: coordinate out of [0, {1 << bits}) for "
                f"bits={bits}: x=%s y=%s",
                xl,
                yl,
            )
        )
    )


def zorder_layout(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 16,
    n_partitions: int = 32,
    z_col: str = "z",
) -> DataFrame:
    """Arrange rows in Z-order: compute the Morton code, range-partition
    on it, sort within each partition. Written as parquet, nearby cells
    land in the same row groups, so a spatial bbox predicate prunes by
    min/max statistics instead of scanning — the poor man's spatial
    index at 100 TB (the engine-side analogue of the reference's
    reliance on PostGIS GiST, SURVEY §2 spatial-indexing row). One
    range exchange (sampled boundaries) + local sort; no global sort."""
    out = df.withColumn(z_col, morton_code(x, y, bits))
    return out.repartitionByRange(n_partitions, z_col).sortWithinPartitions(z_col)

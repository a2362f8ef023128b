"""r18 kernel-fusion equivalence: the vectorized/fused kernels must be
BYTE- and VALUE-identical to the per-row chains they replace.

Each test drives the fused kernel and its unfused reference chain over
the same frame (edge cases included: NULLs, NaNs, unclosed rings,
consecutive duplicates, degenerate rings, mismatched array lengths)
and asserts exact equality — the correctness contract that lets the
spatial queries route through the fused forms without a hash drift.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from terra_bonobo_nodes_spark.geo import kernels as K


@pytest.fixture(scope="module")
def spark():
    from terra_bonobo_nodes_spark.session import get_spark

    return get_spark("test-kernel-fusion")


def _ring_frame(spark):
    """Rings exercising every fast-path class and every fallback."""
    rows = [
        # axis rect, unclosed (the _customer_rects shape)
        ([0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 3.0, 3.0]),
        # axis rect, pre-closed
        ([1.0, 2.0, 2.0, 1.0, 1.0], [1.0, 1.0, 5.0, 5.0, 1.0]),
        # concave L (the _customer_ells shape)
        ([0.0, 4.0, 4.0, 2.0, 2.0, 0.0], [0.0, 0.0, 2.0, 2.0, 4.0, 4.0]),
        # non-axis triangle
        ([0.0, 3.0, 1.0], [0.0, 0.5, 2.0]),
        # 5-point ring that is NOT a rect (3 distinct xs)
        ([0.0, 2.0, 3.0, 0.0], [0.0, 0.0, 2.0, 2.0]),
        # bowtie-ish 5-pointer (diagonal side -> not boxy)
        ([0.0, 2.0, 0.0, 2.0], [0.0, 0.0, 2.0, 2.0]),
        # consecutive duplicate vertex (make_valid drops it) -> fallback
        ([0.0, 0.0, 4.0, 4.0, 0.0], [0.0, 0.0, 0.0, 3.0, 3.0]),
        # near-duplicate closure within EPS -> fallback
        ([0.0, 4.0, 4.0, 1e-13], [0.0, 0.0, 3.0, 0.0]),
        # degenerate: fewer than 3 points -> POINT EMPTY
        ([0.0, 1.0], [0.0, 0.0]),
        # mismatched lengths -> zip truncation semantics
        ([0.0, 4.0, 4.0, 0.0, 0.0], [0.0, 0.0, 3.0]),
        # NaN coordinate -> fallback parity
        ([0.0, float("nan"), 4.0], [0.0, 0.0, 3.0]),
        # NULL arrays
        (None, [0.0, 1.0, 2.0]),
        ([0.0, 1.0, 2.0], None),
        # collapsed ring (all duplicates) -> POINT EMPTY via fix_ring
        ([1.0, 1.0, 1.0, 1.0], [2.0, 2.0, 2.0, 2.0]),
    ]
    return spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(rows)],
        "id int, xs array<double>, ys array<double>",
    )


def test_poly_prep_matches_prepare_of_make_polygon(spark):
    df = _ring_frame(spark)
    fused = df.select("id", K.st_poly_prep("xs", "ys").alias("p")).collect()
    chain = df.select(
        "id", K.st_prepare(K.st_make_polygon("xs", "ys")).alias("p")
    ).collect()
    assert len(fused) == len(chain)
    for a, b in zip(
        sorted(fused, key=lambda r: r.id), sorted(chain, key=lambda r: r.id)
    ):
        assert a.p.geom == b.p.geom, f"geom mismatch at id={a.id}"
        assert a.p.bbox == b.p.bbox, f"bbox mismatch at id={a.id}"
        assert a.p.boxy == b.p.boxy, f"boxy mismatch at id={a.id}"
        assert a.p.area == b.p.area, f"area mismatch at id={a.id}"


def test_vectorized_point_matches_per_row_wkb(spark):
    from terra_bonobo_nodes_spark.geo import wkb as W

    df = spark.createDataFrame(
        [
            (0, 3.5, -4.5),
            (1, None, 2.0),
            (2, 1.0, None),
            (3, float("nan"), 1.0),
            (4, -180.0, 85.0),
            (5, 0.0, 0.0),
        ],
        "id int, x double, y double",
    )
    got = {r.id: r.g for r in df.select("id", K.st_point("x", "y").alias("g")).collect()}
    for r in df.collect():
        bad = (
            r.x is None
            or r.y is None
            or (isinstance(r.x, float) and math.isnan(r.x))
            or (isinstance(r.y, float) and math.isnan(r.y))
        )
        want = W.write_wkb(
            W.POINT_EMPTY if bad else ("Point", (float(r.x), float(r.y)))
        )
        assert bytes(got[r.id]) == want, f"point WKB mismatch at id={r.id}"


def test_st_xy_matches_st_x_st_y(spark):
    df = spark.createDataFrame(
        [(0, 3.5, -4.5), (1, None, 2.0), (2, 7.25, 0.0)],
        "id int, x double, y double",
    ).withColumn("g", K.st_point("x", "y"))
    # also a non-point geometry: st_xy must yield nulls like st_x/st_y
    poly = spark.createDataFrame(
        [(99, [0.0, 1.0, 1.0], [0.0, 0.0, 1.0])],
        "id int, xs array<double>, ys array<double>",
    ).select("id", K.st_make_polygon("xs", "ys").alias("g"))
    both = df.select("id", "g").unionByName(poly)
    fused = {
        r.id: (r.p.x, r.p.y)
        for r in both.select("id", K.st_xy("g").alias("p")).collect()
    }
    chain = {
        r.id: (r.x, r.y)
        for r in both.select(
            "id", K.st_x("g").alias("x"), K.st_y("g").alias("y")
        ).collect()
    }
    assert fused == chain


def test_simplify_summary_matches_chain(spark):
    wkts = [
        "LINESTRING (0 0, 5 0.4, 10 -0.4, 15 0.4, 20 0)",
        "LINESTRING (0 0, 10 10)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
        "POINT (3 4)",
        None,
    ]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(wkts)], "id int, wkt string"
    ).withColumn("g", K.st_geomfromtext("wkt"))
    fused = {
        r.id: (r.s.n_points, r.s.cx, r.s.cy)
        for r in df.select(
            "id", K.st_simplify_summary("g", 0.5).alias("s")
        ).collect()
    }
    simp = df.withColumn("s", K.st_simplify("g", 0.5))
    chain = {
        r.id: (r.n, r.cx, r.cy)
        for r in simp.select(
            "id",
            K.st_npoints("s").alias("n"),
            K.st_x(K.st_centroid("s")).alias("cx"),
            K.st_y(K.st_centroid("s")).alias("cy"),
        ).collect()
    }
    assert fused == chain


def test_subdivide_areas_matches_chain(spark):
    import math as _m

    # a 12-gon (the g8 fixture shape) plus a simple square and a NULL
    ring_x = [3.0 * _m.cos(2 * _m.pi * k / 12) for k in range(12)]
    ring_y = [3.0 * _m.sin(2 * _m.pi * k / 12) for k in range(12)]
    df = spark.createDataFrame(
        [(0, ring_x, ring_y), (1, [0.0, 8.0, 8.0, 0.0], [0.0, 0.0, 8.0, 8.0])],
        "id int, xs array<double>, ys array<double>",
    ).select("id", K.st_make_polygon("xs", "ys").alias("g"))
    fused = (
        df.select("id", F.posexplode(K.st_subdivide_areas("g", 8)).alias("p", "a"))
        .collect()
    )
    chain = (
        df.select(
            "id",
            F.posexplode(K.st_subdivide(K.st_makevalid("g"), 8)).alias("p", "part"),
        )
        .select("id", "p", K.st_area("part").alias("a"))
        .collect()
    )
    key = lambda r: (r.id, r.p)  # noqa: E731
    assert sorted((r.id, r.p, r.a) for r in fused) == sorted(
        (r.id, r.p, r.a) for r in chain
    )

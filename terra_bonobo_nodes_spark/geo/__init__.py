"""Geometry kernel: WKB columns + pure-Python computational geometry.

The environment has no shapely/GEOS and no JVM spatial package, so the
engine carries its own kernel:

- ``wkb``     : WKB/WKT/GeoJSON parse + write (ISO WKB, 2D/Z)
- ``ops``     : area, centroid, distance, intersects, convex clipping,
                Douglas-Peucker simplify, web-mercator transform, grid
                snap, subdivision
- ``kernels`` : Arrow-batched pandas UDFs exposing the ops as ST-style
                column functions (``st_point``, ``st_area``, ...)

Column convention: geometry is a ``BinaryType`` column holding ISO WKB,
CRS EPSG:4326 unless produced by ``st_transform``. ``POINT EMPTY`` is
encoded as NaN coordinates (the PostGIS convention); other empties have
zero elements. A later swap to Apache Sedona is mechanical: the ST names
match, and the WKB convention is what ``ST_GeomFromWKB`` expects.

Supported exactly: points, multipoints, linestrings, polygons with
holes, multipolygons, collections; polygon-polygon intersection when at
least one side is convex (covers grid-tile clipping — the reference's
spatial-join workloads); polygon difference when one operand contains
the other (ring-hole construction). Documented as NotImplemented:
general concave-concave overlay (needs a full Greiner-Hormann; the
scale path is Sedona).
"""

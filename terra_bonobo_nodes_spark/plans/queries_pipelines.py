"""Correctness queries: the reference's documented END-TO-END pipelines
(SURVEY.md §3 entry points), recomposed as single Spark plans.

The reference's users wire these node chains as Bonobo graphs; here the
same chain is DataFrame composition, so each pipeline is ONE Catalyst
plan — parse, transform, spatial work, upsert, retention fuse into a
job with no per-stage materialization. These queries are the "a user of
the reference could run every pipeline they run today" proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terra_bonobo_nodes_spark.geo import kernels as K
from terra_bonobo_nodes_spark.operators.clustering import collect_and_sum, grid_cluster
from terra_bonobo_nodes_spark.operators.records import (
    exclude_attributes,
    identifier_from_property,
)
from terra_bonobo_nodes_spark.operators.spatial import attributes_to_point_geometry
from terra_bonobo_nodes_spark.operators.stateful import (
    clean_older_than,
    upsert_last_writer_wins,
)
from terra_bonobo_nodes_spark.plans.registry import register
from terra_bonobo_nodes_spark.sources.csv import csv_documents_to_rows
from terra_bonobo_nodes_spark.tables import load_table


@register(
    "pipeline_file_import",
    oracle="""
WITH raw AS (
  SELECT CAST(event_id AS VARCHAR) AS identifier,
         ((value % 360) - 180) AS px, ((value % 170) - 85) AS py,
         event_type, ts
  FROM events
  WHERE event_type <> 'view'
),
latest AS (
  SELECT *, row_number() OVER (
    PARTITION BY identifier ORDER BY ts DESC, event_type ASC) AS rn
  FROM raw
)
SELECT identifier, event_type, round(px, 6) AS gx, round(py, 6) AS gy
FROM latest
WHERE rn = 1 AND ts >= TIMESTAMP '2024-01-08 00:00:00'
""",
    headline=True,
    tags=("pipeline", "S1", "P1", "G2", "K1", "K5"),
)
def pipeline_file_import(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §3 entry point 1 — the file-import pipeline:

    CsvDictReader → IdentifierFromProperty → filter →
    AttributesToPointGeometry → LoadFeatureInLayer (upsert) →
    CleanOlderThan (retention)

    built from events re-serialized as CSV documents (one per
    event_type, the reference's file-per-source shape). All-string CSV
    values exercise the cast path of the point builder; the upsert
    dedupes by identifier with explicit recency; retention drops the
    first week.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "ts",
        ((F.col("value") % 360) - 180).alias("px"),
        ((F.col("value") % 170) - 85).alias("py"),
    )
    line = F.concat_ws(
        ",",
        F.col("event_id").cast("string"),
        F.col("event_type"),
        F.col("px").cast("string"),
        F.col("py").cast("string"),
        F.col("ts").cast("string"),
    )
    docs = ev.withColumn("_l", line).groupBy("event_type").agg(
        F.concat_ws(
            "\n",
            F.lit("event_id,event_type,px,py,ts"),
            F.concat_ws("\n", F.sort_array(F.collect_list("_l"))),
        ).alias("content")
    )
    rows = csv_documents_to_rows(
        docs.select("content"),
        "content",
        header=["event_id", "event_type", "px", "py", "ts"],
    )
    keyed = identifier_from_property(rows, "event_id")
    filtered = keyed.where(F.col("event_type") != "view")
    with_geom = attributes_to_point_geometry(filtered, "px", "py")
    upserted = upsert_last_writer_wins(
        with_geom,
        key=["identifier"],
        order_by=[F.col("ts").cast("timestamp").desc(), F.col("event_type").asc()],
    )
    retained = clean_older_than(
        upserted.withColumn("_ts", F.col("ts").cast("timestamp")),
        "_ts",
        "2024-01-08 00:00:00",
    )
    # fused coordinate read-back (r18): st_x + st_y share one parse
    xy = K.st_xy("geom")
    return retained.select(
        "identifier",
        "event_type",
        F.round(xy["x"], 6).alias("gx"),
        F.round(xy["y"], 6).alias("gy"),
    )


@register(
    "pipeline_es_indexing",
    oracle="""
SELECT CAST(c_custkey AS VARCHAR) AS _id, CAST(c_custkey AS VARCHAR) AS _feature_id,
       c_name, c_mktsegment,
       round(((c_acctbal % 100.0)), 6) AS gx,
       round(CAST(c_custkey % 100 AS DOUBLE), 6) AS gy
FROM customer WHERE c_acctbal > 0
""",
    tags=("pipeline", "S4", "P3", "G3", "K2"),
)
def pipeline_es_indexing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §3 entry point 2 — the ES indexing pipeline:

    ExtractFeatures → ExcludeAttributes → GeometryToJson → LoadInES →
    (scan back). Features come from customer with synthesized point
    geometry; the excluded attribute never reaches the index; the
    geometry round-trips through GeoJSON (GeometryToJson) before
    indexing, and the readback recovers coordinates from the JSON.
    """
    import hashlib
    import tempfile

    from terra_bonobo_nodes_spark.operators.spatial import geometry_to_json
    from terra_bonobo_nodes_spark.sinks.es import es_extract, load_in_es

    cust = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 0)
    feats = cust.select(
        F.col("c_custkey").alias("identifier"),
        "c_name",
        "c_mktsegment",
        "c_nationkey",
        K.st_point(
            F.col("c_acctbal") % 100.0,
            (F.col("c_custkey") % 100).cast("double"),
        ).alias("geom"),
    )
    pruned = exclude_attributes(feats, ["c_nationkey"])
    as_json = geometry_to_json(pruned, "geom", out="geojson").drop("geom")
    tag = hashlib.md5(f"{sf_dir}-pipe2".encode()).hexdigest()[:8]
    root = f"{tempfile.gettempdir()}/tbns_es_{tag}"
    load_in_es(as_json, root, "features")
    docs = es_extract(spark, root, "features")
    coords = F.from_json(
        F.col("geojson"), "struct<type:string,coordinates:array<double>>"
    )["coordinates"]
    return docs.select(
        "_id",
        "_feature_id",
        "c_name",
        "c_mktsegment",
        F.round(F.element_at(coords, 1), 6).alias("gx"),
        F.round(F.element_at(coords, 2), 6).alias("gy"),
    )


@register(
    "pipeline_osm_clusters",
    oracle="""
WITH pts AS (
  SELECT event_id,
         ((value % 360) - 180) AS x, ((value % 170) - 85) AS y, value
  FROM events
),
cells AS (
  SELECT CAST(floor(x / 20.0) AS BIGINT) AS cell_x,
         CAST(floor(y / 20.0) AS BIGINT) AS cell_y,
         count(*) AS point_count,
         count(DISTINCT event_id) AS n_ids,
         CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sum_value
  FROM pts GROUP BY 1, 2
)
SELECT concat(CAST(cell_x AS VARCHAR), ':', CAST(cell_y AS VARCHAR)) AS identifier,
       point_count, n_ids, sum_value,
       CAST(point_count AS DOUBLE) / sum(point_count) OVER () AS density
FROM cells
""",
    tags=("pipeline", "A4", "A1", "P6", "K1"),
)
def pipeline_osm_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §3 entry point 3 — the OSM cluster pipeline's analytical
    half: LayerClusters → CollectAndSum → MapProperties →
    LoadFeatureInLayer. One job replaces the reference's PostGIS
    GROUP BY plus its per-cluster N+1 aggregate round-trips; the
    MapProperties step derives a density share over the whole layer
    (a window over the aggregate)."""
    pts = load_table(spark, sf_dir, "events").select(
        "event_id",
        "value",
        ((F.col("value") % 360) - 180).alias("x"),
        ((F.col("value") % 170) - 85).alias("y"),
    )
    clustered = grid_cluster(pts, "x", "y", 20.0)
    cells = collect_and_sum(
        clustered, ["cell_x", "cell_y"], "event_id", {"value": "sum_value"}
    )
    from pyspark.sql import Window

    total = F.sum("point_count").over(Window.partitionBy())
    return cells.select(
        F.concat_ws(":", "cell_x", "cell_y").alias("identifier"),
        "point_count",
        "n_ids",
        "sum_value",
        (F.col("point_count").cast("double") / total).alias("density"),
    )

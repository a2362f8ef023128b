"""Shared distributed document-conversion plumbing for the ogr2ogr
sources (E4 ``osm_xml_to_geojson``, E5 ``zip_shapefile_to_geojson``).

The reference shells out once per document on a single node
(``osm.py:66-83``, ``shapefile.py:24-37``). The Spark-native shape of
"run a subprocess over every document" is ``mapInPandas``: each
executor core converts the documents of its partitions locally, so a
many-file ingest (thousands of OSM extracts / zipped shapefiles)
parallelizes across the cluster and NOTHING is materialized on the
driver. The injected ``runner`` travels to executors via cloudpickle —
the same injection seam the driver-side path and the reference's
mocked ``subprocess.run`` use.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

Runner = Callable[[list[str], bytes], bytes]


def convert_documents(
    df: DataFrame,
    payload_col: str,
    cmd: list[str],
    runner: Runner,
    *,
    distributed: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """Run ``runner(cmd, payload) -> geojson_bytes`` over every document.

    ``distributed=True`` (default, the many-file scale path): payloads
    stay on executors; ``mapInPandas`` invokes the runner per document
    inside each Arrow batch. ``partitions`` optionally repartitions
    first so a directory of large extracts spreads over all cores
    instead of clumping in the source file-split layout.

    ``distributed=False``: the single-extract convenience path (one
    Overpass response) — converts on the driver without spinning up a
    job, same rows out.
    """
    src = df.select(payload_col)
    if not distributed:
        rows = src.collect()
        docs = [(runner(cmd, _as_bytes(r[0])).decode(),) for r in rows]
        return df.sparkSession.createDataFrame(docs, "content STRING")

    if partitions:
        src = src.repartition(partitions)

    def convert(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            col = pdf[payload_col]
            yield pd.DataFrame(
                {"content": [runner(cmd, _as_bytes(p)).decode() for p in col]}
            )

    return src.mapInPandas(convert, "content string")


def _as_bytes(payload) -> bytes:
    if isinstance(payload, (bytes, bytearray)):
        return bytes(payload)
    return str(payload).encode()

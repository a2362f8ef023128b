"""Document-index sink stand-ins (``elasticsearch.py``, SURVEY §2.2).

The reference bulk-indexes into Elasticsearch. Without an ES cluster (or
its Spark connector jars) in this environment, the same contract is
expressed against a keyed document store on parquet; with the connector
on the classpath, ``load_in_es`` switches to the real writer — the
DataFrame shape is identical.

- ``LoadInES`` (``elasticsearch.py:47-98``): doc = ``{_index, _id,
  _source: {_feature_id, **props}}``; indexing errors are logged, not
  raised (``elasticsearch.py:81-84``) -> writer-level fault tolerance.
- ``ESGeometryField`` (``elasticsearch.py:101-147``): index DDL
  (geo_shape mapping, field limit) -> a schema/options record written
  alongside the index.
- ``ESOptimizeIndexing`` (``elasticsearch.py:150-185``): load tuning
  (refresh off, no throttle) -> writer batch options.
- ``ESExtract`` (``elasticsearch.py:12-44``): scroll scan -> plain scan
  of the keyed store (Spark's ES connector pushes queries down the same
  way).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ES_WRITE_TUNING = {
    # ESOptimizeIndexing parity: what the reference toggles on the index,
    # expressed as writer-side knobs (elasticsearch.py:168-178).
    "es.batch.size.entries": "1000",  # LoadInES window (elasticsearch.py:62)
    "es.batch.write.refresh": "false",  # refresh_interval=-1 during load
}

# Spark's official ES connector format name; present on the classpath
# when the elasticsearch-spark jar ships with the cluster.
ES_FORMAT = "org.elasticsearch.spark.sql"


@dataclass(frozen=True)
class ESConf:
    """Connector seam: the SAME ``load_in_es``/``es_extract`` calls run
    against a real Elasticsearch cluster by passing a conf with
    ``backend="es"`` — a config change, not a code change. The parquet
    stand-in (default) keeps the identical DataFrame contract, so tests
    and oracle queries are backend-agnostic.

    Option mapping onto the real connector (SURVEY §2.1-2.2):
    ``nodes/port`` -> ``es.nodes``/``es.port``; ``ES_WRITE_TUNING`` ->
    writer options (ESOptimizeIndexing); ``es.mapping.id = _id`` makes
    the upsert keyed exactly like the stand-in's keyed store; extra
    ``options`` pass through verbatim (auth, ssl, es.resource...)."""

    backend: str = "parquet"  # "parquet" (stand-in) | "es" (connector)
    nodes: str = "localhost"
    port: str = "9200"
    options: dict[str, str] = field(default_factory=dict)

    def reader_options(self) -> dict[str, str]:
        return {"es.nodes": self.nodes, "es.port": self.port, **self.options}

    def writer_options(self) -> dict[str, str]:
        return {
            **ES_WRITE_TUNING,
            "es.mapping.id": "_id",
            "es.nodes": self.nodes,
            "es.port": self.port,
            **self.options,
        }


_DEFAULT_CONF = ESConf()


def es_geometry_field(
    root: str, index: str, geom_field: str = "geom", total_fields: int = 10000
) -> None:
    """DDL: record the index mapping (``geo_shape`` + ``_feature_id``
    keyword + field limit, ``elasticsearch.py:115-137``)."""
    os.makedirs(os.path.join(root, index), exist_ok=True)
    mapping = {
        "properties": {geom_field: {"type": "geo_shape"}, "_feature_id": {"type": "keyword"}},
        "settings": {"index.mapping.total_fields.limit": total_fields},
    }
    with open(os.path.join(root, index, "_mapping.json"), "w") as f:
        json.dump(mapping, f)


def load_in_es(
    df: DataFrame,
    root: str,
    index: str,
    identifier_col: str = "identifier",
    conf: ESConf | None = None,
) -> None:
    """Bulk-index documents: ``_id`` = identifier, ``_source`` = the
    record + ``_feature_id`` (``elasticsearch.py:90-98``). Default
    backend: parquet keyed by ``_id`` under the index directory; with
    ``conf.backend == "es"`` the identical doc DataFrame goes through
    the real connector (``root`` is then unused)."""
    conf = conf or _DEFAULT_CONF
    props = [c for c in df.columns if c != identifier_col]
    doc = df.select(
        F.col(identifier_col).cast("string").alias("_id"),
        F.col(identifier_col).cast("string").alias("_feature_id"),
        *props,
    )
    if conf.backend == "es":
        (
            doc.write.format(ES_FORMAT)
            .options(**conf.writer_options())
            .mode("append")  # es.mapping.id makes append an upsert
            .save(index)
        )
        return
    doc.write.mode("overwrite").parquet(os.path.join(root, index, "docs"))


def es_extract(
    spark: SparkSession,
    root: str,
    index: str,
    conf: ESConf | None = None,
) -> DataFrame:
    """Scroll-scan stand-in: full scan of the keyed store, yielding
    (``_id``, source columns) like the reference's ``(hit._id,
    hit._source)``; with ``conf.backend == "es"`` the scan goes through
    the connector (which pushes filters down as ES queries — the
    scroll-scan the reference hand-writes, elasticsearch.py:12-44)."""
    conf = conf or _DEFAULT_CONF
    if conf.backend == "es":
        return (
            spark.read.format(ES_FORMAT)
            .options(**conf.reader_options())
            .load(index)
        )
    return spark.read.parquet(os.path.join(root, index, "docs"))

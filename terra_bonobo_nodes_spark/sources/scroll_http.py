"""Live-backend graft for the scroll DataSource: pages over HTTP.

The file-backed ``tbns_scroll`` source (``scroll.py``) is the offline
stand-in for the reference's ES scroll extract
(``elasticsearch.py:33-44``: open a scroll server-side, then page
through hits). This module is the documented GRAFT: the same
``ScrollReader`` contract with ``fetch_page`` issuing an HTTP GET per
partition — one request per page, executed ON THE EXECUTORS, with the
pushed id bounds forwarded server-side as query parameters exactly the
way a live ES deployment pushes a range query into the scroll body.

Protocol (any JSONL-over-HTTP service works; tests run it against an
in-process stdlib ``http.server``):

- ``GET {base_url}/pages``        -> ``{"pages": N}`` (the driver-side
  probe — the scroll-open / COUNT step);
- ``GET {base_url}/page/{i}?...`` -> one JSONL document per hit; the
  pushed bounds arrive as ``id_gt/id_gte/id_lt/id_lte/id_eq`` params
  the service MAY apply. The inherited client-side ``_keep`` filter
  re-applies them either way, so a service that ignores the params
  stays correct — the params are a bandwidth optimization, the same
  contract as ``ScrollReader.fetch_page``'s docstring states.

Per-partition client lifecycle: each executor task opens its own
connection inside ``fetch_page`` (urllib keeps no cross-task state), so
there is nothing to serialize from the driver except the URL — the
client-init-per-partition contract the reference's per-chunk scan
honors with a fresh cursor per chunk (``terra.py:177-211``).
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence
from urllib.parse import urlencode
from urllib.request import urlopen

from pyspark.sql.datasource import DataSource
from pyspark.sql.types import StructType

from terra_bonobo_nodes_spark.sources.scroll import PagePartition, ScrollReader

_OP_PARAM = {">": "id_gt", ">=": "id_gte", "<": "id_lt", "<=": "id_lte", "==": "id_eq"}


class HttpScrollDataSource(DataSource):
    """``format("tbns_scroll_http")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "tbns_scroll_http"

    def schema(self) -> str:
        raise ValueError(
            "tbns_scroll_http requires an explicit schema: "
            'spark.read.format("tbns_scroll_http").schema("id BIGINT, ...")'
        )

    def reader(self, schema: StructType) -> "HttpScrollReader":
        return HttpScrollReader(schema, self.options)


class HttpScrollReader(ScrollReader):
    """The file reader with its two backend seams re-pointed at HTTP:
    ``partitions`` probes ``/pages`` (driver side, once), ``fetch_page``
    GETs one page per task. Filter pushdown, the empty-scroll sentinel,
    Arrow batching, and the client-side bound re-check are all
    inherited unchanged — that is the point of the seam."""

    def __init__(self, schema: StructType, options: dict) -> None:
        if "base_url" not in options:
            raise ValueError("tbns_scroll_http: 'base_url' option is required")
        self.base_url = options["base_url"].rstrip("/")
        self.id_col = options.get("id_col")
        self.timeout = float(options.get("timeout", 30))
        self._schema = schema
        self.bounds: list[tuple[str, float]] = []

    def partitions(self) -> Sequence[PagePartition]:
        with urlopen(f"{self.base_url}/pages", timeout=self.timeout) as resp:
            n_pages = int(json.load(resp)["pages"])
        if n_pages == 0:
            return [PagePartition(0, "")]  # empty scroll: 0 rows
        query = ""
        if self.bounds:
            # forward the consumed predicates server-side; the service
            # may apply them (bandwidth) or ignore them (correctness is
            # preserved by the inherited client-side _keep)
            query = "?" + urlencode(
                [(_OP_PARAM[op], repr(v)) for op, v in self.bounds]
            )
        return [
            PagePartition(i, f"{self.base_url}/page/{i}{query}")
            for i in range(n_pages)
        ]

    def fetch_page(self, partition: PagePartition) -> Iterator[dict]:
        with urlopen(partition.path, timeout=self.timeout) as resp:
            for line in resp.read().decode("utf-8").splitlines():
                line = line.strip()
                if line:
                    yield json.loads(line)

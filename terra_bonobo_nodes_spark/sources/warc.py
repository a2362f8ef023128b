"""WARC ingestion — the step BEFORE everything else in a crawl
pipeline: Common Crawl ships WARC (raw HTTP captures) and WET
(extracted-text conversion records); this reader explodes either into
one row per record, executor-side, from binary whole-file rows
(``spark.read.format("binaryFile")``), the ``zip_reader`` shape.

Output columns: ``warc_type``, ``record_id``, ``target_uri``,
``warc_date``, ``warc_content_type`` (all nullable strings — absent
fields stay NULL, never invented) and ``payload`` (binary). With
``strip_http=True`` an ``application/http`` response payload is
reduced to its body (the HTML the curation chain's
``llm/html.py::html_to_text`` step consumes); WET conversion records
pass through untouched either way.

100 TB shape: parsing is an Arrow-batched ``mapInPandas`` over the
binary content — per-file linear, no shuffle, no driver state; a dump
of N WARC files parallelizes file-per-task exactly like production
Common Crawl jobs. Payload bytes flow straight through (decode is the
DOWNSTREAM step, per the multimodal discipline: schema and plumbing
real, interpretation explicit).
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame

from terra_bonobo_nodes_spark.sources.warc_codec import (
    header,
    parse_warc_records,
    strip_http_envelope,
)

_FIELDS = (
    ("warc_type", "WARC-Type"),
    ("record_id", "WARC-Record-ID"),
    ("target_uri", "WARC-Target-URI"),
    ("warc_date", "WARC-Date"),
    ("warc_content_type", "Content-Type"),
)


def warc_reader(
    df: DataFrame,
    content_col: str = "content",
    keep_cols: Sequence[str] = (),
    strip_http: bool = False,
) -> DataFrame:
    """Explode WARC byte streams into one row per record. ``.warc.gz``
    content is handled transparently: a gzip magic prefix triggers
    whole-file decompression, and Python's gzip module consumes the
    member-per-record concatenation Common Crawl ships (it loops over
    concatenated members by design), so the same reader serves both
    layouts. Per-member random access — the reason the member framing
    exists — is an INDEXED-fetch optimization that doesn't apply to a
    whole-file scan."""
    schema = ", ".join(
        [
            *(f"{c} STRING" for c in keep_cols),
            *(f"{out} STRING" for out, _ in _FIELDS),
            "payload BINARY",
        ]
    )

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in keep_cols}
            for out, _ in _FIELDS:
                rows[out] = []
            rows["payload"] = []
            for i, blob in enumerate(pdf[content_col]):
                if blob is None:
                    continue
                raw = bytes(blob)
                if raw.startswith(b"\x1f\x8b"):
                    raw = gzip.decompress(raw)
                for rec in parse_warc_records(raw):
                    hs = rec["headers"]
                    payload = rec["payload"]
                    ctype = header(hs, "Content-Type") or ""
                    if strip_http and ctype.startswith("application/http"):
                        payload = strip_http_envelope(payload)
                    for c in keep_cols:
                        rows[c].append(pdf[c].iloc[i])
                    for out, name in _FIELDS:
                        rows[out].append(header(hs, name))
                    rows["payload"].append(payload)
            yield pd.DataFrame(rows)

    return df.mapInPandas(explode, schema)

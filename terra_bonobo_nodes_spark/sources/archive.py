"""Zip-entry extraction (``ZipReader``, ``archive.py:7-24``).

Input: rows with a ``content`` binary column holding a whole zip file
(e.g. from ``spark.read.format("binaryFile")``). Output: one row per
entry ``(name, content)``, optional entry whitelist — the reference's
``yield (name, bytes)`` contract, distributed per source file.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame


def zip_reader(
    df: DataFrame,
    content_col: str = "content",
    names: Sequence[str] | None = None,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Explode zip payloads into (``name``, ``content``) entry rows."""
    whitelist = set(names) if names else None
    schema = ", ".join(
        [*(f"{c} STRING" for c in keep_cols), "name STRING", "content BINARY"]
    )

    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in keep_cols}
            rows["name"] = []
            rows["content"] = []
            for i, payload in enumerate(pdf[content_col]):
                if payload is None:
                    continue
                with zipfile.ZipFile(io.BytesIO(bytes(payload))) as zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        if whitelist is not None and info.filename not in whitelist:
                            continue
                        for c in keep_cols:
                            rows[c].append(pdf[c].iloc[i])
                        rows["name"].append(info.filename)
                        rows["content"].append(zf.read(info))
            yield pd.DataFrame(rows)

    return df.mapInPandas(explode, schema)

"""Pixel-statistics image screens — the rule-based filters an image
corpus runs after decode and before any model-based scoring (the
public LAION/DataComp recipes drop tiny images, extreme aspect
ratios, and near-solid frames before CLIP ever sees a pixel; these
are those screens, minus the model). Works over the repo's own
from-spec decoders (llm/codecs.py, llm/jpeg.py) via the same
Arrow-batched ``mapInPandas`` shape as decode_image.

Every surfaced statistic is an exact integer so pins are
bit-reproducible:

- ``aspect_e3``      — max(w,h)*1000 div min(w,h) (1000 = square);
- ``solid_ratio_e3`` — share of pixels in the modal 6-bit color
  bucket, in thousandths (1000 = one flat color);
- ``border_uniform_e3`` — same statistic over the 1-px border ring
  (letterboxes and solid frames score high while the interior may
  not);
- ``hist_entropy_mb`` — Shannon entropy of the 64-bucket color
  histogram in MILLI-BITS, computed from exact integer counts with
  ``Fraction``-free integer-safe arithmetic: entropy * 1000 is
  rounded from a sum of ``c * log2(n/c)`` terms evaluated in float
  over exact integers — deterministic for fixed inputs (pure function
  of the histogram), bounded by 6000 (64 buckets).

Rows-only class: pixel statistics are not SQL-expressible; pinned by
tests/test_imagescreen.py on synthetic solid/noise/gradient/
letterboxed fixtures.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_BUCKETS = 64  # 2 bits per channel


def _pixel_buckets(width: int, height: int, rgb: bytes):
    """(h, w) array of 6-bit color buckets — vectorized; the
    per-pixel Python loop this replaces cost ~5s on a 4K frame."""
    import numpy as np

    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    # all-uint8 arithmetic: values stay < 64, so the shifts never
    # overflow and no widening copy of the 3*w*h buffer is made
    q = px >> 6
    return (q[:, :, 0] << 4) | (q[:, :, 1] << 2) | q[:, :, 2]


def _bucket_counts(buckets) -> list[int]:
    import numpy as np

    return np.bincount(buckets.ravel(), minlength=_BUCKETS).tolist()


def _border_counts(buckets) -> list[int]:
    import numpy as np

    h, w = buckets.shape
    parts = [buckets[0, :], buckets[-1, :]] if h > 1 else [buckets[0, :]]
    if h > 2:
        parts += [buckets[1:-1, 0], buckets[1:-1, -1]] if w > 1 else [
            buckets[1:-1, 0]
        ]
    ring = np.concatenate(parts) if len(parts) > 1 else parts[0]
    return np.bincount(ring, minlength=_BUCKETS).tolist()


def _entropy_mb(counts: list[int]) -> int:
    n = sum(counts)
    if n == 0:
        return 0
    acc = 0.0
    for c in counts:
        if c:
            acc += c * math.log2(n / c)
    return round(acc * 1000 / n)


def screen_stats(width: int, height: int, rgb: bytes) -> dict:
    """Pure-Python per-image statistics (the unit under test; the
    Spark surface maps it over payload batches)."""
    if width < 1 or height < 1 or len(rgb) != width * height * 3:
        raise ValueError("screen_stats needs a w*h*3 RGB buffer")
    n = width * height
    buckets = _pixel_buckets(width, height, rgb)
    counts = _bucket_counts(buckets)
    border = _border_counts(buckets)
    n_border = sum(border)
    return {
        "width": width,
        "height": height,
        "min_side": min(width, height),
        "aspect_e3": (max(width, height) * 1000) // min(width, height),
        "solid_ratio_e3": (max(counts) * 1000) // n,
        "border_uniform_e3": (
            (max(border) * 1000) // n_border if n_border else 0
        ),
        "hist_entropy_mb": _entropy_mb(counts),
    }


SCREEN_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("min_side", T.IntegerType()),
        T.StructField("aspect_e3", T.LongType()),
        T.StructField("solid_ratio_e3", T.LongType()),
        T.StructField("border_uniform_e3", T.LongType()),
        T.StructField("hist_entropy_mb", T.LongType()),
    ]
)


def image_screens(
    assets: DataFrame,
    decoder: Callable[[bytes], tuple[int, int, bytes]] | None = None,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-asset screen statistics (Arrow-batched mapInPandas).
    ``decoder`` defaults to the from-spec ``codecs.image_decoder``
    (BMP/PPM/PNG/JPEG); unsupported formats raise per the codec
    policy. Thresholding is the caller's: the standard screen is
    ``min_side >= 64 AND aspect_e3 <= 3000 AND solid_ratio_e3 <= 900``
    — kept OUT of the operator so the report is reusable across
    policies."""
    import pandas as pd

    from terra_bonobo_nodes_spark.llm import codecs

    decode = decoder if decoder is not None else codecs.image_decoder

    def run(batches):
        for pdf in batches:
            stats = [
                screen_stats(*decode(bytes(b))) for b in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    **{
                        k: [s[k] for s in stats]
                        for k in (
                            "width",
                            "height",
                            "min_side",
                            "aspect_e3",
                            "solid_ratio_e3",
                            "border_uniform_e3",
                            "hist_entropy_mb",
                        )
                    },
                }
            )

    return assets.select(id_col, payload_col).mapInPandas(run, SCREEN_SCHEMA)

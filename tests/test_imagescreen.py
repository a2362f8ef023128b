"""Pixel-statistics image screens (llm/imagescreen.py): synthetic
solid/noise/gradient/letterbox fixtures, exact integer statistics,
and the Spark mapInPandas surface over the from-spec BMP codec."""

from __future__ import annotations

import math

import pytest

from terra_bonobo_nodes_spark.llm.codecs import encode_bmp
from terra_bonobo_nodes_spark.llm.imagescreen import image_screens, screen_stats


def _solid(w, h, color=(200, 10, 10)):
    return bytes(color) * (w * h)


def _noise(w, h, seed=12345):
    # deterministic LCG noise spanning all four 2-bit levels per channel
    out = bytearray()
    x = seed
    for _ in range(w * h * 3):
        x = (1103515245 * x + 12345) % (1 << 31)
        out.append(x % 256)
    return bytes(out)


def _letterboxed(w, h):
    # black frame, noisy interior
    rgb = bytearray(_noise(w, h))
    for x in range(w):
        for y in (0, h - 1):
            i = (y * w + x) * 3
            rgb[i : i + 3] = b"\0\0\0"
    for y in range(h):
        for x in (0, w - 1):
            i = (y * w + x) * 3
            rgb[i : i + 3] = b"\0\0\0"
    return bytes(rgb)


def test_solid_image_extremes():
    s = screen_stats(16, 16, _solid(16, 16))
    assert s["solid_ratio_e3"] == 1000
    assert s["hist_entropy_mb"] == 0
    assert s["border_uniform_e3"] == 1000
    assert s["aspect_e3"] == 1000 and s["min_side"] == 16


def test_noise_image_high_entropy_low_solid():
    s = screen_stats(32, 32, _noise(32, 32))
    assert s["solid_ratio_e3"] < 100
    # 64 roughly-uniform buckets -> near 6 bits
    assert s["hist_entropy_mb"] > 5500
    assert s["hist_entropy_mb"] <= 6000


def test_letterbox_border_vs_interior():
    s = screen_stats(32, 32, _letterboxed(32, 32))
    assert s["border_uniform_e3"] == 1000  # solid black ring
    assert s["solid_ratio_e3"] < 300      # interior is noise


def test_aspect_and_entropy_bounds():
    s = screen_stats(100, 10, _solid(100, 10))
    assert s["aspect_e3"] == 10000 and s["min_side"] == 10
    # entropy is a pure function of the histogram: verify against a
    # direct recomputation for a two-color image
    rgb = (b"\x00\x00\x00" + b"\xff\xff\xff") * 50
    s2 = screen_stats(10, 10, rgb)
    assert s2["hist_entropy_mb"] == round(
        (50 * math.log2(2) + 50 * math.log2(2)) * 1000 / 100
    ) == 1000
    assert s2["solid_ratio_e3"] == 500


def test_guards():
    with pytest.raises(ValueError):
        screen_stats(4, 4, b"\0" * 5)
    with pytest.raises(ValueError):
        screen_stats(0, 4, b"")


def test_spark_surface_over_bmp(spark):
    rows = [
        (1, encode_bmp(16, 16, _solid(16, 16))),
        (2, encode_bmp(32, 32, _noise(32, 32))),
        (3, encode_bmp(100, 10, _solid(100, 10))),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {r["asset_id"]: r for r in image_screens(df).collect()}
    assert got[1]["solid_ratio_e3"] == 1000 and got[1]["hist_entropy_mb"] == 0
    assert got[2]["hist_entropy_mb"] > 5500
    assert got[3]["aspect_e3"] == 10000


def test_image_pipeline_e2e(spark):
    """The image-corpus curation chain end to end: screens drop the
    solid/banner junk -> EXIF GPS scrub certifies the export -> the
    survivors' near-dup pairing finds the re-encoded copy. Each stage
    is its own operator; this pins the COMPOSITION."""
    from pyspark.sql import functions as F

    from terra_bonobo_nodes_spark.llm import exif as X
    from terra_bonobo_nodes_spark.llm.jpeg import encode_jpeg
    from terra_bonobo_nodes_spark.llm.phash import image_near_dup_pairs

    def photo(seed, w=32, h=32):
        return bytes(
            ((x * 7 + y * 13 + c * 29 + seed) % 251)
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )

    base = photo(0)
    rows = [
        # 1: a real photo with a GPS fix
        (1, X.build_exif_jpeg(encode_jpeg(32, 32, base), gps=(48.85, 2.29))),
        # 2: the same pixels re-encoded (near-dup of 1), no EXIF
        (2, encode_jpeg(32, 32, base)),
        # 3: a solid banner (screened out)
        (3, encode_jpeg(32, 32, bytes((200, 10, 10)) * (32 * 32))),
        # 4: an unrelated photo
        (4, encode_jpeg(32, 32, photo(120))),
        # 5: an extreme-aspect strip (screened out)
        (5, encode_jpeg(128, 8, photo(7, 128, 8))),
    ]
    assets = spark.createDataFrame(rows, "asset_id long, payload binary")

    screens = image_screens(assets)
    keep_ids = screens.where(
        (F.col("min_side") >= 16)
        & (F.col("aspect_e3") <= 3000)
        & (F.col("solid_ratio_e3") <= 900)
    ).select("asset_id")
    kept = assets.join(keep_ids, "asset_id", "left_semi")
    assert sorted(
        r["asset_id"] for r in kept.select("asset_id").collect()
    ) == [1, 2, 4]

    scrubbed = X.exif_scrub_gps(kept)
    flags = {r["asset_id"]: r["had_gps"] for r in scrubbed.collect()}
    assert flags == {1: True, 2: False, 4: False}
    for r in scrubbed.collect():
        assert not X.parse_exif_jpeg(bytes(r["payload"]))["has_gps"]

    pairs = image_near_dup_pairs(scrubbed, max_hamming=3).collect()
    got = {(min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"])) for r in pairs}
    assert (1, 2) in got            # the re-encoded copy is found
    assert all(4 not in p for p in got)  # the unrelated photo pairs with nothing

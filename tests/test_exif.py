"""EXIF parse + GPS scrub (llm/exif.py): from-spec TIFF/EXIF tree
parse/serialize pinned against hand-built fixtures, the Fraction
reference for coordinate arithmetic, byte-absence of GPS data after
the scrub, and pixel-identical decode before/after."""

from __future__ import annotations

import struct
from fractions import Fraction

import pytest

from terra_bonobo_nodes_spark.llm import exif as X
from terra_bonobo_nodes_spark.llm.jpeg import decode_jpeg, encode_jpeg


def _base_jpeg() -> bytes:
    rgb = bytes(
        (x * 7 + y * 13 + c * 29) % 256
        for y in range(16)
        for x in range(16)
        for c in range(3)
    )
    return encode_jpeg(16, 16, rgb)


LAT, LON = 48.858844, 2.294351  # a public landmark, fixture-grade


def test_parse_roundtrip_fields():
    jp = X.build_exif_jpeg(_base_jpeg(), gps=(LAT, LON))
    r = X.parse_exif_jpeg(jp)
    assert r["has_exif"] and r["has_gps"]
    assert r["make"] == "TBNS" and r["model"] == "SyntheticCam"
    assert r["orientation"] == 6
    assert r["datetime"] == "2026:08:16 12:00:00"
    # e7 coordinates match the Fraction reference to the stored
    # rational precision (limit_denominator(1e6) on the seconds)
    assert abs(r["gps_lat_e7"] - round(LAT * 1e7)) <= 20
    assert abs(r["gps_lon_e7"] - round(LON * 1e7)) <= 20


def test_southern_western_hemispheres_negative():
    jp = X.build_exif_jpeg(_base_jpeg(), gps=(-33.868820, -151.209296 + 0))
    r = X.parse_exif_jpeg(jp)
    assert r["gps_lat_e7"] < 0 and r["gps_lon_e7"] < 0


def test_big_endian_mm_parse():
    jp = X.build_exif_jpeg(_base_jpeg(), gps=(LAT, LON), byte_order="MM")
    r = X.parse_exif_jpeg(jp)
    assert r["has_gps"] and r["make"] == "TBNS"
    assert abs(r["gps_lat_e7"] - round(LAT * 1e7)) <= 20


def test_scrub_removes_gps_bytes_and_keeps_rest():
    jp = X.build_exif_jpeg(_base_jpeg(), gps=(LAT, LON))
    scrubbed, had = X.scrub_gps_jpeg(jp)
    assert had
    r = X.parse_exif_jpeg(scrubbed)
    assert r["has_exif"] and not r["has_gps"]
    assert r["gps_lat_e7"] is None
    # non-GPS metadata survives
    assert (r["make"], r["model"], r["orientation"], r["datetime"]) == (
        "TBNS", "SyntheticCam", 6, "2026:08:16 12:00:00",
    )
    # the GPS rational BYTES are gone, not merely unreferenced: the
    # first two latitude rationals (deg 48/1, min 51/1) stored LE
    frac = Fraction(LAT).limit_denominator(10**6)
    mins = int((frac - int(frac)) * 60)
    lat_pat = struct.pack("<LL", int(frac), 1) + struct.pack("<LL", mins, 1)
    assert lat_pat in jp and lat_pat not in scrubbed
    # second scrub is a no-op on the flag
    again, had2 = X.scrub_gps_jpeg(scrubbed)
    assert not had2 and X.parse_exif_jpeg(again)["has_exif"]


def test_scrub_preserves_pixels_exactly():
    base = _base_jpeg()
    jp = X.build_exif_jpeg(base, gps=(LAT, LON))
    scrubbed, _ = X.scrub_gps_jpeg(jp)
    assert decode_jpeg(scrubbed) == decode_jpeg(base)


def test_no_exif_passthrough_and_rejects():
    base = _base_jpeg()
    out, had = X.scrub_gps_jpeg(base)
    assert out == base and not had
    r = X.parse_exif_jpeg(base)
    assert not r["has_exif"] and not r["has_gps"]
    with pytest.raises(X.ExifError):
        X.parse_exif_jpeg(b"\x89PNG\r\n\x1a\n")  # not a JPEG
    # truncated TIFF block inside APP1 raises, never silently passes
    bad = b"\xff\xd8" + b"\xff\xe1" + struct.pack(">H", 12) + b"Exif\x00\x00II\x00\x00"
    with pytest.raises(X.ExifError):
        X.parse_exif_jpeg(bad + base[2:])


def test_walk_handles_fill_bytes_and_standalone_markers():
    """ADVICE r15 (exif.py medium): 0xFF fill padding before a marker
    is spec-legal (T.81 B.1.1.2) and must not desync or silently end
    the walk; TEM/RSTn are length-less; a truncated chain raises."""
    base = _base_jpeg()
    jp = X.build_exif_jpeg(base, gps=(LAT, LON))
    # inject two fill bytes before the APP1 marker: still parses + scrubs
    assert jp[2] == 0xFF
    padded = jp[:2] + b"\xff\xff" + jp[2:]
    assert X.parse_exif_jpeg(padded)["has_gps"]
    scrubbed, had = X.scrub_gps_jpeg(padded)
    assert had and not X.parse_exif_jpeg(scrubbed)["has_gps"]
    # standalone TEM marker before APP1: walked over, not misparsed
    tem = jp[:2] + b"\xff\x01" + jp[2:]
    assert X.parse_exif_jpeg(tem)["has_gps"]
    # chain that ends without SOS/EOI and without EXIF rejects loudly
    # (SOI + one complete COM segment, then nothing): the old walk
    # returned normally here and scrub certified an unparsed payload
    stub = b"\xff\xd8\xff\xfe\x00\x04ab"
    with pytest.raises(X.ExifError):
        X.parse_exif_jpeg(stub)
    with pytest.raises(X.ExifError):
        X.scrub_gps_jpeg(stub)
    # fill run that hits the end of the buffer rejects loudly
    with pytest.raises(X.ExifError):
        X.parse_exif_jpeg(stub + b"\xff\xff")
    # segment length pointing past the buffer rejects loudly
    broken = bytearray(jp)
    broken[4:6] = struct.pack(">H", len(jp))  # APP1 length >> buffer
    with pytest.raises(X.ExifError):
        X.parse_exif_jpeg(bytes(broken))
    # stuffed 0x00 where a marker belongs rejects loudly
    with pytest.raises(X.ExifError):
        X.parse_exif_jpeg(jp[:2] + b"\xff\x00" + jp[2:])


def test_e7_arithmetic_is_exact_fraction_floor():
    # hand rationals: 10 deg, 30 min, 901/100 sec south
    ifd_val = [(10, 1), (30, 1), (901, 100)]
    want = (Fraction(10) + Fraction(30, 60) + Fraction(901, 100 * 3600)) * 10**7
    got = X._dms_to_e7(ifd_val, "S", ("S",))
    assert got == -(want.numerator // want.denominator)


def test_spark_report_and_scrub(spark):
    base = _base_jpeg()
    rows = [
        (1, X.build_exif_jpeg(base, gps=(LAT, LON))),
        (2, X.build_exif_jpeg(base)),  # exif, no gps
        (3, base),  # no exif
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    rep = {r["asset_id"]: r for r in X.exif_report(df).collect()}
    assert rep[1]["has_gps"] and not rep[2]["has_gps"] and not rep[3]["has_exif"]
    assert rep[2]["make"] == "TBNS" and rep[3]["make"] is None
    sc = {r["asset_id"]: r for r in X.exif_scrub_gps(df).collect()}
    assert sc[1]["had_gps"] and not sc[2]["had_gps"] and not sc[3]["had_gps"]
    assert bytes(sc[3]["payload"]) == base
    assert not X.parse_exif_jpeg(bytes(sc[1]["payload"]))["has_gps"]

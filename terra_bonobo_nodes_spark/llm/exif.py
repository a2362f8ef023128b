"""EXIF metadata extraction and GPS scrubbing for JPEG assets — the
image-PII member of the curation family (text PII lives in
llm/scrub.py::pii_redact). Public-web images routinely carry the
camera's GPS fix in their EXIF block; a training-data pipeline that
keeps the pixels must strip the location before the bytes leave the
curation boundary. Both directions are from-spec implementations
(TIFF 6.0 + EXIF 2.3, public specs), matching the repo's codec policy
(llm/codecs.py): a structure is either actually parsed or loudly
rejected — a scrubber that silently passes malformed EXIF through
cannot prove the output is clean.

Structure: a JPEG APP1 segment tagged ``Exif\\x00\\x00`` holds a TIFF
byte stream — a header (byte order II/MM, magic 42, IFD0 offset) and a
chain of IFDs (image file directories), each a count + 12-byte entries
+ next-IFD pointer. Entry values larger than 4 bytes live at an
offset elsewhere in the block; three pointer tags (ExifIFD 0x8769,
GPSInfo 0x8825, Interop 0xA005) reference sub-IFDs. The parser walks
this into a tree; the serializer re-emits a canonical little-endian
block (entries tag-ascending per spec, values packed after each IFD,
no thumbnail IFD1 — embedded thumbnails are a second copy of the
image and are dropped by privacy scrubbers for the same reason GPS
is). The scrub therefore REBUILDS the APP1 payload from the kept
tree: GPS bytes are not merely unreferenced, they are absent.

Spark surface: Arrow-batched ``mapInPandas`` over the binary payload
column (the decode_image/audio_spectral shape). Rows-only class —
byte-structure parsing is not SQL-expressible; correctness is pinned
by tests/test_exif.py against hand-built fixtures and the Fraction
reference for coordinate arithmetic.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# TIFF field types we materialize (size in bytes per element).
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}
_EXIF_PTR, _GPS_PTR, _INTEROP_PTR = 0x8769, 0x8825, 0xA005
_SUBIFD_TAGS = (_EXIF_PTR, _GPS_PTR, _INTEROP_PTR)

# IFD0 tags surfaced by the report.
TAG_MAKE, TAG_MODEL, TAG_ORIENTATION, TAG_DATETIME = (
    0x010F,
    0x0110,
    0x0112,
    0x0132,
)
# GPS IFD tags.
_GPS_LAT_REF, _GPS_LAT, _GPS_LON_REF, _GPS_LON = 1, 2, 3, 4


class ExifError(ValueError):
    """Malformed EXIF/TIFF structure (loud-rejection policy)."""


# --- TIFF tree parse ----------------------------------------------------------


def _parse_ifd(data: bytes, off: int, bo: str, depth: int = 0) -> list:
    """One IFD at ``off`` -> list of (tag, type, count, values) with
    sub-IFD pointer tags recursed into (values = the subtree list).
    Values decode per type: ints for BYTE/SHORT/LONG/SLONG, bytes for
    ASCII/UNDEFINED, (num, den) tuples for (S)RATIONAL."""
    if depth > 4:
        raise ExifError("IFD nesting too deep")
    if off + 2 > len(data):
        raise ExifError("IFD offset past end of block")
    (n,) = struct.unpack_from(bo + "H", data, off)
    entries = []
    for i in range(n):
        base = off + 2 + 12 * i
        if base + 12 > len(data):
            raise ExifError("IFD entry past end of block")
        tag, typ, count = struct.unpack_from(bo + "HHL", data, base)
        if typ not in _TYPE_SIZES:
            # unknown field type: TIFF 6.0 tells READERS to skip, but a
            # SCRUBBER cannot — the cell may point at bytes it cannot
            # relocate, and a dangling offset in the rebuilt block is
            # corruption. Loud-rejection policy.
            raise ExifError(f"unknown TIFF field type {typ} (tag {tag:#06x})")
        nbytes = _TYPE_SIZES[typ] * count
        if nbytes <= 4:
            voff = base + 8
        else:
            (voff,) = struct.unpack_from(bo + "L", data, base + 8)
        if voff + nbytes > len(data):
            raise ExifError("value bytes past end of block")
        raw = data[voff : voff + nbytes]
        if tag in _SUBIFD_TAGS and typ == 4 and count == 1:
            (sub_off,) = struct.unpack_from(bo + "L", raw, 0)
            entries.append(
                (tag, typ, count, _parse_ifd(data, sub_off, bo, depth + 1))
            )
            continue
        if typ in (2, 7):  # ASCII / UNDEFINED stay raw bytes
            values = raw
        elif typ in (5, 10):
            fmt = "LL" if typ == 5 else "ll"
            values = [
                struct.unpack_from(bo + fmt, raw, 8 * j) for j in range(count)
            ]
        else:
            fmt = {1: "B", 3: "H", 4: "L", 6: "b", 8: "h", 9: "l"}[typ]
            values = list(struct.unpack_from(bo + str(count) + fmt, raw, 0))
        entries.append((tag, typ, count, values))
    return entries


def parse_tiff(block: bytes) -> tuple[str, list]:
    """Parse a TIFF byte stream -> (byte_order, IFD0 tree). The
    thumbnail IFD1 chain is intentionally not followed (dropped on
    re-serialize; see module docstring)."""
    if len(block) < 8:
        raise ExifError("TIFF block shorter than its header")
    if block[:2] == b"II":
        bo = "<"
    elif block[:2] == b"MM":
        bo = ">"
    else:
        raise ExifError("bad TIFF byte-order mark")
    magic, ifd0 = struct.unpack_from(bo + "HL", block, 2)
    if magic != 42:
        raise ExifError("bad TIFF magic")
    return ("II" if bo == "<" else "MM"), _parse_ifd(block, ifd0, bo)


# --- TIFF tree serialize ------------------------------------------------------


def _serialize_ifd(entries: list, base_off: int) -> bytes:
    """Emit one IFD (little-endian, entries tag-ascending, next-IFD=0)
    with its out-of-line values packed immediately after, recursing
    into sub-IFD subtrees. ``base_off`` is this IFD's absolute offset
    inside the TIFF block."""
    entries = sorted(entries, key=lambda e: e[0])
    n = len(entries)
    head_len = 2 + 12 * n + 4
    tail = bytearray()
    cells = []
    for tag, typ, count, values in entries:
        if tag in _SUBIFD_TAGS and isinstance(values, list) and typ == 4:
            sub_off = base_off + head_len + len(tail)
            sub = _serialize_ifd(values, sub_off)
            tail += sub
            cells.append((tag, typ, 1, struct.pack("<L", sub_off)))
            continue
        if typ in (2, 7):
            raw = bytes(values)
        elif typ in (5, 10):
            fmt = "<LL" if typ == 5 else "<ll"
            raw = b"".join(struct.pack(fmt, a, b) for a, b in values)
        else:
            fmt = {1: "B", 3: "H", 4: "L", 6: "b", 8: "h", 9: "l"}[typ]
            raw = struct.pack("<" + str(len(values)) + fmt, *values)
        count = count if typ in (2, 7) else len(values)
        if len(raw) <= 4:
            cells.append((tag, typ, count, raw.ljust(4, b"\0")))
        else:
            voff = base_off + head_len + len(tail)
            tail += raw
            if len(raw) % 2:  # word-align the value area (TIFF 6.0)
                tail += b"\0"
            cells.append((tag, typ, count, struct.pack("<L", voff)))
    out = bytearray(struct.pack("<H", n))
    for tag, typ, count, cell in cells:
        out += struct.pack("<HHL", tag, typ, count) + cell
    out += struct.pack("<L", 0)  # no next IFD (thumbnail chain dropped)
    return bytes(out) + bytes(tail)


def serialize_tiff(ifd0: list) -> bytes:
    """Canonical little-endian TIFF block from an IFD0 tree."""
    return b"II" + struct.pack("<HL", 42, 8) + _serialize_ifd(ifd0, 8)


# --- JPEG segment walk --------------------------------------------------------


def _walk_jpeg(payload: bytes) -> Iterator[tuple[int, int, int]]:
    """Yield (marker, seg_start, seg_end) for each marker segment up to
    SOS; seg_start/seg_end bound the FF xx [LL LL ...] segment
    (seg_start always points at the 0xFF immediately before the marker
    byte, so ``payload[s+2:s+4]`` is the length for sized segments).

    Spec-legal shapes that are NOT a plain FF-xx-LL-LL chain are
    handled explicitly instead of desyncing or bailing silently
    (a scrubber that returns normally on an unparsed chain would let
    :func:`scrub_gps_jpeg` certify a payload it never inspected):
    runs of 0xFF fill bytes before a marker are legal padding
    (ITU T.81 B.1.1.2); TEM (0x01) and RST0-7 (0xD0-0xD7) are
    standalone length-less markers; SOS (0xDA) and EOI (0xD9) end the
    walk cleanly. Everything else that prevents a complete walk —
    truncation mid-chain, a segment extending past the buffer, a
    length < 2, a stuffed 0x00 where a marker belongs — raises
    :class:`ExifError`."""
    if payload[:2] != b"\xff\xd8":
        raise ExifError("not a JPEG (missing SOI)")
    i = 2
    n = len(payload)
    while True:
        if i >= n:
            raise ExifError("JPEG truncated before SOS/EOI")
        if payload[i] != 0xFF:
            raise ExifError("JPEG marker desync")
        j = i + 1
        while j < n and payload[j] == 0xFF:  # fill bytes (B.1.1.2)
            j += 1
        if j >= n:
            raise ExifError("JPEG truncated inside a marker fill run")
        marker = payload[j]
        if marker == 0xDA or marker == 0xD9:  # SOS / EOI — clean end
            return
        if marker == 0x00:  # byte stuffing only exists inside a scan
            raise ExifError("JPEG marker desync (stuffed 0x00)")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn
            yield marker, j - 1, j + 1
            i = j + 1
            continue
        if j + 3 > n:
            raise ExifError("JPEG segment header truncated")
        (ln,) = struct.unpack_from(">H", payload, j + 1)
        if ln < 2:
            raise ExifError("JPEG segment length < 2")
        end = j + 1 + ln
        if end > n:
            raise ExifError("JPEG segment extends past the buffer")
        yield marker, j - 1, end
        i = end


def _find_exif_app1(payload: bytes) -> tuple[int, int] | None:
    for marker, s, e in _walk_jpeg(payload):
        if marker == 0xE1 and payload[s + 4 : s + 10] == b"Exif\x00\x00":
            return s, e
    return None


# --- report fields ------------------------------------------------------------


def _entry_map(ifd: list) -> dict:
    return {tag: (typ, count, values) for tag, typ, count, values in ifd}


def _ascii(values) -> str | None:
    if not isinstance(values, (bytes, bytearray)):
        return None
    return bytes(values).split(b"\0", 1)[0].decode("ascii", "replace")


def _dms_to_e7(rationals, ref: str | None, neg_refs: tuple[str, str]) -> int | None:
    """(deg, min, sec) rationals + hemisphere ref -> signed integer
    1e-7 degrees, exact via Fraction then truncated toward zero —
    deterministic, and 1e-7 deg (~1.1 cm) is below any GPS fix."""
    if rationals is None or len(rationals) != 3:
        return None
    try:
        d, m, s = (Fraction(n, den) for n, den in rationals)
    except ZeroDivisionError as exc:
        raise ExifError("GPS rational with zero denominator") from exc
    val = (d + m / 60 + s / 3600) * 10_000_000
    e7 = val.numerator // val.denominator
    if ref is not None and ref.upper().startswith(neg_refs):
        e7 = -e7
    return int(e7)


def parse_exif_jpeg(payload: bytes) -> dict:
    """Extract the report fields from a JPEG's EXIF block. A JPEG
    without an APP1 Exif segment is a normal case (has_exif False,
    everything None); a present-but-malformed block raises
    :class:`ExifError` (the scrubber cannot certify what it cannot
    parse)."""
    out = {
        "has_exif": False,
        "orientation": None,
        "make": None,
        "model": None,
        "datetime": None,
        "has_gps": False,
        "gps_lat_e7": None,
        "gps_lon_e7": None,
    }
    span = _find_exif_app1(bytes(payload))
    if span is None:
        return out
    s, e = span
    _, ifd0 = parse_tiff(bytes(payload)[s + 10 : e])
    out["has_exif"] = True
    m = _entry_map(ifd0)
    if TAG_ORIENTATION in m and m[TAG_ORIENTATION][2]:
        out["orientation"] = int(m[TAG_ORIENTATION][2][0])
    out["make"] = _ascii(m.get(TAG_MAKE, (None, None, None))[2])
    out["model"] = _ascii(m.get(TAG_MODEL, (None, None, None))[2])
    out["datetime"] = _ascii(m.get(TAG_DATETIME, (None, None, None))[2])
    if _GPS_PTR in m and isinstance(m[_GPS_PTR][2], list):
        g = _entry_map(m[_GPS_PTR][2])
        out["has_gps"] = True
        lat_ref = _ascii(g.get(_GPS_LAT_REF, (None, None, None))[2])
        lon_ref = _ascii(g.get(_GPS_LON_REF, (None, None, None))[2])
        lat = g.get(_GPS_LAT, (None, None, None))[2]
        lon = g.get(_GPS_LON, (None, None, None))[2]
        out["gps_lat_e7"] = _dms_to_e7(lat, lat_ref, ("S",))
        out["gps_lon_e7"] = _dms_to_e7(lon, lon_ref, ("W",))
    return out


def scrub_gps_jpeg(payload: bytes) -> tuple[bytes, bool]:
    """Return (scrubbed_payload, had_gps). The APP1 Exif segment is
    REBUILT from the parsed tree with the GPSInfo sub-IFD removed and
    the thumbnail IFD1 chain dropped — GPS bytes are absent from the
    output, not merely unreferenced. Payloads without EXIF pass
    through byte-identical; entropy-coded image data is never touched
    (pixels decode identically, pinned in tests)."""
    payload = bytes(payload)
    span = _find_exif_app1(payload)
    if span is None:
        return payload, False
    s, e = span
    _, ifd0 = parse_tiff(payload[s + 10 : e])
    had_gps = any(tag == _GPS_PTR for tag, _, _, _ in ifd0)
    kept = [entry for entry in ifd0 if entry[0] != _GPS_PTR]
    block = serialize_tiff(kept)
    seg = b"\xff\xe1" + struct.pack(">H", len(block) + 8) + b"Exif\x00\x00" + block
    return payload[:s] + seg + payload[e:], had_gps


# --- fixture builder (tests + docs) -------------------------------------------


def build_exif_jpeg(
    jpeg: bytes,
    make: str = "TBNS",
    model: str = "SyntheticCam",
    orientation: int = 6,
    datetime: str = "2026:08:16 12:00:00",
    gps: tuple[float, float] | None = None,
    byte_order: str = "II",
) -> bytes:
    """Inject a synthetic EXIF APP1 (optionally with a GPS fix) right
    after SOI of an existing JPEG — the fixture authoring seam; the
    big-endian variant exercises the MM parse path."""

    def _dms(value: float):
        frac = Fraction(abs(value)).limit_denominator(10**6)
        d = int(frac)
        rem = (frac - d) * 60
        m = int(rem)
        sec = (rem - m) * 60
        return [(d, 1), (m, 1), (sec.numerator, sec.denominator)]

    ifd0 = [
        (TAG_MAKE, 2, len(make) + 1, make.encode() + b"\0"),
        (TAG_MODEL, 2, len(model) + 1, model.encode() + b"\0"),
        (TAG_ORIENTATION, 3, 1, [orientation]),
        (TAG_DATETIME, 2, len(datetime) + 1, datetime.encode() + b"\0"),
        (_EXIF_PTR, 4, 1, [(0x9000, 7, 4, b"0230")]),  # ExifVersion
    ]
    if gps is not None:
        lat, lon = gps
        gps_ifd = [
            (_GPS_LAT_REF, 2, 2, (b"N\0" if lat >= 0 else b"S\0")),
            (_GPS_LAT, 5, 3, _dms(lat)),
            (_GPS_LON_REF, 2, 2, (b"E\0" if lon >= 0 else b"W\0")),
            (_GPS_LON, 5, 3, _dms(lon)),
        ]
        ifd0.append((_GPS_PTR, 4, 1, gps_ifd))
    block = serialize_tiff(ifd0)
    if byte_order == "MM":
        # round-trip the canonical block through a byte-swapped
        # re-serialization: parse it, then re-emit big-endian by
        # swapping the serializer's struct order via manual rebuild
        block = _to_big_endian(block)
    if jpeg[:2] != b"\xff\xd8":
        raise ExifError("fixture base is not a JPEG")
    seg = b"\xff\xe1" + struct.pack(">H", len(block) + 8) + b"Exif\x00\x00" + block
    return jpeg[:2] + seg + jpeg[2:]


def _to_big_endian(block: bytes) -> bytes:
    """Re-emit a little-endian TIFF block big-endian (test seam for the
    MM parse path): parse, then serialize with swapped packing."""
    _, ifd0 = parse_tiff(block)

    def swap_ifd(entries: list, base_off: int) -> bytes:
        entries = sorted(entries, key=lambda e: e[0])
        n = len(entries)
        head_len = 2 + 12 * n + 4
        tail = bytearray()
        cells = []
        for tag, typ, count, values in entries:
            if tag in _SUBIFD_TAGS and isinstance(values, list) and typ == 4:
                sub_off = base_off + head_len + len(tail)
                tail += swap_ifd(values, sub_off)
                cells.append((tag, typ, 1, struct.pack(">L", sub_off)))
                continue
            if typ in (2, 7):
                raw = bytes(values)
            elif typ in (5, 10):
                fmt = ">LL" if typ == 5 else ">ll"
                raw = b"".join(struct.pack(fmt, a, b) for a, b in values)
            else:
                fmt = {1: "B", 3: "H", 4: "L", 6: "b", 8: "h", 9: "l"}[typ]
                raw = struct.pack(">" + str(len(values)) + fmt, *values)
            cnt = count if typ in (2, 7) else len(values)
            if len(raw) <= 4:
                cells.append((tag, typ, cnt, raw.ljust(4, b"\0")))
            else:
                voff = base_off + head_len + len(tail)
                tail += raw
                if len(raw) % 2:
                    tail += b"\0"
                cells.append((tag, typ, cnt, struct.pack(">L", voff)))
        out = bytearray(struct.pack(">H", n))
        for tag, typ, cnt, cell in cells:
            out += struct.pack(">HHL", tag, typ, cnt) + cell
        out += struct.pack(">L", 0)
        return bytes(out) + bytes(tail)

    return b"MM" + struct.pack(">HL", 42, 8) + swap_ifd(ifd0, 8)


# --- Spark surfaces ------------------------------------------------------------

EXIF_REPORT_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("has_exif", T.BooleanType()),
        T.StructField("orientation", T.IntegerType()),
        T.StructField("make", T.StringType()),
        T.StructField("model", T.StringType()),
        T.StructField("datetime", T.StringType()),
        T.StructField("has_gps", T.BooleanType()),
        T.StructField("gps_lat_e7", T.LongType()),
        T.StructField("gps_lon_e7", T.LongType()),
    ]
)

SCRUB_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("had_gps", T.BooleanType()),
    ]
)


def exif_report(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-asset EXIF report (Arrow-batched mapInPandas — the
    decode_image shape). Input rows need (id, payload); malformed EXIF
    raises per the loud-rejection policy."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = [parse_exif_jpeg(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "has_exif": [r["has_exif"] for r in rows],
                    "orientation": pd.array(
                        [r["orientation"] for r in rows], dtype="Int32"
                    ),
                    "make": [r["make"] for r in rows],
                    "model": [r["model"] for r in rows],
                    "datetime": [r["datetime"] for r in rows],
                    "has_gps": [r["has_gps"] for r in rows],
                    "gps_lat_e7": pd.array(
                        [r["gps_lat_e7"] for r in rows], dtype="Int64"
                    ),
                    "gps_lon_e7": pd.array(
                        [r["gps_lon_e7"] for r in rows], dtype="Int64"
                    ),
                }
            )

    return assets.select(id_col, payload_col).mapInPandas(
        run, EXIF_REPORT_SCHEMA
    )


def exif_scrub_gps(
    assets: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """GPS-scrubbed payloads: (asset_id, payload, had_gps). The
    privacy boundary op — run before any export; pixels and non-GPS
    metadata survive byte-exactly parseable (pinned)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            pairs = [scrub_gps_jpeg(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "payload": [p for p, _ in pairs],
                    "had_gps": [g for _, g in pairs],
                }
            )

    return assets.select(id_col, payload_col).mapInPandas(run, SCRUB_SCHEMA)

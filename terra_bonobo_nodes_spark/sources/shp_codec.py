"""Pure-Python point-Shapefile codec: .shp/.shx/.dbf in a zip.

The reference's ``ZipShapefileToGeojson`` (``shapefile.py:11-50``)
shells out to GDAL, which is absent here. For the POINT layer — the
shape type the reference's own pipelines ingest — the ESRI Shapefile
format is small enough to implement from the published spec (ESRI
Shapefile Technical Description, 1998; dBASE III header layout), the
same from-spec discipline as ``llm/jpeg.py``: a real codec, never a
faked decode. Writer + reader round-trip bit-exact coordinates
(binary little-endian doubles — no text formatting anywhere in the
geometry path).

Scope (fail-fast beyond it, never guess): shape type 1 (Point) with
optional interspersed type-0 nulls; DBF field types 'N' (numeric) and
'C' (character). Reprojection is NOT implemented — the GeoJSON runner
below requires the ogr2ogr command to target EPSG:4326 and documents
that payloads are assumed to already be in it (a .prj-driven
reprojection needs the GDAL subprocess runner).

Layout facts used (spec section / page):
- .shp: 100-byte header — file code 9994 (big-endian int32), file
  length in 16-bit WORDS (big-endian), version 1000 (little-endian),
  shape type (LE), 8 LE doubles of bbox (x/y/z/m ranges). Records:
  (record number BE, content length in words BE) + content
  (shape type LE int32; Point = 2 LE doubles x, y -> 10 words).
- .shx: same 100-byte header; one (offset words BE, content length
  words BE) pair per record.
- .dbf: version byte 0x03; last-update date (3 bytes, pinned constant
  here for determinism); record count LE int32; header/record sizes
  LE int16; 32-byte field descriptors (11-byte NUL-padded name, type,
  width, decimal count); 0x0D terminator; records = deletion flag
  byte + fixed-width ASCII fields ('N' right-justified, 'C'
  left-justified); 0x1A EOF marker.
"""

from __future__ import annotations

import io
import struct
import zipfile

_SHP_POINT = 1
_SHP_NULL = 0


def write_point_shapefile_zip(
    xs: list[float],
    ys: list[float],
    attrs: dict[str, list],
    base_name: str = "layer",
) -> bytes:
    """Build a zipped point shapefile (.shp + .shx + .dbf). ``attrs``
    maps field name -> per-record values (int -> DBF 'N', str -> 'C';
    field names are truncated to the format's 10-char limit). All three
    members are deterministic bytes (the DBF date byte is pinned), so
    identical inputs produce identical archives."""
    n = len(xs)
    if len(ys) != n or any(len(v) != n for v in attrs.values()):
        raise ValueError("write_point_shapefile_zip: ragged inputs")

    # --- .shp / .shx -------------------------------------------------
    if n:
        bbox = (min(xs), min(ys), max(xs), max(ys))
    else:
        bbox = (0.0, 0.0, 0.0, 0.0)
    rec_words = 10  # int32 shape type + 2 doubles = 20 bytes
    shp_body = io.BytesIO()
    shx_body = io.BytesIO()
    offset_words = 50  # 100-byte header
    for i in range(n):
        shp_body.write(struct.pack(">ii", i + 1, rec_words))
        shp_body.write(struct.pack("<idd", _SHP_POINT, xs[i], ys[i]))
        shx_body.write(struct.pack(">ii", offset_words, rec_words))
        offset_words += 4 + rec_words  # 8-byte record header + content

    def _header(body_len: int) -> bytes:
        return (
            struct.pack(">i", 9994)
            + b"\x00" * 20
            + struct.pack(">i", (100 + body_len) // 2)
            + struct.pack("<ii", 1000, _SHP_POINT)
            + struct.pack("<8d", *bbox, 0.0, 0.0, 0.0, 0.0)
        )

    shp = _header(shp_body.tell()) + shp_body.getvalue()
    shx = _header(shx_body.tell()) + shx_body.getvalue()

    # --- .dbf --------------------------------------------------------
    fields = []  # (name, type, width)
    for name, values in attrs.items():
        if all(isinstance(v, int) and not isinstance(v, bool) for v in values):
            ftype, width = b"N", 18
        elif all(isinstance(v, str) for v in values):
            ftype, width = b"C", max([1] + [len(v.encode("ascii")) for v in values])
            if width > 254:
                raise ValueError(
                    f"DBF 'C' field {name!r} exceeds the format's 254-byte "
                    "width limit"
                )
        else:
            raise ValueError(
                f"attrs[{name!r}]: int ('N') and str ('C') values only — "
                "floats belong in the geometry, not DBF attributes here"
            )
        fields.append((name[:10], ftype, width))
    header_size = 32 + 32 * len(fields) + 1
    record_size = 1 + sum(w for _, _, w in fields)
    dbf = io.BytesIO()
    dbf.write(bytes([0x03, 95, 7, 26]))  # version; pinned update date
    dbf.write(struct.pack("<i", n))
    dbf.write(struct.pack("<hh", header_size, record_size))
    dbf.write(b"\x00" * 20)
    for name, ftype, width in fields:
        dbf.write(name.encode("ascii").ljust(11, b"\x00"))
        dbf.write(ftype)
        dbf.write(b"\x00" * 4)
        dbf.write(bytes([width, 0]))
        dbf.write(b"\x00" * 14)
    dbf.write(b"\x0d")
    names = list(attrs)
    for i in range(n):
        dbf.write(b" ")  # not deleted
        for (fname, ftype, width), name in zip(fields, names):
            v = attrs[name][i]
            raw = str(v).encode("ascii")
            if len(raw) > width:
                raise ValueError(
                    f"DBF value {v!r} wider than field {fname!r} ({width})"
                )
            dbf.write(raw.rjust(width) if ftype == b"N" else raw.ljust(width))
    dbf.write(b"\x1a")

    # --- zip (stored, deterministic metadata) ------------------------
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for ext, data in ((".shp", shp), (".shx", shx), (".dbf", dbf.getvalue())):
            info = zipfile.ZipInfo(f"{base_name}{ext}", date_time=(1995, 7, 26, 0, 0, 0))
            zf.writestr(info, data)
    return buf.getvalue()


def read_point_shapefile_zip(payload: bytes) -> list[dict]:
    """Parse a zipped point shapefile into feature dicts:
    ``{"x", "y", "attrs": {name: str}}`` in record order (null shapes
    are skipped; their DBF rows are skipped with them, keeping the
    1:1 alignment the formats guarantee). Typed failures on anything
    outside the supported profile."""
    zf = zipfile.ZipFile(io.BytesIO(payload))
    shp_name = _single_member(zf, ".shp")
    dbf_name = _single_member(zf, ".dbf", required=False)
    shp = zf.read(shp_name)

    if len(shp) < 100 or struct.unpack(">i", shp[:4])[0] != 9994:
        raise ValueError("not a shapefile: bad .shp file code")
    shape_type = struct.unpack("<i", shp[32:36])[0]
    if shape_type != _SHP_POINT:
        raise NotImplementedError(
            f"shape type {shape_type} unsupported — this codec reads the "
            "POINT layer; use the GDAL subprocess runner for others"
        )
    points: list[tuple[float, float] | None] = []
    pos = 100
    while pos + 8 <= len(shp):
        _recnum, words = struct.unpack(">ii", shp[pos : pos + 8])
        content = shp[pos + 8 : pos + 8 + 2 * words]
        pos += 8 + 2 * words
        rtype = struct.unpack("<i", content[:4])[0]
        if rtype == _SHP_NULL:
            points.append(None)
        elif rtype == _SHP_POINT:
            x, y = struct.unpack("<dd", content[4:20])
            points.append((x, y))
        else:
            raise ValueError(
                f"record shape type {rtype} inside a type-1 file"
            )

    attrs_per_rec: list[dict] = [{} for _ in points]
    if dbf_name is not None:
        dbf = zf.read(dbf_name)
        nrec = struct.unpack("<i", dbf[4:8])[0]
        header_size, record_size = struct.unpack("<hh", dbf[8:12])
        fields = []
        fpos = 32
        while fpos < header_size - 1 and dbf[fpos] != 0x0D:
            name = dbf[fpos : fpos + 11].split(b"\x00")[0].decode("ascii")
            ftype = chr(dbf[fpos + 11])
            width = dbf[fpos + 16]
            if ftype not in ("N", "C"):
                raise NotImplementedError(
                    f"DBF field type {ftype!r} unsupported ('N'/'C' only)"
                )
            fields.append((name, width))
            fpos += 32
        if nrec != len(points):
            raise ValueError(
                f".dbf holds {nrec} records but .shp holds {len(points)}"
            )
        for i in range(nrec):
            rec = dbf[header_size + i * record_size :][:record_size]
            if rec[:1] == b"*":  # deleted row: keep alignment, no attrs
                continue
            off = 1
            for name, width in fields:
                attrs_per_rec[i][name] = (
                    rec[off : off + width].decode("ascii").strip()
                )
                off += width

    return [
        {"x": p[0], "y": p[1], "attrs": attrs_per_rec[i]}
        for i, p in enumerate(points)
        if p is not None
    ]


def _single_member(zf: zipfile.ZipFile, ext: str, required: bool = True):
    names = [n for n in zf.namelist() if n.lower().endswith(ext)]
    if len(names) > 1:
        raise ValueError(f"zip holds {len(names)} {ext} members; expected one")
    if not names:
        if required:
            raise ValueError(f"zip holds no {ext} member")
        return None
    return names[0]


def shapefile_points_geojson_runner(cmd: list[str], payload: bytes) -> bytes:
    """``convert.Runner`` implementing the E5 conversion in-process for
    point layers: unzip, parse .shp/.dbf, emit a GeoJSON
    FeatureCollection (feature id = 1-based FID, ogr2ogr's convention;
    attributes as string properties, matching DBF's text storage).
    Coordinates pass binary-double -> ``repr`` (shortest-roundtrip) ->
    JSON, so they survive exactly. The command must target EPSG:4326.
    A ``.prj`` in the archive is honored as a declaration only: WGS84
    names pass through, anything else fails typed (this runner cannot
    reproject — that is the GDAL runner's job); no ``.prj`` keeps the
    assume-4326 contract."""
    import json as _json

    if "EPSG:4326" not in cmd:
        raise ValueError(
            "shapefile_points_geojson_runner: only -t_srs EPSG:4326 is "
            f"supported (command: {cmd!r}); reprojection needs the GDAL "
            "subprocess runner"
        )
    # honor a .prj if the archive carries one: WGS84 passes through; any
    # other named CRS would need actual reprojection — fail typed rather
    # than emit coordinates silently mislabeled as 4326. (No .prj keeps
    # the documented assume-4326 contract.)
    zf = zipfile.ZipFile(io.BytesIO(payload))
    prj_name = _single_member(zf, ".prj", required=False)
    if prj_name is not None:
        wkt = zf.read(prj_name).decode("ascii", errors="replace")
        if not any(m in wkt for m in ("GCS_WGS_1984", "WGS 84", "WGS84", "4326")):
            raise NotImplementedError(
                f"shapefile .prj declares a non-WGS84 CRS ({wkt[:80]!r}...) — "
                "reprojection needs the GDAL subprocess runner"
            )
    features = [
        {
            "type": "Feature",
            "id": str(i + 1),
            "geometry": {"type": "Point", "coordinates": [f["x"], f["y"]]},
            "properties": f["attrs"],
        }
        for i, f in enumerate(read_point_shapefile_zip(payload))
    ]
    return _json.dumps(
        {
            "type": "FeatureCollection",
            "crs": {"type": "name", "properties": {"name": "EPSG:4326"}},
            "features": features,
        }
    ).encode("utf-8")

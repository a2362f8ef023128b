"""ISO WKB / WKT / GeoJSON codecs for the geometry kernel.

Geometry model: tagged tuples ``(kind, data)``
- ``("Point", (x, y) | (x, y, z))`` — NaN coords encode POINT EMPTY
- ``("LineString", [(x, y), ...])``
- ``("Polygon", [ring, ...])`` — ring = list of coord tuples, closed
- ``("MultiPoint", [point_data, ...])``
- ``("MultiLineString", [line_data, ...])``
- ``("MultiPolygon", [polygon_data, ...])``
- ``("GeometryCollection", [geom, ...])`` — geom = tagged tuple

Capability parity: the reference round-trips geometries through
GEOSGeometry (WKT/WKB/GeoJSON accepted at ``common.py:286-312``,
EWKT logging at ``common.py:449-455``, GeoJSON out at
``common.py:345-366``). ISO WKB type codes (Z = +1000); no SRID in the
byte stream — CRS is a column-level convention (EPSG:4326).
"""

from __future__ import annotations

import json
import math
import re
import struct
from typing import Any

Geom = tuple[str, Any]

_KINDS = (
    "Point",
    "LineString",
    "Polygon",
    "MultiPoint",
    "MultiLineString",
    "MultiPolygon",
    "GeometryCollection",
)
_CODE = {k: i + 1 for i, k in enumerate(_KINDS)}
_KIND = {v: k for k, v in _CODE.items()}

POINT_EMPTY: Geom = ("Point", (math.nan, math.nan))


def is_empty(g: Geom | None) -> bool:
    if g is None:
        return True
    kind, data = g
    if kind == "Point":
        return math.isnan(data[0])
    return len(data) == 0


# --- WKB ---------------------------------------------------------------------


def _read_geom(buf: bytes, off: int) -> tuple[Geom, int]:
    bo = "<" if buf[off] == 1 else ">"
    (code,) = struct.unpack_from(bo + "I", buf, off + 1)
    off += 5
    has_z = code >= 1000
    base = code % 1000
    kind = _KIND[base]
    dim = 3 if has_z else 2

    def read_coords(n: int, off: int):
        vals = struct.unpack_from(bo + "d" * (n * dim), buf, off)
        return (
            [tuple(vals[i * dim : (i + 1) * dim]) for i in range(n)],
            off + 8 * n * dim,
        )

    if kind == "Point":
        pts, off = read_coords(1, off)
        return (kind, pts[0]), off
    if kind == "LineString":
        (n,) = struct.unpack_from(bo + "I", buf, off)
        pts, off = read_coords(n, off + 4)
        return (kind, pts), off
    if kind == "Polygon":
        (nr,) = struct.unpack_from(bo + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(bo + "I", buf, off)
            ring, off = read_coords(n, off + 4)
            rings.append(ring)
        return (kind, rings), off
    # multi/collection: nested full geometries
    (n,) = struct.unpack_from(bo + "I", buf, off)
    off += 4
    parts = []
    for _ in range(n):
        sub, off = _read_geom(buf, off)
        parts.append(sub if kind == "GeometryCollection" else sub[1])
    return (kind, parts), off


def parse_wkb(buf: bytes | None) -> Geom | None:
    if buf is None or len(buf) == 0:
        return None
    geom, _ = _read_geom(bytes(buf), 0)
    return geom


def _write_geom(g: Geom, out: bytearray) -> None:
    kind, data = g
    dim = 2
    if kind == "Point" and len(data) == 3:
        dim = 3
    elif kind == "LineString" and data and len(data[0]) == 3:
        dim = 3
    elif kind == "Polygon" and data and data[0] and len(data[0][0]) == 3:
        dim = 3
    code = _CODE[kind] + (1000 if dim == 3 else 0)
    out += struct.pack("<BI", 1, code)
    if kind == "Point":
        out += struct.pack("<" + "d" * len(data), *data)
        return
    if kind == "LineString":
        out += struct.pack("<I", len(data))
        for pt in data:
            out += struct.pack("<" + "d" * len(pt), *pt)
        return
    if kind == "Polygon":
        out += struct.pack("<I", len(data))
        for ring in data:
            out += struct.pack("<I", len(ring))
            for pt in ring:
                out += struct.pack("<" + "d" * len(pt), *pt)
        return
    out += struct.pack("<I", len(data))
    sub_kind = kind[5:] if kind.startswith("Multi") else None
    for part in data:
        _write_geom(part if sub_kind is None else (sub_kind, part), out)


def write_wkb(g: Geom | None) -> bytes | None:
    if g is None:
        return None
    out = bytearray()
    _write_geom(g, out)
    return bytes(out)


# --- WKT ---------------------------------------------------------------------


def _fmt_num(v: float) -> str:
    if v == int(v) and abs(v) < 1e16:
        return str(int(v))
    s = f"{v:.17g}"
    # never rstrip scientific notation: 'e-300'.rstrip('0') -> 'e-3'
    if "e" in s or "E" in s:
        return s
    return s.rstrip("0").rstrip(".")


def _wkt_coords(data, depth: int) -> str:
    if depth == 0:
        return " ".join(_fmt_num(c) for c in data)
    inner = ", ".join(_wkt_coords(d, depth - 1) for d in data)
    return f"({inner})"


def write_wkt(g: Geom | None) -> str | None:
    if g is None:
        return None
    kind, data = g
    name = kind.upper()
    if is_empty(g):
        return f"{name} EMPTY"
    if kind == "Point":
        return f"POINT ({_wkt_coords(data, 0)})"
    if kind == "LineString":
        return f"LINESTRING {_wkt_coords(data, 1)}"
    if kind == "Polygon":
        return f"POLYGON {_wkt_coords(data, 2)}"
    if kind == "MultiPoint":
        inner = ", ".join(f"({_wkt_coords(p, 0)})" for p in data)
        return f"MULTIPOINT ({inner})"
    if kind == "MultiLineString":
        return f"MULTILINESTRING {_wkt_coords(data, 2)}"
    if kind == "MultiPolygon":
        return f"MULTIPOLYGON {_wkt_coords(data, 3)}"
    inner = ", ".join(write_wkt(sub) for sub in data)
    return f"GEOMETRYCOLLECTION ({inner})"


_WKT_HEAD = re.compile(r"^\s*([A-Za-z]+)\s*(Z|ZM|M)?\s*(EMPTY|\()", re.I)


def _parse_nums(text: str):
    return [float(t) for t in text.replace(",", " ").split()]


def _split_parens(body: str) -> list[str]:
    """Split a paren-group body on top-level commas."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(body[start:i])
            start = i + 1
    parts.append(body[start:])
    return [p.strip() for p in parts]


def _strip_outer(s: str) -> str:
    s = s.strip()
    if not (s.startswith("(") and s.endswith(")")):
        raise ValueError(f"bad WKT fragment: {s[:40]!r}")
    return s[1:-1]


def parse_wkt(text: str | None) -> Geom | None:
    if text is None or not text.strip():
        return None
    m = _WKT_HEAD.match(text)
    if not m:
        raise ValueError(f"bad WKT: {text[:60]!r}")
    name = m.group(1).lower()
    kinds = {k.lower(): k for k in _KINDS}
    if name not in kinds:
        raise ValueError(f"unknown WKT type {name!r}")
    kind = kinds[name]
    if m.group(3).upper() == "EMPTY":
        return POINT_EMPTY if kind == "Point" else (kind, [])
    body = _strip_outer(text[text.index("(") :])
    if kind == "Point":
        return (kind, tuple(_parse_nums(body)))
    if kind == "LineString":
        return (kind, [tuple(_parse_nums(p)) for p in _split_parens(body)])
    if kind == "Polygon":
        return (
            kind,
            [
                [tuple(_parse_nums(p)) for p in _split_parens(_strip_outer(r))]
                for r in _split_parens(body)
            ],
        )
    if kind == "MultiPoint":
        pts = []
        for p in _split_parens(body):
            p = p.strip()
            pts.append(tuple(_parse_nums(p[1:-1] if p.startswith("(") else p)))
        return (kind, pts)
    if kind == "MultiLineString":
        return (
            kind,
            [
                [tuple(_parse_nums(p)) for p in _split_parens(_strip_outer(ln))]
                for ln in _split_parens(body)
            ],
        )
    if kind == "MultiPolygon":
        polys = []
        for poly in _split_parens(body):
            rings = [
                [tuple(_parse_nums(p)) for p in _split_parens(_strip_outer(r))]
                for r in _split_parens(_strip_outer(poly))
            ]
            polys.append(rings)
        return (kind, polys)
    return (kind, [parse_wkt(sub) for sub in _split_parens(body)])


# --- GeoJSON -----------------------------------------------------------------


def _deep_tuple(coords):
    if coords and isinstance(coords[0], (int, float)):
        return tuple(float(c) for c in coords)
    return [_deep_tuple(c) for c in coords]


def from_geojson(obj: dict | str | None) -> Geom | None:
    """GeoJSON geometry dict (or JSON string) -> Geom.

    Mirrors GEOSGeometry(json) acceptance at ``common.py:297-303``.
    """
    if obj is None:
        return None
    if isinstance(obj, (str, bytes)):
        obj = json.loads(obj)
    kind = obj["type"]
    if kind == "GeometryCollection":
        return (kind, [from_geojson(g) for g in obj["geometries"]])
    coords = obj["coordinates"]
    if kind == "Point" and not coords:
        return POINT_EMPTY
    return (kind, _deep_tuple(coords))


def _deep_list(data):
    if isinstance(data, tuple):
        return list(data)
    return [_deep_list(d) for d in data]


def to_geojson(g: Geom | None) -> dict | None:
    """Geom -> GeoJSON geometry dict (``GeometryToJson``, ``common.py:345-366``)."""
    if g is None:
        return None
    kind, data = g
    if kind == "GeometryCollection":
        return {"type": kind, "geometries": [to_geojson(sub) for sub in data]}
    if kind == "Point":
        return {"type": kind, "coordinates": [] if is_empty(g) else list(data)}
    return {"type": kind, "coordinates": _deep_list(data)}

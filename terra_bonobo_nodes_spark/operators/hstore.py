"""hstore tag-string parsing (OSM ``other_tags`` columns).

Capability parity with ``Ogr2ogrGeojson2Geojson``
(``terra_bonobo_nodes/osm.py:99-119``): parse a PostgreSQL-hstore-style
string ``"k"=>"v","k2"=>"v2"`` into a map / top-level columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hstore_to_map(col: Column | str) -> Column:
    """``"a"=>"1","b"=>"2"`` -> ``map(a -> 1, b -> 2)``.

    Pure built-ins: strip the outer quotes, then ``str_to_map`` on the
    inner ``","`` / ``"=>"`` delimiters (reference splitter at
    ``osm.py:110-112``). Malformed input (no ``=>``) yields a map whose
    value is NULL — surfaced, not swallowed; callers can assert like the
    reference's ``ValueError`` path.
    """
    c = F.col(col) if isinstance(col, str) else col
    inner = F.regexp_replace(c, '^"|"$', "")
    return F.str_to_map(inner, F.lit('","'), F.lit('"=>"'))


def parse_hstore_tags(
    df: DataFrame,
    col: str = "other_tags",
    keys: Sequence[str] = (),
    prefix: str = "tag_",
    drop_source: bool = True,
) -> DataFrame:
    """Merge hstore tags into top-level columns.

    With ``keys`` given, extracts exactly those (missing -> NULL). Rows
    where ``col`` is NULL pass through unchanged (reference pass-through
    when key absent, ``osm.py:105-107``).
    """
    m = hstore_to_map(col)
    out = df.withColumns({f"{prefix}{k}": m.getItem(k) for k in keys})
    return out.drop(col) if drop_source else out

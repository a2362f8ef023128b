"""External-service enrichment (SURVEY §2.8): routing-API operators.

The reference calls a GraphHopper HTTP API per row (isochrones, transit
times). The engine expresses these as ``mapInPandas`` operators with an
injectable client *factory*: one client per partition (connection reuse,
the per-partition-singleton pattern), Arrow batches in/out. Tests inject
deterministic fakes — the same strategy as the reference's mocked
``requests.Session`` (``test_common.py:516-527``, ``test_terra.py:208-217``).

At scale the win over the reference is concurrency: N partitions fetch
in parallel with bounded fan-out, instead of one generator thread.
"""

from __future__ import annotations

import math
from collections.abc import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terra_bonobo_nodes_spark.geo import wkb as W


def isochrone_calculation(
    df: DataFrame,
    client_factory: Callable[[], Callable[[float, float, dict], list[dict]]],
    params: dict | None = None,
    x_col: str = "x",
    y_col: str = "y",
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """``IsochroneCalculation`` (``common.py:459-516``).

    ``client(x, y, params) -> [{"bucket": int, "geometry": geojson_dict}]``
    — one isochrone polygon per time bucket; response polygons explode
    into rows (``common.py:507-513``). A client exception for a row logs
    and emits nothing for it (``common.py:505-506`` JSONDecodeError
    contract).
    """
    params = dict(params or {"time_limit": 600, "buckets": 3, "vehicle": "car"})
    schema = ", ".join(
        [*(f"{c} STRING" for c in keep_cols), "bucket INT", "geom BINARY"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in keep_cols}
            out["bucket"] = []
            out["geom"] = []
            for i in range(len(pdf)):
                try:
                    polys = client(float(pdf[x_col].iloc[i]), float(pdf[y_col].iloc[i]), params)
                except Exception:
                    continue  # reference: log + emit nothing
                for p in polys:
                    for c in keep_cols:
                        out[c].append(str(pdf[c].iloc[i]))
                    out["bucket"].append(int(p.get("bucket", 0)))
                    out["geom"].append(W.write_wkb(W.from_geojson(p["geometry"])))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema)


def transit_time_one_to_many(
    df: DataFrame,
    client_factory: Callable[[], Callable[[float, float, float, float, str], float | None]],
    vehicles: Sequence[str] = ("car",),
    points_col: str = "points",  # array<array<double>> of [x, y] targets
    x_col: str = "x",
    y_col: str = "y",
    out: str = "times",
) -> DataFrame:
    """``TransitTimeOneToMany`` (``terra.py:334-394``).

    For each row: ``times[i][j]`` = client route time from target point
    i to the row's origin, by vehicle j — route failures yield None
    cells (``terra.py:386-390``). Origin-last argument order preserves
    the reference's one-way-respecting direction (``terra.py:366-376``).
    """
    schema_cols = [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
    schema = ", ".join([*schema_cols, f"{out} ARRAY<ARRAY<DOUBLE>>"])
    vehicles = list(vehicles)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        for pdf in batches:
            times_col = []
            for i in range(len(pdf)):
                pts = pdf[points_col].iloc[i]
                if pts is None or len(pts) == 0:
                    times_col.append(None)  # empty -> no property (terra.py:433-434)
                    continue
                matrix = []
                for pt in pts:
                    row = []
                    for v in vehicles:
                        try:
                            t = client(
                                float(pt[0]),
                                float(pt[1]),
                                float(pdf[x_col].iloc[i]),
                                float(pdf[y_col].iloc[i]),
                                v,
                            )
                        except Exception:
                            t = None  # terra.py:386-390
                        row.append(None if t is None else float(t))
                    matrix.append(row)
                times_col.append(matrix)
            res = pdf.copy()
            res[out] = times_col
            yield res

    return df.mapInPandas(run, schema)


def transit_time_one_to_one(df: DataFrame, times_col: str = "times", out: str = "times") -> DataFrame:
    """``TransitTimeOneToOne`` (``terra.py:397-409``): scalar
    specialization ``times := times[0][0]`` (None-safe) — pure Column
    expression, no UDF."""
    first = F.element_at(F.element_at(F.col(times_col), 1), 1)
    return df.withColumn(out, first)


def manhattan_fake_client_factory(scale: float = 1.0):
    """Deterministic stand-in router for tests/oracles: time = scaled
    manhattan distance, doubled for each later vehicle slot."""

    speeds = {"car": 1.0, "bike": 2.0, "foot": 5.0}

    def factory():
        def route(px: float, py: float, ox: float, oy: float, vehicle: str) -> float:
            return (abs(px - ox) + abs(py - oy)) * scale * speeds.get(vehicle, 10.0)

        return route

    return factory


def square_isochrone_client_factory(size_per_bucket: float = 1.0, buckets: int = 3):
    """Deterministic isochrone fake: concentric squares centered on the
    origin, half-side = size_per_bucket * (bucket+1)."""

    def factory():
        def isochrone(x: float, y: float, params: dict) -> list[dict]:
            n = int(params.get("buckets", buckets))
            out = []
            for b in range(n):
                r = size_per_bucket * (b + 1)
                ring = [
                    [x - r, y - r],
                    [x + r, y - r],
                    [x + r, y + r],
                    [x - r, y + r],
                    [x - r, y - r],
                ]
                out.append(
                    {"bucket": b, "geometry": {"type": "Polygon", "coordinates": [ring]}}
                )
            return out

        return isochrone

    return factory

"""Shared fixtures: one SparkSession per test session + a DuckDB oracle
comparator that mirrors the driver's correctness check (row-count,
column names, order-insensitive value comparison)."""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Driver-budget profile (pytest.ini): the measured-slowest tests carry
# the `slow` marker, applied here from one data file instead of 25
# scattered decorators. pytest.ini's addopts deselects them by default;
# `pytest -m "slow or not slow"` runs the full suite.
_SLOW_LIST = Path(__file__).with_name("slow_tests.txt")


def pytest_collection_modifyitems(config, items):
    try:
        slow_ids = {
            ln.strip()
            for ln in _SLOW_LIST.read_text().splitlines()
            if ln.strip() and not ln.startswith("#")
        }
    except OSError:
        return
    matched = set()
    for item in items:
        # durations log records `tests/file.py::test[param]`; nodeids
        # during a `tests/` run match exactly. Parametrized entries in
        # the list name the exact id; a bare id also marks every param.
        nid = item.nodeid
        base = nid.split("[", 1)[0]
        if nid in slow_ids or base in slow_ids:
            item.add_marker(pytest.mark.slow)
            matched.add(nid if nid in slow_ids else base)
    stale = slow_ids - matched
    # a partial run (one file) legitimately matches few entries — only
    # flag rot when the whole suite was collected
    if stale and len(items) > 1000:
        import warnings

        warnings.warn(
            f"tests/slow_tests.txt has {len(stale)} entries matching no "
            f"collected test (first: {sorted(stale)[:3]}) — prune the list",
            stacklevel=1,
        )


@pytest.fixture(scope="session")
def spark():
    from terra_bonobo_nodes_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(v):
    """Canonicalize a cell for order-insensitive comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if hasattr(v, "tolist") and not hasattr(v, "isoformat"):
        # numpy scalar or ndarray (duckdb fetchdf round-trips lists)
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def assert_matches_oracle(spark_df, duck_con, sql: str, check_exact: bool = True):
    """Mirror of the driver's compare: same row count, same column names,
    same multiset of rows (columns sorted by name; floats canonicalized
    to 9 significant digits)."""
    sdf = spark_df.toPandas()
    odf = duck_con.execute(sql).fetchdf()
    assert sorted(sdf.columns) == sorted(
        odf.columns
    ), f"columns differ: {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    cols = sorted(sdf.columns)
    assert len(sdf) == len(odf), f"row count {len(sdf)} vs {len(odf)}"
    srows = sorted(tuple(_canon(v) for v in row) for row in sdf[cols].itertuples(index=False))
    orows = sorted(tuple(_canon(v) for v in row) for row in odf[cols].itertuples(index=False))
    mismatches = [
        (a, b) for a, b in zip(srows, orows) if a != b
    ]
    assert srows == orows, f"value mismatch; first diffs: {mismatches[:3]}"

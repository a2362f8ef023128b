"""Round-13 candidate rows (plans/queries_candidates.py) verified
against their DuckDB oracles with the driver's exact compare contract
— so promotion in round 13 is a registration edit, not new work."""

from __future__ import annotations

import duckdb
import pytest

from terra_bonobo_nodes_spark.plans.queries_candidates import CANDIDATES
from tests.check_driver import TABLES, _hash
from tests.conftest import SF_DIR


@pytest.mark.parametrize("name", sorted(CANDIDATES))
def test_candidate_matches_oracle(spark, name):
    spark_fn, oracle = CANDIDATES[name]
    sdf = spark_fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    res = con.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows), (len(srows), len(orows))
    assert _hash(scols, srows) == _hash(ocols, orows)
    assert len(srows) > 0

"""The local correctness gate: every registered query with an oracle must
hash-match DuckDB on the same parquet — exactly what the driver does at
sf0.01, run here at sf0.001 for speed."""

from __future__ import annotations

import pytest

from terra_bonobo_nodes_spark.plans.registry import all_queries
from tests.conftest import SF_DIR, assert_matches_oracle

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    q = QUERIES[name]
    df = q.spark_fn(spark, SF_DIR)
    assert df.columns, f"{name}: empty schema"
    if q.oracle is None:
        # rows-only check, mirroring the driver's weaker path
        assert df.count() >= 0
        return
    assert_matches_oracle(df, duck, q.oracle)

"""Round-16 review/advice fixes, pinned.

1. ADVICE_r16 #1: _ISO_ORACLE's user_id equi-joins vs NULL strata —
   the staged null-safe twin (_ISO_ORACLE_NULLSAFE) must agree with
   the Spark grouped-map fit on a fixture that HAS a NULL-user_id
   group, and must be a pure null-safety widening (identical result
   on the real tables, where no NULL user_id exists).
"""

from __future__ import annotations

import duckdb

from tests.check_driver import TABLES, _hash
from tests.conftest import SF_DIR


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    res = con.execute(sql)
    return [d[0] for d in res.description], res.fetchall()


def test_iso_nullsafe_oracle_keeps_the_null_user_stratum(spark, tmp_path):
    """A NULL user_id is a real group for Spark's groupBy+applyInPandas;
    the null-safe oracle must keep it too (the registered _ISO_ORACLE
    drops it — the exact latent divergence ADVICE_r16 flagged)."""
    import pandas as pd

    from terra_bonobo_nodes_spark.plans.queries_relational import (
        _ISO_ORACLE,
        _ISO_ORACLE_NULLSAFE,
        t6_isotonic_value_fit,
    )

    # events fixture: one real user with a PAVA violation, one NULL-user
    # stratum with its own violation (so the fix changes real values,
    # not just row presence).
    rows = pd.DataFrame(
        {
            "user_id": pd.array(
                [7, 7, 7, None, None, None], dtype="Int64"
            ),
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:00:10",
                    "2024-01-01 00:00:20",
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:00:10",
                    "2024-01-01 00:00:20",
                ]
            ),
            "value": [3.0, 1.0, 2.0, 10.0, 4.0, 40.0],
        }
    )
    sf_dir = tmp_path / "sf"
    sf_dir.mkdir()
    spark.createDataFrame(rows).write.parquet(str(sf_dir / "events.parquet"))

    sdf = t6_isotonic_value_fit(spark, str(sf_dir))
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    assert any(r[0] is None for r in srows), "fixture lost its NULL group"

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    res = con.execute(_ISO_ORACLE_NULLSAFE)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _hash(scols, srows) == _hash(ocols, orows)

    # and the REGISTERED oracle demonstrably drops the stratum — the
    # reason the swap is scheduled, not a hypothetical:
    old = con.execute(_ISO_ORACLE).fetchall()
    assert len(old) == len(orows) - 3


def _formatted_plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_record_ops_surface_plan_shape(spark):
    """The r17 consolidation surface's scale contract, pinned: the P5
    kept/dropped predicates BOTH push to the parquet scan (the
    partition-union must not devolve into post-scan filters), joins
    broadcast, and nothing goes cartesian."""
    from terra_bonobo_nodes_spark.plans.queries_candidates import (
        p_record_ops_surface,
    )
    from tests.conftest import SF_DIR

    plan = _formatted_plan(p_record_ops_surface(spark, SF_DIR))
    assert "Cartesian" not in plan
    assert "GreaterThan(l_quantity,30.0)" in plan  # kept branch pushed
    assert "LessThanOrEqual(l_quantity,30.0)" in plan  # dropped branch pushed
    # column pruning reaches the scan: the mins branch reads 2 columns
    assert "struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_scalar_geometry_surface_plan_shape(spark):
    from terra_bonobo_nodes_spark.plans.queries_candidates import (
        g_scalar_geometry_surface,
    )
    from tests.conftest import SF_DIR

    plan = _formatted_plan(g_scalar_geometry_surface(spark, SF_DIR))
    assert "Cartesian" not in plan
    # both supplier scans prune to the 2 used columns
    assert plan.count("struct<s_suppkey:bigint,s_acctbal:double>") >= 2


def test_oracle_join_keys_have_no_nulls_in_fixtures():
    """Round-16 sweep: several registered oracles still join on plain
    equality over keys that Spark's groupBy would keep as NULL groups
    (documents.source/lang, events.user_id/event_type — e.g. the asof
    rows, the r13 funnel source joins, _ISO_ORACLE until its r17
    null-safe swap). Every one is LATENT-ONLY because the driver
    fixtures contain no NULLs in those keys. This test pins that
    assumption: if a testdata regeneration ever ships NULL keys, the
    latent class goes LIVE and this fails loudly, naming the columns,
    instead of surfacing as an unexplained hash mismatch two rounds
    later."""
    import duckdb

    bad = []
    for table, cols in (
        ("documents", ["source", "lang"]),
        ("events", ["user_id", "event_type"]),
    ):
        for c in cols:
            n = duckdb.sql(
                f"SELECT count(*) FROM read_parquet('{SF_DIR}/{table}.parquet')"
                f" WHERE {c} IS NULL"
            ).fetchone()[0]
            if n:
                bad.append((table, c, n))
    assert not bad, (
        f"NULLs appeared in oracle join keys {bad} — convert the "
        "plain-equality oracle joins on these columns to IS NOT "
        "DISTINCT FROM (see the _ISO_ORACLE_NULLSAFE precedent) before "
        "trusting CORRECTNESS rows that touch them"
    )


def test_iso_nullsafe_oracle_is_identical_on_real_tables():
    """On the driver tables (no NULL user_id) the twin is a pure
    rewrite: same columns, same rows, same value hash — so the r17
    registration swap cannot move the row's green status."""
    from terra_bonobo_nodes_spark.plans.queries_relational import (
        _ISO_ORACLE,
        _ISO_ORACLE_NULLSAFE,
    )

    c1, r1 = _duck(SF_DIR, _ISO_ORACLE)
    c2, r2 = _duck(SF_DIR, _ISO_ORACLE_NULLSAFE)
    assert c1 == c2
    assert len(r1) == len(r2) > 0
    assert _hash(c1, r1) == _hash(c2, r2)

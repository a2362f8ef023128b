"""PSI distribution drift (operators/quality.py::distribution_drift):
hand-computed exactness, identical-distribution zero, known-shift
magnitude, smoothing on empty buckets, SQL mirror."""

from __future__ import annotations

import math

from terra_bonobo_nodes_spark.operators.quality import (
    distribution_drift,
    distribution_drift_sql,
)


def _df(spark, buckets):
    return spark.createDataFrame([(b,) for b in buckets], "b long")


def test_identical_distributions_zero_psi(spark):
    old = _df(spark, [1] * 50 + [2] * 30 + [3] * 20)
    got = distribution_drift(old, old, "b").collect()
    assert all(r["psi_term"] == 0.0 for r in got)
    assert {r["bucket"]: r["share_old_ppm"] for r in got} == {
        1: 500000, 2: 300000, 3: 200000,
    }


def test_hand_computed_shift(spark):
    old = _df(spark, [1] * 80 + [2] * 20)
    new = _df(spark, [1] * 20 + [2] * 80)
    got = {r["bucket"]: r for r in distribution_drift(old, new, "b").collect()}
    p1, q1 = 81 / 102, 21 / 102
    assert got[1]["psi_term"] == round((p1 - q1) * math.log(p1 / q1), 6)
    total = sum(r["psi_term"] for r in got.values())
    assert total > 1.0  # a swapped 80/20 is a massive shift


def test_empty_bucket_smoothing_finite(spark):
    old = _df(spark, [1] * 10)
    new = _df(spark, [2] * 10)
    got = {r["bucket"]: r for r in distribution_drift(old, new, "b").collect()}
    assert got[1]["n_new"] == 0 and got[2]["n_old"] == 0
    for r in got.values():
        assert math.isfinite(r["psi_term"])
    # smoothed shares: bucket 1 p=(10+1)/12, q=(0+1)/12
    p, q = 11 / 12, 1 / 12
    assert got[1]["psi_term"] == round((p - q) * math.log(p / q), 6)


def test_sql_mirror(spark, duck):
    old_b = [i % 7 for i in range(200)]
    new_b = [(i * 3) % 5 for i in range(150)]
    got = sorted(
        tuple(r)
        for r in distribution_drift(
            _df(spark, old_b), _df(spark, new_b), "b"
        ).collect()
    )
    duck.execute(
        "CREATE OR REPLACE TABLE dd_old AS SELECT * FROM (VALUES "
        + ", ".join(f"({b})" for b in old_b) + ") t(b)"
    )
    duck.execute(
        "CREATE OR REPLACE TABLE dd_new AS SELECT * FROM (VALUES "
        + ", ".join(f"({b})" for b in new_b) + ") t(b)"
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            distribution_drift_sql(
                "SELECT * FROM dd_old", "SELECT * FROM dd_new", "b"
            )
        ).fetchall()
    )
    assert got == want

"""Conversion funnels + cohort retention (operators/funnels.py):
in-order semantics hand cases, a python reference sweep, ppm
exactness, and the DuckDB mirrors."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from terra_bonobo_nodes_spark.operators.funnels import (
    cohort_retention,
    cohort_retention_sql,
    conversion_funnel,
    conversion_funnel_sql,
)

T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, T0 + dt.timedelta(hours=h)) for u, t, h in rows],
        "user_id long, event_type string, ts timestamp",
    )


def _py_funnel(rows, steps):
    by_u = {}
    for u, t, h in rows:
        if u is not None and t in steps:
            by_u.setdefault(u, []).append((t, h))
    counts = [0] * len(steps)
    for u, evs in by_u.items():
        per = {s: sorted(h for t, h in evs if t == s) for s in steps}
        t_prev = per[steps[0]][0] if per[steps[0]] else None
        if t_prev is None:
            continue
        counts[0] += 1
        for i, s in enumerate(steps[1:], 1):
            nxt = next((h for h in per[s] if h >= t_prev), None)
            if nxt is None:
                break
            counts[i] += 1
            t_prev = nxt
    return counts


def test_in_order_semantics(spark):
    rows = [
        (1, "view", 0), (1, "click", 1), (1, "purchase", 2),   # full
        (2, "purchase", 0), (2, "view", 1), (2, "click", 2),   # buy first: stops at click
        (3, "view", 0), (3, "purchase", 1),                    # skips click
        (4, "click", 0),                                       # never viewed
    ]
    got = {
        r["step"]: (r["n_users"], r["conversion_ppm"])
        for r in conversion_funnel(
            _ev(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    # view: 1,2,3; click-after-view: 1,2; purchase-after-that: 1 only
    assert got == {
        "view": (3, 1000000),
        "click": (2, 666666),
        "purchase": (1, 333333),
    }


def test_repeat_events_use_earliest_valid(spark):
    # user does view(h5); clicks at h1 (too early) and h7 (valid)
    rows = [(1, "view", 5), (1, "click", 1), (1, "click", 7)]
    got = {
        r["step"]: r["n_users"]
        for r in conversion_funnel(_ev(spark, rows), ["view", "click"]).collect()
    }
    assert got == {"view": 1, "click": 1}


def test_funnel_guards(spark):
    df = _ev(spark, [(1, "view", 0)])
    with pytest.raises(ValueError):
        conversion_funnel(df, ["view"])
    with pytest.raises(ValueError):
        conversion_funnel(df, ["view", "view"])


@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 6),
            st.sampled_from(["a", "b", "c", "x"]),
            st.integers(0, 40),
        ),
        min_size=0,
        max_size=50,
    )
)
@settings(max_examples=10, deadline=None)
def test_funnel_matches_python_reference(spark, rows):
    steps = ["a", "b", "c"]
    got = {
        r["step_index"]: r["n_users"]
        for r in conversion_funnel(_ev(spark, rows), steps).collect()
    }
    want = _py_funnel(rows, steps)
    assert [got[i + 1] for i in range(3)] == want


def test_funnel_sql_mirror(spark, duck):
    rows = [
        (u, t, h)
        for u in range(1, 8)
        for t, h in [("view", u), ("click", 2 * u % 9), ("purchase", 3 * u % 11)]
    ]
    steps = ["view", "click", "purchase"]
    got = sorted(
        tuple(r) for r in conversion_funnel(_ev(spark, rows), steps).collect()
    )
    duck.execute(
        "CREATE OR REPLACE TABLE cf_raw AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({u}, '{t}', TIMESTAMP '2024-01-01' + INTERVAL {h} HOUR)"
            for u, t, h in rows
        )
        + ") t(user_id, event_type, ts)"
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            conversion_funnel_sql("SELECT * FROM cf_raw", steps)
        ).fetchall()
    )
    assert got == want


def test_retention_triangle(spark):
    # cohort A (week of Jan 1): users 1,2; user 1 returns next week
    # cohort B (week of Jan 8): user 3
    rows = [
        (1, "view", 0), (2, "view", 1),
        (1, "view", 24 * 7 + 1),
        (3, "view", 24 * 7 + 2),
    ]
    got = {
        (r["cohort_epoch"], r["period_offset"]): (
            r["n_users"], r["retention_ppm"]
        )
        for r in cohort_retention(_ev(spark, rows)).collect()
    }
    w0 = int(dt.datetime(2024, 1, 1).timestamp())
    w1 = w0 + 7 * 86400
    assert got == {
        (w0, 0): (2, 1000000),
        (w0, 1): (1, 500000),
        (w1, 0): (1, 1000000),
    }
    with pytest.raises(ValueError):
        cohort_retention(_ev(spark, rows), period="month")


def test_retention_sql_mirror(spark, duck):
    rows = [(u, "e", (u * 37) % 500) for u in range(1, 30)] + [
        (u, "e", 200 + (u * 53) % 400) for u in range(1, 30)
    ]
    got = sorted(
        tuple(r) for r in cohort_retention(_ev(spark, rows)).collect()
    )
    duck.execute(
        "CREATE OR REPLACE TABLE cr_raw AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({u}, TIMESTAMP '2024-01-01' + INTERVAL {h} HOUR)"
            for u, _, h in rows
        )
        + ") t(user_id, ts)"
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            cohort_retention_sql("SELECT * FROM cr_raw")
        ).fetchall()
    )
    assert got == want

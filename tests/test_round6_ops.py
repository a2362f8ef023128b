"""Unit tests for the round-6 operators: CDC apply-changes, batch
sessionization, BM25 retrieval, golden-record merge."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F


# --- CDC --------------------------------------------------------------------


def _cdc_frames(spark):
    base = spark.createDataFrame(
        [(1, "a0"), (2, "b0"), (3, "c0")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            # k=1: update then delete (delete has the higher seq -> gone)
            (1, 10, "U", "a1"),
            (1, 20, "D", None),
            # k=2: out-of-order arrivals, the highest seq wins
            (2, 31, "U", "b2"),
            (2, 30, "U", "b1"),
            # k=4: pure insert of a key the snapshot never had
            (4, 40, "I", "d0"),
        ],
        "k long, seq long, op string, v string",
    )
    return base, changes


def test_apply_changes_semantics(spark):
    from terra_bonobo_nodes_spark.operators.cdc import apply_changes

    base, changes = _cdc_frames(spark)
    out = {r.k: r.v for r in apply_changes(base, changes, ["k"], "seq").collect()}
    assert out == {2: "b2", 3: "c0", 4: "d0"}  # 1 deleted, 3 untouched


def test_apply_changes_rejects_partial_payload(spark):
    from terra_bonobo_nodes_spark.operators.cdc import apply_changes

    base = spark.createDataFrame([(1, "a", 1.0)], "k long, v string, w double")
    changes = spark.createDataFrame([(1, 1, "U", "x")], "k long, seq long, op string, v string")
    with pytest.raises(ValueError, match="full row image"):
        apply_changes(base, changes, ["k"], "seq")


def test_apply_changes_null_op_fails_fast(spark):
    """A NULL op is a malformed CDC record, not a delete: the naive
    filter would silently drop the key from the snapshot."""
    from terra_bonobo_nodes_spark.operators.cdc import apply_changes

    base = spark.createDataFrame([(1, "a0")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, 10, None, "a1")], "k long, seq long, op string, v string"
    )
    with pytest.raises(Exception, match="malformed CDC"):
        apply_changes(base, changes, ["k"], "seq").collect()


def test_collapse_changes_tie_break_deterministic(spark):
    from terra_bonobo_nodes_spark.operators.cdc import collapse_changes

    # same (key, seq): op DESC decides -> 'U' beats 'D'
    changes = spark.createDataFrame(
        [(1, 5, "D", None), (1, 5, "U", "kept")],
        "k long, seq long, op string, v string",
    )
    for n in (1, 7):
        got = collapse_changes(changes.repartition(n), ["k"], "seq").collect()
        assert len(got) == 1 and got[0].op == "U" and got[0].v == "kept"


# --- sessionization ---------------------------------------------------------


def test_sessionize_gap_boundary_is_strict(spark):
    from terra_bonobo_nodes_spark.operators.sessions import sessionize

    t0 = datetime(2024, 1, 1)
    rows = [
        ("u", t0, 1),
        ("u", t0 + timedelta(seconds=1800), 2),   # gap == 1800 -> SAME session
        ("u", t0 + timedelta(seconds=3601), 3),   # gap 1801 -> new session
        ("v", t0, 4),                              # other key independent
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, eid long")
    out = {
        r.eid: r.session_seq
        for r in sessionize(df, ["g"], "ts", 1800, order_cols=["eid"]).collect()
    }
    assert out == {1: 1, 2: 1, 3: 2, 4: 1}


def test_session_stats_values(spark):
    from terra_bonobo_nodes_spark.operators.sessions import session_stats

    t0 = datetime(2024, 1, 1)
    rows = [
        ("u", t0, 1, 1.5),
        ("u", t0 + timedelta(seconds=600), 2, 2.5),
        ("u", t0 + timedelta(seconds=9000), 3, 4.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, eid long, v double")
    out = sorted(
        session_stats(df, ["g"], "ts", 1800, value_col="v", order_cols=["eid"]).collect(),
        key=lambda r: r.session_seq,
    )
    assert [r.n_events for r in out] == [2, 1]
    assert out[0].duration_s == 600 and out[1].duration_s == 0
    assert out[0].sum_value == 4.0 and out[1].sum_value == 4.0
    assert out[0].session_end - out[0].session_start == 600


# --- BM25 -------------------------------------------------------------------


def test_bm25_matches_reference_formula(spark):
    from terra_bonobo_nodes_spark.llm.retrieval import bm25_scores

    corpus = {
        1: "spark shuffle join spark spark",
        2: "window functions in spark",
        3: "entirely unrelated prose about gardens",
        4: "window window window",
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    out = {r.doc_id: r for r in bm25_scores(df, ["spark", "window"]).collect()}

    # reference computation (same formula, plain Python)
    toks = {d: t.split() for d, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfreq = {
        term: sum(1 for t in toks.values() if term in t)
        for term in ("spark", "window")
    }
    k1, b = 1.2, 0.75
    for d in corpus:
        comps = []
        for term in ("spark", "window"):
            tf = toks[d].count(term)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
            comps.append(
                round(
                    idf * (tf * (k1 + 1.0))
                    / (tf + k1 * (1.0 - b + b * len(toks[d]) / avgdl)),
                    9,
                )
            )
        if not comps:
            assert d not in out  # doc 3 hits no term
            continue
        assert out[d].n_terms_hit == len(comps)
        assert out[d].score == pytest.approx(round(sum(comps), 6), abs=1e-6)
    # a two-term hit outranks a single-term hit (tf saturation caps
    # doc 1's repeated 'spark'), and the no-hit doc is absent entirely
    assert out[2].score > out[1].score and 3 not in out


def test_bm25_requires_terms(spark):
    from terra_bonobo_nodes_spark.llm.retrieval import bm25_scores

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(df, [])


# --- golden record ----------------------------------------------------------


def test_golden_record_transitive_merge_and_singletons(spark):
    from terra_bonobo_nodes_spark.operators.linkage import golden_record

    rows = [
        (1, "acme corp"),
        (2, "acme corp."),      # ~1 edit from 1
        (3, "acme corpse"),     # ~1-2 edits from 2 -> same entity transitively
        (9, "zzz unrelated"),   # singleton
    ]
    df = spark.createDataFrame(rows, "pid long, name string")
    out = {r.entity_id: r for r in golden_record(df, "pid", "name").collect()}
    assert set(out) == {1, 9}
    assert out[1].n_members == 3
    assert out[1].canonical_name == "acme corpse"  # longest wins
    assert out[9].n_members == 1 and out[9].canonical_name == "zzz unrelated"


# --- randomized-reference sweeps (one Spark job over many generated cases) --


def test_apply_changes_random_logs_match_python_fold(spark):
    """200 keys x random I/U/D change sequences, applied once through
    the operator, must equal a per-key Python fold of the log (highest
    seq wins; delete removes; unchanged keys pass through)."""
    import random

    from terra_bonobo_nodes_spark.operators.cdc import apply_changes

    rng = random.Random(42)
    base_rows = [(k, f"base{k}") for k in range(200) if rng.random() < 0.7]
    change_rows = []
    seq = 0
    for k in range(200):
        for _ in range(rng.randrange(0, 4)):
            seq += 1
            op = rng.choice(["I", "U", "D"])
            change_rows.append((k, seq, op, f"v{seq}" if op != "D" else None))
    rng.shuffle(change_rows)  # arrival order must not matter

    expect = {k: v for k, v in base_rows}
    for k, s, op, v in sorted(change_rows, key=lambda r: r[1]):
        if op == "D":
            expect.pop(k, None)
        else:
            expect[k] = v

    base = spark.createDataFrame(base_rows, "k long, v string")
    changes = spark.createDataFrame(
        change_rows, "k long, seq long, op string, v string"
    )
    got = {
        r.k: r.v for r in apply_changes(base, changes, ["k"], "seq").collect()
    }
    assert got == expect


def test_sessionize_random_series_match_python_reference(spark):
    """50 keys x random gaps: session assignment must equal the naive
    Python walk (new session when gap > threshold, floored seconds)."""
    import random
    from datetime import datetime, timedelta

    from terra_bonobo_nodes_spark.operators.sessions import sessionize

    rng = random.Random(7)
    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for k in range(50):
        t = t0
        for _ in range(rng.randrange(1, 12)):
            t = t + timedelta(seconds=rng.randrange(0, 4000))
            eid += 1
            rows.append((f"k{k}", t, eid))

    expect = {}
    by_key = {}
    for key, t, e in sorted(rows, key=lambda r: (r[0], r[1], r[2])):
        prev, seq = by_key.get(key, (None, 0))
        sec = int(t.timestamp())
        if prev is None or sec - prev > 1800:
            seq += 1
        by_key[key] = (sec, seq)
        expect[e] = seq

    df = spark.createDataFrame(rows, "g string, ts timestamp, eid long")
    got = {
        r.eid: r.session_seq
        for r in sessionize(
            df.repartition(5), ["g"], "ts", 1800, order_cols=["eid"]
        ).collect()
    }
    assert got == expect

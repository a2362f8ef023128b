"""Histogram quantile sketch (llm/quantiles.py): coverage guarantee,
merge-by-addition, saturation semantics, exact companion vs a Python
reference, SQL mirror, streaming combinability."""

from __future__ import annotations

import math
import uuid

import duckdb
import pytest
from pyspark.sql import functions as F

from terra_bonobo_nodes_spark.llm import quantiles as Q

_VALUES = [(i * 7919) % 1000 for i in range(400)]
_LO, _HI, _BINS = 0, 1000, 50
_QS = (50, 90, 99)


def _df(spark, values, group="g"):
    return spark.createDataFrame(
        [(group, v) for v in values], "group string, value long"
    )


def _py_exact(values, q):
    s = sorted(values)
    return s[math.ceil(len(s) * q / 100) - 1]


def test_exact_companion_matches_python(spark):
    rows = {
        r["q"]: r["exact_q"]
        for r in Q.exact_disc_quantiles(_df(spark, _VALUES), qs=_QS).collect()
    }
    assert rows == {q: _py_exact(_VALUES, q) for q in _QS}


def test_sketch_bounds_cover_exact(spark):
    """The defining guarantee: the true discrete percentile lies inside
    the sketch's answered bin for every q (bin width == fixed error)."""
    cells = Q.histogram_cells(_df(spark, _VALUES), lo=_LO, hi=_HI, bins=_BINS)
    hq = Q.histogram_quantiles(cells, _QS, _LO, _HI, _BINS)
    got = {r["q"]: (r["bin_lo"], r["bin_hi"]) for r in hq.collect()}
    for q in _QS:
        exact = _py_exact(_VALUES, q)
        lo, hi = got[q]
        assert lo <= exact < hi or (hi == _HI and exact == _HI)
        assert hi - lo == (_HI - _LO) // _BINS


def test_cells_merge_by_addition(spark):
    """Day-over-day merge is plain addition of cell counts — unioned
    split builds re-aggregated equal the whole build."""
    a = Q.histogram_cells(_df(spark, _VALUES[:250]), lo=_LO, hi=_HI, bins=_BINS)
    b = Q.histogram_cells(_df(spark, _VALUES[250:]), lo=_LO, hi=_HI, bins=_BINS)
    merged = sorted(
        tuple(r)
        for r in a.unionByName(b)
        .groupBy("group", "bin")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    whole = sorted(
        tuple(r)
        for r in Q.histogram_cells(
            _df(spark, _VALUES), lo=_LO, hi=_HI, bins=_BINS
        ).collect()
    )
    assert merged == whole


def test_out_of_range_saturates(spark):
    df = _df(spark, [-5, 0, 999, 1000, 5000])
    cells = {
        r["bin"]: r["n"]
        for r in Q.histogram_cells(df, lo=_LO, hi=_HI, bins=_BINS).collect()
    }
    assert cells[0] == 2  # -5 clamps to lo, 0 is in bin 0
    assert cells[_BINS - 1] == 3  # 999 lands there; 1000/5000 saturate


def test_null_values_dropped(spark):
    df = spark.createDataFrame(
        [("g", 5), ("g", None)], "group string, value long"
    )
    rows = Q.histogram_quantiles(
        Q.histogram_cells(df, lo=_LO, hi=_HI, bins=_BINS), (50,), _LO, _HI, _BINS
    ).collect()
    assert rows[0]["n_values"] == 1


def test_guards():
    with pytest.raises(ValueError):
        Q.histogram_cells(None, lo=5, hi=5)
    with pytest.raises(ValueError):
        Q.histogram_quantiles(None, qs=(0,))
    with pytest.raises(ValueError):
        Q.exact_disc_quantiles(None, qs=(101,))


def test_sql_mirror_matches_spark(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE vals AS SELECT 'g' AS grp, (i * 7919) % 1000 AS v "
        "FROM range(400) t(i)"
    )
    orows = sorted(
        tuple(r)
        for r in con.execute(
            Q.histogram_quantile_sql(
                "SELECT * FROM vals", "v", "grp", _LO, _HI, _BINS, _QS
            )
        ).fetchall()
    )
    cells = Q.histogram_cells(_df(spark, _VALUES), lo=_LO, hi=_HI, bins=_BINS)
    hq = Q.histogram_quantiles(cells, _QS, _LO, _HI, _BINS)
    ex = Q.exact_disc_quantiles(_df(spark, _VALUES), qs=_QS)
    covers = (F.col("exact_q") >= F.col("bin_lo")) & (
        (F.col("exact_q") < F.col("bin_hi"))
        | ((F.col("qbin") == _BINS - 1) & (F.col("exact_q") <= _HI))
    )
    srows = sorted(
        tuple(r)
        for r in hq.join(ex, ["group", "q"])
        .select(
            "group", "q", "n_values", "qbin", "bin_lo", "bin_hi",
            "exact_q", covers.alias("covers_exact"),
        )
        .collect()
    )
    assert srows == orows


def test_cells_build_streams_complete_mode(spark, tmp_path):
    """histogram_cells runs unchanged over a readStream: the (group,
    bin) key space is bounded at groups * bins, so complete-mode state
    is constant-size — streamed cells equal the batch build."""
    path = str(tmp_path / "vals")
    df = _df(spark, _VALUES)
    df.limit(200).coalesce(1).write.mode("overwrite").parquet(path)
    df.subtract(df.limit(200)).coalesce(1).write.mode("append").parquet(path)

    stream = Q.histogram_cells(
        spark.readStream.schema("group string, value long")
        .option("maxFilesPerTrigger", 1)
        .parquet(path),
        lo=_LO,
        hi=_HI,
        bins=_BINS,
    )
    assert stream.isStreaming
    name = f"hq_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.sql(f"select * from {name}").collect())
    want = sorted(
        tuple(r)
        for r in Q.histogram_cells(
            spark.read.parquet(path), lo=_LO, hi=_HI, bins=_BINS
        ).collect()
    )
    assert got == want


def test_length_percentiles_keeps_all_null_and_null_sources(spark, tmp_path):
    """Review finding r15: the widened llm_length_percentiles row must
    stay ONE ROW PER SOURCE, ALWAYS — a source whose n_chars are all
    NULL has no sketch cells and must surface with NULL sketch columns
    (not vanish through an inner join), and a NULL source is a real
    group on both engines."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from terra_bonobo_nodes_spark.plans.registry import all_queries

    rows = {
        "doc_id": [1, 2, 3, 4, 5],
        "source": ["a", "a", "nulls", None, None],
        "lang": ["en"] * 5,
        "n_chars": [10, 20, None, 7, None],
        "text": ["x"] * 5,
    }
    sf = tmp_path / "sf_nulls"
    sf.mkdir()
    pq.write_table(pa.table(rows), str(sf / "documents.parquet"))
    q = all_queries()["llm_length_percentiles"]
    got = {r["source"]: tuple(r) for r in q.spark_fn(spark, str(sf)).collect()}
    assert set(got) == {"a", "nulls", None}  # nobody vanishes
    assert got["nulls"][1] == 1 and got["nulls"][6] is None  # NULL sketch
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = {r[0]: tuple(r) for r in con.execute(q.oracle).fetchall()}
    con.close()
    assert got == want

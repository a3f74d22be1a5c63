"""Deequ-style data-quality suite (datapipe/dataquality.py): literal
metric goldens, null handling, verdict semantics, plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pdal_spark.datapipe import dataquality as dq


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame(
        [
            Row(id=1, v=10, s="aa", lang="en"),
            Row(id=2, v=20, s="bbb", lang="en"),
            Row(id=3, v=None, s=None, lang="de"),
            Row(id=4, v=30, s="", lang="xx"),
            Row(id=4, v=40, s="cc", lang="en"),  # duplicate id
        ]
    )


def _metrics(df, column):
    return {
        r.metric: r.value
        for r in df.collect()
        if r.column == column
    }


def test_profile_numeric_literal(tbl):
    m = _metrics(dq.profile(tbl, ["v"]), "v")
    assert m["n"] == 5.0
    assert m["n_null"] == 1.0
    assert m["completeness"] == 0.8
    assert m["min"] == 10.0 and m["max"] == 40.0
    assert m["mean"] == 25.0
    # population stddev of {10,20,30,40}
    assert abs(m["stddev_pop"] - math.sqrt(125.0)) < 1e-6


def test_profile_string_lengths_and_distinct(tbl):
    m = _metrics(dq.profile(tbl, ["s"], distinct_mode="exact"), "s")
    assert m["min_len"] == 0.0 and m["max_len"] == 3.0
    # lengths 2,3,0,2 over 4 non-null values
    assert m["mean_len"] == 1.75
    assert m["n_distinct"] == 4.0


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([Row(id=1, v=None), Row(id=2, v=None)],
                               "id int, v int")
    m = _metrics(dq.profile(df, ["v"]), "v")
    assert m["completeness"] == 0.0
    assert m["mean"] is None and m["min"] is None


def test_profile_rejects_bad_mode(tbl):
    with pytest.raises(ValueError):
        dq.profile(tbl, ["v"], distinct_mode="bogus")


def test_check_verdicts(tbl):
    out = dq.check(tbl, [
        {"name": "rows", "kind": "row_count_between", "lo": 5, "hi": 5},
        {"name": "id_nn", "kind": "not_null", "col": "id"},
        {"name": "id_uq", "kind": "unique", "col": "id"},
        {"name": "v_nn", "kind": "not_null", "col": "v"},
        {"name": "v_min", "kind": "min_ge", "col": "v", "bound": 10},
        {"name": "v_max", "kind": "max_le", "col": "v", "bound": 39},
        {"name": "v_mean", "kind": "mean_between", "col": "v",
         "lo": 20.0, "hi": 30.0},
        {"name": "lang_set", "kind": "values_in", "col": "lang",
         "allowed": ["en", "de"], "min_rate": 0.75},
        {"name": "s_pat", "kind": "pattern_rate", "col": "s",
         "pattern": "^[a-c]+$", "min_rate": 0.5},
        {"name": "s_len", "kind": "min_length_ge", "col": "s", "bound": 1},
    ])
    v = {r.name: (r.value, r.passed) for r in out.collect()}
    assert v["rows"] == (5.0, 1)
    assert v["id_nn"] == (1.0, 1)
    assert v["id_uq"] == (0.8, 0)        # 4 distinct / 5 rows
    assert v["v_nn"] == (0.8, 0)
    assert v["v_min"] == (10.0, 1)
    assert v["v_max"] == (40.0, 0)
    assert v["v_mean"] == (25.0, 1)
    assert v["lang_set"] == (0.8, 1)     # 4/5 in {en, de}
    assert v["s_pat"] == (0.75, 1)       # aa, bbb, cc of 4 non-null
    assert v["s_len"] == (0.0, 0)        # empty string fails
    # output preserves constraint count
    assert out.count() == 10


def test_check_empty_table(spark):
    df = spark.createDataFrame([], "id int, v int")
    out = dq.check(df, [
        {"name": "rows", "kind": "row_count_between", "lo": 1, "hi": 10},
        {"name": "v_min", "kind": "min_ge", "col": "v", "bound": 0},
    ])
    v = {r.name: (r.value, r.passed) for r in out.collect()}
    assert v["rows"] == (0.0, 0)
    # no rows -> no min metric -> NULL value, failed verdict (not a crash)
    assert v["v_min"] == (None, 0)


def test_check_unknown_kind(tbl):
    with pytest.raises(ValueError):
        dq.check(tbl, [{"name": "x", "kind": "nope", "col": "id"}])


def test_single_aggregate_plan(tbl):
    """The whole suite compiles onto ONE aggregate: no join, and only
    the single-row exchange of a global agg in the plan."""
    out = dq.check(tbl, [
        {"name": "id_nn", "kind": "not_null", "col": "id"},
        {"name": "v_min", "kind": "min_ge", "col": "v", "bound": 0},
        {"name": "s_pat", "kind": "pattern_rate", "col": "s",
         "pattern": "^a", "min_rate": 0.1},
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_approx_mode_close_to_exact(spark):
    df = spark.range(0, 2000).select(F.col("id"), (F.col("id") % 97).alias("g"))
    ex = _metrics(dq.profile(df, ["g"], distinct_mode="exact"), "g")
    ap = _metrics(dq.profile(df, ["g"], distinct_mode="approx"), "g")
    assert ex["n_distinct"] == 97.0
    assert abs(ap["n_distinct"] - 97.0) / 97.0 < 0.1


def test_duckdb_twins(spark, tmp_path):
    """profile_sql / check_sql replay the engine bit-for-bit on the
    same parquet (the driver-gate compare, in miniature)."""
    import duckdb
    import pandas as pd

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = "/root/testdata/sf0.001/documents.parquet"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{path}'")

    eng = (
        dq.profile(df, ["doc_id", "n_chars", "text"], distinct_mode="exact")
        .toPandas().sort_values(["column", "metric"]).reset_index(drop=True)
    )
    ora = (
        con.sql(dq.profile_sql("documents", ["doc_id", "n_chars"], ["text"]))
        .df().sort_values(["column", "metric"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)

    cons = [
        {"name": "uq", "kind": "unique", "col": "doc_id"},
        {"name": "langs", "kind": "values_in", "col": "lang",
         "allowed": ["en", "de"], "min_rate": 0.5},
        {"name": "srcpat", "kind": "pattern_rate", "col": "source",
         "pattern": "^src[0-9]+$", "min_rate": 1.0},
    ]
    eng2 = dq.check(df, cons).toPandas().sort_values("name").reset_index(drop=True)
    ora2 = con.sql(dq.check_sql("documents", cons)).df().sort_values(
        "name").reset_index(drop=True)
    pd.testing.assert_frame_equal(eng2, ora2, check_dtype=False)


def test_histogram_literal(spark):
    df = spark.createDataFrame(
        [(v,) for v in [0, 1, 2, 3, 4, 5, 6, 7, 8, 10]], "v long"
    )
    out = {r.bin: (r.lo, r.hi, r.n) for r in dq.histogram(df, "v", 5).collect()}
    # width = 2: bins [0,2) [2,4) [4,6) [6,8) [8,10] (top closed)
    assert out[0] == (0.0, 2.0, 2) and out[1] == (2.0, 4.0, 2)
    assert out[4] == (8.0, 10.0, 2)  # 8 and the max 10
    assert sum(v[2] for v in out.values()) == 10


def test_histogram_empty_bins_and_edge_cases(spark):
    df = spark.createDataFrame([(0,), (100,)], "v long")
    out = dq.histogram(df, "v", 4).collect()
    assert [r.n for r in sorted(out, key=lambda r: r.bin)] == [1, 0, 0, 1]
    # constant column: single-bin pileup, width fallback 1.0
    const = spark.createDataFrame([(7,)] * 5, "v long")
    o2 = dq.histogram(const, "v", 3).collect()
    assert sum(r.n for r in o2) == 5
    # all-null column: zero counts, null bounds
    nulls = spark.createDataFrame([(None,), (None,)], "v int")
    o3 = dq.histogram(nulls, "v", 3).collect()
    assert all(r.n == 0 and r.lo is None for r in o3)
    with pytest.raises(ValueError):
        dq.histogram(df, "v", 0)


def test_float_columns_profile_without_truncation(spark):
    """r2 regression: float/double columns were long-cast before
    summing, so a column of 0.9s profiled as mean 0.0 — and a WAP
    audit gated on it passed/failed on wrong metrics."""
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame({"score": [0.9, 0.9, 0.9, 0.9], "k": [1, 2, 3, 4]})
    df = spark.createDataFrame(pdf)
    prof = {
        (r.column, r.metric): r.value for r in dq.profile(
            df, ["score", "k"], distinct_mode="exact"
        ).collect()
    }
    assert prof[("score", "mean")] == pytest.approx(0.9)
    assert prof[("score", "stddev_pop")] == pytest.approx(0.0, abs=1e-6)
    assert prof[("k", "mean")] == pytest.approx(2.5)

    cons = [{"name": "m", "kind": "mean_between", "col": "score",
             "lo": 0.8, "hi": 1.0, "float": True}]
    got = dq.check(df, cons).collect()[0]
    assert got.passed == 1 and got.value == pytest.approx(0.9)

    # SQL twins agree with the engine on the float column
    con = duckdb.connect()
    con.register("t", pdf)
    ora = con.sql(dq.check_sql("t", cons)).df().iloc[0]
    assert ora["passed"] == 1 and ora["value"] == pytest.approx(0.9)
    prof_sql = dq.profile_sql("t", ["score", "k"], [],
                              cols_float=["score"])
    ora2 = {
        (r["column"], r.metric): r.value
        for _, r in con.sql(prof_sql).df().iterrows()
    }
    assert ora2[("score", "mean")] == pytest.approx(0.9)

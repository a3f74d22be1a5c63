"""Exact distributed quantiles (operators/stats.exact_quantiles):
literal rank semantics, ties, DuckDB native quantile_disc agreement,
grouped path, and the no-global-sort plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdal_spark.operators import stats as stats_op


def test_literal_ranks_and_ties(spark):
    # values sorted: 1,1,1,2,5,5,9  (n=7)
    df = spark.createDataFrame(
        [(v,) for v in [5, 1, 9, 1, 2, 5, 1]], "v long"
    )
    qs = [0.0, 0.5, 0.99, 1.0]
    out = {
        r.q: r.value
        for r in stats_op.exact_quantiles(df, "v", qs).collect()
    }
    # q=0 -> rank 1 -> 1; q=.5 -> ceil(3.5)=4 -> 2; q=.99 -> ceil(6.93)=7
    assert out == {0.0: 1, 0.5: 2, 0.99: 9, 1.0: 9}


def test_fp_inexact_q_rank(spark):
    """q values inexact in binary (0.07 * 100 = 7.000000000000001 in
    doubles) must still select the exact rational rank ceil(q*n) = 7,
    not the next order statistic — percentile_disc semantics."""
    df = spark.range(1, 101).select(F.col("id").cast("double").alias("v"))
    out = {
        r.q: r.value
        for r in stats_op.exact_quantiles(
            df, "v", [0.07, 0.14, 0.29, 0.56, 0.57, 0.58]
        ).collect()
    }
    assert out == {0.07: 7.0, 0.14: 14.0, 0.29: 29.0, 0.56: 56.0,
                   0.57: 57.0, 0.58: 58.0}


def test_matches_duckdb_native_quantile_disc(spark):
    """The counting formulation equals DuckDB's independent native
    implementation on a double column with duplicates — including
    FP-unsafe q values (0.07, 0.57) whose double product overshoots
    the integer rank."""
    import duckdb

    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    qs = [0.0, 0.07, 0.1, 0.25, 0.5, 0.57, 0.75, 0.9, 1.0]
    got = {
        r.q: r.value
        for r in stats_op.exact_quantiles(df, "value", qs).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * "
        "FROM '/root/testdata/sf0.001/events.parquet'"
    )
    for q in qs:
        native = con.sql(
            f"SELECT quantile_disc(value, {q}) FROM events"
        ).fetchone()[0]
        assert got[q] == native, q


def test_grouped_equals_per_group_global(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    qs = [0.25, 0.5, 0.9]
    grouped = {
        (r.event_type, r.q): r.value
        for r in stats_op.exact_quantiles(
            df, "value", qs, by=["event_type"]
        ).collect()
    }
    types = [r.event_type for r in df.select("event_type").distinct().collect()]
    for t in types:
        solo = {
            r.q: r.value
            for r in stats_op.exact_quantiles(
                df.filter(F.col("event_type") == t), "value", qs
            ).collect()
        }
        for q in qs:
            assert grouped[(t, q)] == solo[q], (t, q)


def test_partition_count_invariant(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    qs = [0.5, 0.9]
    a = stats_op.exact_quantiles(df, "value", qs).collect()
    b = stats_op.exact_quantiles(
        df.repartition(13), "value", qs, num_partitions=3
    ).collect()
    assert {(r.q, r.value) for r in a} == {(r.q, r.value) for r in b}


def test_no_global_sort_in_plan(spark):
    """The raw table is never globally sorted: the first thing above
    the scan is the partial count aggregate (map-side collapse to the
    value domain); any Sort in the plan operates on the aggregated
    table, never on the scan output directly."""
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = stats_op.exact_quantiles(df, "value", [0.5])
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    scan_lines = [i for i, l in enumerate(lines) if "Scan parquet" in l]
    assert scan_lines
    for i in scan_lines:
        # walk upward from the scan: the nearest enclosing operator
        # chain must hit an aggregate before it hits any Sort
        above = "\n".join(lines[max(0, i - 6):i])
        assert "Sort" not in above or "HashAggregate" in above


def test_validates_inputs(spark):
    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError):
        stats_op.exact_quantiles(df, "v", [])
    with pytest.raises(ValueError):
        stats_op.exact_quantiles(df, "v", [1.5])


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [(None,), (1,), (None,), (2,), (3,), (4,)], "v long"
    )
    out = {r.q: r.value for r in stats_op.exact_quantiles(
        df, "v", [0.5, 1.0]).collect()}
    # 4 non-null values -> median rank ceil(2)=2 -> 2; max -> 4
    assert out == {0.5: 2, 1.0: 4}

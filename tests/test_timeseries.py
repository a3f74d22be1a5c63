"""Sessionization + bounded-interval join: literal goldens, DuckDB
twins, bin-independence, plan shape."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from pdal_spark.operators import timeseries as ts

SF_DIR = "/root/testdata/sf0.001"


def test_sessionize_literal(spark):
    """Gap rule: new session when gap > threshold (strictly); first
    event of each key always opens session 0; keys independent."""
    rows = [
        (1, "a", 0.0), (2, "a", 100.0), (3, "a", 701.0),  # 601 > 600 -> new
        (4, "a", 1301.0),                                  # 600 == gap -> same
        (5, "b", 0.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "k", "t"])
    out = {
        r["event_id"]: r["session_id"]
        for r in ts.sessionize(df, key="k", ts="t", gap_seconds=600.0).collect()
    }
    assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}


def test_sessionize_duckdb_twin(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    got = (
        ts.sessionize(ev, key="user_id", ts="ts", gap_seconds=600.0)
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    exp = con.sql(
        ts.sessionize_sql(
            "(SELECT event_id, user_id, ts FROM events)",
            key="user_id", ts="ts", gap_seconds=600.0,
        )
        + " ORDER BY event_id"
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "session_id"]],
        exp[["event_id", "user_id", "session_id"]],
        check_dtype=False,
    )


def _sides(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    return clicks, errors


def test_interval_join_matches_exact_form(spark):
    """Bucket-join result == DuckDB's index-free inequality join, and
    is independent of the binning (same pairs at a different delta
    decomposition is covered by the exact |dt| predicate)."""
    clicks, errors = _sides(spark)
    out = ts.interval_join(
        clicks, errors, key="user_id", ts="ts", delta_seconds=21600.0
    )
    got = set(
        (r.event_id, r.event_id_r)
        for r in out.select("event_id", "event_id_r").collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    inner = ts.interval_join_sql(
        "(SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')",
        "(SELECT event_id, user_id, ts FROM events WHERE event_type = 'error')",
        key="user_id", ts="ts", delta_seconds=21600.0,
        left_select="l.event_id, l.user_id", right_payload=["event_id"],
    )
    exp = set(
        (int(a), int(b))
        for a, b in con.sql(
            f"SELECT event_id, event_id_r FROM ({inner})"
        ).fetchall()
    )
    assert got == exp and got


def test_interval_join_plan_shape(spark):
    """Equality hash join on (key, bin) — no BNLJ range join, no
    cartesian, no single-partition funnel."""
    clicks, errors = _sides(spark)
    out = ts.interval_join(
        clicks, errors, key="user_id", ts="ts", delta_seconds=21600.0
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Exchange SinglePartition" not in plan


def test_rate_limit_schedule_literal(spark):
    """Hand-computed politeness schedule, delay=10: d_i = max(t_i,
    d_{i-1}+10); keys independent; ties on ts broken by id."""
    rows = [
        # key a: t = 0, 3, 25, 26  ->  d = 0, 10, 25, 35
        (1, "a", 0.0), (2, "a", 3.0), (3, "a", 25.0), (4, "a", 26.0),
        # key b: single event dispatches immediately
        (5, "b", 7.0),
        # key c: tie on ts -> id order decides who waits
        (6, "c", 1.0), (7, "c", 1.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "k", "t"])
    out = {
        r["event_id"]: (r["dispatch_us"], r["wait_us"])
        for r in ts.rate_limit_schedule(
            df, key="k", ts="t", delay_seconds=10.0, id_col="event_id"
        ).collect()
    }
    u = 1_000_000
    assert out == {
        1: (0, 0), 2: (10 * u, 7 * u), 3: (25 * u, 0), 4: (35 * u, 9 * u),
        5: (7 * u, 0),
        6: (1 * u, 0), 7: (11 * u, 10 * u),
    }


def test_rate_limit_schedule_invariants(spark):
    """On real events: every dispatch >= its request time; consecutive
    same-key dispatches are >= delay apart; and each dispatch is MINIMAL
    (equals t_i or predecessor+delay — the recurrence, re-checked in
    pandas)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    out = ts.rate_limit_schedule(
        ev, key="user_id", ts="ts", delay_seconds=30.0, id_col="event_id"
    ).toPandas()
    d_us = 30 * 1_000_000
    assert (out["wait_us"] >= 0).all()
    out = out.sort_values(["user_id", "ts", "event_id"])
    for _, g in out.groupby("user_id"):
        d = g["dispatch_us"].to_numpy()
        t = (d - g["wait_us"].to_numpy())
        assert (d[1:] - d[:-1] >= d_us).all()
        # minimality: the recurrence replayed sequentially
        prev = None
        for ti, di in zip(t, d):
            expect = ti if prev is None else max(ti, prev + d_us)
            assert di == expect
            prev = di


def test_rate_limit_schedule_duckdb_twin(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    got = (
        ts.rate_limit_schedule(
            ev, key="user_id", ts="ts", delay_seconds=30.0, id_col="event_id"
        )
        .select("event_id", "user_id", "dispatch_us", "wait_us")
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    exp = con.sql(
        ts.rate_limit_schedule_sql(
            "(SELECT event_id, user_id, ts FROM events)",
            key="user_id", ts="ts", delay_seconds=30.0, id_col="event_id",
            select="event_id, user_id",
        )
        + " ORDER BY event_id"
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

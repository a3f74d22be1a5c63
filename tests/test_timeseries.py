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

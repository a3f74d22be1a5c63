"""As-of join: literal semantics, DuckDB native-ASOF twin, plan shape."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdal_spark.operators import asof

SF_DIR = "/root/testdata/sf0.001"


def test_asof_literal_semantics(spark):
    """<= bound (equal ts matches), latest-prior wins, NULL when no
    prior right row exists, keys never cross."""
    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 5), (4, "b", 15)],
        ["event_id", "k", "t"],
    )
    right = spark.createDataFrame(
        [(100, "a", 10), (101, "a", 18), (102, "b", 16)],
        ["rid", "k", "t"],
    )
    out = {
        r["event_id"]: r["rid_r"]
        for r in asof.asof_join(
            left, right, on="k", ts="t", payload=["rid"]
        ).collect()
    }
    assert out == {
        1: 100,   # equal ts matches (<=)
        2: 101,   # latest prior (18 beats 10)
        3: None,  # nothing at or before t=5
        4: None,  # b's only view is at 16 > 15; a's rows must not leak
    }


def test_asof_join_duckdb_native_twin(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    got = (
        asof.asof_join(clicks, views, on="user_id", ts="ts",
                       payload=["event_id", "value"])
        .select("event_id", "user_id", "event_id_r", "value_r")
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    inner = asof.asof_join_sql(
        "(SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')",
        "(SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'view')",
        on="user_id", ts="ts", payload=["event_id", "value"],
        left_select="l.event_id, l.user_id",
    )
    exp = con.sql(
        f"SELECT * FROM ({inner}) ORDER BY event_id"
    ).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_asof_plan_shape(spark):
    """One hash exchange on the key, a PARTITIONED window, and no
    range join (no BroadcastNestedLoopJoin / CartesianProduct)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof.asof_join(clicks, views, on="user_id", ts="ts",
                         payload=["event_id", "value"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "hashpartitioning(user_id" in plan
    assert "Exchange SinglePartition" not in plan


def test_asof_null_payload_stays_on_one_row(spark):
    """A NULL payload field in the matched right row must come through
    as NULL — never backfilled from an OLDER right row (all output
    columns come from the same matched row)."""
    left = spark.createDataFrame([(1, "a", 30)], ["event_id", "k", "t"])
    right = spark.createDataFrame(
        [(100, 5.0, "a", 10), (101, None, "a", 20)],
        ["rid", "val", "k", "t"],
    )
    r = asof.asof_join(
        left, right, on="k", ts="t", payload=["rid", "val"]
    ).collect()[0]
    assert r["rid_r"] == 101 and r["val_r"] is None

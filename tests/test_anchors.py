"""Anchor-text aggregation — literal semantics + twin."""

from __future__ import annotations

import duckdb
import pandas as pd

from pdal_spark.datapipe import anchors as an


def test_profile_literal(spark):
    rows = [
        # dst 10: "home" x2, "news" x1 -> top=home(2)
        (1, 10, "home"), (2, 10, "home"), (3, 10, "news"),
        # dst 20: tie 1-1 -> lexicographically smallest wins
        (1, 20, "zebra"), (2, 20, "apple"),
        # dst 30: single link
        (9, 30, "solo"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["src", "dst", "anchor"])
    )
    out = {r.dst: r for r in an.anchor_profile(df).collect()}
    assert (out[10].n_inlinks, out[10].n_distinct_anchors) == (3, 2)
    assert (out[10].top_anchor, out[10].top_anchor_n) == ("home", 2)
    assert out[20].top_anchor == "apple" and out[20].top_anchor_n == 1
    assert out[30].n_inlinks == 1 and out[30].top_anchor == "solo"


def test_partition_invariance(spark):
    rows = [(s, s % 5, f"a{s % 3}") for s in range(200)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["src", "dst", "anchor"])
    )
    a = an.anchor_profile(df.repartition(13)).toPandas().sort_values(
        "dst").reset_index(drop=True)
    b = an.anchor_profile(df.coalesce(1)).toPandas().sort_values(
        "dst").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_no_window_in_engine_plan(spark):
    rows = [(s, s % 5, f"a{s % 3}") for s in range(50)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["src", "dst", "anchor"])
    )
    plan = an.anchor_profile(df)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "Window" not in plan


def test_sql_twin(spark, sf_dir):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id")
    a = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 3), " ")
    l1 = docs.select(i.alias("src"), ((i * 7 + 1) % 601).alias("dst"),
                     a.alias("anchor"))
    l2 = docs.select(i.alias("src"), ((i * 13 + 5) % 601).alias("dst"),
                     a.alias("anchor"))
    out = an.anchor_profile(l1.unionByName(l2)).toPandas().sort_values(
        "dst").reset_index(drop=True)

    links = (
        "SELECT doc_id AS src, (doc_id*7+1) % 601 AS dst, "
        "array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ')"
        " AS anchor FROM documents "
        "UNION ALL SELECT doc_id, (doc_id*13+5) % 601, "
        "array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ')"
        " FROM documents"
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    ref = con.sql(an.anchor_profile_sql(links)).df().sort_values(
        "dst").reset_index(drop=True)
    for c in out.columns:
        assert (out[c].values == ref[c].values).all(), c

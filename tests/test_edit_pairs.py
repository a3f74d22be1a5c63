"""Edit-distance-verified near-dup pairs: literal Levenshtein goldens,
screen+verify semantics, DuckDB twin at sf0.001."""

from __future__ import annotations

import duckdb
import pytest

from pdal_spark.datapipe import dedup as D


def test_literal_edit_pairs(spark):
    base = "the quick brown fox jumps over the lazy dog tonight"
    docs = [
        (0, base),
        (1, base.replace("lazy", "hazy")),  # 1-char edit
        (2, base + " again"),  # 6-char suffix
        (3, "completely different content about query planners"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # short docs have unstable simhash majorities -> loosen the screen
    got = {
        (r.id1, r.id2): r.edit_dist
        for r in D.edit_distance_pairs(df, max_dist=8, max_hamming=8).collect()
    }
    assert got[(0, 1)] == 1
    assert got[(0, 2)] == 6
    assert all(3 not in pair for pair in got)


def test_verify_bound_respected(spark):
    docs = [
        (0, "aaa bbb ccc ddd"),
        (1, "aaa bbb ccc dzd"),
        (2, "aaa bbb ccc"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got1 = {
        (r.id1, r.id2)
        for r in D.edit_distance_pairs(
            df, max_dist=1, max_hamming=8
        ).collect()
    }
    assert got1 == {(0, 1)}  # the 4-char drop (0,2) exceeds max_dist=1


def test_duckdb_twin_sf0001(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = (
        D.edit_distance_pairs(df, max_dist=40)
        .orderBy("id1", "id2")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    exp = con.sql(
        D.edit_distance_pairs_sql(max_dist=40) + " ORDER BY id1, id2"
    ).df()
    assert len(got) == len(exp) > 0
    for c in ("id1", "id2", "hamming", "edit_dist"):
        assert list(got[c]) == list(exp[c]), c


def test_plan_no_crossjoin(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        D.edit_distance_pairs(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan

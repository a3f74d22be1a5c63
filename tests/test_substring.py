"""Repeated-substring (ExactSubstr-style) span removal."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pdal_spark.datapipe import substring as ss


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "a b c d e f g h X Y Z"),
            (1, "p q a b c d e f g h r s"),
            (2, "unique words only here none repeated at all"),
            (3, "tiny doc"),
            (4, "m m m m m m m m m m"),
        ],
        "doc_id long, text string",
    )


def test_literal_spans(spark, docs):
    out = (
        ss.substring_dedup(docs, n=8)
        .orderBy("doc_id")
        .toPandas()
        .set_index("doc_id")
    )
    # the shared 8-gram "a b c d e f g h" is removed from BOTH docs
    # (ExactSubstr removes every copy of a duplicated span)
    assert out.loc[0, "text_dedup"] == "X Y Z"
    assert out.loc[1, "text_dedup"] == "p q r s"
    assert out.loc[0, "n_removed"] == 8 and out.loc[1, "n_removed"] == 8
    # no duplicated gram -> untouched
    assert out.loc[2, "n_removed"] == 0
    # shorter than n words -> no windows, untouched
    assert out.loc[3, "text_dedup"] == "tiny doc"
    # self-overlapping repeats inside one doc count toward min_count
    assert out.loc[4, "text_dedup"] == "" and out.loc[4, "n_removed"] == 10


def test_matches_duckdb_twin(spark, docs):
    out = ss.substring_dedup(docs, n=8).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = (
        con.sql(ss.substring_dedup_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), want, check_dtype=False
    )


def test_hash_mode_parity(spark, docs):
    """xxhash64 keys (the open-vocabulary scale path) produce identical
    results to carrying the gram text."""
    a = ss.substring_dedup(docs, n=8, gram_mode="gram").orderBy("doc_id")
    b = ss.substring_dedup(docs, n=8, gram_mode="hash").orderBy("doc_id")
    pd.testing.assert_frame_equal(a.toPandas(), b.toPandas())


def test_min_count_three(spark):
    df = spark.createDataFrame(
        [(0, "x y z w"), (1, "x y z w"), (2, "x y z w"), (3, "q r s t")],
        "doc_id long, text string",
    )
    out = (
        ss.substring_dedup(df, n=4, min_count=3)
        .orderBy("doc_id")
        .toPandas()
        .set_index("doc_id")
    )
    assert (out.loc[[0, 1, 2], "n_removed"] == 4).all()
    assert out.loc[3, "n_removed"] == 0


def test_partition_invariance(spark, docs):
    a = ss.substring_dedup(docs.repartition(1), n=8).orderBy("doc_id").toPandas()
    b = ss.substring_dedup(docs.repartition(7), n=8).orderBy("doc_id").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_no_global_window_or_cartesian(spark, docs):
    import re

    plan = (
        ss.substring_dedup(docs, n=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # global-window physical signature (see test_planshape.py)
    lines = [ln.strip() for ln in plan.splitlines()]
    for prev, cur in zip(lines, lines[1:]):
        assert not (
            "Exchange SinglePartition" in cur and re.search(r"\bSort \[", prev)
        ), prev

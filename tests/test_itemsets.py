"""Frequent co-occurring pairs: literal market-basket golden, Apriori
prune exactness, basket-cap refusal, DuckDB twin at sf0.001."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

import duckdb
import pytest

from pdal_spark.datapipe import itemsets as IT

CORPUS = [
    (0, "machine learning is fun machine"),
    (1, "deep machine learning wins"),
    (2, "machine learning learning again"),
    (3, "cooking is fun"),
    (4, "fun with cooking and machine"),
]


def _py_frequent_pairs(texts, min_support):
    cnt = Counter()
    for t in texts:
        for a, b in combinations(sorted(set(t.split(" "))), 2):
            cnt[(a, b)] += 1
    return {k: v for k, v in cnt.items() if v >= min_support}


@pytest.fixture(scope="module")
def literal_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_matches_python_reference(spark, literal_df):
    got = {
        (r.item_a, r.item_b): r.support
        for r in IT.frequent_pairs(literal_df, min_support=2).collect()
    }
    exp = _py_frequent_pairs([t for _, t in CORPUS], min_support=2)
    assert got == exp
    assert got[("learning", "machine")] == 3  # any-distance co-occurrence


def test_cooccurrence_not_adjacency(spark, literal_df):
    """'machine' and 'fun' are never adjacent but co-occur in docs 0
    and 4 — the semantics collocations.py would NOT count."""
    got = {
        (r.item_a, r.item_b): r.support
        for r in IT.frequent_pairs(literal_df, min_support=2).collect()
    }
    assert got[("fun", "machine")] == 2


def test_basket_cap_refusal(spark):
    text = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame(
        [(i, text) for i in range(5)], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="max_basket"):
        IT.frequent_pairs(df, min_support=2, max_basket=10).collect()


def test_duckdb_twin_sf0001(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = (
        IT.frequent_pairs(df, min_support=150)
        .orderBy("item_a", "item_b")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    exp = con.sql(
        IT.frequent_pairs_sql(min_support=150) + " ORDER BY item_a, item_b"
    ).df()
    assert len(got) == len(exp) > 0
    for c in ("item_a", "item_b", "support"):
        assert list(got[c]) == list(exp[c]), c


def test_plan_shape(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        IT.frequent_pairs(df, min_support=150)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "Window" not in plan

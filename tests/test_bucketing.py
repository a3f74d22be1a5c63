from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from pdal_spark.bucketing import (
    bucketed_join,
    n_exchanges,
    n_sorts,
    write_bucketed,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", F.length("text").alias("n_chars")
    )
    scores = docs.select(
        "doc_id", (F.col("n_chars") % 97).alias("score")
    )
    write_bucketed(
        docs, "b_docs", ["doc_id"], 8,
        path=tempfile.mkdtemp(prefix="bkt_docs_"),
    )
    write_bucketed(
        scores, "b_scores", ["doc_id"], 8,
        path=tempfile.mkdtemp(prefix="bkt_scores_"),
    )
    return docs, scores


def test_cobucketed_join_has_no_exchange_or_sort(spark, tables):
    # merge hint: the test tables are broadcast-small, which would hide
    # the bucketed scan; at scale SMJ is what the planner picks anyway
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    )
    joined = (
        spark.table("b_docs")
        .hint("merge")
        .join(spark.table("b_scores").hint("merge"), ["doc_id"])
    )
    assert n_exchanges(joined) == 0, "bucketed layout must kill the shuffle"
    assert n_sorts(joined) == 0, "sortBy layout must kill the sorts"
    # and the result is the plain join's result
    docs, scores = tables
    assert joined.count() == docs.join(scores, "doc_id").count() == docs.count()


def test_unbucketed_join_shuffles_both_sides(spark, tables):
    docs, scores = tables
    # the same merge join WITHOUT the bucketed layout: 2 exchanges + 2 sorts
    smj = docs.hint("merge").join(scores.hint("merge"), "doc_id")
    assert n_exchanges(smj) == 2
    assert n_sorts(smj) == 2


def test_bucketed_aggregate_reuses_layout(spark, tables):
    # groupBy on the bucket key needs no exchange either
    agg = spark.table("b_docs").groupBy("doc_id").agg(F.sum("n_chars"))
    assert n_exchanges(agg) == 0


def test_bucketed_values_roundtrip(spark, tables):
    docs, _ = tables
    got = spark.table("b_docs").select("doc_id", "lang", "n_chars")
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, docs.collect()))
    assert a == b

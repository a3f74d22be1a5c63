"""DSIR importance resampling (Xie et al. 2023)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdal_spark.datapipe import dsir


@pytest.fixture(scope="module")
def corpora(spark):
    raw = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the dog sat on the rug"),
            (2, "gradient descent optimizes the loss"),
            (3, "stochastic gradient descent converges"),
            (4, "the cat chased the dog"),
            (5, "adam optimizes the loss faster"),
        ],
        "doc_id long, text string",
    )
    target = raw.filter("doc_id in (2, 3, 5)")  # the ML-flavored docs
    return raw, target


def test_target_like_docs_score_higher(spark, corpora):
    raw, target = corpora
    w = dsir.dsir_weights(raw, target).toPandas().set_index("doc_id")
    ml = w.loc[[2, 3, 5], "weight"].mean()
    other = w.loc[[0, 1, 4], "weight"].mean()
    assert ml > other


def test_matches_duckdb_twin(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    target = docs.filter("doc_id % 97 = 0")
    got = (
        dsir.dsir_weights(docs, target)
        .withColumn("weight", F.round("weight", 9))
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    want = (
        con.sql(dsir.dsir_weights_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False, atol=1e-8
    )


def test_hash_mode_correlates(spark):
    """Hashed features (bounded broadcast) track the exact-gram scores."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    target = docs.filter("doc_id % 97 = 0")
    g = dsir.dsir_weights(docs, target).orderBy("doc_id").toPandas()
    h = dsir.dsir_weights(
        docs, target, feature_mode="hash"
    ).orderBy("doc_id").toPandas()
    c = np.corrcoef(g.weight, h.weight)[0, 1]
    assert c > 0.95


def test_sample_budget_and_determinism(spark, corpora):
    raw, target = corpora
    kept = dsir.dsir_sample(raw, target, k=3)
    ids = sorted(r.doc_id for r in kept.collect())
    assert len(ids) == 3
    assert set(ids) >= {2, 3}  # the most target-like stay
    again = sorted(
        r.doc_id for r in dsir.dsir_sample(
            raw.repartition(5), target, k=3
        ).collect()
    )
    assert ids == again  # partition-invariant


def test_bad_mode(corpora):
    raw, target = corpora
    with pytest.raises(ValueError, match="feature_mode"):
        dsir.dsir_weights(raw, target, feature_mode="bow")

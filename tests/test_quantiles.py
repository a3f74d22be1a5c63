from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdal_spark.operators.quantiles import grouped_quantiles, grouped_quantiles_sql

SF_DIR = "/root/testdata/sf0.001"


def test_grouped_quantiles_literal(spark):
    # group a: values 10..19 (n=10) -> p25 = rank ceil(2.5)=3 -> 12,
    # p50 = rank 5 -> 14, p75 = rank ceil(7.5)=8 -> 17
    rows = [(i, "a", 10 + i) for i in range(10)]
    # group b: single row -> every q hits rank 1
    rows += [(100, "b", 42)]
    df = spark.createDataFrame(rows, "doc_id long, g string, v long")
    out = sorted(
        tuple(r)
        for r in grouped_quantiles(df, ["g"], "v", id_col="doc_id").collect()
    )
    assert out == sorted(
        [
            ("a", 0.25, 10, 12),
            ("a", 0.5, 10, 14),
            ("a", 0.75, 10, 17),
            ("b", 0.25, 1, 42),
            ("b", 0.5, 1, 42),
            ("b", 0.75, 1, 42),
        ]
    )


def test_grouped_quantiles_tie_determinism(spark):
    # all-equal values: ranks resolve by id, value identical either way;
    # result must not depend on partitioning
    rows = [(i, "g", 7) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, g string, v long")
    a = sorted(map(tuple, grouped_quantiles(df, ["g"], "v").collect()))
    b = sorted(
        map(tuple, grouped_quantiles(df.repartition(9), ["g"], "v").collect())
    )
    assert a == b
    assert all(r[3] == 7 for r in a)


def test_grouped_quantiles_matches_sql(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", F.length("text").cast("long").alias("n_chars")
    )
    out = (
        grouped_quantiles(docs, ["lang"], "n_chars")
        .toPandas()
        .sort_values(["lang", "q"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    exp = (
        con.sql(
            grouped_quantiles_sql(
                "(SELECT doc_id, lang, length(text) AS n_chars"
                " FROM documents)",
                ["lang"],
                "n_chars",
            )
        )
        .df()
        .sort_values(["lang", "q"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[sorted(out.columns)], exp[sorted(exp.columns)], check_dtype=False
    )

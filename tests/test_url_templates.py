"""URL template mining: literal generalization goldens + DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest

from pdal_spark.datapipe import weburl as W

URLS = [
    "https://shop.example/product/12345",
    "https://shop.example/product/67890?ref=x",
    "https://shop.example/product/12345#reviews",
    "https://shop.example/cart",
    "https://cdn.example/img/deadbeef01ab23cd/full.jpg",
    "https://cdn.example/img/0123456789abcdef/full.jpg",
    "https://blog.example/2024/01/15/title-words",
    "https://blog.example/2024/02/20/other-title",
    "https://other.example",
]


@pytest.fixture(scope="module")
def pages_df(spark):
    return spark.createDataFrame([(u,) for u in URLS], "url string")


def test_generalization_goldens(spark, pages_df):
    got = {
        r.template: (r.n_urls, r.n_pages)
        for r in W.url_templates(pages_df, min_count=1).collect()
    }
    assert got["shop.example/product/{n}"] == (3, 2)
    assert got["cdn.example/img/{hex}/full.jpg"] == (2, 2)
    assert got["blog.example/{n}/{n}/{n}/title-words"] == (1, 1)
    assert got["shop.example/cart"] == (1, 1)
    assert got["other.example"] == (1, 1)  # no path


def test_min_count_filters(spark, pages_df):
    rows = W.url_templates(pages_df, min_count=2).collect()
    assert {r.template for r in rows} == {
        "shop.example/product/{n}",
        "cdn.example/img/{hex}/full.jpg",
    }


def test_duckdb_twin(spark, pages_df):
    got = (
        W.url_templates(pages_df, min_count=1)
        .orderBy("template")
        .toPandas()
    )
    vals = ", ".join(f"('{u}')" for u in URLS)
    exp = (
        duckdb.sql(
            W.url_templates_sql(
                f"SELECT * FROM (VALUES {vals}) AS v(url)", min_count=1
            )
            + " ORDER BY template"
        )
        .df()
    )
    assert len(got) == len(exp)
    for c in ("template", "n_urls", "n_pages"):
        assert list(got[c]) == list(exp[c]), c

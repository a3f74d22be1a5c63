"""TF-IDF keywords: python reference with identical fixed-point
quantization, rank determinism, DuckDB twin at sf0.001."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest

from pdal_spark.datapipe import ranking as R

CORPUS = [
    (0, "spark query engine spark shuffle"),
    (1, "query planner and query optimizer"),
    (2, "cooking recipes and cooking tips"),
]


def _py_tfidf(docs, k):
    n_docs = len(docs)
    dfreq = Counter()
    tfs = []
    for _, t in docs:
        c = Counter(t.split(" "))
        tfs.append(c)
        dfreq.update(c.keys())
    out = {}
    for (did, _), c in zip(docs, tfs):
        scored = []
        for term, tf in c.items():
            idf_mu = int(
                math.floor(math.log(n_docs / dfreq[term]) * 1e6 + 0.5)
            )
            scored.append((tf * idf_mu, term, tf, dfreq[term]))
        scored.sort(key=lambda x: (-x[0], x[1]))
        out[did] = [
            (term, tf, dfc, mu, r + 1, round(mu / 1e6, 6))
            for r, (mu, term, tf, dfc) in enumerate(scored[:k])
        ]
    return out


@pytest.fixture(scope="module")
def literal_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_matches_python_reference(spark, literal_df):
    got = {}
    for r in R.tfidf_keywords(literal_df, k=3).collect():
        got.setdefault(r.doc_id, []).append(
            (r.term, r.tf, r.df_cnt, r.score_mu, r.rank, r.tfidf)
        )
    exp = _py_tfidf(CORPUS, k=3)
    for did in exp:
        g = sorted(got[did], key=lambda t: t[4])
        assert g == exp[did], did
    # doc-distinctive repeated terms rank first
    assert got[0][0][0] in ("spark",) or sorted(
        got[0], key=lambda t: t[4]
    )[0][0] == "spark"
    assert sorted(got[2], key=lambda t: t[4])[0][0] == "cooking"


def test_corpus_wide_term_scores_zero(spark, literal_df):
    rows = R.tfidf_keywords(literal_df, k=10).collect()
    scores = {(r.doc_id, r.term): r.score_mu for r in rows}
    # 'and' appears in docs 1 and 2 -> idf = ln(3/2) > 0; a term in ALL
    # docs would be exactly 0. Build one:
    df = literal_df.sparkSession.createDataFrame(
        [(0, "x common"), (1, "y common"), (2, "z common")],
        "doc_id long, text string",
    )
    rows2 = R.tfidf_keywords(df, k=10).collect()
    for r in rows2:
        if r.term == "common":
            assert r.score_mu == 0


def test_duckdb_twin_sf0001(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = (
        R.tfidf_keywords(df, k=5)
        .orderBy("doc_id", "rank")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    exp = con.sql(
        R.tfidf_keywords_sql(k=5) + " ORDER BY doc_id, rank"
    ).df()
    assert len(got) == len(exp) > 0
    for c in ("doc_id", "term", "tf", "df_cnt", "score_mu", "rank"):
        assert list(got[c]) == list(exp[c]), c
    assert got["tfidf"].tolist() == pytest.approx(
        exp["tfidf"].tolist(), abs=1e-9
    )


def test_plan_no_global_window(spark, sf_dir):
    import re

    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        R.tfidf_keywords(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert not re.search(r"Window \[[^\]]*\], \[\]", plan)

"""Obfuscation-robust blocked-term filter: evasion goldens + twin."""

from __future__ import annotations

import duckdb
import pytest

from pdal_spark.datapipe import contentfilter as CF

TERMS = ["spam", "casino", "pills"]

DOCS = [
    (0, "buy SPAM and sp4m and $pam today"),        # 3 hits, 1 term
    (1, "visit the c4sino for piiiills"),           # casino + pills
    (2, "a perfectly clean letter about kittens"),  # 0 hits
    (3, "spaaaaam"),                                # stretched
    (4, "spa m is a spa treatment"),                # split evasion: missed
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_evasion_goldens(spark, docs_df):
    got = {
        r.doc_id: (r.n_hits, r.n_distinct_terms, r.blocked)
        for r in CF.blocked_terms(docs_df, TERMS).collect()
    }
    assert got[0] == (3, 1, True)
    assert got[1] == (2, 2, True)
    assert got[2] == (0, 0, False)
    assert got[3] == (1, 1, True)
    # documented out-of-scope: whitespace-split evasion not caught
    assert got[4] == (0, 0, False)
    assert len(got) == 5  # clean docs included with blocked=False


def test_legit_doubles_survive():
    assert CF._norm_py("letter") == "letter"
    assert CF._norm_py("spaaaam") == "spam"
    assert CF._norm_py("SP4M") == "spam"
    assert CF._norm_py("$pam") == "spam"
    assert CF._norm_py("c00l") == "cool"


def test_empty_terms_raises(spark, docs_df):
    with pytest.raises(ValueError):
        CF.blocked_terms(docs_df, [])


def test_duckdb_twin_sf0001(spark, sf_dir):
    terms = ["spark", "fast", "sl0w"]
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = (
        CF.blocked_terms(df, terms).orderBy("doc_id").toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    exp = con.sql(
        CF.blocked_terms_sql(terms) + " ORDER BY doc_id"
    ).df()
    assert len(got) == len(exp) > 0
    assert got["blocked"].sum() > 0
    for c in ("doc_id", "n_hits", "n_distinct_terms", "blocked"):
        assert list(got[c]) == list(exp[c]), c


def test_plan_broadcast_join(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        CF.blocked_terms(df, TERMS)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan

"""Sliding-window chunking: literal python reference, coverage /
overlap invariants, boundary docs, DuckDB twin at sf0.001."""

from __future__ import annotations

import duckdb
import pytest

from pdal_spark.datapipe import chunking as CH


def _py_chunks(text, max_tokens, overlap):
    ws = text.split(" ")
    n = len(ws)
    stride = max_tokens - overlap
    i_max = max(0, -((-(n - max_tokens)) // stride))
    out = []
    for i in range(i_max + 1):
        s = i * stride
        toks = ws[s : s + max_tokens]
        out.append((i, s + 1, len(toks), " ".join(toks)))
    return out


@pytest.mark.parametrize(
    "n,mt,ov",
    [(1, 8, 2), (8, 8, 2), (9, 8, 2), (20, 8, 2), (25, 8, 0), (100, 16, 8)],
)
def test_matches_python_reference(spark, n, mt, ov):
    text = " ".join(f"w{i}" for i in range(n))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = [
        (r.chunk_id, r.start_tok, r.n_tok, r.chunk_text)
        for r in CH.chunk_documents(df, max_tokens=mt, overlap=ov)
        .orderBy("chunk_id")
        .collect()
    ]
    assert got == _py_chunks(text, mt, ov)


def test_coverage_and_overlap_invariants(spark):
    text = " ".join(f"t{i}" for i in range(137))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = (
        CH.chunk_documents(df, max_tokens=32, overlap=8)
        .orderBy("chunk_id")
        .collect()
    )
    covered = set()
    for r in rows:
        covered.update(range(r.start_tok, r.start_tok + r.n_tok))
    assert covered == set(range(1, 138))  # every token covered
    for a, b in zip(rows, rows[1:]):
        assert b.start_tok - a.start_tok == 32 - 8  # exact stride
        assert a.n_tok == 32  # only the last chunk may be short
    assert rows[-1].start_tok + rows[-1].n_tok == 138


def test_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        CH.chunk_documents(df, max_tokens=8, overlap=8)


def test_duckdb_twin_sf0001(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = (
        CH.chunk_documents(df, max_tokens=64, overlap=16)
        .orderBy("doc_id", "chunk_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    exp = con.sql(
        CH.chunk_documents_sql(max_tokens=64, overlap=16)
        + " ORDER BY doc_id, chunk_id"
    ).df()
    assert len(got) == len(exp) > 0
    for c in ("doc_id", "chunk_id", "start_tok", "n_tok", "chunk_text"):
        assert list(got[c]) == list(exp[c]), c


def test_plan_is_map_only(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        CH.chunk_documents(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert "Window" not in plan

"""PMI collocation mining: pure-python reference oracle on a literal
corpus, boundary semantics, and the DuckDB twin at sf0.001."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest

from pdal_spark.datapipe import collocations as C

CORPUS = [
    (0, "new york new york city"),
    (1, "new york is a city"),
    (2, "the city of york"),
    (3, "solo"),
]


def _py_reference(texts, min_count):
    uni, pairs = Counter(), Counter()
    row, col = Counter(), Counter()
    for t in texts:
        ws = t.split(" ")
        uni.update(ws)
        for a, b in zip(ws, ws[1:]):
            pairs[(a, b)] += 1
            row[a] += 1
            col[b] += 1
    n_tok, n_pairs = sum(uni.values()), sum(pairs.values())
    out = {}
    for (a, b), c in pairs.items():
        if c < min_count:
            continue
        pmi = math.log2(
            (float(c) * n_tok * n_tok) / (float(n_pairs) * uni[a] * uni[b])
        )
        m, r1, c1, k11 = float(n_pairs), float(row[a]), float(col[b]), float(c)
        cells = [
            (k11, r1, c1),
            (r1 - k11, r1, m - c1),
            (c1 - k11, m - r1, c1),
            (m - r1 - c1 + k11, m - r1, m - c1),
        ]
        llr = 2.0 * sum(
            k * math.log(k * m / (r * cc)) for k, r, cc in cells if k > 0
        )
        out[(a, b)] = (c, uni[a], uni[b], round(pmi, 6), round(llr, 6))
    return out


@pytest.fixture(scope="module")
def literal_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_literal_matches_python_reference(spark, literal_df):
    got = {
        (r.w1, r.w2): (r.cnt_pair, r.cnt_w1, r.cnt_w2, r.pmi, r.llr)
        for r in C.pmi_collocations(literal_df, min_count=2).collect()
    }
    exp = _py_reference([t for _, t in CORPUS], min_count=2)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][:3] == exp[k][:3], k
        assert got[k][3] == pytest.approx(exp[k][3], abs=1e-9), k
        assert got[k][4] == pytest.approx(exp[k][4], abs=1e-6), k
    # "new york" is the planted collocation: top PMI and top LLR
    assert max(got, key=lambda k: got[k][3]) == ("new", "york")
    assert max(got, key=lambda k: got[k][4]) == ("new", "york")


def test_min_count_one_keeps_singletons(spark, literal_df):
    got = C.pmi_collocations(literal_df, min_count=1)
    exp = _py_reference([t for _, t in CORPUS], min_count=1)
    assert got.count() == len(exp)


def test_one_word_doc_contributes_tokens_not_pairs(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, "b")], "doc_id long, text string"
    )
    rows = C.pmi_collocations(df, min_count=1).collect()
    assert len(rows) == 1
    r = rows[0]
    # N=3 tokens (b counted twice), M=1 pair
    assert (r.w1, r.w2, r.cnt_pair, r.cnt_w1, r.cnt_w2) == ("a", "b", 1, 1, 2)
    assert r.pmi == pytest.approx(round(math.log2(9.0 / 2.0), 6), abs=1e-9)


def test_duckdb_twin_sf0001(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = (
        C.pmi_collocations(df, min_count=3)
        .orderBy("w1", "w2")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    exp = (
        con.sql(C.pmi_collocations_sql(min_count=3) + " ORDER BY w1, w2")
        .df()
    )
    assert len(got) == len(exp) > 0
    for c in ("w1", "w2", "cnt_pair", "cnt_w1", "cnt_w2"):
        assert list(got[c]) == list(exp[c]), c
    assert got["pmi"].tolist() == pytest.approx(exp["pmi"].tolist(), abs=1e-9)
    assert got["llr"].tolist() == pytest.approx(exp["llr"].tolist(), abs=1e-9)


def test_plan_shape(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        C.pmi_collocations(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "Window" not in plan

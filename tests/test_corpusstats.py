"""Zipf / Heaps corpus-statistics fits: pure-python fixed-point
reference, degenerate-group guards, and DuckDB twins at sf0.001."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest

from pdal_spark.datapipe import corpusstats as CS

MU = 1_000_000.0


def _round_half_up(v: float) -> int:
    return int(math.floor(v + 0.5))


def _fit_points(pts):
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    den = float(n) * float(sxx) - float(sx) * float(sx)
    if n < 2 or den == 0.0:
        return None, None
    slope = (float(n) * float(sxy) - float(sx) * float(sy)) / den
    intercept = (float(sy) - slope * float(sx)) / float(n) / MU
    return round(slope, 6), round(intercept, 6)


def _py_zipf(docs, max_rank):
    """docs: list of (lang, text)."""
    out = {}
    langs = {lang for lang, _ in docs}
    for lang in langs:
        cnt = Counter()
        for lg, t in docs:
            if lg == lang:
                cnt.update(t.split(" "))
        n_types, n_tokens = len(cnt), sum(cnt.values())
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        pts = [
            (
                _round_half_up(math.log(r + 1) * MU),
                _round_half_up(math.log(c) * MU),
            )
            for r, (_, c) in enumerate(ranked[:max_rank])
        ]
        slope, intercept = _fit_points(pts)
        out[lang] = (n_types, n_tokens, len(pts), slope, intercept)
    return out


CORPUS = [
    ("en", "the cat sat on the mat and the dog sat too"),
    ("en", "the cat and the dog ran on the mat"),
    ("de", "der hund und die katze und der hund"),
]


@pytest.fixture(scope="module")
def literal_df(spark):
    rows = [(i, lang, t, "s0") for i, (lang, t) in enumerate(CORPUS)]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string, source string"
    )


def test_zipf_matches_python_reference(spark, literal_df):
    got = {
        r.lang: (
            r.n_types, r.n_tokens, r.n_points, r.zipf_slope, r.zipf_intercept
        )
        for r in CS.zipf_fit(literal_df, max_rank=100).collect()
    }
    exp = _py_zipf([(lg, t) for lg, t in CORPUS], max_rank=100)
    assert set(got) == set(exp)
    for lang in exp:
        assert got[lang][:3] == exp[lang][:3], lang
        assert got[lang][3] == pytest.approx(exp[lang][3], abs=1e-9), lang
        assert got[lang][4] == pytest.approx(exp[lang][4], abs=1e-9), lang
    # frequencies decay with rank -> negative slope
    assert got["en"][3] < 0


def test_degenerate_group_emits_null(spark):
    df = spark.createDataFrame(
        [(0, "xx", "same same same", "s0")],
        "doc_id long, lang string, text string, source string",
    )
    r = CS.zipf_fit(df).collect()[0]
    # one distinct word -> one point -> no fit
    assert r.n_points == 1 and r.zipf_slope is None


def test_heaps_beta_in_unit_range(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = CS.heaps_fit(df).collect()
    assert rows
    for r in rows:
        if r.heaps_beta is not None:
            assert 0.0 < r.heaps_beta < 1.0, r  # sublinear vocab growth


def _twin(spark, sf_dir, engine_df, sql, float_cols, int_cols, key):
    keys = [k.strip() for k in key.split(",")]
    got = engine_df.orderBy(*keys).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    exp = con.sql(sql + f" ORDER BY {key}").df()
    assert len(got) == len(exp) > 0
    for c in int_cols:
        assert list(got[c]) == list(exp[c]), c
    for c in float_cols:
        g = [None if v != v else v for v in got[c].astype(object)]
        x = [None if v != v else v for v in exp[c].astype(object)]
        assert g == pytest.approx(x, abs=1e-9), c


def test_zipf_twin_sf0001(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    _twin(
        spark, sf_dir,
        CS.zipf_fit(df, max_rank=1000),
        CS.zipf_fit_sql(max_rank=1000),
        ("zipf_slope", "zipf_intercept"),
        ("lang", "n_types", "n_tokens", "n_points"),
        "lang",
    )


def test_heaps_twin_sf0001(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    _twin(
        spark, sf_dir,
        CS.heaps_fit(df),
        CS.heaps_fit_sql(),
        ("heaps_beta", "heaps_ln_k"),
        ("lang", "n_points"),
        "lang",
    )


def test_keyness_planted_signal(spark):
    """A source whose pages repeat a distinctive word must surface it;
    a uniformly-shared word must not be key anywhere."""
    rows = []
    i = 0
    for s, extra in (("blog", "casserole"), ("forum", "gearbox")):
        for _ in range(6):
            rows.append((i, "en", f"the common words and {extra} thing", s))
            i += 1
    for _ in range(6):
        rows.append((i, "en", "the common words and plain thing", "news"))
        i += 1
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, text string, source string"
    )
    got = {
        (r.source, r.w): r.llr
        for r in CS.source_keyness(df, min_count=3, min_llr=3.84).collect()
    }
    assert ("blog", "casserole") in got
    assert ("forum", "gearbox") in got
    assert not any(w == "the" for _, w in got)
    # G2 against a python reference for one cell
    import math

    # 18 docs x 6 tokens: N_s = 36, m = 108; casserole: 6 hits, all in blog
    k11, r1, c1, m = 6.0, 36.0, 6.0, 108.0
    cells = [
        (k11, r1, c1),
        (r1 - k11, r1, m - c1),
        (c1 - k11, m - r1, c1),
        (m - r1 - c1 + k11, m - r1, m - c1),
    ]
    exp = round(
        2.0
        * sum(k * math.log(k * m / (r * c)) for k, r, c in cells if k > 0),
        6,
    )
    assert got[("blog", "casserole")] == pytest.approx(exp, abs=1e-6)


def test_keyness_twin_sf0001(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    _twin(
        spark, sf_dir,
        CS.source_keyness(df, min_llr=3.84),
        CS.source_keyness_sql(min_llr=3.84),
        ("llr",),
        ("source", "w", "cnt_ws", "cnt_w"),
        "source, w",
    )


def test_plan_shape_no_global_window(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        CS.zipf_fit(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    # windows exist but all are partitioned (grouped_topk + rank)
    import re

    assert not re.search(r"Window \[[^\]]*\], \[\]", plan)

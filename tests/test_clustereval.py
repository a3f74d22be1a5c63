"""Adjusted Rand Index: sklearn-free hand-computed golden, identity /
independence properties, DuckDB twin at sf0.001."""

from __future__ import annotations

import duckdb
import pytest

from pdal_spark.datapipe import clustereval as CE


def _py_ari(la, lb):
    from collections import Counter

    c2 = lambda x: x * (x - 1) // 2  # noqa: E731
    cont = Counter(zip(la, lb))
    s_idx = sum(c2(v) for v in cont.values())
    ai = Counter(la)
    bj = Counter(lb)
    s_a = sum(c2(v) for v in ai.values())
    s_b = sum(c2(v) for v in bj.values())
    n = len(la)
    exp = s_a * s_b / c2(n)
    mx = (s_a + s_b) / 2.0
    if mx == exp:
        return 1.0
    return round((s_idx - exp) / (mx - exp), 6)


def _dfs(spark, la, lb):
    a = spark.createDataFrame(
        list(enumerate(la)), "doc_id long, label_a string"
    )
    b = spark.createDataFrame(
        list(enumerate(lb)), "doc_id long, label_b string"
    )
    return a, b


def test_hand_computed_golden(spark):
    la = ["x", "x", "x", "y", "y", "y"]
    lb = ["p", "p", "q", "q", "r", "r"]
    a, b = _dfs(spark, la, lb)
    r = CE.adjusted_rand(a, b).collect()[0]
    assert r.n_items == 6 and r.n_clusters_a == 2 and r.n_clusters_b == 3
    assert r.ari == pytest.approx(_py_ari(la, lb), abs=1e-9)


def test_identical_labelings_score_one(spark):
    la = ["a", "a", "b", "b", "c"]
    a, b = _dfs(spark, la, la)
    assert CE.adjusted_rand(a, b).collect()[0].ari == pytest.approx(1.0)


def test_permuted_names_still_one(spark):
    la = ["a", "a", "b", "b", "c"]
    lb = ["z", "z", "q", "q", "m"]  # same partition, renamed
    a, b = _dfs(spark, la, lb)
    assert CE.adjusted_rand(a, b).collect()[0].ari == pytest.approx(1.0)


def test_orthogonal_labelings_near_zero(spark):
    # 4x4 grid: rows vs columns — classic independence case
    la = [f"r{i // 4}" for i in range(16)]
    lb = [f"c{i % 4}" for i in range(16)]
    a, b = _dfs(spark, la, lb)
    r = CE.adjusted_rand(a, b).collect()[0]
    # no agreement beyond chance: <= 0 (this grid is anti-correlated,
    # ARI = -0.25 exactly; negative values are in-range for ARI)
    assert r.ari <= 0.0
    assert r.ari == pytest.approx(_py_ari(la, lb), abs=1e-9)


def test_duckdb_twin_sf0001(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = df.selectExpr("doc_id", "lang AS label_a")
    b = df.selectExpr("doc_id", "source AS label_b")
    got = CE.adjusted_rand(a, b).collect()[0]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    exp = con.sql(
        CE.adjusted_rand_sql(
            "SELECT doc_id, lang AS label_a FROM documents",
            "SELECT doc_id, source AS label_b FROM documents",
        )
    ).fetchone()
    assert (got.n_items, got.n_clusters_a, got.n_clusters_b) == exp[:3]
    assert got.ari == pytest.approx(exp[3], abs=1e-9)


def _py_nmi(la, lb):
    import math
    from collections import Counter

    n = len(la)
    cont, ai, bj = Counter(zip(la, lb)), Counter(la), Counter(lb)
    g = 1_000_000_000.0
    rh = lambda v: int(math.floor(v + 0.5)) if v >= 0 else -int(  # noqa: E731
        math.floor(-v + 0.5)
    )
    s_mi = sum(
        rh(v * math.log(v * n / (ai[x] * bj[y])) * g)
        for (x, y), v in cont.items()
    )
    s_ha = sum(rh(v * math.log(n / v) * g) for v in ai.values())
    s_hb = sum(rh(v * math.log(n / v) * g) for v in bj.values())
    mi, ha, hb = s_mi / g / n, s_ha / g / n, s_hb / g / n
    if s_ha == 0 and s_hb == 0:
        return 1.0
    if s_ha == 0 or s_hb == 0:
        return 0.0
    return round(mi / math.sqrt(ha * hb), 6)


def test_nmi_matches_reference_and_bounds(spark):
    la = ["x", "x", "x", "y", "y", "y"]
    lb = ["p", "p", "q", "q", "r", "r"]
    a, b = _dfs(spark, la, lb)
    r = CE.normalized_mutual_info(a, b).collect()[0]
    assert r.nmi == pytest.approx(_py_nmi(la, lb), abs=1e-9)
    assert 0.0 <= r.nmi <= 1.0
    # identical partitions -> 1
    a2, b2 = _dfs(spark, la, ["z" + x for x in la])
    assert CE.normalized_mutual_info(a2, b2).collect()[0].nmi == (
        pytest.approx(1.0, abs=1e-6)
    )
    # single-cluster side -> 0 (sklearn convention)
    a3, b3 = _dfs(spark, la, ["only"] * 6)
    assert CE.normalized_mutual_info(a3, b3).collect()[0].nmi == 0.0


def test_nmi_twin_sf0001(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = df.selectExpr("doc_id", "lang AS label_a")
    b = df.selectExpr("doc_id", "source AS label_b")
    got = CE.normalized_mutual_info(a, b).collect()[0]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    exp = con.sql(
        CE.normalized_mutual_info_sql(
            "SELECT doc_id, lang AS label_a FROM documents",
            "SELECT doc_id, source AS label_b FROM documents",
        )
    ).fetchone()
    assert got.n_items == exp[0]
    for g, x in zip((got.mi, got.h_a, got.h_b, got.nmi), exp[1:]):
        assert g == pytest.approx(x, abs=1e-9)


def test_cohens_kappa_literals(spark):
    """Hand-computed 2x2 kappa + degenerate cases."""
    from pdal_spark.datapipe import clustereval as ce

    # contingency: a=b=1: 20, a=1 b=0: 5, a=0 b=1: 10, a=0 b=0: 15
    rows = ([(i, 1, 1) for i in range(20)]
            + [(100 + i, 1, 0) for i in range(5)]
            + [(200 + i, 0, 1) for i in range(10)]
            + [(300 + i, 0, 0) for i in range(15)])
    df = spark.createDataFrame(rows, "doc_id long, la int, lb int")
    a = df.selectExpr("doc_id", "la AS label_a")
    b = df.selectExpr("doc_id", "lb AS label_b")
    r = ce.cohens_kappa(a, b).collect()[0]
    n = 50.0
    po = 35 / n
    pe = (25 * 30 + 25 * 20) / (n * n)
    kappa = (po - pe) / (1 - pe)
    assert r.n == 50
    assert abs(r.p_observed - round(po, 6)) < 1e-9
    assert abs(r.p_expected - round(pe, 6)) < 1e-9
    assert abs(r.kappa - round(kappa, 6)) < 1e-9
    # perfect agreement -> kappa 1 even when pe is high
    same = ce.cohens_kappa(a, a.selectExpr("doc_id", "label_a AS label_b"))
    assert same.collect()[0].kappa == 1.0
    # single-class degenerate (pe == 1) -> defined as 1.0, not NaN
    const = spark.createDataFrame([(1, 1), (2, 1)], "doc_id long, x int")
    r2 = ce.cohens_kappa(
        const.selectExpr("doc_id", "x AS label_a"),
        const.selectExpr("doc_id", "x AS label_b"),
    ).collect()[0]
    assert r2.kappa == 1.0

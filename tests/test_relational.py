"""Relational layer vs numpy/pure-python oracles (FIXTURES.md F8)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdal_spark.functions.dimrange import compile_ranges, parse_range
from pdal_spark.functions.mongo import compile_mongo
from pdal_spark.operators import relational as R
from pdal_spark.operators import stats as S


@pytest.fixture(scope="module")
def fx(spark):
    # 1000 rows: a double (with NaNs), an int, a class label
    rows = []
    for i in range(1000):
        a = float("nan") if i % 97 == 0 else ((i * 7919) % 500) / 10.0 - 20.0
        b = (i * 31) % 100
        cls = (i * 13) % 7
        rows.append((i, a, b, cls))
    df = spark.createDataFrame(rows, "pid long, a double, b int, cls int")
    return df, rows


def test_dimrange_parse():
    r = parse_range("Classification[2:7)")
    assert (r.name, r.lower, r.upper, r.inclusive_lower, r.inclusive_upper, r.negate) == (
        "Classification", 2.0, 7.0, True, False, False
    )
    r = parse_range("!a(:0]")
    assert r.negate and r.lower == -math.inf and r.upper == 0.0 and not r.inclusive_lower


def test_range_filter_nan_and_or_and(fx, spark):
    df, rows = fx
    # OR within dim a, AND across dims: a in [0:5] or a in (10:15), b [20:60]
    out = R.range_filter(df.withColumn("pid2", F.col("pid")), ["a[0:5]", "a(10:15)", "b[20:60]"])
    got = {r["pid"] for r in out.collect()}
    want = set()
    for pid, a, b, cls in rows:
        if math.isnan(a):
            continue  # NaN always fails (DimRange.cpp:119)
        a_ok = (0 <= a <= 5) or (10 < a < 15)
        if a_ok and 20 <= b <= 60:
            want.add(pid)
    assert got == want


def test_range_negate_passes_nan(fx):
    df, rows = fx
    # !a[0:100] — negation flips the NaN-fail into a pass
    out = R.range_filter(df, ["!a[0:100]"])
    got = {r["pid"] for r in out.collect()}
    want = {pid for pid, a, b, cls in rows if math.isnan(a) or not (0 <= a <= 100)}
    assert got == want


def test_mongo_filter(fx):
    df, rows = fx
    expr = {"$or": [{"cls": {"$in": [1, 2]}}, {"b": {"$gte": 95}}], "cls": {"$ne": 6}}
    out = df.filter(compile_mongo(expr))
    got = {r["pid"] for r in out.collect()}
    want = {
        pid
        for pid, a, b, cls in rows
        if ((cls in (1, 2)) or (b >= 95)) and cls != 6
    }
    assert got == want


def test_assign_with_condition_and_order(fx):
    df, rows = fx
    # condition b[0:49]; assignments apply in order, second sees first's result
    out = R.assign(df, ["cls[1:3]=9", "cls[9:9]=4"], condition="b[0:49]")
    got = {r["pid"]: r["cls"] for r in out.collect()}
    for pid, a, b, cls in rows:
        c = cls
        if 0 <= b <= 49:
            if 1 <= c <= 3:
                c = 9
            if c == 9:
                c = 4
        assert got[pid] == c, pid


def test_decimation(fx):
    df, rows = fx
    out = R.decimation(df, step=7, offset=3, limit=500, order_col="pid")
    got = sorted(r["pid"] for r in out.collect())
    want = [i for i in range(1000) if i >= 3 and i < 500 and (i - 3) % 7 == 0]
    assert got == want


def test_head_tail_locate(fx):
    df, rows = fx
    assert sorted(r["pid"] for r in R.head(df, 10, "pid").collect()) == list(range(10))
    assert sorted(r["pid"] for r in R.tail(df, 10, "pid").collect()) == list(range(990, 1000))
    # locate max of b: ties broken by first arrival (strict > while scanning)
    top = R.locate(df, "b", "max", arrival_col="pid").collect()
    assert len(top) == 1
    bmax = max(b for _, a, b, _ in rows)
    first = min(pid for pid, a, b, _ in rows if b == bmax)
    assert (top[0]["pid"], top[0]["b"]) == (first, bmax)


def test_divider_modes(fx):
    df, rows = fx
    out = R.divider(df, count=7, mode="partition", order_col="pid")
    sizes = {r["view_id"]: r["n"] for r in out.groupBy("view_id").agg(F.count("*").alias("n")).collect()}
    # contiguous runs of ceil(1000/7)=143: 6 full + remainder 142
    assert sizes == {0: 143, 1: 143, 2: 143, 3: 143, 4: 143, 5: 143, 6: 142}
    rr = R.divider(df, count=4, mode="round_robin", order_col="pid")
    got = {r["pid"]: r["view_id"] for r in rr.collect()}
    assert all(got[pid] == pid % 4 for pid, *_ in rows)


def test_sort_stable_desc_reverses_ties(spark):
    df = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 1.0), (3, 2.0)], "pid long, v double"
    )
    asc = [r["pid"] for r in R.sort_stable(df, "v", "ASC", "pid").collect()]
    desc = [r["pid"] for r in R.sort_stable(df, "v", "DESC", "pid").collect()]
    assert asc == [0, 2, 1, 3]  # stable: equal keys keep arrival order
    assert desc == [3, 1, 2, 0]  # negated comparator reverses equal runs


def test_voxel_downsize_first_wins(spark):
    pts = [(i, (i * 37 % 100) / 10.0, (i * 53 % 100) / 10.0) for i in range(300)]
    df = spark.createDataFrame(pts, "pid long, x double, y double")
    out = R.voxel_downsize(df, cell=2.5, order_col="pid")
    got = sorted(r["pid"] for r in out.collect())
    seen, want = set(), []
    for pid, x, y in pts:
        key = (math.floor(x / 2.5), math.floor(y / 2.5))
        if key not in seen:
            seen.add(key)
            want.append(pid)
    assert got == sorted(want)


def test_stats_moments_vs_numpy(fx, spark):
    df, rows = fx
    clean = df.filter(~F.isnan("a"))
    got = S.stats(clean, ["a"]).collect()[0].asDict()
    v = np.array([a for _, a, _, _ in rows if not math.isnan(a)])
    n = len(v)
    mean = v.mean()
    m2, m3, m4 = ((v - mean) ** 2).mean(), ((v - mean) ** 3).mean(), ((v - mean) ** 4).mean()
    pop_skew = m3 / m2**1.5
    samp_skew = pop_skew * math.sqrt(n) * math.sqrt(n - 1) / (n - 2)
    pop_kurt = m4 / m2**2
    samp_kurt = pop_kurt * (n + 1) * (n - 1) / ((n - 2) * (n - 3))
    samp_ex = samp_kurt - 3 * (n - 1) ** 2 / ((n - 2) * (n - 3))
    assert got["a_count"] == n
    assert got["a_average"] == pytest.approx(mean, abs=1e-9)
    assert got["a_variance"] == pytest.approx(v.var(ddof=1), abs=1e-9)
    assert got["a_skewness"] == pytest.approx(samp_skew, abs=1e-9)
    assert got["a_kurtosis"] == pytest.approx(samp_ex, abs=1e-9)


def test_ferry_errors(fx):
    df, _ = fx
    with pytest.raises(ValueError):
        R.ferry(df, [("a", "a")])
    with pytest.raises(ValueError):
        R.ferry(df, [("a", "c"), ("b", "c")])
    out = R.ferry(df, [("a", "a2")])
    assert "a2" in out.columns


def test_transformation_affine(spark):
    df = spark.createDataFrame([(0, 1.0, 2.0)], "pid long, x double, y double")
    # translate by (10, 20): identity with t column
    m = [1, 0, 0, 10, 0, 1, 0, 20, 0, 0, 1, 0, 0, 0, 0, 1]
    r = R.transformation(df, [float(v) for v in m]).collect()[0]
    assert (r["x"], r["y"]) == (11.0, 22.0)


def test_voxel_centroid_nn_tie_rules(spark):
    """Literal VoxelCentroidNearestNeighborFilter.cpp cases: singleton
    kept; 2-point voxel -> nearer the CENTER, later arrival on ties
    (:118-123 `d1 < d2` else second); 3+ -> nearer the CENTROID, earlier
    arrival on ties (:139-150 strict `<` scan)."""
    from pdal_spark.operators.relational import voxel_centroid_nearest_neighbor

    rows = [
        (0, 1.0, 1.0),    # voxel (0,0): alone -> kept
        (1, 12.0, 4.0),   # voxel (1,0): equidistant to center (15,5)
        (2, 18.0, 6.0),   #   -> LATER arrival (id 2) wins
        (3, 21.0, 1.0),   # voxel (2,0): centroid (25,1)
        (4, 25.0, 1.0),   #   -> id 4 exactly at centroid wins
        (5, 29.0, 1.0),
        (6, 31.0, 1.0),   # voxel (3,0): centroid (35, 11/3); min-dist tie
        (7, 39.0, 1.0),   #   between 6 and 7 -> EARLIER arrival (id 6)
        (8, 35.0, 9.0),
    ]
    df = spark.createDataFrame(rows, "page_id long, x double, y double")
    out = voxel_centroid_nearest_neighbor(
        df, cell=10.0, origin=(0.0, 0.0, 0.0), order_col="page_id"
    )
    assert {r.page_id for r in out.collect()} == {0, 2, 4, 6}


# ---------------------------------------------------------------------------
# filters.randomize
# ---------------------------------------------------------------------------

def test_randomize_is_permutation_and_deterministic(spark):
    from pdal_spark.operators.relational import randomize

    n = 500
    df = spark.range(n).withColumnRenamed("id", "page_id")
    out = randomize(df, seed=7, order_col="page_id")
    ranks = [r.shuffle_rank for r in out.collect()]
    assert sorted(ranks) == list(range(1, n + 1))  # exact permutation

    # partition-count invariance (the rank must not depend on layout)
    again = randomize(df.repartition(13), seed=7, order_col="page_id")
    m1 = {r.page_id: r.shuffle_rank for r in out.collect()}
    m2 = {r.page_id: r.shuffle_rank for r in again.collect()}
    assert m1 == m2

    # a different seed produces a different order, and the shuffle is
    # not the identity / reverse
    other = randomize(df, seed=8, order_col="page_id")
    m3 = {r.page_id: r.shuffle_rank for r in other.collect()}
    assert m3 != m1
    assert any(m1[i] != i + 1 for i in range(n))
    assert any(m1[i] != n - i for i in range(n))


def test_randomize_params_bijective():
    from pdal_spark.operators.relational import _SHUFFLE_P, shuffle_params

    a, b = shuffle_params(123)
    assert 1 <= a < _SHUFFLE_P and 0 <= b < _SHUFFLE_P
    keys = {(a * i + b) % _SHUFFLE_P for i in range(20000)}
    assert len(keys) == 20000

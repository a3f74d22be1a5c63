"""JL random projection: numpy reference, distance-preservation
property, determinism, DuckDB twin at sf0.001."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from pdal_spark.datapipe import jl as JL


def test_signs_deterministic_and_balanced():
    a = JL.jl_signs(64, 16, seed=7)
    b = JL.jl_signs(64, 16, seed=7)
    assert a == b
    assert JL.jl_signs(64, 16, seed=8) != a
    flat = [v for col in a for v in col]
    assert set(flat) == {-1, 1}
    # roughly balanced signs
    assert abs(sum(flat)) < 0.2 * len(flat)


def test_matches_numpy_reference(spark):
    rng = np.random.RandomState(3)
    vecs = rng.randn(20, 64).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    got = {}
    for r in JL.jl_project(df, d_in=64, d_out=16).collect():
        got[(r.vec_id, r.dim)] = r.val
    S = np.array(JL.jl_signs(64, 16)).T  # (d_in, d_out)
    exp = vecs.astype(np.float64) @ S / math.sqrt(16.0)
    for i in range(20):
        for j in range(16):
            assert got[(i, j)] == pytest.approx(
                round(exp[i, j], 6), abs=1e-6
            ), (i, j)


def test_distance_preservation(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(80)
    rows = df.collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    S = np.array(JL.jl_signs(64, 16)).T
    Y = X @ S / math.sqrt(16.0)
    rng = np.random.RandomState(0)
    ratios = []
    for _ in range(200):
        a, b = rng.randint(0, len(X), 2)
        if a == b:
            continue
        dx = np.linalg.norm(X[a] - X[b])
        dy = np.linalg.norm(Y[a] - Y[b])
        if dx > 0:
            ratios.append(dy / dx)
    # JL with d_out=16: distances preserved in distribution; the
    # squared-ratio mean is an unbiased 1 with stderr sqrt(2/16)
    assert 0.75 < float(np.mean(np.square(ratios))) < 1.25


def test_duckdb_twin_sf0001(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = (
        JL.jl_project(df, d_in=64, d_out=16)
        .orderBy("vec_id", "dim")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    exp = con.sql(
        "SELECT * FROM ("
        + JL.jl_project_sql(d_in=64, d_out=16)
        + ") ORDER BY vec_id, dim"
    ).df()
    assert len(got) == len(exp) > 0
    for c in ("vec_id", "dim"):
        assert list(got[c]) == list(exp[c]), c
    assert got["val"].tolist() == pytest.approx(exp["val"].tolist(), abs=1e-9)


def test_plan_is_map_only(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = (
        JL.jl_project(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert "Window" not in plan

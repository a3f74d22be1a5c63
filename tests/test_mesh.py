"""filters.delaunay analog (operators/mesh.py).

Golden from the reference's DelaunayFilterTest.cpp:49-63 (6-point
fixture, 5 triangles, cyclic-CCW equality); tiled-vs-single equivalence
proves the halo machinery + hull-band completion; the Euler face-count
identity is the runtime exactness certificate."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdal_spark import synth
from pdal_spark.operators import mesh


REF_PTS = np.array(
    [[0, 0], [0.5, 1], [2, 0], [2, 2], [5, 1.5], [1, -1.5]], float
)
# test/unit/filters/DelaunayFilterTest.cpp:55-62, canonicalized
# (smallest id first, CCW preserved)
REF_TRIS = {(0, 2, 1), (0, 5, 2), (1, 2, 3), (2, 4, 3), (2, 5, 4)}


def test_kernel_reference_golden():
    got = {tuple(t) for t in mesh._delaunay_np(REF_PTS)}
    assert got == REF_TRIS


def test_kernel_euler_count_lattice():
    # LCG lattice points trip the classic super-triangle suppression
    # (near-collinear hull circumradii ~1e15); the pocket fill must
    # recover the exact Euler count 2n-2-h
    rng = np.arange(1000, dtype=np.int64)
    hx = ((rng * 2654435761 + 12345) % 2147483648 * 48271 + 11) % 2147483648
    hy = ((rng * 2246822519 + 101) % 2147483648 * 69621 + 7) % 2147483648
    P = np.column_stack([hx / 2147483648 * 360 - 180,
                         hy / 2147483648 * 180 - 90])
    T = mesh._delaunay_np(P)
    h = len(mesh._hull_np(P))
    assert len(T) == 2 * len(P) - 2 - h
    # every face genuinely Delaunay: spot-check 25 with the robust
    # incircle predicate
    for t in T[:: max(1, len(T) // 25)]:
        inside = mesh._incircle_mask(P, P[t[0]], P[t[1]], P[t[2]])
        inside[list(t)] = False
        assert not inside.any()


def test_single_mode_df(spark):
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(REF_PTS)],
        "pid long, x double, y double",
    )
    got = {
        (r.a, r.b, r.c)
        for r in mesh.delaunay(df, id_col="pid").collect()
    }
    assert got == REF_TRIS


def test_fewer_than_three_points(spark):
    df = spark.createDataFrame([(0, 0.0, 0.0), (1, 1.0, 1.0)],
                               "pid long, x double, y double")
    assert mesh.delaunay(df, id_col="pid").count() == 0


def test_tiled_equals_single_sparse(spark):
    pts = synth.synth_points(spark, 400)
    single = {(r.a, r.b, r.c)
              for r in mesh.delaunay(pts, id_col="page_id").collect()}
    tiled = {
        (r.a, r.b, r.c)
        for r in mesh.delaunay(
            pts, id_col="page_id", mode="tiled",
            tile_len=90.0, halo=45.0, origin=(-180.0, -90.0),
        ).collect()
    }
    assert tiled == single


def test_tiled_equals_single_dense(spark):
    dense = (
        synth.synth_points(spark, 1500)
        .withColumn("x", F.col("x") / 6.3)
        .withColumn("y", F.col("y") / 6.3)
    )
    single = {(r.a, r.b, r.c)
              for r in mesh.delaunay(dense, id_col="page_id").collect()}
    tiled = {
        (r.a, r.b, r.c)
        for r in mesh.delaunay(
            dense, id_col="page_id", mode="tiled",
            tile_len=15.0, halo=8.0, origin=(-30.0, -15.0),
        ).collect()
    }
    assert tiled == single


def test_single_mode_size_cap(spark):
    pts = synth.synth_points(spark, 50)
    with pytest.raises(ValueError, match="use mode='tiled'"):
        mesh.delaunay(pts, id_col="page_id", max_rows_single=10)


def test_hag_delaunay_plane_exact(spark):
    # ground = lattice on the plane z = 2 + 0.5x - 0.25y; any TIN of a
    # planar surface interpolates it exactly, so HAG must equal
    # z - plane(x, y) for every in-hull point regardless of which
    # triangles the TIN picked
    import itertools

    # deterministic jitter keeps the lattice out of the exactly-
    # cocircular degenerate case (DT uniqueness contract)
    g = []
    for i, (gx, gy) in enumerate(
        itertools.product(range(0, 11, 2), range(0, 11, 2))
    ):
        jx = gx + ((i * 37 + 11) % 97) / 997.0
        jy = gy + ((i * 61 + 5) % 89) / 911.0
        g.append((i, jx, jy, 2.0 + 0.5 * jx - 0.25 * jy, 2))
    ng = [
        (100 + j, xx, yy, 50.0 + j, 1)
        for j, (xx, yy) in enumerate([(1.3, 1.7), (5.1, 5.9), (9.2, 3.4)])
    ]
    df = spark.createDataFrame(
        g + ng, "pid long, x double, y double, z double, classification int"
    )
    out = mesh.hag_delaunay(
        df, tile_len=6.0, halo=6.0, origin=(0.0, 0.0), id_col="pid"
    ).collect()
    got = {r.pid: r.height_above_ground for r in out}
    for j, (xx, yy) in enumerate([(1.3, 1.7), (5.1, 5.9), (9.2, 3.4)]):
        want = (50.0 + j) - (2.0 + 0.5 * xx - 0.25 * yy)
        assert abs(got[100 + j] - want) < 1e-9, (j, got[100 + j], want)
    # ground points carry HAG = 0 (HAGFilter.cpp:240)
    assert all(got[i] == 0.0 for i, *_ in g)


def test_hag_delaunay_outside_hull_fallback(spark):
    # a point beyond the ground hull uses the nearest ground z
    # (HAGFilter.cpp:143-146)
    rows = [
        (0, 0.0, 0.0, 10.0, 2),
        (1, 4.0, 0.0, 20.0, 2),
        (2, 0.0, 4.0, 30.0, 2),
        (3, 100.0, 100.0, 99.0, 1),  # far outside; nearest ground = id 1|2
    ]
    df = spark.createDataFrame(
        rows, "pid long, x double, y double, z double, classification int"
    )
    out = {r.pid: r.height_above_ground
           for r in mesh.hag_delaunay(
               df, tile_len=50.0, halo=50.0, origin=(0.0, 0.0), id_col="pid"
           ).collect()}
    # nearest of (4,0) and (0,4) to (100,100): (0,4)? dist equal by
    # symmetry? (96^2+100^2) vs (100^2+96^2) — tie; knn tiebreak is
    # smallest cand_id -> id 1 (z=20)
    assert out[3] == 99.0 - 20.0

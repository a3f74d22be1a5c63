"""filters.chipper parity tests.

Oracle = a deliberately literal, per-element Python re-derivation of the
reference recursion (ChipperFilter.cpp run/load/partition/decideSplit/
split/emit), asserted equal to the vectorized kernel and to the Spark
operator — the dual-implementation pattern from SURVEY §5.2.
Golden shape mirrors /root/reference/test/unit/filters/ChipperTest.cpp:70-102
(1065 points, capacity 15 -> 71 chips of exactly 15 points).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdal_spark import geo, synth
from pdal_spark.operators import chipper


def chip_oracle(xs, ys, capacity):
    """Slow literal oracle: element-loop version of the reference recursion."""
    n = len(xs)
    num = n // capacity + (1 if n % capacity else 0)
    P = [0]
    total = 0.0
    size = n / num
    for _ in range(num):
        total += size
        P.append(int(math.floor(total + 0.5)))

    # each "array" is a list of [pos, ptindex, other_index]
    xv = sorted(([xs[i], i, 0] for i in range(n)), key=lambda e: e[0])
    yv = sorted(([ys[i], i, 0] for i in range(n)), key=lambda e: e[0])
    xpos = {e[1]: i for i, e in enumerate(xv)}
    for i, e in enumerate(yv):
        e[2] = xpos[e[1]]
    ypos_of_xposentry = {}
    for i, e in enumerate(yv):
        ypos_of_xposentry[e[2]] = i
    for i in range(n):
        xv[i][2] = ypos_of_xposentry[i]
    sp = [[0.0, 0, 0] for _ in range(n)]

    out = {}
    counter = [0]

    def emit(wide, lo, hi):
        for r, idx in enumerate(range(lo, hi + 1)):
            out[wide[idx][1]] = (counter[0], r)
        counter[0] += 1

    def decide(v1, v2, spare, pl, pr):
        left, right = P[pl], P[pr] - 1
        if v1[right][0] - v1[left][0] > v2[right][0] - v2[left][0]:
            split(v1, v2, spare, pl, pr)
        else:
            split(v2, v1, spare, pl, pr)

    def split(wide, narrow, spare, pl, pr):
        left, right = P[pl], P[pr] - 1
        if pr - pl == 1:
            emit(wide, left, right)
        elif pr - pl == 2:
            c = P[pr - 1]
            emit(wide, left, c - 1)
            emit(wide, c, right)
        else:
            pc = (pl + pr) // 2
            center = P[pc]
            ls, rs = left, center
            for i in range(left, right + 1):
                if narrow[i][2] < center:
                    spare[ls] = list(narrow[i])
                    wide[narrow[i][2]][2] = ls
                    ls += 1
                else:
                    spare[rs] = list(narrow[i])
                    wide[narrow[i][2]][2] = rs
                    rs += 1
            decide(wide, spare, narrow, pl, pc)
            decide(wide, spare, narrow, pc, pr)

    decide(xv, yv, sp, 0, len(P) - 1)
    cid = np.array([out[i][0] for i in range(n)])
    crank = np.array([out[i][1] for i in range(n)])
    return cid, crank


@pytest.mark.parametrize("n,cap", [(100, 15), (1065, 15), (777, 50), (64, 64)])
def test_kernel_vs_literal_oracle(n, cap):
    ids = np.arange(n)
    xs, ys = geo.geocode_lcg_np(ids)
    cid, crank = chipper.chip_assign_np(xs, ys, cap)
    ocid, ocrank = chip_oracle(list(xs), list(ys), cap)
    np.testing.assert_array_equal(cid, ocid)
    np.testing.assert_array_equal(crank, ocrank)


def test_golden_1065_cap15_shape():
    """ChipperTest.cpp:70-102 shape: 1065 pts, cap 15 -> 71 x 15."""
    ids = np.arange(1065)
    xs, ys = geo.geocode_lcg_np(ids)
    cid, _ = chipper.chip_assign_np(xs, ys, 15)
    sizes = np.bincount(cid)
    assert len(sizes) == 71
    assert (sizes == 15).all()


def test_chips_never_exceed_capacity_and_partition_sizes():
    n, cap = 1000, 37
    ids = np.arange(n)
    xs, ys = geo.geocode_lcg_np(ids)
    cid, crank = chipper.chip_assign_np(xs, ys, cap)
    num = n // cap + (1 if n % cap else 0)
    sizes = np.bincount(cid)
    assert len(sizes) == num
    assert sizes.max() <= cap
    # chip k size == P[k+1] - P[k] (chips are partition intervals)
    P = chipper._partitions(n, cap)
    np.testing.assert_array_equal(sizes, np.diff(P))
    # chip_rank is a permutation of 0..size-1 within each chip
    for k in np.unique(cid):
        r = np.sort(crank[cid == k])
        np.testing.assert_array_equal(r, np.arange(len(r)))


def test_spark_operator_matches_kernel(spark):
    df = synth.synth_points(spark, 500, num_partitions=8)
    out = chipper.chip(df, 40, order_col="page_id").toPandas()
    out = out.sort_values("page_id").reset_index(drop=True)
    ids = np.arange(500)
    xs, ys = geo.geocode_lcg_np(ids)
    cid, crank = chipper.chip_assign_np(xs, ys, 40)
    np.testing.assert_array_equal(out["chip_id"].to_numpy(), cid)
    np.testing.assert_array_equal(out["chip_rank"].to_numpy(), crank)


def test_chip_partitioned_capacity_bound(spark):
    df = synth.synth_points(spark, 2000, num_partitions=8)
    out = chipper.chip_partitioned(
        df, 50, tile_len=90.0, origin_x=-180.0, origin_y=-90.0,
        order_col="page_id",
    )
    sizes = out.groupBy("tile_x", "tile_y", "chip_id").count().toPandas()
    assert (sizes["count"] <= 50).all()
    assert sizes["count"].sum() == 2000
    # within every tile the kernel matches the exact global run on that tile
    one = out.filter((F.col("tile_x") == 0) & (F.col("tile_y") == 0)).toPandas()
    if len(one):
        one = one.sort_values("page_id").reset_index(drop=True)
        cid, _ = chipper.chip_assign_np(
            one["x"].to_numpy(), one["y"].to_numpy(), 50
        )
        np.testing.assert_array_equal(one["chip_id"].to_numpy(), cid)

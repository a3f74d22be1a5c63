"""Splitter parity tests.

Goldens: the analytic 16-tile lattice fixture from
/root/reference/test/unit/filters/SplitterTest.cpp:159-210 (test_buffer2):
FauxReader grid mode over BOX(0,0,1000,1000) = 1000x1000 integer lattice
(x = i % 1000, y = (i/1000) % 1000, io/FauxReader.cpp:194-203), splitter
length=300 origin=(500,500) buffer=25 -> 16 tiles with exact counts.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdal_spark import geo
from pdal_spark.operators import splitter
from pdal_spark.synth import synth_points

GOLD_BUFFER2 = [
    50625, 78525, 78525, 50400, 78525, 121801, 121801, 78176,
    78525, 121801, 121801, 78176, 50400, 78176, 78176, 50176,
]


def lattice(spark, n=1000):
    df = spark.range(0, n * n, 1, 8)
    return df.select(
        F.col("id").alias("page_id"),
        (F.col("id") % n).cast("double").alias("x"),
        ((F.col("id") / n).cast("long") % n).cast("double").alias("y"),
    )


def test_buffer2_lattice_counts(spark):
    df = lattice(spark)
    out = splitter.split(df, length=300.0, origin_x=500.0, origin_y=500.0, buffer=25.0)
    counts = (
        out.groupBy("tile_x", "tile_y")
        .agg(F.count("*").alias("n"), F.min("x").alias("minx"), F.min("y").alias("miny"))
        .orderBy("minx", "miny")
        .collect()
    )
    assert len(counts) == 16
    assert [r["n"] for r in counts] == GOLD_BUFFER2


def test_negative_boundary_truncation(spark):
    # dx exactly on a negative tile boundary lands one tile LOWER than
    # floor: SplitterFilter.cpp:131-135 (trunc then decrement).
    df = spark.createDataFrame(
        [(0, 200.0, 500.0), (1, 500.0, 500.0), (2, 800.0, 500.0)],
        "page_id long, x double, y double",
    )
    out = splitter.split(df, length=300.0, origin_x=500.0, origin_y=500.0)
    rows = {r["page_id"]: (r["tile_x"], r["tile_y"]) for r in out.collect()}
    assert rows[0] == (-2, 0)  # dx=-300 exact boundary -> -2, not floor's -1
    assert rows[1] == (0, 0)
    assert rows[2] == (1, 0)


def numpy_split_oracle(ids, xs, ys, length, ox, oy, buffer):
    """Slow obviously-correct port of SplitterFilter::processPoint."""
    out = []

    def sq(xp, yp, x, y):
        minx = ox + xp * length - buffer
        maxx = minx + length + 2 * buffer
        miny = oy + yp * length - buffer
        maxy = miny + length + 2 * buffer
        return minx < x < maxx and miny < y < maxy

    for i, x, y in zip(ids, xs, ys):
        dx, dy = x - ox, y - oy
        xp = int(dx / length) - (1 if dx < 0 else 0)
        yp = int(dy / length) - (1 if dy < 0 else 0)
        out.append((i, xp, yp))
        if buffer > 0:
            if sq(xp - 1, yp, x, y):
                out.append((i, xp - 1, yp))
            elif sq(xp + 1, yp, x, y):
                out.append((i, xp + 1, yp))
            if sq(xp, yp - 1, x, y):
                out.append((i, xp, yp - 1))
            elif sq(xp, yp + 1, x, y):
                out.append((i, xp, yp + 1))
            if sq(xp - 1, yp - 1, x, y):
                out.append((i, xp - 1, yp - 1))
            elif sq(xp - 1, yp + 1, x, y):
                out.append((i, xp - 1, yp + 1))
            elif sq(xp + 1, yp - 1, x, y):
                out.append((i, xp + 1, yp - 1))
            elif sq(xp + 1, yp + 1, x, y):
                out.append((i, xp + 1, yp + 1))
    return sorted(out)


@pytest.mark.parametrize("buffer", [0.0, 7.5])
def test_split_matches_numpy_oracle_on_hashed_points(spark, buffer):
    df = synth_points(spark, 3000)
    out = splitter.split(df, length=40.0, origin_x=-180.0, origin_y=-90.0, buffer=buffer)
    got = sorted(
        (r["page_id"], r["tile_x"], r["tile_y"])
        for r in out.select("page_id", "tile_x", "tile_y").collect()
    )
    ids = np.arange(3000)
    xs, ys = geo.geocode_lcg_np(ids)
    want = numpy_split_oracle(ids.tolist(), xs.tolist(), ys.tolist(), 40.0, -180.0, -90.0, buffer)
    assert got == want


def test_split_partition_invariance(spark):
    # Spark analog of the reference's standard-vs-stream dual run
    # (test/unit/StreamingTest.cpp:48-166): results identical at any
    # partitioning.
    df = synth_points(spark, 2000)
    a = splitter.split(df.repartition(1), 25.0, 0.0, 0.0, buffer=5.0)
    b = splitter.split(df.repartition(8), 25.0, 0.0, 0.0, buffer=5.0)
    key = ["page_id", "tile_x", "tile_y"]
    assert sorted(map(tuple, a.select(key).collect())) == sorted(
        map(tuple, b.select(key).collect())
    )

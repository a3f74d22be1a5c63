"""Crop parity tests (semantics per /root/reference/filters/CropFilter.cpp).

Oracle = slow numpy/pure-python reimplementation of the same formulas,
run on the same deterministic input (mirrors the reference's
stream-vs-standard dual-run pattern).
"""

from __future__ import annotations

import numpy as np

from pdal_spark import geo
from pdal_spark.operators.crop import (
    Box,
    Circle,
    Polygon,
    crop,
    pnp_even_odd_np,
    polygon_contains,
)
from pdal_spark.synth import synth_points

N = 4000
CONCAVE = Polygon(
    exterior=((-100.0, -50.0), (50.0, -50.0), (50.0, 60.0), (-20.0, 60.0),
              (-20.0, 0.0), (-60.0, 0.0), (-60.0, 60.0), (-100.0, 60.0)),
    holes=(((-90.0, -40.0), (-70.0, -40.0), (-70.0, -20.0), (-90.0, -20.0)),),
)


def pts():
    ids = np.arange(N)
    xs, ys = geo.geocode_lcg_np(ids)
    return ids, xs, ys


def test_crop_box_inside_outside(spark):
    df = synth_points(spark, N)
    b = Box(-90.0, -45.0, 90.0, 45.0)
    ids, xs, ys = pts()
    inside = (b.minx <= xs) & (xs <= b.maxx) & (b.miny <= ys) & (ys <= b.maxy)

    got_in = {r["page_id"] for r in crop(df, [b], mode="stream").collect()}
    got_out = {r["page_id"] for r in crop(df, [b], outside=True, mode="stream").collect()}
    assert got_in == set(ids[inside].tolist())
    assert got_out == set(ids[~inside].tolist())
    assert len(got_in) + len(got_out) == N


def test_crop_circle_strict(spark):
    df = synth_points(spark, N)
    c = Circle(0.0, 0.0, 60.0)
    ids, xs, ys = pts()
    inside = (np.abs(xs) <= c.distance) & (np.abs(ys) <= c.distance) & (
        np.abs(xs) ** 2 + np.abs(ys) ** 2 < c.distance**2
    )
    got = {r["page_id"] for r in crop(df, [c], mode="stream").collect()}
    assert got == set(ids[inside].tolist())


def test_crop_polygon_with_hole(spark):
    df = synth_points(spark, N)
    ids, xs, ys = pts()
    want = set(ids[pnp_even_odd_np(xs, ys, CONCAVE)].tolist())
    got = {r["page_id"] for r in crop(df, [CONCAVE], mode="stream").collect()}
    assert got == want
    # sanity: the hole actually excludes points
    bbox_hole = (xs > -90) & (xs < -70) & (ys > -40) & (ys < -20)
    assert bbox_hole.any()
    assert not (want & set(ids[bbox_hole].tolist()))


def test_crop_batch_one_view_per_geometry(spark):
    # CropFilter.cpp:221-248: batch mode emits one view per geometry;
    # a point in the overlap appears under both geom_ids.
    df = synth_points(spark, N)
    g0 = Box(-50.0, -50.0, 50.0, 50.0)
    g1 = Box(0.0, 0.0, 100.0, 80.0)
    out = crop(df, [g0, g1], mode="batch")
    ids, xs, ys = pts()
    in0 = (xs >= -50) & (xs <= 50) & (ys >= -50) & (ys <= 50)
    in1 = (xs >= 0) & (xs <= 100) & (ys >= 0) & (ys <= 80)
    rows = {(r["page_id"], r["geom_id"]) for r in out.collect()}
    want = {(i, 0) for i in ids[in0].tolist()} | {(i, 1) for i in ids[in1].tolist()}
    assert rows == want


def test_polygon_contains_partition_invariance(spark):
    df = synth_points(spark, 2000)
    a = polygon_contains(df.repartition(1), CONCAVE).filter("_inside").select("page_id")
    b = polygon_contains(df.repartition(7), CONCAVE).filter("_inside").select("page_id")
    assert sorted(r[0] for r in a.collect()) == sorted(r[0] for r in b.collect())


def test_text_byte_identity_through_crop(spark):
    # the per-row invariant: text bytes per url unchanged through a stage
    from pdal_spark.synth import synth_pages, with_coords

    df = with_coords(synth_pages(spark, 500))
    before = dict(
        df.select("url", "text").rdd.map(lambda r: (r["url"], r["text"])).collect()
    )
    out = crop(df, [Box(-180.0, -90.0, 180.0, 90.0)], mode="stream")
    after = dict(
        out.select("url", "text").rdd.map(lambda r: (r["url"], r["text"])).collect()
    )
    assert before == after

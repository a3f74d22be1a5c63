"""EPT octree I/O: metadata goldens, hierarchy pruning, build round trip."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdal_spark.formats import ept

REF = "/root/reference/test/data/ept"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures unavailable"
)


@needs_ref
def test_quick_info_goldens():
    """EptReaderTest preview: count/boundsConforming/srs with no data
    read (only ept.json is opened)."""
    qi = ept.quick_info(f"{REF}/ellipsoid-binary")
    assert qi.points == 100000
    assert qi.bounds_conforming == (
        -8242747.0, 4966505.0, -51.0, -8242445.0, 4966707.0, 51.0
    )
    assert qi.data_type == "binary" and qi.span == 128
    assert qi.srs.get("authority") == "EPSG"
    assert qi.srs.get("horizontal") == "3857"


@needs_ref
def test_resolution_pruning_reference_golden():
    """EptReaderTest resolutionLimit: cube width 44, span 128 ->
    depth widths 0.34375 / 0.171875 / 0.0859375; resolution 0.1 keeps
    depths 0..2 = 479269 points (summed through hierarchy subpages)."""
    nodes = ept.select_nodes(f"{REF}/lone-star-laszip", resolution=0.1)
    assert sum(nodes.values()) == 479269
    assert all(int(k.split("-")[0]) <= 2 for k in nodes)


@needs_ref
def test_read_ept_zstandard_nodes(spark):
    """readers.ept over a zstandard dataset through the from-scratch
    RFC 8878 decoder (EptReaderTest.cpp fullReadZstandard): 100000
    points, every coordinate inside boundsConforming, OriginId == 0."""
    d = f"{REF}/ellipsoid-zstandard"
    df = ept.read_ept(spark, d)
    r = df.agg(
        F.count("*").alias("n"),
        F.min("x").alias("x0"), F.max("x").alias("x1"),
        F.min("y").alias("y0"), F.max("y").alias("y1"),
        F.min("z").alias("z0"), F.max("z").alias("z1"),
        F.min("OriginId").alias("o0"), F.max("OriginId").alias("o1"),
    ).collect()[0]
    assert r["n"] == 100000
    bc = (-8242747.0, 4966505.0, -51.0, -8242445.0, 4966707.0, 51.0)
    assert bc[0] <= r["x0"] and r["x1"] <= bc[3]
    assert bc[1] <= r["y0"] and r["y1"] <= bc[4]
    assert bc[2] <= r["z0"] and r["z1"] <= bc[5]
    assert (r["o0"], r["o1"]) == (0, 0)


def test_node_bounds_halving():
    root = (0.0, 0.0, 0.0, 8.0, 8.0, 8.0)
    assert ept._node_bounds(root, "0-0-0-0") == root
    assert ept._node_bounds(root, "1-1-0-1") == (4.0, 0.0, 4.0, 8.0, 4.0, 8.0)
    assert ept._node_bounds(root, "3-7-0-0")[0] == 7.0


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    df = spark.range(20000).select(
        (F.col("id") % 173 * 1.7).alias("x"),
        (F.col("id") % 211 * 0.9).alias("y"),
        (F.col("id") % 97 * 0.5).alias("z"),
        (F.col("id") % 65536).cast("double").alias("Intensity"),
    )
    root = str(tmp_path_factory.mktemp("ept") / "ds")
    meta = ept.write_ept(df, root, node_capacity=4000, max_depth=6)
    return df, root, meta


def test_build_roundtrip(spark, built):
    df, root, meta = built
    assert meta["points"] == 20000
    back = ept.read_ept(spark, root)
    assert back.count() == 20000
    # values survive modulo the 0.01 quantization
    a = back.orderBy("x", "y", "z").toPandas()
    b = df.orderBy("x", "y", "z").toPandas()
    np.testing.assert_allclose(a["x"], b["x"], atol=5.1e-3)
    np.testing.assert_array_equal(a["Intensity"], b["Intensity"])


def test_bounds_query_prunes_and_matches(spark, built):
    df, root, meta = built
    q = (50.0, 50.0, 0.0, 120.0, 120.0, 50.0)
    picked = ept.select_nodes(root, bounds=q)
    assert 0 < len(picked) < meta["nodes"]  # genuine pruning
    sub = ept.read_ept(spark, root, bounds=q)
    pred = "x>=50 and x<=120 and y>=50 and y<=120 and z<=50"
    assert sub.filter(pred).count() == df.filter(pred).count()


def test_resolution_query_returns_root_sample(spark, built):
    df, root, meta = built
    coarse = ept.read_ept(spark, root, resolution=1e6)
    assert coarse.count() <= 4000  # just the depth-0 subsample


def test_node_capacity_respected(built):
    df, root, meta = built
    import json

    hier = json.load(open(os.path.join(root, "ept-hierarchy",
                                       "0-0-0-0.json")))
    assert all(0 < c <= 4000 for c in hier.values())
    assert sum(hier.values()) == 20000


def test_write_determinism(spark, tmp_path):
    df = spark.range(3000).select(
        (F.col("id") % 59 * 1.0).alias("x"),
        (F.col("id") % 31 * 1.0).alias("y"),
        (F.col("id") % 17 * 1.0).alias("z"),
    )
    r1 = str(tmp_path / "a")
    r2 = str(tmp_path / "b")
    ept.write_ept(df.repartition(2), r1, node_capacity=500, max_depth=5)
    ept.write_ept(df.repartition(7), r2, node_capacity=500, max_depth=5)
    import json

    h1 = json.load(open(os.path.join(r1, "ept-hierarchy", "0-0-0-0.json")))
    h2 = json.load(open(os.path.join(r2, "ept-hierarchy", "0-0-0-0.json")))
    assert h1 == h2  # partition-count-invariant build


# --- writers.ept_addon --------------------------------------------------------


def test_addon_roundtrip_full(spark, built, tmp_path):
    """Every point tagged -> every value rides back through the
    per-node sidecar buffers (io/EptAddonWriter.cpp writeOne)."""
    _df, root, _meta = built
    base = ept.read_ept(spark, root, with_node_ids=True)
    tagged = base.withColumn("odd", F.col("Intensity") * 2 + 1)
    aroot = str(tmp_path / "addon_full")
    res = ept.write_ept_addon(tagged, root, aroot, "odd")
    assert res["points_written"] == 20000
    merged = ept.read_ept(spark, root, addons={"odd": aroot})
    assert merged.filter(
        F.col("odd") != F.col("Intensity") * 2 + 1
    ).count() == 0


def test_addon_zero_fill_and_empty_nodes(spark, built, tmp_path):
    """Untagged points read back the zero fill; hierarchy nodes with no
    tagged points still get a (zeroed) buffer file."""
    import json
    import os

    _df, root, _meta = built
    base = ept.read_ept(spark, root, with_node_ids=True)
    tagged = base.filter(F.col("x") > 200).withColumn(
        "flag", F.lit(7.0)
    )
    n_tagged = tagged.count()
    assert 0 < n_tagged < 20000
    aroot = str(tmp_path / "addon_part")
    ept.write_ept_addon(tagged, root, aroot, "flag")
    with open(os.path.join(root, "ept-hierarchy", "0-0-0-0.json")) as f:
        hierarchy = json.load(f)
    for node in hierarchy:
        assert os.path.exists(os.path.join(aroot, "ept-data", f"{node}.bin"))
    merged = ept.read_ept(spark, root, addons={"flag": aroot})
    assert merged.filter(F.col("flag") == 7.0).count() == n_tagged
    assert merged.filter(F.col("flag") == 0.0).count() == 20000 - n_tagged
    with open(os.path.join(aroot, "ept-addon.json")) as f:
        meta = json.load(f)
    assert meta == {"type": "float", "size": 8, "version": "1.0.0",
                    "dataType": "binary"}


def test_addon_point_ids_are_node_positions(spark, built):
    """ept_point_id must index the node buffer: contiguous 0..count-1
    within every node (the offset contract the addon writer relies on)."""
    _df, root, _meta = built
    base = ept.read_ept(spark, root, with_node_ids=True)
    per = base.groupBy("ept_node_id").agg(
        F.count("*").alias("n"),
        F.min("ept_point_id").alias("lo"),
        F.max("ept_point_id").alias("hi"),
        F.count_distinct("ept_point_id").alias("d"),
    )
    bad = per.filter(
        (F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)
        | (F.col("d") != F.col("n"))
    )
    assert bad.count() == 0


def test_read_ept_laszip_nodes(spark):
    """readers.ept over a laszip dataset (EptReaderTest.cpp
    fullReadLaszip): 518862 points, every coordinate inside
    boundsConforming, OriginId in 0..3 from the BYTE extra item."""
    import os

    from pyspark.sql import functions as F

    d = "/root/reference/test/data/ept/lone-star-laszip"
    if not os.path.isdir(d):
        pytest.skip("reference fixture unavailable")
    df = ept.read_ept(spark, d)
    r = df.agg(
        F.count("*").alias("n"),
        F.min("x").alias("x0"), F.max("x").alias("x1"),
        F.min("y").alias("y0"), F.max("y").alias("y1"),
        F.min("z").alias("z0"), F.max("z").alias("z1"),
        F.min("OriginId").alias("o0"), F.max("OriginId").alias("o1"),
    ).collect()[0]
    assert r["n"] == 518862
    bc = (515368.0, 4918340.0, 2322.0, 515402.0, 4918382.0, 2339.0)
    assert bc[0] <= r["x0"] and r["x1"] <= bc[3]
    assert bc[1] <= r["y0"] and r["y1"] <= bc[4]
    assert bc[2] <= r["z0"] and r["z1"] <= bc[5]
    assert (r["o0"], r["o1"]) == (0, 3)
    # bbox pruning still composes with laszip node decode
    qb = (515380.0, 4918350.0, 2320.0, 515400.0, 4918370.0, 2345.0)
    assert 0 < ept.read_ept(spark, d, bounds=qb).count() < 518862


def test_read_ept_laszip_rgb_nodes(spark):
    """A laszip EPT dataset with RGB + BYTE items (1.2-with-color)
    decodes with the full 17-column schema."""
    import os

    d = "/root/reference/test/data/ept/1.2-with-color"
    if not os.path.isdir(d):
        pytest.skip("reference fixture unavailable")
    df = ept.read_ept(spark, d)
    assert df.count() == 1065
    assert {"x", "y", "z", "Red", "Green", "Blue", "OriginId"} <= set(
        df.columns)


def test_write_ept_zstandard_roundtrip(spark, tmp_path):
    """write_ept(data_type='zstandard') wraps each node in a stored-
    block zstd frame; read back equals the binary build exactly."""
    pts = spark.range(0, 2000).select(
        (F.col("id") % 50 * 1.0).alias("x"),
        (F.col("id") % 37 * 2.0).alias("y"),
        (F.col("id") % 11 * 3.0).alias("z"),
        F.col("id").cast("double").alias("val"),
    )
    rb = str(tmp_path / "bin")
    rz = str(tmp_path / "zst")
    ept.write_ept(pts, rb, node_capacity=256, max_depth=5)
    ept.write_ept(pts, rz, node_capacity=256, max_depth=5,
                  data_type="zstandard")
    a = sorted(map(tuple, ept.read_ept(spark, rb).collect()))
    b = sorted(map(tuple, ept.read_ept(spark, rz).collect()))
    assert a == b and len(a) == 2000


def test_write_ept_laszip_roundtrip(spark, tmp_path):
    """write_ept(data_type='laszip') — Entwine's default dataType —
    writes each node as a standalone .laz (fmt 0 + BYTE-v2 extras for
    non-LAS dims); read back equals the binary build exactly, and every
    node file is independently a valid LAZ for read_laz_points."""
    import glob
    import struct as _s

    import numpy as np

    from pdal_spark.formats import laz as lazmod

    pts = spark.range(0, 2000).select(
        (F.col("id") % 50 * 1.0).alias("x"),
        (F.col("id") % 37 * 2.0).alias("y"),
        (F.col("id") % 11 * 3.0).alias("z"),
        F.col("id").cast("double").alias("val"),
        (F.col("id") % 7).cast("double").alias("grp"),
    )
    rb = str(tmp_path / "bin")
    rl = str(tmp_path / "laz")
    ept.write_ept(pts, rb, node_capacity=256, max_depth=5)
    meta = ept.write_ept(pts, rl, node_capacity=256, max_depth=5,
                         data_type="laszip")
    assert meta["points"] == 2000
    a = sorted(map(tuple, ept.read_ept(spark, rb).collect()))
    b = sorted(map(tuple, ept.read_ept(spark, rl).collect()))
    assert a == b and len(a) == 2000

    # every node is a self-contained .laz: header + VLR + one chunk
    nodes = sorted(glob.glob(os.path.join(rl, "ept-data", "*.laz")))
    assert nodes
    total = 0
    for p in nodes:
        buf = open(p, "rb").read()
        assert buf[:4] == b"LASF" and buf[104] & 0x80
        info = lazmod.laz_vlr_info(buf)
        assert [it["type"] for it in info["items"]] == [6, 0]
        assert info["items"][1]["size"] == 16  # val + grp extras
        rec = lazmod.read_laz_points(p)
        total += len(rec)
        # extras decode as the two float64 columns
        xtr = rec["extra"].reshape(len(rec), 16)
        val = np.ascontiguousarray(xtr[:, :8]).view("<f8").ravel()
        assert set(np.unique(val)) <= set(float(v) for v in range(2000))
    assert total == 2000


def test_write_ept_laszip_bbox_pushdown(spark, tmp_path):
    """Bounds pruning returns the same rows over laszip nodes as over
    the binary build of the same data (node-granular pruning — parity
    is the contract, the exact row set is the binary path's)."""
    pts = spark.range(0, 4000).select(
        (F.col("id") % 80 * 1.0).alias("x"),
        (F.col("id") % 41 * 2.0).alias("y"),
        (F.col("id") % 13 * 3.0).alias("z"),
    )
    rb = str(tmp_path / "bin2")
    rl = str(tmp_path / "laz2")
    ept.write_ept(pts, rb, node_capacity=512, max_depth=5)
    ept.write_ept(pts, rl, node_capacity=512, max_depth=5,
                  data_type="laszip")
    bounds = (10.0, 10.0, 0.0, 40.0, 50.0, 36.0)
    a = sorted(map(tuple,
                   ept.read_ept(spark, rb, bounds=bounds).collect()))
    b = sorted(map(tuple,
                   ept.read_ept(spark, rl, bounds=bounds).collect()))
    assert a == b and len(a) > 0


def test_wkt_polygon_parser():
    from pdal_spark.operators.crop import Polygon, parse_wkt_polygons

    p = parse_wkt_polygons(
        "POLYGON ((0 0 5, 4 0 5, 4 4 5, 0 4 5, 0 0 5),"
        " (1 1, 2 1, 2 2, 1 2, 1 1))")
    assert len(p) == 1 and isinstance(p[0], Polygon)
    assert p[0].exterior[1] == (4.0, 0.0) and len(p[0].holes) == 1
    m = parse_wkt_polygons(
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))")
    assert len(m) == 2 and m[1].exterior[0] == (5.0, 5.0)
    with pytest.raises(ValueError):
        parse_wkt_polygons("LINESTRING (0 0, 1 1)")


def test_poly_node_intersects_cases():
    from pdal_spark.operators.crop import Polygon

    tri = Polygon(exterior=((0.0, 0.0), (10.0, 0.0), (5.0, 10.0)))
    box = lambda x0, y0, x1, y1: (x0, y0, 0.0, x1, y1, 1.0)
    assert ept._poly_node_intersects(tri, box(4, 1, 6, 3))     # box in poly
    assert ept._poly_node_intersects(tri, box(-5, -5, 15, 15))  # poly in box
    assert ept._poly_node_intersects(tri, box(-1, -1, 1, 1))   # corner cross
    assert not ept._poly_node_intersects(tri, box(11, 11, 12, 12))
    assert not ept._poly_node_intersects(tri, box(-2, 5, -0.5, 6))
    donut = Polygon(exterior=((0.0, 0.0), (10.0, 0.0), (10.0, 10.0),
                              (0.0, 10.0)),
                    holes=(((2.0, 2.0), (8.0, 2.0), (8.0, 8.0),
                            (2.0, 8.0)),))
    assert not ept._poly_node_intersects(donut, box(4, 4, 6, 6))  # in hole
    assert ept._poly_node_intersects(donut, box(1, 4, 3, 6))      # rim


REF_EPT_COLOR = "/root/reference/test/data/ept/1.2-with-color"
REF_EPT_LONESTAR = "/root/reference/test/data/ept/lone-star-laszip"
REF_SELECTION_WKT = "/root/reference/test/data/autzen/autzen-selection.wkt"


@pytest.mark.skipif(not os.path.isdir(REF_EPT_COLOR),
                    reason="reference fixture unavailable")
def test_polygon_query_bounded_crop_golden(spark):
    """EptReaderTest boundedCrop (EptReaderTest.cpp:631-691): the
    autzen selection polygon over the 1.2-with-color EPT returns
    exactly 47 points; node pruning must not change the row set."""
    wkt = open(REF_SELECTION_WKT).read()
    got = ept.read_ept(spark, REF_EPT_COLOR, polygon=wkt + "/ EPSG:3644")
    assert got.count() == 47
    # pruning-off parity: the crop filter alone gives the same rows
    from pdal_spark.operators import crop as crop_op

    polys = crop_op.parse_wkt_polygons(wkt)
    base = ept.read_ept(spark, REF_EPT_COLOR)
    want = crop_op.crop(base, polys, mode="stream")
    a = sorted(map(tuple, got.select("x", "y", "z").collect()))
    b = sorted(map(tuple, want.select("x", "y", "z").collect()))
    assert a == b


@pytest.mark.skipif(not os.path.isdir(REF_EPT_LONESTAR),
                    reason="reference fixture unavailable")
def test_origin_query_golden(spark):
    """EptReaderTest originRead (EptReaderTest.cpp:431-458): reading
    each origin yields only that OriginId and the per-origin counts sum
    to the full dataset; bad origins raise like the reference
    (EptReaderTest.cpp:460-469)."""
    total = 0
    for o in range(4):
        df = ept.read_ept(spark, REF_EPT_LONESTAR, origin=o)
        r = df.agg(F.count("*").alias("n"),
                   F.count_distinct("OriginId").alias("d"),
                   F.min("OriginId").alias("m")).collect()[0]
        assert (r.d, r.m) == (1, o)
        total += r.n
    assert total == 518862
    # substring resolution (unique basename fragment -> OriginId 1)
    n2 = ept.read_ept(spark, REF_EPT_LONESTAR, origin="split-2").count()
    assert n2 == 154561
    with pytest.raises(ValueError, match="Invalid origin ID"):
        ept.read_ept(spark, REF_EPT_LONESTAR, origin=4)
    with pytest.raises(ValueError, match="not unique"):
        ept.read_ept(spark, REF_EPT_LONESTAR, origin="split")
    with pytest.raises(ValueError, match="Failed lookup"):
        ept.read_ept(spark, REF_EPT_LONESTAR, origin="nope")


def test_write_ept_laszip_multichunk_node(spark, tmp_path):
    """A node above the VLR's 50000-point chunk size splits into
    multiple laszip chunks; the chunk table and decode stay exact."""
    import glob

    from pdal_spark.formats import laz as lazmod

    pts = spark.range(0, 60000).select(
        (F.col("id") % 317 * 1.0).alias("x"),
        (F.col("id") % 211 * 1.0).alias("y"),
        (F.col("id") % 97 * 1.0).alias("z"),
        F.col("id").cast("double").alias("val"),
    )
    root = str(tmp_path / "big")
    ept.write_ept(pts, root, node_capacity=60000, max_depth=3,
                  data_type="laszip")
    node = max(glob.glob(root + "/ept-data/*.laz"),
               key=lambda p: os.path.getsize(p))
    _, extents = lazmod.laz_chunk_extents(node)
    assert len(extents) == 2 and sum(n for _, _, n in extents) == 60000
    a = sorted(map(tuple, pts.collect()))
    b = sorted(map(tuple,
                   ept.read_ept(spark, root)
                   .select("x", "y", "z", "val").collect()))
    assert a == b

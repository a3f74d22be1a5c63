"""PLY format I/O: reference-fixture parity + distributed read/write."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from pdal_spark.formats import ply

REF = "/root/reference/test/data/ply"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference PLY fixtures unavailable"
)


@needs_ref
@pytest.mark.parametrize("name", ["simple_text.ply", "simple_binary.ply"])
def test_simple_fixtures(spark, name):
    """PlyReaderTest.cpp:68-166 — 3 points (-1,0,0) (0,1,0) (1,0,0)."""
    out = ply.read_ply(spark, f"{REF}/{name}").orderBy("x").toPandas()
    assert len(out) == 3
    np.testing.assert_array_equal(out["x"], [-1.0, 0.0, 1.0])
    np.testing.assert_array_equal(out["y"], [0.0, 1.0, 0.0])
    np.testing.assert_array_equal(out["z"], [0.0, 0.0, 0.0])


@needs_ref
def test_sized_and_unsized_type_names():
    """PlyReader::getType accepts both float64 and double spellings
    (PlyReader.cpp:148-168)."""
    hs = ply.read_header(f"{REF}/sized_dims.ply")
    hu = ply.read_header(f"{REF}/unsized_dims.ply")
    # same dims + types, declared in different orders / spellings
    assert dict(hs.props) == dict(hu.props)


@needs_ref
def test_mesh_vertex_block_stops_before_faces():
    """Vertex decode ignores the trailing face element (list props)."""
    h = ply.read_header(f"{REF}/mesh.ply")
    raw = open(f"{REF}/mesh.ply", "rb").read()
    pdf = ply.decode_ascii(raw[h.data_offset:], h)
    assert len(pdf) == 4
    assert pdf.z.tolist() == [0.0, 0.0, 0.0, 2.0]


@needs_ref
def test_no_vertex_rejected():
    with pytest.raises(ValueError, match="vertex"):
        ply.read_header(f"{REF}/no_vertex.ply")


def test_bad_magic():
    with pytest.raises(ValueError, match="not a PLY"):
        ply.parse_header(b"nope\nend_header\n")


def _cloud(spark, n=400):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        (F.col("id") * 0.25 - 50.0).alias("x"),
        (F.col("id") * -0.125).alias("y"),
        (F.col("id") % 17).cast("double").alias("z"),
        (F.col("id") % 255).cast("int").alias("red"),
    ).repartition(3)


@pytest.mark.parametrize("mode", ["ascii", "binary_le"])
def test_roundtrip(spark, tmp_path, mode):
    df = _cloud(spark)
    path = str(tmp_path / f"rt_{mode}.ply")
    meta = ply.write_ply(df, path, storage_mode=mode, precision=6)
    assert meta["count"] == 400
    back = ply.read_ply(spark, path).orderBy("x").toPandas()
    src = df.orderBy("x").toPandas()
    np.testing.assert_allclose(back["x"], src["x"], atol=1e-6)
    np.testing.assert_allclose(back["z"], src["z"], atol=1e-6)
    assert (back["red"].values == src["red"].values).all()
    # header round-trips through our own parser
    h = ply.read_header(path)
    assert h.count == 400
    assert [n for n, _ in h.props] == ["x", "y", "z", "red"]


def test_binary_chunk_invariance(spark, tmp_path):
    df = _cloud(spark, n=1000)
    path = str(tmp_path / "chunks.ply")
    ply.write_ply(df, path, storage_mode="binary_le")
    a = ply.read_ply(spark, path, chunk_points=64).orderBy("x").toPandas()
    b = ply.read_ply(spark, [path], chunk_points=10**6).orderBy("x").toPandas()
    assert len(a) == 1000
    pd.testing.assert_frame_equal(a, b)


def test_pipeline_ply_stages(spark, tmp_path):
    import pdal_spark.pipeline as pl

    path = str(tmp_path / "pipe.ply")
    pl.run(spark, [
        {"type": "readers.faux", "count": 64},
        {"type": "filters.ferry", "dimensions": "x=>z"},
        {"type": "writers.ply", "filename": path,
         "storage_mode": "binary_le"},
    ])
    back = pl.run(spark, [{"type": "readers.ply", "filename": path}])
    assert back.count() == 64
    inferred = pl.run(spark, [path])
    assert inferred.count() == 64

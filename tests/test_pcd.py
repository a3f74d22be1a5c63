"""PCD format I/O: separator fixtures, header errors, round trips."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdal_spark.formats import pcd

REF = "/root/reference/test/data/pcd"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures unavailable"
)


@needs_ref
def test_separator_fixtures_identical(spark):
    """PcdReaderTest: space / tab / comma files decode identically."""
    frames = {}
    for sep in ("space", "tab", "comma"):
        frames[sep] = (
            pcd.read_pcd(spark, f"{REF}/utm17_{sep}.pcd")
            .orderBy("x")
            .toPandas()
        )
    assert len(frames["space"]) == 10
    pd.testing.assert_frame_equal(frames["space"], frames["tab"])
    pd.testing.assert_frame_equal(frames["space"], frames["comma"])
    # TYPE F SIZE 4: values carry float32 resolution, like the reference
    assert frames["space"].x.iloc[0] == np.float32(289814.15)


@needs_ref
def test_missing_data_marker():
    with pytest.raises(ValueError, match="missing DATA marker"):
        pcd.read_header(f"{REF}/missingheader.pcd")


def test_header_consistency_errors(tmp_path):
    f = tmp_path / "bad.pcd"
    f.write_text("FIELDS X Y Z\nSIZE 4 4\nTYPE F F F\nDATA ascii\n")
    with pytest.raises(ValueError, match="SIZE"):
        pcd.read_header(str(f))


@pytest.mark.parametrize("mode", ["ascii", "binary"])
def test_roundtrip(spark, tmp_path, mode):
    df = spark.range(300).select(
        (F.col("id") * 0.5).alias("x"),
        (F.col("id") * 0.25).alias("y"),
        (F.col("id") % 13).cast("double").alias("z"),
    ).repartition(3)
    path = str(tmp_path / f"rt_{mode}.pcd")
    meta = pcd.write_pcd(df, path, storage_mode=mode, precision=3)
    assert meta["count"] == 300
    h = pcd.read_header(path)
    assert h.points == 300 and h.data == mode
    back = pcd.read_pcd(spark, path).orderBy("x").toPandas()
    src = df.orderBy("x").toPandas()
    np.testing.assert_allclose(back["x"], src["x"], atol=2e-2)
    np.testing.assert_allclose(back["z"], src["z"], atol=1e-3)


def test_binary_chunk_invariance(spark, tmp_path):
    df = spark.range(1000).select(
        (F.col("id") * 1.0).alias("x"),
        (F.col("id") * 2.0).alias("y"),
        F.lit(0.0).alias("z"),
    )
    path = str(tmp_path / "c.pcd")
    pcd.write_pcd(df, path, storage_mode="binary")
    a = pcd.read_pcd(spark, path, chunk_points=64).orderBy("x").toPandas()
    b = pcd.read_pcd(spark, [path]).orderBy("x").toPandas()
    assert len(a) == 1000
    pd.testing.assert_frame_equal(a, b)


@needs_ref
def test_pipeline_pcd_stages(spark, tmp_path):
    import pdal_spark.pipeline as pl

    out = pl.run(spark, [
        {"type": "readers.pcd", "filename": f"{REF}/utm17_space.pcd"},
    ])
    assert out.count() == 10
    path = str(tmp_path / "w.pcd")
    pl.run(spark, [
        {"type": "readers.faux", "count": 40},
        {"type": "filters.ferry", "dimensions": "x=>z"},
        {"type": "writers.pcd", "filename": path},
    ])
    assert pl.run(spark, [path]).count() == 40

"""SMRF ground segmentation tests.

Grid kernels get independent oracles (np.gradient for the MATLAB-style
gradients, hand-computed literals for the morphology and inpainting);
the end-to-end operator gets a semantic golden (plane + building) and
feeds filters.hag downstream, mirroring kernels/GroundKernel.cpp.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdal_spark.operators import ground


def test_grad_matches_numpy_gradient():
    rng = np.random.default_rng(3)
    g = rng.normal(size=(9, 7))
    gy, gx = np.gradient(g)  # numpy = same central/one-sided scheme
    np.testing.assert_allclose(ground.grad_x(g), gx, atol=1e-12)
    np.testing.assert_allclose(ground.grad_y(g), gy, atol=1e-12)


def test_erode_dilate_literal():
    g = np.zeros((5, 5))
    g[2, 2] = -3.0
    e1 = ground.erode_diamond(g, 1)
    # the low value spreads to the 4-neighborhood
    assert e1[2, 2] == -3.0 and e1[1, 2] == -3.0 and e1[2, 1] == -3.0
    assert e1[1, 1] == 0.0
    # opening (erode then dilate back) removes a 1-cell PEAK exactly
    p = np.zeros((5, 5))
    p[2, 2] = 7.0
    opened = ground.dilate_diamond(ground.erode_diamond(p, 1), 1)
    assert opened[2, 2] == 0.0
    # and dilate/erode are duals: dilating the eroded low spot restores 0s
    back = ground.dilate_diamond(e1, 1)
    assert back[0, 0] == 0.0


def test_knnfill_literal():
    g = np.array([
        [1.0, 2.0, 3.0],
        [4.0, np.nan, 6.0],
        [7.0, 8.0, 9.0],
    ])
    out = ground.knnfill(g)
    # hole at center: its 8 nearest populated cells are all 8 others
    assert out[1, 1] == pytest.approx((1 + 2 + 3 + 4 + 6 + 7 + 8 + 9) / 8)
    # populated cells untouched
    assert out[0, 0] == 1.0 and out[2, 2] == 9.0


def test_progressive_filter_flags_spike():
    g = np.zeros((7, 7))
    g[3, 3] = 5.0
    obj = ground.progressive_filter(g, cell=1.0, slope=0.15, max_window=3.0)
    assert obj[3, 3] == 1
    assert obj[0, 0] == 0


@pytest.fixture(scope="module")
def scene(spark):
    # 41x41 lattice, spacing 1, z=0 plane with a 5x5-cell building of
    # height 10 at [10,15)^2
    n = 41
    df = spark.range(n * n).select(
        F.col("id").alias("page_id"),
        (F.col("id") % n).cast("double").alias("x"),
        (F.col("id") / n).cast("long").cast("double").alias("y"),
    )
    return df.withColumn(
        "z",
        F.when(
            (F.col("x") >= 10) & (F.col("x") < 15)
            & (F.col("y") >= 10) & (F.col("y") < 15),
            10.0,
        ).otherwise(0.0),
    )


def test_smrf_plane_plus_building(scene):
    out = ground.smrf(
        scene, cell=1.0, slope=0.15, threshold=0.5, window=18.0, scalar=1.25
    ).toPandas()
    building = out[out.z == 10.0]
    flat = out[out.z == 0.0]
    assert set(out.classification.unique()) <= {ground.GROUND, ground.NOT_GROUND}
    assert (building.classification == ground.NOT_GROUND).all()
    # the flat plane is overwhelmingly ground (gradient edge cells may
    # get permissive thresholds, never the other way)
    assert (flat.classification == ground.GROUND).mean() > 0.99


def test_smrf_feeds_hag(scene):
    """GroundKernel.cpp workflow: smrf -> hag; building points sit ~10
    above the interpolated ground, ground points at exactly 0."""
    from pdal_spark.operators.pointcloud import hag

    classed = ground.smrf(
        scene, cell=1.0, slope=0.15, threshold=0.5, window=18.0, scalar=1.25
    )
    out = hag(classed, count=3, id_col="page_id").toPandas()
    g = out[out.classification == ground.GROUND]
    ng = out[(out.classification == ground.NOT_GROUND) & (out.z == 10.0)]
    assert (g.height_above_ground == 0.0).all()
    assert len(ng) and np.allclose(ng.height_above_ground, 10.0, atol=1e-9)


def test_smrf_net_cut_path():
    """cut > 0 exercises the net-cutting branch (SMRFilter.cpp:397-427):
    still a clean plane/building split on the same scene."""
    import pandas as pd

    xs, ys = np.meshgrid(np.arange(21.0), np.arange(21.0))
    z = np.where((xs >= 8) & (xs < 12) & (ys >= 8) & (ys < 12), 8.0, 0.0)
    pdf = pd.DataFrame({
        "page_id": np.arange(xs.size), "x": xs.ravel(), "y": ys.ravel(),
        "z": z.ravel(),
    })
    import pyspark.sql

    spark = pyspark.sql.SparkSession.getActiveSession()
    df = spark.createDataFrame(pdf)
    out = ground.smrf(df, cell=1.0, window=10.0, cut=6.0).toPandas()
    assert (out[out.z == 8.0].classification == ground.NOT_GROUND).all()
    assert (out[out.z == 0.0].classification == ground.GROUND).mean() > 0.95

"""filters.reprojection parity: numpy oracle, drop-on-failure, roundtrip."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdal_spark import geo, synth
from pdal_spark.operators import reprojection as rp


def test_forward_matches_numpy(spark):
    df = synth.synth_points(spark, 300)
    out = rp.reproject(df, "EPSG:4326", "EPSG:3857").toPandas().sort_values("page_id")
    ids = np.arange(300)
    xs, ys = geo.geocode_lcg_np(ids)
    mx, my, ok = rp.reproject_np(xs, ys)
    assert list(out["page_id"]) == list(ids[ok])
    np.testing.assert_allclose(out["x"], mx, rtol=1e-12)
    np.testing.assert_allclose(out["y"], my, rtol=1e-12)


def test_drop_on_failure(spark):
    rows = [(0, 0.0, 89.9), (1, 10.0, 45.0), (2, -5.0, -89.0), (3, 7.0, 85.0)]
    df = spark.createDataFrame(rows, "page_id long, x double, y double")
    out = rp.reproject(df, "EPSG:4326", "EPSG:3857").toPandas()
    # lat 89.9 and -89.0 are beyond the Mercator cutoff (85.051...) -> dropped
    assert set(out["page_id"]) == {1, 3}


def test_roundtrip_identity(spark):
    df = synth.synth_points(spark, 200).filter(
        (F.col("y") > -85.0) & (F.col("y") < 85.0)
    )
    back = rp.reproject(
        rp.reproject(df, "EPSG:4326", "EPSG:3857"), "EPSG:3857", "EPSG:4326"
    ).toPandas().sort_values("page_id")
    orig = df.toPandas().sort_values("page_id")
    np.testing.assert_allclose(back["x"], orig["x"], atol=1e-9)
    np.testing.assert_allclose(back["y"], orig["y"], atol=1e-9)


def test_unknown_pair_raises(spark):
    df = synth.synth_points(spark, 5)
    with pytest.raises(ValueError, match="no built-in transform"):
        rp.reproject(df, "EPSG:4326", "EPSG:32633")

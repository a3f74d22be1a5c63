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
    # UTM zones (326xx/327xx) are registered now — a non-UTM projected
    # CRS (LCC, EPSG:2154) still routes to the pyproj-kernel error
    with pytest.raises(ValueError, match="no built-in transform"):
        rp.reproject(df, "EPSG:4326", "EPSG:2154")


# --- UTM (EPSG:326xx/327xx) --------------------------------------------------


def test_utm_meridian_arc_independent_oracle():
    """Northing on the central meridian == k0 * meridian arc, where the
    arc comes from direct numeric integration of the ellipsoid integral
    — independent of the Snyder series the kernel uses."""
    import math

    import numpy as np

    from pdal_spark.operators import reprojection as rp

    a, e2 = 6378137.0, rp._E2

    def arc(phi_deg):
        t = np.linspace(0, math.radians(phi_deg), 400001)
        f = a * (1 - e2) / np.power(1 - e2 * np.sin(t) ** 2, 1.5)
        return np.trapz(f, t)

    for lat in (15.0, 45.0, 70.0):
        _, n, _ = rp.reproject_np(
            np.array([3.0]), np.array([lat]), "EPSG:4326", "EPSG:32631"
        )
        assert abs(n[0] - 0.9996 * arc(lat)) < 1e-2
    # equator/CM anchor + symmetry about the CM
    e, n, _ = rp.reproject_np(np.array([3.0]), np.array([0.0]),
                              "EPSG:4326", "EPSG:32631")
    assert e[0] == 500000.0 and n[0] == 0.0
    e1, n1, _ = rp.reproject_np(np.array([5.0]), np.array([40.0]),
                                "EPSG:4326", "EPSG:32631")
    e2_, n2, _ = rp.reproject_np(np.array([1.0]), np.array([40.0]),
                                 "EPSG:4326", "EPSG:32631")
    assert abs((e1[0] - 500000.0) - (500000.0 - e2_[0])) < 1e-9
    assert n1[0] == n2[0]


def test_utm_spark_matches_numpy_and_drops(spark):
    import numpy as np
    import pandas as pd

    from pdal_spark import geo as geo_mod
    from pdal_spark.operators import reprojection as rp

    ids = np.arange(300)
    xs, ys = geo_mod.geocode_lcg_np(ids)
    df = spark.createDataFrame(pd.DataFrame({"page_id": ids, "x": xs, "y": ys}))
    out = (
        rp.reproject(df, "EPSG:4326", "EPSG:32631")
        .toPandas().sort_values("page_id")
    )
    ee, nn, ok = rp.reproject_np(xs, ys, "EPSG:4326", "EPSG:32631")
    assert list(out.page_id) == list(ids[ok])  # drop-on-failure rows
    np.testing.assert_allclose(out.x, ee, rtol=0, atol=1e-6)
    np.testing.assert_allclose(out.y, nn, rtol=0, atol=1e-6)


def test_utm_south_zone_false_northing():
    import numpy as np

    from pdal_spark.operators import reprojection as rp

    _, n_n, _ = rp.reproject_np(np.array([3.0]), np.array([-30.0]),
                                "EPSG:4326", "EPSG:32631")
    _, n_s, _ = rp.reproject_np(np.array([3.0]), np.array([-30.0]),
                                "EPSG:4326", "EPSG:32731")
    assert abs((n_s[0] - n_n[0]) - 10000000.0) < 1e-6


def test_proj_pipeline_chain(spark):
    """projpipeline: 4326 -> 3857 -> 4326 -> UTM31N chain equals the
    direct UTM transform (round-trip via Mercator is closed-form exact
    up to fp)."""
    import numpy as np
    import pandas as pd

    from pdal_spark import geo as geo_mod

    ids = np.arange(200)
    xs, ys = geo_mod.geocode_lcg_np(ids)
    df = spark.createDataFrame(pd.DataFrame({"page_id": ids, "x": xs, "y": ys}))
    chained = rp.proj_pipeline(
        df, [("EPSG:4326", "EPSG:3857"), ("EPSG:3857", "EPSG:4326"),
             ("EPSG:4326", "EPSG:32631")]
    ).toPandas().sort_values("page_id")
    direct = rp.reproject(df, "EPSG:4326", "EPSG:32631") \
        .toPandas().sort_values("page_id")
    # chained drops |lat|>=85.05 rows first (Mercator stage), direct does
    # too (UTM ok-gate includes the same cutoff) -> same row set
    assert list(chained.page_id) == list(direct.page_id)
    np.testing.assert_allclose(chained.x, direct.x, atol=1e-6)
    np.testing.assert_allclose(chained.y, direct.y, atol=1e-6)

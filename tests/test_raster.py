"""writers.gdal rasterization golden tests.

Fixture = the 32-point grid from /root/reference/test/data/gdal/grid.txt;
expected rasters are the literal 5x5 grids in
/root/reference/test/unit/io/GDALWriterTest.cpp:193-471 (min/max/mean/idw/
count/stdev ± window_size=2), tolerance .001 like the reference's
EXPECT_NEAR. readers.gdal inverse checked against io/GDALReader.cpp
row-major pixel-center semantics.
"""

from __future__ import annotations

import numpy as np
import pytest

from pdal_spark.operators import raster

NOD = np.nan

GRID_PTS = [
    (0, 0, 0), (.5, .5, 1), (1.5, .5, 2), (2.5, .5, 3), (3.5, .5, 4),
    (4.5, .5, 5), (3.5, 1, 4.4), (4.5, 1, 5.4), (.5, 1.5, 2), (1.5, 1.5, 3),
    (2.5, 1.5, 4), (3, 1.5, 4.4), (3.5, 1.5, 5), (4, 1.5, 5.4), (4.5, 1.5, 6),
    (3.5, 2, 5.4), (4.5, 2, 6.4), (.5, 2.5, 3), (1.5, 2.5, 4), (2.5, 2.5, 5),
    (3.5, 2.5, 6), (4.5, 2.5, 7), (.5, 3.5, 4), (2.5, 3.5, 6), (3.5, 3.5, 7),
    (4.5, 3.5, 8), (.5, 4.5, 5), (2.5, 4.5, 7), (3.5, 4.5, 8),
    (4.5, 4.6, 9.1), (4.7, 4.5, 8.9), (4.3, 4.5, 8.9),
]

GOLD = {
    "vmin": [
        5.000, NOD, 7.000, 8.000, 8.900,
        4.000, NOD, 6.000, 7.000, 8.000,
        3.000, 4.000, 5.000, 5.400, 6.400,
        2.000, 3.000, 4.000, 4.400, 5.400,
        1.000, 2.000, 3.000, 4.000, 5.000,
    ],
    "vmax": [
        5.000, NOD, 7.000, 8.000, 9.100,
        4.000, NOD, 6.000, 7.000, 8.000,
        3.000, 4.000, 5.000, 6.000, 7.000,
        2.000, 3.000, 4.400, 5.400, 6.400,
        1.000, 2.000, 3.000, 4.400, 5.400,
    ],
    "mean": [
        5.000, NOD, 7.000, 8.000, 8.967,
        4.000, NOD, 6.000, 7.000, 8.000,
        3.000, 4.000, 5.000, 5.700, 6.700,
        2.000, 3.000, 4.200, 4.920, 5.800,
        1.000, 2.000, 3.000, 4.200, 5.200,
    ],
    "idw": [
        5.000, NOD, 7.000, 8.000, 9.000,
        4.000, NOD, 6.000, 7.000, 8.000,
        3.000, 4.000, 5.000, 6.000, 7.000,
        2.000, 3.000, 4.000, 5.000, 6.000,
        1.000, 2.000, 3.000, 4.000, 5.000,
    ],
    "count": [
        1, 0, 1, 1, 3,
        1, 0, 1, 1, 1,
        1, 1, 1, 2, 2,
        1, 1, 2, 5, 4,
        1, 1, 1, 2, 2,
    ],
    "stdev": [
        0.000, NOD, 0.000, 0.000, 0.094,
        0.000, NOD, 0.000, 0.000, 0.000,
        0.000, 0.000, 0.000, 0.300, 0.300,
        0.000, 0.000, 0.200, 0.449, 0.424,
        0.000, 0.000, 0.000, 0.200, 0.200,
    ],
}

GOLD_WINDOW = {
    "vmin": [
        5.000, 5.457, 7.000, 8.000, 8.900,
        4.000, 4.848, 6.000, 7.000, 8.000,
        3.000, 4.000, 5.000, 5.400, 6.400,
        2.000, 3.000, 4.000, 4.400, 5.400,
        1.000, 2.000, 3.000, 4.000, 5.000,
    ],
    "vmax": [
        5.000, 5.500, 7.000, 8.000, 9.100,
        4.000, 4.942, 6.000, 7.000, 8.000,
        3.000, 4.000, 5.000, 6.000, 7.000,
        2.000, 3.000, 4.400, 5.400, 6.400,
        1.000, 2.000, 3.000, 4.400, 5.400,
    ],
    "mean": [
        5.000, 5.478, 7.000, 8.000, 8.967,
        4.000, 4.896, 6.000, 7.000, 8.000,
        3.000, 4.000, 5.000, 5.700, 6.700,
        2.000, 3.000, 4.200, 4.920, 5.800,
        1.000, 2.000, 3.000, 4.200, 5.200,
    ],
    "idw": [
        5.000, 5.500, 7.000, 8.000, 9.000,
        4.000, 4.905, 6.000, 7.000, 8.000,
        3.000, 4.000, 5.000, 6.000, 7.000,
        2.000, 3.000, 4.000, 5.000, 6.000,
        1.000, 2.000, 3.000, 4.000, 5.000,
    ],
    "stdev": [
        0.000, 0.021, 0.000, 0.000, 0.094,
        0.000, 0.045, 0.000, 0.000, 0.000,
        0.000, 0.000, 0.000, 0.300, 0.300,
        0.000, 0.000, 0.200, 0.449, 0.424,
        0.000, 0.000, 0.000, 0.200, 0.200,
    ],
}

SPEC = raster.GridSpec.create(0.0, 0.0, 5, 5, 1.0, radius=0.7071)


@pytest.fixture(scope="module")
def grid_df(spark):
    rows = [(i, float(x), float(y), float(z)) for i, (x, y, z) in enumerate(GRID_PTS)]
    return spark.createDataFrame(rows, "ord long, x double, y double, z double")


@pytest.fixture(scope="module")
def cells_pdf(grid_df):
    return raster.rasterize(grid_df, SPEC, "z", order_col="ord").toPandas()


@pytest.fixture(scope="module")
def cells_window_pdf(grid_df):
    return raster.rasterize(grid_df, SPEC, "z", order_col="ord", window_size=2).toPandas()


@pytest.mark.parametrize("band", ["vmin", "vmax", "mean", "idw", "stdev"])
def test_golden_bands(cells_pdf, band):
    got = raster.to_grid_np(cells_pdf, SPEC, band).ravel()
    np.testing.assert_allclose(got, GOLD[band], atol=1e-3)


def test_golden_count(cells_pdf):
    got = raster.to_grid_np(cells_pdf, SPEC, "count").ravel()
    got = np.nan_to_num(got, nan=0.0)
    np.testing.assert_allclose(got, GOLD["count"], atol=0)


@pytest.mark.parametrize("band", ["vmin", "vmax", "mean", "idw", "stdev"])
def test_golden_bands_windowfill(cells_window_pdf, band):
    got = raster.to_grid_np(cells_window_pdf, SPEC, band).ravel()
    np.testing.assert_allclose(got, GOLD_WINDOW[band], atol=1e-3)


def test_grid_bounds_from_data(grid_df):
    g = raster.grid_bounds_from_data(grid_df, 1.0)
    assert (g.origin_x, g.origin_y, g.width, g.height) == (0.0, 0.0, 5, 5)
    assert g.radius == pytest.approx(np.sqrt(2.0))


def test_raster_to_points_roundtrip(spark, grid_df):
    cells = raster.rasterize(grid_df, SPEC, "z", order_col="ord")
    pts = raster.raster_to_points(spark, SPEC, bands=cells).toPandas()
    assert len(pts) == 25  # one row per pixel, row-major
    pts = pts.sort_values("pid").reset_index(drop=True)
    # pixel 0 = top-left: center (0.5, 4.5)
    assert pts.loc[0, "x"] == pytest.approx(0.5)
    assert pts.loc[0, "y"] == pytest.approx(4.5)
    # top-left min band == golden [0] = 5.0
    assert pts.loc[0, "vmin"] == pytest.approx(5.0)
    # nodata pixel carries null band (raster nodata semantics)
    nod = pts[(pts.col == 1) & (pts.row == 0)]
    assert nod["vmin"].isna().all()


def test_asc_file_roundtrip(spark, tmp_path):
    """writers.gdal file product as ESRI ASCII grid + readers.gdal
    inverse: dense row-major emission, nodata by omission, pixel-center
    coordinates on re-read."""
    g = raster.GridSpec.create(10.0, 20.0, 6, 4, 2.0)
    pts = spark.createDataFrame(
        [(11.0, 21.0, 5.0), (13.0, 21.0, 7.0), (11.5, 26.5, 3.0),
         (19.0, 25.0, 1000.5)],
        "x double, y double, z double",
    )
    cells = raster.rasterize(pts, g, "z")
    path = str(tmp_path / "band.asc")
    raster.write_asc(cells, g, path, band="mean", precision=3)
    txt = open(path).read()
    assert txt.startswith("ncols 6\nnrows 4\n")
    assert "," not in txt  # GDAL-safe: no locale grouping
    assert "1000.500" in txt
    g2, back = raster.read_asc(spark, path)
    assert (g2.width, g2.height, g2.edge) == (6, 4, 2.0)
    got = {(r.row, r.col): r.band_1 for r in back.collect()}
    want = {(r.row, r.col): r.mean for r in cells.collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=10 ** -3)
    # pixel centers: col 0 -> x = 11.0; top row -> y = origin + (h-0.5)*edge
    r00 = back.filter("row = 0 and col = 0").collect()
    if r00:
        assert r00[0].x == 11.0 and r00[0].y == 27.0

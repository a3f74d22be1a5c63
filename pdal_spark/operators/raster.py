"""writers.gdal-style rasterization + readers.gdal inverse.

Reference semantics (/root/reference/io/private/GDALGrid.cpp,
io/GDALWriter.cpp):

  * a point updates every in-grid cell whose CENTER lies strictly within
    ``radius`` of the point (quadrant walk, GDALGrid.cpp:185-365; central
    cell same strict test, :226-229). Cell centers: ((i+.5)*edge,
    (height-(j+.5))*edge) in grid-origin-shifted coords — the raster is
    y-flipped (GDALGrid.hpp:119-137).
  * default radius = edge * sqrt(2) (GDALWriter.cpp:121-122).
  * per-cell accumulators (GDALGrid.cpp:371-433): count, min, max, mean
    (Welford ≡ avg), stdev = sqrt(M2/n) ≡ stddev_pop, IDW = Σv/dᵖ / Σ1/dᵖ
    with the d==0 sentinel: the FIRST zero-distance point's value is taken
    verbatim and later updates ignored (:417-431) — we key "first" on an
    explicit arrival column.
  * finalize (GDALGrid.cpp:436-460): stdev/idw normalization; empty cells
    → NaN (nodata), or window_size>0 → IDW-of-neighbor-cells fill with
    weight 1/chebyshev-distance over non-empty cells within the window
    (:479-530).

Spark shape: the quadrant walk becomes an explode over the ≤(2r/edge+1)²
candidate cells per point (pure column math, codegen) + exact strict
distance predicate, then one groupBy(cell) with map-side partial
aggregation. Window fill is a cell-table-only self-join — tiny next to
the point table. Grid bounds must be pinned explicitly in distributed
mode (the reference's grow-by-point is single-threaded state);
``grid_bounds_from_data`` is the helper pass for the data-driven default
(GDALWriter.cpp:201-215 createGrid).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class GridSpec:
    origin_x: float
    origin_y: float
    width: int
    height: int
    edge: float
    radius: float
    power: float = 1.0

    @classmethod
    def create(cls, origin_x, origin_y, width, height, edge,
               radius=None, power=1.0) -> "GridSpec":
        if radius is None:
            radius = edge * math.sqrt(2.0)  # GDALWriter.cpp:121-122
        return cls(origin_x, origin_y, int(width), int(height),
                   float(edge), float(radius), float(power))


def grid_bounds_from_data(
    df: DataFrame, edge: float, x: str = "x", y: str = "y",
    radius: float | None = None, power: float = 1.0,
) -> GridSpec:
    """Data-driven grid: origin = (minx, miny), size from the max cell
    (GDALWriter.cpp createGrid: c = floor((max-origin)/edge), dim = c+1)."""
    row = df.agg(
        F.min(x).alias("minx"), F.min(y).alias("miny"),
        F.max(x).alias("maxx"), F.max(y).alias("maxy"),
    ).collect()[0]
    w = int(math.floor((row.maxx - row.minx) / edge)) + 1
    h = int(math.floor((row.maxy - row.miny) / edge)) + 1
    return GridSpec.create(row.minx, row.miny, w, h, edge, radius, power)


def rasterize(
    df: DataFrame,
    grid: GridSpec,
    value_col: str,
    x: str = "x",
    y: str = "y",
    order_col: str | None = None,
    window_size: int = 0,
) -> DataFrame:
    """Point table -> cell table (col, row, count, vmin, vmax, mean, stdev, idw).

    Only non-empty (or window-filled) cells are returned; empty cells are
    nodata by omission. Row axis is y-flipped raster convention.
    """
    g = grid
    sx = F.col(x) - F.lit(g.origin_x)
    sy = F.col(y) - F.lit(g.origin_y)
    r, e = g.radius, g.edge

    # candidate index windows around the point (centers within ±radius),
    # clamped to the grid; the exact strict predicate prunes the corners.
    i_lo = F.greatest(F.lit(0), F.floor((sx - r) / e - 0.5).cast("long"))
    i_hi = F.least(F.lit(g.width - 1), F.ceil((sx + r) / e - 0.5).cast("long"))
    j_lo = F.greatest(
        F.lit(0), F.floor(F.lit(float(g.height)) - (sy + r) / e - 0.5).cast("long")
    )
    j_hi = F.least(
        F.lit(g.height - 1),
        F.ceil(F.lit(float(g.height)) - (sy - r) / e - 0.5).cast("long"),
    )

    pts = (
        df.select(
            F.col(value_col).alias("_v"),
            sx.alias("_sx"),
            sy.alias("_sy"),
            (F.col(order_col) if order_col else F.monotonically_increasing_id()).alias("_ord"),
            i_lo.alias("_ilo"), i_hi.alias("_ihi"),
            j_lo.alias("_jlo"), j_hi.alias("_jhi"),
        )
        .filter((F.col("_ilo") <= F.col("_ihi")) & (F.col("_jlo") <= F.col("_jhi")))
        .withColumn("col", F.explode(F.sequence("_ilo", "_ihi")))
        .withColumn("row", F.explode(F.sequence("_jlo", "_jhi")))
    )
    cx = (F.col("col").cast("double") + 0.5) * e
    cy = (F.lit(float(g.height)) - (F.col("row").cast("double") + 0.5)) * e
    dx = F.col("_sx") - cx
    dy = F.col("_sy") - cy
    d2 = dx * dx + dy * dy
    pts = pts.withColumn("_d", F.sqrt(d2)).filter(F.col("_d") < F.lit(r))

    p = g.power
    wgt = F.lit(1.0) / F.pow("_d", F.lit(p))
    zero = F.col("_d") == 0.0
    cells = pts.groupBy("col", "row").agg(
        F.count("*").alias("count"),
        F.min("_v").alias("vmin"),
        F.max("_v").alias("vmax"),
        F.avg("_v").alias("mean"),
        F.stddev_pop("_v").alias("stdev"),  # == sqrt(M2/n), GDALGrid.cpp:441
        F.sum(F.when(~zero, F.col("_v") * wgt)).alias("_idw_num"),
        F.sum(F.when(~zero, wgt)).alias("_idw_den"),
        # first (by arrival) zero-distance value, if any — the d==0 sentinel
        F.min(F.when(zero, F.struct(F.col("_ord"), F.col("_v")))).alias("_z"),
    )
    cells = cells.withColumn(
        "idw",
        F.when(F.col("_z").isNotNull(), F.col("_z").getField("_v")).otherwise(
            F.col("_idw_num") / F.col("_idw_den")
        ),
    ).drop("_idw_num", "_idw_den", "_z")

    if window_size <= 0:
        return cells

    return _window_fill(df.sparkSession, cells, g, window_size)


_BANDS = ("vmin", "vmax", "mean", "stdev", "idw")


def _window_fill(
    spark: SparkSession, cells: DataFrame, g: GridSpec, window: int
) -> DataFrame:
    """Fill EMPTY cells by 1/chebyshev-distance IDW over non-empty cells
    within the window (GDALGrid.cpp:479-530). Cell-table-only job."""
    offs = [
        (di, dj)
        for di in range(-window, window + 1)
        for dj in range(-window, window + 1)
        if not (di == 0 and dj == 0)
    ]
    off_arr = F.array(*[F.struct(F.lit(a).alias("di"), F.lit(b).alias("dj"))
                        for a, b in offs])
    src = cells.withColumn("_o", F.explode(off_arr))
    src = (
        src.withColumn("dcol", F.col("col") + F.col("_o.di"))
        .withColumn("drow", F.col("row") + F.col("_o.dj"))
        .filter(
            (F.col("dcol") >= 0) & (F.col("dcol") < g.width)
            & (F.col("drow") >= 0) & (F.col("drow") < g.height)
        )
        .withColumn(
            "_w",
            F.lit(1.0)
            / F.greatest(F.abs(F.col("_o.di")), F.abs(F.col("_o.dj"))).cast("double"),
        )
    )
    # only empty destinations receive fill
    src = src.join(
        cells.select(F.col("col").alias("dcol"), F.col("row").alias("drow")),
        on=["dcol", "drow"],
        how="left_anti",
    )
    filled = src.groupBy("dcol", "drow").agg(
        F.sum("_w").alias("_wsum"),
        *[F.sum(F.col(b) * F.col("_w")).alias(f"_{b}") for b in _BANDS],
    )
    filled = filled.select(
        F.col("dcol").alias("col"),
        F.col("drow").alias("row"),
        F.lit(0).cast("long").alias("count"),
        *[(F.col(f"_{b}") / F.col("_wsum")).alias(b) for b in _BANDS],
    )
    return cells.unionByName(filled)


def to_grid_np(cells_pdf, g: GridSpec, band: str) -> np.ndarray:
    """Densify a collected cell table into a (height, width) array, NaN
    where nodata — test/golden helper (mirrors raster.readBand layout)."""
    arr = np.full((g.height, g.width), np.nan)
    arr[cells_pdf["row"].to_numpy(), cells_pdf["col"].to_numpy()] = (
        cells_pdf[band].to_numpy()
    )
    return arr


def raster_to_points(
    spark: SparkSession,
    g: GridSpec,
    bands: DataFrame | None = None,
) -> DataFrame:
    """readers.gdal inverse (io/GDALReader.cpp:197-227): one row per pixel
    in row-major order, X/Y = pixel centers via the geotransform; band
    values joined from a cell table if given."""
    n = g.width * g.height
    base = spark.range(0, n).select(
        F.col("id").alias("pid"),
        (F.col("id") % g.width).alias("col"),
        (F.col("id") / g.width).cast("long").alias("row"),
    )
    base = base.select(
        "pid", "col", "row",
        (F.lit(g.origin_x) + (F.col("col").cast("double") + 0.5) * g.edge).alias("x"),
        (
            F.lit(g.origin_y)
            + (F.lit(float(g.height)) - (F.col("row").cast("double") + 0.5)) * g.edge
        ).alias("y"),
    )
    if bands is None:
        return base
    return base.join(F.broadcast(bands), on=["col", "row"], how="left")


def write_asc(
    cells: DataFrame,
    g: GridSpec,
    path: str,
    band: str = "mean",
    nodata: float = -9999.0,
    precision: int = 6,
) -> dict:
    """writers.gdal FILE product as an ESRI ASCII grid (.asc) — the one
    GDAL raster driver that needs no native library, readable by
    GDAL/QGIS directly. Dense row-major emission of the rasterize()
    cell table (row 0 = top, the y-flipped convention rasterize
    already uses); absent cells become ``NODATA_value``.

    Rows render in executors (one formatted text line per raster row,
    built with collect_list over a row-partitioned window); the driver
    streams them in order — never the dense grid in memory at once.
    """
    spark = cells.sparkSession
    rows = spark.range(g.height).select(F.col("id").alias("row"))
    grid = rows.join(
        cells.select(
            "row", "col", F.col(band).alias("_v")
        ).filter(F.col(band).isNotNull()),
        "row", "left",
    )
    per_row = grid.groupBy("row").agg(
        F.collect_list("col").alias("_cols"),
        F.collect_list("_v").alias("_vals"),
    )
    cell_map = F.map_from_arrays("_cols", "_vals")
    line = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(g.width - 1)),
            # isnan(NULL) is FALSE in Spark, so missing cells need an
            # explicit isNotNull before the format branch
            lambda c: F.when(
                F.element_at(cell_map, c).isNotNull()
                & ~F.isnan(F.element_at(cell_map, c)),
                # format_string, NOT format_number — no locale commas
                F.format_string(
                    f"%.{precision}f", F.element_at(cell_map, c)
                ),
            ).otherwise(F.lit(format(nodata, "g"))),
        ),
        " ",
    )
    import os

    out_lines = per_row.select("row", line.alias("line")).orderBy("row")
    header = (
        f"ncols {g.width}\nnrows {g.height}\n"
        f"xllcorner {g.origin_x!r}\nyllcorner {g.origin_y!r}\n"
        f"cellsize {g.edge!r}\nNODATA_value {format(nodata, 'g')}\n"
    )
    tmp = path + ".tmp"
    n = 0
    with open(tmp, "w") as f:
        f.write(header)
        for r in out_lines.toLocalIterator():
            f.write(r.line + "\n")
            n += 1
    os.replace(tmp, path)
    return {"rows": n, "path": path}


def read_asc(spark: SparkSession, path: str) -> tuple[GridSpec, DataFrame]:
    """readers.gdal from an ESRI ASCII grid: header -> GridSpec, then
    one point per non-nodata pixel (row-major, pixel centers), decoded
    line-parallel via spark.read.text."""
    import re as _re

    header: dict = {}
    with open(path) as f:
        for _ in range(6):
            k, v = f.readline().split()
            header[k.lower()] = float(v)
    g = GridSpec.create(
        header["xllcorner"], header["yllcorner"],
        int(header["ncols"]), int(header["nrows"]), header["cellsize"],
    )
    nodata = header.get("nodata_value", -9999.0)
    lines = spark.read.text(path)
    # header lines have 2 tokens; data rows have ncols tokens
    vals = F.split(F.trim(F.regexp_replace("value", ",", "")), r"\s+")
    data = lines.select(vals.alias("v")).filter(F.size("v") == g.width)
    # attach row index by a global rank over arrival: ASCII grids are
    # small enough per file that zipWithIndex semantics via a window on
    # a monotonic id stay correct within one file
    from pyspark.sql import Window as _W

    data = data.withColumn("_m", F.monotonically_increasing_id())
    data = data.withColumn(
        "row", F.row_number().over(_W.orderBy("_m")) - 1
    )
    px = data.select(
        "row", F.posexplode("v").alias("col", "_s")
    ).withColumn("_val", F.col("_s").cast("double")).filter(
        F.col("_val") != nodata
    )
    pts = px.select(
        (F.lit(g.origin_x) + (F.col("col") + 0.5) * g.edge).alias("x"),
        (F.lit(g.origin_y) + (g.height - F.col("row") - 0.5) * g.edge).alias("y"),
        F.col("_val").alias("band_1"),
        "row", "col",
    )
    return g, pts

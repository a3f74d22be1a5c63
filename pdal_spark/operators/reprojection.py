"""filters.reprojection / filters.projpipeline — CRS transforms.

Reference semantics (/root/reference/filters/ReprojectionFilter.cpp):
  * transform (X, Y, Z) into out_srs; points whose transform FAILS are
    DROPPED (processOne returns ok, :110-112, 118-133).
  * the general GDAL/PROJ engine is out of sandbox scope (no pyproj);
    the transform registry here ships the closed-form pairs a web-corpus
    engine actually needs — lon/lat (EPSG:4326) <-> Web-Mercator
    (EPSG:3857) — as pure Column math (public spherical-Mercator
    formulas), plus a pluggable hook for vectorized pyproj kernels when
    the library exists.

Failure semantics for 4326->3857: |lat| >= the Mercator cutoff
(atan(sinh(pi)) deg ~ 85.051129) diverges — those rows are dropped,
matching the reference's drop-on-failure. The cutoff is exactly the
Web-Mercator square's edge.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

R = 6378137.0  # WGS84 / spherical-Mercator radius
MERC_MAX_LAT_DEG = math.degrees(math.atan(math.sinh(math.pi)))  # 85.05112878


def _to_3857(x: Column, y: Column) -> tuple[Column, Column, Column]:
    mx = x * F.lit(math.pi / 180.0) * F.lit(R)
    my = F.log(F.tan(F.lit(math.pi / 4.0) + y * F.lit(math.pi / 360.0))) * F.lit(R)
    ok = (y > F.lit(-MERC_MAX_LAT_DEG)) & (y < F.lit(MERC_MAX_LAT_DEG))
    return mx, my, ok


def _to_4326(x: Column, y: Column) -> tuple[Column, Column, Column]:
    lon = x / F.lit(R) * F.lit(180.0 / math.pi)
    lat = (
        F.atan(F.exp(y / F.lit(R))) * F.lit(2.0) - F.lit(math.pi / 2.0)
    ) * F.lit(180.0 / math.pi)
    return lon, lat, F.lit(True)


_TRANSFORMS = {
    ("EPSG:4326", "EPSG:3857"): _to_3857,
    ("EPSG:3857", "EPSG:4326"): _to_4326,
}


def reproject(
    df: DataFrame,
    in_srs: str,
    out_srs: str,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Transform (x, y) from in_srs to out_srs, dropping failed rows."""
    if in_srs == out_srs:
        return df
    fn = _TRANSFORMS.get((in_srs, out_srs))
    if fn is None:
        raise ValueError(
            f"no built-in transform {in_srs} -> {out_srs}; register a "
            f"vectorized kernel (pyproj) for arbitrary CRS pairs"
        )
    nx, ny, ok = fn(F.col(x), F.col(y))
    return (
        df.withColumn("_ok", ok)
        .filter(F.col("_ok"))
        .withColumns({x: nx, y: ny})
        .drop("_ok")
    )


def reproject_sql(in_srs: str, out_srs: str, x: str = "x", y: str = "y"):
    """(x_sql, y_sql, where_sql) twins for the DuckDB oracle."""
    if (in_srs, out_srs) == ("EPSG:4326", "EPSG:3857"):
        xs = f"({x} * {math.pi / 180.0!r} * {R!r})"
        ys = f"(ln(tan({math.pi / 4.0!r} + {y} * {math.pi / 360.0!r})) * {R!r})"
        w = f"({y} > {-MERC_MAX_LAT_DEG!r} AND {y} < {MERC_MAX_LAT_DEG!r})"
        return xs, ys, w
    if (in_srs, out_srs) == ("EPSG:3857", "EPSG:4326"):
        xs = f"({x} / {R!r} * {180.0 / math.pi!r})"
        ys = f"((atan(exp({y} / {R!r})) * 2.0 - {math.pi / 2.0!r}) * {180.0 / math.pi!r})"
        return xs, ys, "TRUE"
    raise ValueError((in_srs, out_srs))


def reproject_np(xs, ys, in_srs: str = "EPSG:4326", out_srs: str = "EPSG:3857"):
    """numpy oracle."""
    import numpy as np

    if (in_srs, out_srs) == ("EPSG:4326", "EPSG:3857"):
        ok = (ys > -MERC_MAX_LAT_DEG) & (ys < MERC_MAX_LAT_DEG)
        mx = xs * (math.pi / 180.0) * R
        my = np.log(np.tan(math.pi / 4.0 + ys * (math.pi / 360.0))) * R
        return mx[ok], my[ok], ok
    raise ValueError((in_srs, out_srs))

"""filters.splitter + kernels.tile — square-grid tiling with buffer overlap.

Reference semantics (/root/reference/filters/SplitterFilter.cpp:129-178):
  * tile id per axis: `int(dv/length)`, decrement if dv < 0
    (exact-boundary negatives land one tile lower than floor — matched)
  * buffer: a point is DUPLICATED into at most one x-neighbor, one
    y-neighbor, and one diagonal neighbor — the first tile in each
    else-if chain whose buffered square strictly contains it
  * buffer < length/2 enforced (SplitterFilter.cpp:73-81)
  * origin defaults to the first point in the reference — order-dependent,
    so we require it explicitly (same choice as kernels/TileKernel.cpp:225-229
    when driven at scale)

Spark shape: tile ids are pure column expressions (WholeStageCodegen);
buffer duplication is a single explode over a ≤4-element array built with
the same strict inequalities — no join, no shuffle. The shuffle happens
once, at the partitioned write (kernels.tile), on the tile key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdal_spark import geo


def split(
    df: DataFrame,
    length: float,
    origin_x: float,
    origin_y: float,
    buffer: float = 0.0,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Assign (tile_x, tile_y); with buffer > 0, emit duplicate rows for
    tiles whose buffered square contains the point (≤4 rows per point)."""
    if buffer >= length / 2:
        raise ValueError(f"Buffer ({buffer}) must be less than half of length ({length})")

    xc, yc = F.col(x), F.col(y)
    xpos = geo.tile_coord(xc, F.lit(float(origin_x)), length)
    ypos = geo.tile_coord(yc, F.lit(float(origin_y)), length)
    out = df.withColumn("tile_x", xpos).withColumn("tile_y", ypos)
    if buffer <= 0.0:
        return out

    tx, ty = F.col("tile_x"), F.col("tile_y")

    def sq(xp: Column, yp: Column) -> Column:
        return geo.square_contains(xp, yp, xc, yc, origin_x, origin_y, length, buffer)

    # else-if chains (SplitterFilter.cpp:147-166): at most one winner each.
    x_nb = F.when(sq(tx - 1, ty), F.struct((tx - 1).alias("tx"), ty.alias("ty"))).otherwise(
        F.when(sq(tx + 1, ty), F.struct((tx + 1).alias("tx"), ty.alias("ty")))
    )
    y_nb = F.when(sq(tx, ty - 1), F.struct(tx.alias("tx"), (ty - 1).alias("ty"))).otherwise(
        F.when(sq(tx, ty + 1), F.struct(tx.alias("tx"), (ty + 1).alias("ty")))
    )
    d_nb = (
        F.when(sq(tx - 1, ty - 1), F.struct((tx - 1).alias("tx"), (ty - 1).alias("ty")))
        .otherwise(
            F.when(sq(tx - 1, ty + 1), F.struct((tx - 1).alias("tx"), (ty + 1).alias("ty")))
            .otherwise(
                F.when(sq(tx + 1, ty - 1), F.struct((tx + 1).alias("tx"), (ty - 1).alias("ty")))
                .otherwise(
                    F.when(sq(tx + 1, ty + 1), F.struct((tx + 1).alias("tx"), (ty + 1).alias("ty")))
                )
            )
        )
    )
    cells = F.filter(
        F.array(F.struct(tx.alias("tx"), ty.alias("ty")), x_nb, y_nb, d_nb),
        lambda s: s.isNotNull(),
    )
    return (
        out.withColumn("_cell", F.explode(cells))
        .withColumn("tile_x", F.col("_cell.tx"))
        .withColumn("tile_y", F.col("_cell.ty"))
        .drop("_cell")
    )


def split_sql(
    length: float, origin_x: float, origin_y: float, x: str = "x", y: str = "y"
) -> tuple[str, str]:
    """DuckDB/ANSI twins of the unbuffered tile id expressions."""
    return (
        geo.tile_coord_sql(x, repr(float(origin_x)), length),
        geo.tile_coord_sql(y, repr(float(origin_y)), length),
    )


def tile_job(
    df: DataFrame,
    out_path: str,
    length: float,
    origin_x: float,
    origin_y: float,
    buffer: float = 0.0,
    x: str = "x",
    y: str = "y",
    mode: str = "overwrite",
    tindex_path: str | None = None,
    tindex_hex_edge: float | None = None,
) -> None:
    """kernels.tile (/root/reference/kernels/TileKernel.cpp:90-310): the
    flagship throughput job — tile every page and write one directory per
    tile. PDAL streams with one open writer per live tile; the Spark
    equivalent is a single shuffle on the tile key feeding a partitioned
    parquet write (each task owns whole tiles → no tiny-file explosion).

    tindex_path: optionally also write the kernels.tindex-style per-tile
    boundary manifest (operators.tindex) as a sidecar parquet — the
    small catalog later scans prune against.
    """
    tiled = split(df, length, origin_x, origin_y, buffer, x=x, y=y)
    (
        tiled.repartition(F.col("tile_x"), F.col("tile_y"))
        .write.mode(mode)
        .partitionBy("tile_x", "tile_y")
        .parquet(out_path)
    )
    if tindex_path is not None:
        from pdal_spark.operators.tindex import tindex as tindex_op

        manifest = tindex_op(
            df, length, origin_x, origin_y,
            tindex_hex_edge or length / 8.0, x=x, y=y,
        )
        manifest.write.mode(mode).parquet(tindex_path)

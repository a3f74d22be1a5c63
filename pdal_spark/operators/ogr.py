"""writers.ogr analog: points -> vector features (WKT / GeoJSONSeq).

Reference: /root/reference/io/OGRWriter.cpp (194 LoC).
  - one POINT feature per point, or one MULTIPOINT per `multicount`
    consecutive points in arrival order (OGRWriter.cpp:115-117, 150-177);
    the trailing partial group is still emitted (doneFile, :181-184)
  - geometry is always 3D (OGRPoint pt(x, y, z), :156); an optional
    `measure_dim` adds an M value (wkbPointZM, :117, setM :158)

The reference writes through GDAL/OGR drivers. Spark-first analog: the
feature set IS a DataFrame (feature_id, wkt) — WKT is the
driver-agnostic interchange form — and the file products are
 (a) `features.write` to any table format, or
 (b) write_geojson_seq(): newline-delimited GeoJSON features (RFC 8142
     GeoJSONSeq, itself an OGR-readable format) written DISTRIBUTED as
     a text dataset — no driver-side collect, works at any scale.

Grouping uses the distributed arrival rank (ordered.global_rank), never
a no-partition window; tables with a dense 0..n-1 id skip the rank
entirely (dense_index=True).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdal_spark.operators.ordered import global_rank


def _coord(cols: list[Column], precision: int) -> Column:
    fmt = " ".join([f"%.{precision}f"] * len(cols))
    return F.format_string(fmt, *cols)


def ogr_features(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    z: str | None = None,
    measure: str | None = None,
    multicount: int = 1,
    order_col: str = "page_id",
    dense_index: bool = False,
    precision: int = 6,
) -> DataFrame:
    """(feature_id, n_points, wkt), one row per OGR feature.

    multicount=1 -> POINT [Z|ZM] (...); multicount>1 -> MULTIPOINT of
    each run of `multicount` consecutive points (arrival order), last
    run partial — OGRWriter::processOne / doneFile semantics. measure
    requires z (the reference's ZM geometry is always 3D).
    """
    if multicount < 1:
        raise ValueError("'multicount' must be greater than 0")  # OGRWriter.cpp:87
    if measure is not None and z is None:
        raise ValueError("measure (ZM) requires z")
    coords = [F.col(x), F.col(y)]
    tag = ""
    if z is not None:
        coords.append(F.col(z))
        tag = " Z"
    if measure is not None:
        coords.append(F.col(measure))
        tag = " ZM"
    if dense_index:
        staged = df.withColumn("_i", F.col(order_col))
    else:
        staged = global_rank(
            df, [F.col(order_col).asc()], out_col="_i", zero_based=True
        )
    staged = staged.withColumn("_c", _coord(coords, precision))
    if multicount == 1:
        return staged.select(
            F.col("_i").alias("feature_id"),
            F.lit(1).alias("n_points"),
            F.concat(F.lit(f"POINT{tag} ("), F.col("_c"), F.lit(")")).alias("wkt"),
        )
    grouped = (
        staged.withColumn("_g", F.floor(F.col("_i") / multicount))
        .groupBy("_g")
        .agg(
            F.count("*").alias("n_points"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_i", "_c"))),
                    lambda s: F.concat(F.lit("("), s.getField("_c"), F.lit(")")),
                ),
                ", ",
            ).alias("_pts"),
        )
    )
    return grouped.select(
        F.col("_g").alias("feature_id"),
        F.col("n_points").cast("int").alias("n_points"),
        F.concat(
            F.lit(f"MULTIPOINT{tag} ("), F.col("_pts"), F.lit(")")
        ).alias("wkt"),
    )


def ogr_features_sql(
    table_expr: str,
    x: str = "x",
    y: str = "y",
    z: str | None = None,
    measure: str | None = None,
    multicount: int = 1,
    order_col: str = "page_id",
    precision: int = 6,
) -> str:
    """DuckDB twin of ogr_features over a dense-id table."""
    cols = [x, y] + ([z] if z else []) + ([measure] if measure else [])
    tag = " ZM" if measure else (" Z" if z else "")
    fmt = " ".join([f"%.{precision}f"] * len(cols))
    coord = f"printf('{fmt}', {', '.join(cols)})"
    if multicount == 1:
        return (
            f"SELECT {order_col} AS feature_id, 1 AS n_points, "
            f"'POINT{tag} (' || {coord} || ')' AS wkt FROM {table_expr}"
        )
    return f"""
      SELECT CAST({order_col} // {multicount} AS BIGINT) AS feature_id,
             CAST(count(*) AS INT) AS n_points,
             'MULTIPOINT{tag} (' ||
               string_agg('(' || {coord} || ')', ', ' ORDER BY {order_col})
             || ')' AS wkt
      FROM {table_expr}
      GROUP BY 1
    """


def geojson_feature_lines(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    z: str | None = None,
    properties: list[str] | None = None,
) -> DataFrame:
    """One GeoJSON Feature (RFC 7946) JSON string per row — the
    GeoJSONSeq line set. Pure to_json column math; write with
    ``.write.text(path)`` for a distributed OGR-readable product."""
    coords = [F.col(x), F.col(y)] + ([F.col(z)] if z else [])
    feature = F.struct(
        F.lit("Feature").alias("type"),
        F.struct(
            F.lit("Point").alias("type"),
            F.array(*coords).alias("coordinates"),
        ).alias("geometry"),
        F.struct(*[F.col(p) for p in (properties or [])]).alias("properties"),
    )
    return df.select(F.to_json(feature).alias("line"))


def write_geojson_seq(
    df: DataFrame,
    path: str,
    x: str = "x",
    y: str = "y",
    z: str | None = None,
    properties: list[str] | None = None,
    order_col: str | None = None,
) -> None:
    """writers.ogr file product: newline-delimited GeoJSON features.

    Distributed text write (one shard per task — the FlexWriter-'#'
    shape); pass order_col to sort shards by arrival first."""
    lines = geojson_feature_lines(df, x, y, z, properties)
    if order_col is not None:
        lines = geojson_feature_lines(
            df.orderBy(F.col(order_col).asc()), x, y, z, properties
        )
    lines.write.mode("overwrite").text(path)


def geojson_polygon_lines(
    df: DataFrame,
    wkt_col: str,
    properties: list[str] | None = None,
) -> DataFrame:
    """One GeoJSON Polygon Feature per row from a POLYGON WKT column —
    pure column math (regexp strip + nested split/transform), no UDF.
    Accepts the single-ring `POLYGON ((x y, ...))` WKT the hexbin
    boundary/density layers emit."""
    inner = F.regexp_replace(
        F.col(wkt_col), r"^POLYGON \(\(|\)\)$", ""
    )
    ring = F.transform(
        F.split(inner, ", "),
        lambda s: F.transform(
            F.split(F.trim(s), " "), lambda v: v.cast("double")
        ),
    )
    feature = F.struct(
        F.lit("Feature").alias("type"),
        F.struct(
            F.lit("Polygon").alias("type"),
            F.array(ring).alias("coordinates"),
        ).alias("geometry"),
        F.struct(*[F.col(p) for p in (properties or [])]).alias("properties"),
    )
    return df.select(F.to_json(feature).alias("line"))


def write_density_layer(
    df: DataFrame,
    path: str,
    edge_length: float,
    origin_x: float,
    origin_y: float,
    x: str = "x",
    y: str = "y",
) -> None:
    """kernels.density file product (DensityKernel.cpp:103-123
    writeHexbinOutput): one hexagon-polygon feature with its COUNT per
    occupied cell, as distributed GeoJSONSeq shards."""
    from pdal_spark.operators import hexbin as hexbin_op

    layer = hexbin_op.density_layer(df, edge_length, origin_x, origin_y,
                                    x=x, y=y)
    geojson_polygon_lines(layer, "wkt", ["count"]) \
        .write.mode("overwrite").text(path)

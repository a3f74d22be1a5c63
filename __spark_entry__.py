"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry is an operator of the pdal_spark engine run over
the shared test tables; ``oracle_sql()`` carries the ANSI-SQL twin DuckDB
executes on the same parquet. Spatial queries derive deterministic
coordinates from integer ids via pdal_spark.geo.geocode_lcg (pure BIGINT
arithmetic — bit-identical in Spark, DuckDB, and numpy).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark import geo
from pdal_spark.operators import crop as crop_op
from pdal_spark.operators import splitter as splitter_op
from pdal_spark.session import configure_session

# ---------------------------------------------------------------------------
# shared fixtures: geometry + tiling parameters used by both sides
# ---------------------------------------------------------------------------

BOX = crop_op.Box(-90.0, -45.0, 90.0, 45.0)
CIRCLE = crop_op.Circle(10.0, 20.0, 55.0)
POLY = crop_op.Polygon(
    exterior=((-100.0, -50.0), (50.0, -50.0), (50.0, 60.0), (-20.0, 60.0),
              (-20.0, 0.0), (-60.0, 0.0), (-60.0, 60.0), (-100.0, 60.0)),
    holes=(((-90.0, -40.0), (-70.0, -40.0), (-70.0, -20.0), (-90.0, -20.0)),),
)
TILE_LEN, TILE_OX, TILE_OY = 30.0, -180.0, -90.0

_X_SQL, _Y_SQL = geo.geocode_lcg_sql("doc_id")
_DOCS_GEO_SQL = (
    f"SELECT doc_id, lang, ({_X_SQL}) AS x, ({_Y_SQL}) AS y FROM documents"
)


def _docs_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return df.select(
        "doc_id",
        "lang",
        geo.geocode_lcg_x(F.col("doc_id")).alias("x"),
        geo.geocode_lcg_y(F.col("doc_id")).alias("y"),
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_crop_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filters.crop, bbox, inclusive contains (CropFilter.cpp:251-258)."""
    return crop_op.crop(_docs_geo(spark, sf_dir), [BOX], mode="stream").select(
        "doc_id", "x", "y"
    )


def q_crop_box_outside(spark: SparkSession, sf_dir: str) -> DataFrame:
    return crop_op.crop(
        _docs_geo(spark, sf_dir), [BOX], outside=True, mode="stream"
    ).select("doc_id", "x", "y")


def q_crop_circle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filters.crop, 2D circle, strict d^2 (CropFilter.cpp:295-318)."""
    return crop_op.crop(_docs_geo(spark, sf_dir), [CIRCLE], mode="stream").select(
        "doc_id", "x", "y"
    )


def q_crop_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filters.crop, concave polygon with hole, exact even-odd PnP."""
    return crop_op.crop(_docs_geo(spark, sf_dir), [POLY], mode="stream").select(
        "doc_id"
    )


def q_crop_multi_geom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-mode crop: one output view per geometry -> geom_id column
    (CropFilter.cpp:221-248); overlap rows appear under both ids."""
    g0 = crop_op.Box(-60.0, -60.0, 60.0, 60.0)
    g1 = crop_op.Circle(0.0, 0.0, 70.0)
    return crop_op.crop(_docs_geo(spark, sf_dir), [g0, g1], mode="batch").select(
        "doc_id", "geom_id"
    )


def q_splitter_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filters.splitter tile ids (int-cast-then-decrement floor)."""
    out = splitter_op.split(_docs_geo(spark, sf_dir), TILE_LEN, TILE_OX, TILE_OY)
    return out.select("doc_id", "tile_x", "tile_y")


def q_splitter_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kernels.tile shape: per-tile page counts (the flagship aggregation)."""
    out = splitter_op.split(_docs_geo(spark, sf_dir), TILE_LEN, TILE_OX, TILE_OY)
    return out.groupBy("tile_x", "tile_y").agg(F.count("*").alias("n_pages"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "crop_box": q_crop_box,
        "crop_box_outside": q_crop_box_outside,
        "crop_circle": q_crop_circle,
        "crop_polygon": q_crop_polygon,
        "crop_multi_geom": q_crop_multi_geom,
        "splitter_assign": q_splitter_assign,
        "splitter_counts": q_splitter_counts,
    }


def oracle_sql() -> dict[str, str]:
    box_sql = crop_op.box_contains_sql(BOX)
    circle_sql = crop_op.circle_contains_sql(CIRCLE)
    poly_sql = crop_op.polygon_pnp_sql(POLY)
    tx_sql, ty_sql = splitter_op.split_sql(TILE_LEN, TILE_OX, TILE_OY)
    g0_sql = crop_op.box_contains_sql(crop_op.Box(-60.0, -60.0, 60.0, 60.0))
    g1_sql = crop_op.circle_contains_sql(crop_op.Circle(0.0, 0.0, 70.0))
    return {
        "crop_box": f"SELECT doc_id, x, y FROM ({_DOCS_GEO_SQL}) WHERE {box_sql}",
        "crop_box_outside": (
            f"SELECT doc_id, x, y FROM ({_DOCS_GEO_SQL}) WHERE NOT {box_sql}"
        ),
        "crop_circle": f"SELECT doc_id, x, y FROM ({_DOCS_GEO_SQL}) WHERE {circle_sql}",
        "crop_polygon": f"SELECT doc_id FROM ({_DOCS_GEO_SQL}) WHERE {poly_sql}",
        "crop_multi_geom": (
            f"SELECT doc_id, 0 AS geom_id FROM ({_DOCS_GEO_SQL}) WHERE {g0_sql} "
            f"UNION ALL "
            f"SELECT doc_id, 1 AS geom_id FROM ({_DOCS_GEO_SQL}) WHERE {g1_sql}"
        ),
        "splitter_assign": (
            f"SELECT doc_id, {tx_sql} AS tile_x, {ty_sql} AS tile_y "
            f"FROM ({_DOCS_GEO_SQL})"
        ),
        "splitter_counts": (
            f"SELECT {tx_sql} AS tile_x, {ty_sql} AS tile_y, "
            f"count(*) AS n_pages FROM ({_DOCS_GEO_SQL}) GROUP BY 1, 2"
        ),
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: geocode -> polygon crop -> tile -> per-tile counts at sf0.001."""
    configure_session(spark)
    sf_dir = "/root/testdata/sf0.001"
    df = crop_op.crop(_docs_geo(spark, sf_dir), [POLY], mode="stream")
    out = splitter_op.split(df, TILE_LEN, TILE_OX, TILE_OY)
    return out.groupBy("tile_x", "tile_y").agg(F.count("*").alias("n_pages"))

"""writers.ogr analog (operators/ogr.py) vs literal goldens, a DuckDB
twin, and the GeoJSONSeq file product.

Golden shapes mirror OGRWriter.cpp semantics: multicount grouping over
arrival order with a partial trailing feature (processOne/doneFile,
OGRWriter.cpp:150-184), always-3D geometry, optional M value."""

from __future__ import annotations

import json

import duckdb
import pytest

from pdal_spark.operators import ogr as ogr_op
from pdal_spark import pipeline


def _pts(spark):
    rows = [
        (0, 1.0, 2.0, 10.0, 0.5),
        (1, -3.25, 4.0, 11.0, 1.5),
        (2, 5.0, -6.5, 12.0, 2.5),
        (3, 7.0, 8.0, 13.0, 3.5),
        (4, -9.0, -10.0, 14.0, 4.5),
    ]
    return spark.createDataFrame(
        rows, "pid long, x double, y double, z double, m double"
    )


def test_point_features(spark):
    out = ogr_op.ogr_features(
        _pts(spark), z="z", order_col="pid", dense_index=True, precision=2
    ).orderBy("feature_id").collect()
    assert [r.wkt for r in out] == [
        "POINT Z (1.00 2.00 10.00)",
        "POINT Z (-3.25 4.00 11.00)",
        "POINT Z (5.00 -6.50 12.00)",
        "POINT Z (7.00 8.00 13.00)",
        "POINT Z (-9.00 -10.00 14.00)",
    ]
    assert all(r.n_points == 1 for r in out)


def test_multipoint_partial_last_group(spark):
    # multicount=2 over 5 points -> 3 features, the last with 1 point
    # (doneFile flush, OGRWriter.cpp:181-184)
    out = ogr_op.ogr_features(
        _pts(spark), z="z", multicount=2, order_col="pid",
        dense_index=True, precision=1,
    ).orderBy("feature_id").collect()
    assert [(r.feature_id, r.n_points, r.wkt) for r in out] == [
        # -3.25 -> -3.3: Java %.1f is HALF_UP on the exact expansion
        (0, 2, "MULTIPOINT Z ((1.0 2.0 10.0), (-3.3 4.0 11.0))"),
        (1, 2, "MULTIPOINT Z ((5.0 -6.5 12.0), (7.0 8.0 13.0))"),
        (2, 1, "MULTIPOINT Z ((-9.0 -10.0 14.0))"),
    ]


def test_zm_measure(spark):
    out = ogr_op.ogr_features(
        _pts(spark).limit(1), z="z", measure="m", order_col="pid",
        dense_index=True, precision=1,
    ).collect()
    assert out[0].wkt == "POINT ZM (1.0 2.0 10.0 0.5)"


def test_xy_only(spark):
    out = ogr_op.ogr_features(
        _pts(spark).limit(1), order_col="pid", dense_index=True, precision=0
    ).collect()
    assert out[0].wkt == "POINT (1 2)"


def test_option_errors(spark):
    with pytest.raises(ValueError, match="multicount"):
        ogr_op.ogr_features(_pts(spark), multicount=0)
    with pytest.raises(ValueError, match="requires z"):
        ogr_op.ogr_features(_pts(spark), measure="m")


def test_sql_twin_matches(spark, tmp_path):
    df = _pts(spark)
    p = str(tmp_path / "pts.parquet")
    df.write.parquet(p)
    got = {
        r.feature_id: (r.n_points, r.wkt)
        for r in ogr_op.ogr_features(
            df, z="z", multicount=3, order_col="pid", dense_index=True
        ).collect()
    }
    sql = ogr_op.ogr_features_sql(
        f"read_parquet('{p}/*.parquet')", z="z", multicount=3, order_col="pid"
    )
    want = {r[0]: (r[1], r[2]) for r in duckdb.sql(sql).fetchall()}
    assert got == want


def test_geojson_lines_parse(spark):
    lines = ogr_op.geojson_feature_lines(
        _pts(spark), z="z", properties=["pid", "m"]
    ).collect()
    feats = [json.loads(r.line) for r in lines]
    assert all(f["type"] == "Feature" for f in feats)
    assert all(f["geometry"]["type"] == "Point" for f in feats)
    by_pid = {f["properties"]["pid"]: f for f in feats}
    assert by_pid[1]["geometry"]["coordinates"] == [-3.25, 4.0, 11.0]
    assert by_pid[1]["properties"]["m"] == 1.5


def test_pipeline_writers_ogr(spark, tmp_path):
    src = str(tmp_path / "in.parquet")
    dst = str(tmp_path / "out.geojsonl")
    _pts(spark).write.parquet(src)
    doc = [
        {"type": "readers.parquet", "filename": src},
        {
            "type": "writers.ogr",
            "filename": dst,
            "z": "z",
            "properties": ["pid"],
            "order_col": "pid",
        },
    ]
    pipeline.run(spark, doc)
    out = spark.read.text(dst).collect()
    feats = sorted(
        (json.loads(r.value) for r in out),
        key=lambda f: f["properties"]["pid"],
    )
    assert len(feats) == 5
    assert feats[2]["geometry"]["coordinates"] == [5.0, -6.5, 12.0]


def test_density_geojson_layer(spark, tmp_path):
    """kernels.density file product: hexagon Polygon features + COUNT
    (DensityKernel.cpp:103-123), distributed GeoJSONSeq shards."""
    import glob
    import json

    from pyspark.sql import functions as F

    from pdal_spark.operators import ogr as ogr_op

    df = spark.range(500).select(
        (F.col("id") % 40 * 1.0).alias("x"),
        (F.col("id") % 23 * 1.0).alias("y"),
    )
    out = str(tmp_path / "density")
    ogr_op.write_density_layer(df, out, 5.0, 0.0, 0.0)
    feats = []
    for part in glob.glob(out + "/part-*"):
        feats += [json.loads(l) for l in
                  open(part).read().strip().splitlines()]
    assert feats and all(f["geometry"]["type"] == "Polygon" for f in feats)
    for f in feats:
        ring = f["geometry"]["coordinates"][0]
        assert ring[0] == ring[-1] and len(ring) == 7  # closed hexagon
    assert sum(f["properties"]["count"] for f in feats) == 500

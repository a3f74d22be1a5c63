"""SBET trajectory + PTS text readers: reference-fixture parity."""

from __future__ import annotations

import math
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdal_spark.formats import pts, sbet

SBET_REF = "/root/reference/test/data/sbet"
PTS_REF = "/root/reference/test/data/pts"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(SBET_REF), reason="reference fixtures unavailable"
)


@needs_ref
def test_sbet_two_points(spark):
    """SbetReaderTest testRead: 2 records, angles in degrees."""
    df = sbet.read_sbet(spark, f"{SBET_REF}/2-points.sbet")
    p = df.orderBy("gps_time").toPandas()
    assert len(p) == 2
    # lat/lon land in plausible degree ranges only if rad->deg applied
    assert -90 < p.y.iloc[0] < 90 and -180 < p.x.iloc[0] < 180
    raw = np.frombuffer(
        open(f"{SBET_REF}/2-points.sbet", "rb").read(), "<f8"
    ).reshape(2, 17)
    assert p.gps_time.iloc[0] == raw[0, 0]
    assert p.y.iloc[0] == pytest.approx(math.degrees(raw[0, 1]), abs=1e-12)
    assert p.z.iloc[0] == raw[0, 3]  # altitude is not angular


@needs_ref
def test_sbet_radians_mode(spark):
    df = sbet.read_sbet(
        spark, f"{SBET_REF}/2-points.sbet", angles_as_degrees=False
    )
    raw = np.frombuffer(
        open(f"{SBET_REF}/2-points.sbet", "rb").read(), "<f8"
    ).reshape(2, 17)
    p = df.orderBy("gps_time").toPandas()
    np.testing.assert_array_equal(p.y.values, raw[:, 1])


@needs_ref
def test_sbet_bad_size_raises(spark):
    """SbetReader.cpp:75-77 'Invalid file size.'"""
    with pytest.raises(ValueError, match="Invalid file size"):
        sbet.read_sbet(spark, f"{SBET_REF}/badfile.sbet")


@needs_ref
def test_sbet_roundtrip_byte_identical(spark, tmp_path):
    src = f"{SBET_REF}/2-points.sbet"
    df = sbet.read_sbet(spark, src)
    out = str(tmp_path / "rt.sbet")
    meta = sbet.write_sbet(df, out)
    assert meta["count"] == 2
    a = np.frombuffer(open(src, "rb").read(), "<f8")
    b = np.frombuffer(open(out, "rb").read(), "<f8")
    np.testing.assert_allclose(b, a, rtol=0, atol=1e-12)


def test_sbet_chunk_invariance(spark, tmp_path):
    n = 1000
    df = spark.range(n).select(
        F.col("id").cast("double").alias("gps_time"),
        (F.col("id") % 90).cast("double").alias("y"),
        (F.col("id") % 180).cast("double").alias("x"),
        (F.col("id") * 0.5).alias("z"),
    )
    path = str(tmp_path / "traj.sbet")
    sbet.write_sbet(df, path)
    assert os.path.getsize(path) == n * sbet.RECORD_LEN
    a = sbet.read_sbet(spark, path, chunk_points=64).orderBy("gps_time")
    b = sbet.read_sbet(spark, path, chunk_points=10**6).orderBy("gps_time")
    assert a.count() == n
    np.testing.assert_allclose(
        a.toPandas().values, b.toPandas().values, atol=1e-12
    )


@needs_ref
def test_pts_goldens(spark):
    """PtsReaderTest: 19 pts, first = (3.980972, -2.006119, -0.010086,
    -1035, 97, 59, 38)."""
    p = pts.read_pts(spark, f"{PTS_REF}/test.pts").toPandas()
    assert len(p) == 19
    row = p.iloc[0]
    assert row.x == pytest.approx(3.980972)
    assert row.y == pytest.approx(-2.006119)
    assert row.z == pytest.approx(-0.010086)
    assert (row.red, row.green, row.blue) == (97, 59, 38)


@needs_ref
def test_pts_header_line_ignored_by_arity(spark):
    p = pts.read_pts(spark, f"{PTS_REF}/test.pts").toPandas()
    # the count line "19" must not appear as a data row of zeros
    assert not ((p.x == 19.0) & (p.y == 0.0) & (p.z == 0.0)).any()


def test_pts_bad_count_header(spark, tmp_path):
    f = tmp_path / "bad.pts"
    f.write_text("not-a-count\n1 2 3\n")
    with pytest.raises(ValueError, match="expected point count"):
        pts.read_pts(spark, str(f))


def test_pipeline_sbet_pts_stages(spark, tmp_path):
    import pdal_spark.pipeline as pl

    f = tmp_path / "mini.pts"
    f.write_text("2\n1.5 2.5 3.5\n4.5 5.5 6.5\n")
    out = pl.run(spark, [{"type": "readers.pts", "filename": str(f)}])
    assert out.count() == 2
    assert pl.run(spark, [str(f)]).count() == 2  # extension inference

    if os.path.isdir(SBET_REF):
        sb = str(tmp_path / "out.sbet")
        pl.run(spark, [
            {"type": "readers.sbet",
             "filename": f"{SBET_REF}/2-points.sbet"},
            {"type": "writers.sbet", "filename": sb},
        ])
        assert os.path.getsize(sb) == 2 * sbet.RECORD_LEN

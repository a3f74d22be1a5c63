"""LAS format I/O: reference-fixture parity + distributed read/write.

Header goldens mirror LasReaderTest.cpp:86-123 (simple.las); the decode /
re-encode byte-identity checks prove both directions of the codec against
files produced by the reference toolchain.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from pdal_spark.formats import las

REF = "/root/reference/test/data/las"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference LAS fixtures unavailable"
)


def _points(path):
    h = las.read_header(path)
    raw = open(path, "rb").read()
    return h, raw[h.point_offset: h.point_offset + h.point_count * h.point_len]


# ---------------------------------------------------------------------------
# codec parity vs reference-produced files
# ---------------------------------------------------------------------------


@needs_ref
def test_header_golden_simple():
    """LasReaderTest.cpp:95-123 header field goldens."""
    h = las.read_header(f"{REF}/simple.las")
    assert h.version_minor == 2
    assert h.creation_doy == 0 and h.creation_year == 0
    assert h.header_size == 227
    assert h.point_format == 3
    assert h.point_count == 1065
    assert h.scales == (0.01, 0.01, 0.01)
    for got, want in zip(h.maxs, (638982.55, 853535.43, 586.38)):
        assert got == pytest.approx(want, abs=1e-6)
    for got, want in zip(h.mins, (635619.85, 848899.70, 406.59)):
        assert got == pytest.approx(want, abs=1e-6)
    assert not h.compressed
    assert h.counts_by_return[:5] == (925, 114, 21, 5, 0)


@needs_ref
@pytest.mark.parametrize(
    "name", ["simple.las", "1.2-with-color.las", "test1_4.las"]
)
def test_decode_reencode_byte_identical(name):
    """decode -> encode reproduces the reference file's point block
    byte-for-byte (fmt 3 v10 and fmt 6 v14 layouts)."""
    h, pts = _points(f"{REF}/{name}")
    pdf = las.decode_records(pts, h)
    assert len(pdf) == h.point_count
    blob = las.encode_records(pdf, h.point_format, h.scales, h.offsets)
    assert blob == pts


@needs_ref
def test_decoded_bounds_match_header():
    h, pts = _points(f"{REF}/simple.las")
    pdf = las.decode_records(pts, h)
    assert pdf.x.min() == pytest.approx(h.mins[0], abs=1e-9)
    assert pdf.x.max() == pytest.approx(h.maxs[0], abs=1e-9)
    assert pdf.z.min() == pytest.approx(h.mins[2], abs=1e-9)
    counts = pdf.return_number.value_counts().sort_index()
    assert counts.loc[1] == 925 and counts.loc[2] == 114
    # v14 fixture exposes the extended dims
    h4, pts4 = _points(f"{REF}/test1_4.las")
    pdf4 = las.decode_records(pts4, h4)
    assert {"class_flags", "scan_channel"} <= set(pdf4.columns)


def test_bad_signature_raises():
    with pytest.raises(ValueError, match="LASF"):
        las.parse_header(b"NOPE" + b"\0" * 400)


def test_compressed_flag_detected():
    """High bit of the point-format byte = laszip (LasHeader.cpp:352-355)."""
    buf = bytearray(375)
    buf[0:4] = b"LASF"
    buf[24:26] = bytes([1, 2])
    buf[104] = 0x80 | 3
    h = las.parse_header(bytes(buf))
    assert h.compressed and h.point_format == 3


# ---------------------------------------------------------------------------
# quantization semantics
# ---------------------------------------------------------------------------


def test_sround_half_away_from_zero():
    """Utils::sround (Utils.hpp:152): -0.5 -> -1, not banker's 0."""
    pdf = pd.DataFrame({"x": [-0.005, 0.005, 0.014999], "y": [0.0] * 3,
                        "z": [0.0] * 3})
    blob = las.encode_records(pdf, 0, (0.01,) * 3, (0.0,) * 3)
    rec = np.frombuffer(blob, dtype=las._record_dtype(0))
    assert rec["X"].tolist() == [-1, 1, 1]


def test_quantize_overflow_raises():
    pdf = pd.DataFrame({"x": [1e12], "y": [0.0], "z": [0.0]})
    with pytest.raises(ValueError, match="Unable to convert scaled value"):
        las.encode_records(pdf, 0, (0.01,) * 3, (0.0,) * 3)


def test_v14_scan_angle_codec():
    """Writer: int16 round(angle/.006f); reader: *.006
    (LasWriter.cpp:1116-1119, LasReader.cpp V14)."""
    pdf = pd.DataFrame({"x": [1.0], "y": [2.0], "z": [3.0],
                        "scan_angle_rank": [12.5]})
    blob = las.encode_records(pdf, 6, (0.01,) * 3, (0.0,) * 3)
    rec = np.frombuffer(blob, dtype=las._record_dtype(6))
    assert rec["scan_angle"][0] == round(12.5 / 0.006)
    h = las.LasHeader(4, 6, las.POINT_LEN[6], 0, 1, (0.01,) * 3, (0.0,) * 3,
                      (0,) * 3, (0,) * 3, (0,) * 15, False, 375)
    back = las.decode_records(blob, h)
    assert back.scan_angle_rank[0] == pytest.approx(12.5, abs=0.006)


# ---------------------------------------------------------------------------
# distributed reader / writer
# ---------------------------------------------------------------------------


@needs_ref
def test_read_las_chunk_invariance(spark):
    """Chunked parallel read == single-chunk read (the 100 TB split path)."""
    path = f"{REF}/simple.las"
    small = las.read_las(spark, path, chunk_points=100)
    big = las.read_las(spark, [path], chunk_points=10**6)
    a = small.orderBy("gps_time", "x").toPandas()
    b = big.orderBy("gps_time", "x").toPandas()
    assert len(a) == 1065
    pd.testing.assert_frame_equal(a, b)


def _synth_cloud(spark, n=500):
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .select(
            (F.col("id") * 1.7 - 400.0).alias("x"),
            (F.col("id") * -0.37 + 11.0).alias("y"),
            (F.col("id") % 97 * 0.25).alias("z"),
            (F.col("id") % 65536).cast("int").alias("intensity"),
            (F.col("id") % 5 + 1).cast("int").alias("return_number"),
            F.lit(5).alias("number_of_returns"),
            (F.col("id") % 2).cast("int").alias("scan_direction_flag"),
            F.lit(0).alias("edge_of_flight_line"),
            (F.col("id") % 32).cast("int").alias("classification"),
            (F.col("id") % 181 - 90).cast("double").alias("scan_angle_rank"),
            (F.col("id") % 256).cast("int").alias("user_data"),
            (F.col("id") % 1000).cast("int").alias("point_source_id"),
            (F.col("id") * 0.001 + 500000.0).alias("gps_time"),
            (F.col("id") % 256 * 257 % 65536).cast("int").alias("red"),
            (F.col("id") % 255 * 253 % 65536).cast("int").alias("green"),
            (F.col("id") % 254 * 251 % 65536).cast("int").alias("blue"),
            (F.col("id") % 253 * 249 % 65536).cast("int").alias("infrared"),
            (F.col("id") % 16).cast("int").alias("class_flags"),
            (F.col("id") % 4).cast("int").alias("scan_channel"),
        )
        .repartition(4)
    )


@pytest.mark.parametrize("fmt", [0, 1, 2, 3, 6, 7, 8])
def test_roundtrip_all_formats(spark, tmp_path, fmt):
    df = _synth_cloud(spark)
    path = str(tmp_path / f"rt{fmt}.las")
    meta = las.write_las(df, path, fmt=fmt, scales=(0.001, 0.001, 0.001))
    assert meta["count"] == 500
    h = las.read_header(path)
    assert h.point_format == fmt and h.point_count == 500
    back = las.read_las(spark, path).orderBy("x").toPandas()
    src = df.orderBy("x").toPandas()
    # coordinates survive modulo quantization to 0.001
    np.testing.assert_allclose(back["x"], src["x"], atol=5.1e-4)
    np.testing.assert_allclose(back["z"], src["z"], atol=5.1e-4)
    assert (back["intensity"].values == src["intensity"].values).all()
    max_ret = 15 if fmt > 5 else 7
    assert (back["return_number"].values
            == np.minimum(src["return_number"].values, max_ret)).all()
    if las._has_time(fmt):
        np.testing.assert_array_equal(back["gps_time"], src["gps_time"])
    if las._has_color(fmt):
        assert (back["red"].values == src["red"].values).all()
    if las._has_infrared(fmt):
        assert (back["infrared"].values == src["infrared"].values).all()
    if fmt > 5:
        assert (back["class_flags"].values == src["class_flags"].values).all()
        assert (back["scan_channel"].values == src["scan_channel"].values).all()


def test_write_header_summary(spark, tmp_path):
    """Header carries count / by-return / unquantized bounds
    (LasHeader.cpp:70-96 setSummary)."""
    df = _synth_cloud(spark, n=200)
    path = str(tmp_path / "sum.las")
    las.write_las(df, path, fmt=1)
    h = las.read_header(path)
    src = df.toPandas()
    assert h.point_count == 200
    assert h.mins[0] == pytest.approx(src.x.min())
    assert h.maxs[1] == pytest.approx(src.y.max())
    br = np.bincount(src.return_number, minlength=6)[1:6]
    assert list(h.counts_by_return[:5]) == br.tolist()


def test_write_las_parts_manifest(spark, tmp_path):
    from pyspark.sql import functions as F

    df = _synth_cloud(spark).withColumn(
        "tile", (F.col("x") > 0).cast("int").cast("string")
    )
    man = las.write_las_parts(
        df, str(tmp_path / "tiles"), by="tile", fmt=1
    ).orderBy("group").toPandas()
    assert len(man) == 2
    assert man["count"].sum() == 500
    total = 0
    for _, row in man.iterrows():
        h = las.read_header(row["path"])
        assert h.point_count == row["count"]
        total += h.point_count
        assert h.mins[0] == pytest.approx(row["minx"])
    assert total == 500
    # union of the part files round-trips the whole cloud
    back = las.read_las(spark, man["path"].tolist())
    assert back.count() == 500


def test_pipeline_las_stages(spark, tmp_path):
    """readers.las / writers.las as JSON pipeline stages, plus the
    .las extension in readers.infer (StageFactory extension map)."""
    import pdal_spark.pipeline as pl

    path = str(tmp_path / "pipe.las")
    pl.run(spark, [
        {"type": "readers.faux", "count": 120},
        {"type": "filters.ferry", "dimensions": "x=>z"},
        {"type": "writers.las", "filename": path, "dataformat_id": 0,
         "scale_x": 1e-6, "scale_y": 1e-6, "scale_z": 1e-6},
    ])
    h = las.read_header(path)
    assert h.point_count == 120 and h.point_format == 0
    back = pl.run(spark, [{"type": "readers.las", "filename": path}])
    assert back.count() == 120
    from pyspark.sql import functions as F

    zx = back.select(F.abs(back.z - back.x).alias("d")).agg(F.max("d"))
    assert zx.collect()[0][0] < 1e-5
    # bare-string stage -> inferred LAS reader
    inferred = pl.run(spark, [path])
    assert inferred.count() == 120


def test_mixed_formats_rejected(spark, tmp_path):
    df = _synth_cloud(spark, n=10)
    p0 = str(tmp_path / "f0.las")
    p1 = str(tmp_path / "f1.las")
    las.write_las(df, p0, fmt=0)
    las.write_las(df, p1, fmt=1)
    with pytest.raises(ValueError, match="mixed point formats"):
        las.read_las(spark, [p0, p1])

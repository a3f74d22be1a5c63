"""LASzip codec (formats/laz.py) — byte-exact against real laszip
output (full files, every field) and wired into the public reader.
"""

from __future__ import annotations

import os
import random
import struct

import numpy as np
import pytest

from pdal_spark.formats import laz

FIX = "/root/reference/test/data/laz/autzen_trim.laz"
TWIN = "/root/reference/test/data/las/autzen_trim.las"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(FIX) and os.path.exists(TWIN)),
    reason="reference fixtures unavailable",
)

REF_DT = np.dtype([
    ("x", "<i4"), ("y", "<i4"), ("z", "<i4"), ("intensity", "<u2"),
    ("flags", "u1"), ("classification", "u1"), ("scan_angle_rank", "i1"),
    ("user_data", "u1"), ("point_source_id", "<u2"), ("gps_time", "<f8"),
    ("red", "<u2"), ("green", "<u2"), ("blue", "<u2"),
])


def _twin_points():
    buf = open(TWIN, "rb").read()
    off = struct.unpack("<I", buf[96:100])[0]
    n = struct.unpack("<I", buf[107:111])[0]
    return np.frombuffer(buf, dtype=REF_DT, count=n, offset=off)


def test_vlr_and_chunk_table():
    buf = open(FIX, "rb").read()
    info = laz.laz_vlr_info(buf)
    assert info["compressor"] == 2 and info["chunk_size"] == 50000
    assert [it["type"] for it in info["items"]] == [6, 7, 8]
    assert all(it["version"] == 2 for it in info["items"])
    offset = struct.unpack("<I", buf[96:100])[0]
    tbl = struct.unpack("<q", buf[offset:offset + 8])[0]
    chunks = laz.read_chunk_table(buf, offset, tbl, 110000, 50000)
    assert [n for _, n in chunks] == [50000, 50000, 10000]
    # chunk starts must be within the file and strictly increasing
    starts = [s for s, _ in chunks]
    assert starts[0] == offset + 8 and starts == sorted(starts)
    assert starts[-1] < tbl


def test_intcomp_roundtrip_all_k_paths():
    rng = random.Random(7)
    enc = laz.Encoder()
    ic = laz.IntComp(enc, 32, 4)
    seq = []
    prev = 0
    for i in range(5000):
        step = rng.choice([0, 1, -1, rng.randint(-300, 300),
                           rng.randint(-2 ** 30, 2 ** 30)])
        v = laz._i32(prev + step)
        ctx = rng.randint(0, 3)
        seq.append((prev, v, ctx))
        ic.compress(prev, v, ctx)
        prev = v
    data = enc.done()
    dec = laz.Decoder(data, 0)
    icd = laz.IntDecomp(dec, 32, 4)
    for p, v, ctx in seq:
        assert icd.decompress(p, ctx) == v


def test_item_codecs_roundtrip_synthetic():
    """encode -> decode is the identity over a synthetic point stream
    exercising every POINT10/GPSTIME/RGB branch (return-number
    changes, intensity jumps, gps sequence switches, gray + colored
    pixels)."""
    rng = random.Random(11)
    pts = []
    x, y, z = 1000, 2000, 300
    gps = 245000.0
    for i in range(3000):
        x += rng.randint(-200, 200)
        y += rng.randint(-200, 200)
        z += rng.randint(-40, 40)
        r = rng.randint(1, 3)
        n = max(r, rng.randint(1, 3))
        flags = r | (n << 3) | (rng.randint(0, 1) << 6)
        pt = (x, y, z, rng.randint(0, 300), flags, rng.randint(1, 5),
              rng.randint(-20, 20), rng.randint(0, 3), rng.randint(0, 2))
        gps += rng.choice([0.0, 0.00001, 0.00001, 5.0])
        g = rng.randint(80, 200)
        rgb = (g, g, g) if rng.random() < 0.3 else \
            (rng.randint(0, 65535), rng.randint(0, 65535),
             rng.randint(0, 65535))
        pts.append((pt, gps, rgb))

    enc = laz.Encoder()
    ptw = laz.Point10v2W(enc, pts[0][0])
    g0 = struct.unpack("<Q", struct.pack("<d", pts[0][1]))[0]
    gtw = laz.GpsTime11v2W(enc, g0)
    rgbw = laz.Rgb12v2W(enc, pts[0][2])
    for pt, gps_v, rgb_v in pts[1:]:
        ptw.write(pt)
        gtw.write(struct.unpack("<Q", struct.pack("<d", gps_v))[0])
        rgbw.write(rgb_v)
    data = enc.done()

    dec = laz.Decoder(data, 0)
    first = pts[0]
    fb = struct.pack("<iiiHBBbBH", *first[0])
    ptr = laz.Point10v2(dec, fb)
    gtr = laz.GpsTime11v2(dec, struct.pack("<d", first[1]))
    rgbr = laz.Rgb12v2(dec, struct.pack("<HHH", *first[2]))
    for pt, gps_v, rgb_v in pts[1:]:
        got = ptr.read()
        assert got == pt, (got, pt)
        gu = gtr.read()
        assert struct.unpack("<d", struct.pack("<Q", gu))[0] == gps_v
        assert rgbr.read() == rgb_v


def test_real_stream_full_decode():
    """EVERY point of every chunk of the real laszip-produced fixture
    decodes byte-equal to the uncompressed twin — the former prefix
    bounds (389/14/45) flipped to full chunks (50000/50000/10000) once
    the residual adaptive-model rule was found (FastAC's bit-model
    probability is a double truncation: scale = 2^31//count first,
    then (count0*scale)>>18 — not a single floor division)."""
    ref = _twin_points()
    buf = open(FIX, "rb").read()
    info = laz.laz_vlr_info(buf)
    offset = struct.unpack("<I", buf[96:100])[0]
    tbl = struct.unpack("<q", buf[offset:offset + 8])[0]
    chunks = laz.read_chunk_table(buf, offset, tbl, 110000, 50000)
    assert [n for _, n in chunks] == [50000, 50000, 10000]
    for (start, n), base in zip(chunks, [0, 50000, 100000]):
        got = laz.decode_chunk(buf, start, n, info["items"])
        for f in REF_DT.names:
            np.testing.assert_array_equal(
                got[f], ref[f][base:base + n], err_msg=f)


def test_laszip_fixture_family_full_decode():
    """The three laszip/ fixtures (laszip-, liblas-generated, plus the
    2-byte-padded VLR variant) all decode byte-equal to their shared
    uncompressed twin basefile.las (fmt 3, 1065 pts)."""
    d = "/root/reference/test/data/laszip"
    base = open(f"{d}/basefile.las", "rb").read()
    off = struct.unpack("<I", base[96:100])[0]
    n = struct.unpack("<I", base[107:111])[0]
    ref = np.frombuffer(base, dtype=REF_DT, count=n, offset=off)
    for p in ["laszip-generated.laz",
              "laszip-generated_with2bytespadding.laz",
              "liblas-generated.laz"]:
        pts = laz.read_laz_points(f"{d}/{p}")
        assert len(pts) == n, p
        for f in REF_DT.names:
            np.testing.assert_array_equal(pts[f], ref[f], err_msg=f"{p}:{f}")


def test_v1_pointwise_full_decode():
    """Compressor 1 / v1 items (pre-2011 pointwise files): simple.laz
    decodes byte-equal to simple.las — all 1065 points, every field.
    The v1 attribute models are per-previous-value lazy contexts, the
    same 256-way scheme as v2 (a single shared model desyncs at point
    179 of this very fixture)."""
    p = "/root/reference/test/data/laz/simple.laz"
    buf = open(p, "rb").read()
    info = laz.laz_vlr_info(buf)
    assert info["compressor"] == 1
    assert [it["version"] for it in info["items"]] == [1, 1, 1]
    twin = open("/root/reference/test/data/las/simple.las", "rb").read()
    off = struct.unpack("<I", twin[96:100])[0]
    n = struct.unpack("<I", twin[107:111])[0]
    ref = np.frombuffer(twin, dtype=REF_DT, count=n, offset=off)
    pts = laz.read_laz_points(p)
    assert len(pts) == n == 1065
    for f in REF_DT.names:
        np.testing.assert_array_equal(pts[f], ref[f], err_msg=f)
    # apps/simple.laz is the same stream via another toolchain
    pts2 = laz.read_laz_points("/root/reference/test/data/apps/simple.laz")
    for f in REF_DT.names:
        np.testing.assert_array_equal(pts2[f], ref[f], err_msg=f)


def test_unsupported_paths_raise():
    with pytest.raises(laz.LazUnsupported):
        laz.decode_chunk(b"\x00" * 64, 0, 2,
                         [{"type": 6, "size": 20, "version": 3}])


def test_spark_reader_decodes_laz(spark):
    """read_las() handles .laz transparently: the chunk-parallel Spark
    decode of autzen_trim.laz equals the uncompressed twin's frame
    exactly (every column, every row)."""
    import pandas as pd
    from pdal_spark.formats.las import read_las

    key = ["gps_time", "x", "y", "z"]
    a = (read_las(spark, FIX).toPandas()
         .sort_values(key, kind="stable").reset_index(drop=True))
    b = (read_las(spark, TWIN).toPandas()
         .sort_values(key, kind="stable").reset_index(drop=True))
    assert len(a) == 110000
    pd.testing.assert_frame_equal(a, b)


def test_laz_chunk_extents_partial_reads():
    """Driver-side extents (header + chunk table only) agree with the
    whole-buffer chunk table parse."""
    buf = open(FIX, "rb").read()
    offset = struct.unpack("<I", buf[96:100])[0]
    tbl = struct.unpack("<q", buf[offset:offset + 8])[0]
    whole = laz.read_chunk_table(buf, offset, tbl, 110000, 50000)
    info, extents = laz.laz_chunk_extents(FIX)
    assert [(s, n) for s, _, n in extents] == whole
    # byte extents tile the compressed region exactly
    for (s0, ln, _), (s1, _, _) in zip(extents, extents[1:]):
        assert s0 + ln == s1
    assert extents[-1][0] + extents[-1][1] == tbl


def test_spark_laz_writer_roundtrip(spark):
    """write_las(compression=True): chunk-parallel laszip encode (exact
    global chunk ids via range-partitioned rank), then the chunk-
    parallel reader decodes the written file back to the identical
    frame. Chunk count must match ceil(n/chunk_size)."""
    import tempfile

    import pandas as pd
    from pdal_spark.formats.las import read_las, write_las

    src = read_las(spark, TWIN)
    p = tempfile.mktemp(suffix=".laz")
    key = ["gps_time", "x", "y", "z"]
    info = write_las(
        src, p, fmt=3, scales=(0.01, 0.01, 0.01), offsets=(0.0, 0.0, 0.0),
        compression=True, order_by=key, chunk_size=40000,
    )
    assert info["count"] == 110000 and info["chunks"] == 3
    back = read_las(spark, p)
    a = src.toPandas().sort_values(key, kind="stable").reset_index(drop=True)
    b = back.toPandas().sort_values(key, kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_encode_chunk_byte_identical_to_laszip():
    """Re-encoding the decoded records of a REAL laszip chunk with our
    encoder reproduces the fixture's compressed bytes EXACTLY — the
    writer is laszip-byte-compatible, not merely self-consistent."""
    buf = open(FIX, "rb").read()
    info = laz.laz_vlr_info(buf)
    offset = struct.unpack("<I", buf[96:100])[0]
    tbl = struct.unpack("<q", buf[offset:offset + 8])[0]
    chunks = laz.read_chunk_table(buf, offset, tbl, 110000, 50000)
    start, n = chunks[2]  # last chunk: its end is the chunk table
    rec = laz.decode_chunk(buf, start, n, info["items"])
    mine = laz.encode_chunk(rec, info["items"])
    assert mine == buf[start:tbl]


def test_spark_reader_decodes_v1_laz(spark):
    """read_las() also handles compressor-1 files (one stream -> one
    task): simple.laz equals simple.las through the Spark reader."""
    import pandas as pd
    from pdal_spark.formats.las import read_las

    key = ["gps_time", "x", "y", "z"]
    a = (read_las(spark, "/root/reference/test/data/laz/simple.laz")
         .toPandas().sort_values(key, kind="stable").reset_index(drop=True))
    b = (read_las(spark, "/root/reference/test/data/las/simple.las")
         .toPandas().sort_values(key, kind="stable").reset_index(drop=True))
    assert len(a) == 1065
    pd.testing.assert_frame_equal(a, b)


def test_laz_writer_all_v2_formats(spark):
    """write_las(compression=True) round-trips every v2-item point
    format (0: POINT10 only, 1: +GPS, 2: +RGB, 3: +both), including
    multi-chunk files and non-trivial attribute churn."""
    import tempfile

    import pandas as pd
    from pdal_spark.formats.las import read_las, write_las

    base = read_las(spark, TWIN)
    for fmt in (0, 1, 2, 3):
        p = tempfile.mktemp(suffix=f".f{fmt}.laz")
        cols = ["x", "y", "z", "intensity", "return_number",
                "number_of_returns", "classification", "user_data",
                "point_source_id", "scan_angle_rank"]
        if fmt in (1, 3):
            cols.append("gps_time")
        if fmt in (2, 3):
            cols += ["red", "green", "blue"]
        df = base.select(*cols)
        write_las(df, p, fmt=fmt, scales=(0.01, 0.01, 0.01),
                  compression=True, order_by=["x", "y", "z"],
                  chunk_size=30000)
        back = read_las(spark, p)
        # the source is 0.01-quantized already, so the writer's
        # quantization is the identity; multiset-compare on ALL columns
        # (x/y/z alone do not totally order duplicate points)
        a = (df.toPandas()[cols].sort_values(cols, kind="stable")
             .reset_index(drop=True))
        b = (back.toPandas()[cols].sort_values(cols, kind="stable")
             .reset_index(drop=True))
        pd.testing.assert_frame_equal(b, a, check_dtype=False)


def test_laz_writer_variable_chunking_no_shuffle(spark):
    """order_by=None: every Arrow batch becomes one chunk (chunk_size
    U32 + per-chunk counts in the table) and the plan has NO exchange.
    Round trip must be exact; chunk extents must tile the file."""
    import tempfile

    import pandas as pd
    from pdal_spark.formats import laz as lazmod
    from pdal_spark.formats.las import read_las, write_las

    base = read_las(spark, TWIN)
    p = tempfile.mktemp(suffix=".var.laz")
    info = write_las(base, p, fmt=3, scales=(0.01, 0.01, 0.01),
                     compression=True)
    assert info["count"] == 110000 and info["chunks"] >= 2
    vlr = lazmod.laz_vlr_info(open(p, "rb").read())
    assert vlr["chunk_size"] == 0xFFFFFFFF
    _, extents = lazmod.laz_chunk_extents(p)
    assert sum(n for _, _, n in extents) == 110000
    for (s0, ln, _), (s1, _, _) in zip(extents, extents[1:]):
        assert s0 + ln == s1
    key = ["gps_time", "x", "y", "z"]
    a = (base.toPandas().sort_values(key, kind="stable")
         .reset_index(drop=True))
    b = (read_las(spark, p).toPandas().sort_values(key, kind="stable")
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # single-file decode path handles variable tables too
    pts = lazmod.read_laz_points(p)
    assert len(pts) == 110000


def test_write_las_parts_compressed(spark, tmp_path):
    """FlexWriter analog with writers.las compression: one .laz per
    tile group, encoded in the owning task; every tile reads back
    byte-equal to its uncompressed twin's frame."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F
    from pdal_spark.formats.las import read_las, write_las_parts

    base = read_las(spark, TWIN).withColumn(
        "tile", (F.col("x") > 637000).cast("int").cast("string")
    )
    d_laz = str(tmp_path / "laz_tiles")
    d_las = str(tmp_path / "las_tiles")
    man = write_las_parts(base, d_laz, by="tile", fmt=3,
                          compression=True, chunk_size=20000).collect()
    man2 = write_las_parts(base, d_las, by="tile", fmt=3).collect()
    assert {m.group for m in man} == {m.group for m in man2}
    key = ["gps_time", "x", "y", "z"]
    for m in man:
        assert m.path.endswith(".laz") and os.path.exists(m.path)
        a = (read_las(spark, m.path).toPandas()
             .sort_values(key, kind="stable").reset_index(drop=True))
        b = (read_las(spark, os.path.join(d_las, f"{m.group}.las"))
             .toPandas().sort_values(key, kind="stable")
             .reset_index(drop=True))
        assert len(a) == m["count"]
        pd.testing.assert_frame_equal(a, b)


def test_empty_dataset_roundtrips(spark):
    """Zero-row write -> read for both .las and .laz (the empty chunk
    list must not produce a zero-partition repartition)."""
    import tempfile

    from pdal_spark.formats.las import read_las, write_las

    src = read_las(spark, TWIN).limit(0)
    p1 = tempfile.mktemp(suffix=".las")
    p2 = tempfile.mktemp(suffix=".laz")
    assert write_las(src, p1, fmt=3)["count"] == 0
    assert write_las(src, p2, fmt=3, compression=True)["count"] == 0
    assert read_las(spark, p1).count() == 0
    assert read_las(spark, p2).count() == 0

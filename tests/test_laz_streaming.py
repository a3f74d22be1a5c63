"""Streaming-laz recovery: LASzip writers that cannot seek back leave
-1 in the 8-byte chunk-table pointer and append the table's real
position as the file's last 8 bytes (public LASzip reader behavior,
src/lasreadpoint.cpp read_chunk_table(); the reference delegates via
lazperf, io/LasReader.cpp).  We synthesize the streaming form from a
normal fixture — pointer := -1, trailing 8-byte pointer appended — and
require every read path (single-file decode, driver-side chunk
extents, the Spark reader, EPT-style whole-buf table parse) to decode
it identically to the original.
"""

from __future__ import annotations

import os
import struct
import tempfile

import numpy as np
import pytest

from pdal_spark.formats import laz

FIX = "/root/reference/test/data/laz/autzen_trim.laz"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIX), reason="reference fixture unavailable")


def _to_streaming(buf: bytes) -> bytes:
    """Normal chunked .laz -> the interrupted/streaming layout."""
    offset = struct.unpack("<I", buf[96:100])[0]
    tbl = struct.unpack("<q", buf[offset:offset + 8])[0]
    assert tbl > 0
    out = bytearray(buf)
    out[offset:offset + 8] = struct.pack("<q", -1)
    out += struct.pack("<q", tbl)
    return bytes(out)


def test_recover_table_offset_bounds():
    with pytest.raises(laz.LazUnsupported):
        laz.recover_table_offset(struct.pack("<q", -1), 100, 1000)
    with pytest.raises(laz.LazUnsupported):
        laz.recover_table_offset(struct.pack("<q", 999), 100, 1000)
    assert laz.recover_table_offset(struct.pack("<q", 500), 100, 1000) == 500


def test_streaming_single_file_decode_equal():
    buf = open(FIX, "rb").read()
    want = laz.read_laz_points(FIX)
    p = tempfile.mktemp(suffix=".stream.laz")
    with open(p, "wb") as f:
        f.write(_to_streaming(buf))
    got = laz.read_laz_points(p)
    assert np.array_equal(want, got)


def test_streaming_chunk_extents_equal():
    buf = open(FIX, "rb").read()
    _, want = laz.laz_chunk_extents(FIX)
    p = tempfile.mktemp(suffix=".stream.laz")
    with open(p, "wb") as f:
        f.write(_to_streaming(buf))
    _, got = laz.laz_chunk_extents(p)
    assert got == want  # same absolute extents: table body is unmoved


def test_streaming_whole_buf_table_parse():
    """The EPT node path parses the pointer out of a whole buffer and
    calls read_chunk_table directly — the -1 recovery lives there."""
    buf = open(FIX, "rb").read()
    offset = struct.unpack("<I", buf[96:100])[0]
    tbl = struct.unpack("<q", buf[offset:offset + 8])[0]
    want = laz.read_chunk_table(buf, offset, tbl, 110000, 50000)
    sbuf = _to_streaming(buf)
    got = laz.read_chunk_table(sbuf, offset, -1, 110000, 50000)
    assert got == want


def test_streaming_spark_reader_roundtrip(spark):
    """read_las over the streaming form == read_las over the original,
    including the chunk-per-task split."""
    import pandas as pd
    from pdal_spark.formats.las import read_las

    p = tempfile.mktemp(suffix=".stream.laz")
    with open(p, "wb") as f:
        f.write(_to_streaming(open(FIX, "rb").read()))
    key = ["gps_time", "x", "y", "z"]
    a = (read_las(spark, FIX).toPandas().sort_values(key, kind="stable")
         .reset_index(drop=True))
    b = (read_las(spark, p).toPandas().sort_values(key, kind="stable")
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_streaming_variable_chunking(spark):
    """Variable-chunked writer output (chunk_size U32, counts in the
    table) survives the streaming transform too."""
    from pdal_spark.formats.las import read_las, write_las

    base = read_las(spark, FIX)
    p = tempfile.mktemp(suffix=".var.laz")
    write_las(base, p, fmt=3, scales=(0.01, 0.01, 0.01),
              compression=True)
    want = laz.read_laz_points(p)
    sp = tempfile.mktemp(suffix=".var.stream.laz")
    with open(sp, "wb") as f:
        f.write(_to_streaming(open(p, "rb").read()))
    got = laz.read_laz_points(sp)
    assert np.array_equal(want, got)
    _, ea = laz.laz_chunk_extents(p)
    _, eb = laz.laz_chunk_extents(sp)
    assert ea == eb


def test_corrupt_chunk_count_raises_fast():
    """A flipped u32 chunk count must raise LazUnsupported quickly, not
    spin the arithmetic decoder for minutes (corrupt-file DoS guard)."""
    import time

    buf = open(FIX, "rb").read()
    offset = struct.unpack("<I", buf[96:100])[0]
    tbl = struct.unpack("<q", buf[offset:offset + 8])[0]
    bad = bytearray(buf)
    bad[tbl + 4:tbl + 8] = struct.pack("<I", 0xFFFFFFF0)
    t0 = time.monotonic()
    with pytest.raises(laz.LazUnsupported, match="chunk count"):
        laz.read_chunk_table(bytes(bad), offset, tbl, 110000, 50000)
    assert time.monotonic() - t0 < 2.0

"""Adversarial field-pattern fuzz for the LASzip codec (round-5
hardening): the encoder must round-trip exactly on the degenerate and
boundary patterns the synthetic test misses — all-ties coordinates
(median predictors collapse to k=0 paths), saturating intensities
(16-bit clamp boundary), RGB deltas at byte-fold boundaries (the
_u8_fold wraparound in Rgb12v2), scan-angle i8 extremes, i32
coordinate jumps (k=31/32 corridors), and gps_time jump/alternation
patterns (multi-context switching incl. the 0x7FFFFFFF case-change
path).

These are encode_chunk -> decode_chunk identities — exactly what the
chunk-parallel writer/reader run per task — so a failure here is a
data-corruption bug at scale, not a style issue.
"""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from pdal_spark.formats import laz


def _mkrec(n, fmt):
    items = laz.laz_items_for_format(fmt)
    fields = [("x", "<i4"), ("y", "<i4"), ("z", "<i4"),
              ("intensity", "<u2"), ("flags", "u1"),
              ("classification", "u1"), ("scan_angle_rank", "i1"),
              ("user_data", "u1"), ("point_source_id", "<u2")]
    if fmt in (1, 3):
        fields.append(("gps_time", "<f8"))
    if fmt in (2, 3):
        fields += [("red", "<u2"), ("green", "<u2"), ("blue", "<u2")]
    return np.zeros(n, dtype=fields), items


def _roundtrip(rec, items):
    buf = laz.encode_chunk(rec, items)
    got = laz.decode_chunk(buf, 0, len(rec), items)
    for name in rec.dtype.names:
        np.testing.assert_array_equal(got[name], rec[name], err_msg=name)


def test_all_ties_coordinates():
    """Every point identical: all diffs 0 -> every IntegerCompressor
    takes its k=0 corridor and the streaming medians never move."""
    for fmt in (0, 1, 2, 3):
        rec, items = _mkrec(500, fmt)
        rec["x"] = 123456
        rec["y"] = -987654
        rec["z"] = 42
        rec["intensity"] = 777
        rec["flags"] = 1 | (1 << 3)
        rec["classification"] = 2
        rec["scan_angle_rank"] = -5
        rec["user_data"] = 9
        rec["point_source_id"] = 4242
        if fmt in (1, 3):
            rec["gps_time"] = 123456.789
        if fmt in (2, 3):
            rec["red"] = rec["green"] = rec["blue"] = 30000
        _roundtrip(rec, items)


def test_saturating_intensity_alternation():
    """0 <-> 65535 every point: the 16-bit corridor boundary both ways,
    plus the intensity context flip on return-number changes."""
    rec, items = _mkrec(800, 1)
    rec["x"] = np.arange(800) * 3
    rec["y"] = 5
    rec["z"] = 5
    rec["intensity"] = np.where(np.arange(800) % 2 == 0, 0, 65535)
    rec["flags"] = np.where(np.arange(800) % 3 == 0,
                            1 | (2 << 3), 2 | (2 << 3)).astype("u1")
    rec["gps_time"] = np.arange(800) * 1e-5
    _roundtrip(rec, items)


def test_rgb_fold_boundaries():
    """RGB diffs that cross the 8-bit fold in every direction: the
    Rgb12v2 codec codes per-byte folded diffs, so components around
    0x00FF/0x0100/0xFF00/0xFFFF are where a sign slip corrupts."""
    vals = [0x0000, 0x00FF, 0x0100, 0x01FF, 0x7FFF, 0x8000,
            0xFE00, 0xFF00, 0xFFFE, 0xFFFF]
    rows = [(r, g, b) for r in vals for g in vals[::3] for b in vals[::4]]
    rec, items = _mkrec(len(rows), 2)
    rec["x"] = np.arange(len(rows))
    a = np.array(rows, dtype="<u2")
    rec["red"], rec["green"], rec["blue"] = a[:, 0], a[:, 1], a[:, 2]
    # gray vs colored toggles the byte_used flag path
    rec["red"][::5] = rec["green"][::5] = rec["blue"][::5] = 0x1234
    _roundtrip(rec, items)


def test_scan_angle_and_flag_extremes():
    """i8 scan-angle saturation (-128/127), edge+direction flag
    combinations, and classification byte extremes."""
    n = 512
    rec, items = _mkrec(n, 0)
    rng = random.Random(3)
    rec["x"] = np.cumsum([rng.randint(-10, 10) for _ in range(n)])
    rec["scan_angle_rank"] = np.where(np.arange(n) % 2 == 0, -128, 127)
    rec["classification"] = np.where(np.arange(n) % 4 < 2, 0, 255)
    flags = []
    for i in range(n):
        r = (i % 5) + 1
        nr = max(r, (i % 7) + 1)
        flags.append((r | (nr << 3) | ((i % 2) << 6) | ((i % 4 == 0) << 7))
                     & 0xFF)
    rec["flags"] = flags
    rec["user_data"] = np.arange(n) % 256
    rec["point_source_id"] = np.where(np.arange(n) % 2 == 0, 0, 65535)
    _roundtrip(rec, items)


def test_i32_coordinate_jumps():
    """Deltas near the 31/32-bit corridor tops: alternating +/-2^30
    jumps exercise the widest k paths of ic_dx/ic_dy/ic_z without
    overflowing i32 absolute positions."""
    n = 200
    rec, items = _mkrec(n, 0)
    x = [0]
    for i in range(1, n):
        x.append(x[-1] + ((1 << 30) if i % 2 else -(1 << 30)))
    rec["x"] = np.array(x, dtype=np.int64).astype(np.int32)
    rec["y"] = np.array(x[::-1], dtype=np.int64).astype(np.int32)
    rec["z"] = np.where(np.arange(n) % 2 == 0, 2**31 - 1, -(2**31))
    _roundtrip(rec, items)


def test_gpstime_jump_and_alternation_patterns():
    """The GpsTime11v2 state machine's hard paths: exact repeats, tiny
    forward steps, huge jumps both directions, and alternation between
    two streams (the last/next context switch), plus a NaN payload
    (gps-time-nan.las exists in the wild)."""
    seq = [100000.0]
    rng = random.Random(7)
    streams = [100000.0, 9e9]
    cur = 0
    for i in range(3000):
        kind = i % 6
        if kind == 0:
            pass  # exact repeat
        elif kind == 1:
            streams[cur] += 1e-6
        elif kind == 2:
            streams[cur] += 5.0
        elif kind == 3:
            streams[cur] -= 3.0
        elif kind == 4:
            streams[cur] += rng.choice([1e6, -1e6])
        else:
            cur = 1 - cur  # stream alternation
        seq.append(streams[cur])
    nan = struct.unpack("<d", struct.pack("<Q", 0x7FF8000000000001))[0]
    seq += [nan, nan, streams[0]]
    rec, items = _mkrec(len(seq), 1)
    rec["x"] = np.arange(len(seq))
    rec["gps_time"] = seq
    buf = laz.encode_chunk(rec, items)
    got = laz.decode_chunk(buf, 0, len(rec), items)
    # NaN-safe bit comparison
    np.testing.assert_array_equal(got["gps_time"].view("<u8"),
                                  rec["gps_time"].view("<u8"))
    np.testing.assert_array_equal(got["x"], rec["x"])


def test_random_walk_fuzz_all_formats():
    """Seeded random walks over every field at aggressive amplitudes,
    all four v2 formats — the catch-all net under the targeted cases."""
    for seed, fmt in [(1, 0), (2, 1), (3, 2), (4, 3)]:
        rng = random.Random(seed)
        n = 1500
        rec, items = _mkrec(n, fmt)
        x = y = z = 0
        for i in range(n):
            x += rng.randint(-(1 << rng.randint(0, 24)),
                             1 << rng.randint(0, 24))
            y += rng.randint(-(1 << rng.randint(0, 20)),
                             1 << rng.randint(0, 20))
            z += rng.randint(-1000, 1000)
            rec["x"][i] = np.int32(x)
            rec["y"][i] = np.int32(y)
            rec["z"][i] = np.int32(z)
            rec["intensity"][i] = rng.randint(0, 65535)
            r = rng.randint(1, 7)
            nr = rng.randint(r, 7)
            rec["flags"][i] = r | (nr << 3) | (rng.randint(0, 3) << 6)
            rec["classification"][i] = rng.randint(0, 255)
            rec["scan_angle_rank"][i] = rng.randint(-128, 127)
            rec["user_data"][i] = rng.randint(0, 255)
            rec["point_source_id"][i] = rng.randint(0, 65535)
            if fmt in (1, 3):
                rec["gps_time"][i] = rng.choice(
                    [0.0, 1e-9, 123456.789, -5e8, 9.9e12]) + i * 1e-4
            if fmt in (2, 3):
                rec["red"][i] = rng.randint(0, 65535)
                rec["green"][i] = rng.randint(0, 65535)
                rec["blue"][i] = rng.randint(0, 65535)
        _roundtrip(rec, items)


@pytest.mark.usefixtures("spark")
def test_texts_ride_next_to_laz_tiles(spark, tmp_path):
    """Byte-invariant hardening through the LAZ writer->reader cycle:
    adversarial text/html payload columns (astral plane, NULs, NFD,
    bidi) ride in the SAME DataFrame as the point columns, the points
    tile out to per-group .laz files, and after decode the points
    re-join their pages with payloads byte-identical — i.e. the laz
    write/read stages never disturb the columns around them."""
    import pandas as pd
    from pyspark.sql import functions as F

    from pdal_spark.formats.las import read_las, write_las_parts

    texts = [
        "plain ascii",
        "café composed",
        "café decomposed",
        "emoji \U0001f409\U0001f680 astral",
        "zero\x00byte inside",
        "bidi ‮RTL‬ end",
    ]
    rows = []
    for i, t in enumerate(texts * 4):
        html = bytes(range(256)) + t.encode("utf-8", "surrogatepass")
        rows.append((i, f"http://t.example/p/{i}", t, bytearray(html)))
    pdf = pd.DataFrame(rows, columns=["page_id", "url", "text", "html"])
    pages = spark.createDataFrame(
        pdf, "page_id long, url string, text string, html binary")

    pts = pages.select(
        "page_id", "url", "text", "html",
        (F.col("page_id") * 2.5).alias("x"),
        (F.col("page_id") % 7 * 1.5).alias("y"),
        F.lit(0.0).alias("z"),
        F.col("page_id").cast("double").alias("gps_time"),
        (F.col("page_id") % 3).cast("string").alias("tile"),
    )
    man = write_las_parts(pts, str(tmp_path / "tiles"), by="tile", fmt=1,
                          scales=(0.5, 0.5, 0.5), compression=True,
                          chunk_size=4).collect()
    assert sum(m["count"] for m in man) == pts.count()
    back = read_las(spark, [m.path for m in man]).select(
        F.col("gps_time").cast("long").alias("page_id"), "x", "y")
    joined = pages.join(back, "page_id")
    got = {r["url"]: (r["text"], bytes(r["html"]), r["x"], r["y"])
           for r in joined.collect()}
    assert len(got) == len(rows)
    for i, t in enumerate(texts * 4):
        txt, html, x, y = got[f"http://t.example/p/{i}"]
        assert txt == t
        assert html == bytes(range(256)) + t.encode("utf-8", "surrogatepass")
        assert x == i * 2.5 and y == i % 7 * 1.5

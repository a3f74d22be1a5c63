"""LASzip v3 layered codec (formats/laz14.py) — LAS 1.4 formats 6-8.

Oracle strategy (VERDICT r4 "What's missing" 1 — no v3 fixture ships
with the reference and no laszip binary exists in-sandbox): encode ->
decode identity on adversarial synthetic streams (incl. forced
scanner-channel switching, the v3-only machinery), cross-checks
against the uncompressed LAS 1.4 twin autzen_trim_7.las (encode its
110k real points, decode, frames equal), and the Spark writer/reader
round trip producing frames equal to the uncompressed write.
"""

from __future__ import annotations

import os
import random
import struct

import numpy as np
import pytest

from pdal_spark.formats import laz, laz14

TWIN7 = "/root/reference/test/data/las/autzen_trim_7.las"


def _mkrec(n, fmt, seed=1, n_extra=0, channels=(0,)):
    items = laz14.laz_items_for_format14(fmt, n_extra)
    fields, has_rgb, has_nir, ne = laz14._record_fields(items)
    rec = np.zeros(n, dtype=fields)
    rng = random.Random(seed)
    x = y = z = 0
    for i in range(n):
        x += rng.randint(-500, 500)
        y += rng.randint(-500, 500)
        z += rng.randint(-50, 50)
        rec["x"][i], rec["y"][i], rec["z"][i] = x, y, z
        rec["intensity"][i] = rng.randint(0, 65535)
        r = rng.randint(1, 15)
        nr = rng.randint(r, 15)
        rec["return_info"][i] = r | (nr << 4)
        sc = rng.choice(channels)
        rec["flags"][i] = rng.randint(0, 15) | (sc << 4) \
            | (rng.randint(0, 1) << 6) | (rng.randint(0, 1) << 7)
        rec["classification"][i] = rng.randint(0, 255)
        rec["user_data"][i] = rng.randint(0, 255)
        rec["scan_angle"][i] = rng.randint(-30000, 30000)
        rec["point_source_id"][i] = rng.randint(0, 65535)
        rec["gps_time"][i] = 100000.0 + i * rng.choice([0.0, 1e-5, 2.5])
        if has_rgb:
            rec["red"][i] = rng.randint(0, 65535)
            rec["green"][i] = rng.randint(0, 65535)
            rec["blue"][i] = rng.randint(0, 65535)
        if has_nir:
            rec["infrared"][i] = rng.randint(0, 65535)
        if ne:
            rec["extra"][i] = [rng.randint(0, 255) for _ in range(ne)]
    return rec, items


def _roundtrip(rec, items):
    buf = laz14.encode_chunk_v3(rec, items)
    got = laz14.decode_chunk_v3(buf, 0, len(rec), items)
    for name in rec.dtype.names:
        np.testing.assert_array_equal(got[name], rec[name], err_msg=name)
    return buf


def test_roundtrip_all_formats():
    for fmt in (6, 7, 8):
        for seed in (1, 2, 3):
            rec, items = _mkrec(1200, fmt, seed)
            _roundtrip(rec, items)


def test_roundtrip_scanner_channel_switching():
    """Multi-channel streams force the v3 context machinery: lazy
    context creation seeded from the previous channel's last point,
    and the companion items (RGB/NIR/extra) following POINT14's
    context — v2 has none of this."""
    for fmt, channels in [(6, (0, 1)), (7, (0, 1, 2, 3)),
                          (8, (1, 3)), (6, (2,))]:
        rec, items = _mkrec(1500, fmt, seed=fmt + 7, channels=channels)
        _roundtrip(rec, items)


def test_roundtrip_extra_bytes_layer_per_byte():
    rec, items = _mkrec(600, 6, seed=5, n_extra=7, channels=(0, 1))
    buf = _roundtrip(rec, items)
    # BYTE14 contributes one layer per extra byte: 9 (POINT14) + 7
    p = 30 + 7 + 4  # raw first point + extras + u32 count
    sizes = struct.unpack_from("<16I", buf, p)
    assert all(s > 0 for s in sizes)


def test_degenerate_all_ties():
    """All-identical points: every layer's zero-diff path."""
    for fmt in (6, 7, 8):
        rec, items = _mkrec(1, fmt, seed=1)
        rec = np.repeat(rec, 400)
        _roundtrip(rec, items)


def test_boundary_patterns():
    """v3 analogs of the v2 adversarial fuzz (test_laz_fuzz): 16-bit
    intensity saturation alternation, i32 coordinate jumps at the
    k-corridor tops, i16 scan-angle extremes interleaved with
    gps-time changes."""
    items = laz14.laz_items_for_format14(6)
    fields, _, _, _ = laz14._record_fields(items)
    n = 600
    rec = np.zeros(n, dtype=fields)
    x = [0]
    for i in range(1, n):
        x.append(x[-1] + ((1 << 30) if i % 2 else -(1 << 30)))
    rec["x"] = np.array(x, dtype=np.int64).astype(np.int32)
    rec["y"] = np.where(np.arange(n) % 2 == 0, 2**31 - 1, -(2**31))
    rec["z"] = np.where(np.arange(n) % 3 == 0, 2**31 - 1, 0)
    rec["intensity"] = np.where(np.arange(n) % 2 == 0, 0, 65535)
    rec["return_info"] = np.where(np.arange(n) % 2 == 0,
                                  1 | (15 << 4), 15 | (15 << 4)
                                  ).astype("u1")
    rec["flags"] = 0
    rec["scan_angle"] = np.where(np.arange(n) % 2 == 0, -32768, 32767)
    rec["point_source_id"] = np.where(np.arange(n) % 2 == 0, 0, 65535)
    # gps changes every other point -> the gi context flips constantly
    rec["gps_time"] = np.where(np.arange(n) % 2 == 0, 5.0,
                               np.arange(n) * 1.5)
    _roundtrip(rec, items)


def test_gps_time_stream_alternation():
    """Two interleaved gps sequences exercise the per-context
    multi-sequence machine (switch codes in both the 0diff and multi
    models)."""
    rec, items = _mkrec(2000, 6, seed=9)
    a, b = 100000.0, 9.0e9
    g = []
    for i in range(2000):
        if i % 3 == 2:
            b += 0.5
            g.append(b)
        else:
            a += 1e-5
            g.append(a)
    rec["gps_time"] = g
    _roundtrip(rec, items)


def test_zero_byte_layers_copy_last():
    """Real laszip drops layers whose field never changed (num_bytes
    0); our writer always emits, but the READER must handle the
    dropped form — absent layer => every point repeats the context's
    last value.  Built by re-assembling an encoded chunk with all
    constant layers zeroed out."""
    items = laz14.laz_items_for_format14(6)
    fields, _, _, _ = laz14._record_fields(items)
    n = 500
    rec = np.zeros(n, dtype=fields)
    rng = random.Random(2)
    x = y = 0
    for i in range(n):
        x += rng.randint(-300, 300)
        y += rng.randint(-300, 300)
        rec["x"][i], rec["y"][i] = x, y
    rec["z"] = 777
    rec["intensity"] = 123
    rec["return_info"] = 1 | (1 << 4)
    rec["flags"] = 3
    rec["classification"] = 7
    rec["user_data"] = 9
    rec["scan_angle"] = -42
    rec["point_source_id"] = 555
    rec["gps_time"] = 99.5
    buf = laz14.encode_chunk_v3(rec, items)
    p = 30
    (count,) = struct.unpack_from("<I", buf, p)
    p += 4
    k = len(laz14.POINT14_LAYERS)
    sizes = list(struct.unpack_from(f"<{k}I", buf, p))
    p += 4 * k
    layers = []
    for s in sizes:
        layers.append(buf[p:p + s])
        p += s
    keep = {0}  # only the mandatory channel/returns/XY layer
    new = buf[:30] + struct.pack("<I", count) + struct.pack(
        f"<{k}I", *[sizes[i] if i in keep else 0 for i in range(k)])
    for i in sorted(keep):
        new += layers[i]
    got = laz14.decode_chunk_v3(new, 0, n, items)
    for name in rec.dtype.names:
        np.testing.assert_array_equal(got[name], rec[name], err_msg=name)


def test_selective_decompression_matches_full():
    """The layered format's reason to exist: decoding a field subset
    skips the other layers entirely, and the decoded fields must equal
    the full decode bit for bit (layer independence — all per-point
    gating lives in the mandatory xy layer)."""
    for fmt, want in [
        (6, {"x", "y"}),
        (6, {"x", "y", "z", "gps_time"}),
        (7, {"x", "y", "intensity"}),          # skips RGB layer
        (8, {"x", "y", "red", "green", "blue"}),  # skips NIR + rest
    ]:
        rec, items = _mkrec(900, fmt, seed=13, channels=(0, 2))
        buf = laz14.encode_chunk_v3(rec, items)
        full = laz14.decode_chunk_v3(buf, 0, len(rec), items)
        part = laz14.decode_chunk_v3(buf, 0, len(rec), items, want=want)
        for f in want:
            np.testing.assert_array_equal(part[f], full[f], err_msg=f)
        # return info / channel always decode (they ride the xy layer)
        np.testing.assert_array_equal(part["return_info"],
                                      full["return_info"])


def test_read_las_columns_pushdown(spark, tmp_path):
    """read_las(columns=...): pruned schema, values equal to the full
    read, against a v3 .laz (true layer skip) AND the uncompressed
    twin write (Arrow-batch pruning)."""
    import tempfile

    import pandas as pd
    from pyspark.sql import functions as F
    from pdal_spark.formats.las import read_las, write_las

    n = 2000
    df = spark.range(n).select(
        (F.col("id") * 0.5).alias("x"),
        (F.col("id") % 50 * 1.0).alias("y"),
        (F.col("id") % 17 * 0.25).alias("z"),
        (F.col("id") % 65536).cast("int").alias("intensity"),
        ((F.col("id") % 9) + 1).cast("int").alias("return_number"),
        F.lit(9).cast("int").alias("number_of_returns"),
        (F.col("id") % 4).cast("int").alias("scan_channel"),
        (F.col("id") % 256).cast("int").alias("classification"),
        (F.col("id") * 1e-3 + 1e5).alias("gps_time"),
        (F.col("id") % 65536).cast("int").alias("red"),
        ((F.col("id") * 7) % 65536).cast("int").alias("green"),
        ((F.col("id") * 13) % 65536).cast("int").alias("blue"),
    )
    key = ["gps_time"]
    for compress in (True, False):
        p = tempfile.mktemp(suffix=".laz" if compress else ".las",
                            dir=str(tmp_path))
        write_las(df, p, fmt=7, compression=compress,
                  order_by=key, chunk_size=500)
        full = (read_las(spark, p).toPandas()
                .sort_values(key, kind="stable").reset_index(drop=True))
        sub = read_las(spark, p, columns=["x", "y", "gps_time"])
        assert [f.name for f in sub.schema.fields] == \
            ["x", "y", "gps_time"]
        got = (sub.toPandas().sort_values(key, kind="stable")
               .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, full[["x", "y", "gps_time"]])
    with pytest.raises(ValueError, match="not in point format"):
        read_las(spark, p, columns=["nope"])


def test_ept_laszip_node_v3(spark, tmp_path):
    """An EPT laszip node written as LAS 1.4 / compressor 3 decodes
    through decode_laz_node: the v14 record shape (4/4 return split,
    i16 scan angle * .006, u64 extended count) maps onto the EPT
    schema columns."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pdal_spark.formats import ept
    from pdal_spark.formats.las import write_las

    n = 800
    df = spark.range(n).select(
        (F.col("id") * 0.5).alias("x"),
        (F.col("id") % 50 * 1.0).alias("y"),
        (F.col("id") % 17 * 0.25).alias("z"),
        ((F.col("id") % 9) + 1).cast("int").alias("return_number"),
        F.lit(9).cast("int").alias("number_of_returns"),
        (F.col("id") % 256).cast("int").alias("classification"),
        (F.col("id") * 1e-3).alias("gps_time"),
    )
    p = str(tmp_path / "node.laz")
    write_las(df, p, fmt=6, scales=(0.01, 0.01, 0.01),
              compression=True, order_by=["gps_time"], chunk_size=300)
    buf = open(p, "rb").read()
    info = ept.EptInfo(
        bounds=(0, 0, 0, 1000, 1000, 1000),
        bounds_conforming=(0, 0, 0, 1000, 1000, 1000),
        points=n, span=256, data_type="laszip", hierarchy_type="json",
        schema=(
            {"name": "X", "type": "signed", "size": 4,
             "scale": 0.01, "offset": 0.0},
            {"name": "Y", "type": "signed", "size": 4,
             "scale": 0.01, "offset": 0.0},
            {"name": "Z", "type": "signed", "size": 4,
             "scale": 0.01, "offset": 0.0},
            {"name": "ReturnNumber", "type": "unsigned", "size": 1},
            {"name": "NumberOfReturns", "type": "unsigned", "size": 1},
            {"name": "Classification", "type": "unsigned", "size": 1},
            {"name": "GpsTime", "type": "float", "size": 8},
        ),
        srs={},
    )
    got = ept.decode_laz_node(buf, info).sort_values(
        "GpsTime", kind="stable").reset_index(drop=True)
    assert len(got) == n
    exp = df.toPandas().sort_values("gps_time", kind="stable") \
        .reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["ReturnNumber"].astype("int64"),
        exp["return_number"].astype("int64"),
        check_names=False)
    assert (got["NumberOfReturns"] == 9).all()
    pd.testing.assert_series_equal(
        got["Classification"].astype("int64"),
        exp["classification"].astype("int64"), check_names=False)
    np.testing.assert_allclose(got["x"], exp["x"], atol=0.005)
    np.testing.assert_allclose(got["GpsTime"], exp["gps_time"])


def test_guard_narrowed_wavepackets_still_raise():
    with pytest.raises(laz.LazUnsupported):
        laz14.laz_items_for_format14(9)
    with pytest.raises(laz.LazUnsupported):
        laz14.n_layers({"type": laz14.ITEM_WAVEPACKET14, "size": 29})
    # v2 entry points route 6-8 to the v3 items now
    assert laz.laz_items_for_format(7)[0]["version"] == 3
    with pytest.raises(laz.LazUnsupported):
        laz.laz_items_for_format(4)


@pytest.mark.skipif(not os.path.exists(TWIN7), reason="no twin fixture")
def test_autzen_trim_7_twin_roundtrip():
    """The reference's uncompressed LAS 1.4 fmt-7 twin: all 110k real
    points encode -> decode identical, chunked like the writer."""
    from pdal_spark.formats import las as L

    h = L.read_header(TWIN7)
    assert h.point_format == 7 and h.point_count == 110000
    buf = open(TWIN7, "rb").read()
    raw = buf[h.point_offset:h.point_offset + h.point_count * h.point_len]
    view = L._laz_record_view(raw, h.point_format)
    items = laz.laz_items_for_format(7)
    total = 0
    for lo in range(0, len(view), 50000):
        chunk = view[lo:lo + 50000]
        blob = laz.encode_chunk(chunk, items)
        total += len(blob)
        back = laz.decode_chunk(blob, 0, len(chunk), items)
        for name in back.dtype.names:
            np.testing.assert_array_equal(back[name], chunk[name],
                                          err_msg=f"{lo}:{name}")
    assert total < len(raw) // 3  # real compression, not storage


@pytest.mark.skipif(not os.path.exists(TWIN7), reason="no twin fixture")
def test_spark_laz14_writer_reader_roundtrip(spark):
    """write_las(compression=True, fmt=7) on the twin's points ->
    read_las decodes the identical frame (the VERDICT r4 'done'
    criterion for the v3 stretch item)."""
    import tempfile

    import pandas as pd
    from pdal_spark.formats.las import read_las, write_las

    src = read_las(spark, TWIN7)
    key = ["gps_time", "x", "y", "z"]
    p = tempfile.mktemp(suffix=".laz")
    info = write_las(src, p, fmt=7, scales=(0.01, 0.01, 0.01),
                     compression=True, order_by=key, chunk_size=40000)
    assert info["count"] == 110000 and info["chunks"] == 3
    back = read_las(spark, p)
    a = src.toPandas().sort_values(key, kind="stable").reset_index(drop=True)
    b = back.toPandas().sort_values(key, kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_spark_laz14_variable_chunking(spark, tmp_path):
    """v3 with VARIABLE chunking (order_by=None: one layered chunk per
    Arrow batch, counts in the chunk table, no shuffle in the encode
    plan) -> chunk-parallel read reproduces the frame."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pdal_spark.formats.las import read_las, write_las

    n = 4000
    df = spark.range(n).select(
        (F.col("id") * 0.5).alias("x"),
        (F.col("id") % 50 * 1.0).alias("y"),
        (F.col("id") % 17 * 0.25).alias("z"),
        ((F.col("id") % 9) + 1).cast("int").alias("return_number"),
        F.lit(9).cast("int").alias("number_of_returns"),
        (F.col("id") % 4).cast("int").alias("scan_channel"),
        (F.col("id") * 1e-3 + 1e5).alias("gps_time"),
        (F.col("id") % 65536).cast("int").alias("red"),
        ((F.col("id") * 7) % 65536).cast("int").alias("green"),
        ((F.col("id") * 13) % 65536).cast("int").alias("blue"),
    ).repartition(5)
    p = str(tmp_path / "var.laz")
    info = write_las(df, p, fmt=7, compression=True)
    assert info["count"] == n and info["chunks"] >= 5
    key = ["gps_time"]
    a = df.toPandas().sort_values(key).reset_index(drop=True)
    b = read_las(spark, p).toPandas().sort_values(key) \
        .reset_index(drop=True)
    assert len(b) == n
    np.testing.assert_allclose(b["x"], a["x"], atol=0.006)
    for c in ("return_number", "scan_channel", "red", "green", "blue"):
        np.testing.assert_array_equal(b[c].to_numpy(), a[c].to_numpy(),
                                      err_msg=c)


def test_spark_laz14_all_formats_parts(spark, tmp_path):
    """write_las_parts with compression over formats 6/7/8 (synthetic
    multi-channel points): every tile's .laz reads back equal to its
    uncompressed twin."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pdal_spark.formats.las import read_las, write_las_parts

    n = 3000
    base = spark.range(n).select(
        (F.col("id") * 0.5).alias("x"),
        (F.col("id") % 100 * 1.0).alias("y"),
        (F.col("id") % 17 * 0.25).alias("z"),
        (F.col("id") % 65536).cast("int").alias("intensity"),
        ((F.col("id") % 9) + 1).cast("int").alias("return_number"),
        F.lit(9).cast("int").alias("number_of_returns"),
        (F.col("id") % 4).cast("int").alias("scan_channel"),
        (F.col("id") % 16).cast("int").alias("class_flags"),
        (F.col("id") % 2).cast("int").alias("scan_direction_flag"),
        F.lit(0).cast("int").alias("edge_of_flight_line"),
        (F.col("id") % 256).cast("int").alias("classification"),
        ((F.col("id") % 121) * 0.006 * F.when(F.col("id") % 2 == 0, 1)
         .otherwise(-1)).alias("scan_angle_rank"),
        (F.col("id") % 256).cast("int").alias("user_data"),
        (F.col("id") % 65536).cast("int").alias("point_source_id"),
        (F.col("id") * 1e-3 + 1e5).alias("gps_time"),
        (F.col("id") % 65536).cast("int").alias("red"),
        ((F.col("id") * 7) % 65536).cast("int").alias("green"),
        ((F.col("id") * 13) % 65536).cast("int").alias("blue"),
        ((F.col("id") * 3) % 65536).cast("int").alias("infrared"),
        (F.col("id") % 2).cast("string").alias("tile"),
    )
    key = ["gps_time", "x", "y", "z"]
    for fmt in (6, 7, 8):
        d_laz = str(tmp_path / f"laz{fmt}")
        d_las = str(tmp_path / f"las{fmt}")
        man = write_las_parts(base, d_laz, by="tile", fmt=fmt,
                              compression=True, chunk_size=500).collect()
        write_las_parts(base, d_las, by="tile", fmt=fmt).collect()
        for m in man:
            a = (read_las(spark, m.path).toPandas()
                 .sort_values(key, kind="stable").reset_index(drop=True))
            b = (read_las(spark, os.path.join(d_las, f"{m.group}.las"))
                 .toPandas().sort_values(key, kind="stable")
                 .reset_index(drop=True))
            pd.testing.assert_frame_equal(a, b)


def test_corrupt_layer_sizes_raise_fast():
    """A flipped u32 in the layer-size table must raise LazUnsupported
    (buffer-overrun bound), not hand the entropy decoders out-of-range
    offsets — same corrupt-input class as the v2 chunk-count guard."""
    rec, items = _mkrec(400, 6, seed=9)
    buf = bytearray(laz14.encode_chunk_v3(rec, items))
    p = 30 + 4  # first raw POINT14 + u32 count -> first layer size
    struct.pack_into("<I", buf, p, 0xFFFFFF00)
    with pytest.raises(laz.LazUnsupported, match="overrun"):
        laz14.decode_chunk_v3(bytes(buf), 0, 400, items)

"""QFIT and Terrasolid readers: reference-fixture parity."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from pdal_spark.formats import qfit, terrasolid as ts

QFIT = "/root/reference/test/data/qfit"
TERRA = "/root/reference/test/data/terrasolid"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(QFIT), reason="reference fixtures unavailable"
)


def _qfit_rows(path, n, **kw):
    h = qfit.read_header(path)
    raw = open(path, "rb").read()
    block = raw[h.data_offset: h.data_offset + n * h.record_len]
    return qfit.decode_records(block, h, **kw)


@needs_ref
def test_qfit_10_word_goldens():
    """QFITReaderTest test_10_word (flip off, scale_z .001)."""
    h = qfit.read_header(f"{QFIT}/10-word.qi")
    assert (h.words, h.little_endian) == (10, False)
    p = _qfit_rows(f"{QFIT}/10-word.qi", 3, flip_x=False)
    np.testing.assert_allclose(
        p[["x", "y", "z"]].values,
        [[221.826822, 59.205160, 32.0900],
         [221.826740, 59.205161, 32.0190],
         [221.826658, 59.205164, 32.0000]],
        rtol=0, atol=1e-9,
    )
    assert (p.offset_time == 0).all()


@needs_ref
def test_qfit_14_word_goldens():
    h = qfit.read_header(f"{QFIT}/14-word.qi")
    assert h.words == 14
    p = _qfit_rows(f"{QFIT}/14-word.qi", 3, flip_x=False)
    np.testing.assert_allclose(
        p[["x", "y", "z"]].values,
        [[244.306337, 35.623317, 1056.830],
         [244.306260, 35.623280, 1056.409],
         [244.306204, 35.623257, 1056.483]],
        rtol=0, atol=1e-9,
    )
    assert (p.offset_time == 903).all()
    assert {"passive_x", "passive_signal"} <= set(p.columns)


@needs_ref
def test_qfit_flip_x():
    """x > 180 flips to negative when flip_coordinates (the default)."""
    p = _qfit_rows(f"{QFIT}/10-word.qi", 3, flip_x=True)
    np.testing.assert_allclose(p.x.values[0], 221.826822 - 360.0)


@needs_ref
def test_qfit_endianness_detection():
    """First word >= 100 as LE -> big-endian file (QfitReader.cpp:232)."""
    h = qfit.read_header(f"{QFIT}/20100515_152839.atm4bT2.qi")
    assert not h.little_endian and h.words == 12
    raw = open(f"{QFIT}/20100515_152839.atm4bT2.qi", "rb").read()
    p = qfit.decode_records(
        raw[h.data_offset: h.data_offset + 5 * h.record_len], h
    )
    # Greenland ATM campaign: sane geographic coords + 12-word dims
    assert ((-90 <= p.y) & (p.y <= 90)).all()
    assert ((-180 <= p.x) & (p.x <= 180)).all()
    assert {"pdop", "pulse_width"} <= set(p.columns)
    # a synthetic LE header takes the little-endian path
    import struct
    buf = struct.pack("<i", 40) + b"\0" * 36 + struct.pack("<i", 44)
    import tempfile, os as _os
    tmp = tempfile.mktemp(suffix=".qi")
    with open(tmp, "wb") as f:
        f.write(buf + b"\0" * 400)
    try:
        hl = qfit.read_header(tmp)
        assert hl.little_endian and hl.words == 10
    finally:
        _os.remove(tmp)


@needs_ref
def test_qfit_distributed_chunk_invariance(spark):
    path = f"{QFIT}/14-word.qi"
    a = qfit.read_qfit(spark, path, chunk_points=111).orderBy(
        "offset_time", "x").toPandas()
    b = qfit.read_qfit(spark, [path], chunk_points=10**6).orderBy(
        "offset_time", "x").toPandas()
    assert len(a) == 1000
    pd.testing.assert_frame_equal(a, b)


@needs_ref
def test_terrasolid_goldens(spark):
    """TerrasolidReaderTest: header fields + first-point goldens."""
    path = f"{TERRA}/20020715-time-color.bin"
    h = ts.read_header(path)
    assert h.version == 20020715 and h.n_points == 1000
    assert h.units == 100.0 and h.org == (0.0, 0.0, 0.0)
    assert h.have_time and h.have_color
    raw = open(path, "rb").read()
    p = ts.decode_records(raw[56: 56 + h.record_len], h)
    assert p.x[0] == pytest.approx(363127.94)
    assert p.y[0] == pytest.approx(3437612.33)
    assert p.z[0] == pytest.approx(55.26)
    assert p.offset_time[0] == 0
    assert p.intensity[0] == 1840 and p.point_source_id[0] == 27207
    # distributed read agrees at any chunking (total order: all columns)
    a = ts.read_terrasolid(spark, path, chunk_points=73)
    cols = a.columns
    a = a.orderBy(*cols).toPandas()
    b = ts.read_terrasolid(spark, path).orderBy(*cols).toPandas()
    assert len(a) == 1000
    pd.testing.assert_frame_equal(a, b)


def test_terrasolid_bad_magic(tmp_path):
    f = tmp_path / "bad.bin"
    f.write_bytes(b"\0" * 56)
    with pytest.raises(ValueError, match="RecogVal"):
        ts.read_header(str(f))


def test_pipeline_qfit_terrasolid_stages(spark):
    import pdal_spark.pipeline as pl

    if not os.path.isdir(QFIT):
        pytest.skip("fixtures unavailable")
    out = pl.run(spark, [
        {"type": "readers.qfit", "filename": f"{QFIT}/10-word.qi",
         "flip_coordinates": False},
    ])
    assert out.count() == 2000
    t = pl.run(spark, [f"{TERRA}/20020715-time-color.bin"])
    assert t.count() == 1000

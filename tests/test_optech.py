"""Optech CSD reader: header + georeferenced point goldens."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from pdal_spark.formats import optech

REF = "/root/reference/test/data/optech"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures unavailable"
)
FIXTURE = f"{REF}/sample.csd"


@needs_ref
def test_header_goldens():
    """OptechReaderTest Header (lines 87-106)."""
    h = optech.read_header(FIXTURE)
    assert h.signature == "CSD"
    assert h.vendor_id == "Optech Incorporated"
    assert h.software_version == "DASHMap"
    assert h.format_version == pytest.approx(5.2010002)
    assert h.header_size == 2048 and h.gps_week == 1660
    assert h.min_time == 575644.74484563898
    assert h.max_time == 575644.75883187703
    assert h.num_records == 1000
    assert h.misalignment[2] == 0.002
    assert h.imu_offsets == (0.002250602070446688, -0.0021128955924643355,
                             0.0054852207731677788)
    assert (h.temperature, h.pressure) == (13.0, 1026.75)


@needs_ref
def test_point_goldens():
    """OptechReaderTest ReadingPoints — full WGS84 georeferencing chain
    (boresight + IMU rotations, curvilinear conversion) to double-EQ."""
    h = optech.read_header(FIXTURE)
    raw = open(FIXTURE, "rb").read()
    p = optech.decode_records(
        raw[2048: 2048 + 1000 * optech.RECORD_LEN], h
    )
    assert len(p) == 1000
    r = p.iloc[0]
    assert r.x == pytest.approx(-82.554028877408555, abs=1e-13)
    assert r.y == pytest.approx(36.534611447321907, abs=1e-13)
    assert r.z == pytest.approx(344.80889224602356, abs=1e-10)
    assert r.gps_time == pytest.approx(5.756447448456390e5)
    assert r.return_number == 1 and r.number_of_returns == 1
    assert r.echo_range == pytest.approx(8.27356689453125e2)
    assert r.intensity == 384
    # float-first arithmetic quirk replicated bit-for-bit
    assert r.scan_angle_rank == -14.555161476135254


def test_bad_signature(tmp_path):
    f = tmp_path / "bad.csd"
    f.write_bytes(b"\0" * 2048)
    with pytest.raises(ValueError, match="signature"):
        optech.read_header(str(f))


@needs_ref
def test_distributed_chunk_invariance(spark):
    a = optech.read_optech(spark, FIXTURE, chunk_points=137)
    cols = a.columns
    a = a.orderBy(*cols).toPandas()
    b = optech.read_optech(spark, [FIXTURE]).orderBy(*cols).toPandas()
    assert len(a) == 1000
    pd.testing.assert_frame_equal(a, b)


@needs_ref
def test_pipeline_stage(spark):
    import pdal_spark.pipeline as pl

    out = pl.run(spark, [{"type": "readers.optech", "filename": FIXTURE}])
    assert out.count() == 1000
    assert pl.run(spark, [FIXTURE]).count() == 1000

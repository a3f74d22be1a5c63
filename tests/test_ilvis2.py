"""ILVIS2 reader: reference-fixture parity (Ilvis2ReaderTest.cpp)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from pdal_spark.formats import ilvis2

REF = "/root/reference/test/data/ilvis2"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures unavailable"
)
FIXTURE = f"{REF}/ILVIS2_TEST_FILE.TXT"


@needs_ref
def test_default_all_mapping(spark):
    """testReadDefault: 3 lines -> 4 points (one HIGH twin where the
    low/high elevations differ), goldens incl. longitude wrapping."""
    df = ilvis2.read_ilvis2(spark, FIXTURE)
    p = df.orderBy("gps_time", "z").toPandas()
    assert len(p) == 4
    np.testing.assert_allclose(
        p[["gps_time", "y", "x", "z"]].values,
        [
            [42504.48313, 78.307672, -58.785213, 1956.777],
            [42504.48512, 78.307592, 101.215097, 1956.588],
            [42504.48712, 78.307512, -58.78459, 1956.667],
            [42504.48712, 78.307512, -58.78459, 2956.667],
        ],
        rtol=0, atol=1e-9,
    )


@needs_ref
def test_high_mapping(spark):
    """testReadHigh: one point per line, HIGH triple as x/y/z."""
    p = ilvis2.read_ilvis2(spark, FIXTURE, mapping="high") \
        .orderBy("gps_time").toPandas()
    assert len(p) == 3
    assert p.z.tolist() == [1956.777, 1956.588, 2956.667]


@needs_ref
def test_longitude_normalization(spark):
    """301.2148 -> -58.785; -258.785 -> 101.215; -418.785 -> -58.785
    (Utils::normalizeLongitude fmod+wrap)."""
    p = ilvis2.read_ilvis2(spark, FIXTURE, mapping="low") \
        .orderBy("gps_time").toPandas()
    np.testing.assert_allclose(
        p.x.values, [-58.785213, 101.215097, -58.78459], atol=1e-9
    )
    assert ((p.longitude_centroid > -180) & (p.longitude_centroid <= 180)).all()


def test_validate_raises_on_malformed(spark, tmp_path):
    f = tmp_path / "bad.TXT"
    f.write_text("# h\n# h\n1 2 3\n")
    with pytest.raises(ValueError, match="12 fields"):
        ilvis2.read_ilvis2(spark, str(f), validate=True)
    # non-validate mode drops the line instead
    assert ilvis2.read_ilvis2(spark, str(f)).count() == 0


def test_bad_mapping():
    with pytest.raises(ValueError, match="mapping"):
        ilvis2.read_ilvis2(None, "x.TXT", mapping="sideways")


@needs_ref
def test_pipeline_stage(spark):
    import pdal_spark.pipeline as pl

    out = pl.run(spark, [
        {"type": "readers.ilvis2", "filename": FIXTURE, "mapping": "low"},
    ])
    assert out.count() == 3

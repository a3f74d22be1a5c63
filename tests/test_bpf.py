"""BPF v3: all three interleaves, zlib frames, round trip."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdal_spark.formats import bpf

REF = "/root/reference/test/data/bpf"
BASE = f"{REF}/autzen-utm-chipped-25-v3"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference BPF fixtures unavailable"
)

VARIANTS = [
    ("dim-major", f"{BASE}.bpf"),
    ("point-major", f"{BASE}-interleaved.bpf"),
    ("byte-major", f"{BASE}-segregated.bpf"),
    ("zlib dim-major", f"{BASE}-deflate.bpf"),
    ("zlib point-major", f"{BASE}-deflate-interleaved.bpf"),
    ("zlib byte-major", f"{BASE}-deflate-segregated.bpf"),
]


@needs_ref
def test_header_fields():
    h = bpf.read_header(f"{BASE}.bpf")
    assert h.version == 3
    assert h.n_points == 1065  # BpfTestBase/QuickInfo golden
    assert h.interleave == bpf.DIM_MAJOR and h.compression == 0
    assert h.dim_labels[:3] == ("X", "Y", "Z")
    h2 = bpf.read_header(f"{BASE}-segregated.bpf")
    assert h2.interleave == bpf.BYTE_MAJOR


@needs_ref
def test_all_variants_identical(spark):
    """BpfTestBase 'test' triple + the zlib set: every interleave and
    compression combination decodes to the same point set."""
    frames = {}
    for tag, path in VARIANTS:
        frames[tag] = (
            bpf.read_bpf(spark, path, chunk_points=300)
            .orderBy("x", "y", "z")
            .toPandas()
        )
    ref = frames["dim-major"]
    assert len(ref) == 1065
    for tag, p in frames.items():
        pd.testing.assert_frame_equal(ref, p), tag


@needs_ref
def test_values_are_offset_floats(spark):
    """value = float32 + per-dim f8 offset (BpfReader.cpp:360)."""
    h = bpf.read_header(f"{BASE}.bpf")
    p = bpf.read_bpf(spark, f"{BASE}.bpf").toPandas()
    xi = h.dim_labels.index("X")
    # every x equals offset + an exactly-representable float32
    resid = (p.x - h.dim_offsets[xi]).astype(np.float32).astype(np.float64)
    np.testing.assert_array_equal(resid, p.x - h.dim_offsets[xi])


@needs_ref
def test_chunk_invariance(spark):
    a = bpf.read_bpf(spark, f"{BASE}.bpf", chunk_points=97).orderBy("x", "y")
    b = bpf.read_bpf(spark, f"{BASE}.bpf", chunk_points=10**6).orderBy("x", "y")
    pd.testing.assert_frame_equal(a.toPandas(), b.toPandas())


def test_bad_magic():
    with pytest.raises(ValueError, match="BPF"):
        bpf.parse_header(b"NOPE0003" + b"\0" * 400)


def test_roundtrip(spark, tmp_path):
    df = spark.range(500).select(
        (F.col("id") * 0.5 + 493000.0).alias("x"),
        (F.col("id") * 0.25 + 4877000.0).alias("y"),
        (F.col("id") % 40).cast("double").alias("z"),
        (F.col("id") % 256).cast("double").alias("Intensity"),
    ).repartition(3)
    path = str(tmp_path / "rt.bpf")
    meta = bpf.write_bpf(df, path)
    assert meta["count"] == 500
    h = bpf.read_header(path)
    assert h.n_points == 500 and h.interleave == bpf.POINT_MAJOR
    back = bpf.read_bpf(spark, path).orderBy("x").toPandas()
    src = df.orderBy("x").toPandas()
    # auto offsets keep float32 residuals small near the data
    np.testing.assert_allclose(back["x"], src["x"], atol=1e-3)
    np.testing.assert_allclose(back["y"], src["y"], atol=1e-3)
    np.testing.assert_array_equal(back["Intensity"], src["Intensity"])


def test_pipeline_bpf_stages(spark, tmp_path):
    import pdal_spark.pipeline as pl

    path = str(tmp_path / "pipe.bpf")
    pl.run(spark, [
        {"type": "readers.faux", "count": 80},
        {"type": "filters.ferry", "dimensions": "x=>z"},
        {"type": "writers.bpf", "filename": path},
    ])
    back = pl.run(spark, [{"type": "readers.bpf", "filename": path}])
    assert back.count() == 80
    assert pl.run(spark, [path]).count() == 80

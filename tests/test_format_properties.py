"""Property tests (hypothesis) for the format codec laws.

These are driver-side (no Spark session): they pin the pure numpy
codec kernels, which the distributed readers/writers call per chunk.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdal_spark.formats import bpf, las, sbet

coords = st.floats(
    min_value=-20_000.0, max_value=20_000.0,
    allow_nan=False, allow_infinity=False,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(coords, min_size=1, max_size=50))
def test_las_quantization_bound(xs):
    """decode(encode(v)) is within scale/2 of v — the sround law."""
    scale = 0.001
    pdf = pd.DataFrame({"x": xs, "y": [0.0] * len(xs), "z": [0.0] * len(xs)})
    blob = las.encode_records(pdf, 0, (scale,) * 3, (0.0,) * 3)
    h = las.LasHeader(2, 0, las.POINT_LEN[0], 0, len(xs), (scale,) * 3,
                      (0.0,) * 3, (0,) * 3, (0,) * 3, (0,) * 5, False, 227)
    back = las.decode_records(blob, h)
    np.testing.assert_allclose(back["x"], xs, atol=scale / 2 + 1e-12)


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-1e6, max_value=1e6,
                 allow_nan=False, allow_infinity=False))
def test_las_sround_matches_cpp(v):
    """sround = floor(v+0.5) for v>0 else ceil(v-0.5) — half away from
    zero, including exact .5 ties (Utils.hpp:152)."""
    got = float(las._sround(np.array([v]))[0])
    want = math.floor(v + 0.5) if v > 0 else math.ceil(v - 0.5)
    assert got == want


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(min_value=-math.pi, max_value=math.pi,
                          allow_nan=False), min_size=1, max_size=20))
def test_sbet_angle_roundtrip(angles):
    """deg->rad->deg through the SBET codec is lossless to 1 ulp-ish."""
    n = len(angles)
    pdf = pd.DataFrame({
        "gps_time": np.arange(n, dtype=float),
        "y": np.degrees(angles), "x": np.degrees(angles),
        "z": np.zeros(n),
    })
    blob = sbet.encode_records(pdf, angles_are_degrees=True)
    back = sbet.decode_records(blob, angles_as_degrees=True)
    np.testing.assert_allclose(back["y"], np.degrees(angles),
                               rtol=1e-14, atol=1e-12)


@settings(max_examples=100, deadline=None)
@given(st.lists(
    st.tuples(coords, coords, coords), min_size=1, max_size=40,
))
def test_bpf_interleave_equivalence(pts):
    """The same point set encoded point-major decodes identically to a
    hand-built dim-major / byte-major layout of the same float32s."""
    n = len(pts)
    arr = np.array(pts, dtype="<f4")  # (n, 3)
    labels = ("X", "Y", "Z")
    header = dict(
        version=3, data_offset=0, n_dims=3, compression=0, n_points=n,
        xform=(1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0,
               0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0),
        dim_labels=labels, dim_offsets=(0.0, 0.0, 0.0),
    )
    h_pm = bpf.BpfHeader(interleave=bpf.POINT_MAJOR, **header)
    h_dm = bpf.BpfHeader(interleave=bpf.DIM_MAJOR, **header)
    h_bm = bpf.BpfHeader(interleave=bpf.BYTE_MAJOR, **header)
    pm = arr.tobytes()
    dm = arr.T.copy().tobytes()
    bm = arr.T.copy().view(np.uint8).reshape(3, n, 4) \
        .transpose(0, 2, 1).copy().tobytes()
    a = bpf._values_to_frame(bpf._slice_values(pm, h_pm, 0, n), h_pm)
    b = bpf._values_to_frame(bpf._slice_values(dm, h_dm, 0, n), h_dm)
    c = bpf._values_to_frame(bpf._slice_values(bm, h_bm, 0, n), h_bm)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, c)

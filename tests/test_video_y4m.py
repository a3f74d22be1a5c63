"""Real y4m video decode path — codec laws + frame dhash."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pdal_spark.datapipe import multimodal as mm


def test_y4m_roundtrip_exact():
    frames = (np.arange(4 * 6 * 8).reshape(4, 6, 8) * 37 % 256).astype(
        np.uint8
    )
    buf = mm.encode_y4m(frames, fps_num=25, fps_den=1)
    w, h, fn, fd, got = mm.decode_y4m(buf)
    assert (w, h, fn, fd) == (8, 6, 25, 1)
    assert (got == frames).all()


def test_y4m_rejects_garbage():
    with pytest.raises(ValueError):
        mm.decode_y4m(b"RIFF....not a video")
    with pytest.raises(ValueError):
        mm.decode_y4m(b"YUV4MPEG2 W4 H4 F30:1\nNOPE\n" + b"\0" * 24)


def test_y4m_empty_stream():
    buf = "YUV4MPEG2 W4 H4 F30:1 C420\n".encode()
    w, h, fn, fd, frames = mm.decode_y4m(buf)
    assert frames.shape == (0, 4, 4)


def test_video_meta_kernel(spark):
    df = mm.synth_y4m_docs(spark, 8, w=10, h=8, n_frames=6)
    out = mm.decode_video_meta_real(df).select(
        "doc_id", "video_meta.*"
    ).collect()
    for r in out:
        assert (r.width, r.height, r.fps_num, r.fps_den) == (10, 8, 30, 1)
        assert r.n_frames == 6
        assert r.byte_len == 36 + 6 * (6 + 80 + 2 * 20)
        # closed-form mean luma
        ff, yy, xx = np.mgrid[0:6, 0:8, 0:10]
        exp = ((xx * 7 + yy * 13 + ff * 5 + r.doc_id) % 256).mean()
        assert abs(r.mean_luma - exp) < 1e-12


def test_frame_dhash_matches_image_dhash_on_same_gray(spark):
    """A video frame and a 3-channel image whose channel SUM equals
    3x the luma produce related hashes via the same comparison law —
    pin directly: frame dhash == numpy reference of the documented
    law (resample -> neighbor compare -> packed bits)."""
    df = mm.synth_y4m_docs(spark, 5, w=10, h=8, n_frames=4)
    out = {
        (r.id, r.frame_idx): r.dhash
        for r in mm.video_frame_dhash(df, every_n=2).collect()
    }
    assert set(f for _, f in out) == {0, 2}
    for (i, f), got in out.items():
        yy, xx = np.mgrid[0:8, 0:10]
        luma = (xx * 7 + yy * 13 + f * 5 + i) % 256
        xi = np.arange(9) * 10 // 9
        gray = luma[:, xi].astype(np.int64)
        bits = (gray[:, :-1] > gray[:, 1:]).flatten()
        h64 = 0
        for idx in np.nonzero(bits)[0]:
            h64 |= 1 << int(idx)
        if h64 >= 1 << 63:
            h64 -= 1 << 64
        assert got == h64


def test_video_near_dup_via_banded_join(spark):
    """Sampled frame hashes feed the existing banded Hamming join:
    videos i and i+256 are pixel-identical -> every sampled frame
    collides at hamming 0."""
    from pdal_spark.datapipe.dedup import simhash_pairs
    from pyspark.sql import functions as F

    df = mm.synth_y4m_docs(spark, 300, w=10, h=8, n_frames=4)
    sig = mm.video_frame_dhash(df, every_n=2).select(
        (F.col("id") * 10 + F.col("frame_idx")).alias("id"),
        F.col("dhash").alias("simhash"),
    )
    pairs = {
        (r.id1, r.id2)
        for r in simhash_pairs(sig, max_hamming=0, bits=64).collect()
    }
    for i in range(300 - 256):
        for f in (0, 2):
            assert (i * 10 + f, (i + 256) * 10 + f) in pairs

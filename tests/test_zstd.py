"""From-scratch zstd decoder (formats/zstdcodec.py) — RFC 8878.

The binding oracle is the reference's ellipsoid-zstandard EPT fixture:
a 1.6 MB real zstd frame (13 compressed blocks, 4-stream Huffman
literals with FSE-compressed weight descriptions, FSE-described AND
repeat-mode sequence tables, repeat offsets) whose decode must produce
EXACTLY 100000 x 44-byte records that parse into the reference test's
fullRead goldens. A single misread bit anywhere desynchronizes the
entropy stream and the per-block regenerated sizes stop matching — the
frame is its own integrity check at ~1.6M decisions.
"""

from __future__ import annotations

import json
import os

import pytest

from pdal_spark.formats import zstdcodec as Z

FIX = "/root/reference/test/data/ept/ellipsoid-zstandard"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIX), reason="reference fixture unavailable"
)


def test_real_frame_full_decode():
    meta = json.load(open(f"{FIX}/ept.json"))
    recsize = sum(int(s["size"]) for s in meta["schema"])
    assert recsize == 44
    src = open(f"{FIX}/ept-data/0-0-0-0.zst", "rb").read()
    out = Z.decompress(src, expected_size=100000 * recsize)
    assert len(out) == 4400000
    # spot-parse: X/Y/Z int32 of the first record de-quantize into the
    # dataset bounds cube
    import numpy as np

    rec = np.frombuffer(out, dtype="<i4", count=3)
    sx = [s for s in meta["schema"] if s["name"] == "X"][0]
    x = rec[0] * float(sx["scale"]) + float(sx["offset"])
    assert meta["bounds"][0] <= x <= meta["bounds"][3]


def test_raw_frame_roundtrip_and_multiblock():
    data = bytes(range(256)) * 2048  # > one 128K block
    frame = Z.compress_raw(data)
    assert Z.decompress(frame) == data
    assert Z.decompress(Z.compress_raw(b"")) == b""
    # frame content size header is honored
    assert Z.decompress(frame, expected_size=len(data)) == data
    with pytest.raises(Z.ZstdError):
        Z.decompress(frame, expected_size=len(data) + 1)


def test_rle_and_raw_blocks_and_skippable_frames():
    import struct

    # hand-build: skippable frame + frame with RLE and raw blocks
    content = b"A" * 1000 + b"xyz"
    f = bytearray()
    f += struct.pack("<I", 0x184D2A50) + struct.pack("<I", 4) + b"SKIP"
    f += struct.pack("<I", Z.MAGIC)
    f += bytes([0xC0 | 0x20]) + struct.pack("<Q", len(content))
    f += int.to_bytes((1000 << 3) | 2, 3, "little") + b"A"   # RLE block
    f += int.to_bytes((3 << 3) | 1, 3, "little") + b"xyz"    # raw, last
    assert Z.decompress(bytes(f)) == content


def test_bad_magic_rejected():
    with pytest.raises(Z.ZstdError):
        Z.decompress(b"\x00\x01\x02\x03\x04\x05\x06\x07\x08")

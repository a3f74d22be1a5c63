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
    out = Z.decompress_pure(src, expected_size=100000 * recsize)
    # the libzstd fast path (when present) must agree byte for byte
    assert Z.decompress(src, expected_size=100000 * recsize) == out
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


def test_dictionary_frame_rejected():
    import struct

    # single-segment frame with dict_flag=1 and a nonzero dictionary id:
    # decoding without the dictionary would silently yield wrong bytes
    f = struct.pack("<I", Z.MAGIC)
    f += bytes([0x20 | 0x01])  # single_segment, 1-byte FCS, dict_flag=1
    f += bytes([5])            # dictionary id 5
    f += bytes([0])            # frame content size 0
    f += int.to_bytes((0 << 3) | 1, 3, "little")  # empty raw last block
    with pytest.raises(Z.ZstdError, match="dictionary"):
        Z.decompress_pure(bytes(f))
    with pytest.raises(Z.ZstdError):
        Z.decompress(bytes(f))


def test_degenerate_fse_weights_bounded():
    """A crafted Huffman-weights FSE table where one symbol owns the
    whole state space makes every update read 0 bits — the weights loop
    must raise instead of spinning forever (ADVICE r4)."""
    # accuracy_log=5 (4 bits 0), then a 6-bit all-ones field decodes to
    # probability 32 == table size for symbol 0; enough tail bytes that
    # the two state-init reads leave bb.pos >= 0 (the would-be spin)
    payload = bytes([0xF0, 0x03, 0x00, 0x00, 0x01])
    with pytest.raises(Z.ZstdError, match="overrun"):
        Z._read_huffman_weights(bytes([len(payload)]) + payload)


def test_rle_literals_large_run_header():
    """>=4096-byte all-same literal runs must use the 20-bit RLE size
    header (the 12-bit header would silently truncate)."""
    run = b"Q" * 5000
    enc = Z._encode_literals(run)
    assert enc[0] & 3 == 1          # literals type RLE
    assert (enc[0] >> 2) & 3 == 3   # size_format 3 (20-bit)
    n = (enc[0] >> 4) | (enc[1] << 4) | (enc[2] << 12)
    assert n == 5000 and enc[3] == ord("Q")


def test_independent_producer_tar_zst():
    """A real .tar.zst from a different producer (conda's libarchive
    test archive) decodes into a valid tar with the expected member."""
    import io
    import tarfile

    p = ("/root/miniconda/pkgs/libarchive-3.8.2-h3ec8f01_0/info/recipe/"
         "test-archives/hello_world.tar.zst")
    if not os.path.exists(p):
        pytest.skip("archive unavailable")
    out = Z.decompress(open(p, "rb").read())
    tf = tarfile.open(fileobj=io.BytesIO(out))
    member = tf.extractfile("hello_world/greets").read()
    assert member == b"hello world\n"


def _find_libzstd():
    import glob

    for pat in ("/root/miniconda/pkgs/zstd-*/lib/libzstd.so.1",
                "/usr/lib/x86_64-linux-gnu/libzstd.so.1"):
        hits = glob.glob(pat)
        if hits:
            return hits[0]
    return None


@pytest.mark.skipif(_find_libzstd() is None, reason="no libzstd on box")
def test_differential_fuzz_vs_libzstd():
    """Differential oracle: REAL libzstd compresses adversarial inputs
    (random bytes, long repeats, short-period cycles, low-entropy runs,
    structured ints, empty) at levels 1/3/9/19; our decoder must
    reproduce every input exactly. Covers all literals/sequence/table
    modes the encoder emits across levels."""
    import ctypes
    import random
    import struct as st

    lib = ctypes.CDLL(_find_libzstd())
    lib.ZSTD_compress.restype = ctypes.c_size_t
    lib.ZSTD_compressBound.restype = ctypes.c_size_t
    lib.ZSTD_isError.restype = ctypes.c_uint

    def zc(data, level):
        bound = lib.ZSTD_compressBound(len(data))
        dst = ctypes.create_string_buffer(bound)
        n = lib.ZSTD_compress(dst, bound, data, len(data), level)
        assert not lib.ZSTD_isError(n)
        return dst.raw[:n]

    rng = random.Random(42)
    for trial in range(30):
        kind = trial % 6
        n = rng.randint(0, 200000)
        if kind == 0:
            data = bytes(rng.randrange(256) for _ in range(min(n, 5000)))
        elif kind == 1:
            data = (b"the quick brown fox " * 500)[:n]
        elif kind == 2:
            w = bytes(rng.randrange(256)
                      for _ in range(rng.randint(2, 40)))
            data = (w * (n // max(len(w), 1) + 1))[:n]
        elif kind == 3:
            data = bytes([rng.choice([0, 1, 255])
                          for _ in range(min(n, 30000))])
        elif kind == 4:
            data = b"".join(st.pack("<I", i * rng.randint(1, 5))
                            for i in range(min(n, 20000)))
        else:
            data = b""
        for level in (1, 3, 9, 19):
            frame = zc(data, level)
            # the PURE decoder is the differential subject; the fast
            # dispatch must agree with it
            assert Z.decompress_pure(frame) == data, (trial, level)
            assert Z.decompress(frame) == data, (trial, level)


def test_encoder_roundtrip_and_ratio():
    """compress() -> decompress() identity over adversarial shapes,
    with genuine compression on compressible input."""
    import random

    rng = random.Random(5)
    src_file = open("/root/repo/pdal_spark/formats/zstdcodec.py",
                    "rb").read()
    cases = [
        b"", b"x", b"hello world\n" * 400,
        bytes(rng.randrange(256) for _ in range(5000)),
        b"abcabcabd" * 3000, src_file,
    ]
    for data in cases:
        frame = Z.compress(data)
        assert Z.decompress(frame) == data
    assert len(Z.compress(src_file)) < len(src_file) // 2


@pytest.mark.skipif(_find_libzstd() is None, reason="no libzstd on box")
def test_encoder_conformance_vs_libzstd():
    """The acid test: REAL libzstd must accept and exactly decode the
    frames our encoder produces — spec conformance judged by the
    canonical implementation, not just by our own decoder."""
    import ctypes
    import random

    lib = ctypes.CDLL(_find_libzstd())
    lib.ZSTD_decompress.restype = ctypes.c_size_t
    lib.ZSTD_isError.restype = ctypes.c_uint

    def zd(frame, n):
        dst = ctypes.create_string_buffer(max(n, 1))
        r = lib.ZSTD_decompress(dst, n, frame, len(frame))
        assert not lib.ZSTD_isError(r)
        return dst.raw[:r]

    rng = random.Random(11)
    for t in range(20):
        kind = t % 5
        n = rng.randint(0, 150000)
        if kind == 0:
            d = bytes(rng.randrange(256) for _ in range(min(n, 8000)))
        elif kind == 1:
            d = (b"lorem ipsum dolor sit amet " * 6000)[:n]
        elif kind == 2:
            w = bytes(rng.randrange(250)
                      for _ in range(rng.randint(3, 50)))
            d = (w * (n // max(len(w), 1) + 1))[:n]
        elif kind == 3:
            d = bytes([rng.choice([65, 66])
                       for _ in range(min(n, 20000))])
        else:
            d = bytes(rng.randrange(16) for _ in range(min(n, 30000)))
        assert zd(Z.compress(d), len(d)) == d, (t, len(d))

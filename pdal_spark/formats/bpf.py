"""BPF (Binary Point Format v3) I/O, Spark-distributed.

Re-expresses ``readers.bpf`` / ``writers.bpf`` (``io/BpfReader.cpp``,
``io/BpfHeader.cpp``) for BPF v3:

* header: magic ``BPF!`` + 4-char version, then
  len/numDim/interleave/compression/numPts/coordType/coordId/spacing,
  a 4x4 Mueller transform (16 f8), start/end time
  (``BpfHeader::readV3``); per-dim f8 offset/min/max arrays and 32-byte
  labels (``BpfDimension::read``); point data starts at the absolute
  ``len`` offset.
* values are float32; true value = ``f + dim.m_offset``
  (``BpfReader.cpp:360`` and siblings).
* the Mueller transform applies to X/Y/Z only, and the reference
  updates IN PLACE — y is computed from the already-transformed x, z
  from both (``BpfMuellerMatrix::apply``, BpfHeader.hpp:81-93). That
  sequential quirk is replicated exactly (identity matrices, the
  common case, are unaffected).
* three interleaves (``seekPointMajor/seekDimMajor/seekByteMajor``,
  BpfReader.cpp:612-633): point-major records, dim-major columns, and
  byte-segregated (dim-major at byte granularity — byte b of every
  point's float, per dim).
* zlib compression: the data block is a sequence of
  ``[u32 finalBytes][u32 compressedBytes][deflate bytes]`` frames
  (``BpfReader::readBlock``). FastLZ/QuickLZ are not available in this
  environment and raise.

Scale shape: uncompressed files read chunk-parallel over point ranges
(dim-major costs n_dims seeks per chunk, byte-major 4*n_dims — all
contiguous slice reads). Compressed files inflate once per file
(single task — the frame chain is inherently sequential, as in the
reference). The writer emits point-major uncompressed with auto
per-dim offsets (min), streaming executor-encoded blocks through the
driver like the LAS writer.
"""

from __future__ import annotations

import os
import struct
import zlib
from dataclasses import dataclass
from typing import Iterable, Iterator, Optional, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"BPF!"
POINT_MAJOR, DIM_MAJOR, BYTE_MAJOR = 1, 0, 2
_FIXED = struct.Struct("<iBBBBiiif")


@dataclass(frozen=True)
class BpfHeader:
    version: int
    data_offset: int  # m_len — absolute offset of point data
    n_dims: int
    interleave: int
    compression: int
    n_points: int
    xform: tuple  # 16 doubles, row-major
    dim_labels: tuple
    dim_offsets: tuple


def parse_header(buf: bytes) -> BpfHeader:
    if buf[:4] != MAGIC:
        raise ValueError("not a BPF v3 file (missing 'BPF!' magic)")
    version = int(buf[4:8].decode("ascii"))
    (m_len, num_dim, interleave, compression, _dummy, num_pts, _ctype,
     _cid, _spacing) = _FIXED.unpack_from(buf, 8)
    if interleave not in (0, 1, 2):
        raise ValueError("Invalid BPF file: unknown interleave type.")
    pos = 8 + _FIXED.size
    xform = struct.unpack_from("<16d", buf, pos)
    pos += 128 + 16  # xform + startTime/endTime
    offsets = struct.unpack_from(f"<{num_dim}d", buf, pos)
    pos += 8 * num_dim
    pos += 16 * num_dim  # mins + maxs (metadata only)
    labels = []
    for _ in range(num_dim):
        raw = buf[pos: pos + 32]
        labels.append(raw.split(b"\0", 1)[0].decode("ascii", "replace").strip())
        pos += 32
    if not {"X", "Y", "Z"} <= set(labels):
        raise ValueError(
            "BPF file missing at least one of X, Y or Z dimensions."
        )
    return BpfHeader(
        version=version, data_offset=m_len, n_dims=num_dim,
        interleave=interleave, compression=compression, n_points=num_pts,
        xform=xform, dim_labels=tuple(labels), dim_offsets=tuple(offsets),
    )


def read_header(path: str) -> BpfHeader:
    with open(path, "rb") as f:
        return parse_header(f.read(65536))


def _colname(label: str) -> str:
    if label in ("X", "Y", "Z"):
        return label.lower()
    return label.strip().replace(" ", "_")


def spark_schema(h: BpfHeader) -> T.StructType:
    return T.StructType(
        [T.StructField(_colname(l), T.DoubleType()) for l in h.dim_labels]
    )


def _apply_xform(h: BpfHeader, cols: dict) -> None:
    """BpfMuellerMatrix::apply — sequential in-place update quirk."""
    m = h.xform
    if m == (1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0,
             0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0):
        return
    x, y, z = cols["x"], cols["y"], cols["z"]
    w = x * m[12] + y * m[13] + z * m[14] + m[15]
    x = (x * m[0] + y * m[1] + z * m[2] + m[3]) / w
    y = (x * m[4] + y * m[5] + z * m[6] + m[7]) / w  # uses updated x
    z = (x * m[8] + y * m[9] + z * m[10] + m[11]) / w  # updated x AND y
    cols["x"], cols["y"], cols["z"] = x, y, z


def _values_to_frame(vals: np.ndarray, h: BpfHeader) -> pd.DataFrame:
    """(n_dims, n) float32 -> de-offset doubles + xform."""
    cols = {}
    for i, label in enumerate(h.dim_labels):
        cols[_colname(label)] = vals[i].astype(np.float64) + h.dim_offsets[i]
    _apply_xform(h, cols)
    return pd.DataFrame(cols)


def _inflate_file(path: str, h: BpfHeader) -> bytes:
    """Concatenate the [final][compressed][data] frame chain
    (BpfReader::readBlock)."""
    total = h.n_points * h.n_dims * 4
    out = bytearray()
    with open(path, "rb") as f:
        f.seek(h.data_offset)
        while len(out) < total:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            final_bytes, comp_bytes = struct.unpack("<II", hdr)
            blob = f.read(comp_bytes)
            try:
                out += zlib.decompress(blob)
            except zlib.error:
                try:
                    out += zlib.decompress(blob, -15)  # raw deflate
                except zlib.error:
                    raise NotImplementedError(
                        f"{path}: BPF compression mode "
                        f"{h.compression} is not zlib (FastLZ/QuickLZ "
                        "codecs unavailable in this environment)"
                    )
    return bytes(out)


def _slice_values(raw_or_path, h: BpfHeader, start: int, cnt: int) -> np.ndarray:
    """(n_dims, cnt) float32 for points [start, start+cnt) using the
    interleave's seek formulas (BpfReader.cpp:612-633)."""
    n = h.n_points
    nd = h.n_dims
    vals = np.empty((nd, cnt), dtype="<f4")
    if isinstance(raw_or_path, (bytes, bytearray)):
        base = 0

        def read_at(off: int, nbytes: int) -> bytes:
            return bytes(raw_or_path[off: off + nbytes])
    else:
        base = h.data_offset
        fh = open(raw_or_path, "rb")

        def read_at(off: int, nbytes: int) -> bytes:
            fh.seek(off)
            return fh.read(nbytes)
    try:
        if h.interleave == POINT_MAJOR:
            raw = read_at(base + start * 4 * nd, cnt * 4 * nd)
            vals[:] = np.frombuffer(raw, dtype="<f4").reshape(cnt, nd).T
        elif h.interleave == DIM_MAJOR:
            for d in range(nd):
                raw = read_at(base + 4 * d * n + 4 * start, cnt * 4)
                vals[d] = np.frombuffer(raw, dtype="<f4", count=cnt)
        else:  # BYTE_MAJOR
            bb = np.empty((4, cnt), dtype=np.uint8)
            for d in range(nd):
                for b in range(4):
                    raw = read_at(base + d * n * 4 + b * n + start, cnt)
                    bb[b] = np.frombuffer(raw, dtype=np.uint8, count=cnt)
                vals[d] = bb.T.copy().view("<f4")[:, 0]
        return vals
    finally:
        if not isinstance(raw_or_path, (bytes, bytearray)):
            fh.close()


def read_bpf(
    spark: SparkSession,
    paths: Sequence[str] | str,
    chunk_points: int = 1_000_000,
) -> DataFrame:
    """Distributed BPF reader; uncompressed files chunk-split, zlib
    files inflate whole-file in their task."""
    if isinstance(paths, str):
        paths = [paths]
    chunks = []
    first: Optional[BpfHeader] = None
    for p in paths:
        h = read_header(p)
        if first is None:
            first = h
        elif h.dim_labels != first.dim_labels:
            raise ValueError("mixed BPF schemas in one read")
        if h.compression:
            chunks.append((p, 0, h.n_points))
        else:
            start = 0
            while start < h.n_points:
                cnt = min(chunk_points, h.n_points - start)
                chunks.append((p, start, cnt))
                start += cnt
    if first is None:
        raise ValueError("no input files")
    schema = spark_schema(first)
    chunk_df = spark.createDataFrame(chunks, "path string, start long, count long")
    sp = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    chunk_df = chunk_df.repartition(min(max(len(chunks), 1), max(sp, 1)))

    def _decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, start, cnt in pdf.itertuples(index=False):
                h = read_header(path)
                if h.compression:
                    raw = _inflate_file(path, h)
                    vals = _slice_values(raw, h, int(start), int(cnt))
                else:
                    vals = _slice_values(path, h, int(start), int(cnt))
                yield _values_to_frame(vals, h)

    return chunk_df.mapInPandas(_decode, schema=schema)


# ---------------------------------------------------------------------------
# writer (point-major, uncompressed, auto per-dim offsets)
# ---------------------------------------------------------------------------


def write_bpf(df: DataFrame, path: str) -> dict:
    """Single-file BPF v3 writer: point-major, zero compression, auto
    per-dim offset = column min (the reference's 'auto' offset mode —
    float32 storage keeps sub-unit precision only near the offset)."""
    cols = [f.name for f in df.schema.fields]
    for need in ("x", "y", "z"):
        if need not in cols:
            raise ValueError(f"write_bpf requires column {need!r}")
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    row = df.agg(*aggs).collect()[0]
    offsets = [float(row[f"min_{c}"]) for c in cols]
    mins = offsets
    maxs = [float(row[f"max_{c}"]) for c in cols]

    def _encode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            vals = np.empty((len(pdf), len(cols)), dtype="<f4")
            for i, c in enumerate(cols):
                vals[:, i] = (
                    np.asarray(pdf[c], dtype=np.float64) - offsets[i]
                ).astype("<f4")
            yield pd.DataFrame({"blob": [vals.tobytes()], "n": [len(pdf)]})

    blocks = df.mapInPandas(_encode, schema="blob binary, n long")
    n_dims = len(cols)
    header_len = 8 + _FIXED.size + 128 + 16 + n_dims * (24 + 32)
    tmp = path + ".tmp"
    count = 0
    with open(tmp, "wb") as out:
        out.write(b"\0" * header_len)
        for r in blocks.toLocalIterator():
            out.write(bytes(r.blob))
            count += r.n
    buf = bytearray(header_len)
    buf[0:4] = MAGIC
    buf[4:8] = b"0003"
    _FIXED.pack_into(buf, 8, header_len, n_dims, POINT_MAJOR, 0, 0,
                     count, 0, 0, 0.0)
    pos = 8 + _FIXED.size
    identity = (1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0,
                0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0)
    struct.pack_into("<16d", buf, pos, *identity)
    pos += 128 + 16
    struct.pack_into(f"<{n_dims}d", buf, pos, *offsets)
    pos += 8 * n_dims
    struct.pack_into(f"<{n_dims}d", buf, pos, *[m - o for m, o in zip(mins, offsets)])
    pos += 8 * n_dims
    struct.pack_into(f"<{n_dims}d", buf, pos, *[m - o for m, o in zip(maxs, offsets)])
    pos += 8 * n_dims
    for c in cols:
        label = c.upper() if c in ("x", "y", "z") else c
        raw = label.encode("ascii")[:32]
        buf[pos: pos + len(raw)] = raw
        pos += 32
    with open(tmp, "r+b") as out:
        out.write(bytes(buf))
    os.replace(tmp, path)
    return {"count": count, "path": path, "dims": cols}

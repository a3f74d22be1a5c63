"""ASPRS LAS point-cloud format I/O, Spark-distributed.

Re-expresses the reference's ``readers.las`` / ``writers.las``
(``io/LasReader.cpp``, ``io/LasWriter.cpp``, ``io/LasHeader.cpp``) for
uncompressed LAS 1.0-1.4, point formats 0-3 and 6-8.  Semantics parity:

* header layout + parse order: ``LasHeader.cpp:329-409`` (operator>>) —
  legacy u32 count at 107, 5x u32 by-return at 111, scales/offsets at
  131/155, max/min interleaved at 179, 1.3 waveform u64, 1.4 EVLR + u64
  counts; compression = high bit of the point-format byte
  (``LasHeader.cpp:352-355``).
* point decode: ``LasReader.cpp loadPointV10/loadPointV14`` — int32 XYZ
  de-quantized ``i * scale + offset``; v10 flag byte splits 3/3/1/1
  (return / numreturns / scandir / edge); v14 returnInfo splits 4/4 and
  the flag byte packs classflags/channel/scandir/edge 4/2/1/1; v14
  ScanAngleRank = ``scan_angle * .006`` (``LasReader.cpp`` V14 unpack).
* point encode: ``LasWriter.cpp:1033-1147 fillPointBuf`` — XYZ quantized
  ``(v - offset) / scale`` (``pdal_types.hpp:123 XForm::toScaled``) then
  rounded half-away-from-zero (``Utils.hpp:152 sround``) with an int32
  range check (``numericCast``; overflow raises, matching
  "Unable to convert scaled value"); v10 writes scan_angle_rank BEFORE
  user_data, v14 the reverse with ``round(angle / .006f)`` as int16;
  return_number/number_of_returns default to 1 when absent, everything
  else to 0.
* header synthesis on write: ``LasHeader.cpp:70-96 (setSummary)`` —
  point count, per-return counts (1-indexed return numbers clamped to 5
  legacy / 15 extended slots), and the UNQUANTIZED xyz bounds from the
  summary data (``LasSummaryData``), creation DOY/year pinned to 0 for
  byte determinism (simple.las ships 0/0 — LasReaderTest.cpp:100-101).

Scale shape (100 TB): reading is chunk-parallel — the driver touches ONLY
the fixed-size header of each file, then fans out (path, start, count)
chunk rows so a single huge .las splits across many tasks, each doing one
seek + one contiguous read + one vectorized ``np.frombuffer`` decode.
No whole-file bytes ever pass through the driver or a single task.
Writing is per-group parallel (one .las per group via applyInPandas, a
FlexWriter ``#`` analog — ``FlexWriter.hpp``) with a manifest DataFrame;
the single-file mode streams encoded partition blocks through the driver
in order (parity/interop path, not the scale path).
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
from dataclasses import dataclass
from typing import Iterable, Iterator, Optional, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FILE_SIGNATURE = b"LASF"
#: header size by version minor (LasHeader::versionAtLeast ladders)
HEADER_SIZE = {0: 227, 1: 227, 2: 227, 3: 235, 4: 375}
#: uncompressed record length by point format (LAS spec / Laszip.hpp)
POINT_LEN = {0: 20, 1: 28, 2: 26, 3: 34, 6: 30, 7: 36, 8: 38}
#: LasHeader::pointFormatSupported — no waveform formats (4,5,9,10)
SUPPORTED_FORMATS = (0, 1, 2, 3, 6, 7, 8)
LEGACY_RETURN_COUNT = 5  # LasHeader.hpp:69
RETURN_COUNT = 15  # LasHeader.hpp:70


def _has_time(fmt: int) -> bool:
    """LasHeader::hasTime — f == 1 or f >= 3 (LasHeader.hpp:317-321)."""
    return fmt == 1 or fmt >= 3


def _has_color(fmt: int) -> bool:
    """LasHeader::hasColor (LasHeader.hpp:323-327)."""
    return fmt in (2, 3, 5, 7, 8, 10)


def _has_infrared(fmt: int) -> bool:
    return fmt == 8


def _has14(fmt: int) -> bool:
    """LasHeader::has14Format — f > 5 (LasHeader.hpp:341-345)."""
    return fmt > 5


@dataclass(frozen=True)
class LasHeader:
    """Parsed LAS public header block (the fields the engine consumes)."""

    version_minor: int
    point_format: int
    point_len: int
    point_offset: int
    point_count: int
    scales: tuple  # (sx, sy, sz)
    offsets: tuple  # (ox, oy, oz)
    mins: tuple  # (minx, miny, minz)
    maxs: tuple
    counts_by_return: tuple
    compressed: bool
    header_size: int
    source_id: int = 0
    global_encoding: int = 0
    creation_doy: int = 0
    creation_year: int = 0


def parse_header(buf: bytes) -> LasHeader:
    """Parse the public header block (LasHeader.cpp:329-409 field order)."""
    if buf[:4] != FILE_SIGNATURE:
        # LasHeader.cpp:336-338
        raise ValueError("File signature is not 'LASF', is this an LAS/LAZ file?")
    (source_id, global_enc) = struct.unpack_from("<HH", buf, 4)
    version_major, version_minor = struct.unpack_from("<BB", buf, 24)
    (doy, year, vlr_offset, point_offset, _vlr_count, raw_fmt, point_len,
     legacy_count) = struct.unpack_from("<HHHIIBHI", buf, 90)
    # high bits flag laszip compression (LasHeader.cpp:352-355)
    compressed = bool(raw_fmt & 0x80)
    fmt = raw_fmt & ~0xC0
    by_return = list(struct.unpack_from("<5I", buf, 111))
    sx, sy, sz = struct.unpack_from("<3d", buf, 131)
    ox, oy, oz = struct.unpack_from("<3d", buf, 155)
    # max/min interleaved per axis (LasHeader.cpp:367-372)
    maxx, minx, maxy, miny, maxz, minz = struct.unpack_from("<6d", buf, 179)
    count = legacy_count
    if version_major == 1 and version_minor >= 4:
        # skip waveform offset (u64 @227), EVLR offset/count @235/243
        (count,) = struct.unpack_from("<Q", buf, 247)
        by_return = list(struct.unpack_from("<15Q", buf, 255))
        if count == 0:
            count = legacy_count
    return LasHeader(
        version_minor=version_minor,
        point_format=fmt,
        point_len=point_len,
        point_offset=point_offset,
        point_count=count,
        scales=(sx, sy, sz),
        offsets=(ox, oy, oz),
        mins=(minx, miny, minz),
        maxs=(maxx, maxy, maxz),
        counts_by_return=tuple(by_return),
        compressed=compressed,
        header_size=vlr_offset,
        source_id=source_id,
        global_encoding=global_enc,
        creation_doy=doy,
        creation_year=year,
    )


def read_header(path: str) -> LasHeader:
    """Read just the fixed-size public header from a file (driver-side)."""
    with open(path, "rb") as f:
        return parse_header(f.read(375))


# ---------------------------------------------------------------------------
# record dtypes
# ---------------------------------------------------------------------------


def _record_dtype(fmt: int) -> np.dtype:
    """Little-endian packed record layout per point format."""
    if fmt <= 3:
        fields = [
            ("X", "<i4"), ("Y", "<i4"), ("Z", "<i4"),
            ("intensity", "<u2"), ("flags", "u1"), ("classification", "u1"),
            ("scan_angle_rank", "i1"), ("user_data", "u1"),
            ("point_source_id", "<u2"),
        ]
        if _has_time(fmt):
            fields.append(("gps_time", "<f8"))
        if _has_color(fmt):
            fields += [("red", "<u2"), ("green", "<u2"), ("blue", "<u2")]
    else:
        fields = [
            ("X", "<i4"), ("Y", "<i4"), ("Z", "<i4"),
            ("intensity", "<u2"), ("return_info", "u1"), ("flags", "u1"),
            ("classification", "u1"), ("user_data", "u1"),
            ("scan_angle", "<i2"), ("point_source_id", "<u2"),
            ("gps_time", "<f8"),
        ]
        if _has_color(fmt):
            fields += [("red", "<u2"), ("green", "<u2"), ("blue", "<u2")]
        if _has_infrared(fmt):
            fields.append(("infrared", "<u2"))
    dt = np.dtype(fields)
    assert dt.itemsize == POINT_LEN[fmt], (fmt, dt.itemsize)
    return dt


def spark_schema(fmt: int) -> T.StructType:
    """Output schema for a given point format (PDAL dim registry subset)."""
    f: list = [
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
        T.StructField("intensity", T.IntegerType()),
        T.StructField("return_number", T.IntegerType()),
        T.StructField("number_of_returns", T.IntegerType()),
        T.StructField("scan_direction_flag", T.IntegerType()),
        T.StructField("edge_of_flight_line", T.IntegerType()),
        T.StructField("classification", T.IntegerType()),
        T.StructField("scan_angle_rank", T.DoubleType()),
        T.StructField("user_data", T.IntegerType()),
        T.StructField("point_source_id", T.IntegerType()),
    ]
    if _has14(fmt):
        f += [
            T.StructField("class_flags", T.IntegerType()),
            T.StructField("scan_channel", T.IntegerType()),
        ]
    if _has_time(fmt):
        f.append(T.StructField("gps_time", T.DoubleType()))
    if _has_color(fmt):
        f += [
            T.StructField("red", T.IntegerType()),
            T.StructField("green", T.IntegerType()),
            T.StructField("blue", T.IntegerType()),
        ]
    if _has_infrared(fmt):
        f.append(T.StructField("infrared", T.IntegerType()))
    return T.StructType(f)


def decode_records(raw: bytes, header: LasHeader) -> pd.DataFrame:
    """Vectorized decode of packed point records -> pandas frame.

    LasReader.cpp loadPointV10 / loadPointV14 semantics (raw,
    non-laszip branch): full classification byte passes through on v10.
    """
    fmt = header.point_format
    dt = _record_dtype(fmt)
    n = len(raw) // header.point_len
    if header.point_len == dt.itemsize:
        rec = np.frombuffer(raw, dtype=dt, count=n)
    else:
        # longer records carry extra-bytes dims (readers.las extra_dims);
        # gather the known prefix of each record, skip the extras
        base = np.frombuffer(raw, dtype=np.uint8)[: n * header.point_len]
        idx = (
            np.arange(n)[:, None] * header.point_len + np.arange(dt.itemsize)
        ).ravel()
        rec = np.frombuffer(base[idx].tobytes(), dtype=dt, count=n)
    sx, sy, sz = header.scales
    ox, oy, oz = header.offsets
    out = {
        "x": rec["X"] * sx + ox,
        "y": rec["Y"] * sy + oy,
        "z": rec["Z"] * sz + oz,
        "intensity": rec["intensity"].astype(np.int32),
        "classification": rec["classification"].astype(np.int32),
        "user_data": rec["user_data"].astype(np.int32),
        "point_source_id": rec["point_source_id"].astype(np.int32),
    }
    if fmt <= 3:
        flags = rec["flags"]
        out["return_number"] = (flags & 0x07).astype(np.int32)
        out["number_of_returns"] = ((flags >> 3) & 0x07).astype(np.int32)
        out["scan_direction_flag"] = ((flags >> 6) & 0x01).astype(np.int32)
        out["edge_of_flight_line"] = ((flags >> 7) & 0x01).astype(np.int32)
        out["scan_angle_rank"] = rec["scan_angle_rank"].astype(np.float64)
    else:
        ri = rec["return_info"]
        flags = rec["flags"]
        out["return_number"] = (ri & 0x0F).astype(np.int32)
        out["number_of_returns"] = ((ri >> 4) & 0x0F).astype(np.int32)
        out["class_flags"] = (flags & 0x0F).astype(np.int32)
        out["scan_channel"] = ((flags >> 4) & 0x03).astype(np.int32)
        out["scan_direction_flag"] = ((flags >> 6) & 0x01).astype(np.int32)
        out["edge_of_flight_line"] = ((flags >> 7) & 0x01).astype(np.int32)
        # LasReader.cpp V14: ScanAngleRank = scan_angle * .006
        out["scan_angle_rank"] = rec["scan_angle"] * 0.006
    if _has_time(fmt):
        out["gps_time"] = rec["gps_time"]
    if _has_color(fmt):
        out["red"] = rec["red"].astype(np.int32)
        out["green"] = rec["green"].astype(np.int32)
        out["blue"] = rec["blue"].astype(np.int32)
    if _has_infrared(fmt):
        out["infrared"] = rec["infrared"].astype(np.int32)
    cols = [fld.name for fld in spark_schema(fmt).fields]
    return pd.DataFrame({c: out[c] for c in cols})


# ---------------------------------------------------------------------------
# distributed reader
# ---------------------------------------------------------------------------


#: output column -> packed-record field (fmt 6-8); columns not listed
#: decode from the mandatory channel/returns/XY layer
_COL_FIELD_14 = {
    "z": "z", "intensity": "intensity",
    "scan_direction_flag": "flags", "edge_of_flight_line": "flags",
    "class_flags": "flags", "classification": "classification",
    "scan_angle_rank": "scan_angle", "user_data": "user_data",
    "point_source_id": "point_source_id", "gps_time": "gps_time",
    "red": "red", "green": "green", "blue": "blue",
    "infrared": "infrared",
}


def read_las(
    spark: SparkSession,
    paths: Sequence[str] | str,
    chunk_points: int = 1_000_000,
    columns: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Distributed LAS reader: header-only driver pass, chunk-parallel decode.

    Every file must share one point format (one fixed output schema —
    PDAL's layout finalization, PointLayout.hpp:58-62).  Each task reads
    one contiguous [start, start+count) record slice: a 100 GB file
    becomes ~100k independent chunks, so parallelism comes from chunk
    count, not file count.

    columns: optional projection.  For LAZ v3 layered files (LAS 1.4,
    compressor 3) this is TRUE pushdown — selective decompression:
    each unwanted field's entropy layer is skipped entirely, not
    decoded-then-dropped (the layered format's reason to exist;
    `ReadSchema`-style pruning reaching a custom format).  For
    uncompressed/v2 files the projection prunes the Arrow batches
    (decode is one vectorized frombuffer either way).
    """
    from pdal_spark.formats import laz as lazmod

    if isinstance(paths, str):
        paths = [paths]
    chunks = []
    fmt: Optional[int] = None
    for p in paths:
        h = read_header(p)
        if h.point_format not in SUPPORTED_FORMATS:
            # LasReader error for waveform formats (LasReader.cpp:684-686)
            raise ValueError(f"Unsupported LAS point format {h.point_format}.")
        if fmt is None:
            fmt = h.point_format
        elif fmt != h.point_format:
            raise ValueError(
                f"mixed point formats in one read ({fmt} vs {h.point_format})"
            )
        if h.compressed:
            # LAZ: the laszip chunk IS the parallel unit (one entropy
            # stream each); extents come from header+chunk-table partial
            # reads only — the driver never touches point data
            _, extents = lazmod.laz_chunk_extents(p, h.point_count)
            for byte_start, byte_len, npts in extents:
                chunks.append((p, byte_start, npts, byte_len))
        else:
            start = 0
            while start < h.point_count:
                cnt = min(chunk_points, h.point_count - start)
                chunks.append((p, start, cnt, -1))
                start += cnt
    if fmt is None:
        raise ValueError("no input files")
    schema = spark_schema(fmt)
    want_fields = None
    if columns is not None:
        names = [f.name for f in schema.fields]
        missing = [c for c in columns if c not in names]
        if missing:
            raise ValueError(
                f"columns {missing} not in point format {fmt} "
                f"schema {names}")
        keep = set(columns)
        schema = T.StructType([f for f in schema.fields
                               if f.name in keep])
        if fmt > 5:
            want_fields = {_COL_FIELD_14[c] for c in keep
                           if c in _COL_FIELD_14}

    chunk_df = spark.createDataFrame(
        chunks, "path string, start long, count long, laz_bytes long"
    )
    n_chunks = len(chunks)
    sp = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    chunk_df = chunk_df.repartition(max(1, min(n_chunks, max(sp, 1))))

    def _decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, start, cnt, laz_bytes in pdf.itertuples(index=False):
                h = read_header(path)
                if int(laz_bytes) >= 0:
                    info = None
                    with open(path, "rb") as f:
                        f.seek(0)
                        head = f.read(h.point_offset)
                        info = lazmod.laz_vlr_info(head)
                        f.seek(int(start))
                        # +8 slack: the arithmetic decoder reads up to
                        # 4 bytes past the last coded symbol
                        buf = f.read(int(laz_bytes) + 8)
                    rec = lazmod.decode_chunk(buf, 0, int(cnt),
                                              info["items"],
                                              want=want_fields)
                    # the item layout IS the packed uncompressed
                    # record layout -> reuse decode_records
                    raw = rec.tobytes()
                else:
                    with open(path, "rb") as f:
                        f.seek(h.point_offset + int(start) * h.point_len)
                        raw = f.read(int(cnt) * h.point_len)
                out = decode_records(raw, h)
                yield out[cols] if cols is not None else out

    cols = [f.name for f in schema.fields] if columns is not None else None
    return chunk_df.mapInPandas(_decode, schema=schema)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _sround(v: np.ndarray) -> np.ndarray:
    """Utils::sround — half away from zero (Utils.hpp:152-153)."""
    return np.where(v > 0.0, np.floor(v + 0.5), np.ceil(v - 0.5))


def _quantize(v: np.ndarray, scale: float, offset: float, dim: str) -> np.ndarray:
    """XForm::toScaled + sround + int32 range check (LasWriter.cpp:1058-1068)."""
    d = _sround((np.asarray(v, dtype=np.float64) - offset) / scale)
    if len(d) and (d.min() < -2147483648.0 or d.max() > 2147483647.0):
        bad = d[(d < -2147483648.0) | (d > 2147483647.0)][0]
        raise ValueError(
            f"Unable to convert scaled value ({bad}) to int32 for "
            f"dimension '{dim}' when writing LAS file."
        )
    return d.astype(np.int32)


def _col(pdf: pd.DataFrame, name: str, default: int) -> np.ndarray:
    if name in pdf.columns:
        return np.asarray(pdf[name])
    return np.full(len(pdf), default)


def encode_records(
    pdf: pd.DataFrame,
    fmt: int,
    scales: Sequence[float],
    offsets: Sequence[float],
) -> bytes:
    """Vectorized fillPointBuf (LasWriter.cpp:1033-1147)."""
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"Unsupported LAS point format {fmt}.")
    n = len(pdf)
    rec = np.zeros(n, dtype=_record_dtype(fmt))
    rec["X"] = _quantize(pdf["x"], scales[0], offsets[0], "X")
    rec["Y"] = _quantize(pdf["y"], scales[1], offsets[1], "Y")
    rec["Z"] = _quantize(pdf["z"], scales[2], offsets[2], "Z")
    rec["intensity"] = _col(pdf, "intensity", 0).astype(np.uint16)
    # fillPointBuf: return numbers default to 1 when the dim is absent
    ret = _col(pdf, "return_number", 1).astype(np.uint8)
    num = _col(pdf, "number_of_returns", 1).astype(np.uint8)
    sdir = _col(pdf, "scan_direction_flag", 0).astype(np.uint8)
    edge = _col(pdf, "edge_of_flight_line", 0).astype(np.uint8)
    rec["classification"] = _col(pdf, "classification", 0).astype(np.uint8)
    rec["user_data"] = _col(pdf, "user_data", 0).astype(np.uint8)
    rec["point_source_id"] = _col(pdf, "point_source_id", 0).astype(np.uint16)
    if fmt <= 3:
        rec["flags"] = ret | (num << 3) | (sdir << 6) | (edge << 7)
        rec["scan_angle_rank"] = _col(pdf, "scan_angle_rank", 0).astype(np.int8)
    else:
        rec["return_info"] = ret | (num << 4)
        cf = _col(pdf, "class_flags", 0).astype(np.uint8)
        ch = _col(pdf, "scan_channel", 0).astype(np.uint8)
        rec["flags"] = (cf & 0x0F) | ((ch & 0x03) << 4) | (sdir << 6) | (edge << 7)
        # LasWriter.cpp:1116-1119: int16 round(angle / .006f)
        ang = np.asarray(_col(pdf, "scan_angle_rank", 0), dtype=np.float32)
        rec["scan_angle"] = np.round(ang / np.float32(0.006)).astype(np.int16)
    if _has_time(fmt):
        rec["gps_time"] = _col(pdf, "gps_time", 0).astype(np.float64)
    if _has_color(fmt):
        rec["red"] = _col(pdf, "red", 0).astype(np.uint16)
        rec["green"] = _col(pdf, "green", 0).astype(np.uint16)
        rec["blue"] = _col(pdf, "blue", 0).astype(np.uint16)
    if _has_infrared(fmt):
        rec["infrared"] = _col(pdf, "infrared", 0).astype(np.uint16)
    return rec.tobytes()


def _return_counts(ret: np.ndarray, slots: int) -> np.ndarray:
    """LasSummaryData::addPoint: per-return histogram, 1-indexed returns."""
    counts = np.zeros(slots, dtype=np.uint64)
    valid = (ret >= 1) & (ret <= slots)
    if valid.any():
        binned = np.bincount(ret[valid].astype(np.int64) - 1, minlength=slots)
        counts += binned[:slots].astype(np.uint64)
    return counts


def make_header(
    fmt: int,
    version_minor: int,
    count: int,
    by_return: np.ndarray,
    scales: Sequence[float],
    offsets: Sequence[float],
    mins: Sequence[float],
    maxs: Sequence[float],
) -> bytes:
    """Serialize the public header block (LasHeader.cpp operator<<)."""
    hsize = HEADER_SIZE[version_minor]
    buf = bytearray(hsize)
    buf[0:4] = FILE_SIGNATURE
    struct.pack_into("<HH", buf, 4, 0, 0x10 if version_minor >= 4 else 0)
    struct.pack_into("<BB", buf, 24, 1, version_minor)
    buf[26:26 + 10] = b"pdal_spark"  # system id (32 bytes, NUL padded)
    buf[58:58 + 10] = b"pdal_spark"  # software id
    legacy_count = count if (fmt <= 5 and count <= 0xFFFFFFFF) else 0
    struct.pack_into(
        "<HHHIIBHI", buf, 90,
        0, 0,  # creation DOY / year pinned (simple.las ships 0/0)
        hsize, hsize,  # header size; point data offset (no VLRs)
        0,  # VLR count
        fmt, POINT_LEN[fmt], legacy_count,
    )
    legacy_ret = by_return[:LEGACY_RETURN_COUNT].astype(np.uint64)
    if legacy_count == 0 and fmt > 5:
        legacy_ret = np.zeros(LEGACY_RETURN_COUNT, dtype=np.uint64)
    struct.pack_into("<5I", buf, 111, *[min(int(c), 0xFFFFFFFF) for c in legacy_ret])
    struct.pack_into("<3d", buf, 131, *scales)
    struct.pack_into("<3d", buf, 155, *offsets)
    struct.pack_into(
        "<6d", buf, 179,
        maxs[0], mins[0], maxs[1], mins[1], maxs[2], mins[2],
    )
    if version_minor >= 4:
        ext = np.zeros(RETURN_COUNT, dtype=np.uint64)
        ext[: len(by_return)] = by_return[:RETURN_COUNT]
        struct.pack_into("<QQI", buf, 227, 0, 0, 0)  # waveform, EVLR off/cnt
        struct.pack_into("<Q", buf, 247, count)
        struct.pack_into("<15Q", buf, 255, *[int(c) for c in ext])
    return bytes(buf)


def write_las(
    df: DataFrame,
    path: str,
    fmt: int = 3,
    scales: Sequence[float] = (0.01, 0.01, 0.01),
    offsets: Sequence[float] = (0.0, 0.0, 0.0),
    version_minor: Optional[int] = None,
    compression: bool = False,
    chunk_size: int = 50000,
    order_by: Optional[Sequence[str]] = None,
) -> dict:
    """Single-file LAS writer (parity/interop mode).

    Point blocks are encoded IN EXECUTORS (mapInPandas) and streamed to
    the driver in partition order via ``toLocalIterator`` — the driver
    never holds more than one encoded block.  Bounds/counts aggregate
    JVM-side in the same pass.  For the scale path use
    :func:`write_las_parts`.

    ``compression=True`` writes LASzip (.laz). Two chunking modes:

    * ``order_by=None`` (default — the scale path): VARIABLE chunking
      (``chunk_size`` U32 in the laszip VLR): every Arrow batch of
      every partition entropy-encodes map-side into its own chunk —
      NO shuffle anywhere; the chunk table records per-chunk point
      counts so boundaries are recovered exactly on read.
    * ``order_by=[cols]`` (interop/parity mode): rows get exact global
      indices (range-partitioned rank over ``order_by``, which must
      totally order them), chunk id = index // chunk_size, every chunk
      exactly chunk_size points like laszip's default layout.

    Either way each chunk encodes IN ITS OWNING TASK (the laszip chunk
    is the parallel unit for the writer exactly as for the reader) and
    the driver streams encoded chunks in order. The encoder is
    byte-identical to real laszip output on the reference fixture
    (tests/test_laz.py).
    """
    if compression:
        return _write_laz(df, path, fmt, scales, offsets,
                          chunk_size, order_by)
    if version_minor is None:
        version_minor = 4 if _has14(fmt) else 2
    if _has14(fmt) and version_minor < 4:
        raise ValueError("point formats 6-8 require LAS 1.4")
    slots = RETURN_COUNT if version_minor >= 4 else LEGACY_RETURN_COUNT

    blk_schema = T.StructType([
        T.StructField("blob", T.BinaryType()),
        T.StructField("n", T.LongType()),
        T.StructField("by_return", T.ArrayType(T.LongType())),
        T.StructField("minx", T.DoubleType()),
        T.StructField("miny", T.DoubleType()),
        T.StructField("minz", T.DoubleType()),
        T.StructField("maxx", T.DoubleType()),
        T.StructField("maxy", T.DoubleType()),
        T.StructField("maxz", T.DoubleType()),
    ])

    def _encode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            blob = encode_records(pdf, fmt, scales, offsets)
            ret = np.asarray(
                pdf["return_number"] if "return_number" in pdf.columns
                else np.ones(len(pdf))
            )
            br = _return_counts(ret, slots)
            yield pd.DataFrame({
                "blob": [blob], "n": [len(pdf)],
                "by_return": [br.astype(np.int64).tolist()],
                "minx": [float(pdf["x"].min())], "miny": [float(pdf["y"].min())],
                "minz": [float(pdf["z"].min())], "maxx": [float(pdf["x"].max())],
                "maxy": [float(pdf["y"].max())], "maxz": [float(pdf["z"].max())],
            })

    blocks = df.mapInPandas(_encode, schema=blk_schema)
    count = 0
    by_return = np.zeros(slots, dtype=np.uint64)
    mins = [np.inf] * 3
    maxs = [-np.inf] * 3
    tmp = path + ".tmp"
    hsize = HEADER_SIZE[version_minor]
    with open(tmp, "wb") as out:
        out.write(b"\0" * hsize)  # placeholder, rewritten below
        for row in blocks.toLocalIterator():
            out.write(bytes(row.blob))
            count += row.n
            by_return += np.asarray(row.by_return, dtype=np.uint64)
            mins = [min(mins[0], row.minx), min(mins[1], row.miny),
                    min(mins[2], row.minz)]
            maxs = [max(maxs[0], row.maxx), max(maxs[1], row.maxy),
                    max(maxs[2], row.maxz)]
    if count == 0:
        mins = [0.0, 0.0, 0.0]
        maxs = [0.0, 0.0, 0.0]
    header = make_header(
        fmt, version_minor, count, by_return, scales, offsets, mins, maxs
    )
    with open(tmp, "r+b") as out:
        out.write(header)
    os.replace(tmp, path)  # write-then-commit (lineage.py convention)
    return {
        "count": count,
        "by_return": by_return.astype(np.int64).tolist(),
        "mins": mins,
        "maxs": maxs,
        "path": path,
    }


def _laz_record_view(raw: bytes, fmt: int) -> np.ndarray:
    """Packed records -> structured array with the LAZ item field names
    (x/y/z lowercase; identical layout, zero copy)."""
    dt = _record_dtype(fmt)
    names = ["x" if n == "X" else "y" if n == "Y" else "z" if n == "Z"
             else n for n in dt.names]
    dt2 = np.dtype({
        "names": names,
        "formats": [dt.fields[n][0] for n in dt.names],
        "offsets": [dt.fields[n][1] for n in dt.names],
        "itemsize": dt.itemsize,
    })
    return np.frombuffer(raw, dtype=dt2)


def _write_laz(
    df: DataFrame,
    path: str,
    fmt: int,
    scales: Sequence[float],
    offsets: Sequence[float],
    chunk_size: int,
    order_by: Optional[Sequence[str]],
) -> dict:
    """writers.las compression=laszip — see write_las docstring."""
    from pdal_spark.formats import laz as lazmod
    from pdal_spark.operators.ordered import global_rank

    items = lazmod.laz_items_for_format(fmt)  # raises for 4/5/9/10
    version_minor = 4 if _has14(fmt) else 2
    slots = RETURN_COUNT if version_minor >= 4 else LEGACY_RETURN_COUNT

    blk_schema = T.StructType([
        T.StructField("chunk", T.LongType()),
        T.StructField("blob", T.BinaryType()),
        T.StructField("n", T.LongType()),
        T.StructField("by_return", T.ArrayType(T.LongType())),
        T.StructField("minx", T.DoubleType()),
        T.StructField("miny", T.DoubleType()),
        T.StructField("minz", T.DoubleType()),
        T.StructField("maxx", T.DoubleType()),
        T.StructField("maxy", T.DoubleType()),
        T.StructField("maxz", T.DoubleType()),
    ])

    def _encode_pdf(pdf: pd.DataFrame, chunk_id: int) -> pd.DataFrame:
        raw = encode_records(pdf, fmt, scales, offsets)
        rec = _laz_record_view(raw, fmt)
        blob = lazmod.encode_chunk(rec, items)
        ret = np.asarray(
            pdf["return_number"] if "return_number" in pdf.columns
            else np.ones(len(pdf))
        )
        br = _return_counts(ret, slots)
        return pd.DataFrame({
            "chunk": [chunk_id], "blob": [blob], "n": [len(pdf)],
            "by_return": [br.astype(np.int64).tolist()],
            "minx": [float(pdf["x"].min())], "miny": [float(pdf["y"].min())],
            "minz": [float(pdf["z"].min())], "maxx": [float(pdf["x"].max())],
            "maxy": [float(pdf["y"].max())], "maxz": [float(pdf["z"].max())],
        })

    if order_by:
        # fixed chunking (interop/parity mode): exact global chunk ids
        # via range-partitioned rank, every chunk exactly chunk_size
        # points except the last
        idx = global_rank(df, [F.col(c) for c in order_by],
                          out_col="_gidx", zero_based=True)
        chunked = idx.withColumn(
            "_chunk", (F.col("_gidx") / F.lit(chunk_size)).cast("long")
        )

        def _encode_one(key, pdf: pd.DataFrame) -> pd.DataFrame:
            return _encode_pdf(
                pdf.sort_values("_gidx", kind="stable"), int(key[0])
            )

        blocks = chunked.groupBy("_chunk").applyInPandas(
            _encode_one, schema=blk_schema
        ).orderBy("chunk")
        variable = False
    else:
        # variable chunking (chunk_size U32 in the VLR — the scale
        # default): each Arrow batch of each partition becomes one
        # chunk, encoded map-side with NO shuffle at all; the chunk
        # table records per-chunk point counts, so readers (ours and
        # laszip's variable-chunk support) recover boundaries exactly
        def _encode_stream(batches):
            for pdf in batches:
                if len(pdf):
                    yield _encode_pdf(pdf, -1)

        blocks = df.mapInPandas(_encode_stream, schema=blk_schema)
        variable = True

    count = 0
    by_return = np.zeros(slots, dtype=np.uint64)
    mins = [np.inf] * 3
    maxs = [-np.inf] * 3
    sizes: list[int] = []
    counts: list[int] = []
    hsize = HEADER_SIZE[version_minor]
    vlr = lazmod.make_laz_vlr(
        fmt, 0xFFFFFFFF if variable else chunk_size
    )
    data_offset = hsize + len(vlr)
    tmp = path + ".tmp"
    with open(tmp, "wb") as out:
        out.write(b"\0" * hsize)
        out.write(vlr)
        out.write(struct.pack("<q", -1))  # table pointer, patched below
        expect = 0
        for row in blocks.toLocalIterator():
            if not variable:
                assert row.chunk == expect, "chunk stream out of order"
                expect += 1
            out.write(bytes(row.blob))
            sizes.append(len(row.blob))
            counts.append(int(row.n))
            count += row.n
            by_return += np.asarray(row.by_return, dtype=np.uint64)
            mins = [min(mins[0], row.minx), min(mins[1], row.miny),
                    min(mins[2], row.minz)]
            maxs = [max(maxs[0], row.maxx), max(maxs[1], row.maxy),
                    max(maxs[2], row.maxz)]
        table_offset = out.tell()
        out.write(lazmod.encode_chunk_sizes(
            sizes, counts=counts if variable else None))
    if count == 0:
        mins = [0.0, 0.0, 0.0]
        maxs = [0.0, 0.0, 0.0]
    header = bytearray(make_header(
        fmt, version_minor, count, by_return, scales, offsets, mins, maxs
    ))
    struct.pack_into("<I", header, 96, data_offset)   # point data offset
    struct.pack_into("<I", header, 100, 1)            # one VLR (laszip)
    header[104] |= 0x80                               # compression flag
    with open(tmp, "r+b") as out:
        out.write(bytes(header))
        out.seek(data_offset)
        out.write(struct.pack("<q", table_offset))
    os.replace(tmp, path)
    return {
        "count": count,
        "by_return": by_return.astype(np.int64).tolist(),
        "mins": mins,
        "maxs": maxs,
        "path": path,
        "chunks": len(sizes),
    }


def write_las_parts(
    df: DataFrame,
    out_dir: str,
    by: str,
    fmt: int = 3,
    scales: Sequence[float] = (0.01, 0.01, 0.01),
    offsets: Sequence[float] = (0.0, 0.0, 0.0),
    version_minor: Optional[int] = None,
    compression: bool = False,
    chunk_size: int = 50000,
) -> DataFrame:
    """One .las (or, with ``compression=True``, .laz) per group of
    ``by`` — the FlexWriter ``#`` analog (FlexWriter.hpp) with
    writers.las's compression option, fully distributed via
    applyInPandas.

    Returns a manifest DataFrame (group, path, count, bounds) — the
    tindex sidecar shape (operators/tindex.py).  Each group's file is
    written atomically (tmp + rename) by the executor that owns it;
    compressed groups entropy-encode IN the owning task (fixed
    chunk_size chunks — the group's rows are already local, so no
    shuffle is needed to form exact chunk boundaries).
    """
    if version_minor is None:
        version_minor = 4 if _has14(fmt) else 2
    if compression:
        from pdal_spark.formats import laz as lazmod

        laz_items = lazmod.laz_items_for_format(fmt)  # raises for 4/5/9/10
        if not _has14(fmt):
            version_minor = 2
    slots = RETURN_COUNT if version_minor >= 4 else LEGACY_RETURN_COUNT
    os.makedirs(out_dir, exist_ok=True)

    man_schema = T.StructType([
        T.StructField("group", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("count", T.LongType()),
        T.StructField("minx", T.DoubleType()),
        T.StructField("miny", T.DoubleType()),
        T.StructField("maxx", T.DoubleType()),
        T.StructField("maxy", T.DoubleType()),
    ])

    def _write_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        gval = str(key[0])
        blob = encode_records(pdf, fmt, scales, offsets)
        ret = np.asarray(
            pdf["return_number"] if "return_number" in pdf.columns
            else np.ones(len(pdf))
        )
        header = bytearray(make_header(
            fmt, version_minor, len(pdf), _return_counts(ret, slots),
            scales, offsets,
            (float(pdf["x"].min()), float(pdf["y"].min()), float(pdf["z"].min())),
            (float(pdf["x"].max()), float(pdf["y"].max()), float(pdf["z"].max())),
        ))
        ext = "laz" if compression else "las"
        fpath = os.path.join(out_dir, f"{gval}.{ext}")
        tmp = f"{fpath}.tmp-{_uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            if compression:
                from pdal_spark.formats import laz as lazmod

                vlr = lazmod.make_laz_vlr(fmt, chunk_size)
                struct.pack_into("<I", header, 96, len(header) + len(vlr))
                struct.pack_into("<I", header, 100, 1)
                header[104] |= 0x80
                f.write(bytes(header))
                f.write(vlr)
                rec = _laz_record_view(blob, fmt)
                sizes = []
                f.write(struct.pack("<q", -1))  # table ptr, patched
                for lo in range(0, len(rec), chunk_size):
                    cb = lazmod.encode_chunk(
                        rec[lo:lo + chunk_size], laz_items)
                    sizes.append(len(cb))
                    f.write(cb)
                table_offset = f.tell()
                f.write(lazmod.encode_chunk_sizes(sizes))
                f.seek(len(header) + len(vlr))
                f.write(struct.pack("<q", table_offset))
            else:
                f.write(bytes(header))
                f.write(blob)
        os.replace(tmp, fpath)
        return pd.DataFrame({
            "group": [gval], "path": [fpath], "count": [len(pdf)],
            "minx": [float(pdf["x"].min())], "miny": [float(pdf["y"].min())],
            "maxx": [float(pdf["x"].max())], "maxy": [float(pdf["y"].max())],
        })

    return df.groupBy(by).applyInPandas(_write_group, schema=man_schema)

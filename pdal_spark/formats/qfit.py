"""QFIT (NASA ATM airborne lidar) .qi reader.

Re-expresses ``readers.qfit`` (``io/QfitReader.cpp``): the first int32
is the record length in bytes — read little-endian; a value >= 100
means the file is big-endian (the pre-2010 ATM campaigns,
QfitReader.cpp:214-240). Format = words per record (10/12/14). The
int32 at offset ``record_len + 4`` is the data start offset; point
count = (file size - offset) / record_len (QfitReader.cpp:253-266).

Per record (all int32, file endianness): time, y, x, z, start_pulse,
reflected_pulse, scan_angle, pitch, roll [, pdop, pulse_width |
, passive_signal, passive_y, passive_x, passive_z], gpstime(dropped).
Decode laws (QfitReader.cpp:322-380): lat/lon ``/ 1e6`` (x flipped to
-180..180 when ``flip_x`` and > 180), z ``* scale_z`` (default 0.001,
mm -> m), azimuth/pitch/roll ``/ 1e3``, pdop ``/ 10``.

Chunk-parallel over fixed-size records, like the LAS reader.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from typing import Iterable, Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass(frozen=True)
class QfitHeader:
    record_len: int
    words: int
    little_endian: bool
    data_offset: int
    n_points: int


def read_header(path: str) -> QfitHeader:
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        (word0,) = struct.unpack("<i", f.read(4))
        little = word0 < 100  # QfitReader.cpp:232-240
        rec = word0 if little else struct.unpack(">i", struct.pack("<i", word0))[0]
        if rec % 4 != 0:
            raise ValueError(
                "Base QFIT format is not a multiple of 4, "
                "unrecognized format!"
            )
        words = rec // 4
        if words not in (10, 12, 14):
            raise ValueError(f"unsupported QFIT word count {words}")
        f.seek(rec + 4)
        e = "<i" if little else ">i"
        (offset,) = struct.unpack(e, f.read(4))
    return QfitHeader(
        record_len=rec, words=words, little_endian=little,
        data_offset=offset, n_points=(size - offset) // rec,
    )


_BASE = ["offset_time", "y", "x", "z", "start_pulse", "reflected_pulse",
         "azimuth", "pitch", "roll"]


def _columns(words: int) -> list:
    if words == 12:
        return _BASE + ["pdop", "pulse_width"]
    if words == 14:
        return _BASE + ["passive_signal", "passive_y", "passive_x",
                        "passive_z"]
    return list(_BASE)


def spark_schema(h: QfitHeader) -> T.StructType:
    ints = {"offset_time", "start_pulse", "reflected_pulse", "pulse_width",
            "passive_signal"}
    return T.StructType([
        T.StructField(c, T.LongType() if c in ints else T.DoubleType())
        for c in _columns(h.words)
    ])


def decode_records(
    raw: bytes, h: QfitHeader, scale_z: float = 0.001, flip_x: bool = True
) -> pd.DataFrame:
    dt = "<i4" if h.little_endian else ">i4"
    vals = np.frombuffer(raw, dtype=dt, count=len(raw) // 4)
    vals = vals.reshape(-1, h.words).astype(np.int64)
    x = vals[:, 2] / 1e6
    if flip_x:
        x = np.where(x > 180.0, x - 360.0, x)
    out = {
        "offset_time": vals[:, 0],
        "y": vals[:, 1] / 1e6,
        "x": x,
        "z": vals[:, 3] * scale_z,
        "start_pulse": vals[:, 4],
        "reflected_pulse": vals[:, 5],
        "azimuth": vals[:, 6] / 1e3,
        "pitch": vals[:, 7] / 1e3,
        "roll": vals[:, 8] / 1e3,
    }
    if h.words == 12:
        out["pdop"] = vals[:, 9] / 10.0
        out["pulse_width"] = vals[:, 10]
    elif h.words == 14:
        px = vals[:, 11] / 1e6
        if flip_x:
            px = np.where(px > 180.0, px - 360.0, px)
        out["passive_signal"] = vals[:, 9]
        out["passive_y"] = vals[:, 10] / 1e6
        out["passive_x"] = px
        out["passive_z"] = vals[:, 12] * scale_z
    # the final word (gpstime, HHMMSSmmm-encoded) is dropped, like the
    # reference (QfitReader.cpp:382-388)
    return pd.DataFrame(out)


def read_qfit(
    spark: SparkSession,
    paths: Sequence[str] | str,
    scale_z: float = 0.001,
    flip_x: bool = True,
    chunk_points: int = 2_000_000,
) -> DataFrame:
    if isinstance(paths, str):
        paths = [paths]
    chunks = []
    first = None
    for p in paths:
        h = read_header(p)
        if first is None:
            first = h
        elif h.words != first.words:
            raise ValueError("mixed QFIT formats in one read")
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
                with open(path, "rb") as f:
                    f.seek(h.data_offset + int(start) * h.record_len)
                    raw = f.read(int(cnt) * h.record_len)
                yield decode_records(raw, h, scale_z, flip_x)

    return chunk_df.mapInPandas(_decode, schema=schema)

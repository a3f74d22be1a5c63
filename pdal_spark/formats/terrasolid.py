"""Terrasolid .bin (TScan) reader.

Re-expresses ``readers.terrasolid`` (``io/TerrasolidReader.cpp``) for
format 2 (HdrVersion 20020715): 56-byte header (HdrSize, HdrVersion,
RecogVal 970401, RecogStr, PntCnt, Units, OrgX/Y/Z, Time, Color —
TerrasolidReader.hpp:54-80), then fixed 20-byte records
``x,y,z:i4  classification,echo,flag,mark:u1  flight_line,intensity:u2``
plus a u4 5000ths-of-a-second time when Time!=0 and RGBA bytes when
Color!=0. Decode laws (TerrasolidReader.cpp:196-250):

* coordinate = ``(raw - Org) / Units``;
* echo 0 -> ReturnNumber=1, NumberOfReturns=1; echo 1 -> ReturnNumber=1
  only; others leave both 0;
* OffsetTime = ``(t - t_first) / 5`` (uint32 math, milliseconds) where
  ``t_first`` is the FIRST record's time — read once driver-side so
  chunk-parallel tasks agree with the reference's sequential baseline.

Format 1 is rejected: the reference's own branch reads six single
bytes against a declared 16-byte record (TerrasolidReader.cpp:166-180
vs :113) and cannot round-trip; no fixture exercises it.
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

RECOG_VAL = 970401
HEADER = struct.Struct("<iii4sii3dii")  # 56 bytes


@dataclass(frozen=True)
class TsHeader:
    version: int
    n_points: int
    units: float
    org: tuple
    have_time: bool
    have_color: bool
    record_len: int
    base_time: int  # first record's raw u4 time (0 when timeless)


def read_header(path: str) -> TsHeader:
    with open(path, "rb") as f:
        buf = f.read(56)
        (hdr_size, version, recog, _recog_str, cnt, units,
         ox, oy, oz, have_time, have_color) = HEADER.unpack(buf)
        if recog != RECOG_VAL:
            raise ValueError("not a Terrasolid file (bad RecogVal)")
        if version != 20020715:
            raise NotImplementedError(
                f"Terrasolid format {version} unsupported (format 1's "
                "reference decode is self-inconsistent; only format 2 "
                "is implemented)"
            )
        rec = 20 + (4 if have_time else 0) + (4 if have_color else 0)
        base_time = 0
        if have_time and cnt > 0:
            # reference seeks 56 unconditionally (TerrasolidReader.cpp
            # ready()); record 0's time field sits after the 20 fixed bytes
            f.seek(56 + 20)
            base_time = struct.unpack("<I", f.read(4))[0]
    return TsHeader(
        version=version, n_points=cnt, units=float(units),
        org=(ox, oy, oz), have_time=bool(have_time),
        have_color=bool(have_color), record_len=rec, base_time=base_time,
    )


def _dtype(h: TsHeader) -> np.dtype:
    fields = [
        ("xi", "<i4"), ("yi", "<i4"), ("zi", "<i4"),
        ("classification", "u1"), ("echo", "u1"), ("flag", "u1"),
        ("mark", "u1"), ("flight_line", "<u2"), ("intensity", "<u2"),
    ]
    if h.have_time:
        fields.append(("t", "<u4"))
    if h.have_color:
        fields += [("red", "u1"), ("green", "u1"), ("blue", "u1"),
                   ("alpha", "u1")]
    return np.dtype(fields)


def decode_records(raw: bytes, h: TsHeader) -> pd.DataFrame:
    rec = np.frombuffer(raw, dtype=_dtype(h),
                        count=len(raw) // h.record_len)
    out = {
        "x": (rec["xi"] - h.org[0]) / h.units,
        "y": (rec["yi"] - h.org[1]) / h.units,
        "z": (rec["zi"] - h.org[2]) / h.units,
        "classification": rec["classification"].astype(np.int32),
        "return_number": np.where(rec["echo"] <= 1, 1, 0).astype(np.int32),
        "number_of_returns": np.where(rec["echo"] == 0, 1, 0).astype(np.int32),
        "flag": rec["flag"].astype(np.int32),
        "mark": rec["mark"].astype(np.int32),
        "point_source_id": rec["flight_line"].astype(np.int32),
        "intensity": rec["intensity"].astype(np.int32),
    }
    if h.have_time:
        # uint32 subtraction then /5 (5000ths -> ms), reference law
        out["offset_time"] = (
            (rec["t"] - np.uint32(h.base_time)) // np.uint32(5)
        ).astype(np.int64)
    if h.have_color:
        for c in ("red", "green", "blue", "alpha"):
            out[c] = rec[c].astype(np.int32)
    return pd.DataFrame(out)


def spark_schema(h: TsHeader) -> T.StructType:
    f = [
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
        T.StructField("classification", T.IntegerType()),
        T.StructField("return_number", T.IntegerType()),
        T.StructField("number_of_returns", T.IntegerType()),
        T.StructField("flag", T.IntegerType()),
        T.StructField("mark", T.IntegerType()),
        T.StructField("point_source_id", T.IntegerType()),
        T.StructField("intensity", T.IntegerType()),
    ]
    if h.have_time:
        f.append(T.StructField("offset_time", T.LongType()))
    if h.have_color:
        f += [T.StructField(c, T.IntegerType())
              for c in ("red", "green", "blue", "alpha")]
    return T.StructType(f)


def read_terrasolid(
    spark: SparkSession,
    paths: Sequence[str] | str,
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
        elif (h.have_time, h.have_color) != (first.have_time, first.have_color):
            raise ValueError("mixed Terrasolid schemas in one read")
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
                    f.seek(56 + int(start) * h.record_len)
                    raw = f.read(int(cnt) * h.record_len)
                yield decode_records(raw, h)

    return chunk_df.mapInPandas(_decode, schema=schema)

"""SBET (Applanix smoothed best-estimate trajectory) I/O.

Re-expresses ``readers.sbet`` / ``writers.sbet`` (``io/SbetReader.cpp``,
``io/SbetWriter.cpp``, ``io/SbetCommon.hpp``): each record is 17
little-endian float64 values in the fixed order of
``sbet::fileDimensions()`` (SbetCommon.hpp:47-59) — GpsTime, Y(lat),
X(lon), Z(alt), XYZ velocity, roll, pitch, azimuth, wander angle, XYZ
body accel, XYZ body angular rate. Angular dimensions
(SbetCommon.hpp:61-77: x, y, roll, pitch, azimuth, wander, angular
rates) convert radians->degrees on read when ``angles_as_degrees``
(the reference default), and back on write (``angles_are_degrees``).
A file whose size is not a multiple of 136 bytes raises
"Invalid file size." (SbetReader.cpp:75-77).

Scale shape: fixed-width records — the reader fans out (path, start,
count) chunks exactly like formats/las.py; the writer streams
executor-encoded blocks through the driver in partition order.
"""

from __future__ import annotations

import math
import os
from typing import Iterable, Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: (column, is_angular) in file order — SbetCommon.hpp:47-77
DIMS = (
    ("gps_time", False),
    ("y", True),
    ("x", True),
    ("z", False),
    ("x_velocity", False),
    ("y_velocity", False),
    ("z_velocity", False),
    ("roll", True),
    ("pitch", True),
    ("azimuth", True),
    ("wander_angle", True),
    ("x_body_accel", False),
    ("y_body_accel", False),
    ("z_body_accel", False),
    ("x_body_ang_rate", True),
    ("y_body_ang_rate", True),
    ("z_body_ang_rate", True),
)
RECORD_LEN = len(DIMS) * 8  # 136 bytes

SCHEMA = T.StructType(
    [T.StructField(name, T.DoubleType()) for name, _ in DIMS]
)


def decode_records(raw: bytes, angles_as_degrees: bool = True) -> pd.DataFrame:
    vals = np.frombuffer(raw, dtype="<f8", count=len(raw) // 8)
    vals = vals.reshape(-1, len(DIMS))
    out = {}
    for i, (name, angular) in enumerate(DIMS):
        col = vals[:, i]
        if angular and angles_as_degrees:
            col = col * (180.0 / math.pi)
        out[name] = col
    return pd.DataFrame(out)


def read_sbet(
    spark: SparkSession,
    paths: Sequence[str] | str,
    angles_as_degrees: bool = True,
    chunk_points: int = 2_000_000,
) -> DataFrame:
    if isinstance(paths, str):
        paths = [paths]
    chunks = []
    for p in paths:
        size = os.path.getsize(p)
        if size % RECORD_LEN != 0:
            raise ValueError("Invalid file size.")  # SbetReader.cpp:75-77
        n = size // RECORD_LEN
        start = 0
        while start < n:
            cnt = min(chunk_points, n - start)
            chunks.append((p, start, cnt))
            start += cnt
    chunk_df = spark.createDataFrame(chunks, "path string, start long, count long")
    sp = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    chunk_df = chunk_df.repartition(min(max(len(chunks), 1), max(sp, 1)))

    def _decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, start, cnt in pdf.itertuples(index=False):
                with open(path, "rb") as f:
                    f.seek(int(start) * RECORD_LEN)
                    raw = f.read(int(cnt) * RECORD_LEN)
                yield decode_records(raw, angles_as_degrees)

    return chunk_df.mapInPandas(_decode, schema=SCHEMA)


def encode_records(pdf: pd.DataFrame, angles_are_degrees: bool = True) -> bytes:
    vals = np.zeros((len(pdf), len(DIMS)), dtype="<f8")
    for i, (name, angular) in enumerate(DIMS):
        col = np.asarray(pdf[name], dtype=np.float64) if name in pdf.columns \
            else np.zeros(len(pdf))
        if angular and angles_are_degrees:
            col = col * (math.pi / 180.0)  # SbetWriter.cpp:73-85
        vals[:, i] = col
    return vals.tobytes()


def write_sbet(
    df: DataFrame, path: str, angles_are_degrees: bool = True
) -> dict:
    blocks = df.mapInPandas(
        lambda batches: (
            pd.DataFrame(
                {"blob": [encode_records(pdf, angles_are_degrees)],
                 "n": [len(pdf)]}
            )
            for pdf in batches if len(pdf)
        ),
        schema="blob binary, n long",
    )
    tmp = path + ".tmp"
    count = 0
    with open(tmp, "wb") as out:
        for row in blocks.toLocalIterator():
            out.write(bytes(row.blob))
            count += row.n
    os.replace(tmp, path)
    return {"count": count, "path": path}

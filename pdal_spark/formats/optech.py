"""Optech CSD (Corrected Sensor Data) reader with WGS84 georeferencing.

Re-expresses ``readers.optech`` (``io/OptechReader.cpp``,
``io/OptechCommon.hpp``, ``pdal/util/Georeference.cpp``):

* 2048-byte header: signature/vendor/software strings, format version,
  gps week, min/max time, record count, strip pointers, misalignment
  angles + IMU offsets (radians), temperature/pressure
  (OptechCommon.hpp CsdHeader);
* 69-byte packed pulse records: gpsTime f8, returnCount u1, 4x range
  f4, 4x intensity u2, scanAngle/roll/pitch/heading f4, latitude f8,
  longitude f8 (radians), elevation f4;
* one OUTPUT ROW PER RETURN (up to 4; zero-return pulses dropped);
  ReturnNumber = index+1 except the 4th return, which reports the
  pulse's returnCount (OptechReader.cpp read loop);
* longitudes beyond +-2pi wrap by 2pi (the reference's observed-data
  workaround);
* georeferencing (Georeference.cpp:40-105): SOCS vector
  (r sin a, 0, -r cos a) rotated by the boresight matrix
  (misalignment + IMU offsets through the R3(h)R1(-p)R2(-r) Optech
  matrix) then the per-pulse attitude matrix, converted to curvilinear
  deltas on the WGS84 ellipsoid (a=6378137, 1/f=298.257223563) and
  added to the GPS position; x/y output in degrees.

Chunk-parallel over fixed records; the trig runs vectorized in numpy.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Iterable, Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

HEADER_SIZE = 2048
RECORD_LEN = 69
WGS84_A = 6378137.0
WGS84_F = 1 / 298.257223563
WGS84_E2 = 2 * WGS84_F - WGS84_F * WGS84_F
MAX_RETURNS = 4

_PULSE = np.dtype([
    ("gps_time", "<f8"), ("return_count", "u1"),
    ("range", "<f4", (4,)), ("intensity", "<u2", (4,)),
    ("scan_angle", "<f4"), ("roll", "<f4"), ("pitch", "<f4"),
    ("heading", "<f4"), ("latitude", "<f8"), ("longitude", "<f8"),
    ("elevation", "<f4"),
])
assert _PULSE.itemsize == RECORD_LEN


@dataclass(frozen=True)
class CsdHeader:
    signature: str
    vendor_id: str
    software_version: str
    format_version: float
    header_size: int
    gps_week: int
    min_time: float
    max_time: float
    num_records: int
    misalignment: tuple
    imu_offsets: tuple
    temperature: float
    pressure: float


def read_header(path: str) -> CsdHeader:
    with open(path, "rb") as f:
        buf = f.read(HEADER_SIZE)
    sig = buf[0:4].split(b"\0")[0].decode("ascii", "replace")
    if sig != "CSD":
        raise ValueError("not an Optech CSD file (bad signature)")
    vendor = buf[4:68].split(b"\0")[0].decode("ascii", "replace")
    sw = buf[68:100].split(b"\0")[0].decode("ascii", "replace")
    (fmt_ver,) = struct.unpack_from("<f", buf, 100)
    hsize, week = struct.unpack_from("<HH", buf, 104)
    min_t, max_t = struct.unpack_from("<dd", buf, 108)
    (num_rec,) = struct.unpack_from("<I", buf, 124)
    # numStrips u2 @128, stripPointers 256*u4 @130 -> misalignment @1154
    mis = struct.unpack_from("<3d", buf, 1154)
    imu = struct.unpack_from("<3d", buf, 1178)
    temp, pres = struct.unpack_from("<dd", buf, 1202)
    return CsdHeader(
        signature=sig, vendor_id=vendor, software_version=sw,
        format_version=fmt_ver, header_size=hsize, gps_week=week,
        min_time=min_t, max_time=max_t, num_records=num_rec,
        misalignment=mis, imu_offsets=imu, temperature=temp, pressure=pres,
    )


def _optech_matrix(roll, pitch, heading):
    """createOptechRotationMatrix (OptechCommon.hpp:79-101) —
    R3(heading) * R1(-pitch) * R2(-roll), vectorized (…,3,3)."""
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    ch, sh = np.cos(heading), np.sin(heading)
    m = np.empty(np.shape(roll) + (3, 3), dtype=np.float64)
    m[..., 0, 0] = cr * ch + sp * sr * sh
    m[..., 0, 1] = cp * sh
    m[..., 0, 2] = ch * sr - cr * sp * sh
    m[..., 1, 0] = ch * sp * sr - cr * sh
    m[..., 1, 1] = cp * ch
    m[..., 1, 2] = -sr * sh - cr * ch * sp
    m[..., 2, 0] = -cp * sr
    m[..., 2, 1] = sp
    m[..., 2, 2] = cp * cr
    return m


def decode_records(raw: bytes, h: CsdHeader) -> pd.DataFrame:
    pulses = np.frombuffer(raw, dtype=_PULSE, count=len(raw) // RECORD_LEN)
    pulses = pulses[pulses["return_count"] > 0]
    lon = pulses["longitude"].copy()
    lon[lon < -2 * np.pi] += 2 * np.pi
    lon[lon > 2 * np.pi] -= 2 * np.pi
    n = len(pulses)
    nret = np.minimum(pulses["return_count"], MAX_RETURNS).astype(np.int64)

    boresight = _optech_matrix(*[
        h.misalignment[i] + h.imu_offsets[i] for i in range(3)
    ])
    imu = _optech_matrix(
        pulses["roll"].astype(np.float64),
        pulses["pitch"].astype(np.float64),
        pulses["heading"].astype(np.float64),
    )
    combined = imu @ boresight  # rotate(rotate(p, boresight), imu)

    # explode pulses to one row per return
    idx = np.repeat(np.arange(n), nret)
    ret_i = np.concatenate([np.arange(k) for k in nret]) if n else \
        np.empty(0, dtype=np.int64)
    rng = pulses["range"][idx, ret_i].astype(np.float64)
    angle = pulses["scan_angle"].astype(np.float64)[idx]

    socs = np.stack([
        rng * np.sin(angle),
        np.zeros_like(rng),
        -rng * np.cos(angle),
    ], axis=-1)
    local = np.einsum("nij,nj->ni", combined[idx], socs)

    lat = pulses["latitude"][idx]
    w = np.sqrt(1 - WGS84_E2 * np.sin(lat) ** 2)
    nrad = WGS84_A / w
    mrad = WGS84_A * (1 - WGS84_E2) / (w ** 3)
    dx = local[:, 0] / (nrad * np.cos(lat))
    dy = local[:, 1] / mrad
    dz = local[:, 2]

    ret_num = (ret_i + 1).astype(np.int32)
    # 4th return slot reports the pulse's total count (reference quirk)
    full = ret_i == MAX_RETURNS - 1
    ret_num[full] = pulses["return_count"][idx][full]

    return pd.DataFrame({
        "x": np.degrees(lon[idx] + dx),
        "y": np.degrees(lat + dy),
        "z": pulses["elevation"][idx].astype(np.float64) + dz,
        "gps_time": pulses["gps_time"][idx],
        "return_number": ret_num,
        "number_of_returns": pulses["return_count"][idx].astype(np.int32),
        "echo_range": rng,
        "intensity": pulses["intensity"][idx, ret_i].astype(np.int32),
        # the reference computes scanAngle(float) * 180 -> FLOAT, then
        # / M_PI -> double, stored in a float dim (OptechReader.cpp:216)
        # — replicate the two float32 roundings bit-for-bit
        "scan_angle_rank": (
            (pulses["scan_angle"][idx] * np.float32(180)).astype(np.float64)
            / np.pi
        ).astype(np.float32).astype(np.float64),
    })


SCHEMA = T.StructType([
    T.StructField("x", T.DoubleType()),
    T.StructField("y", T.DoubleType()),
    T.StructField("z", T.DoubleType()),
    T.StructField("gps_time", T.DoubleType()),
    T.StructField("return_number", T.IntegerType()),
    T.StructField("number_of_returns", T.IntegerType()),
    T.StructField("echo_range", T.DoubleType()),
    T.StructField("intensity", T.IntegerType()),
    T.StructField("scan_angle_rank", T.DoubleType()),
])


def read_optech(
    spark: SparkSession,
    paths: Sequence[str] | str,
    chunk_points: int = 1_000_000,
) -> DataFrame:
    if isinstance(paths, str):
        paths = [paths]
    chunks = []
    for p in paths:
        h = read_header(p)
        start = 0
        while start < h.num_records:
            cnt = min(chunk_points, h.num_records - start)
            chunks.append((p, start, cnt))
            start += cnt
    chunk_df = spark.createDataFrame(chunks, "path string, start long, count long")
    sp = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    chunk_df = chunk_df.repartition(min(max(len(chunks), 1), max(sp, 1)))

    def _decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, start, cnt in pdf.itertuples(index=False):
                h = read_header(path)
                with open(path, "rb") as f:
                    f.seek(HEADER_SIZE + int(start) * RECORD_LEN)
                    raw = f.read(int(cnt) * RECORD_LEN)
                yield decode_records(raw, h)

    return chunk_df.mapInPandas(_decode, schema=SCHEMA)

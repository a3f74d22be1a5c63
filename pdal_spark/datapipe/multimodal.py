"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched pandas UDFs.

The decode kernels themselves are STUBS (no PIL/ffmpeg/librosa in this
environment): ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (bytes -> size
/ channel stats) stands in so the Spark-side plumbing — schema,
``mapInPandas`` batch shape, partition sizing, metadata propagation — is
real and tested end-to-end. Swapping in a real decoder is a one-function
change.

Scale notes: binary payloads dominate row size — ``maxRecordsPerBatch``
must be tuned down (here per-call via the ``batch_rows`` hint) so Arrow
batches stay < a few hundred MB; decode stages should run AFTER filters
so pruning drops payloads before they cross the Python boundary.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType([
    StructField("byte_len", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("mean_intensity", DoubleType()),
])


def _fake_decode(buf: bytes) -> tuple[int, int, int, int, float]:
    """Deterministic stand-in for an image decoder: derives a plausible
    (width, height, channels, mean) purely from the bytes."""
    n = len(buf)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    channels = 3
    mean = float(np.frombuffer(buf, dtype=np.uint8).mean()) if n else 0.0
    return n, width, height, channels, mean


def decode_image_meta(
    df: DataFrame, binary_col: str = "payload", fake: bool = False
) -> DataFrame:
    """Attach IMAGE_META_SCHEMA struct decoded from a binary column.

    Real decoders (PIL.Image.open over io.BytesIO per element, still
    vectorized per Arrow batch) plug into the same kernel signature.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/turbojpeg — not available here; "
            "pass fake=True for the deterministic stand-in"
        )

    cols = df.columns

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keys = ["byte_len", "width", "height", "channels", "mean_intensity"]
        for pdf in batches:
            metas = [
                dict(zip(keys, _fake_decode(b if b is not None else b"")))
                for b in pdf[binary_col]
            ]
            yield pdf.assign(image_meta=pd.Series(metas, index=pdf.index))

    schema = StructType(list(df.schema.fields) + [StructField("image_meta", IMAGE_META_SCHEMA)])
    return df.mapInPandas(kernel, schema=schema)


def frame_sample(
    df: DataFrame,
    every_n: int,
    binary_col: str = "payload",
    frame_bytes: int = 256,
    fake: bool = False,
) -> DataFrame:
    """Video frame sampling plumbing: 1->N explode of a binary stream into
    frame records (frame_idx, frame payload slice). Fake kernel slices the
    byte stream; a real one would seek keyframes via ffmpeg."""
    if not fake:
        raise NotImplementedError("video decode not available; pass fake=True")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for _, row in pdf.iterrows():
                buf = row[binary_col] or b""
                n_frames = max(1, len(buf) // frame_bytes)
                for fi in range(0, n_frames, every_n):
                    r = dict(row)
                    r["frame_idx"] = fi
                    r["frame"] = bytes(buf[fi * frame_bytes:(fi + 1) * frame_bytes])
                    out_rows.append(r)
            yield pd.DataFrame(out_rows, columns=list(pdf.columns) + ["frame_idx", "frame"])

    schema = StructType(
        list(df.schema.fields)
        + [StructField("frame_idx", IntegerType()), StructField("frame", BinaryType())]
    )
    return df.mapInPandas(kernel, schema=schema)


def embed_stub(
    df: DataFrame, binary_col: str = "payload", dim: int = 8
) -> DataFrame:
    """Deterministic fake feature extractor: binary -> float vector.

    Stands in for a vision/audio encoder; proves the array<double> column
    plumbing + downstream simsearch compatibility."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for b in pdf[binary_col]:
                arr = np.frombuffer(b or b"\x00", dtype=np.uint8).astype(np.float64)
                chunks = np.array_split(arr, dim)
                vecs.append([float(c.mean()) if len(c) else 0.0 for c in chunks])
            yield pdf.assign(features=vecs)

    schema = StructType(list(df.schema.fields) + [StructField("features", ArrayType(DoubleType()))])
    return df.mapInPandas(kernel, schema=schema)


def synth_binary_docs(spark, n: int, payload_bytes: int = 512) -> DataFrame:
    """Deterministic binary-payload table for multimodal tests: payload =
    repeated sha2 bytes keyed by id (pure column expr, no RNG)."""
    reps = payload_bytes // 32 + 1
    # slice the HEX string (utf-8 safe), unhex once at the end — slicing the
    # binary directly would go through StringType and corrupt the bytes
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.unhex(
            F.substring(
                F.repeat(F.sha2(F.col("id").cast("string"), 256), reps),
                1, payload_bytes * 2,
            )
        ).alias("payload"),
    )

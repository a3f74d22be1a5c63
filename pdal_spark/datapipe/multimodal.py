"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched pandas UDFs.

Formats numpy alone can handle get REAL kernels: binary PPM (P6),
uncompressed 24-bit BMP, truecolor TGA and GIF87a/89a (a real
variable-width LZW codec pair) images (decode / meta / nearest-neighbor
resize / dhash), and 16-bit PCM WAV audio (decode / meta / FFT band
energies).
Everything else (JPEG/PNG, mp3/aac, video containers — they need
PIL/ffmpeg, absent here) keeps the honest STUB contract:
NotImplementedError unless ``fake=True``, where a deterministic fake
decoder stands in so the Spark-side plumbing — schema, ``mapInPandas``
batch shape, partition sizing, metadata propagation — is real and
tested end-to-end. Swapping in a real decoder is a one-function change.

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


# ---------------------------------------------------------------------------
# REAL decoders — formats decodable with numpy alone (no PIL/ffmpeg):
# binary PPM (P6), uncompressed 24-bit BMP, truecolor TGA (type 2, with
# the TGA 2.0 footer signature for sniffing) and GIF87a/89a via a real
# LZW codec. These upgrade the decode path from stub to real for the
# formats the sandbox can actually produce; JPEG/PNG still route to the
# NotImplementedError stub.
# ---------------------------------------------------------------------------


def decode_ppm(buf: bytes) -> "np.ndarray":
    """Binary PPM (P6): 'P6' <ws> width <ws> height <ws> maxval <single
    ws> raw RGB rows. Returns (h, w, 3) uint8. Comments (#...) allowed
    in the header per the netpbm spec."""
    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        vals.append(int(buf[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    need = w * h * 3
    data = np.frombuffer(buf, dtype=np.uint8, count=need, offset=pos)
    return data.reshape(h, w, 3)


def decode_bmp(buf: bytes) -> "np.ndarray":
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER): rows bottom-up,
    4-byte padded, BGR order. Returns (h, w, 3) uint8 in RGB."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    off = int.from_bytes(buf[10:14], "little")
    w = int.from_bytes(buf[18:22], "little", signed=True)
    h = int.from_bytes(buf[22:26], "little", signed=True)
    bpp = int.from_bytes(buf[28:30], "little")
    comp = int.from_bytes(buf[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    flip = h > 0  # positive height = bottom-up rows
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=off)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flip:
        img = img[::-1]
    return img[:, :, ::-1]  # BGR -> RGB


_TGA_FOOTER = b"TRUEVISION-XFILE.\x00"


def encode_tga(img: "np.ndarray", top_down: bool = True) -> bytes:
    """Uncompressed truecolor TGA (type 2), 24-bit BGR, with the TGA
    2.0 footer signature (it is what makes the format sniffable)."""
    h, w = img.shape[:2]
    desc = 0x20 if top_down else 0x00
    header = bytes([0, 0, 2]) + b"\x00" * 9 + \
        w.to_bytes(2, "little") + h.to_bytes(2, "little") + bytes([24, desc])
    px = img[:, :, ::-1] if top_down else img[::-1, :, ::-1]
    # TGA 2.0 footer: ext offset 0, dev offset 0, signature
    footer = b"\x00" * 8 + _TGA_FOOTER
    return header + px.astype(np.uint8).tobytes() + footer


def decode_tga(buf: bytes) -> "np.ndarray":
    """Uncompressed truecolor TGA (type 2), 24/32-bit, honoring the
    id field, origin bit (bottom-up default) and BGR(A) order.
    Returns (h, w, 3) uint8 RGB."""
    if len(buf) < 18 or buf[2] != 2 or buf[1] != 0:
        raise ValueError("not an uncompressed truecolor TGA")
    idlen = buf[0]
    w = int.from_bytes(buf[12:14], "little")
    h = int.from_bytes(buf[14:16], "little")
    bpp = buf[16]
    if bpp not in (24, 32):
        raise ValueError("only 24/32-bit TGA supported")
    nch = bpp // 8
    off = 18 + idlen
    px = np.frombuffer(buf, np.uint8, count=w * h * nch, offset=off)
    img = px.reshape(h, w, nch)[:, :, :3][:, :, ::-1]  # BGR(A) -> RGB
    if not (buf[17] & 0x20):  # origin bit clear = bottom-up
        img = img[::-1]
    return np.ascontiguousarray(img)


def _gif_lzw_encode(indices: "np.ndarray", min_code: int) -> bytes:
    """Real GIF-variant LZW (variable width, LSB-first, dictionary
    growth to 12 bits with CLEAR reset) — not the clear-per-pixel
    'uncompressed GIF' shortcut, so decoders exercise dictionary
    codes."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = n_acc = 0
    width = min_code + 1

    def emit(code: int):
        nonlocal acc, n_acc
        acc |= code << n_acc
        n_acc += width
        while n_acc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8

    table = {bytes([i]): i for i in range(1 << min_code)}
    nxt = eoi + 1
    emit(clear)
    prev = b""
    for v in indices.ravel().tolist():
        cur = prev + bytes([v])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        table[cur] = nxt
        nxt += 1
        if nxt == (1 << width) + 1 and width < 12:
            width += 1
        if nxt >= 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(1 << min_code)}
            nxt = eoi + 1
            width = min_code + 1
        prev = bytes([v])
    if prev:
        emit(table[prev])
    emit(eoi)
    if n_acc:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, min_code: int, n_px: int) -> "np.ndarray":
    """GIF-variant LZW decode (the inverse of _gif_lzw_encode and of
    any conformant encoder)."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out = np.empty(n_px, np.uint8)
    pos = 0
    acc = n_acc = bit = 0
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(1 << min_code)] + [b"", b""]
    prev = b""
    i = 0
    while i < len(data) or n_acc >= width:
        while n_acc < width and i < len(data):
            acc |= data[i] << n_acc
            n_acc += 8
            i += 1
        if n_acc < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_acc -= width
        if code == clear:
            table = table[: eoi + 1]
            width = min_code + 1
            prev = b""
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt LZW stream")
        out[pos:pos + len(entry)] = np.frombuffer(entry, np.uint8)
        pos += len(entry)
        if prev:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if pos != n_px:
        raise ValueError(f"LZW produced {pos} of {n_px} pixels")
    return out


def encode_gif87a(img: "np.ndarray") -> bytes:
    """GIF87a with a global 256-entry grayscale color table; pixels
    quantized to their gray level (the test fixture path — real GIFs
    from the wild decode through the same reader)."""
    h, w = img.shape[:2]
    gray = img.mean(axis=2).round().astype(np.uint8) if img.ndim == 3 \
        else img.astype(np.uint8)
    out = bytearray(b"GIF87a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0xF7, 0, 0])  # GCT, 8-bit, 256 entries
    for i in range(256):
        out += bytes([i, i, i])
    out += b"\x2c" + b"\x00" * 4 + w.to_bytes(2, "little") + \
        h.to_bytes(2, "little") + b"\x00"
    out.append(8)  # LZW min code size
    comp = _gif_lzw_encode(gray, 8)
    for i in range(0, len(comp), 255):
        block = comp[i:i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif87a(buf: bytes) -> "np.ndarray":
    """GIF87a/89a static decode: global color table + first image
    descriptor (no interlace, no local palette beyond spec basics);
    89a extension blocks are skipped. Returns (h, w, 3) uint8 RGB."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    pos = 6
    packed = buf[pos + 4]
    pos += 7
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(buf, np.uint8, count=3 * n, offset=pos) \
            .reshape(n, 3)
        pos += 3 * n
    while pos < len(buf):
        b0 = buf[pos]
        if b0 == 0x21:  # 89a extension: label + sub-blocks
            pos += 2
            while buf[pos] != 0:
                pos += 1 + buf[pos]
            pos += 1
        elif b0 == 0x2C:
            w = int.from_bytes(buf[pos + 5:pos + 7], "little")
            h = int.from_bytes(buf[pos + 7:pos + 9], "little")
            ip = buf[pos + 9]
            pos += 10
            pal = gct
            if ip & 0x80:
                n = 2 << (ip & 0x07)
                pal = np.frombuffer(buf, np.uint8, count=3 * n, offset=pos) \
                    .reshape(n, 3)
                pos += 3 * n
            if ip & 0x40:
                raise ValueError("interlaced GIF not supported")
            min_code = buf[pos]
            pos += 1
            data = bytearray()
            while buf[pos] != 0:
                ln = buf[pos]
                data += buf[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            idx = _gif_lzw_decode(bytes(data), min_code, w * h)
            if pal is None:
                raise ValueError("no color table")
            return pal[idx].reshape(h, w, 3)
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    raise ValueError("no image block in GIF")


def decode_any(buf: bytes) -> "np.ndarray":
    if buf[:2] == b"P6":
        return decode_ppm(buf)
    if buf[:2] == b"BM":
        return decode_bmp(buf)
    if buf[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif87a(buf)
    if buf.endswith(_TGA_FOOTER):
        return decode_tga(buf)
    raise NotImplementedError(
        "real decode supports P6 PPM, 24-bit BMP, GIF87a/89a and "
        "footered truecolor TGA here; JPEG/PNG need PIL/turbojpeg "
        "(not in this environment)"
    )


def decode_image_meta_real(
    df: DataFrame, binary_col: str = "payload"
) -> DataFrame:
    """Real decode path: IMAGE_META_SCHEMA from actual pixels (PPM/BMP).
    Same Arrow-batched kernel signature as the stub/fake paths."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keys = ["byte_len", "width", "height", "channels", "mean_intensity"]
        for pdf in batches:
            metas = []
            for b in pdf[binary_col]:
                img = decode_any(bytes(b))
                metas.append(dict(zip(keys, (
                    len(b), int(img.shape[1]), int(img.shape[0]),
                    int(img.shape[2]), float(img.mean()),
                ))))
            yield pdf.assign(image_meta=pd.Series(metas, index=pdf.index))

    schema = StructType(
        list(df.schema.fields) + [StructField("image_meta", IMAGE_META_SCHEMA)]
    )
    return df.mapInPandas(kernel, schema=schema)


def resize_image(
    df: DataFrame, out_w: int, out_h: int, binary_col: str = "payload",
    out_col: str = "resized",
) -> DataFrame:
    """Real nearest-neighbor resize: decode (PPM/BMP) -> index-sample ->
    re-encode as P6 PPM. The canonical shape of a decode/transform/
    re-encode stage over opaque binary columns."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[binary_col]:
                img = decode_any(bytes(b))
                h, w = img.shape[:2]
                yi = (np.arange(out_h) * h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * w // out_w).astype(np.int64)
                small = img[yi][:, xi]
                header = f"P6\n{out_w} {out_h}\n255\n".encode()
                out.append(header + small.tobytes())
            yield pdf.assign(**{out_col: out})

    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, BinaryType())]
    )
    return df.mapInPandas(kernel, schema=schema)


def synth_ppm_docs(spark, n: int, w: int = 12, h: int = 8) -> DataFrame:
    """Deterministic REAL P6 images keyed by id (gradient + id offset) —
    the fixture for the real decode/resize kernels."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = []
            for i in pdf["doc_id"]:
                yy, xx = np.mgrid[0:h, 0:w]
                img = (xx * 7 + yy * 13 + int(i)) % 256
                rgb = np.stack(
                    [img, (img + 85) % 256, (img + 170) % 256], -1
                ).astype(np.uint8)
                bufs.append(f"P6\n{w} {h}\n255\n".encode() + rgb.tobytes())
            yield pdf.assign(payload=bufs)

    base = spark.range(n).select(F.col("id").alias("doc_id"))
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return base.mapInPandas(kernel, schema=schema)


# ---------------------------------------------------------------------------
# REAL audio — WAV (RIFF) PCM is fully parseable with numpy alone, so the
# audio modality gets a real decode/feature path like PPM/BMP above:
# decode -> typed metadata -> spectral band energies (np.fft), with
# JPEG-era formats (mp3/aac/ogg) still routed to the honest stub.
# ---------------------------------------------------------------------------

AUDIO_META_SCHEMA = StructType([
    StructField("byte_len", LongType()),
    StructField("sample_rate", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("duration_s", DoubleType()),
    StructField("rms", DoubleType()),
])


def encode_wav(samples: "np.ndarray", sample_rate: int) -> bytes:
    """(n, ch) int16 -> canonical 16-bit PCM WAV bytes (RIFF/fmt/data)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    n, ch = samples.shape
    data = samples.tobytes()  # interleaved row-major == WAV frame order
    block = ch * 2
    fmt = (
        (1).to_bytes(2, "little")            # PCM
        + ch.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + (16).to_bytes(2, "little")         # bits per sample
    )
    chunks = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt \
        + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(chunks).to_bytes(4, "little") + chunks


def decode_wav(buf: bytes) -> tuple["np.ndarray", int]:
    """16-bit PCM WAV -> ((n, ch) int16, sample_rate). Walks the RIFF
    chunk list (so extra chunks like LIST/fact are skipped), supports
    any channel count, rejects non-PCM / non-16-bit honestly."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE buffer")
    pos, end = 12, 8 + int.from_bytes(buf[4:8], "little")
    rate = ch = None
    data = None
    while pos + 8 <= min(end, len(buf)):
        cid = buf[pos:pos + 4]
        sz = int.from_bytes(buf[pos + 4:pos + 8], "little")
        body = buf[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            if int.from_bytes(body[0:2], "little") != 1:
                raise ValueError("only PCM (format 1) supported")
            ch = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            if int.from_bytes(body[14:16], "little") != 16:
                raise ValueError("only 16-bit samples supported")
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # RIFF chunks are 2-byte aligned
    if rate is None or data is None:
        raise ValueError("missing fmt / data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, ch), rate


def decode_audio_meta_real(
    df: DataFrame, binary_col: str = "payload"
) -> DataFrame:
    """Attach AUDIO_META_SCHEMA struct decoded from real WAV bytes."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        keys = [f.name for f in AUDIO_META_SCHEMA.fields]
        for pdf in batches:
            metas = []
            for b in pdf[binary_col]:
                s, rate = decode_wav(bytes(b))
                x = s.astype(np.float64) / 32768.0
                metas.append(dict(zip(keys, (
                    len(b), int(rate), int(s.shape[1]), int(s.shape[0]),
                    s.shape[0] / rate,
                    float(np.sqrt((x * x).mean())) if s.size else 0.0,
                ))))
            yield pdf.assign(audio_meta=pd.Series(metas, index=pdf.index))

    schema = StructType(
        list(df.schema.fields) + [StructField("audio_meta", AUDIO_META_SCHEMA)]
    )
    return df.mapInPandas(kernel, schema=schema)


def audio_band_energies(
    df: DataFrame, n_bands: int = 8, frame: int = 512,
    binary_col: str = "payload", out_col: str = "band_energy",
) -> DataFrame:
    """Real spectral features: mono-mix -> non-overlapping frames ->
    |rfft| magnitude averaged over frames -> n_bands equal-width band
    means (array<double>). The audio twin of embed_stub, but computed
    from actual signal content — downstream simsearch-compatible."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for b in pdf[binary_col]:
                s, _rate = decode_wav(bytes(b))
                mono = s.astype(np.float64).mean(axis=1) / 32768.0
                n_frames = len(mono) // frame
                if n_frames == 0:
                    vecs.append([0.0] * n_bands)
                    continue
                fr = mono[: n_frames * frame].reshape(n_frames, frame)
                mag = np.abs(np.fft.rfft(fr, axis=1)).mean(axis=0)
                bands = np.array_split(mag[1:], n_bands)  # drop DC
                vecs.append([float(bd.mean()) if len(bd) else 0.0
                             for bd in bands])
            yield pdf.assign(**{out_col: vecs})

    schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, ArrayType(DoubleType()))]
    )
    return df.mapInPandas(kernel, schema=schema)


def synth_wav_docs(
    spark, n: int, sample_rate: int = 8000, n_samples: int = 2048,
) -> DataFrame:
    """Deterministic REAL WAV payloads keyed by id: a pure sine whose
    frequency bin is id-dependent (bin 4 + id % 8 of the `frame`-point
    spectrum) — the fixture for the real audio kernels."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = []
            for i in pdf["doc_id"]:
                k = 4 + int(i) % 8
                t = np.arange(n_samples, dtype=np.float64)
                x = np.sin(2.0 * np.pi * k * t / 512.0)
                pcm = np.round(x * 16384.0).astype(np.int16)
                bufs.append(encode_wav(pcm, sample_rate))
            yield pdf.assign(payload=bufs)

    base = spark.range(n).select(F.col("id").alias("doc_id"))
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return base.mapInPandas(kernel, schema=schema)


# ---------------------------------------------------------------------------
# Image perceptual hashing — dHash (difference hash) over the REAL
# decoders above, feeding the SAME banded Hamming machinery text
# near-dup uses (dedup.simhash_pairs): the multimodal member of the
# dedup family. dHash (a published perceptual-hash scheme: resize to
# (w+1) x h, compare horizontal neighbors, pack 64 bits) is invariant
# to uniform brightness shifts and JPEG-grade noise — the standard
# cheap screen for near-identical crawled images.


def dhash_images(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    out_w: int = 9,
    out_h: int = 8,
) -> DataFrame:
    """-> (id_col, dhash): 64-bit perceptual hash per image.

    decode (PPM/BMP) -> nearest-neighbor resample to out_w x out_h
    (same integer index law as resize_image) -> integer gray = r+g+b
    (no float luma: exact, and SQL-replayable) -> bit (y*8+x) set when
    gray[y][x] > gray[y][x+1] -> two's-complement int64.

    Map-only Arrow kernel — embarrassingly parallel at any scale; pair
    generation afterwards is `dedup.simhash_pairs(..., bits=64)`, the
    banded pigeonhole join (no crossJoin)."""
    n_bits = (out_w - 1) * out_h
    if n_bits > 64:
        raise ValueError("dhash wider than 64 bits")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = np.uint64(1) << np.arange(n_bits, dtype=np.uint64)
        for pdf in batches:
            hashes = []
            for b in pdf[binary_col]:
                img = decode_any(bytes(b)).astype(np.int64)
                h, w = img.shape[:2]
                yi = np.arange(out_h) * h // out_h
                xi = np.arange(out_w) * w // out_w
                gray = img[yi][:, xi].sum(axis=2)
                bits = (gray[:, :-1] > gray[:, 1:]).flatten()
                h64 = int((bits.astype(np.uint64) * weights).sum(
                    dtype=np.uint64))
                hashes.append(h64 - (1 << 64) if h64 >= 1 << 63 else h64)
            yield pd.DataFrame({id_col: pdf[id_col], "dhash": hashes})

    return df.mapInPandas(kernel, schema=f"{id_col} long, dhash long")


def image_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 2,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    banded: bool = True,
) -> DataFrame:
    """(id1, id2, hamming) image near-dup candidates: dHash then the
    banded Hamming join. banded=False = the exact all-pairs twin."""
    from pdal_spark.datapipe.dedup import simhash_pairs

    sig = dhash_images(df, binary_col, id_col).select(
        F.col(id_col).alias("id"), F.col("dhash").alias("simhash")
    )
    return simhash_pairs(sig, max_hamming, banded=banded, bits=64)


# ---------------------------------------------------------------------------
# REAL video — YUV4MPEG2 (.y4m) is a public raw container (plain-text
# header, 'FRAME' markers, planar YUV420 payload) fully parseable with
# numpy alone, so the VIDEO modality graduates from the fake frame
# slicer above to a real decode path like PPM/BMP (images) and WAV
# (audio): decode -> frame-sample -> per-frame perceptual hash.


def encode_y4m(
    frames: "np.ndarray", fps_num: int = 30, fps_den: int = 1
) -> bytes:
    """(n, h, w) uint8 LUMA frames -> y4m bytes (YUV420: U=V=128)."""
    n, h, w = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 C420\n"
    uv = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    out = [head.encode()]
    for f in range(n):
        out.append(b"FRAME\n")
        out.append(frames[f].astype(np.uint8).tobytes())
        out.append(uv)
        out.append(uv)
    return b"".join(out)


def decode_y4m(buf: bytes) -> tuple[int, int, int, int, "np.ndarray"]:
    """-> (w, h, fps_num, fps_den, (n, h, w) luma frames). Chroma
    planes are skipped (C420 sizes derived from the header)."""
    nl = buf.index(b"\n")
    head = buf[:nl].decode("ascii")
    if not head.startswith("YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = fn = fd = None
    for tok in head.split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            fn, fd = (int(x) for x in tok[1:].split(":"))
    if not (w and h and fn and fd):
        raise ValueError("y4m header missing W/H/F")
    ysz = w * h
    fsz = ysz + 2 * (w // 2) * (h // 2)
    frames = []
    pos = nl + 1
    marker = b"FRAME"
    while pos < len(buf):
        if buf[pos:pos + 5] != marker:
            raise ValueError("bad FRAME marker")
        pos = buf.index(b"\n", pos) + 1  # frame params ignored
        y = np.frombuffer(buf[pos:pos + ysz], dtype=np.uint8)
        frames.append(y.reshape(h, w))
        pos += fsz
    return w, h, fn, fd, np.stack(frames) if frames else np.empty((0, h, w))


VIDEO_META_SCHEMA = (
    "width int, height int, fps_num int, fps_den int, "
    "n_frames int, byte_len long, mean_luma double"
)


def decode_video_meta_real(
    df: DataFrame, binary_col: str = "payload", out_col: str = "video_meta"
) -> DataFrame:
    """Real y4m decode -> typed meta struct (same contract shape as
    decode_image_meta_real / decode_audio_meta_real)."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for b in pdf[binary_col]:
                raw = bytes(b)
                w, h, fn, fd, frames = decode_y4m(raw)
                metas.append(
                    {
                        "width": w,
                        "height": h,
                        "fps_num": fn,
                        "fps_den": fd,
                        "n_frames": int(frames.shape[0]),
                        "byte_len": len(raw),
                        "mean_luma": float(
                            frames.astype(np.float64).mean()
                        ) if frames.size else 0.0,
                    }
                )
            yield pdf.assign(**{out_col: metas})

    schema = StructType(
        list(df.schema.fields)
        + [StructField(
            out_col,
            StructType([
                StructField("width", IntegerType()),
                StructField("height", IntegerType()),
                StructField("fps_num", IntegerType()),
                StructField("fps_den", IntegerType()),
                StructField("n_frames", IntegerType()),
                StructField("byte_len", LongType()),
                StructField("mean_luma", DoubleType()),
            ]),
        )]
    )
    return df.mapInPandas(kernel, schema=schema)


def video_frame_dhash(
    df: DataFrame,
    every_n: int = 2,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    out_w: int = 9,
    out_h: int = 8,
) -> DataFrame:
    """REAL frame sampling + per-frame perceptual hash: decode y4m,
    take every ``every_n``-th frame, dHash its LUMA plane (same
    integer resample + neighbor-comparison law as dhash_images, single
    plane) -> (id, frame_idx, dhash). Near-dup VIDEO detection then
    rides the existing banded Hamming join on (frame_idx, dhash) —
    1->N explode stays inside the Arrow kernel, map-only."""
    n_bits = (out_w - 1) * out_h
    if n_bits > 64:
        raise ValueError("dhash wider than 64 bits")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = np.uint64(1) << np.arange(n_bits, dtype=np.uint64)
        for pdf in batches:
            ids, fidx, hashes = [], [], []
            for i, b in zip(pdf[id_col], pdf[binary_col]):
                w, h, _, _, frames = decode_y4m(bytes(b))
                yi = np.arange(out_h) * h // out_h
                xi = np.arange(out_w) * w // out_w
                for f in range(0, frames.shape[0], every_n):
                    gray = frames[f].astype(np.int64)[yi][:, xi]
                    bits = (gray[:, :-1] > gray[:, 1:]).flatten()
                    h64 = int(
                        (bits.astype(np.uint64) * weights).sum(dtype=np.uint64)
                    )
                    ids.append(int(i))
                    fidx.append(f)
                    hashes.append(
                        h64 - (1 << 64) if h64 >= 1 << 63 else h64
                    )
            yield pd.DataFrame(
                {"id": ids, "frame_idx": fidx, "dhash": hashes}
            )

    src = df.select(F.col(id_col).alias(id_col), F.col(binary_col))
    return src.mapInPandas(
        kernel, schema="id long, frame_idx int, dhash long"
    )


def synth_y4m_docs(
    spark, n: int, w: int = 9, h: int = 8, n_frames: int = 6,
) -> DataFrame:
    """Deterministic REAL y4m fixtures keyed by id: luma(x, y, f, i) =
    (x*7 + y*13 + f*5 + i) % 256 — the closed-form the SQL oracles
    replay (same family as synth_ppm_docs)."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = []
            for i in pdf["doc_id"]:
                ff, yy, xx = np.mgrid[0:n_frames, 0:h, 0:w]
                frames = (xx * 7 + yy * 13 + ff * 5 + int(i)) % 256
                bufs.append(encode_y4m(frames.astype(np.uint8)))
            yield pdf.assign(payload=bufs)

    base = spark.range(n).select(F.col("id").alias("doc_id"))
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("payload", BinaryType())]
    )
    return base.mapInPandas(kernel, schema=schema)

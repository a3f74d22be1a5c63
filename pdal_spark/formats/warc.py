"""WARC (ISO 28500 / WARC/1.0) web-archive records — the web-native
member of the format layer (the Common-Crawl container for exactly the
pages table this engine runs on; readers.las : LiDAR :: read_warc :
webtext).

Writer (`write_warc`): one response record per row — deterministic
record ids (urn:md5 of the target URI; no uuid4, runs are replayable),
CRLF framing, Content-Length exact. Optional per-record gzip members
(`gzip_records=True`) — the real-world .warc.gz packaging, which stays
record-addressable because every record is its own gzip stream. A
CDX-style sidecar index (offset, length per record — the Common Crawl
random-access pattern) is written alongside by default.

Reader (`read_warc`):
  * with the CDX sidecar — the scale path: the index (a few dozen bytes
    per record) distributes across tasks; each task seeks its records'
    exact (offset, length) slices and decodes them independently.
    Works for plain AND gzip files (each member self-contained).
  * without an index (plain files only) — chunk-parallel anchor scan:
    a task owns byte range [start, end), finds candidate anchors
    (b"WARC/1.0\\r\\n" at offset 0 or preceded by b"\\r\\n\\r\\n") inside
    its range, and VALIDATES each by a full forward parse: header block
    must parse, Content-Length must be present, and the record must end
    exactly at EOF or at another anchor. A payload that merely contains
    the anchor bytes fails validation and cannot create a phantom
    record (tested); a record whose anchor is in-range but whose
    payload crosses the range end is completed by seeking past the
    boundary — ranges partition ANCHORS, not bytes.

Scale notes: parallelism comes from records (index mode) or byte ranges
(scan mode), never file count; nothing is collected except the spliced
single-file product, whose scale twin is `write_warc_parts` (one
warc+cdx per group, manifest returned — the FlexWriter `#` analog).
"""

from __future__ import annotations

import gzip as _gzip
import hashlib
from typing import Iterable, Iterator, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ANCHOR = b"WARC/1.0\r\n"
_MAX_HEADER = 8192  # spec headers are small; bound the parse window

READ_SCHEMA = (
    "url string, warc_date string, record_id string, "
    "content_type string, content_length long, payload binary"
)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def encode_record(
    url: str,
    date_iso: str,
    payload: bytes,
    content_type: str = "text/html",
    gzip_record: bool = False,
) -> bytes:
    """One WARC/1.0 response record, CRLF-framed; deterministic
    urn:md5 record id."""
    rid = hashlib.md5(url.encode("utf-8")).hexdigest()
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
        f"WARC-Date: {date_iso}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode("utf-8")
    rec = head + payload + b"\r\n\r\n"
    if gzip_record:
        # mtime=0: deterministic bytes (gzip stores a timestamp otherwise)
        return _gzip.compress(rec, compresslevel=6, mtime=0)
    return rec


def parse_record(buf: bytes) -> dict:
    """Parse one record's bytes (plain, already de-gzipped) -> dict.
    Raises ValueError on malformed framing."""
    if not buf.startswith(ANCHOR):
        raise ValueError("not a WARC/1.0 record")
    hdr_end = buf.find(b"\r\n\r\n", 0, _MAX_HEADER)
    if hdr_end < 0:
        raise ValueError("unterminated WARC header block")
    headers: dict[str, str] = {}
    for line in buf[len(ANCHOR):hdr_end].split(b"\r\n"):
        k, sep, v = line.partition(b": ")
        if not sep or not k:
            raise ValueError(f"bad WARC header line: {line!r}")
        headers[k.decode("utf-8")] = v.decode("utf-8")
    n = int(headers["Content-Length"])
    payload = buf[hdr_end + 4 : hdr_end + 4 + n]
    if len(payload) != n:
        raise ValueError("truncated WARC payload")
    return {
        "url": headers.get("WARC-Target-URI", ""),
        "warc_date": headers.get("WARC-Date", ""),
        "record_id": headers.get("WARC-Record-ID", ""),
        "content_type": headers.get("Content-Type", ""),
        "content_length": n,
        "payload": payload,
    }


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _encode_kernel(url_col, date_col, payload_col, content_type, gz):
    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        for pdf in batches:
            blocks, urls, lens = [], [], []
            for u, d, p in zip(pdf[url_col], pdf[date_col], pdf[payload_col]):
                raw = p if isinstance(p, (bytes, bytearray)) else str(p).encode("utf-8")
                rec = encode_record(str(u), str(d), bytes(raw), content_type, gz)
                blocks.append(rec)
                urls.append(str(u))
                lens.append(len(rec))
            yield pd.DataFrame(
                {
                    "part_id": [pid],
                    "block": [b"".join(blocks)],
                    "urls": [urls],
                    "lens": [lens],
                }
            )

    return kernel


def write_warc(
    df: DataFrame,
    path: str,
    url_col: str = "url",
    date_col: str = "warc_date",
    payload_col: str = "payload",
    content_type: str = "text/html",
    gzip_records: bool = False,
    index: bool = True,
) -> int:
    """Single-file WARC product: executor-encoded per-partition blocks,
    driver splice in partition order (the ply/las single-file parity
    mode; `write_warc_parts` is the scale path). Writes `path` and, if
    ``index``, a `path + '.cdx'` sidecar of tab-separated
    (url, offset, length) lines. Returns the record count."""
    rows = (
        df.select(url_col, date_col, payload_col)
        .mapInPandas(
            _encode_kernel(url_col, date_col, payload_col, content_type,
                           gzip_records),
            schema="part_id int, block binary, urls array<string>, "
                   "lens array<long>",
        )
        .collect()
    )
    rows.sort(key=lambda r: r["part_id"])
    n, off = 0, 0
    ix = open(path + ".cdx", "w") if index else None
    try:
        with open(path, "wb") as f:
            if ix:
                ix.write(f"CDX url offset length gzip={int(gzip_records)}\n")
            for r in rows:
                f.write(bytes(r["block"]))
                for u, ln in zip(r["urls"], r["lens"]):
                    if ix:
                        ix.write(f"{u}\t{off}\t{ln}\n")
                    off += ln
                    n += 1
    finally:
        if ix:
            ix.close()
    return n


def write_warc_parts(
    df: DataFrame,
    out_dir: str,
    group_col: str,
    url_col: str = "url",
    date_col: str = "warc_date",
    payload_col: str = "payload",
    content_type: str = "text/html",
    gzip_records: bool = False,
) -> DataFrame:
    """One .warc (+.cdx) per group, written by the owning task — the
    FlexWriter `#` analog. Returns the manifest (group, path, n_records,
    n_bytes)."""
    import os

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        g = key[0]
        p = os.path.join(out_dir, f"part-{g}.warc" + (".gz" if gzip_records else ""))
        pdf = pdf.sort_values(url_col, kind="mergesort")
        off = 0
        with open(p, "wb") as f, open(p + ".cdx", "w") as ix:
            ix.write(f"CDX url offset length gzip={int(gzip_records)}\n")
            for u, d, pl in zip(pdf[url_col], pdf[date_col], pdf[payload_col]):
                raw = pl if isinstance(pl, (bytes, bytearray)) else str(pl).encode("utf-8")
                rec = encode_record(str(u), str(d), bytes(raw), content_type,
                                    gzip_records)
                f.write(rec)
                ix.write(f"{u}\t{off}\t{len(rec)}\n")
                off += len(rec)
        return pd.DataFrame(
            {"group": [g], "path": [p], "n_records": [len(pdf)],
             "n_bytes": [off]}
        )

    return df.groupBy(group_col).applyInPandas(
        kernel, "group long, path string, n_records long, n_bytes long"
    )


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def _read_cdx(path: str) -> tuple[bool, list[tuple[str, int, int]]]:
    with open(path, "r") as f:
        head = f.readline()
        gz = "gzip=1" in head
        out = []
        for line in f:
            u, off, ln = line.rstrip("\n").split("\t")
            out.append((u, int(off), int(ln)))
    return gz, out


def read_warc(
    spark: SparkSession,
    paths: Sequence[str] | str,
    chunk_bytes: int = 8 << 20,
    use_index: Optional[bool] = None,
) -> DataFrame:
    """Distributed WARC reader. ``use_index=None`` auto-detects the
    .cdx sidecar (required for gzip files); without an index, plain
    files are split into ``chunk_bytes`` anchor-scan ranges."""
    import os

    if isinstance(paths, str):
        paths = [paths]

    slices: list[tuple[str, int, int, bool, bool]] = []
    # (path, offset, length, gzip, validated) — validated=True for index
    # slices (exact record bounds); False for scan ranges.
    for p in paths:
        cdx = p + ".cdx"
        has_ix = os.path.exists(cdx)
        want_ix = has_ix if use_index is None else use_index
        if want_ix:
            if not has_ix:
                raise FileNotFoundError(cdx)
            gz, entries = _read_cdx(cdx)
            for _u, off, ln in entries:
                slices.append((p, off, ln, gz, True))
        else:
            if p.endswith(".gz"):
                raise ValueError(
                    f"{p}: gzip WARC needs the .cdx index for parallel "
                    "reads (per-record members are not range-splittable "
                    "without it)"
                )
            size = os.path.getsize(p)
            start = 0
            while start < size:
                ln = min(chunk_bytes, size - start)
                slices.append((p, start, ln, False, False))
                start += ln

    sdf = spark.createDataFrame(
        slices, "path string, off long, len long, gz boolean, exact boolean"
    )
    sp = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sdf = sdf.repartition(min(max(len(slices), 1), max(sp, 1)))

    def _decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for path, off, ln, gz, exact in pdf.itertuples(index=False):
                if exact:
                    with open(path, "rb") as f:
                        f.seek(int(off))
                        buf = f.read(int(ln))
                    if gz:
                        buf = _gzip.decompress(buf)
                    out.append(parse_record(buf))
                else:
                    out.extend(_scan_range(path, int(off), int(ln)))
            yield pd.DataFrame(
                out,
                columns=["url", "warc_date", "record_id", "content_type",
                         "content_length", "payload"],
            )

    return sdf.mapInPandas(_decode, schema=READ_SCHEMA)


def _scan_range(path: str, start: int, length: int) -> list[dict]:
    """Anchor-scan fallback: parse every VALID record whose anchor lies
    in [start, start+length); records may extend past the range end."""
    import os

    size = os.path.getsize(path)
    end = min(start + length, size)
    # 4 bytes of lookback so a "\r\n\r\nWARC/1.0" straddling `start`
    # is still recognized as anchored
    lo = max(start - 4, 0)
    with open(path, "rb") as f:
        f.seek(lo)
        # ANCHOR-1 bytes of lookahead: an anchor STRADDLING the range
        # end belongs to this range (abs_off < end) but its bytes
        # extend past it — without the lookahead neither side sees it
        window = f.read(end - lo + len(ANCHOR) - 1)
        recs: list[dict] = []
        pos = 0
        while True:
            i = window.find(ANCHOR, pos)
            if i < 0:
                break
            abs_off = lo + i
            if abs_off >= end:
                break
            pos = i + 1
            anchored = abs_off == 0 or window[max(i - 4, 0):i] == b"\r\n\r\n"
            if not anchored or abs_off < start:
                continue
            rec = _try_parse_at(f, abs_off, size)
            if rec is not None:
                recs.append(rec)
    return recs


def _try_parse_at(f, off: int, size: int) -> Optional[dict]:
    """Validated forward parse at a candidate anchor: header block must
    parse, Content-Length must close the record on EOF or another
    anchor. Returns None for payload-embedded fake anchors."""
    f.seek(off)
    head = f.read(_MAX_HEADER)
    hdr_end = head.find(b"\r\n\r\n")
    if hdr_end < 0:
        return None
    try:
        n = None
        for line in head[len(ANCHOR):hdr_end].split(b"\r\n"):
            k, sep, v = line.partition(b": ")
            if not sep or not k:
                return None
            if k == b"Content-Length":
                n = int(v)
        if n is None:
            return None
    except (ValueError, UnicodeDecodeError):
        return None
    rec_end = off + hdr_end + 4 + n + 4
    if rec_end > size:
        return None
    f.seek(rec_end - 4)
    tail = f.read(4 + len(ANCHOR))
    if tail[:4] != b"\r\n\r\n":
        return None
    if rec_end != size and not tail[4:].startswith(ANCHOR):
        return None
    f.seek(off)
    try:
        return parse_record(f.read(rec_end - off))
    except (ValueError, KeyError, UnicodeDecodeError):
        return None

"""WARC format layer: round trips (plain + gzip), chunk invariance,
anchor-validation (no phantom records from payload-embedded anchors),
index-parallel reads, parts writer manifest."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from pdal_spark.formats import warc


def _pages(spark, n=40):
    df = spark.range(n).select(
        F.concat(F.lit("http://ex.org/p/"), F.col("id")).alias("url"),
        F.concat(F.lit("2026-08-19T00:00:"), F.lpad(F.col("id") % 60, 2, "0"),
                 F.lit("Z")).alias("warc_date"),
        F.encode(
            F.concat(F.lit("<html>page "), F.col("id"), F.lit("</html>")),
            "utf-8",
        ).alias("payload"),
    )
    return df.repartition(4)


def _collected(df):
    return sorted(
        (r["url"], r["warc_date"], r["content_length"], bytes(r["payload"]))
        for r in df.collect()
    )


def test_roundtrip_plain_and_gzip(spark, tmp_path):
    src = _pages(spark)
    exp = sorted(
        (r["url"], r["warc_date"], len(bytes(r["payload"])), bytes(r["payload"]))
        for r in src.collect()
    )
    for gz in (False, True):
        p = str(tmp_path / ("t.warc.gz" if gz else "t.warc"))
        n = warc.write_warc(src, p, gzip_records=gz)
        assert n == 40
        got = _collected(warc.read_warc(spark, p))
        assert got == exp
        # record ids are deterministic urn:md5 of the url
        rid = warc.read_warc(spark, p).filter(
            F.col("url") == "http://ex.org/p/7"
        ).collect()[0]["record_id"]
        import hashlib

        assert rid == f"<urn:md5:{hashlib.md5(b'http://ex.org/p/7').hexdigest()}>"


def test_chunk_invariance_scan_mode(spark, tmp_path):
    """Anchor-scan results are independent of the byte-range split —
    including ranges that cut records mid-payload."""
    p = str(tmp_path / "t.warc")
    warc.write_warc(_pages(spark), p, index=False)
    assert not os.path.exists(p + ".cdx")
    base = _collected(warc.read_warc(spark, p, chunk_bytes=1 << 20))
    for cb in (64, 97, 300):  # absurdly small: every record straddles
        assert _collected(warc.read_warc(spark, p, chunk_bytes=cb)) == base


def test_index_vs_scan_identical(spark, tmp_path):
    p = str(tmp_path / "t.warc")
    warc.write_warc(_pages(spark), p, index=True)
    by_ix = _collected(warc.read_warc(spark, p, use_index=True))
    by_scan = _collected(warc.read_warc(spark, p, use_index=False))
    assert by_ix == by_scan and len(by_ix) == 40


def test_payload_embedded_anchor_rejected(spark, tmp_path):
    """A payload CONTAINING the framing bytes must not split into a
    phantom record: the fake anchor has no parseable header block /
    Content-Length chain, so validation rejects it."""
    evil = b"before\r\n\r\nWARC/1.0\r\nnot a header\r\n\r\nafter"
    rec0 = warc.encode_record("http://ex.org/evil", "2026-08-19T00:00:00Z", evil)
    rec1 = warc.encode_record("http://ex.org/ok", "2026-08-19T00:00:01Z", b"x")
    p = str(tmp_path / "evil.warc")
    with open(p, "wb") as f:
        f.write(rec0 + rec1)
    out = _collected(warc.read_warc(spark, p, chunk_bytes=48))
    assert [u for u, *_ in out] == ["http://ex.org/evil", "http://ex.org/ok"]
    assert out[0][3] == evil


def test_gzip_without_index_refuses(spark, tmp_path):
    p = str(tmp_path / "t.warc.gz")
    warc.write_warc(_pages(spark), p, gzip_records=True, index=True)
    with pytest.raises(ValueError, match="needs the .cdx index"):
        warc.read_warc(spark, p, use_index=False)
    # gzip members are deterministic (mtime=0): file bytes replayable
    b1 = open(p, "rb").read()
    warc.write_warc(_pages(spark), p, gzip_records=True, index=True)
    assert open(p, "rb").read() == b1
    # each indexed slice is a self-contained gzip member
    gz, entries = warc._read_cdx(p + ".cdx")
    assert gz and len(entries) == 40
    with open(p, "rb") as f:
        u, off, ln = entries[3]
        f.seek(off)
        rec = gzip.decompress(f.read(ln))
        assert warc.parse_record(rec)["url"] == u


def test_write_warc_parts_manifest(spark, tmp_path):
    d = str(tmp_path)
    src = _pages(spark).withColumn(
        "g", (F.length("url") % 3).cast("long")
    )
    man = warc.write_warc_parts(src, d, "g").collect()
    assert sum(r["n_records"] for r in man) == 40
    for r in man:
        assert os.path.getsize(r["path"]) == r["n_bytes"]
        got = warc.read_warc(spark, r["path"])
        assert got.count() == r["n_records"]

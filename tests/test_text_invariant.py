"""The north rule's per-row invariant: byte-identical extracted text
(and html payload) per url THROUGH EVERY STAGE of the flagship chain —
geocode -> crop -> splitter tiling -> chipper (a pandas-UDF stage, i.e.
an Arrow round-trip) -> per-tile writes.

Spark's columnar operators don't touch pass-through columns, but the
Arrow/pandas boundary is exactly where bytes CAN get mangled (binary <->
bytearray coercion, unicode normalization, NUL truncation), so the
invariant is pinned explicitly on adversarial payloads: every byte value
0..255 in html, NFC-vs-NFD unicode, combining marks, astral-plane
emoji, embedded NULs and bidi controls in text.
"""

from __future__ import annotations

import unicodedata

import pytest
from pyspark.sql import functions as F

ADVERSARIAL_TEXTS = [
    "plain ascii words here",
    "café composed",                       # NFC
    "café decomposed",                    # NFD — must NOT normalize
    "emoji \U0001f409\U0001f680 astral",
    "zero\x00byte inside",
    "bidi ‮RTL override‬ end",
    "combining à̖͜ stack",
    "tabs\tand\r\nnewlines ls",
    "ascii " * 500 + "long tail",
]


@pytest.fixture(scope="module")
def pages(spark):
    import pandas as pd

    rows = []
    for i, txt in enumerate(ADVERSARIAL_TEXTS):
        html = bytes(range(256)) * 2 + txt.encode("utf-8", "surrogatepass")
        rows.append((i, f"http://t.example/doc/{i}", txt, bytearray(html)))
    pdf = pd.DataFrame(rows, columns=["page_id", "url", "text", "html"])
    df = spark.createDataFrame(
        pdf, "page_id long, url string, text string, html binary"
    ).withColumn("warc_ts", F.timestamp_seconds(F.col("page_id") * 60 + 1))
    return df.repartition(4).persist()


def _expected():
    return {
        f"http://t.example/doc/{i}": (
            txt,
            bytes(range(256)) * 2 + txt.encode("utf-8", "surrogatepass"),
        )
        for i, txt in enumerate(ADVERSARIAL_TEXTS)
    }


def _assert_invariant(df):
    got = {
        r["url"]: (r["text"], bytes(r["html"]))
        for r in df.select("url", "text", "html").collect()
    }
    exp = _expected()
    assert set(got) == set(exp)
    for url, (txt, html) in exp.items():
        gt, gh = got[url]
        assert gt == txt, f"text changed for {url}"
        # unicode must survive without normalization
        assert unicodedata.is_normalized("NFC", gt) == \
            unicodedata.is_normalized("NFC", txt)
        assert gh == html, f"html bytes changed for {url}"


def test_text_bytes_identical_through_stages(spark, pages, tmp_path):
    from pdal_spark import synth
    from pdal_spark.operators import chipper as chipper_op
    from pdal_spark.operators import crop as crop_op
    from pdal_spark.operators import splitter as splitter_op

    # stage 1: geocode (adds columns only)
    geo = synth.with_coords(pages)
    _assert_invariant(geo)

    # stage 2: crop to the full extent (keeps all rows; exercises the
    # predicate path with the payload columns present)
    bb = geo.agg(F.min("x"), F.max("x"), F.min("y"), F.max("y")).collect()[0]
    box = crop_op.Box(bb[0] - 1, bb[2] - 1, bb[1] + 1, bb[3] + 1)
    cropped = crop_op.crop(geo, [box], mode="stream")
    _assert_invariant(cropped)

    # stage 3: splitter tiling (adds tile ids)
    tiled = splitter_op.split(cropped, 90.0, 0.0, 0.0)
    _assert_invariant(tiled)

    # stage 4: chipper — an applyInPandas stage, so every payload
    # column crosses the Arrow boundary and back
    chipped = chipper_op.chip(tiled.drop("tile_x", "tile_y"), capacity=4,
                              order_col="page_id")
    _assert_invariant(chipped)

    # stage 5: per-tile parquet write + read-back (FlexWriter shape)
    out = str(tmp_path / "tiles")
    chipped.write.partitionBy("chip_id").mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    _assert_invariant(back)


def test_payload_bytes_identical_through_warc(spark, pages, tmp_path):
    """The same adversarial payloads through the WARC container: write
    (executor-encoded records, driver splice) then the distributed
    reader, in all three container modes — plain+index, plain
    anchor-scan (no index), gzip+index. Every payload byte and every
    url must survive; text rides inside the payload so the UTF-8 forms
    (NFD vs NFC, astral, NULs) are pinned through the container too."""
    from pdal_spark.formats import warc as warc_fmt

    src = pages.select(
        "url",
        F.date_format(
            F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ).alias("warc_date"),
        F.col("html").alias("payload"),
    )
    exp = {u: h for u, (_t, h) in _expected().items()}

    def check(df):
        got = {r["url"]: bytes(r["payload"])
               for r in df.select("url", "payload").collect()}
        assert got == exp

    plain = str(tmp_path / "a.warc")
    n = warc_fmt.write_warc(src, plain, index=True)
    assert n == len(exp)
    check(warc_fmt.read_warc(spark, plain))                  # cdx slices
    check(warc_fmt.read_warc(spark, plain, use_index=False,  # anchor scan
                             chunk_bytes=1024))
    gz = str(tmp_path / "b.warc.gz")
    warc_fmt.write_warc(src, gz, gzip_records=True, index=True)
    check(warc_fmt.read_warc(spark, gz))


def test_payload_bytes_identical_through_catalog_merge(spark, pages, tmp_path):
    """The catalog's copy-on-write paths move payload bytes through
    staging writes, file rewrites, and compaction — pin byte identity
    through append -> merge(update) -> merge(delete) -> compact. The
    updated row must carry the NEW bytes exactly; every untouched row
    (files carried over OR rewritten) keeps its old bytes."""
    from pdal_spark.catalog import SnapshotTable

    t = SnapshotTable(spark, str(tmp_path / "tbl"), stats_cols=("page_id",))
    base = pages.select("page_id", "url", "text", "html")
    t.append(base.repartition(3))

    exp = {u: (txt, h) for u, (txt, h) in _expected().items()}

    def check(df, want):
        got = {r["url"]: (r["text"], bytes(r["html"]))
               for r in df.select("url", "text", "html").collect()}
        assert got == want

    check(t.read(), exp)

    # merge-update row 3 with a fresh adversarial payload
    new_html = bytes(range(255, -1, -1)) * 3 + "ersätz \x00 tail".encode()
    upd = spark.createDataFrame(
        [(3, "http://t.example/doc/3", "ersätz \x00 tail",
          bytearray(new_html))],
        "page_id long, url string, text string, html binary",
    )
    t.merge(upd, key="page_id", when_matched="update")
    exp2 = dict(exp)
    exp2["http://t.example/doc/3"] = ("ersätz \x00 tail", new_html)
    check(t.read(), exp2)

    # merge-delete row 0; everything else byte-identical
    t.merge(upd.withColumn("page_id", F.lit(0)), key="page_id",
            when_matched="delete")
    exp3 = {u: v for u, v in exp2.items() if u != "http://t.example/doc/0"}
    check(t.read(), exp3)

    # compaction rewrites every small file; bytes must still be exact
    t.compact(small_threshold_rows=1000)
    check(t.read(), exp3)


def test_text_bytes_identical_through_projpipeline(spark, pages):
    """The round-5 coordinate chain: geocode -> cart/helmert datum
    shift (filters.projpipeline) -> its exact reverse — payload
    columns must ride through both Column-math stages byte-identical
    (the chain has NO drop conditions, so every adversarial row
    survives), and the recovered lon/lat must match the geocode."""
    import numpy as np

    from pdal_spark import synth
    from pdal_spark.operators import projpipeline as pp_op

    op = ("+proj=pipeline +step +proj=unitconvert +xy_in=deg "
          "+xy_out=rad +step +proj=cart +ellps=WGS84 "
          "+step +proj=helmert +x=-87.0 +y=-96.0 +z=-120.0 "
          "+step +inv +proj=cart +ellps=intl "
          "+step +proj=unitconvert +xy_in=rad +xy_out=deg")
    geo = synth.with_coords(pages)
    base = {r["url"]: (r["x"], r["y"]) for r in
            geo.select("url", "x", "y").collect()}
    shifted = pp_op.projpipeline(geo, op)
    _assert_invariant(shifted)
    back = pp_op.projpipeline(shifted, op, reverse_transfo=True)
    _assert_invariant(back)
    for r in back.select("url", "x", "y").collect():
        x0, y0 = base[r["url"]]
        np.testing.assert_allclose((r["x"], r["y"]), (x0, y0),
                                   atol=1e-9)

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

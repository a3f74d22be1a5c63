"""HTML -> text extraction — rule-by-rule literals + invariant."""

from __future__ import annotations

import duckdb
import pandas as pd

from pdal_spark.datapipe import htmlextract as hx


def _extract1(spark, html: str, collapse: bool = True) -> str:
    df = spark.createDataFrame(
        pd.DataFrame({"html": [html.encode()]})
    )
    return hx.extract_text(df, collapse=collapse).collect()[0].extracted


def test_block_content_dropped(spark):
    assert _extract1(
        spark, "a<script>var x='<p>hi</p>';</script>b"
    ) == "ab"
    assert _extract1(spark, "a<style>p{}</style>b") == "ab"
    assert _extract1(
        spark, "<head><title>T</title><meta x></head>body"
    ) == "body"
    # case-insensitive + attributes + multi-line
    assert _extract1(
        spark, 'x<SCRIPT type="a">\nline\nline\n</SCRIPT>y'
    ) == "xy"


def test_comments_and_tags(spark):
    assert _extract1(spark, "a<!-- hidden <b>bold</b> -->b") == "ab"
    # tags strip to NOTHING — no block-level spacing synthesis (the
    # documented non-goal); markup with real whitespace keeps it
    assert _extract1(spark, "<p>one</p><div>two</div>") == "onetwo"
    assert _extract1(spark, "<p>one</p> <div>two</div>") == "one two"


def test_entities_decode_after_strip(spark):
    assert _extract1(spark, "<p>Tom &amp; Jerry &lt;3&nbsp;&quot;q&#39;</p>") == (
        "Tom & Jerry <3 \"q'"
    )
    # double-encoded &amp;lt; stays a LITERAL "&lt;" (amp decoded last,
    # single pass) and can never become a live tag
    assert _extract1(spark, "x &amp;lt;script&amp;gt; y") == "x &lt;script&gt; y"


def test_whitespace_collapse_flag(spark):
    assert _extract1(spark, "<p>a</p>\n\n  <p>b</p>") == "a b"
    raw = _extract1(spark, "<p>a</p>\n\n<p>b</p>", collapse=False)
    assert raw == "a\n\nb"


def test_byte_identity_invariant(spark, sf_dir):
    """extract(synth html) reproduces the source text byte-for-byte
    (+ the known footer) on every document — the input_hint contract."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = hx.extract_text(hx.with_synth_html(docs)).select(
        "doc_id", "text", "extracted"
    ).toPandas()
    assert (out.extracted == out.text + " Tom & Jerry <3").all()


def test_sql_twin(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = (
        hx.extract_text(hx.with_synth_html(docs))
        .select("doc_id", "extracted")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    ref = (
        con.sql(
            f"SELECT doc_id, {hx.extract_text_sql()} AS extracted "
            f"FROM ({hx.with_synth_html_sql()})"
        )
        .df().sort_values("doc_id").reset_index(drop=True)
    )
    assert (out.extracted.values == ref.extracted.values).all()

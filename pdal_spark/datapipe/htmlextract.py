"""Deterministic HTML -> text extraction (map-only column math).

The input table's contract (BASELINE input_hint) is that ``text`` is
the extracted form of ``html`` and must survive every stage
byte-identically. This module supplies the extraction itself — the
boilerplate-v0 step every crawl pipeline runs before the quality /
dedup stack — as a pure regexp chain (no UDF, no parser state):

  1. drop <script>, <style> and <head> blocks WITH their content
     (scripts/styles are not text; head holds metadata, not body
     text), case-insensitive, dotall-lazy
  2. drop <!-- comments -->
  3. strip every remaining tag <...>
  4. decode the five XML entities + &nbsp; (after tag-strip, so
     "&lt;script&gt;" in user text can never become a live tag)
  5. optionally collapse runs of whitespace and trim

It is deliberately NOT a browsing-grade parser (no malformed-markup
recovery, no CSS visibility) — it is the deterministic, vectorized,
SQL-twinnable transform a 100 TB pipeline can actually run, and the
invariant test suite pins extract(synth html) == text byte-for-byte.

Scale shape: per-row regexp_replace chain, map-only at any scale; the
binary -> string decode is Spark's built-in UTF-8 decode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "extract_text",
    "extract_text_sql",
    "with_synth_html",
    "with_synth_html_sql",
]

# one pattern per container tag — NO backreferences (RE2, DuckDB's
# engine, rejects them; Java would accept \1 but the twin must not)
_BLOCK_TAGS = ("script", "style", "head")
_BLOCK_RE = [
    rf"(?is)<{tag}\b[^>]*>.*?</{tag}\s*>" for tag in _BLOCK_TAGS
]
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"<[^>]*>"
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # last, so "&amp;lt;" decodes to the LITERAL "&lt;"
]


def _extract(col: Column, collapse: bool) -> Column:
    t = F.decode(col, "UTF-8")
    for pat in _BLOCK_RE:
        t = F.regexp_replace(t, pat, "")
    t = F.regexp_replace(t, _COMMENT_RE, "")
    t = F.regexp_replace(t, _TAG_RE, "")
    for ent, ch in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    if collapse:
        t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return t


def extract_text(
    df: DataFrame,
    html_col: str = "html",
    out_col: str = "extracted",
    collapse: bool = True,
) -> DataFrame:
    """Adds ``out_col`` = extracted text of the binary ``html_col``."""
    return df.withColumn(out_col, _extract(F.col(html_col), collapse))


def extract_text_sql(
    html: str = "html",
    collapse: bool = True,
) -> str:
    """DuckDB twin expression (html is BLOB -> decode, same chain).
    DuckDB regexp_replace needs the 'g'(+'is') flags spelled out."""
    t = f"decode({html})"
    for tag in _BLOCK_TAGS:
        t = (
            f"regexp_replace({t}, '<{tag}\\b[^>]*>.*?</{tag}\\s*>',"
            f" '', 'gis')"
        )
    t = f"regexp_replace({t}, '<!--.*?-->', '', 'gs')"
    t = f"regexp_replace({t}, '<[^>]*>', '', 'g')"
    for ent, ch in _ENTITIES:
        lit = ch.replace("'", "''")
        t = f"replace({t}, '{ent}', '{lit}')"
    if collapse:
        t = f"trim(regexp_replace({t}, '\\s+', ' ', 'g'))"
    return t


def with_synth_html(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic page-structured HTML around the flat test corpus:
    head with a style block, a nav comment, the text split across two
    <p> tags at the midpoint word, an id-keyed <script> payload, and
    an entity-bearing footer — every extraction rule exercised, and
    extract(html) must reproduce ``text`` + the known footer suffix.
    Pure column math with an identical SQL twin."""
    i = F.col(id_col)
    toks = F.split(F.col(text_col), " ")
    half = (F.size(toks) / 2).cast("int")
    p1 = F.array_join(F.slice(toks, 1, half), " ")
    p2 = F.array_join(
        F.slice(toks, half + 1, F.size(toks) - half), " "
    )
    html = F.concat(
        F.lit("<html><head><style>p { color: red; }</style>"
              "<title>t</title></head><body><!-- nav -->"),
        F.lit("<p>"), p1, F.lit("</p> <p>"), p2, F.lit("</p>"),
        F.lit('<script type="text/javascript">var k='), i.cast("string"),
        F.lit(";</script><div> Tom &amp; Jerry &lt;3</div></body></html>"),
    )
    return df.withColumn("html", html.cast("binary"))


def with_synth_html_sql(
    text: str = "text",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    toks = f"string_split({text}, ' ')"
    half = f"CAST(len({toks}) / 2 AS INT)"
    p1 = f"array_to_string(list_slice({toks}, 1, {half}), ' ')"
    p2 = (
        f"array_to_string(list_slice({toks}, {half} + 1,"
        f" len({toks})), ' ')"
    )
    html = (
        "concat('<html><head><style>p { color: red; }</style>"
        "<title>t</title></head><body><!-- nav -->', "
        f"'<p>', {p1}, '</p> <p>', {p2}, '</p>', "
        f"'<script type=\"text/javascript\">var k=', CAST({id_col} AS VARCHAR), "
        "';</script><div> Tom &amp; Jerry &lt;3</div></body></html>')"
    )
    return (
        f"SELECT *, encode({html}) AS html FROM {table}"
    )

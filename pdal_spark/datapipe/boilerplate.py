"""Host-template boilerplate removal (cross-page line frequency).

Web pages from one host share template chrome — navigation bars,
cookie banners, footers — that repeats VERBATIM on (nearly) every
page of the host while real content does not. The canonical cleaning
move (CCNet's per-shard paragraph dedup and trafilatura/jusText's
cross-page filters are the published relatives; this is the
host-scoped exact-line variant) is:

  a line is BOILERPLATE for host h when it occurs in
    >= ``min_docs`` distinct documents of h, AND
    >= ``num/den`` (a rational, default 6/10) of h's documents.

Every boilerplate line is removed from every document of the host;
surviving lines are re-joined in their original order.

This differs from ``dedup.paragraph_dedup`` (corpus-wide exact chunk
dedup, first occurrence KEPT) in both scope and action: the template
line is host-scoped, frequency-thresholded, and dropped from ALL
copies including the first — a navigation bar is noise everywhere,
not content once.

Scale shape (100 TB):
  1. explode lines -> distinct (host, line, doc) -> one combinable
     exchange keyed (host, line_key) counting documents. Grouping on
     the (host, line) pair spreads a mega-host across the cluster —
     there is NO host-keyed hot partition in the heavy pass.
  2. host document totals: tiny second agg (one row per host).
  3. per-host boilerplate line-SET (collect_set) — template chrome is
     bounded (a site has dozens of template lines, not millions), so
     the per-host array stays small by construction; thresholds make
     this robust: a line must hit a FRACTION of the host's docs, and
     the number of distinct lines that can each appear in >= 60% of
     docs is bounded by lines-per-page / 0.6.
  4. ONE broadcast-able join of pages against the per-host array,
     then map-only `F.filter(split(text), not array_contains(...))`
     rebuilds the page — original line order preserved for free, no
     second explode/re-group exchange, no window.

The frequency threshold compares with cross-multiplied INTEGERS
(n_docs * den >= num * h_docs), so engine and oracle agree bit-for-bit
with no float division anywhere.

Reference kinship: PDAL has no web-text notion, but the shape mirrors
filters.elm / outlier (frequency/population screen then per-row
rewrite); the published rule family is Raffel et al. C4 (line rules,
`c4_rules.py`) and Wenzek et al. CCNet (cross-doc dedup,
`dedup.paragraph_dedup`) — this module is the host-template member of
that family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "host_boilerplate_lines",
    "strip_boilerplate",
    "strip_boilerplate_sql",
    "with_synth_host_pages",
    "with_synth_host_pages_sql",
]


def host_boilerplate_lines(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    num: int = 6,
    den: int = 10,
) -> DataFrame:
    """-> (host, line, n_docs, h_docs): the detected template lines.

    One exchange keyed (host, line) for the document counts; the host
    totals are a second tiny agg joined back on host. Empty/blank
    lines are never template candidates (they carry no content and
    their removal would be invisible after re-join anyway).
    """
    lines = df.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("_doc"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.col(text_col), "\n"),
                    lambda l: F.trim(l) != "",
                )
            )
        ).alias("line"),
    )
    # array_distinct above makes (host, line, _doc) unique per doc, so
    # count(*) IS count(DISTINCT doc) — and stays map-side combinable.
    per_line = lines.groupBy("host", "line").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    host_docs = df.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).alias("h_docs")
    )
    return per_line.join(host_docs, "host").filter(
        (F.col("n_docs") >= min_docs)
        & (F.col("n_docs") * den >= num * F.col("h_docs"))
    )


def strip_boilerplate(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    num: int = 6,
    den: int = 10,
) -> DataFrame:
    """-> (doc_id, host, n_lines, n_boiler, clean_text).

    Detect per-host template lines, then rebuild every page map-only:
    the boilerplate SET rides in as one small array per host
    (broadcast-join shape), and `F.filter` keeps original line order
    without a re-group exchange. Hosts with no template lines keep
    their text verbatim (left join, coalesce to empty set).
    """
    bl = (
        host_boilerplate_lines(
            df, host_col, text_col, id_col, min_docs, num, den
        )
        .groupBy("host")
        .agg(F.collect_set("line").alias("_bl"))
    )
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda l: F.trim(l) != ""
    )
    blset = F.coalesce(F.col("_bl"), F.array().cast("array<string>"))
    kept = F.filter(lines, lambda l: ~F.array_contains(blset, l))
    return (
        df.withColumnRenamed(host_col, "host")
        .join(F.broadcast(bl), "host", "left")
        .select(
            F.col(id_col),
            "host",
            F.size(lines).alias("n_lines"),
            (F.size(lines) - F.size(kept)).alias("n_boiler"),
            F.array_join(kept, "\n").alias("clean_text"),
        )
    )


def strip_boilerplate_sql(
    pages: str,
    host: str = "host",
    text: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    num: int = 6,
    den: int = 10,
) -> str:
    """DuckDB twin — identical line algebra and integer thresholds.

    ``pages`` is a sub-select producing (id_col, host, text).
    """
    return f"""
      WITH pages AS ({pages}),
      linedocs AS (
        SELECT {host}, line, count(*) AS n_docs
        FROM (
          SELECT {host}, {id_col},
                 unnest(list_distinct(list_filter(
                   string_split({text}, chr(10)), l -> trim(l) <> ''
                 ))) AS line
          FROM pages
        ) GROUP BY {host}, line
      ),
      hostdocs AS (
        SELECT {host}, count(*) AS h_docs FROM pages GROUP BY {host}
      ),
      bl AS (
        SELECT {host}, list(line) AS bl
        FROM linedocs JOIN hostdocs USING ({host})
        WHERE n_docs >= {min_docs} AND n_docs * {den} >= {num} * h_docs
        GROUP BY {host}
      ),
      built AS (
        SELECT p.{id_col}, p.{host},
          list_filter(string_split(p.{text}, chr(10)),
                      l -> trim(l) <> '') AS ls,
          coalesce(b.bl, []) AS bset
        FROM pages p LEFT JOIN bl b USING ({host})
      )
      SELECT {id_col}, {host} AS host, len(ls) AS n_lines,
        len(ls) - len(list_filter(ls, l -> NOT list_contains(bset, l)))
          AS n_boiler,
        coalesce(array_to_string(
          list_filter(ls, l -> NOT list_contains(bset, l)), chr(10)
        ), '') AS clean_text
      FROM built
    """


def with_synth_host_pages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hosts: int = 10,
    words_per_line: int = 8,
) -> DataFrame:
    """Deterministic host-structured view of the flat test corpus: host
    = doc_id % n_hosts, text cut into ``words_per_line``-word lines,
    then the host's nav header prepended and its footer appended —
    verbatim template lines on EVERY page of the host, which is
    exactly what the detector must find (and content lines must
    survive unless genuinely repeated host-wide). Pure column math
    with an identical SQL twin."""
    i = F.col(id_col)
    host = F.concat(F.lit("site"), (i % n_hosts).cast("string"),
                    F.lit(".example"))
    toks = F.split(F.col(text_col), " ")
    nl = F.ceil(F.size(toks) / F.lit(float(words_per_line))).cast("int")
    body = F.transform(
        F.sequence(F.lit(0), nl - 1),
        lambda j: F.array_join(
            F.slice(toks, j * words_per_line + 1, words_per_line), " "
        ),
    )
    nav = F.concat(F.lit("home about contact "), host)
    footer = F.concat(F.lit("(c) 2024 "), host, F.lit(" all rights"))
    t2 = F.concat_ws(
        "\n", nav, F.array_join(body, "\n"), footer
    )
    return df.select(
        i, host.alias("host"), t2.alias(text_col)
    )


def with_synth_host_pages_sql(
    text: str = "text",
    id_col: str = "doc_id",
    table: str = "documents",
    n_hosts: int = 10,
    words_per_line: int = 8,
) -> str:
    """Twin of with_synth_host_pages -> SELECT (id, host, text)."""
    w = words_per_line
    host = f"concat('site', CAST({id_col} % {n_hosts} AS VARCHAR), '.example')"
    body = (
        f"array_to_string(list_transform("
        f"range(0, CAST(ceil(len(string_split({text}, ' '))"
        f" * 1.0 / {w}) AS INT)), j -> "
        f"array_to_string(list_slice(string_split({text}, ' '),"
        f" j * {w} + 1, j * {w} + {w}), ' ')), chr(10))"
    )
    return (
        f"SELECT {id_col}, {host} AS host, "
        f"concat('home about contact ', {host}, chr(10), {body}, chr(10),"
        f" '(c) 2024 ', {host}, ' all rights') AS {text} "
        f"FROM {table}"
    )

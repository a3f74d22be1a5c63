"""Obfuscation-robust blocked-term screening — the word-list content
filter every production curation stack runs (C4 §2.2 dropped pages via
a "bad words" list), hardened against the standard evasions:
leetspeak digits/symbols (sp4m, $pam), case, and character stretching
(spaaaam).

Normalization is pure column math (no UDF): lowercase, a fixed 1:1
leet map via ``translate`` (0→o 1→i 3→e 4→a 5→s 7→t @→a $→s), then
runs of 3+ of the same letter collapsed to one — 3+ so legitimate
doubles like "letter" survive. The collapse is 26 chained per-letter
``x{3,} → x`` replaces, NOT a backreference pattern: DuckDB's RE2
does not support backreferences (it silently matches nothing), so the
portable form is the per-letter chain on BOTH engines. Matching
tokenizes the normalized text on non-letters (punctuation-embedded
evasion "s.p.a.m" is out of scope — documented, not silently half
handled) and broadcast-joins the normalized term list.

Plan: map-only normalize + explode, ONE broadcast join (the term list
is dimension-sized), one doc-keyed combinable rollup. Scale-clean at
any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdal_spark.session import ensure_min_partitions

LEET_FROM = "013457@$"
LEET_TO = "oieastas"


_LETTERS = "abcdefghijklmnopqrstuvwxyz"


def _normalize(c):
    x = F.translate(F.lower(c), LEET_FROM, LEET_TO)
    for ch in _LETTERS:
        x = F.regexp_replace(x, ch + "{3,}", ch)
    return x


def blocked_terms(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_hits, n_distinct_terms, blocked): per-doc blocked-term
    tally over the normalized token stream; blocked = n_hits > 0.
    Docs with zero hits are INCLUDED (the filter needs both verdicts).
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    norm_terms = sorted(
        {t for t in (_norm_py(t) for t in terms) if t}
    )
    df = ensure_min_partitions(df)
    spark = df.sparkSession
    tdf = spark.createDataFrame(
        [(t,) for t in norm_terms], "term string"
    )
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(_normalize(F.col(text_col)), r"[^a-z]+"),
                lambda s: s != "",
            )
        ).alias("term"),
    )
    hits = (
        toks.join(F.broadcast(tdf), "term")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_hits"),
            F.count_distinct("term").alias("n_distinct_terms"),
        )
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.coalesce("n_distinct_terms", F.lit(0)).alias(
                "n_distinct_terms"
            ),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("blocked"),
        )
    )


def _norm_py(t: str) -> str:
    import re

    x = t.lower().translate(str.maketrans(LEET_FROM, LEET_TO))
    for ch in _LETTERS:
        x = re.sub(ch + "{3,}", ch, x)
    return x


def blocked_terms_sql(
    terms: list[str],
    table: str = "documents",
    text: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin (identical translate map, collapse regex, and
    non-letter tokenization)."""
    norm_terms = sorted({t for t in (_norm_py(t) for t in terms) if t})
    lits = ", ".join("('" + t.replace("'", "''") + "')" for t in norm_terms)
    norm = f"translate(lower({text}), '{LEET_FROM}', '{LEET_TO}')"
    for ch in _LETTERS:
        norm = f"regexp_replace({norm}, '{ch}{{3,}}', '{ch}', 'g')"
    return f"""
WITH terms(term) AS (VALUES {lits}),
toks AS (
  SELECT {id_col}, t AS term
  FROM (
    SELECT {id_col},
           unnest(string_split_regex({norm}, '[^a-z]+')) AS t
    FROM {table}
  ) WHERE t <> ''
),
hits AS (
  SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_hits,
         CAST(count(DISTINCT term) AS BIGINT) AS n_distinct_terms
  FROM toks JOIN terms USING (term) GROUP BY {id_col}
)
SELECT d.{id_col} AS {id_col},
       coalesce(n_hits, 0) AS n_hits,
       coalesce(n_distinct_terms, 0) AS n_distinct_terms,
       coalesce(n_hits, 0) > 0 AS blocked
FROM (SELECT {id_col} FROM {table}) d
LEFT JOIN hits USING ({id_col})
""".strip()

"""C4 cleaning rules (Raffel et al., arXiv:1910.10683 §2.2).

The other canonical named web-text filter (Gopher's quality bundle
lives in `quality_rules.py`): C4 cleans at the LINE level and then
judges the page. Rules implemented, in the paper's order:

  * keep only lines that end in terminal punctuation (. ! ? ")
  * drop lines with fewer than ``min_line_words`` words (paper: 3... the
    paper keeps pages with >= 3 sentences; the widely-used c4 reference
    implementation also drops short lines — both knobs are parameters)
  * drop any line containing the word "javascript" (case-insensitive)
  * drop the PAGE if it contains "lorem ipsum" (case-insensitive)
  * drop the PAGE if it contains a curly brace '{'
  * drop the PAGE if fewer than ``min_lines`` lines survive

Output is the cleaned page (surviving lines re-joined) plus the
bookkeeping columns a curation run audits (lines in/out, drop reason
flags).

Scale shape: split -> list_filter -> re-join, all per-row column
expressions — map-only, no UDF, no shuffle, same contract as
`gopher_rules`. Zero-line pages yield empty text and c4_keep=false.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["c4_clean", "c4_clean_sql", "with_synth_lines",
           "with_synth_lines_sql"]

_TERMINALS = ('.', '!', '?', '"')


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_line_words: int = 3,
    min_lines: int = 1,
) -> DataFrame:
    """-> (id, n_lines, n_kept_lines, has_lorem, has_brace, clean_text,
    c4_keep)."""
    t = F.col(text_col)
    lines = F.filter(F.split(t, "\n"), lambda l: F.trim(l) != "")
    term = F.lit(list(_TERMINALS))

    def _line_ok(l):
        lt = F.trim(l)
        ends = F.array_contains(term, F.substring(lt, -1, 1))
        n_words = F.size(F.filter(F.split(lt, " "), lambda w: w != ""))
        no_js = ~F.lower(lt).contains("javascript")
        return ends & (n_words >= min_line_words) & no_js

    kept = F.filter(lines, _line_ok)
    has_lorem = F.lower(t).contains("lorem ipsum")
    has_brace = t.contains("{")
    n_kept = F.size(kept)
    keep = (~has_lorem) & (~has_brace) & (n_kept >= min_lines)
    return df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        F.array_join(kept, "\n").alias("clean_text"),
        keep.alias("c4_keep"),
    )


def with_synth_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int = 8,
) -> DataFrame:
    """Deterministic line-structured view of a flat one-line corpus (the
    test tables carry no newlines or punctuation): cut into
    ``words_per_line``-word lines, terminate EVEN lines with '.', leave
    odd lines bare (c4 drops them), and append ' {' to every 7th page
    (c4 drops the page). Pure column math with an identical SQL twin —
    exercises every rule on data that otherwise has none of them."""
    toks = F.split(F.col(text_col), " ")
    nl = F.ceil(F.size(toks) / F.lit(float(words_per_line))).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), nl - 1),
        lambda i: F.concat(
            F.array_join(F.slice(toks, i * words_per_line + 1,
                                 words_per_line), " "),
            F.when(i % 2 == 0, F.lit(".")).otherwise(F.lit("")),
        ),
    )
    t2 = F.concat(
        F.array_join(lines, "\n"),
        F.when(F.col(id_col) % 7 == 0, F.lit(" {")).otherwise(F.lit("")),
    )
    return df.withColumn(text_col, t2)


def with_synth_lines_sql(
    text: str = "text",
    id_col: str = "doc_id",
    table: str = "documents",
    words_per_line: int = 8,
) -> str:
    """Twin of with_synth_lines: -> SELECT with the rewritten text."""
    w = words_per_line
    lines = (
        f"list_transform(range(0, CAST(ceil(len(string_split({text}, ' '))"
        f" * 1.0 / {w}) AS INT)), i -> "
        f"array_to_string(list_slice(string_split({text}, ' '),"
        f" i * {w} + 1, i * {w} + {w}), ' ')"
        f" || CASE WHEN i % 2 = 0 THEN '.' ELSE '' END)"
    )
    return (
        f"SELECT * REPLACE (array_to_string({lines}, chr(10))"
        f" || CASE WHEN {id_col} % 7 = 0 THEN ' {{' ELSE '' END"
        f" AS {text}) FROM {table}"
    )


def c4_clean_sql(
    text: str = "text",
    id_col: str = "doc_id",
    table: str = "documents",
    min_line_words: int = 3,
    min_lines: int = 1,
) -> str:
    """DuckDB twin — identical line algebra. Note: Spark's
    substring(s, -1, 1) of an empty string and DuckDB's s[-1:] both
    yield '' (never in kept lines — empties are pre-filtered)."""
    terms = "['.', '!', '?', '\"']"
    line_ok = (
        f"list_contains({terms}, substr(trim(l), length(trim(l)), 1))"
        f" AND len(list_filter(string_split(trim(l), ' '), w -> w <> ''))"
        f" >= {min_line_words}"
        f" AND NOT contains(lower(trim(l)), 'javascript')"
    )
    return f"""
      WITH base AS (
        SELECT {id_col},
          list_filter(string_split({text}, chr(10)),
                      l -> trim(l) <> '') AS ls,
          contains(lower({text}), 'lorem ipsum') AS has_lorem,
          contains({text}, '{{') AS has_brace
        FROM {table}
      ),
      m AS (
        SELECT {id_col}, len(ls) AS n_lines,
               list_filter(ls, l -> {line_ok}) AS kept,
               has_lorem, has_brace
        FROM base
      )
      SELECT {id_col}, n_lines, len(kept) AS n_kept_lines,
             has_lorem, has_brace,
             coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
             (NOT has_lorem AND NOT has_brace
              AND len(kept) >= {min_lines}) AS c4_keep
      FROM m
    """

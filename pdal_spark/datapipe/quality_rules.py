"""Gopher quality-rule bundle (Rae et al., arXiv:2112.11446, Table A1).

The standard pre-training document filter: a document survives iff it
passes ALL of the word-count / word-shape / symbol / line-shape /
stop-word rules. The repetition half of Gopher's appendix (dup/top
n-gram fractions) lives in `datapipe/repetition.py`; this module is the
quality half. Thresholds default to the paper's published values and
are parameters — corpora tune them, the rule SET is the standard.

Scale shape: pure per-row column expressions (split + array folds) — no
UDF, no shuffle, no state. At 100 TB this is a map-only pass fused into
whatever scan already runs; Catalyst prunes to (id, text).

Division guards: zero-word / zero-line documents yield NULL ratios in
Spark and NaN in DuckDB — every ratio is wrapped in a `n > 0` guard on
BOTH sides so engines agree (the ADVICE.md quality_score lesson).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["gopher_rules", "gopher_rules_sql", "STOPWORDS"]

# the paper's 8-word "stop word" list (§A1.1: "contains at least two of
# the following English words: the, be, to, of, and, that, have, with")
STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

# symbols counted against words: hash and ellipsis forms (paper: "#" and
# "...")
_BULLETS = ("-", "*", "•")


def _words(text: Column) -> Column:
    return F.filter(F.split(text, " "), lambda w: w != "")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
    keep_all: bool = False,
) -> DataFrame:
    """-> (id, n_words, mean_word_len, symbol_ratio, bullet_frac,
    ellipsis_frac, alpha_frac, n_stopwords, pass_* flags, gopher_pass).
    ``keep_all=True`` keeps every input column alongside the flags
    (still map-only — pipelines filter on gopher_pass without a
    join-back).

    Ratios are rounded to 6 decimals (both engines) so the driver's
    exact hash compare is stable under accumulation order."""
    t = F.col(text_col)
    words = _words(t)
    nw = F.size(words)
    total_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
    )
    mean_len = F.when(nw > 0, F.round(total_len / nw, 6))
    n_symbols = (
        F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
        + F.size(F.split(t, r"\.\.\.")) - 1
        + F.size(F.split(t, "…")) - 1
    )
    symbol_ratio = F.when(nw > 0, F.round(n_symbols / nw, 6))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    alpha_frac = F.when(nw > 0, F.round(n_alpha / nw, 6))
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(words),
            F.array(*[F.lit(s) for s in STOPWORDS]),
        )
    )
    lines = F.filter(F.split(t, "\n"), lambda l: F.trim(l) != "")
    nl = F.size(lines)
    bullet_pred = lambda l: (  # noqa: E731
        F.substring(F.trim(l), 1, 1).isin(*_BULLETS)
    )
    n_bullet = F.size(F.filter(lines, bullet_pred))
    ell = lambda l: (  # noqa: E731
        F.trim(l).endswith("...") | F.trim(l).endswith("…")
    )
    n_ellipsis = F.size(F.filter(lines, ell))
    bullet_frac = F.when(nl > 0, F.round(n_bullet / nl, 6))
    ellipsis_frac = F.when(nl > 0, F.round(n_ellipsis / nl, 6))

    lead: list = [F.col(c) for c in df.columns] if keep_all else [F.col(id_col)]
    out = df.select(
        *lead,
        nw.alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_frac.alias("alpha_frac"),
        n_stop.alias("n_stopwords"),
    )
    p_count = (F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)
    p_len = (
        F.col("mean_word_len").isNotNull()
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
    )
    p_sym = F.coalesce(F.col("symbol_ratio") <= max_symbol_ratio, F.lit(False))
    p_line = (
        F.coalesce(F.col("bullet_frac") <= max_bullet_frac, F.lit(True))
        & F.coalesce(F.col("ellipsis_frac") <= max_ellipsis_frac, F.lit(True))
    )
    p_alpha = F.coalesce(F.col("alpha_frac") >= min_alpha_frac, F.lit(False))
    p_stop = F.col("n_stopwords") >= min_stopwords
    return out.select(
        "*",
        p_count.alias("pass_word_count"),
        p_len.alias("pass_word_len"),
        p_sym.alias("pass_symbols"),
        p_line.alias("pass_lines"),
        p_alpha.alias("pass_alpha"),
        p_stop.alias("pass_stopwords"),
        (p_count & p_len & p_sym & p_line & p_alpha & p_stop).alias(
            "gopher_pass"
        ),
    )


def gopher_rules_sql(
    text: str = "text",
    id_col: str = "doc_id",
    table: str = "documents",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
) -> str:
    """DuckDB twin — identical splits, guards, and 6-decimal rounding."""
    stop = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    bullets = "['-', '*', chr(8226)]"
    return f"""
      WITH base AS (
        SELECT {id_col},
          list_filter(string_split({text}, ' '), w -> w <> '') AS ws,
          list_filter(string_split({text}, chr(10)),
                      l -> trim(l) <> '') AS ls,
          {text} AS t
        FROM {table}
      ),
      m AS (
        SELECT {id_col},
          len(ws) AS n_words,
          CASE WHEN len(ws) > 0 THEN round(
            list_aggregate(list_transform(ws, w -> length(w)), 'sum')
            * 1.0 / len(ws), 6) END AS mean_word_len,
          CASE WHEN len(ws) > 0 THEN round(
            (length(t) - length(replace(t, '#', ''))
             + len(string_split(t, '...')) - 1
             + len(string_split(t, chr(8230))) - 1) * 1.0 / len(ws), 6)
          END AS symbol_ratio,
          CASE WHEN len(ls) > 0 THEN round(
            len(list_filter(ls, l -> list_contains({bullets},
                substr(trim(l), 1, 1)))) * 1.0 / len(ls), 6)
          END AS bullet_frac,
          CASE WHEN len(ls) > 0 THEN round(
            len(list_filter(ls, l -> trim(l) LIKE '%...'
                OR trim(l) LIKE '%' || chr(8230))) * 1.0 / len(ls), 6)
          END AS ellipsis_frac,
          CASE WHEN len(ws) > 0 THEN round(
            len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]')))
            * 1.0 / len(ws), 6) END AS alpha_frac,
          len(list_intersect(list_distinct(ws), {stop})) AS n_stopwords
        FROM base
      )
      SELECT *,
        (n_words >= {min_words} AND n_words <= {max_words})
          AS pass_word_count,
        (mean_word_len IS NOT NULL AND mean_word_len >= {min_mean_word_len}
         AND mean_word_len <= {max_mean_word_len}) AS pass_word_len,
        coalesce(symbol_ratio <= {max_symbol_ratio}, FALSE) AS pass_symbols,
        (coalesce(bullet_frac <= {max_bullet_frac}, TRUE)
         AND coalesce(ellipsis_frac <= {max_ellipsis_frac}, TRUE))
          AS pass_lines,
        coalesce(alpha_frac >= {min_alpha_frac}, FALSE) AS pass_alpha,
        (n_stopwords >= {min_stopwords}) AS pass_stopwords,
        ((n_words >= {min_words} AND n_words <= {max_words})
         AND (mean_word_len IS NOT NULL
              AND mean_word_len >= {min_mean_word_len}
              AND mean_word_len <= {max_mean_word_len})
         AND coalesce(symbol_ratio <= {max_symbol_ratio}, FALSE)
         AND (coalesce(bullet_frac <= {max_bullet_frac}, TRUE)
              AND coalesce(ellipsis_frac <= {max_ellipsis_frac}, TRUE))
         AND coalesce(alpha_frac >= {min_alpha_frac}, FALSE)
         AND (n_stopwords >= {min_stopwords})) AS gopher_pass
      FROM m
    """

"""Gopher-style repetition signals over the documents table.

Rahman-Johnson et al., "Scaling Language Models: Methods, Analysis &
Insights from Training Gopher" (arXiv:2112.11446, §A1.1) filter
documents by n-gram repetition: the fraction of content covered by the
single most frequent n-gram, and the fraction covered by n-grams that
occur more than once. Documents here are single-space word streams, so
the signals are word-position fractions:

  top{n}_frac  =  count(modal n-gram) / total n-gram positions
  dup{n}_frac  =  sum(count of grams with count > 1) / total positions

plus the modal-word fraction (n = 1) and the word-distribution Shannon
entropy (bits) as a combined repetitiveness score.

Scale shape: one shuffle per n on (doc_id, gram) — doc-local keys, so
cardinality ~ corpus positions and no hot key can exceed one document's
length; the per-doc rollup reuses the same partitioning (Catalyst sees
groupBy(doc_id, gram) then groupBy(doc_id) — the second agg is
partial-aggregated map-side). All fractions are exact integer/integer
doubles — bit-identical in Spark and DuckDB; entropy is rounded on both
sides.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ngrams(words: Column, n: int) -> Column:
    """Array of space-joined word n-grams (empty if fewer than n words)."""
    if n == 1:
        return words
    # sequence(1, 0) steps DOWN to [1, 0] in Spark — guard short docs
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _per_n(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    g = df.select(
        F.col(id_col),
        F.explode(_ngrams(F.split(F.col(text_col), " "), n)).alias("gram"),
    )
    counts = g.groupBy(id_col, "gram").agg(F.count("*").alias("cnt"))
    return counts.groupBy(id_col).agg(
        (F.max("cnt") / F.sum("cnt")).alias(f"top{n}_frac"),
        (
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0)))
            / F.sum("cnt")
        ).alias(f"dup{n}_frac"),
    )


def _entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    w = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("gram"),
    )
    counts = w.groupBy(id_col, "gram").agg(F.count("*").alias("cnt"))
    tot = counts.groupBy(id_col).agg(F.sum("cnt").alias("tot"))
    return (
        counts.join(tot, id_col)
        .groupBy(id_col)
        .agg(
            F.round(
                -F.sum(
                    (F.col("cnt") / F.col("tot"))
                    * F.log2(F.col("cnt") / F.col("tot"))
                ),
                6,
            ).alias("word_entropy")
        )
    )


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = (1, 2, 3),
    entropy: bool = True,
) -> DataFrame:
    """Per-document repetition signal table: id, top{n}_frac /
    dup{n}_frac per n, and word_entropy (bits, rounded to 1e-6)."""
    parts = [_per_n(df, id_col, text_col, n) for n in ns]
    if entropy:
        parts.append(_entropy(df, id_col, text_col))
    return reduce(lambda a, b: a.join(b, id_col), parts)


def repetition_sql(
    table: str = "documents",
    text: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = (1, 2, 3),
    entropy: bool = True,
) -> str:
    """DuckDB twin of repetition_signals (1-based list slicing)."""
    subs = []
    for n in ns:
        if n == 1:
            grams = f"string_split({text}, ' ')"
        else:
            grams = (
                f"list_transform(range(1, greatest(len(string_split({text}"
                f", ' ')) - {n - 1}, 0) + 1), i -> array_to_string("
                f"string_split({text}, ' ')[i:i+{n - 1}], ' '))"
            )
        subs.append(
            f"""x{n} AS (
              SELECT {id_col},
                     max(cnt) / CAST(sum(cnt) AS DOUBLE) AS top{n}_frac,
                     sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)
                       / CAST(sum(cnt) AS DOUBLE) AS dup{n}_frac
              FROM (
                SELECT {id_col}, gram, count(*) AS cnt
                FROM (SELECT {id_col}, unnest({grams}) AS gram FROM {table})
                GROUP BY {id_col}, gram
              ) GROUP BY {id_col}
            )"""
        )
    if entropy:
        subs.append(
            f"""xe AS (
              SELECT {id_col},
                     round(-sum((cnt / tot) * log2(cnt / tot)), 6)
                       AS word_entropy
              FROM (
                SELECT {id_col}, gram, CAST(count(*) AS DOUBLE) AS cnt,
                       CAST(sum(count(*)) OVER (PARTITION BY {id_col})
                            AS DOUBLE) AS tot
                FROM (SELECT {id_col},
                             unnest(string_split({text}, ' ')) AS gram
                      FROM {table})
                GROUP BY {id_col}, gram
              ) GROUP BY {id_col}
            )"""
        )
    cols = [f"x{ns[0]}.{id_col}"]
    for n in ns:
        cols += [f"top{n}_frac", f"dup{n}_frac"]
    if entropy:
        cols.append("word_entropy")
    base = f"x{ns[0]}"
    join_sql = base
    for n in ns[1:]:
        join_sql += f" JOIN x{n} USING ({id_col})"
    if entropy:
        join_sql += f" JOIN xe USING ({id_col})"
    return (
        "WITH " + ",\n".join(subs) + "\nSELECT " + ", ".join(cols)
        + " FROM " + join_sql
    )

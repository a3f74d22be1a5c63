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


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = (1, 2, 3),
    entropy: bool = True,
) -> DataFrame:
    """Per-document repetition signal table: id, top{n}_frac /
    dup{n}_frac per n, and word_entropy (bits, rounded to 1e-6).

    Fused plan: ONE explode over all n (grams tagged with their n) and
    TWO shuffles total — (id, n, gram) counts, then one conditional
    aggregate per signal in a single groupBy(id) (map-side partials on
    both). Entropy shares the n=1 counts via the algebraic identity
    -sum(p*log2 p) = log2(tot) - sum(cnt*log2 cnt)/tot; the SQL twin
    (repetition_sql) uses the identical formula so the rounded doubles
    compare bit-for-bit."""
    words = F.split(F.col(text_col), " ")
    ns_all = ns if (not entropy or 1 in ns) else (1, *ns)

    def _tag(n: int):
        # single-arg lambda only: F.transform treats a 2-arg callable as
        # (element, index) and would pass the array INDEX as the second
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    tagged = F.flatten(
        F.array(*[F.transform(_ngrams(words, n), _tag(n)) for n in ns_all])
    )
    from pdal_spark.session import ensure_min_partitions

    df = ensure_min_partitions(df)
    g = df.select(F.col(id_col), F.explode(tagged).alias("_t")).select(
        id_col, F.col("_t.n").alias("n"), F.col("_t.gram").alias("gram")
    )
    counts = g.groupBy(id_col, "n", "gram").agg(F.count("*").alias("cnt"))
    cnt_n = lambda n: F.when(F.col("n") == n, F.col("cnt"))  # noqa: E731
    aggs = []
    for n in ns:
        tot = F.sum(cnt_n(n))
        aggs.append((F.max(cnt_n(n)) / tot).alias(f"top{n}_frac"))
        aggs.append(
            (
                F.sum(
                    F.when(
                        (F.col("n") == n) & (F.col("cnt") > 1), F.col("cnt")
                    ).otherwise(F.lit(0))
                )
                / tot
            ).alias(f"dup{n}_frac")
        )
    if entropy:
        tot = F.sum(cnt_n(1)).cast("double")  # word level
        aggs.append(
            F.round(
                F.log2(tot)
                - F.sum(
                    F.when(
                        F.col("n") == 1,
                        F.col("cnt").cast("double")
                        * F.log2(F.col("cnt").cast("double")),
                    )
                )
                / tot,
                6,
            ).alias("word_entropy")
        )
    out = counts.groupBy(id_col).agg(*aggs)
    # inner-join contract of the per-n formulation (and the SQL twin):
    # a doc too short to have any n-gram at the largest n drops out
    keep = reduce(
        lambda a, b: a & b,
        [F.col(f"top{n}_frac").isNotNull() for n in ns],
    )
    return out.filter(keep)


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
                     round(log2(sum(cnt)) - sum(cnt * log2(cnt)) / sum(cnt),
                           6) AS word_entropy
              FROM (
                SELECT {id_col}, gram, CAST(count(*) AS DOUBLE) AS cnt
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

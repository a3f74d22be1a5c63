"""Frequent co-occurring term pairs — market-basket mining over
documents (Agrawal & Srikant, VLDB 1994 Apriori, in the two-pass
distributed form every MapReduce text stack ships): a document's
basket is its distinct words; a pair is frequent if it co-occurs in
>= min_support documents. Topic pairs surface ("machine", "learning"
any distance apart — unlike collocations.py, which requires
ADJACENCY), and support-capped baskets catch template families.

Exactness by Apriori monotonicity, not sampling: pass 1 counts item
document-frequencies (one combinable exchange) and keeps items with
df >= min_support — a frequent PAIR's items are both frequent, so the
prune cannot lose answers; pass 2 builds each doc's pruned sorted
basket (one doc-keyed exchange) and counts exploded index pairs (one
pair exchange). No candidate ever needs a recount: the counts ARE
exact, which is why the oracle is the plain SQL self-join.

Scale guard: a doc whose pruned basket exceeds max_basket would emit
O(max_basket²) pairs (quadratic per-doc fan-out — the hot-document
analog of the cocitation hub guard); such docs are REFUSED by default
(explicit bound, the kleinberg/sample contract) rather than silently
truncated, since truncation would break exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdal_spark.session import ensure_min_partitions


def frequent_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_support: int = 5,
    max_basket: int = 500,
) -> DataFrame:
    """(item_a, item_b, support): word pairs co-occurring in >=
    min_support documents (item_a < item_b lexicographically)."""
    if min_support < 1:
        raise ValueError("min_support must be >= 1")
    df = ensure_min_partitions(df)
    items = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array_distinct(F.split(F.col(text_col), " "))
        ).alias("w"),
    )
    keep = (
        items.groupBy("w")
        .agg(F.count("*").alias("df_cnt"))
        .filter(F.col("df_cnt") >= min_support)
        .select("w")
    )
    baskets = (
        items.join(keep, "w")
        .groupBy("doc")
        .agg(F.array_sort(F.collect_list("w")).alias("ws"))
    )
    n = F.size("ws")
    checked = baskets.withColumn(
        "ws",
        F.when(n <= max_basket, F.col("ws")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("frequent_pairs: basket of "),
                    n.cast("string"),
                    F.lit(f" frequent items > max_basket={max_basket}; "),
                    F.lit(
                        "raise min_support or pre-split the document"
                    ),
                )
            )
        ),
    )
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - 1, F.lit(0))),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.struct(
                    F.element_at(F.col("ws"), i).alias("item_a"),
                    F.element_at(F.col("ws"), j).alias("item_b"),
                ),
            ),
        )
    )
    return (
        checked.filter(n >= 2)
        .select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.item_a").alias("item_a"),
            F.col("p.item_b").alias("item_b"),
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= min_support)
    )


def frequent_pairs_sql(
    table: str = "documents",
    text: str = "text",
    id_col: str = "doc_id",
    min_support: int = 5,
) -> str:
    """DuckDB twin: plain distinct-item self-join — valid as an oracle
    precisely because the engine's Apriori prune is exact."""
    return f"""
WITH items AS (
  SELECT DISTINCT {id_col} AS doc, w
  FROM (SELECT {id_col},
               unnest(string_split({text}, ' ')) AS w FROM {table})
)
SELECT a.w AS item_a, b.w AS item_b,
       CAST(count(*) AS BIGINT) AS support
FROM items a JOIN items b ON a.doc = b.doc AND a.w < b.w
GROUP BY 1, 2
HAVING count(*) >= {int(min_support)}
""".strip()

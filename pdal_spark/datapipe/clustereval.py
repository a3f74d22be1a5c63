"""Clustering-agreement metrics — Adjusted Rand Index (Hubert &
Arabie 1985) between two labelings of the same items: THE standard
score for "do these two partitions agree beyond chance", used here to
compare dedup clusterings (minhash components vs SemDeDup), audit
whether sources are language-pure, or validate a cheap clustering
against an expensive one before switching.

Pair-counting form over the contingency table:

    index     = Σ_ij C(n_ij, 2)
    expected  = Σ_i C(a_i, 2) · Σ_j C(b_j, 2) / C(n, 2)
    max_index = ½ [Σ_i C(a_i, 2) + Σ_j C(b_j, 2)]
    ARI       = (index − expected) / (max_index − expected)

Distributed shape: one id-keyed equi-join aligns the labelings, one
(label_a, label_b) exchange builds the contingency table, and the
margins are re-aggregations of it (the corpus is scanned once per
side). Every C(x,2) = x·(x−1)/2 is exact BIGINT math (cell and margin
counts are < 2^31 here, so x·(x−1) fits); the three Σ terms are exact
integer sums — order-free — and only the final expected/ARI divisions
are doubles (products of Σ terms go through double to dodge the int64
n⁴ bound). Degenerate inputs (all pairs agree or single cluster both
sides) emit ARI = 1.0 via the max_index == expected guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _c2(col):
    return (col * (col - F.lit(1)) / F.lit(2)).cast("long")


def adjusted_rand(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    label_a: str = "label_a",
    label_b: str = "label_b",
) -> DataFrame:
    """One-row result: (n_items, n_clusters_a, n_clusters_b, ari).
    Items present in only one labeling are dropped (inner join — ARI
    is defined over the common item set)."""
    j = a.select(F.col(id_col), F.col(label_a).alias("_la")).join(
        b.select(F.col(id_col), F.col(label_b).alias("_lb")), id_col
    )
    cont = j.groupBy("_la", "_lb").agg(F.count("*").alias("nij"))
    cells = cont.agg(
        F.sum(_c2(F.col("nij"))).alias("s_idx"),
        F.sum("nij").alias("n"),
    )
    rows = (
        cont.groupBy("_la")
        .agg(F.sum("nij").alias("ai"))
        .agg(
            F.sum(_c2(F.col("ai"))).alias("s_a"),
            F.count("*").alias("ka"),
        )
    )
    cols = (
        cont.groupBy("_lb")
        .agg(F.sum("nij").alias("bj"))
        .agg(
            F.sum(_c2(F.col("bj"))).alias("s_b"),
            F.count("*").alias("kb"),
        )
    )
    one = cells.join(F.broadcast(rows)).join(F.broadcast(cols))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    c2n = _c2(F.col("n")).cast("double")
    expected = d("s_a") * d("s_b") / c2n
    max_idx = (d("s_a") + d("s_b")) / 2.0
    ari = F.when(
        max_idx == expected, F.lit(1.0)
    ).otherwise(F.round((d("s_idx") - expected) / (max_idx - expected), 6))
    return one.select(
        F.col("n").alias("n_items"),
        F.col("ka").alias("n_clusters_a"),
        F.col("kb").alias("n_clusters_b"),
        ari.alias("ari"),
    )


def adjusted_rand_sql(
    a_sql: str,
    b_sql: str,
    id_col: str = "doc_id",
    label_a: str = "label_a",
    label_b: str = "label_b",
) -> str:
    """DuckDB twin: identical contingency algebra and double sequence.
    a_sql/b_sql must yield (id_col, label_a) / (id_col, label_b)."""
    c2 = lambda x: f"CAST({x} * ({x} - 1) / 2 AS BIGINT)"  # noqa: E731
    return f"""
WITH j AS (
  SELECT a.{label_a} AS la, b.{label_b} AS lb
  FROM ({a_sql}) a JOIN ({b_sql}) b USING ({id_col})
),
cont AS (SELECT la, lb, count(*) AS nij FROM j GROUP BY la, lb),
cells AS (
  SELECT CAST(sum({c2('nij')}) AS BIGINT) AS s_idx,
         CAST(sum(nij) AS BIGINT) AS n
  FROM cont
),
rows_m AS (
  SELECT CAST(sum({c2('ai')}) AS BIGINT) AS s_a,
         CAST(count(*) AS BIGINT) AS ka
  FROM (SELECT la, CAST(sum(nij) AS BIGINT) AS ai FROM cont GROUP BY la)
),
cols_m AS (
  SELECT CAST(sum({c2('bj')}) AS BIGINT) AS s_b,
         CAST(count(*) AS BIGINT) AS kb
  FROM (SELECT lb, CAST(sum(nij) AS BIGINT) AS bj FROM cont GROUP BY lb)
)
SELECT n AS n_items, ka AS n_clusters_a, kb AS n_clusters_b,
  CASE WHEN (CAST(s_a AS DOUBLE) + CAST(s_b AS DOUBLE)) / 2.0
            = CAST(s_a AS DOUBLE) * CAST(s_b AS DOUBLE)
              / CAST({c2('n')} AS DOUBLE)
       THEN 1.0
       ELSE round(
         (CAST(s_idx AS DOUBLE)
           - CAST(s_a AS DOUBLE) * CAST(s_b AS DOUBLE)
             / CAST({c2('n')} AS DOUBLE))
         / ((CAST(s_a AS DOUBLE) + CAST(s_b AS DOUBLE)) / 2.0
           - CAST(s_a AS DOUBLE) * CAST(s_b AS DOUBLE)
             / CAST({c2('n')} AS DOUBLE)), 6)
       END AS ari
FROM cells CROSS JOIN rows_m CROSS JOIN cols_m
""".strip()

"""Inbound anchor-text aggregation (link-graph text signals).

Search and crawl pipelines aggregate the anchor text of a page's
inbound links into a per-page profile — anchors describe the TARGET
better than the target's own boilerplate (the classic web-IR signal),
and anchor diversity is a spam/quality feature. This module computes,
per link target:

    n_inlinks          total inbound links
    n_distinct_anchors distinct anchor strings
    top_anchor         most frequent anchor (ties -> lexicographically
                       smallest — deterministic at any parallelism)
    top_anchor_n       its count

Scale shape: one exchange keyed (dst, anchor) with map-side partial
counts (the wide pass — spreading a mega-target's inbound edges over
its distinct anchors), then one dst-keyed rollup that both finishes
the totals AND picks the argmax anchor via max_by over the (count,
reversed-anchor-order) struct — no window, no second scan. Distinct
src is counted with count(DISTINCT ...) inside the rollup of
pre-deduplicated (dst, anchor, src) rows when a caller needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["anchor_profile", "anchor_profile_sql"]


def anchor_profile(
    links: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    anchor_col: str = "anchor",
) -> DataFrame:
    """links (src, dst, anchor) -> per-dst anchor profile."""
    per_anchor = links.groupBy(
        F.col(dst_col).alias("dst"), F.col(anchor_col).alias("anchor")
    ).agg(F.count(F.lit(1)).alias("n"))
    # argmax by (n desc, anchor asc): max_by on a struct whose second
    # field must ORDER ASCENDING under max — impossible for strings
    # directly, so rank pairs with a window-free trick: max over
    # struct(n, anchor) picks the LARGEST anchor among ties; to get the
    # smallest, compare via min_by over struct(-n, anchor) ordering.
    return (
        per_anchor.groupBy("dst")
        .agg(
            F.sum("n").alias("n_inlinks"),
            F.count(F.lit(1)).alias("n_distinct_anchors"),
            F.min_by(
                F.struct(F.col("anchor"), F.col("n")),
                F.struct((-F.col("n")).alias("neg"), F.col("anchor")),
            ).alias("_top"),
        )
        .select(
            "dst",
            "n_inlinks",
            "n_distinct_anchors",
            F.col("_top.anchor").alias("top_anchor"),
            F.col("_top.n").alias("top_anchor_n"),
        )
    )


def anchor_profile_sql(
    links: str,
    src: str = "src",
    dst: str = "dst",
    anchor: str = "anchor",
) -> str:
    """DuckDB twin: identical two-level rollup + (count desc, anchor
    asc) argmax. ``links`` is a sub-select producing (src, dst,
    anchor)."""
    return f"""
      WITH l AS ({links}),
      pa AS (
        SELECT {dst} AS dst, {anchor} AS anchor, count(*) AS n
        FROM l GROUP BY 1, 2
      ),
      tops AS (
        SELECT dst, anchor, n,
               row_number() OVER (
                 PARTITION BY dst ORDER BY n DESC, anchor ASC
               ) AS rk
        FROM pa
      ),
      agg AS (
        SELECT dst, CAST(sum(n) AS BIGINT) AS n_inlinks,
               CAST(count(*) AS BIGINT) AS n_distinct_anchors
        FROM pa GROUP BY dst
      )
      SELECT a.dst, a.n_inlinks, a.n_distinct_anchors,
             t.anchor AS top_anchor, CAST(t.n AS BIGINT) AS top_anchor_n
      FROM agg a JOIN tops t ON t.dst = a.dst AND t.rk = 1
    """

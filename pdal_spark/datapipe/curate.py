"""End-to-end corpus curation: the composed training-data pipeline.

One call chains the standard curation stages the way a production crawl
pipeline runs them (C4/Gopher/CCNet ordering — cheap map-only rules
first, pair-generating dedup last, each stage shrinking the next
stage's input):

  1. quality  — Gopher rule bundle (map-only column math, no shuffle)
  2. exact    — first-occurrence exact dedup (one text-key exchange)
  3. near-dup — n-gram Jaccard pairs -> connected components -> keep
                the smallest member per cluster

Every stage is an existing verified operator (`quality_rules`,
`dedup.exact_dedup`, `dedup.jaccard_pairs`, `dedup.canonicalize`); this
module contributes the composition plus the per-stage attrition ledger
a 100 TB curation run is steered by (which stage removed what — the
number that decides whether a threshold is retuned before burning the
next 10^6 core-hours).

The DuckDB twin (`curate_counts_sql`) replays the WHOLE chain as nested
CTEs — quality flags, windowed exact dedup, pair generation, and the
recursive-CTE transitive closure — so the driver hash-compares the
composed pipeline end to end, not just its pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdal_spark.datapipe import dedup
from pdal_spark.datapipe import quality_rules

__all__ = ["curate", "curate_counts", "curate_counts_sql"]


def curate(
    df: DataFrame,
    min_words: int = 50,
    min_stopwords: int = 2,
    jaccard_threshold: float = 0.5,
    shingle: int = 3,
    id_col: str = "doc_id",
) -> tuple[DataFrame, list[tuple[int, str, DataFrame]]]:
    """Run the three-stage curation chain.

    Returns ``(curated, stages)`` where ``curated`` is the surviving
    corpus (original columns) and ``stages`` is
    ``[(ordinal, name, frame_after_stage), ...]`` including the input
    at ordinal 0 — the attrition ledger's raw material."""
    s1 = (
        quality_rules.gopher_rules(
            df, min_words=min_words, min_stopwords=min_stopwords,
            keep_all=True,
        )
        .filter(F.col("gopher_pass"))
        .select(*df.columns)
    )
    s2 = dedup.exact_dedup(s1, id_col=id_col).select(*df.columns)
    pairs = dedup.jaccard_pairs(
        s2, threshold=jaccard_threshold, shingle=shingle, id_col=id_col
    )
    s3 = (
        dedup.canonicalize(s2, pairs, id_col=id_col)
        .filter(F.col("is_canonical") == 1)
        .select(*df.columns)
    )
    return s3, [(0, "input", df), (1, "quality", s1), (2, "exact", s2),
                (3, "neardup", s3)]


def curate_counts(
    df: DataFrame,
    min_words: int = 50,
    min_stopwords: int = 2,
    jaccard_threshold: float = 0.5,
    shingle: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (stage int, name string, n_docs long): the attrition ledger."""
    _, stages = curate(
        df, min_words=min_words, min_stopwords=min_stopwords,
        jaccard_threshold=jaccard_threshold, shingle=shingle, id_col=id_col,
    )
    parts = [
        frame.agg(
            F.lit(i).alias("stage"),
            F.lit(name).alias("name"),
            F.count("*").alias("n_docs"),
        )
        for i, name, frame in stages
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def curate_counts_sql(
    table: str = "documents",
    text: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    min_stopwords: int = 2,
    jaccard_threshold: float = 0.5,
    shingle: int = 3,
) -> str:
    """DuckDB twin of curate_counts: the full chain as nested CTEs."""
    qsql = quality_rules.gopher_rules_sql(
        text=text, id_col=id_col, table=table,
        min_words=min_words, min_stopwords=min_stopwords,
    )
    exact = dedup.exact_dedup_sql(table="s1", text=text, id_col=id_col)
    prs = dedup.jaccard_pairs_sql(
        jaccard_threshold, table="s2", text=text, id_col=id_col,
        shingle=shingle,
    )
    return f"""
      WITH RECURSIVE qflags AS ({qsql}),
      s1 AS (
        SELECT d.* FROM {table} d
        JOIN qflags q ON d.{id_col} = q.{id_col}
        WHERE q.gopher_pass
      ),
      s2 AS ({exact}),
      prs AS ({prs}),
      reach(id, lab) AS (
        SELECT {id_col}, {id_col} FROM s2
        UNION
        SELECT e.b, r.lab FROM reach r
        JOIN (SELECT id1 AS a, id2 AS b FROM prs
              UNION ALL SELECT id2, id1 FROM prs) e
          ON e.a = r.id
      ),
      s3 AS (
        SELECT id AS {id_col} FROM reach GROUP BY id
        HAVING id = min(lab)
      )
      SELECT 0 AS stage, 'input' AS name, count(*) AS n_docs FROM {table}
      UNION ALL
      SELECT 1, 'quality', count(*) FROM s1
      UNION ALL
      SELECT 2, 'exact', count(*) FROM s2
      UNION ALL
      SELECT 3, 'neardup', count(*) FROM s3
    """

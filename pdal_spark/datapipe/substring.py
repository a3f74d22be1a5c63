"""Repeated-substring (duplicated n-gram span) removal.

The substring-level counterpart of the document/paragraph dedup suite
(Lee et al., "Deduplicating Training Data Makes Language Models Better",
ACL 2022 — the ExactSubstr setting): any word position covered by an
n-gram window that occurs >= ``min_count`` times ACROSS THE CORPUS is
removed from the document. Like the published ExactSubstr tooling, ALL
copies of a duplicated span are dropped (removal is a function of
coverage, not of an arbitrary keep-one choice — that keeps the operator
deterministic and partition-count-invariant).

Pipeline shape (100 TB):

1. explode each doc into its (position, n-gram) windows — pure
   higher-order column functions (``transform``/``slice``), no UDF;
2. corpus-wide occurrence counts via ``groupBy(gram).count()`` — MAP-SIDE
   COMBINED, so a pathological hot gram ("click here to read more ...")
   arrives at the reduce task as one partial row per map task, not one
   row per occurrence;
3. inner-join positions against the >=min_count gram keys — a JOIN, not
   a window, so AQE's skew-join split applies to hot grams;
4. one doc_id exchange collects marked starts per doc, and the kept
   text is rebuilt with ``filter(ws, (w, j) -> ...)`` — again pure
   column expressions.

``gram_mode="hash"`` keys step 2/3 on ``xxhash64`` of the window (8-byte
keys through the exchange — the open-vocabulary scale path, rows-only
oracle); ``gram_mode="gram"`` carries the window text itself and has a
bit-exact DuckDB twin (:func:`substring_dedup_sql`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_positions(
    df: DataFrame, n: int, text_col: str, id_col: str, gram_mode: str
) -> DataFrame:
    """(doc_id, start, gram-key) for every length-n word window."""
    d = df.select(id_col, F.split(F.col(text_col), " ").alias("_ws"))
    # sequence(0, size-n) would run DESCENDING when size < n — guard it
    starts = F.when(
        F.size("_ws") >= n, F.expr(f"sequence(0, size(_ws) - {n})")
    ).otherwise(F.expr("array()"))
    windows = F.transform(
        starts,
        lambda i: F.array_join(F.slice(F.col("_ws"), i + F.lit(1), n), " "),
    )
    grams = d.select(
        id_col, F.posexplode(windows).alias("start", "_gram")
    )
    if gram_mode == "hash":
        return grams.select(id_col, "start", F.xxhash64("_gram").alias("_key"))
    return grams.select(id_col, "start", F.col("_gram").alias("_key"))


def substring_dedup(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    gram_mode: str = "gram",
) -> DataFrame:
    """Remove every word covered by a corpus-duplicated n-gram window.

    Returns (id_col, text_dedup, n_removed) — ``text_dedup`` is the
    surviving words re-joined with single spaces, ``n_removed`` the
    number of word positions dropped.
    """
    if gram_mode not in ("gram", "hash"):
        raise ValueError(f"unknown gram_mode {gram_mode!r}")
    from pdal_spark.session import ensure_min_partitions

    df = ensure_min_partitions(df)
    grams = _gram_positions(df, n, text_col, id_col, gram_mode)
    dup_keys = (
        grams.groupBy("_key")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("_key")
    )
    marks = (
        grams.join(dup_keys, "_key")
        .groupBy(id_col)
        .agg(F.collect_set("start").alias("_starts"))
    )
    d = df.select(id_col, F.split(F.col(text_col), " ").alias("_ws"))
    joined = d.join(marks, id_col, "left").withColumn(
        "_starts", F.coalesce(F.col("_starts"), F.expr("array()"))
    )
    kept = F.filter(
        F.col("_ws"),
        lambda w, j: ~F.exists(
            F.col("_starts"), lambda s: (s <= j) & (j < s + n)
        ),
    )
    return joined.select(
        id_col,
        F.array_join(kept, " ").alias("text_dedup"),
        (F.size("_ws") - F.size(kept)).cast("long").alias("n_removed"),
    )


def substring_dedup_sql(
    table: str = "documents",
    n: int = 8,
    text: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> str:
    """DuckDB twin of :func:`substring_dedup` (gram_mode="gram")."""
    return f"""
      WITH words AS (
        SELECT {id_col}, string_split({text}, ' ') AS ws FROM {table}
      ),
      pos AS (
        SELECT {id_col}, t.i AS start,
               array_to_string(ws[t.i + 1: t.i + {n}], ' ') AS gram
        FROM words, UNNEST(range(len(ws) - {n} + 1)) AS t(i)
        WHERE len(ws) >= {n}
      ),
      dup AS (
        SELECT gram FROM pos GROUP BY gram HAVING count(*) >= {min_count}
      ),
      marked AS (
        SELECT DISTINCT p.{id_col}, u.j
        FROM pos p JOIN dup USING (gram),
             UNNEST(range(p.start, p.start + {n})) AS u(j)
      ),
      expanded AS (
        SELECT w.{id_col}, t.k AS j, ws[t.k + 1] AS word
        FROM words w, UNNEST(range(len(ws))) AS t(k)
      )
      SELECT e.{id_col},
             coalesce(
               string_agg(CASE WHEN m.j IS NULL THEN e.word END, ' '
                          ORDER BY e.j),
               '') AS text_dedup,
             CAST(count(m.j) AS BIGINT) AS n_removed
      FROM expanded e
      LEFT JOIN marked m ON m.{id_col} = e.{id_col} AND m.j = e.j
      GROUP BY e.{id_col}
    """

"""Corpus-statistics diagnostics: per-language Zipf rank-frequency fit
(Zipf 1949; Piantadosi 2014 review) and Heaps/Herdan vocabulary-growth
fit (Heaps 1978) — the standard sanity panel for a crawled corpus
(a healthy natural-language slice fits ln f = a + s·ln r with s near
-1; gibberish, templates and spam bend the curve).

Hash-exactness on an ITERATIVE-free but float-heavy computation uses
the repo's fixed-point contract (the pagerank trick): each regression
point is quantized ONCE per row to integer log-micro-units
(round(ln(v)·1e6) — a single libm call + HALF_UP round, bit-identical
on both engines), the five regression sums are then EXACT BIGINT sums
(order-free, so Spark's partition-varying accumulation order cannot
perturb them), and the slope/intercept are a fixed sequence of double
ops over those exact integers.

Plan shape at 100 TB:
  * one (lang, word) map-side-combinable exchange builds the count
    table; types/tokens per lang are re-aggregations of it;
  * the rank window runs over grouped_topk(max_rank) output — the
    skew-safe two-phase top-k bounds the per-lang window to
    max_rank × partitions rows, so a 90%-English corpus cannot
    single-task the vocabulary (the Zipf fit only uses the top ranks
    anyway — the curve's tail is the known non-Zipfian regime);
  * Heaps points are one (lang, source, word) exchange + rollups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdal_spark.operators.ordered import grouped_topk
from pdal_spark.session import ensure_min_partitions

_MU = 1_000_000.0  # log micro-units


def _mu(v: Column) -> Column:
    """round(ln(v) * 1e6) as BIGINT — the per-row quantization."""
    return F.round(F.log(v.cast("double")) * _MU).cast("long")


def _fit(points: DataFrame, by: str, x: str, y: str) -> DataFrame:
    """Least-squares slope/intercept per group over integer
    micro-unit points: exact BIGINT sums, then one fixed double
    sequence. Groups with a degenerate design (n < 2 or zero
    variance) emit NULLs rather than Inf."""
    s = points.groupBy(by).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(F.col(x) * F.col(x)).alias("sxx"),
        F.sum(F.col(x) * F.col(y)).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxxd, sxyd = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    den = nd * sxxd - sxd * sxd
    slope = (nd * sxyd - sxd * syd) / den
    ok = (F.col("n") >= 2) & (den != 0.0)
    return s.select(
        by,
        F.col("n").alias("n_points"),
        F.when(ok, F.round(slope, 6)).alias("slope"),
        F.when(ok, F.round((syd - slope * sxd) / nd / F.lit(_MU), 6)).alias(
            "intercept"
        ),
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    by: str = "lang",
    max_rank: int = 1000,
) -> DataFrame:
    """Per-group Zipf fit ln(freq) = intercept + slope * ln(rank) over
    the top max_rank words (cnt desc, word asc tiebreak), plus exact
    n_types / n_tokens. Output: (by, n_types, n_tokens, n_points,
    zipf_slope, zipf_intercept)."""
    df = ensure_min_partitions(df)
    wc = (
        df.select(F.col(by), F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .groupBy(by, "w")
        .agg(F.count("*").alias("cnt"))
    )
    tot = wc.groupBy(by).agg(
        F.count("*").alias("n_types"),
        F.sum("cnt").alias("n_tokens"),
    )
    top = grouped_topk(wc, [by], [F.desc("cnt"), F.asc("w")], max_rank)
    from pyspark.sql import Window

    w_rank = Window.partitionBy(by).orderBy(F.desc("cnt"), F.asc("w"))
    pts = top.withColumn("r", F.row_number().over(w_rank)).select(
        by, _mu(F.col("r")).alias("xi"), _mu(F.col("cnt")).alias("yi")
    )
    fit = _fit(pts, by, "xi", "yi")
    return tot.join(fit, by).select(
        by,
        "n_types",
        "n_tokens",
        "n_points",
        F.col("slope").alias("zipf_slope"),
        F.col("intercept").alias("zipf_intercept"),
    )


def heaps_fit(
    df: DataFrame,
    text_col: str = "text",
    by: str = "lang",
    group_col: str = "source",
) -> DataFrame:
    """Per-language Heaps fit ln(V) = ln(k) + beta * ln(N) across
    (lang, source) sub-corpora (V = vocabulary size, N = tokens).
    Output: (by, n_points, heaps_beta, heaps_ln_k)."""
    df = ensure_min_partitions(df)
    wc = (
        df.select(
            F.col(by),
            F.col(group_col),
            F.explode(F.split(F.col(text_col), " ")).alias("w"),
        )
        .groupBy(by, group_col, "w")
        .agg(F.count("*").alias("cnt"))
    )
    pts = wc.groupBy(by, group_col).agg(
        _mu(F.sum("cnt")).alias("xi"),
        _mu(F.count("*")).alias("yi"),
    )
    fit = _fit(pts, by, "xi", "yi")
    return fit.select(
        by,
        "n_points",
        F.col("slope").alias("heaps_beta"),
        F.col("intercept").alias("heaps_ln_k"),
    )


def _fit_sql(src: str, by: str) -> str:
    """Regression tail shared by both twins; src must yield
    (by, xi, yi) BIGINT micro-unit points."""
    return f"""
s AS (
  SELECT {by}, count(*) AS n,
         CAST(sum(xi) AS BIGINT) AS sx, CAST(sum(yi) AS BIGINT) AS sy,
         CAST(sum(xi * xi) AS BIGINT) AS sxx,
         CAST(sum(xi * yi) AS BIGINT) AS sxy
  FROM {src} GROUP BY {by}
),
fit AS (
  SELECT {by}, CAST(n AS BIGINT) AS n_points,
    CASE WHEN n >= 2 AND (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) <> 0.0
      THEN round(
        (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
      END AS slope,
    CASE WHEN n >= 2 AND (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) <> 0.0
      THEN round(
        (CAST(sy AS DOUBLE)
          - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * CAST(sx AS DOUBLE))
        / CAST(n AS DOUBLE) / 1000000.0, 6)
      END AS intercept
  FROM s
)""".strip()


def zipf_fit_sql(
    table: str = "documents",
    text: str = "text",
    by: str = "lang",
    max_rank: int = 1000,
) -> str:
    return f"""
WITH wc AS (
  SELECT {by}, w, count(*) AS cnt
  FROM (SELECT {by}, unnest(string_split({text}, ' ')) AS w FROM {table})
  GROUP BY {by}, w
),
tot AS (
  SELECT {by}, count(*) AS n_types, CAST(sum(cnt) AS BIGINT) AS n_tokens
  FROM wc GROUP BY {by}
),
top AS (
  SELECT {by}, cnt,
         row_number() OVER (PARTITION BY {by} ORDER BY cnt DESC, w) AS r
  FROM wc QUALIFY r <= {int(max_rank)}
),
pts AS (
  SELECT {by},
         CAST(round(ln(CAST(r AS DOUBLE)) * 1000000.0) AS BIGINT) AS xi,
         CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000000.0) AS BIGINT) AS yi
  FROM top
),
{_fit_sql('pts', by)}
SELECT {by}, n_types, n_tokens, n_points,
       slope AS zipf_slope, intercept AS zipf_intercept
FROM tot JOIN fit USING ({by})
""".strip()


def heaps_fit_sql(
    table: str = "documents",
    text: str = "text",
    by: str = "lang",
    group_col: str = "source",
) -> str:
    return f"""
WITH wc AS (
  SELECT {by}, {group_col}, w, count(*) AS cnt
  FROM (SELECT {by}, {group_col},
               unnest(string_split({text}, ' ')) AS w FROM {table})
  GROUP BY {by}, {group_col}, w
),
pts AS (
  SELECT {by},
    CAST(round(ln(CAST(CAST(sum(cnt) AS BIGINT) AS DOUBLE)) * 1000000.0)
         AS BIGINT) AS xi,
    CAST(round(ln(CAST(count(*) AS DOUBLE)) * 1000000.0) AS BIGINT) AS yi
  FROM wc GROUP BY {by}, {group_col}
),
{_fit_sql('pts', by)}
SELECT {by}, n_points, slope AS heaps_beta, intercept AS heaps_ln_k
FROM fit
""".strip()

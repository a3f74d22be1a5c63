"""Similarity search over an embedding column (array<float>).

  cosine_topk      brute-force exact top-k neighbors (pair join) — the
                   correctness baseline; quadratic, fine for candidate
                   re-ranking and small partitions.
  lsh_cosine_topk  random-hyperplane LSH bucketing: only same-bucket
                   pairs are joined, then exact cosine re-rank — the
                   scale path (bucket join ≈ the spatial cell join shape
                   in operators/knn.py, salting strategy shared).

Dot products run JVM-side via zip_with + aggregate (ordered left fold in
double) so the DuckDB oracle — same fold, same order, same types — is
bit-comparable; emitted similarities are rounded to 6 decimals.

Hyperplane components are deterministic rationals
((p*131 + j*31 + 7) % 1000)/1000 - 0.5 (plane p, dim j) — identical
arithmetic in Spark, SQL, and numpy; no RNG state anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ROUND = 6


def _dot(a: Column, b: Column) -> Column:
    """Ordered left-fold dot product in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def _norm_sql(a: str) -> str:
    return (
        f"sqrt(list_sum(list_transform({a}, "
        f"v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))"
    )


def cosine_topk(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per vector (excluding self).

    Ties broken by candidate id ascending — the deterministic rank rule
    shared with the spatial kNN join (operators/knn.py)."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _norm(F.col(vec_col)).alias("n"),
    )
    a = base.select(
        F.col("id").alias("src_id"), F.col("v").alias("va"), F.col("n").alias("na")
    )
    b = base.select(
        F.col("id").alias("cand_id"), F.col("v").alias("vb"), F.col("n").alias("nb")
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("src_id") != F.col("cand_id"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), ROUND),
        )
    )
    w = Window.partitionBy("src_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src_id", "cand_id", "cosine", "rank")
    )


def cosine_topk_sql(
    k: int, table: str = "embeddings", id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    dot = _dot_sql("a.v", "b.v")
    return f"""
      WITH base AS (
        SELECT {id_col} AS id, {vec_col} AS v, {_norm_sql(vec_col)} AS n
        FROM {table}
      ),
      pairs AS (
        SELECT a.id AS src_id, b.id AS cand_id,
               round(({dot}) / (a.n * b.n), {ROUND}) AS cosine
        FROM base a JOIN base b ON a.id <> b.id
      ),
      rk AS (
        SELECT src_id, cand_id, cosine,
               CAST(row_number() OVER (
                 PARTITION BY src_id ORDER BY cosine DESC, cand_id ASC
               ) AS INTEGER) AS rank
        FROM pairs
      )
      SELECT src_id, cand_id, cosine, rank FROM rk WHERE rank <= {k}
    """


N_PLANES = 4
N_TABLES = 4


def _plane_component(p: Column | int, j: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5)."""
    pp = F.lit(p) if isinstance(p, int) else p
    return ((pp * 131 + j * 31 + 7) % 1000).cast("double") / 1000.0 - 0.5


def _bucket_col(v: Column, table_idx: int, n_planes: int) -> Column:
    """Sign-concatenation bucket over this table's planes (plane ids are
    globally distinct: pid = table_idx * n_planes + p)."""
    bucket = None
    for p in range(n_planes):
        pid = table_idx * n_planes + p
        d = F.aggregate(
            F.transform(v, lambda x, j: x.cast("double") * _plane_component(pid, j)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        bit = F.when(d > 0, F.lit(1 << p)).otherwise(0)
        bucket = bit if bucket is None else bucket + bit
    return bucket


def lsh_buckets(
    df: DataFrame,
    n_planes: int = N_PLANES,
    n_tables: int = N_TABLES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, v, tbl, bucket): one row per (vector, hash table).

    Multi-table OR-amplification: a pair is a candidate if it collides
    in ANY table — the recall knob for random-hyperplane LSH."""
    v = F.col(vec_col)
    tagged = df.select(
        F.col(id_col).alias("id"),
        v.alias("v"),
        F.array(
            *[_bucket_col(v, t, n_planes) for t in range(n_tables)]
        ).alias("_buckets"),
    )
    return tagged.select(
        "id", "v", F.posexplode("_buckets").alias("tbl", "bucket")
    )


def lsh_cosine_topk(
    df: DataFrame,
    k: int,
    n_planes: int = N_PLANES,
    n_tables: int = N_TABLES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine re-rank over pairs that collide in
    at least one LSH table. Deterministic — the SQL oracle reproduces it
    exactly. Recall grows with n_tables (OR), precision with n_planes."""
    b = lsh_buckets(df, n_planes, n_tables, id_col, vec_col)
    norms = df.select(
        F.col(id_col).alias("id"), _norm(F.col(vec_col)).alias("n")
    )
    base = b.join(norms, "id")
    a = base.select("tbl", "bucket", F.col("id").alias("src_id"),
                    F.col("v").alias("va"), F.col("n").alias("na"))
    c = base.select("tbl", "bucket", F.col("id").alias("cand_id"),
                    F.col("v").alias("vb"), F.col("n").alias("nb"))
    pairs = (
        a.join(c, ["tbl", "bucket"])
        .filter(F.col("src_id") != F.col("cand_id"))
        .select("src_id", "cand_id", "va", "vb", "na", "nb")
        .dropDuplicates(["src_id", "cand_id"])
        .withColumn(
            "cosine",
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), ROUND),
        )
    )
    w = Window.partitionBy("src_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src_id", "cand_id", "cosine", "rank")
    )


def _bucket_sql(table_idx: int, n_planes: int) -> str:
    # DuckDB list_transform index i is 1-based; Spark transform j is
    # 0-based — use (i-1) to align.
    return " + ".join(
        f"(CASE WHEN list_sum(list_transform(range(1, len(v) + 1), "
        f"i -> CAST(v[i] AS DOUBLE) * "
        f"(CAST((({table_idx * n_planes + p} * 131 + (i - 1) * 31 + 7) % 1000) AS DOUBLE)"
        f" / 1000.0 - 0.5)"
        f")) > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(n_planes)
    )


def lsh_cosine_topk_sql(
    k: int, n_planes: int = N_PLANES, n_tables: int = N_TABLES,
    table: str = "embeddings", id_col: str = "vec_id", vec_col: str = "embedding",
) -> str:
    bucket_cols = ", ".join(
        f"({_bucket_sql(t, n_planes)}) AS b{t}" for t in range(n_tables)
    )
    collide = " OR ".join(f"a.b{t} = b.b{t}" for t in range(n_tables))
    dot = _dot_sql("a.v", "b.v")
    return f"""
      WITH base AS (
        SELECT {id_col} AS id, {vec_col} AS v, {_norm_sql(vec_col)} AS n,
               {bucket_cols}
        FROM {table}
      ),
      pairs AS (
        SELECT a.id AS src_id, b.id AS cand_id,
               round(({dot}) / (a.n * b.n), {ROUND}) AS cosine
        FROM base a JOIN base b ON a.id <> b.id AND ({collide})
      ),
      rk AS (
        SELECT src_id, cand_id, cosine,
               CAST(row_number() OVER (
                 PARTITION BY src_id ORDER BY cosine DESC, cand_id ASC
               ) AS INTEGER) AS rank
        FROM pairs
      )
      SELECT src_id, cand_id, cosine, rank FROM rk WHERE rank <= {k}
    """

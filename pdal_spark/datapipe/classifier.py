"""Model-based quality filtering: hashed linear text classifier.

The CCNet / LLaMA-style data pipelines gate pages with a fastText
classifier (Joulin et al., arXiv:1607.01759): bag of word + word-bigram
features, each HASHED into a fixed bucket table (the "hashing trick"),
a linear layer, threshold on the score. This module is that scoring
step as pure Spark column math:

    score(doc) = sum over unigram+bigram features f of W[h(f) % B]
    keep(doc)  = score >= threshold * n_features      (mean-score gate)

Two weight sources:
  * closed-form (default): W[b] derived arithmetically from the bucket
    index via the repo's affine-cipher family — a deterministic
    stand-in for trained weights that makes the WHOLE computation
    map-only (zero shuffle, zero join: the weight lookup is
    arithmetic, not a table probe) and bit-replayable in DuckDB.
  * a real weight table (``weights_df``: bucket int, w_micro long) —
    the deployment shape once a model is trained: explode features,
    ONE broadcast join on bucket (the table is B rows — tiny), one
    doc-keyed combinable sum. Same output contract.

All scores are integer MICRO-UNITS (weights in [-1000, 1000]) summed
as BIGINT — exact under any accumulation order, so engine and oracle
hash-match bit-for-bit; the threshold gate cross-multiplies
(score >= t_micro * n_features) instead of dividing.

Scale shape: the closed-form path is map-only at any scale; the
weight-table path shuffles once on the doc id for the sum and
broadcasts the B-row table. No UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdal_spark.datapipe.sketch import P31, _hash_params

__all__ = [
    "feature_buckets",
    "hashed_linear_score",
    "hashed_linear_score_sql",
    "pr_curve",
    "pr_curve_sql",
    "weight_table",
]

WEIGHT_SPAN = 1000  # weights are integers in [-WEIGHT_SPAN, WEIGHT_SPAN]


def _bucket(feature: Column, buckets: int) -> Column:
    """Hashing trick: 60-bit md5-prefix content key -> bucket index.
    Same exact-integer idiom as bloom.py:46 (DuckDB-replayable)."""
    key = F.conv(
        F.substring(F.md5(feature.cast("binary")), 1, 15), 16, 10
    ).cast("long")
    return (key % buckets).cast("int")


def _bucket_sql(feature: str, buckets: int) -> str:
    return (
        f"CAST(CAST('0x' || substring(md5({feature}), 1, 15) AS BIGINT)"
        f" % {buckets} AS INT)"
    )


def _weight_micro(bucket: Column, seed: int) -> Column:
    """Closed-form 'trained' weight for a bucket: affine cipher mod P31
    folded to [-WEIGHT_SPAN, WEIGHT_SPAN]."""
    a, c = _hash_params(seed)
    span = 2 * WEIGHT_SPAN + 1
    return (
        (bucket.cast("long") * a + c) % P31 % span - WEIGHT_SPAN
    ).cast("long")


def _weight_micro_sql(bucket: str, seed: int) -> str:
    a, c = _hash_params(seed)
    span = 2 * WEIGHT_SPAN + 1
    return (
        f"(CAST({bucket} AS BIGINT) * {a} + {c}) % {P31} % {span}"
        f" - {WEIGHT_SPAN}"
    )


def _features(text: Column, bigrams: bool) -> Column:
    """Unigrams + (optionally) word bigrams, as one string array.
    Bag semantics: repeats count every time, like fastText."""
    toks = F.filter(F.split(text, " "), lambda w: w != "")
    if not bigrams:
        return toks
    n = F.size(toks)
    bi = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bi)


def feature_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    bigrams: bool = True,
) -> DataFrame:
    """-> (id, bucket) one row per feature OCCURRENCE — the exploded
    deployment view the weight-table path joins against."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(_features(F.col(text_col), bigrams)).alias("_f"),
    ).select("id", _bucket(F.col("_f"), buckets).alias("bucket"))


def weight_table(spark, buckets: int = 4096, seed: int = 11) -> DataFrame:
    """Materialize the closed-form weights as a (bucket, w_micro) table
    — B rows, broadcast-sized; stands in for a trained model's layer."""
    b = F.col("id").cast("int")
    return spark.range(buckets).select(
        b.alias("bucket"), _weight_micro(b, seed).alias("w_micro")
    )


def hashed_linear_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 4096,
    bigrams: bool = True,
    seed: int = 11,
    threshold_micro: int = 0,
    weights_df: DataFrame | None = None,
) -> DataFrame:
    """-> (id, n_features, score_micro, keep).

    Closed-form path (weights_df=None): map-only — the per-feature
    weight is arithmetic on the feature's hash bucket, folded with
    F.aggregate (exact BIGINT sum). Weight-table path: explode ->
    broadcast bucket join -> one doc-keyed sum; left join keeps
    zero-feature docs (score 0, keep = threshold <= 0)."""
    if weights_df is None:
        feats = _features(F.col(text_col), bigrams)
        w = lambda f: _weight_micro(_bucket(f, buckets), seed)  # noqa: E731
        score = F.aggregate(
            feats, F.lit(0).cast("long"), lambda acc, f: acc + w(f)
        )
        n = F.size(feats).cast("long")
        return df.select(
            F.col(id_col).alias("id"),
            n.alias("n_features"),
            score.alias("score_micro"),
            (score >= F.lit(threshold_micro) * n).alias("keep"),
        )

    feats = feature_buckets(df, text_col, id_col, buckets, bigrams)
    scored = (
        feats.join(F.broadcast(weights_df), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum("w_micro").alias("score_micro"),
        )
    )
    base = df.select(F.col(id_col).alias("id"))
    return (
        base.join(scored, "id", "left")
        .select(
            "id",
            F.coalesce("n_features", F.lit(0)).alias("n_features"),
            F.coalesce("score_micro", F.lit(0)).alias("score_micro"),
        )
        .withColumn(
            "keep",
            F.col("score_micro")
            >= F.lit(threshold_micro) * F.col("n_features"),
        )
    )


def hashed_linear_score_sql(
    text: str = "text",
    id_col: str = "doc_id",
    table: str = "documents",
    buckets: int = 4096,
    bigrams: bool = True,
    seed: int = 11,
    threshold_micro: int = 0,
) -> str:
    """DuckDB twin of the closed-form path — identical hash, weight
    fold, and integer threshold algebra."""
    toks = f"list_filter(string_split({text}, ' '), w -> w <> '')"
    if bigrams:
        feats = (
            f"list_concat(ts, CASE WHEN len(ts) >= 2 THEN "
            f"list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])"
            f" ELSE [] END)"
        )
    else:
        feats = "ts"
    w = _weight_micro_sql(_bucket_sql("f", buckets), seed)
    return f"""
      WITH t AS (SELECT {id_col}, {toks} AS ts FROM {table}),
      s AS (
        SELECT {id_col},
          CAST(len({feats}) AS BIGINT) AS n_features,
          CAST(coalesce(list_sum(
            list_transform({feats}, f -> {w})
          ), 0) AS BIGINT) AS score_micro
        FROM t
      )
      SELECT {id_col} AS id, n_features, score_micro,
             score_micro >= {threshold_micro} * n_features AS keep
      FROM s
    """


def pr_curve(
    df: DataFrame,
    score_col: str = "score_micro",
    label_col: str = "label",
    id_col: str = "id",
) -> DataFrame:
    """Precision/recall curve of a scored corpus against ground-truth
    labels — one point per distinct score value (the classifier
    threshold sweep a gating decision is calibrated on).

    point(s) = (threshold = s,
                n_pred = #docs with score >= s,
                tp     = #positives among them,
                prec   = tp / n_pred, recall = tp / total_positives)

    Scale shape: ONE range-partitioned pass (operators/ordered.py
    prefix_sums: per-partition window + driver offsets over #partitions
    partials) computes the running rank and running true-positive count
    in global (score desc, id asc) order WITHOUT a global window —
    Spark's own ORDER BY ... ROWS UNBOUNDED window would funnel the
    corpus through one task. Per-score argmax collapses ties; the two
    divisions are single deterministic double ops over exact integer
    counts (prefix sums of 0/1 stay exact in double far past 10^12
    rows), so the DuckDB twin — which CAN afford the textbook global
    window — bit-matches.
    """
    from pdal_spark.operators.ordered import prefix_sums

    keys = [F.col(score_col).desc(), F.col(id_col).asc()]
    base = df.select(id_col, score_col, label_col)
    pos = base.agg(F.sum(label_col).alias("p")).collect()[0]["p"] or 0
    run = prefix_sums(
        base, keys,
        {"_tp": F.col(label_col), "_rk": F.lit(1)},
        inclusive=True,
    )
    pts = run.groupBy(F.col(score_col).alias("threshold_micro")).agg(
        F.max("_rk").cast("long").alias("n_pred"),
        F.max("_tp").cast("long").alias("tp"),
    )
    return pts.select(
        "threshold_micro", "n_pred", "tp",
        F.round(F.col("tp").cast("double") / F.col("n_pred"), 6).alias("prec"),
        F.round(F.col("tp").cast("double") / F.lit(float(pos)), 6).alias("recall"),
    )


def pr_curve_sql(
    scored_sql: str,
    score_col: str = "score_micro",
    label_col: str = "label",
    id_col: str = "id",
) -> str:
    """DuckDB twin: scored_sql produces ({id_col}, {score_col},
    {label_col}); the oracle uses the textbook global window."""
    return f"""
      WITH j AS (SELECT {id_col}, {score_col}, {label_col}
                 FROM ({scored_sql})),
      r AS (
        SELECT {score_col},
               row_number() OVER (
                 ORDER BY {score_col} DESC, {id_col} ASC) AS rk,
               SUM({label_col}) OVER (
                 ORDER BY {score_col} DESC, {id_col} ASC
                 ROWS UNBOUNDED PRECEDING) AS tp
        FROM j
      ),
      pts AS (
        SELECT {score_col} AS threshold_micro,
               max(rk) AS n_pred, max(tp) AS tp
        FROM r GROUP BY 1
      ),
      tot AS (SELECT SUM({label_col}) AS pos FROM j)
      SELECT threshold_micro, CAST(n_pred AS BIGINT) AS n_pred,
             CAST(tp AS BIGINT) AS tp,
             round(CAST(tp AS DOUBLE) / n_pred, 6) AS prec,
             round(CAST(tp AS DOUBLE) / CAST(pos AS DOUBLE), 6) AS recall
      FROM pts, tot
    """

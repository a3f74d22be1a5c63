"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
arXiv:2302.03169).

Scores every raw document by how target-like its hashed n-gram bag is:

    w(doc) = sum_g  count_g(doc) * ( log p_target(g) - log p_raw(g) )

with add-one-smoothed unigram+bigram feature models estimated from a
(small) target corpus and the raw corpus itself. ``dsir_sample`` keeps
the top-k by weight (deterministic doc_id tiebreak) — the resampling
step with a fixed budget.

Execution shape (100 TB):

* feature extraction is the shared word/shingle explode (pure HOFs);
* both feature models are ONE map-side-combined groupBy each, and ship
  to the scorer as BROADCAST maps bounded by the feature-space size —
  ``feature_mode="hash"`` buckets features to ``num_buckets`` ids
  (xxhash64 mod B, the paper's hashed n-gram trick), so the broadcast
  is O(B) regardless of vocabulary;
* per-doc weights are one more combinable (doc, feature) rollup.

``feature_mode="gram"`` keeps raw n-gram strings — unbounded vocab, but
bit-comparable to a DuckDB twin (:func:`dsir_weights_sql`); the hash
mode is the scale path (rows-only oracle, parity pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _features(
    df: DataFrame, text_col: str, id_col: str, mode: str, buckets: int
) -> DataFrame:
    """(id, feature, cnt): unigram + bigram bag per document."""
    d = df.select(
        F.col(id_col).alias("id"), F.split(F.col(text_col), " ").alias("_ws")
    )
    uni = d.select("id", F.explode("_ws").alias("_g"))
    pairs = F.when(
        F.size("_ws") >= 2,
        F.expr(
            "transform(sequence(0, size(_ws) - 2), "
            "i -> concat_ws(' ', _ws[i], _ws[i + 1]))"
        ),
    ).otherwise(F.expr("array()"))
    bi = d.select("id", F.explode(pairs).alias("_g"))
    grams = uni.unionByName(bi)
    if mode == "hash":
        grams = grams.withColumn(
            "feature", F.pmod(F.xxhash64("_g"), F.lit(buckets))
        )
    else:
        grams = grams.withColumn("feature", F.col("_g"))
    return grams.groupBy("id", "feature").agg(F.count("*").alias("cnt"))


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    feature_mode: str = "gram",
    num_buckets: int = 1 << 16,
) -> DataFrame:
    """(id_col, weight): per-document log importance ratio.

    Cost shape: the expensive (doc, feature) explode runs ONCE per
    corpus — the raw side persists (it feeds both its model and the
    scorer), and everything scalar (vocab size, corpus totals) derives
    from the already-tiny per-feature count tables, not from re-running
    the explode."""
    if feature_mode not in ("gram", "hash"):
        raise ValueError(f"unknown feature_mode {feature_mode!r}")
    raw_f = _features(raw, text_col, id_col, feature_mode,
                      num_buckets).persist()
    tgt_f = _features(target, text_col, id_col, feature_mode, num_buckets)
    raw_c = raw_f.groupBy("feature").agg(F.sum("cnt").alias("cr"))
    tgt_c = tgt_f.groupBy("feature").agg(F.sum("cnt").alias("ct"))
    # one small merged per-feature table carries vocab size, both corpus
    # totals AND both models — a feature absent from one corpus smooths
    # to (0 + 1)/denom, the same add-one formula, so no separate floor
    merged = raw_c.join(tgt_c, "feature", "outer").select(
        "feature",
        F.coalesce("cr", F.lit(0)).alias("cr"),
        F.coalesce("ct", F.lit(0)).alias("ct"),
    ).persist()
    stats = merged.agg(
        F.count("*").alias("v"),
        F.sum("cr").alias("nr"),
        F.sum("ct").alias("nt"),
    ).collect()[0]
    vocab = int(stats.v)
    raw_den = float(stats.nr or 0) + float(vocab)
    tgt_den = float(stats.nt or 0) + float(vocab)
    model = merged.select(
        "feature",
        F.log((F.col("cr") + 1.0) / raw_den).alias("lp_raw"),
        F.log((F.col("ct") + 1.0) / tgt_den).alias("lp_tgt"),
    )
    scored = raw_f.join(F.broadcast(model), "feature").groupBy("id").agg(
        F.sum(
            F.col("cnt") * (F.col("lp_tgt") - F.col("lp_raw"))
        ).alias("weight")
    )
    return scored.select(F.col("id").alias(id_col), "weight")


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    feature_mode: str = "gram",
    num_buckets: int = 1 << 16,
) -> DataFrame:
    """Keep the k most target-like documents (weight desc, id asc
    tiebreak) — deterministic importance resampling with a budget."""
    w = dsir_weights(raw, target, text_col, id_col, feature_mode,
                     num_buckets)
    from pdal_spark.operators.ordered import global_rank

    ranked = global_rank(
        w, [F.col("weight").desc(), F.col(id_col).asc()], out_col="_rk"
    )
    return ranked.filter(F.col("_rk") <= k).drop("_rk")


def dsir_weights_sql(
    raw_table: str = "documents",
    target_pred: str = "doc_id % 97 = 0",
    text: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 9,
) -> str:
    """DuckDB twin of dsir_weights(feature_mode="gram") where the target
    corpus is ``raw_table WHERE target_pred`` (the driver-query shape).
    """
    def feats(src: str, alias: str) -> str:
        return f"""
      {alias}_uni AS (
        SELECT {id_col} AS id, u.g AS feature
        FROM {src}, UNNEST(string_split({text}, ' ')) AS u(g)
      ),
      {alias}_bi AS (
        SELECT {id_col} AS id,
               ws[t.i + 1] || ' ' || ws[t.i + 2] AS feature
        FROM (SELECT {id_col}, string_split({text}, ' ') AS ws
              FROM {src}) s,
             UNNEST(range(greatest(len(ws) - 1, 0))) AS t(i)
      ),
      {alias}_f AS (
        SELECT id, feature, count(*) AS cnt FROM (
          SELECT * FROM {alias}_uni UNION ALL SELECT * FROM {alias}_bi
        ) GROUP BY 1, 2
      )"""

    return f"""
      WITH tgt_src AS (SELECT * FROM {raw_table} WHERE {target_pred}),
      {feats(raw_table, 'raw')},
      {feats('tgt_src', 'tgt')},
      vocab AS (
        SELECT count(*) AS v FROM (
          SELECT DISTINCT feature FROM raw_f
          UNION SELECT DISTINCT feature FROM tgt_f
        )
      ),
      raw_tot AS (SELECT sum(cnt) AS n FROM raw_f),
      tgt_tot AS (SELECT coalesce(sum(cnt), 0) AS n FROM tgt_f),
      raw_m AS (
        SELECT feature, ln((sum(cnt) + 1.0) / (raw_tot.n + vocab.v))
                 AS lp_raw
        FROM raw_f, raw_tot, vocab GROUP BY feature, raw_tot.n, vocab.v
      ),
      tgt_m AS (
        SELECT feature, ln((sum(cnt) + 1.0) / (tgt_tot.n + vocab.v))
                 AS lp_tgt
        FROM tgt_f, tgt_tot, vocab GROUP BY feature, tgt_tot.n, vocab.v
      ),
      model AS (
        SELECT coalesce(r.feature, t.feature) AS feature,
               coalesce(r.lp_raw,
                        (SELECT ln(1.0 / (n + (SELECT v FROM vocab)))
                         FROM raw_tot)) AS lp_raw,
               coalesce(t.lp_tgt,
                        (SELECT ln(1.0 / (n + (SELECT v FROM vocab)))
                         FROM tgt_tot)) AS lp_tgt
        FROM raw_m r FULL OUTER JOIN tgt_m t USING (feature)
      )
      SELECT f.id AS {id_col},
             round(sum(f.cnt * (m.lp_tgt - m.lp_raw)), {round_digits})
               AS weight
      FROM raw_f f JOIN model m USING (feature)
      GROUP BY 1
    """

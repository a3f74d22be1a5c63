"""Text analysis over the documents table: token counting, quality
scoring, language-ID, document fingerprinting.

Design constraints:
  * pure built-in column expressions (JVM/codegen) — zero Python in the
    hot path; at 100 TB these run at scan speed with full pushdown.
  * every formula has a DuckDB SQL twin producing identical values
    (note: Spark's transform() lambda index is 0-based, DuckDB's
    list_transform (x,i) index is 1-based — SQL twins use (i-1)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# BPE-ish lexer: letter runs, digit runs, single punctuation marks
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

_FP_MOD = 2147483647  # 2^31 - 1


def tokens(text: Column) -> Column:
    """Whitespace tokens (documents are single-space joined)."""
    return F.split(text, " ")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    t = F.col(text_col)
    return df.withColumn("n_ws_tokens", F.size(tokens(t))).withColumn(
        "n_bpe_tokens", F.size(F.regexp_extract_all(t, F.lit(TOKEN_RE), 0))
    )


def token_count_sql(text: str = "text") -> tuple[str, str]:
    return (
        f"len(string_split({text}, ' '))",
        f"len(regexp_extract_all({text}, '{TOKEN_RE}'))",
    )


STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0,1]: length, mean word length,
    punctuation density, stopword ratio (the standard web-text filters,
    cf. C4/Gopher rules). Deterministic closed-form — SQL twin below."""
    t = F.col(text_col)
    words = tokens(t)
    n_words = F.size(words)
    n_chars = F.length(t)
    # zero guards: empty text -> ratios 0.0 on BOTH engines (Spark x/0 is
    # NULL while DuckDB double x/0 is Inf/NaN — diverges without the guard)
    mean_wlen = F.when(
        n_words > 0, (n_chars - (n_words - 1)).cast("double") / n_words
    ).otherwise(F.lit(0.0))
    n_punct = F.size(F.regexp_extract_all(t, F.lit("[^A-Za-z0-9\\s]"), 0))
    punct_ratio = F.when(
        n_chars > 0, n_punct.cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    n_stop = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    stop_ratio = F.when(
        n_words > 0, n_stop.cast("double") / n_words
    ).otherwise(F.lit(0.0))
    score = (
        F.least(n_words.cast("double") / 100.0, F.lit(1.0)) * 0.25
        + F.when((mean_wlen >= 3.0) & (mean_wlen <= 10.0), 0.25).otherwise(0.0)
        + F.greatest(F.lit(0.0), F.lit(0.25) - punct_ratio * 2.5)
        + F.least(stop_ratio * 2.0, F.lit(0.25))
    )
    return (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", F.round(mean_wlen, 6))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("quality", F.round(score, 6))
    )


def quality_score_sql(text: str = "text") -> dict[str, str]:
    words = f"string_split({text}, ' ')"
    n_words = f"len({words})"
    n_chars = f"length({text})"
    mean_wlen = (
        f"(CASE WHEN {n_words} > 0 THEN "
        f"CAST({n_chars} - ({n_words} - 1) AS DOUBLE) / {n_words} "
        f"ELSE 0.0 END)"
    )
    n_punct = f"len(regexp_extract_all({text}, '[^A-Za-z0-9\\s]'))"
    punct_ratio = (
        f"(CASE WHEN {n_chars} > 0 THEN CAST({n_punct} AS DOUBLE) / {n_chars} "
        f"ELSE 0.0 END)"
    )
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    n_stop = f"len(list_filter({words}, w -> w IN ({stop_list})))"
    stop_ratio = (
        f"(CASE WHEN {n_words} > 0 THEN CAST({n_stop} AS DOUBLE) / {n_words} "
        f"ELSE 0.0 END)"
    )
    score = (
        f"(least(CAST({n_words} AS DOUBLE) / 100.0, 1.0) * 0.25"
        f" + CASE WHEN {mean_wlen} >= 3.0 AND {mean_wlen} <= 10.0 THEN 0.25 ELSE 0.0 END"
        f" + greatest(0.0, 0.25 - {punct_ratio} * 2.5)"
        f" + least({stop_ratio} * 2.0, 0.25))"
    )
    return {
        "n_words": n_words,
        "mean_word_len": f"round({mean_wlen}, 6)",
        "punct_ratio": f"round({punct_ratio}, 6)",
        "stopword_ratio": f"round({stop_ratio}, 6)",
        "quality": f"round({score}, 6)",
    }


# language-ID: tiny stopword profiles. An n-gram model would use the same
# explode-join-argmax shape with a bigger broadcast profile table.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "y", "de", "es"),
    "fr": ("le", "la", "et", "de", "est"),
}


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Predict language = argmax over profile-word hits (ties -> smaller
    lang code; no hits -> 'und'). Broadcast profile join + argmax — the
    canonical distributed shape for dictionary classifiers."""
    spark = df.sparkSession
    rows = [(lang, w) for lang, ws in LANG_PROFILES.items() for w in ws]
    prof = spark.createDataFrame(rows, "plang string, word string")
    exploded = df.select(id_col, F.explode(tokens(F.col(text_col))).alias("word"))
    scores = (
        exploded.join(F.broadcast(prof), "word")
        .groupBy(id_col, "plang")
        .agg(F.count("*").alias("hits"))
    )
    best = (
        scores.withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy(id_col)
                .orderBy(F.col("hits").desc(), F.col("plang").asc())
            ),
        )
        .filter(F.col("_rk") == 1)
        .select(id_col, F.col("plang").alias("pred_lang"))
    )
    return df.join(best, id_col, "left").withColumn(
        "pred_lang", F.coalesce("pred_lang", F.lit("und"))
    )


def lang_id_sql(table: str = "documents", text: str = "text",
                id_col: str = "doc_id") -> str:
    vals = ", ".join(
        f"('{lang}', '{w}')" for lang, ws in LANG_PROFILES.items() for w in ws
    )
    return f"""
      WITH prof(plang, word) AS (VALUES {vals}),
      ex AS (
        SELECT {id_col}, unnest(string_split({text}, ' ')) AS word FROM {table}
      ),
      sc AS (
        SELECT {id_col}, plang, count(*) AS hits
        FROM ex JOIN prof USING (word) GROUP BY 1, 2
      ),
      rk AS (
        SELECT {id_col}, plang,
               row_number() OVER (PARTITION BY {id_col}
                                  ORDER BY hits DESC, plang ASC) AS r
        FROM sc
      )
      SELECT d.{id_col}, coalesce(rk.plang, 'und') AS pred_lang
      FROM {table} d LEFT JOIN (SELECT * FROM rk WHERE r = 1) rk USING ({id_col})
    """


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Two fingerprints: content md5 (exact) and a position-weighted word
    hash (rolling-hash family — order-sensitive, locality at word level)."""
    t = F.col(text_col)
    words = tokens(t)
    codes = F.transform(
        words,
        lambda w, i: (
            F.ascii(w.substr(F.lit(1), F.lit(1))) * 65536
            + F.ascii(w.substr(F.length(w), F.lit(1))) * 256
            + F.length(w)
        )
        * (((i + 1) * (i + 1) + 7 * (i + 1) + 1) % 97 + 1),
    )
    fp = F.aggregate(codes, F.lit(0).cast("long"), lambda acc, c: (acc + c) % _FP_MOD)
    return df.withColumn("fp_md5", F.md5(t.cast("binary"))).withColumn("fp_roll", fp)


def fingerprint_sql(text: str = "text") -> tuple[str, str]:
    words = f"string_split({text}, ' ')"
    # DuckDB list_transform index i is 1-based == our (i+1)
    codes = (
        f"list_transform({words}, (w, i) -> "
        f"(ascii(substr(w, 1, 1)) * 65536 + ascii(substr(w, length(w), 1)) * 256"
        f" + length(w)) * ((i * i + 7 * i + 1) % 97 + 1))"
    )
    fp = f"list_aggregate({codes}, 'sum') % {_FP_MOD}"
    return f"md5({text})", fp


def char_bigram_logloss(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Perplexity-proxy quality signal (the CCNet-style LM filter,
    reduced to an exactly-reproducible model): per-doc mean negative
    log2 probability of its character bigrams under the CORPUS bigram
    distribution (add-one smoothing over the observed bigram
    vocabulary). Low = typical text, high = junk/unnatural strings.

    Scale shape: the background model is one map-side-combined count
    over exploded bigrams (model size = distinct bigrams — alphabet²,
    broadcastable at any corpus size); scoring joins each doc's bigrams
    to the broadcast model and folds one aggregate. Two shuffles total,
    both on small keys."""
    t = F.col(text_col)
    # sequence(1, 0) would step DOWN in Spark; gate on length >= 2 so
    # sub-bigram docs yield no grams (matching DuckDB's empty range()).
    grams = F.when(
        F.length(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - 1),
            lambda i: t.substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    from pdal_spark.session import ensure_min_partitions

    df = ensure_min_partitions(df)
    ex = df.select(F.col(id_col), F.explode(grams).alias("bg"))
    counts = ex.groupBy("bg").agg(F.count("*").alias("c"))
    totals = counts.agg(
        F.sum("c").alias("tot"), F.count("*").alias("v")
    )
    model = counts.crossJoin(F.broadcast(totals)).select(
        "bg",
        F.log2(
            (F.col("c") + 1).cast("double")
            / (F.col("tot") + F.col("v")).cast("double")
        ).alias("lp"),
    )
    scored = (
        ex.join(F.broadcast(model), "bg")
        .groupBy(id_col)
        .agg(F.round(-F.avg("lp"), 6).alias("bigram_logloss"))
    )
    return df.select(id_col).join(scored, id_col, "left")


def char_bigram_logloss_sql(
    table: str = "documents", text: str = "text", id_col: str = "doc_id"
) -> str:
    grams = (
        f"list_transform(range(1, greatest(length({text}) - 1, 0) + 1), "
        f"i -> {text}[i:i+1])"
    )
    return f"""
      WITH ex AS (
        SELECT {id_col}, unnest({grams}) AS bg FROM {table}
      ),
      counts AS (SELECT bg, count(*) AS c FROM ex GROUP BY 1),
      totals AS (SELECT sum(c) AS tot, count(*) AS v FROM counts),
      model AS (
        SELECT bg, log2(CAST(c + 1 AS DOUBLE) / CAST(tot + v AS DOUBLE))
          AS lp
        FROM counts, totals
      ),
      scored AS (
        SELECT e.{id_col}, round(-avg(m.lp), 6) AS bigram_logloss
        FROM ex e JOIN model m USING (bg)
        GROUP BY 1
      )
      SELECT d.{id_col}, s.bigram_logloss
      FROM {table} d LEFT JOIN scored s USING ({id_col})
    """


def perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style head/middle/tail perplexity bucketing (Wenzek et al.
    2020): per language, the lowest-perplexity third of documents is
    'head' (cleanest), the next third 'middle', the rest 'tail'.

    The score is char_bigram_logloss (the corpus-bigram LM proxy). The
    per-language tercile thresholds are EXACT ORDER STATISTICS — the
    smallest score s with 3*|{score <= s}| >= k*n — computed on a
    compressed (lang, score) value histogram: one groupBy builds the
    histogram (bounded by distinct 6-decimal scores, not corpus rows),
    a window over that SMALL table takes the cumulative counts, and the
    tiny per-lang threshold table broadcast-joins back for the CASE
    classification. No interpolated percentile (whose float arithmetic
    differs across engines) and no full-corpus window — the shape holds
    at 100 TB because the window input is the histogram, not the data.
    Docs too short to score (< 2 chars, NULL logloss) land in 'tail'.
    """
    scored = char_bigram_logloss(df, text_col, id_col).join(
        df.select(id_col, lang_col), id_col
    )
    hist = scored.filter(F.col("bigram_logloss").isNotNull()).groupBy(
        lang_col, "bigram_logloss"
    ).agg(F.count("*").alias("cnt"))
    w = Window.partitionBy(lang_col).orderBy("bigram_logloss")
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    n_by_lang = hist.groupBy(lang_col).agg(F.sum("cnt").alias("n"))
    thresholds = (
        cum.join(n_by_lang, lang_col)
        .groupBy(lang_col)
        .agg(
            F.min(
                F.when(F.col("cum") * 3 >= F.col("n"),
                       F.col("bigram_logloss"))
            ).alias("t33"),
            F.min(
                F.when(F.col("cum") * 3 >= F.col("n") * 2,
                       F.col("bigram_logloss"))
            ).alias("t66"),
        )
    )
    return (
        scored.join(F.broadcast(thresholds), lang_col)
        .withColumn(
            "ppl_bucket",
            F.when(F.col("bigram_logloss").isNull(), F.lit("tail"))
            .when(F.col("bigram_logloss") <= F.col("t33"), F.lit("head"))
            .when(F.col("bigram_logloss") <= F.col("t66"), F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
        .select(id_col, lang_col, "bigram_logloss", "ppl_bucket")
    )


def perplexity_buckets_sql(
    table: str = "documents",
    text: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> str:
    """DuckDB twin: same logloss CTE, same histogram + cumulative-count
    order statistics, same CASE."""
    base = char_bigram_logloss_sql(table, text, id_col)
    return f"""
      WITH scored AS (
        SELECT b.{id_col}, d.{lang_col}, b.bigram_logloss
        FROM ({base}) b JOIN {table} d USING ({id_col})
      ),
      hist AS (
        SELECT {lang_col}, bigram_logloss, count(*) AS cnt
        FROM scored WHERE bigram_logloss IS NOT NULL
        GROUP BY 1, 2
      ),
      cum AS (
        SELECT {lang_col}, bigram_logloss, cnt,
               sum(cnt) OVER (
                 PARTITION BY {lang_col} ORDER BY bigram_logloss
               ) AS cum
        FROM hist
      ),
      nl AS (
        SELECT {lang_col}, sum(cnt) AS n FROM hist GROUP BY 1
      ),
      thresholds AS (
        SELECT c.{lang_col},
               min(CASE WHEN c.cum * 3 >= nl.n THEN c.bigram_logloss END)
                 AS t33,
               min(CASE WHEN c.cum * 3 >= nl.n * 2 THEN c.bigram_logloss END)
                 AS t66
        FROM cum c JOIN nl USING ({lang_col})
        GROUP BY 1
      )
      SELECT s.{id_col}, s.{lang_col}, s.bigram_logloss,
             CASE WHEN s.bigram_logloss IS NULL THEN 'tail'
                  WHEN s.bigram_logloss <= t.t33 THEN 'head'
                  WHEN s.bigram_logloss <= t.t66 THEN 'middle'
                  ELSE 'tail' END AS ppl_bucket
      FROM scored s JOIN thresholds t USING ({lang_col})
    """


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
    max_ratio_keep: float = 0.85,
) -> DataFrame:
    """DEFLATE compressibility quality signal: compressed/raw byte
    ratio per document (repetitive or templated text compresses far
    below prose; gibberish/encrypted blobs barely compress — both tails
    are drop candidates in CCNet/RefinedWeb-style cleaning).

    The one datapipe signal that genuinely needs Python (no DEFLATE in
    SQL engines): an Arrow-batched mapInPandas kernel — map-only, no
    shuffle, scans only (id, text) thanks to the select below. zlib
    output bytes are deterministic for a fixed (level, zlib build), and
    only the LENGTH is used, which is stable across platforms for the
    stdlib's bundled zlib; the pytest oracle replays it exactly.

    Emits n_raw_bytes, n_zlib_bytes, ratio (double), keep (ratio <=
    max_ratio_keep — the gibberish gate; compose with a lower cut for
    the template tail if wanted). Rows-only at the driver (no SQL twin
    possible); the strong oracle lives in tests.
    """
    import pandas as pd  # noqa: F401 — signature types only

    out_schema = (
        f"{id_col} long, n_raw_bytes long, n_zlib_bytes long, "
        f"ratio double, keep boolean"
    )
    src = df.select(id_col, text_col)

    def kernel(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            n_raw = raw.str.len().astype("int64")
            n_z = raw.map(lambda b: len(zlib.compress(b, level))).astype(
                "int64"
            )
            ratio = n_z / n_raw.where(n_raw > 0, 1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_raw_bytes": n_raw,
                    "n_zlib_bytes": n_z,
                    "ratio": ratio,
                    "keep": ratio <= max_ratio_keep,
                }
            )

    return src.mapInPandas(kernel, out_schema)

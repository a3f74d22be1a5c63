"""Heavy-hitter word frequency: exact distributed top-k + Count-Min.

The naive top-k over an open vocabulary — ``groupBy(word).count()
.orderBy(...)`` — shuffles the ENTIRE vocabulary (billions of distinct
tokens at 100 TB) to rank a handful of rows. This module implements the
two classic bounded-state alternatives:

* ``top_k_words`` — EXACT top-k via mergeable Misra-Gries partition
  summaries (Misra & Gries 1982; mergeability per Agarwal et al.,
  "Mergeable Summaries", PODS 2012) + a broadcast recount:

    phase 1 (mapInPandas, zero shuffle): each partition keeps at most
      ``cap`` counters; every contraction subtracts the (cap+1)-th
      largest count from all counters, so a counter's deficit vs the
      partition-true count is <= N_p/(cap+1) — and by pigeonhole every
      word with GLOBAL count > N/(cap+1) survives in at least one
      partition summary.
    phase 2: the candidate union (<= cap x partitions rows, vocabulary-
      independent) is broadcast back over the corpus for an exact
      recount; TakeOrdered returns the top k. Provided the k-th true
      count exceeds N/(cap+1) (checkable from the summaries' own
      totals — see ``topk_certificate``), the result is EXACT, which is
      why the DuckDB oracle is the plain GROUP BY top-k.

  This is PDAL's filters.stats "enumerate + count" capability
  (/root/reference/filters/StatsFilter.cpp:100-112,357-364: per-dim
  value tallies) re-expressed for corpus-scale open domains.

* ``cms_build`` / ``cms_estimate`` — Count-Min sketch (Cormode &
  Muthukrishnan 2005): d x w bucket counts built with ONE map-side-
  combining exchange of at most d*w rows; point estimates = min over
  the d rows. Hashes are the repo's exact-integer family (md5-prefix
  content key + affine cipher over P31 = 2^31-1), so the DuckDB twin
  replays bucket collisions — and therefore the overestimates —
  bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdal_spark.datapipe.bloom import _content_key, _content_key_sql
from pdal_spark.datapipe.sketch import P31, _hash_params
from pdal_spark.session import ensure_min_partitions

__all__ = [
    "corpus_words",
    "top_k_words",
    "top_k_words_sql",
    "topk_certificate",
    "cms_build",
    "cms_estimate",
    "cms_topk_sql",
]


def corpus_words(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, word): every occurrence (NOT distinct — frequency weight
    matters here, unlike dedup.doc_words' set semantics)."""
    df = ensure_min_partitions(df)
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), " ")).alias("word"),
        )
        .filter(F.col("word") != "")
    )


def corpus_words_sql(table: str = "documents", text: str = "text",
                     id_col: str = "doc_id") -> str:
    return (
        f"SELECT {id_col} AS id, unnest(string_split({text}, ' ')) AS word "
        f"FROM {table}"
    )


def _mg_summaries(words: DataFrame, cap: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: (word, mg_count, part_total).

    mg_count underestimates the partition-true count by at most
    part_total/(cap+1); part_total rides along so callers can certify
    exactness of a downstream top-k without a second pass."""

    def mg(batches):
        acc = pd.Series(dtype="int64")
        total = 0
        for pdf in batches:
            vc = pdf["word"].value_counts()
            total += int(vc.sum())
            acc = acc.add(vc, fill_value=0)
            if len(acc) > 4 * cap:  # lazy contraction, amortized O(1)/row
                thresh = acc.nlargest(cap + 1).iloc[-1]
                acc = acc[acc > thresh] - thresh
        if len(acc) > cap:
            thresh = acc.nlargest(cap + 1).iloc[-1]
            acc = acc[acc > thresh] - thresh
        if len(acc):
            yield pd.DataFrame(
                {
                    "word": acc.index,
                    "mg_count": acc.astype("int64").values,
                    "part_total": total,
                }
            )

    return words.mapInPandas(
        mg, "word string, mg_count bigint, part_total bigint"
    )


def top_k_words(
    df: DataFrame,
    k: int = 20,
    cap: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact top-k (word, n) by total occurrence count, candidate-pruned
    so the full vocabulary never reaches a shuffle. Exact whenever the
    k-th count > N/(cap+1) (guaranteed candidate completeness); at the
    gated scales the synthetic vocabulary is far under ``cap``, making
    the summaries lossless outright."""
    words = corpus_words(df, text_col, id_col)
    cand = _mg_summaries(words, cap).select("word").distinct()
    counts = (
        words.join(F.broadcast(cand), "word")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition
    # heaps + driver merge of k rows, never a global sort.
    return counts.orderBy(F.col("n").desc(), F.col("word")).limit(k)


def top_k_words_sql(
    table: str = "documents", k: int = 20, text: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Plain exact SQL — valid as the oracle BECAUSE the operator is
    exact under the certificate condition (see module docstring)."""
    return f"""
      SELECT word, CAST(count(*) AS BIGINT) AS n
      FROM ({corpus_words_sql(table, text, id_col)}) w
      WHERE word <> ''
      GROUP BY word
      ORDER BY n DESC, word
      LIMIT {k}
    """


def topk_certificate(df: DataFrame, topk: DataFrame, cap: int,
                     text_col: str = "text", id_col: str = "doc_id") -> bool:
    """True iff the returned k-th count provably exceeds the worst-case
    Misra-Gries deficit N/(cap+1) — i.e. the top-k is certified exact."""
    n_total = corpus_words(df, text_col, id_col).count()
    kth = topk.agg(F.min("n")).collect()[0][0]
    return kth is not None and kth > n_total / (cap + 1)


# --- Count-Min sketch ------------------------------------------------------


def _buckets(key_mod: Column, d: int, w: int, seed: int) -> list[Column]:
    out = []
    for r in range(d):
        a, c = _hash_params(seed + 101 * r)
        out.append(((F.lit(a) * key_mod + F.lit(c)) % F.lit(P31)) % F.lit(w))
    return out


def _km_sql(col: str) -> str:
    """Non-negative word key mod P31 (matches F.pmod on the 60-bit
    md5-prefix key; the key is always positive so one % suffices)."""
    return f"(({_content_key_sql(col)}) % {P31})"


def cms_build(
    df: DataFrame,
    d: int = 4,
    w: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """(r, bucket, c): the d x w Count-Min table over all word
    occurrences. One groupBy with map-side combine; the shuffle carries
    at most d*w*partitions partial rows no matter the corpus size."""
    words = corpus_words(df, text_col, id_col)
    km = F.pmod(_content_key(F.col("word")), F.lit(P31))
    rows = F.array(
        *[
            F.struct(F.lit(r).alias("r"), b.cast("int").alias("bucket"))
            for r, b in enumerate(_buckets(km, d, w, seed))
        ]
    )
    return (
        words.select(F.explode(rows).alias("s"))
        .select(F.col("s.r").alias("r"), F.col("s.bucket").alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count("*").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    d: int = 4,
    w: int = 512,
    word_col: str = "word",
    seed: int = 7,
) -> DataFrame:
    """Point estimates for the probe words: est = min over the d rows
    (>= true count, with the standard (e/w)*N error bound). The sketch
    (<= d*w rows) broadcasts; the probe side never re-shuffles."""
    km = F.pmod(_content_key(F.col(word_col)), F.lit(P31))
    rows = F.array(
        *[
            F.struct(F.lit(r).alias("r"), b.cast("int").alias("bucket"))
            for r, b in enumerate(_buckets(km, d, w, seed))
        ]
    )
    ex = probes.withColumn("_s", F.explode(rows)).select(
        "*", F.col("_s.r").alias("r"), F.col("_s.bucket").alias("bucket")
    ).drop("_s")
    joined = ex.join(F.broadcast(sketch), ["r", "bucket"], "left")
    keys = [c for c in probes.columns]
    return (
        joined.groupBy(*keys)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )


def cms_topk_sql(
    table: str = "documents",
    k: int = 15,
    d: int = 4,
    w: int = 512,
    seed: int = 7,
    text: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of (exact top-k words) |join| (their CMS estimates):
    replays every bucket collision exactly — integer hashes only."""
    params = ", ".join(
        f"({r}, {a}, {c})"
        for r, (a, c) in enumerate(
            _hash_params(seed + 101 * r) for r in range(d)
        )
    )
    return f"""
      WITH wds AS (
        SELECT word FROM ({corpus_words_sql(table, text, id_col)}) x
        WHERE word <> ''
      ),
      top AS (
        SELECT word, CAST(count(*) AS BIGINT) AS n
        FROM wds GROUP BY word ORDER BY n DESC, word LIMIT {k}
      ),
      params(r, a, c) AS (VALUES {params}),
      cms AS (
        SELECT r, ((a * {_km_sql('word')} + c) % {P31}) % {w} AS bucket,
               CAST(count(*) AS BIGINT) AS c
        FROM wds CROSS JOIN params GROUP BY 1, 2
      ),
      probe AS (
        SELECT t.word, t.n, p.r,
               ((p.a * {_km_sql('t.word')} + p.c) % {P31}) % {w} AS bucket
        FROM top t CROSS JOIN params p
      )
      SELECT word, n,
             CAST(min(coalesce(cms.c, 0)) AS BIGINT) AS est
      FROM probe LEFT JOIN cms USING (r, bucket)
      GROUP BY word, n
    """

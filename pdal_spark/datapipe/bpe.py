"""Distributed BPE tokenizer training (Sennrich et al. 2016) + encoding.

Standard word-level byte-pair encoding: train on the corpus word-
frequency table (chars as the seed vocabulary), repeatedly merge the
highest-count adjacent symbol pair (ties: lexicographically smallest
pair). The operator the tokenizer stage of every LLM data pipeline
runs before token counting becomes meaningful.

Execution shape (100 TB):
  * the corpus collapses to the DISTINCT word-frequency table first
    (one combinable exchange) — all training math runs on words x
    their counts, never on raw documents;
  * per merge step: pair counts are one map-side-combinable aggregate
    over (symbol, next-symbol) zip pairs; only the single winning pair
    (one row) ever reaches the driver;
  * merge application is a greedy left-to-right fold over each word's
    symbol array — pure F.aggregate codegen, no UDF, no shuffle.

This is a genuinely ITERATIVE algorithm (each merge depends on the
previous one), so the driver entry is rows-only by design; the strong
oracle is a pure-python reference implementation compared merge-for-
merge in tests (the sanctioned pattern for non-SQL-expressible ops).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _chars(word: Column) -> Column:
    """Symbol seed: the word's characters (portable substr loop — no
    regex-split edge cases)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )


def _merge_pair(seg: Column, a: str, b: str) -> Column:
    """Greedy left-to-right application of merge (a, b) -> a+b as a
    pure array fold (after a merge the new token is the fold's tail,
    so overlapping chains behave exactly like the reference scanner)."""
    ab = a + b
    return F.aggregate(
        seg,
        F.slice(seg, 1, 0),  # empty array typed like seg
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_freq(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) corpus word-frequency table — the training input."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Train ``n_merges`` BPE merges; returns [(step, left, right,
    pair_count)]. Stops early when no pair occurs twice."""
    words = word_freq(df, text_col).withColumn(
        "seg", _chars(F.col("word"))
    ).select("seg", "n").persist()

    merges: list[tuple[int, str, str, int]] = []
    cur = words
    for step in range(n_merges):
        m = F.size("seg")
        pairs = (
            cur.filter(m >= 2)
            .select(
                F.explode(
                    F.arrays_zip(
                        F.slice("seg", 1, m - 1).alias("a"),
                        F.slice("seg", 2, m - 1).alias("b"),
                    )
                ).alias("p"),
                "n",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("cnt"))
        )
        top = pairs.orderBy(
            F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc()
        ).first()
        if top is None or top["cnt"] < 2:
            break
        a, b, cnt = top["a"], top["b"], int(top["cnt"])
        merges.append((step, a, b, cnt))
        nxt = cur.select(_merge_pair(F.col("seg"), a, b).alias("seg"), "n").persist()
        # materialize the new cache BEFORE dropping the old one —
        # unpersisting first would evict the whole chain unused and
        # every later action would replay all prior merges from the
        # raw corpus (O(M^2) total merge applications).
        nxt.count()
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize each document with a trained merge list: per-doc BPE
    token count (sum over the doc's words of each word's symbol count
    after applying every merge in order). Join against the distinct
    word table so each word is encoded ONCE, not once per occurrence."""
    vocab = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "").distinct()
    seg = F.col("word")
    enc = vocab.withColumn("seg", _chars(seg))
    for _, a, b, _c in merges:
        enc = enc.withColumn("seg", _merge_pair(F.col("seg"), a, b))
    enc = enc.select("word", F.size("seg").alias("n_bpe"))
    ex = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        ex.join(F.broadcast(enc), "word")
        .groupBy(id_col)
        .agg(F.sum("n_bpe").cast("long").alias("n_bpe_tokens"))
    )


def bpe_train_reference(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Pure-python reference BPE trainer (the pytest oracle) —
    independent of any Spark/SQL machinery."""
    segs = {w: list(w) for w in word_counts}
    merges = []
    for step in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, seg in segs.items():
            n = word_counts[w]
            for i in range(len(seg) - 1):
                counts[(seg[i], seg[i + 1])] = counts.get((seg[i], seg[i + 1]), 0) + n
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append((step, a, b, cnt))
        for w, seg in segs.items():
            out, i = [], 0
            while i < len(seg):
                if i + 1 < len(seg) and seg[i] == a and seg[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seg[i])
                    i += 1
            segs[w] = out
    return merges

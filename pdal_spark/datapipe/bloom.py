"""Bloom-filter membership screen — incremental dedup against a
reference corpus.

The standing problem at 100 TB: you already hold a deduplicated corpus
and a new crawl arrives. Re-running pairwise dedup over (old + new) is
quadratic waste; the scale answer is a one-pass membership SKETCH of the
old corpus that every new document probes. A Bloom filter gives exactly
the right contract — no false negatives (a document whose content key is
in the reference is ALWAYS flagged), tunable false-positive rate
(m/n bits per key, k probes).

Scale shape:
  * build: k probe positions per reference doc (pure column math), one
    map-side-combined ``bit_or`` exchange on the word index — the output
    is the SPARSE bitmap table ``(word_idx, bits)`` with at most
    ``m/32`` rows regardless of corpus size. No driver-side bitmap: at
    10^12 keys m is hundreds of gigabits, which only exists sharded.
  * probe: for bitmap slices that fit an executor (the common case —
    m/32 longs), k BROADCAST joins against the bitmap; the probed side
    never shuffles at all. Membership = all k probed bits set.

Everything is exact integer arithmetic (md5 content key + the repo's
affine-cipher hash family over the Mersenne prime 2^31-1), so DuckDB
replays the filter bit-for-bit — false positives included — and the
driver's hash compare is green.

Reference-corpus parity note: the reference engine has no dedup stage
(point clouds don't need one); this module is part of the
training-data-pipeline mandate, sibling of `dedup.exact_dedup`
(first-occurrence within one corpus) — this is the ACROSS-corpus form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdal_spark.datapipe.sketch import P31, _hash_params

__all__ = ["bloom_build", "bloom_contains", "bloom_screen_sql", "bloom_stats"]

WORD = 32  # bits per bitmap word, stored in BIGINT: masks stay positive


def _content_key(text: Column) -> Column:
    """Exact 60-bit content key: first 15 hex chars of md5, base-16."""
    return F.conv(
        F.substring(F.md5(text.cast("binary")), 1, 15), 16, 10
    ).cast("long")


def _content_key_sql(text: str) -> str:
    return f"CAST('0x' || substring(md5({text}), 1, 15) AS BIGINT)"


def _probe_bits(key: Column, m_bits: int, k: int, seed: int) -> list[Column]:
    """k independent bit positions in [0, m_bits) for one key."""
    km = F.pmod(key, F.lit(P31))
    out = []
    for i in range(k):
        a, b = _hash_params(seed * 1009 + i)
        out.append((F.lit(a) * km + F.lit(b)) % F.lit(P31) % F.lit(m_bits))
    return out


def bloom_build(
    ref: DataFrame,
    text_col: str = "text",
    m_bits: int = 1 << 16,
    k: int = 3,
    seed: int = 7,
) -> DataFrame:
    """Sparse Bloom bitmap of the reference corpus's content keys.

    -> (word_idx long, bits long): word ``w`` holds bits
    ``[w*32, w*32+32)``; absent word == all zero. ONE exchange (bit_or
    is map-side combinable); row count bounded by m_bits/32."""
    bits = _probe_bits(_content_key(F.col(text_col)), m_bits, k, seed)
    pos = ref.select(F.explode(F.array(*bits)).alias("bit"))
    return (
        pos.groupBy(F.expr(f"bit div {WORD}").alias("word_idx"))
        .agg(
            F.bit_or(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(bit % {WORD} AS INT))")
            ).alias("bits")
        )
    )


def bloom_contains(
    df: DataFrame,
    bloom: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 16,
    k: int = 3,
    seed: int = 7,
) -> DataFrame:
    """Probe every row of ``df`` against a built bitmap.

    -> df columns + ``maybe_member`` (true iff ALL k probed bits are
    set — guaranteed true for every content key the bitmap was built
    from). Plan: k broadcast hash joins, zero exchanges of ``df``."""
    hit_cols = []
    out = df.withColumn("_key", _content_key(F.col(text_col)))
    for i in range(k):
        a, b_ = _hash_params(seed * 1009 + i)
        out = out.withColumn(
            f"_bit{i}",
            (F.lit(a) * F.pmod(F.col("_key"), F.lit(P31)) + F.lit(b_))
            % F.lit(P31)
            % F.lit(m_bits),
        )
        side = bloom.select(
            F.col("word_idx").alias(f"_w{i}"), F.col("bits").alias(f"_bits{i}")
        )
        out = out.join(
            F.broadcast(side),
            F.expr(f"_bit{i} div {WORD}") == F.col(f"_w{i}"),
            "left",
        )
        hit_cols.append(
            F.expr(
                f"(coalesce(_bits{i}, CAST(0 AS BIGINT)) & "
                f"shiftleft(CAST(1 AS BIGINT), CAST(_bit{i} % {WORD} AS INT)))"
                f" <> 0"
            ).alias(f"_hit{i}")
        )
    member = hit_cols[0]
    for h in hit_cols[1:]:
        member = member & h
    keep = [c for c in df.columns]
    return out.select(*keep, member.alias("maybe_member"))


def bloom_screen_sql(
    ref_pred: str,
    text: str = "text",
    id_col: str = "doc_id",
    table: str = "documents",
    m_bits: int = 1 << 16,
    k: int = 3,
    seed: int = 7,
) -> str:
    """DuckDB twin of build(ref WHERE ref_pred) + contains(all rows):
    identical affine probes, 32-bit words, bit_or — false positives and
    all."""
    consts_a = []
    consts_b = []
    for i in range(k):
        a, b = _hash_params(seed * 1009 + i)
        consts_a.append(str(a))
        consts_b.append(str(b))
    al = "[" + ", ".join(consts_a) + "]"
    bl = "[" + ", ".join(consts_b) + "]"
    probes = ", ".join(f"({i})" for i in range(k))
    key = _content_key_sql(text)
    return f"""
      WITH keyed AS (
        SELECT {id_col},
               (({key}) % {P31} + {P31}) % {P31} AS km,
               ({ref_pred}) AS is_ref
        FROM {table}
      ),
      probe(i) AS (VALUES {probes}),
      pos AS (
        SELECT {id_col}, is_ref,
               ({al}[i + 1] * km + {bl}[i + 1]) % {P31} % {m_bits} AS bit
        FROM keyed CROSS JOIN probe
      ),
      bloom AS (
        SELECT bit // {WORD} AS word_idx,
               bit_or(1::BIGINT << CAST(bit % {WORD} AS INT)) AS bits
        FROM pos WHERE is_ref GROUP BY 1
      )
      SELECT p.{id_col},
             bool_and(coalesce(b.bits, 0)
                      & (1::BIGINT << CAST(p.bit % {WORD} AS INT)) <> 0)
               AS maybe_member
      FROM pos p LEFT JOIN bloom b ON p.bit // {WORD} = b.word_idx
      GROUP BY p.{id_col}
    """


def bloom_stats(bloom: DataFrame, m_bits: int, n_keys: int, k: int) -> dict:
    """Observed fill ratio + the standard fpp estimate (1-e^{-kn/m})^k."""
    import math

    r = bloom.agg(
        F.sum(F.bit_count("bits")).alias("set"), F.count("*").alias("words")
    ).collect()[0]
    set_bits = int(r.set or 0)
    return {
        "m_bits": m_bits,
        "k": k,
        "n_keys": n_keys,
        "set_bits": set_bits,
        "fill_ratio": set_bits / m_bits,
        "est_fpp": (1.0 - math.exp(-k * n_keys / m_bits)) ** k,
    }

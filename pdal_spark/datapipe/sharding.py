"""Jump consistent hashing — minimal-movement shard assignment
(Lamping & Veach, "A Fast, Minimal Memory, Consistent Hash Algorithm",
arXiv:1406.2294).

The resharding problem at 100 TB: a corpus sharded over n buckets
(serving shards, embedding-index partitions, per-worker tokenizer
splits) grows to n+1 buckets. Naive ``key % n`` reassigns (n-1)/n of
ALL keys — a full re-shuffle of the table; jump hash reassigns exactly
the expected 1/(n+1) fraction, and every moved key moves TO THE NEW
bucket (a key's bucket sequence over growing n is monotone — the
algorithm's defining property, pinned in tests). No ring state, no
lookup table: assignment is a pure function of (key, n).

Execution shape: a map-only Arrow kernel (`mapInPandas`) — the jump
loop is data-dependent (geometric jump count, E[#jumps] = O(ln n)) so
it cannot be a fixed Column expression, but it vectorizes cleanly over
the batch: all keys advance one jump per numpy iteration, finished
keys mask out. Zero shuffles; at 100 TB this fuses into whatever scan
runs. The DuckDB twin replays the identical uint64 LCG walk as a
recursive CTE in HUGEINT arithmetic (bit-exact — both engines do the
same float64 multiply/divide), so the driver oracle is hash-green.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["jump_bucket", "shard_assign", "jump_bucket_sql"]

_LCG = 2862933555777941757  # the paper's 64-bit LCG multiplier
_TWO31 = float(1 << 31)


def _jump_np(keys, n: int):
    """Vectorized jump hash over a uint64 key array."""
    import numpy as np

    key = keys.astype(np.uint64, copy=True)
    b = np.full(key.shape, -1, dtype=np.int64)
    j = np.zeros(key.shape, dtype=np.int64)
    active = j < n
    lcg = np.uint64(_LCG)
    one = np.uint64(1)
    while active.any():
        b[active] = j[active]
        with np.errstate(over="ignore"):
            key[active] = key[active] * lcg + one
        r = ((key[active] >> np.uint64(33)) + one).astype(np.float64)
        j[active] = ((b[active] + 1) * (_TWO31 / r)).astype(np.int64)
        active = j < n
    return b


def jump_bucket(df: DataFrame, key_col: str, n_buckets: int,
                out_col: str = "bucket") -> DataFrame:
    """Append ``out_col`` = jump_hash(key, n_buckets) (int in [0, n))."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    from pyspark.sql.types import LongType, StructField, StructType

    # fresh StructType — StructType.add mutates in place, and
    # df.schema is the DataFrame's CACHED schema object
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, LongType())]
    )
    cols = df.columns

    def part(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = _jump_np(
                pdf[key_col].to_numpy(dtype="int64").view("uint64"),
                n_buckets,
            )
            yield pdf[cols + [out_col]]

    return df.mapInPandas(part, schema)


def shard_assign(df: DataFrame, key_col: str, n_old: int,
                 n_new: int) -> DataFrame:
    """Resharding plan n_old -> n_new: per key, the old and new bucket
    and whether it moves. With jump hash the moved fraction is the
    theoretical minimum (|n_new - n_old| / max) and every move lands in
    a new bucket — the re-shuffle byte count IS the minimum."""
    out = jump_bucket(
        jump_bucket(df, key_col, n_old, out_col="bucket_old"),
        key_col, n_new, out_col="bucket_new",
    )
    return out.withColumn(
        "moved", (F.col("bucket_old") != F.col("bucket_new")).cast("int")
    )


def jump_bucket_sql(table: str, key_col: str, n_buckets: int,
                    out_col: str = "bucket") -> str:
    """DuckDB twin: the identical LCG walk as a recursive CTE.

    uint64 wraparound is HUGEINT ``% 2^64``; ``key >> 33`` becomes
    integer division by 2^33 (the quotient fits 31 bits, so the float64
    ``(b+1) * (2^31 / (r+1))`` matches numpy bit-for-bit); the int64
    reinterpretation of negative keys adds 2^64."""
    two64 = 1 << 64
    two33 = 1 << 33
    return f"""
      WITH RECURSIVE walk(k, key, b, j) AS (
        SELECT {key_col} AS k,
               (CASE WHEN {key_col} < 0
                     THEN CAST({key_col} AS HUGEINT) + {two64}
                     ELSE CAST({key_col} AS HUGEINT) END) AS key,
               CAST(-1 AS BIGINT) AS b, CAST(0 AS BIGINT) AS j
        FROM {table}
        UNION ALL
        SELECT k,
               (key * {_LCG} + 1) % {two64},
               j,
               CAST(trunc((j + 1) * (2147483648.0 /
                 CAST((((key * {_LCG} + 1) % {two64}) // {two33}) + 1
                      AS DOUBLE))) AS BIGINT)
        FROM walk WHERE j < {n_buckets}
      )
      SELECT k AS {key_col}, b AS {out_col}
      FROM walk WHERE j >= {n_buckets}
    """

"""Sequence-packing manifest for LM training data.

GPT-style concat-then-chunk packing: documents are concatenated in a
deterministic order, the resulting token stream is cut into fixed
``max_len`` blocks, and every document records which blocks it lands in.
This is the packing scheme most pretraining loaders use (no per-bin
search — the stream is chunked, documents straddle block boundaries),
and the manifest is what a loader needs to materialize any block
without scanning its neighbors.

Scale shape: the only global state is each document's token OFFSET —
an exact distributed prefix sum (operators/ordered.py running_total:
range partition + per-partition window + #partitions-row offset table).
Everything after the offset is per-row integer arithmetic; block ids
use integral `div` (not float division) so offsets beyond 2^53 tokens
stay exact. One range shuffle total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdal_spark.operators.ordered import running_total

__all__ = ["pack_sequences", "pack_sequences_sql", "pack_block_stats"]


def pack_sequences(
    df: DataFrame,
    max_len: int,
    tokens_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (id_col, n_tokens, tok_start, block_start, block_end,
    n_blocks): the packing manifest. ``tok_start`` is the document's
    exclusive token offset in id order; blocks are ``max_len`` tokens;
    a document covers blocks [tok_start // L, (tok_start+n-1) // L].
    Zero-token documents occupy no block (n_blocks 0, NULL bounds)."""
    L = int(max_len)
    if L <= 0:
        raise ValueError("max_len must be positive")
    base = df.select(
        F.col(id_col), F.col(tokens_col).cast("long").alias("n_tokens")
    )
    work = running_total(
        base, keys=[F.col(id_col)], value=F.col("n_tokens"),
        out_col="tok_start", inclusive=False,
    )
    nz = F.col("n_tokens") > 0
    bs = F.expr(f"tok_start div {L}")
    be = F.expr(f"(tok_start + n_tokens - 1) div {L}")
    return work.select(
        id_col,
        "n_tokens",
        "tok_start",
        F.when(nz, bs).alias("block_start"),
        F.when(nz, be).alias("block_end"),
        F.when(nz, be - bs + 1).otherwise(F.lit(0)).cast("long")
        .alias("n_blocks"),
    )


def pack_sequences_sql(
    max_len: int,
    tokens_expr: str,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin: exclusive window sum for the offset, `//` for the
    block ids — identical integer arithmetic."""
    L = int(max_len)
    return f"""
      WITH base AS (
        SELECT {id_col}, CAST({tokens_expr} AS BIGINT) AS n_tokens
        FROM {table}
      ),
      off AS (
        -- DuckDB's windowed sum(BIGINT) widens to HUGEINT (int128), and
        -- `//` on HUGEINT stays HUGEINT; the engine emits LongType, so
        -- every derived column must be cast back to BIGINT or the
        -- driver's dtype-sensitive hash diverges on identical values.
        SELECT {id_col}, n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (
                 ORDER BY {id_col}
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS tok_start
        FROM base
      )
      SELECT {id_col}, n_tokens, tok_start,
             CAST(CASE WHEN n_tokens > 0 THEN tok_start // {L} END
               AS BIGINT) AS block_start,
             CAST(CASE WHEN n_tokens > 0
                  THEN (tok_start + n_tokens - 1) // {L} END
               AS BIGINT) AS block_end,
             CAST(CASE WHEN n_tokens > 0
                  THEN (tok_start + n_tokens - 1) // {L} - tok_start // {L} + 1
                  ELSE 0 END AS BIGINT) AS n_blocks
      FROM off
    """


def pack_block_stats(manifest: DataFrame, max_len: int) -> dict:
    """Loader-facing totals: block count, total/padded tokens, the fill
    ratio of the final (only partially filled) block."""
    L = int(max_len)
    r = manifest.agg(
        F.sum("n_tokens").alias("toks"),
        F.max(F.col("block_end")).alias("last"),
    ).collect()[0]
    toks = int(r.toks or 0)
    n_blocks = int(r.last) + 1 if r.last is not None else 0
    return {
        "max_len": L,
        "n_blocks": n_blocks,
        "total_tokens": toks,
        "pad_tokens": n_blocks * L - toks,
        "last_block_fill": (toks - (n_blocks - 1) * L) / L if n_blocks else 0.0,
    }

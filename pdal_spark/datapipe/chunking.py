"""Sliding-window document chunking — the RAG/embedding-pipeline
complement of `packing.pack_sequences`: packing concatenates docs into
fixed blocks for pretraining; chunking splits each LONG doc into
overlapping windows for retrieval indexing and context-bounded
embedding (the LangChain/LlamaIndex "chunk_size / chunk_overlap"
contract, word-granular).

Chunk i of a doc with n tokens covers tokens
[i*stride, i*stride + max_tokens), stride = max_tokens - overlap, for
i = 0 .. ceil((n - max_tokens) / stride) (one chunk when
n <= max_tokens). Every token is covered, consecutive chunks share
exactly `overlap` tokens, and the final chunk is the only one allowed
to be short.

Plan shape: pure higher-order array expressions (sequence/transform/
slice/array_join) + one explode — MAP-ONLY, zero shuffles, no UDF; at
100 TB the chunk manifest streams out at scan bandwidth. The DuckDB
twin replays starts, slices, and joins exactly (integer arithmetic
only), so chunk_text itself is hash-compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdal_spark.session import ensure_min_partitions


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """(id, chunk_id, start_tok, n_tok, chunk_text): word-granular
    sliding windows; start_tok is 1-based, chunk_id 0-based."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    df = ensure_min_partitions(df)
    ws = F.split(F.col(text_col), " ")
    n = F.size(ws)
    # i_max = ceil((n - max_tokens) / stride), clamped at 0
    i_max = F.greatest(
        F.lit(0),
        -F.floor(-(n - F.lit(max_tokens)) / F.lit(stride)).cast("int"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), i_max),
        lambda i: F.struct(
            i.alias("chunk_id"),
            (i * stride + 1).alias("start_tok"),
            F.slice(ws, i * stride + 1, max_tokens).alias("toks"),
        ),
    )
    return (
        df.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_id").alias("chunk_id"),
            F.col("c.start_tok").alias("start_tok"),
            F.size("c.toks").alias("n_tok"),
            F.array_join("c.toks", " ").alias("chunk_text"),
        )
    )


def chunk_documents_sql(
    table: str = "documents",
    text: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 128,
    overlap: int = 32,
) -> str:
    """DuckDB twin (1-based inclusive list slicing; range() is
    end-exclusive so the sequence bound is i_max + 1)."""
    stride = max_tokens - overlap
    return f"""
WITH d AS (
  SELECT {id_col}, string_split({text}, ' ') AS ws FROM {table}
),
e AS (
  SELECT {id_col}, ws,
         unnest(range(0, greatest(0,
           CAST(ceil((len(ws) - {max_tokens}) / {stride}.0) AS BIGINT)
         ) + 1)) AS i
  FROM d
)
SELECT {id_col},
       CAST(i AS INT) AS chunk_id,
       CAST(i * {stride} + 1 AS INT) AS start_tok,
       CAST(len(ws[i * {stride} + 1 : i * {stride} + {max_tokens}])
            AS INT) AS n_tok,
       array_to_string(
         ws[i * {stride} + 1 : i * {stride} + {max_tokens}], ' '
       ) AS chunk_text
FROM e
""".strip()

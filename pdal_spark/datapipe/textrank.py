"""TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004) — the
graph-based keyword ranker: words are nodes, an undirected edge links
words co-occurring within a `window` of token positions, and PageRank
over that graph scores keyword centrality.

Scale shape: every document's graph is built ONLY from its own text,
so the whole operator is one MAP-ONLY Arrow-batched kernel
(mapInPandas) — embarrassingly parallel, zero shuffles, no driver
state; at 100 TB it scales with scan bandwidth exactly like the other
per-doc quality kernels (compression_ratio, multimodal decode). The
per-doc graphs are vocabulary-of-one-document sized (hundreds of
nodes), so dense numpy power iteration is the right kernel — this is
the documented exception where Python beats a 30-round distributed
fixed point (graphrank.pagerank exists for CORPUS-sized graphs).

Determinism: the kernel depends only on the document text (partition-
invariant), runs a FIXED iteration count in float64, rounds scores to
6 decimals, and breaks ranking ties by (score desc, word asc) — so
reruns and repartitionings are bit-identical. No SQL twin (a per-doc
iterative loop is not DuckDB-replayable); the strong oracle is the
pure-python reference in tests/test_textrank.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdal_spark.session import ensure_min_partitions

DAMPING = 0.85
ITERS = 30


def _textrank_doc(
    words: list[str], window: int, k: int
) -> list[tuple[str, float, int]]:
    """(keyword, score, rank) for one document. Standard unweighted
    TextRank: w(v) = (1-d) + d * sum_{u in adj(v)} w(u) / deg(u),
    fixed ITERS iterations from w0 = 1."""
    vocab = sorted(set(words))
    n = len(vocab)
    if n == 0:
        return []
    idx = {w: i for i, w in enumerate(vocab)}
    pos = [idx[w] for w in words]
    adj = np.zeros((n, n), dtype=np.float64)
    for i in range(len(pos)):
        for j in range(i + 1, min(i + window + 1, len(pos))):
            a, b = pos[i], pos[j]
            if a != b:
                adj[a, b] = 1.0
                adj[b, a] = 1.0
    deg = adj.sum(axis=1)
    safe = np.where(deg > 0, deg, 1.0)
    w = np.ones(n, dtype=np.float64)
    for _ in range(ITERS):
        w = (1.0 - DAMPING) + DAMPING * (adj @ (w / safe))
    scores = np.round(w, 6)
    order = sorted(range(n), key=lambda i: (-scores[i], vocab[i]))
    return [
        (vocab[i], float(scores[i]), r + 1)
        for r, i in enumerate(order[:k])
    ]


def textrank_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 2,
    k: int = 10,
) -> DataFrame:
    """(id, keyword, score, rank) — top-k TextRank keywords per doc."""
    if window < 1 or k < 1:
        raise ValueError("window and k must be >= 1")
    df = ensure_min_partitions(df)
    fields = df.select(id_col).schema.fields[0]
    out_schema = (
        f"{id_col} {fields.dataType.simpleString()}, "
        "keyword string, score double, rank int"
    )
    src = df.select(id_col, text_col)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                ws = [w for w in str(text).split(" ") if w]
                for kw, sc, rk in _textrank_doc(ws, window, k):
                    rows.append((did, kw, sc, rk))
            yield pd.DataFrame(
                rows, columns=[id_col, "keyword", "score", "rank"]
            )

    return src.mapInPandas(kernel, out_schema)

"""TextRank keywords: pure-python reference oracle, hub-centrality
semantics, determinism / partition invariance, boundary docs."""

from __future__ import annotations

import pytest

from pdal_spark.datapipe import textrank as TR


def _py_textrank(words, window=2, k=10, d=0.85, iters=30):
    """Independent reference: dict-based adjacency + python-loop power
    iteration (different data layout and summation path than the numpy
    kernel)."""
    vocab = sorted(set(words))
    if not vocab:
        return []
    adj = {w: set() for w in vocab}
    for i, a in enumerate(words):
        for j in range(i + 1, min(i + window + 1, len(words))):
            b = words[j]
            if a != b:
                adj[a].add(b)
                adj[b].add(a)
    w = {v: 1.0 for v in vocab}
    for _ in range(iters):
        nxt = {}
        for v in vocab:
            s = sum(w[u] / len(adj[u]) for u in adj[v])
            nxt[v] = (1.0 - d) + d * s
        w = nxt
    scored = sorted(
        ((round(w[v], 6), v) for v in vocab), key=lambda t: (-t[0], t[1])
    )
    return [(v, s, r + 1) for r, (s, v) in enumerate(scored[:k])]


DOCS = [
    (0, "spark query spark join spark filter spark window plan"),
    (1, "a b a b a b c"),
    (2, "one"),
    (3, ""),
]


@pytest.fixture(scope="module")
def literal_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_python_reference(spark, literal_df):
    got = {}
    for r in TR.textrank_keywords(literal_df, window=2, k=10).collect():
        got.setdefault(r.doc_id, []).append((r.keyword, r.score, r.rank))
    for did, text in DOCS:
        ws = [w for w in text.split(" ") if w]
        exp = _py_textrank(ws, window=2, k=10)
        g = sorted(got.get(did, []), key=lambda t: t[2])
        assert [(a, c) for a, _, c in g] == [(a, c) for a, _, c in exp], did
        for (_, gs, _), (_, xs, _) in zip(g, exp):
            assert gs == pytest.approx(xs, abs=1e-6), did


def test_hub_word_ranks_first(spark, literal_df):
    top = (
        TR.textrank_keywords(literal_df, window=2, k=1)
        .filter("doc_id = 0")
        .collect()
    )
    assert top[0].keyword == "spark"


def test_boundary_docs(spark, literal_df):
    rows = TR.textrank_keywords(literal_df).filter("doc_id >= 2").collect()
    # single-word doc: one node, no edges, score = 1 - d
    by_doc = {r.doc_id: r for r in rows}
    assert 3 not in by_doc  # empty doc -> nothing
    assert by_doc[2].keyword == "one"
    assert by_doc[2].score == pytest.approx(0.15, abs=1e-9)


def test_partition_invariance(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    a = sorted(
        map(tuple, TR.textrank_keywords(df, k=5).collect())
    )
    b = sorted(
        map(tuple, TR.textrank_keywords(df.repartition(7), k=5).collect())
    )
    assert a == b and len(a) > 0


def test_plan_is_map_only(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        TR.textrank_keywords(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange hashpartitioning" not in plan
    assert "Window" not in plan

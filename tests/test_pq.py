"""Product quantization — pure-numpy reference parity + laws."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdal_spark.datapipe import pq
from pdal_spark.datapipe.simsearch import _round_half_up


def _ref_train(V, m, ksub, n_iters):
    """Independent numpy replica of the training contract (init from
    smallest ids == first rows, argmin first-min, mean, HALF_UP-9)."""
    d = V.shape[1]
    dsub = d // m
    C = np.stack([V[:ksub, s * dsub:(s + 1) * dsub].copy() for s in range(m)])
    for _ in range(n_iters):
        new = C.copy()
        for s in range(m):
            X = V[:, s * dsub:(s + 1) * dsub]
            dist = ((X[:, None, :] - C[s][None, :, :]) ** 2).sum(-1)
            a = np.argmin(dist, axis=1)
            for code in range(ksub):
                mask = a == code
                if mask.any():
                    new[s, code] = X[mask].mean(axis=0)
        C = _round_half_up(new, 9)
    return C


def _ref_encode(V, C):
    m, ksub, dsub = C.shape
    codes = np.empty((len(V), m), dtype=np.int64)
    for s in range(m):
        X = V[:, s * dsub:(s + 1) * dsub]
        dist = ((X[:, None, :] - C[s][None, :, :]) ** 2).sum(-1)
        codes[:, s] = np.argmin(dist, axis=1)
    return codes


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def V(emb):
    rows = emb.orderBy("vec_id").collect()
    return np.array([r.embedding for r in rows], dtype=np.float64)


def test_train_matches_numpy_reference(spark, emb, V):
    got = pq.pq_train(emb, m=4, ksub=8, n_iters=2)
    exp = _ref_train(V, m=4, ksub=8, n_iters=2)
    assert got.shape == exp.shape == (4, 8, 16)
    assert (got == exp).all()


def test_train_partition_invariant(spark, emb):
    a = pq.pq_train(emb.repartition(7), m=4, ksub=8, n_iters=2)
    b = pq.pq_train(emb.coalesce(1), m=4, ksub=8, n_iters=2)
    assert (a == b).all()


def test_encode_matches_reference_and_centroid_roundtrip(spark, emb, V):
    books = pq.pq_train(emb)
    got = {
        r.id: list(r.codes) for r in pq.pq_encode(emb, books).collect()
    }
    exp = _ref_encode(V, books)
    for i in range(len(V)):
        assert got[i] == list(exp[i])
    # a vector EQUAL to a centroid concatenation encodes to those codes
    synth = np.concatenate([books[s, 3] for s in range(books.shape[0])])
    sdf = spark.createDataFrame(
        pd.DataFrame({"vec_id": [999], "embedding": [synth.tolist()]})
    )
    codes = pq.pq_encode(sdf, books).collect()[0].codes
    assert list(codes) == [3] * books.shape[0]


def test_adc_topk_matches_exact_quantized_distance(spark, emb, V):
    """ADC(q, x) must EQUAL the exact distance from q to x's
    reconstruction — PQ's defining identity — and the ranking must be
    the brute-force ranking of those quantized distances."""
    books = pq.pq_train(emb)
    codes = _ref_encode(V, books)
    m, ksub, dsub = books.shape
    recon = np.concatenate(
        [books[s][codes[:, s]] for s in range(m)], axis=1
    )
    q = V[5]
    # fixed sub-order accumulation, like the kernel
    exact = np.zeros(len(V))
    for s in range(m):
        exact = exact + (
            (q[s * dsub:(s + 1) * dsub] - recon[:, s * dsub:(s + 1) * dsub])
            ** 2
        ).sum(-1)
    enc = pq.pq_encode(emb, books)
    out = (
        pq.pq_topk(enc, books, [(5, q)], k=10)
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    order = np.lexsort((np.arange(len(V)), np.round(exact, pq.ROUND)))[:10]
    assert list(out.id) == list(order)
    assert np.allclose(out.adc_dist, np.round(exact[order], pq.ROUND), atol=0)
    # self is its own nearest quantized neighbor here
    assert out.id.iloc[0] == 5


def test_partition_local_prune_is_lossless(spark, emb, V):
    """Top-k through 7 partitions equals top-k through 1 — the local
    prune keeps k per partition, which can never evict a global
    winner."""
    books = pq.pq_train(emb)
    q = [(0, V[0])]
    a = pq.pq_topk(
        pq.pq_encode(emb.repartition(7), books), books, q, k=5
    ).toPandas().sort_values("rank").reset_index(drop=True)
    b = pq.pq_topk(
        pq.pq_encode(emb.coalesce(1), books), books, q, k=5
    ).toPandas().sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_compression_is_real(spark, emb):
    """64 float32 -> 8 small ints: the schema carries codes only."""
    books = pq.pq_train(emb)
    enc = pq.pq_encode(emb, books)
    assert [f.name for f in enc.schema.fields] == ["id", "codes"]
    row = enc.first()
    assert len(row.codes) == pq.PQ_M
    assert all(0 <= c < pq.PQ_KSUB for c in row.codes)


def test_ivfpq_full_probe_equals_pq(spark, emb, V):
    """nprobe = nlist probes everything -> IVF-PQ == plain PQ ADC."""
    books = pq.pq_train(emb)
    enc = pq.pq_encode(emb, books)
    queries = [(0, V[0]), (7, V[7])]
    a = (
        pq.ivfpq_topk(emb, queries, k=8, nlist=8, nprobe=8)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    b = (
        pq.pq_topk(enc, books, queries, k=8)
        .toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_ivfpq_subset_law(spark, emb, V):
    """At nprobe < nlist the result is exactly the PQ ranking RESTRICTED
    to members of the probed lists (computed independently in numpy)."""
    from pdal_spark.datapipe.simsearch import (
        _seq_dot_matrix,
        _seq_norms,
        ivf_assign,
        ivf_train,
    )

    nlist, nprobe, k = 8, 2, 6
    cents = ivf_train(emb, nlist, 2)
    member = {
        r.id: r.list_id for r in ivf_assign(emb, cents, 1).collect()
    }
    books = pq.pq_train(emb)
    codes = _ref_encode(V, books)
    mm, _, dd = books.shape

    q = V[3]
    sims = (_seq_dot_matrix(q[None, :], cents) / _seq_norms(q[None, :])[:, None])[0]
    lists = np.arange(nlist)
    probed = set(lists[np.lexsort((lists, -sims))[:nprobe]])

    # numpy ADC over probed members only
    cand = np.array([i for i in range(len(V)) if member[i] in probed])
    acc = np.zeros(len(cand))
    for s in range(mm):
        t = ((q[s * dd:(s + 1) * dd][None, :] - books[s]) ** 2).sum(-1)
        acc = acc + t[codes[cand, s]]
    order = np.lexsort((cand, np.round(acc, pq.ROUND)))[:k]
    exp = list(zip(cand[order], np.round(acc[order], pq.ROUND)))

    out = (
        pq.ivfpq_topk(emb, [(3, q)], k=k, nlist=nlist, nprobe=nprobe)
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    assert list(out.id) == [int(i) for i, _ in exp]
    assert np.allclose(out.adc_dist, [d for _, d in exp], atol=0)


def test_ivfpq_probe_join_is_broadcast(spark, emb, V):
    plan = pq.ivfpq_topk(
        emb, [(0, V[0])], k=5, nlist=8, nprobe=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan

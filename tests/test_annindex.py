"""Persistent IVF index (datapipe/annindex.py): exactness in
full-probe mode, incremental append, persistence, time travel."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdal_spark.datapipe import simsearch as sim
from pdal_spark.datapipe.annindex import IvfIndex

SF = "/root/testdata/sf0.001"


def _res(df):
    return sorted(
        (r.src_id, r.cand_id, r.cosine, r.rank) for r in df.collect()
    )


def test_build_append_query_exact(spark, tmp_path):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = IvfIndex(spark, str(tmp_path / "idx"))
    idx.build(df.filter(F.col("vec_id") % 2 == 0))
    info = idx.append(df.filter(F.col("vec_id") % 2 == 1))
    assert info["n_appended"] > 0
    got = _res(idx.query(df, k=3))
    exact = _res(sim.cosine_topk(df, k=3))
    assert got == exact


def test_persistence_reopen_without_retrain(spark, tmp_path):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    root = str(tmp_path / "idx2")
    IvfIndex(spark, root).build(df)
    # a fresh handle sees the stored centroids + lists
    reopened = IvfIndex(spark, root)
    assert reopened.centroids().shape[0] == reopened.nlist
    got = _res(reopened.query(df.limit(50), k=2))
    assert len(got) == 100  # 50 queries x k=2


def test_append_is_one_snapshot_time_travelable(spark, tmp_path):
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = IvfIndex(spark, str(tmp_path / "idx3"))
    idx.build(df.filter(F.col("vec_id") < 100))
    v1 = idx.members_t.current_version()
    idx.append(df.filter(F.col("vec_id") >= 100))
    assert idx.members_t.current_version() == v1 + 1
    n_before = idx.members_t.read(version=v1).count()
    n_after = idx.members_t.read().count()
    assert n_before == 100 and n_after == df.count()


def test_probe_recall_monotone_to_exact(spark, tmp_path):
    """Recall is non-decreasing in nprobe and reaches 1.0 at full
    probe — the IVF contract. (The synthetic embeddings are near-
    uniform on the sphere, so absolute recall at nprobe=1 is low by
    construction; the MONOTONE ramp and the exact ceiling are the
    properties that hold on any corpus.)"""
    df = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = IvfIndex(spark, str(tmp_path / "idx4"))
    idx.build(df.filter(F.col("vec_id") % 2 == 0))
    idx.append(df.filter(F.col("vec_id") % 2 == 1))
    exact = {(r.src_id, r.cand_id)
             for r in sim.cosine_topk(df, k=3).collect()}

    def recall(nprobe):
        approx = {(r.src_id, r.cand_id)
                  for r in idx.query(df, k=3, nprobe=nprobe).collect()}
        return len(approx & exact) / len(exact)

    r1, r4, rfull = recall(1), recall(4), recall(idx.nlist)
    assert r1 > 0
    assert r1 <= r4 + 1e-9 <= rfull + 2e-9
    assert rfull == 1.0

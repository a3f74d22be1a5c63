"""Jump consistent hashing (datapipe/sharding.py): reference-loop
parity, the minimal-movement property, and uniformity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdal_spark.datapipe import sharding as sh


def _jump_ref(key: int, n: int) -> int:
    """The paper's scalar loop (Lamping & Veach 2014, fig. 1)."""
    key &= (1 << 64) - 1
    b, j = -1, 0
    while j < n:
        b = j
        key = (key * 2862933555777941757 + 1) & ((1 << 64) - 1)
        j = int((b + 1) * (float(1 << 31) / float((key >> 33) + 1)))
    return b


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(0, 2000).select(F.col("id").alias("k"))


def test_matches_reference_loop(spark, keys):
    got = {
        r.k: r.bucket
        for r in sh.jump_bucket(keys, "k", 16).collect()
    }
    for k in range(2000):
        assert got[k] == _jump_ref(k, 16), k


def test_single_bucket_and_validation(spark, keys):
    out = sh.jump_bucket(keys, "k", 1).select("bucket").distinct().collect()
    assert [r.bucket for r in out] == [0]
    with pytest.raises(ValueError):
        sh.jump_bucket(keys, "k", 0)


def test_monotone_minimal_movement(spark, keys):
    """Growing n -> n+1: every key either stays or moves to THE NEW
    bucket n — the property that makes resharding cost minimal."""
    for n in (4, 16, 63):
        plan = sh.shard_assign(keys, "k", n, n + 1).collect()
        for r in plan:
            assert r.bucket_new == r.bucket_old or r.bucket_new == n
        moved = sum(r.moved for r in plan)
        # expected 2000/(n+1) moves; allow generous sampling slack
        exp = 2000 / (n + 1)
        assert exp * 0.5 <= moved <= exp * 1.8, (n, moved)


def test_roughly_uniform(spark, keys):
    counts = (
        sh.jump_bucket(keys, "k", 8).groupBy("bucket").count().collect()
    )
    assert len(counts) == 8
    for r in counts:
        assert 150 <= r["count"] <= 350  # 250 expected


def test_negative_keys_wrap_like_uint64(spark):
    df = spark.createDataFrame([(-1,), (-123456789,)], "k long")
    got = {r.k: r.bucket for r in sh.jump_bucket(df, "k", 16).collect()}
    for k in (-1, -123456789):
        assert got[k] == _jump_ref(k & ((1 << 64) - 1), 16)

"""Incremental view maintenance (operators/ivm.py): maintained
aggregate == full recompute through inserts, deletes, and updates;
vanishing and appearing groups."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdal_spark.catalog import SnapshotTable
from pdal_spark.operators import ivm


def _kv(spark, lo, hi, mult=1):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("g"),
        (F.col("id") * mult).alias("v"),
    )


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_maintain_equals_recompute_through_merge(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stats_cols=("k",))
    t.append(_kv(spark, 0, 200).coalesce(1))
    t.append(_kv(spark, 200, 300).coalesce(1))
    v0 = t.current_version()
    base = ivm.aggregate_state(t.read(), ["g"], sum_cols=("v",))

    # update every k % 7 == 0 (v *= 10), delete 290..299, insert 1000..1009
    upd = _kv(spark, 0, 300, mult=10).filter(F.col("k") % 7 == 0)
    t.merge(upd, key="k")
    t.merge(
        spark.range(290, 300).select(F.col("id").alias("k")),
        key="k", when_matched="delete",
    )
    t.merge(_kv(spark, 1000, 1010), key="k")

    maintained = ivm.maintain_aggregate(
        base, t.changes(v0), ["g"], sum_cols=("v",)
    )
    recomputed = ivm.aggregate_state(t.read(), ["g"], sum_cols=("v",))
    assert _sorted(maintained) == _sorted(recomputed)


def test_groups_vanish_and_appear(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t2"), stats_cols=("k",))
    t.append(_kv(spark, 0, 10).coalesce(1))  # groups g=0..4
    v0 = t.current_version()
    base = ivm.aggregate_state(t.read(), ["g"], sum_cols=("v",))
    # delete both members of g=3 (k=3, k=8); insert k=100 (g=0) and a
    # brand-new group via k=1001 -> wait g = k%5, so add k=14 (g=4)
    t.merge(
        spark.createDataFrame([(3,), (8,)], "k long"),
        key="k", when_matched="delete",
    )
    t.merge(_kv(spark, 100, 101), key="k")
    maintained = ivm.maintain_aggregate(
        base, t.changes(v0), ["g"], sum_cols=("v",)
    )
    got = {r.g: (r.n, r.sum_v) for r in maintained.collect()}
    assert 3 not in got          # count reached zero -> group vanishes
    assert got[0] == (3, 105)    # k=0,5 plus inserted k=100
    recomputed = ivm.aggregate_state(t.read(), ["g"], sum_cols=("v",))
    assert _sorted(maintained) == _sorted(recomputed)


def test_empty_change_feed_is_identity(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t3"), stats_cols=("k",))
    t.append(_kv(spark, 0, 50).coalesce(1))
    v0 = t.current_version()
    base = ivm.aggregate_state(t.read(), ["g"], sum_cols=("v",))
    out = ivm.maintain_aggregate(base, t.changes(v0), ["g"], sum_cols=("v",))
    assert _sorted(out) == _sorted(base)

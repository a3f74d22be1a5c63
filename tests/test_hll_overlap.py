"""HLL set-algebra overlap: planted-overlap semantics, union-merge
exactness vs single-group sketches, DuckDB twin at sf0.001."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pdal_spark.datapipe import sketch as S
from pdal_spark.datapipe.bloom import _content_key, _content_key_sql


def _mix(v: int) -> int:
    """md5-mixed 60-bit key — the affine register hash expects
    well-mixed integers (consecutive ints are structured under an
    affine cipher), matching production callers (_content_key /
    fp_roll)."""
    import hashlib

    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _grouped_values(spark, spec):
    """spec: {group: [ints]} -> df(grp, v) with mixed keys."""
    rows = [(g, _mix(v)) for g, vs in spec.items() for v in vs]
    return spark.createDataFrame(rows, "source string, v long")


def test_planted_overlap_ordering(spark):
    # a and b share 800 of 1000 values; c is disjoint
    a = list(range(1000))
    b = list(range(200, 1200))
    c = list(range(10_000, 11_000))
    df = _grouped_values(spark, {"a": a, "b": b, "c": c})
    got = {
        (r.grp_a, r.grp_b): r
        for r in S.hll_overlap(df, "source", "v", m=64).collect()
    }
    ab, ac, bc = got[("a", "b")], got[("a", "c")], got[("b", "c")]
    # shared-heavy pair estimates far more intersection than disjoint
    assert ab.est_inter > 3 * max(ac.est_inter, bc.est_inter)
    # estimates within HLL error (~1.04/sqrt(64) ~ 13%) of truth
    assert ab.est_inter == pytest.approx(800, rel=0.45)
    assert ab.est_union == pytest.approx(1200, rel=0.3)


def test_union_matches_concatenated_sketch(spark):
    """est(A∪B) from merged registers == hll_sketch over A+B rows —
    register max-merge IS the exact union."""
    a = list(range(500))
    b = list(range(300, 900))
    df = _grouped_values(spark, {"a": a, "b": b})
    pair = S.hll_overlap(df, "source", "v", m=64).collect()[0]
    both = df.withColumn("source", F.lit("all"))
    single = S.hll_sketch(both, ["source"], "v", m=64).collect()[0]
    assert pair.est_union == pytest.approx(
        single.est_distinct, abs=1e-6
    )


def test_duckdb_twin_sf0001(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", F.explode(F.split("text", " ")).alias("w"))
        .select("source", _content_key(F.col("w")).alias("wid"))
    )
    got = (
        S.hll_overlap(df, "source", "wid")
        .orderBy("grp_a", "grp_b")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    sql = S.hll_overlap_sql(
        f"(SELECT source, {_content_key_sql('w')} AS wid FROM "
        "(SELECT source, unnest(string_split(text,' ')) AS w "
        "FROM documents))",
        "source",
        "wid",
    )
    exp = con.sql(sql + " ORDER BY grp_a, grp_b").df()
    assert len(got) == len(exp) > 0
    for c in ("grp_a", "grp_b"):
        assert list(got[c]) == list(exp[c]), c
    for c in ("est_a", "est_b", "est_union", "est_inter"):
        assert got[c].tolist() == pytest.approx(exp[c].tolist(), abs=1e-9)


def test_plan_no_cartesian(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", F.explode(F.split("text", " ")).alias("w"))
        .select("source", _content_key(F.col("w")).alias("wid"))
    )
    plan = (
        S.hll_overlap(df, "source", "wid")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the intended pair shape

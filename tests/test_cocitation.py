"""Co-citation / bibliographic coupling: literal citation-graph
goldens, hub guard, and the DuckDB twin on a synthesized edge list."""

from __future__ import annotations

import duckdb
import pytest

from pdal_spark.datapipe import graphrank as G

# src -> dst citations: 1 and 2 are co-cited by 10, 11, 12;
# 2 and 3 co-cited only by 13; 20 cites everything (hub).
EDGES = [
    (10, 1), (10, 2),
    (11, 1), (11, 2),
    (12, 1), (12, 2),
    (13, 2), (13, 3),
    (20, 1), (20, 2), (20, 3), (20, 4), (20, 5),
]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


def test_cocitation_counts(spark, edges_df):
    got = {
        (r.id_a, r.id_b): r.n_shared
        for r in G.cocitation(edges_df, min_count=1, max_degree=100)
        .collect()
    }
    assert got[(1, 2)] == 4  # 10, 11, 12, 20
    assert got[(2, 3)] == 2  # 13, 20
    assert got[(4, 5)] == 1  # hub only


def test_hub_guard_drops_megacell(spark, edges_df):
    got = {
        (r.id_a, r.id_b): r.n_shared
        for r in G.cocitation(edges_df, min_count=1, max_degree=4)
        .collect()
    }
    # src 20 (degree 5) excluded: its exclusive pairs vanish,
    # shared pairs lose one count
    assert (4, 5) not in got
    assert got[(1, 2)] == 3
    assert got[(2, 3)] == 1


def test_coupling_counts(spark, edges_df):
    got = {
        (r.id_a, r.id_b): r.n_shared
        for r in G.cocitation(
            edges_df, mode="coupling", min_count=2, max_degree=100
        ).collect()
    }
    # 10, 11, 12, 20 all cite {1, 2}: every pair among them shares 2
    for a in (10, 11, 12):
        for b in (11, 12, 20):
            if a < b:
                assert got[(a, b)] >= 2


def test_bad_mode_raises(spark, edges_df):
    with pytest.raises(ValueError):
        G.cocitation(edges_df, mode="nope")


def test_duckdb_twin(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    from pyspark.sql import functions as F

    # different moduli on src/dst so per-src neighborhoods vary
    i = F.col("doc_id")
    edges = df.select((i % 53).alias("src"), ((i * 7 + 1) % 89).alias("dst"))
    edges = edges.unionByName(
        df.select(((i * 3) % 53).alias("src"), ((i * 13 + 5) % 89).alias("dst"))
    )
    got = (
        G.cocitation(edges, min_count=3, max_degree=50)
        .orderBy("id_a", "id_b")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    edges_sql = (
        "SELECT doc_id % 53 AS src, (doc_id * 7 + 1) % 89 AS dst "
        "FROM documents UNION ALL "
        "SELECT (doc_id * 3) % 53, (doc_id * 13 + 5) % 89 FROM documents"
    )
    exp = con.sql(
        G.cocitation_sql(edges_sql, min_count=3, max_degree=50)
        + " ORDER BY id_a, id_b"
    ).df()
    assert len(got) == len(exp) > 0
    for c in ("id_a", "id_b", "n_shared"):
        assert list(got[c]) == list(exp[c]), c


def _py_adamic_adar(edges, max_degree=1000):
    import math
    from collections import defaultdict

    und = set()
    for s, d in edges:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    nbrs = defaultdict(set)
    for s, d in und:
        nbrs[s].add(d)
    out = defaultdict(lambda: [0, 0])
    for z in nbrs:
        deg = len(nbrs[z])
        if deg <= 1 or deg > max_degree:
            continue
        w = int(math.floor(1_000_000.0 / math.log(deg) + 0.5))
        members = sorted(nbrs[z])
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                out[(a, b)][0] += 1
                out[(a, b)][1] += w
    return {
        k: (n, mu, round(mu / 1_000_000.0, 6))
        for k, (n, mu) in out.items()
    }


def test_adamic_adar_reference(spark, edges_df):
    got = {
        (r.id_a, r.id_b): (r.n_shared, r.aa_mu, r.aa_score)
        for r in G.adamic_adar(edges_df, max_degree=100).collect()
    }
    exp = _py_adamic_adar(EDGES, max_degree=100)
    assert got == exp
    # rare shared neighbors outweigh the hub: (1,2) share 10,11,12,20
    # while (4,5) share only hub 20 -> (1,2) scores higher
    assert got[(1, 2)][2] > got[(4, 5)][2]


def test_adamic_adar_twin(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    from pyspark.sql import functions as F

    i = F.col("doc_id")
    edges = df.select((i % 53).alias("src"), ((i * 7 + 1) % 89).alias("dst"))
    got = (
        G.adamic_adar(edges, max_degree=60)
        .orderBy("id_a", "id_b")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    exp = con.sql(
        G.adamic_adar_sql(
            "SELECT doc_id % 53 AS src, (doc_id * 7 + 1) % 89 AS dst"
            " FROM documents",
            max_degree=60,
        )
        + " ORDER BY id_a, id_b"
    ).df()
    assert len(got) == len(exp) > 0
    for c in ("id_a", "id_b", "n_shared", "aa_mu"):
        assert list(got[c]) == list(exp[c]), c
    assert got["aa_score"].tolist() == pytest.approx(
        exp["aa_score"].tolist(), abs=1e-9
    )

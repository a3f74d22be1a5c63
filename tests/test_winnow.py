"""Winnowing fingerprints (Schleimer et al. 2003): pure-python
reference oracle, the paper's substring-match guarantee, boundary
semantics, pair generation, and the DuckDB twin at sf0.001."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from pdal_spark.datapipe import winnow as W

K, WIN = 8, 4


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)


def _py_winnow(text: str, k: int = K, w: int = WIN) -> set[tuple[int, int]]:
    """Reference winnowing: rightmost window minimum (1-based pos)."""
    hs = [_h(text[i : i + k]) for i in range(len(text) - k + 1)]
    out = set()
    for j in range(len(hs) - w + 1):
        win = hs[j : j + w]
        mn = min(win)
        # rightmost occurrence of the minimum
        off = max(t for t in range(w) if win[t] == mn)
        out.add((j + off + 1, mn))
    return out


CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a completely different sentence about spark engines"),
    # doc 2 shares a long substring with doc 0 (the guarantee case)
    (2, "quick brown fox jumps over the moon tonight"),
    (3, "short"),  # < k: no grams at all
    (4, "ninechars"),  # 9 chars: 2 grams < w windows -> no fingerprint
]


@pytest.fixture(scope="module")
def literal_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_literal_matches_python_reference(spark, literal_df):
    got = {
        d: set()
        for d in (0, 1, 2)
    }
    for r in W.winnow_fingerprints(literal_df, k=K, w=WIN).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for doc_id, text in CORPUS:
        exp = _py_winnow(text) if len(text) >= K + WIN - 1 else set()
        assert got.get(doc_id, set()) == exp, doc_id


def test_short_docs_produce_nothing(spark, literal_df):
    rows = W.winnow_fingerprints(literal_df, k=K, w=WIN).filter(
        "doc_id >= 3"
    )
    assert rows.count() == 0


def test_substring_guarantee(spark, literal_df):
    """Docs 0 and 2 share 'quick brown fox jumps over the' (30 chars
    >= w + k - 1 = 11) -> at least one shared fingerprint VALUE."""
    fp = W.winnow_fingerprints(literal_df, k=K, w=WIN)
    a = {r.fp for r in fp.filter("doc_id = 0").collect()}
    b = {r.fp for r in fp.filter("doc_id = 2").collect()}
    c = {r.fp for r in fp.filter("doc_id = 1").collect()}
    assert a & b, "guaranteed shared fingerprint missing"
    assert not (a & c) or len(a & c) < len(a & b)


def test_density_bound(spark, sf_dir):
    """Winnowing density is 2/(w+1) in expectation; allow wide slack."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    n_fp = W.winnow_fingerprints(df, k=K, w=WIN).count()
    n_grams = df.selectExpr(f"sum(length(text) - {K - 1}) v").first().v
    density = n_fp / n_grams
    assert 0.5 * 2 / (WIN + 1) < density <= 1.0


def test_pairs_rank_planted_clone(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (0, base),
        (1, base + " with a tiny suffix change"),
        (2, "entirely unrelated content about query optimizers in spark"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b): r.n_shared
        for r in W.winnow_pairs(df, min_shared=1, max_df=50).collect()
    }
    assert (0, 1) in pairs
    assert pairs[(0, 1)] == max(pairs.values())


def test_duckdb_twin_sf0001(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = (
        W.winnow_fingerprints(df, k=K, w=WIN)
        .orderBy("doc_id", "pos")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    exp = con.sql(
        W.winnow_fingerprints_sql(k=K, w=WIN) + " ORDER BY doc_id, pos"
    ).df()
    assert len(got) == len(exp) > 0
    for c in ("doc_id", "pos", "fp"):
        assert list(got[c]) == list(exp[c]), c


def test_pairs_twin_sf0001(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = (
        W.winnow_pairs(df, min_shared=8, max_df=20)
        .orderBy("id_a", "id_b")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    exp = con.sql(
        W.winnow_pairs_sql(min_shared=8, max_df=20) + " ORDER BY id_a, id_b"
    ).df()
    assert len(got) == len(exp)
    for c in ("id_a", "id_b", "n_shared"):
        assert list(got[c]) == list(exp[c]), c


def test_plan_shape(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        W.winnow_pairs(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_mirror_sources_planted(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun"
    )
    docs = []
    i = 0
    for s in ("mirror-a", "mirror-b"):  # same content, two hosts
        for j in range(3):
            docs.append((i, base + f" page {j}", s)); i += 1
    for j in range(3):  # unrelated host
        docs.append(
            (i, f"completely different article number {j} about query "
                "planners and shuffle exchanges in distributed engines",
             "indie")
        )
        i += 1
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = {
        (r.src_a, r.src_b): r.n_shared_fp
        for r in W.mirror_sources(
            df, min_shared=3, max_df=50
        ).collect()
    }
    assert ("mirror-a", "mirror-b") in got
    assert all("indie" not in pair for pair in got)


def test_mirror_sources_twin_sf0001(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = (
        W.mirror_sources(df, min_shared=5, max_df=10)
        .orderBy("src_a", "src_b")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    exp = con.sql(
        W.mirror_sources_sql(min_shared=5, max_df=10)
        + " ORDER BY src_a, src_b"
    ).df()
    assert len(got) == len(exp) > 0
    for c in ("src_a", "src_b", "n_shared_fp"):
        assert list(got[c]) == list(exp[c]), c


def test_xx_hash_mode_properties(spark, sf_dir):
    """The xxhash64 scale path: same structural guarantees as md5 mode
    (density band, substring sharing, determinism), different hash
    family — selected positions/values legitimately differ."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    fp = W.winnow_fingerprints(df, k=K, w=WIN, hash_mode="xx")
    n_fp = fp.count()
    n_grams = df.selectExpr(f"sum(length(text) - {K - 1}) v").first().v
    assert 0.5 * 2 / (WIN + 1) < n_fp / n_grams <= 1.0
    # deterministic across repartitioning
    a = sorted(map(tuple, fp.collect()))
    b = sorted(
        map(
            tuple,
            W.winnow_fingerprints(
                df.repartition(7), k=K, w=WIN, hash_mode="xx"
            ).collect(),
        )
    )
    assert a == b
    # non-negative 60-bit keys
    assert fp.selectExpr("min(fp) v").first().v >= 0


def test_xx_mode_substring_guarantee(spark):
    docs = [
        (0, "the quick brown fox jumps over the lazy dog tonight ok"),
        (1, "quick brown fox jumps over the lazy dog tonight it is"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fp = W.winnow_fingerprints(df, k=K, w=WIN, hash_mode="xx")
    a = {r.fp for r in fp.filter("doc_id = 0").collect()}
    b = {r.fp for r in fp.filter("doc_id = 1").collect()}
    assert a & b


@pytest.mark.parametrize("w", [1, 2, 4, 6])
def test_runs_impl_equals_classic(spark, sf_dir, w):
    """The run-length characterization selects EXACTLY the classic
    per-window rightmost-min set — across window sizes, on real text
    (ties, edge windows, short docs all present in the corpus)."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    a = sorted(
        map(tuple, W.winnow_fingerprints(df, k=5, w=w).collect())
    )
    b = sorted(
        map(
            tuple,
            W.winnow_fingerprints(df, k=5, w=w, impl="runs").collect(),
        )
    )
    assert a == b and len(a) > 0


def test_runs_impl_equals_classic_adversarial(spark):
    """Tie-heavy and monotonic inputs — the cases where a wrong tie or
    boundary rule would diverge."""
    docs = [
        (0, "aaaaaaaaaaaaaaaa"),              # all grams identical
        (1, "abababababababab"),              # period-2 ties
        (2, "abcdefghijklmnop"),              # distinct, increasing-ish
        (3, "ponmlkjihgfedcba"),              # reversed
        (4, "aabbaabbccaabb"),                # mixed runs
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for w in (2, 3, 4):
        a = sorted(
            map(tuple, W.winnow_fingerprints(df, k=3, w=w).collect())
        )
        b = sorted(
            map(
                tuple,
                W.winnow_fingerprints(
                    df, k=3, w=w, impl="runs"
                ).collect(),
            )
        )
        assert a == b, w

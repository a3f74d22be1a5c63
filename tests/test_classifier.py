"""Hashed linear quality classifier — literal algebra + path parity."""

from __future__ import annotations

import duckdb
import pandas as pd

from pdal_spark.datapipe import classifier as clf
from pdal_spark.datapipe.sketch import P31, _hash_params


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def _py_score(text, buckets=4096, seed=11, bigrams=True):
    """Independent pure-python reference of the closed-form path."""
    import hashlib

    a, c = _hash_params(seed)
    span = 2 * clf.WEIGHT_SPAN + 1
    toks = [w for w in text.split(" ") if w != ""]
    feats = list(toks)
    if bigrams and len(toks) >= 2:
        feats += [f"{x} {y}" for x, y in zip(toks, toks[1:])]
    score = 0
    for f in feats:
        key = int(hashlib.md5(f.encode()).hexdigest()[:15], 16)
        b = key % buckets
        score += (b * a + c) % P31 % span - clf.WEIGHT_SPAN
    return len(feats), score


def test_literal_scores_match_python_reference(spark):
    texts = ["alpha beta gamma", "one", "", "x y x y", "solo word pair"]
    out = {
        r.id: r for r in clf.hashed_linear_score(_docs(spark, texts)).collect()
    }
    for i, t in enumerate(texts):
        n, s = _py_score(t)
        assert (out[i].n_features, out[i].score_micro) == (n, s), t
    # empty doc: zero features, score 0, keep at threshold 0
    assert out[2].n_features == 0 and out[2].score_micro == 0
    assert out[2].keep


def test_bag_semantics_repeats_count(spark):
    """'x y x y' has 4 unigrams + 3 bigrams — repeats are NOT deduped
    (fastText bag): 'x y' contributes twice."""
    out = clf.hashed_linear_score(_docs(spark, ["x y x y"])).collect()[0]
    assert out.n_features == 7
    assert out.score_micro == _py_score("x y x y")[1]
    # deduped scoring would differ: 2 unigrams + 2 distinct bigrams
    n_dedup, _ = _py_score("x y")
    assert out.n_features != n_dedup


def test_threshold_cross_multiplication(spark):
    """keep <=> score_micro >= t * n_features, negative thresholds
    included (integer compare, no division)."""
    df = _docs(spark, ["alpha beta gamma delta"])
    n, s = _py_score("alpha beta gamma delta")
    t_keep = s // n  # floor: t*n <= s -> keep
    got = clf.hashed_linear_score(df, threshold_micro=t_keep).collect()[0]
    assert got.keep
    got = clf.hashed_linear_score(df, threshold_micro=t_keep + 1).collect()[0]
    assert bool(got.keep) == (s >= (t_keep + 1) * n)


def test_weight_table_path_equals_closed_form(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = (
        clf.hashed_linear_score(docs, threshold_micro=25)
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    b = (
        clf.hashed_linear_score(
            docs, threshold_micro=25, weights_df=clf.weight_table(spark)
        )
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_weight_table_join_is_broadcast(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = clf.hashed_linear_score(
        docs, weights_df=clf.weight_table(spark)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_sql_twin(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = (
        clf.hashed_linear_score(docs, threshold_micro=25)
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    ref = (
        con.sql(clf.hashed_linear_score_sql(threshold_micro=25))
        .df().sort_values("id").reset_index(drop=True)
    )
    for c in ["n_features", "score_micro", "keep"]:
        assert (out[c].values == ref[c].values).all(), c
    # the gate actually discriminates at this threshold
    assert 0.05 < out.keep.mean() < 0.95


def test_pr_curve_literal(spark):
    """Hand-computed sweep: scores 30,20,20,10 with labels 1,0,1,1.
    Thresholds: 30 -> (1 pred, 1 tp), 20 -> (3, 2), 10 -> (4, 3)."""
    df = spark.createDataFrame(
        [(1, 30, 1), (2, 20, 0), (3, 20, 1), (4, 10, 1)],
        "id long, score_micro long, label int",
    )
    got = {
        r.threshold_micro: (r.n_pred, r.tp, r.prec, r.recall)
        for r in clf.pr_curve(df).collect()
    }
    assert got == {
        30: (1, 1, 1.0, round(1 / 3, 6)),
        20: (3, 2, round(2 / 3, 6), round(2 / 3, 6)),
        10: (4, 3, 0.75, 1.0),
    }


def test_pr_curve_sql_twin(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = clf.hashed_linear_score(docs).select("id", "score_micro")
    labels = docs.selectExpr(
        "doc_id AS id", "CAST(lang = 'en' AS INT) AS label"
    )
    out = (
        clf.pr_curve(scored.join(labels, "id"))
        .toPandas().sort_values("threshold_micro").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    ref = con.sql(clf.pr_curve_sql(
        "SELECT s.id, s.score_micro, "
        "CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS label "
        f"FROM ({clf.hashed_linear_score_sql()}) s "
        "JOIN documents d ON d.doc_id = s.id"
    )).df().sort_values("threshold_micro").reset_index(drop=True)
    import pandas as _pd

    _pd.testing.assert_frame_equal(
        out[sorted(out.columns)], ref[sorted(ref.columns)],
        check_dtype=False, check_exact=True,
    )
    # recall is monotone non-increasing in the threshold
    assert (out.recall.diff().dropna() <= 0).all()

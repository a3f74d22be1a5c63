"""Stupid-backoff trigram LM — pure-python reference oracle, literal
backoff semantics, partition invariance, and the DuckDB twin."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pandas as pd
import pytest

from pdal_spark.datapipe import wordlm

ALPHA = 0.4


def _ref_scores(rows, train_mod=2, train_rem=0):
    """Independent reference: plain dict counts + the backoff chain."""
    uni, bi, tri = Counter(), Counter(), Counter()
    n_train = 0
    for doc_id, text in rows:
        if doc_id % train_mod != train_rem:
            continue
        ws = text.split(" ")
        n_train += len(ws)
        for i, w in enumerate(ws):
            uni[w] += 1
            if i >= 1:
                bi[(ws[i - 1], w)] += 1
            if i >= 2:
                tri[(ws[i - 2], ws[i - 1], w)] += 1
    out = {}
    for doc_id, text in rows:
        ws = text.split(" ")
        lps, oov, bo1, bo2 = [], 0, 0, 0
        for i, w in enumerate(ws):
            lp_u = math.log2(max(uni.get(w, 0), 1)) - math.log2(n_train)
            if w not in uni:
                oov += 1
            if i == 0:
                lp = lp_u
            elif i == 1:
                if (ws[0], w) in bi:
                    lp = math.log2(bi[(ws[0], w)]) - math.log2(uni[ws[0]])
                else:
                    lp = math.log2(ALPHA) + lp_u
                    bo1 += 1
            else:
                t = (ws[i - 2], ws[i - 1], w)
                b = (ws[i - 1], w)
                if t in tri:
                    lp = math.log2(tri[t]) - math.log2(
                        bi[(ws[i - 2], ws[i - 1])]
                    )
                elif b in bi:
                    lp = (
                        math.log2(ALPHA)
                        + math.log2(bi[b])
                        - math.log2(uni[ws[i - 1]])
                    )
                    bo1 += 1
                else:
                    lp = 2 * math.log2(ALPHA) + lp_u
                    bo2 += 1
            lps.append(lp)
        out[doc_id] = (
            round(-sum(lps) / len(lps), 6),
            len(lps),
            oov,
            bo1,
            bo2,
        )
    return out


ROWS = [
    (0, "the cat sat on the mat"),
    (2, "the cat ran on the mat"),
    (4, "a dog sat on a log"),
    # score-only docs: seen trigrams, one-level and two-level backoff,
    # and a fully OOV token
    (1, "the cat sat on the mat"),
    (3, "the dog sat on the log"),
    (5, "zebra quark sat"),
]


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )


def test_matches_pure_python_reference(spark):
    ref = _ref_scores(ROWS)
    got = {
        r.doc_id: (
            r.word_lm_logloss,
            r.n_tokens,
            r.n_oov,
            r.n_backoff1,
            r.n_backoff2,
        )
        for r in wordlm.word_lm_logloss(_df(spark, ROWS)).collect()
    }
    assert set(got) == set(ref)
    for doc_id, exp in ref.items():
        assert got[doc_id][1:] == exp[1:], f"doc {doc_id} counters"
        assert got[doc_id][0] == pytest.approx(exp[0], abs=1e-9), (
            f"doc {doc_id} logloss"
        )


def test_backoff_actually_fires(spark):
    """Train docs replay their own trigrams (zero backoff); held-out
    docs exercise every level, incl. the 1/N OOV floor."""
    got = {
        r.doc_id: r
        for r in wordlm.word_lm_logloss(_df(spark, ROWS)).collect()
    }
    # train docs: every trigram is in the model
    assert got[0].n_backoff1 == 0 and got[0].n_backoff2 == 0
    assert got[0].n_oov == 0
    # doc 3 shares bigrams but not all trigrams -> some backoff
    assert got[3].n_backoff1 + got[3].n_backoff2 > 0
    # doc 5: 'zebra'/'quark' unseen -> OOV floor + two-level backoff
    assert got[5].n_oov == 2
    assert got[5].n_backoff2 >= 1
    # an identical held-out doc scores exactly like its train twin
    assert got[1].word_lm_logloss == got[0].word_lm_logloss


def test_oov_floor_is_one_over_n(spark):
    """A doc that is a single unseen word scores exactly log2(N)."""
    rows = [(0, "x y"), (2, "x y"), (1, "qqq")]
    got = {
        r.doc_id: r
        for r in wordlm.word_lm_logloss(_df(spark, rows)).collect()
    }
    assert got[1].word_lm_logloss == pytest.approx(math.log2(4), abs=1e-9)
    assert got[1].n_oov == 1


def test_partition_invariance(spark):
    base = {
        r.doc_id: r.word_lm_logloss
        for r in wordlm.word_lm_logloss(_df(spark, ROWS)).collect()
    }
    re7 = {
        r.doc_id: r.word_lm_logloss
        for r in wordlm.word_lm_logloss(
            _df(spark, ROWS).repartition(7)
        ).collect()
    }
    assert base == re7


def test_duckdb_twin(spark, sf_dir):
    spark_df = (
        wordlm.word_lm_logloss(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        )
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    oracle = con.sql(
        wordlm.word_lm_logloss_sql() + " ORDER BY 1"
    ).df()
    assert list(spark_df.columns) == list(oracle.columns)
    assert len(spark_df) == len(oracle)
    for c in ("n_tokens", "n_oov", "n_backoff1", "n_backoff2"):
        assert (
            spark_df[c].to_numpy() == oracle[c].to_numpy()
        ).all(), c
    import numpy as np

    d = np.abs(
        spark_df["word_lm_logloss"].to_numpy()
        - oracle["word_lm_logloss"].to_numpy()
    )
    assert np.nanmax(d, initial=0.0) <= 1e-9

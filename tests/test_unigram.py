"""Unigram-LM tokenizer (datapipe/unigram.py): enumerate-all-
segmentations oracle for the E-step, Viterbi encoding semantics,
partition-invariant training, end-to-end shape."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from pdal_spark.datapipe import unigram as ug


def _enum_expected(word, logp, max_len):
    """Independent E-step oracle: enumerate every segmentation
    explicitly, weight by product probability."""
    def segs(s):
        if not s:
            yield []
            return
        for ln in range(1, min(max_len, len(s)) + 1):
            p = s[:ln]
            if p in logp:
                for rest in segs(s[ln:]):
                    yield [p] + rest

    total = 0.0
    counts: dict = {}
    for seg in segs(word):
        prob = math.exp(sum(logp[p] for p in seg))
        total += prob
        for p in seg:
            counts[p] = counts.get(p, 0.0) + prob
    return {p: c / total for p, c in counts.items()} if total else {}


def test_expected_counts_match_enumeration():
    logp = {p: math.log(v) for p, v in
            {"a": 0.3, "b": 0.2, "ab": 0.25, "ba": 0.15, "aba": 0.1}.items()}
    for word in ["ab", "aba", "abab", "baba", "aab"]:
        got = ug._expected_counts(word, logp, 3)
        want = _enum_expected(word, logp, 3)
        assert set(got) == set(want), word
        for p in want:
            assert abs(got[p] - want[p]) < 1e-9, (word, p)


def test_seed_vocab_contains_chars_and_frequent_substrings(spark):
    df = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab cd cd")], "doc_id long, text string"
    )
    seed = dict(ug.seed_vocab(df, seed_size=50, min_count=2))
    for ch in "abcd":
        assert ch in seed
    assert "abab" in seed and seed["abab"] == 3  # 3 occurrences of the word
    assert "cd" in seed and seed["cd"] == 3


def test_train_deterministic_and_partition_invariant(spark):
    rows = [(i, "hello world " * 3 + "held hold" ) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    v1 = ug.unigram_train(df, vocab_size=24, n_iters=2, seed_size=64)
    v2 = ug.unigram_train(
        df.repartition(7), vocab_size=24, n_iters=2, seed_size=64
    )
    assert v1 == v2  # exact equality — integer-quantized E-step
    pieces = {p for p, _ in v1}
    # multi-char pieces of the dominant words survive the shrink
    assert any(len(p) > 2 for p in pieces)


def test_encode_viterbi_semantics(spark):
    vocab = [(p, math.log(v)) for p, v in
             {"a": 0.05, "b": 0.05, "ab": 0.4, "ba": 0.3, "c": 0.2}.items()]
    df = spark.createDataFrame(
        [(1, "abab cab"), (2, "bab")], "doc_id long, text string"
    )
    out = {r.id: list(r.tokens) for r in
           ug.unigram_encode(df, vocab, max_piece_len=2).collect()}
    # "abab": ab+ab (p=.16) beats a+ba+b (.00075) etc.
    assert out[1] == ["ab", "ab", "c", "ab"]
    # "bab": b+ab (.02) vs ba+b (.015) -> b+ab
    assert out[2] == ["b", "ab"]
    # tokens always reassemble the words
    df2 = spark.createDataFrame([(3, "abc cba bac")], "doc_id long, text string")
    toks = ug.unigram_encode(df2, vocab, max_piece_len=2).collect()[0]
    assert "".join(toks.tokens) == "abccbabac"


def test_end_to_end_train_then_encode(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    vocab = ug.unigram_train(
        df.limit(100), vocab_size=200, n_iters=1, seed_size=256
    )
    assert len(vocab) >= 26  # at least the characters
    out = ug.unigram_encode(df.limit(20), vocab)
    rows = out.collect()
    assert len(rows) == 20
    assert all(r.n_tokens == len(r.tokens) > 0 for r in rows)
    # every document's words reassemble from their pieces
    texts = {r.doc_id: r.text for r in df.limit(20).collect()}
    for r in rows:
        assert "".join(r.tokens) == texts[r.id].replace(" ", "")


def test_validates_vocab_size(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        ug.unigram_train(df, vocab_size=0)

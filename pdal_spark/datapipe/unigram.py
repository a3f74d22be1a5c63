"""Distributed unigram-LM subword tokenizer (SentencePiece's unigram
model; Kudo 2018, arXiv:1804.10959) — training via EM + vocabulary
shrinking, encoding via Viterbi.

The second of the two standard LLM tokenizer families (datapipe/bpe.py
is the first). Unigram treats the vocabulary as a set of pieces with
probabilities and segments each word by the max-product (Viterbi)
path; training alternates an E-step (expected piece counts over ALL
segmentations, forward-backward per word) with an M-step (renormalize)
and prunes the vocabulary toward the target size.

Execution shape (100 TB):
  * all math runs on the DISTINCT word-frequency table (one combinable
    exchange over the corpus — identical to bpe.word_freq);
  * seed candidates = within-word substrings (bounded explode: words
    are short, pieces capped at ``max_piece_len``), one count
    aggregate, driver-side top-k (the vocabulary is dimension-sized);
  * each E-step is ONE Arrow kernel pass over distinct words with the
    piece table broadcast: per word, forward-backward over the
    match lattice -> expected counts, QUANTIZED to integer nano-units
    inside the kernel so the cross-partition aggregation is an exact
    BIGINT sum — float summation order can never change the trained
    vocabulary (the repo's standard determinism pattern);
  * the M-step + shrink sort the nlist-sized count table on the
    driver: (count desc, piece asc) — total order, no RNG.

Simplifications vs the reference implementation, documented and
deliberate: pruning keeps the top pieces by expected count (the
reference scores each piece by likelihood loss if removed); seed
candidates come from substring counts (the reference uses a suffix
array + Bayes filtering). The EM math itself — forward-backward
expectations, Viterbi encoding with leftmost-longest tie-break — is
the paper's. Iterative by nature, so the driver row is rows-only
(like BPE); the strong oracle is an independent enumerate-all-
segmentations reference in tests.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdal_spark.datapipe.bpe import word_freq
from pdal_spark.session import ensure_min_partitions

__all__ = ["seed_vocab", "unigram_train", "unigram_encode"]

NANO = 10 ** 9


def seed_vocab(
    df: DataFrame, text_col: str = "text", max_piece_len: int = 6,
    seed_size: int = 512, min_count: int = 2,
) -> list[tuple[str, int]]:
    """(piece, weighted count) seed candidates: every within-word
    substring up to ``max_piece_len``, counted across the corpus
    (weighted by word frequency); single characters always survive so
    every word stays segmentable. Driver-side result — the vocabulary
    is dimension-sized by definition."""
    wf = word_freq(df, text_col)
    w = F.col("word")
    n = F.length(w)
    # all (start, len) substrings, len <= max_piece_len
    subs = wf.select(
        F.col("n"),
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), n),
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(F.lit(max_piece_len), n - i + 1),
                        ),
                        lambda ln: F.substring(w, i, ln),
                    ),
                )
            )
        ).alias("piece"),
    )
    # top-k pushed into the engine (TakeOrderedAndProject — distributed
    # partial top-k, no global sort, no substring-vocabulary-sized
    # collect): the driver sees at most alphabet + seed_size rows, so
    # the "driver-side result is dimension-sized" claim actually holds
    # on a large corpus (the r2 shape collected EVERY substring with
    # count >= min_count before truncating).
    # persisted: the substring explode + aggregate (the dominant scan)
    # feeds TWO jobs — the single-char collect and the multi-piece
    # top-k — and must run once, not twice
    base = subs.groupBy("piece").agg(F.sum("n").alias("c")).persist()
    try:
        chars = [
            (r.piece, int(r.c))
            for r in base.filter(F.length("piece") == 1).collect()
        ]
        multi_rows = (
            base.filter((F.length("piece") > 1) & (F.col("c") >= min_count))
            .orderBy(F.col("c").desc(), F.col("piece").asc())
            .limit(max(0, seed_size))
            .collect()
        )
    finally:
        base.unpersist()
    multi = [(r.piece, int(r.c)) for r in multi_rows][
        : max(0, seed_size - len(chars))
    ]
    return sorted(chars + multi, key=lambda t: (-t[1], t[0]))


def _word_lattice(word: str, logp: dict, max_len: int):
    """Matches [(start, end, piece)] of vocab pieces inside word."""
    out = []
    n = len(word)
    for i in range(n):
        for j in range(i + 1, min(i + max_len, n) + 1):
            p = word[i:j]
            if p in logp:
                out.append((i, j, p))
    return out


def _expected_counts(word: str, logp: dict, max_len: int) -> dict:
    """Forward-backward expected piece counts over all segmentations
    of one word (log domain, positions ascending — fixed fold order)."""
    n = len(word)
    NEG = -1e30
    matches = _word_lattice(word, logp, max_len)
    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    by_end: list[list] = [[] for _ in range(n + 1)]
    for i, j, p in matches:
        by_end[j].append((i, p))
    for j in range(1, n + 1):
        tot = NEG
        for i, p in by_end[j]:
            v = alpha[i] + logp[p]
            tot = max(tot, v) + math.log1p(math.exp(-abs(tot - v))) \
                if tot > NEG / 2 else v
        alpha[j] = tot
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    by_start: list[list] = [[] for _ in range(n + 1)]
    for i, j, p in matches:
        by_start[i].append((j, p))
    for i in range(n - 1, -1, -1):
        tot = NEG
        for j, p in by_start[i]:
            v = logp[p] + beta[j]
            tot = max(tot, v) + math.log1p(math.exp(-abs(tot - v))) \
                if tot > NEG / 2 else v
        beta[i] = tot
    z = alpha[n]
    exp_counts: dict = {}
    if z <= NEG / 2:
        return exp_counts  # unsegmentable (cannot happen with chars)
    for i, j, p in matches:
        e = math.exp(alpha[i] + logp[p] + beta[j] - z)
        exp_counts[p] = exp_counts.get(p, 0.0) + e
    return exp_counts


def unigram_train(
    df: DataFrame, vocab_size: int, text_col: str = "text",
    n_iters: int = 2, max_piece_len: int = 6, seed_size: int = 512,
    shrink: float = 0.75,
) -> list[tuple[str, float]]:
    """EM-train the unigram vocabulary down to ``vocab_size``:
    alternating full-corpus E-steps (distributed, integer-quantized)
    with M-step renormalization, shrinking the piece set by ``shrink``
    per round until the target size. Returns [(piece, logp)] sorted
    (logp desc, piece asc)."""
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    import pandas as pd

    spark = df.sparkSession
    wf = ensure_min_partitions(word_freq(df, text_col)).persist()
    seed = seed_vocab(df, text_col, max_piece_len, seed_size)
    total = sum(c for _, c in seed)
    vocab = {p: math.log(c / total) for p, c in seed}
    chars = {p for p, _ in seed if len(p) == 1}

    def estep(vocab_now: dict) -> dict:
        bc = spark.sparkContext.broadcast(vocab_now)

        def kernel(batches):
            lp = bc.value
            for pdf in batches:
                agg: dict = {}
                for word, cnt in zip(pdf["word"], pdf["n"]):
                    ec = _expected_counts(str(word), lp, max_piece_len)
                    for p, e in ec.items():
                        agg[p] = agg.get(p, 0) + int(
                            round(e * int(cnt) * NANO)
                        )
                yield pd.DataFrame(
                    {"piece": list(agg), "nano": list(agg.values())}
                )

        rows = (
            wf.mapInPandas(kernel, "piece string, nano long")
            .groupBy("piece").agg(F.sum("nano").alias("nano"))
            .collect()
        )
        return {r.piece: int(r.nano) for r in rows}

    target_now = len(vocab)
    for _ in range(max(n_iters, 1)):
        counts = estep(vocab)
        # shrink toward the target (chars always kept)
        target_now = max(vocab_size, int(target_now * shrink))
        ranked = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda t: (-t[1], t[0]),
        )
        keep_multi = [p for p, c in ranked if c > 0][: max(
            0, target_now - len(chars)
        )]
        kept = {p: counts.get(p, 0) for p in chars} | {
            p: counts[p] for p in keep_multi
        }
        tot = sum(kept.values()) or 1
        vocab = {
            p: math.log((c if c > 0 else 1) / tot) for p, c in kept.items()
        }
    out = sorted(vocab.items(), key=lambda t: (-t[1], t[0]))
    wf.unpersist()
    return out


def unigram_encode(
    df: DataFrame, vocab: list[tuple[str, float]],
    text_col: str = "text", id_col: str = "doc_id",
    max_piece_len: int = 6,
) -> DataFrame:
    """Viterbi (max-product) segmentation of every document's words
    under the trained vocabulary — (id, tokens array<string>,
    n_tokens). Ties break to the LONGEST last piece (then earlier
    boundary), matching the deterministic rule the tests pin. Map-only
    Arrow kernel, vocabulary broadcast; zero shuffles."""
    import pandas as pd

    spark = df.sparkSession
    lp = dict(vocab)
    bc = spark.sparkContext.broadcast(lp)

    def viterbi(word: str) -> list[str]:
        v = bc.value
        n = len(word)
        best = [(-1e30, -1)] * (n + 1)
        best[0] = (0.0, -1)
        for j in range(1, n + 1):
            for i in range(max(0, j - max_piece_len), j):
                p = word[i:j]
                if p in v and best[i][0] > -1e29:
                    score = best[i][0] + v[p]
                    # strictly-better wins; ties keep the SMALLER i
                    # (longest last piece), which the scan order gives
                    if score > best[j][0]:
                        best[j] = (score, i)
        if best[n][1] < 0:
            return [word]  # unsegmentable fallback (no char coverage)
        toks: list[str] = []
        j = n
        while j > 0:
            i = best[j][1]
            toks.append(word[i:j])
            j = i
        return toks[::-1]

    def kernel(batches):
        for pdf in batches:
            ids, toks, nt = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in str(text).split(" ") if w]
                out: list[str] = []
                for w in words:
                    out.extend(viterbi(w))
                ids.append(did)
                toks.append(out)
                nt.append(len(out))
            yield pd.DataFrame(
                {"id": ids, "tokens": toks, "n_tokens": nt}
            )

    src = df.select(F.col(id_col), F.col(text_col))
    return ensure_min_partitions(src).mapInPandas(
        kernel, "id long, tokens array<string>, n_tokens long"
    )

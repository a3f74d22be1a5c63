"""Mergeable epsilon-approximate quantile summaries (GK-style).

The exact path (operators/quantiles.py) shuffles every row once to
rank it — the right tool per group, but for a SINGLE 10^12-row column
("p99 document length over the whole crawl") even one exchange of the
full table is waste: an epsilon-approximate answer needs only a
bounded-size summary per partition and a driver-side merge, i.e. the
aggregation pattern of a sketch (Greenwald-Khanna 2001; mergeability
per Agarwal et al., PODS 2012).

Shape: ONE map-only pass (``mapInPandas``) emits a deterministic
summary of <= 2/eps + 1 tuples per partition — every ceil(eps_half *
n_p)-th element of the partition's sorted values, with its EXACT local
rank attached. The driver concatenates the (tiny) summaries, rebuilds
global rank bounds with vectorized searchsorted passes, and answers
any number of quantile queries with the certificate that each returned
value's true ordinal run lies within eps*n of the target rank.

The core data structure is the BRACKET SUMMARY: candidate values v
with certified intervals on BOTH counts — #(elements < v) in
[lt_lo, lt_hi] and #(elements <= v) in [le_lo, le_hi]. Tracking both
lets a value carrying duplicate mass (a spike) answer every quantile
inside its ordinal run [#(<v)+1, #(<=v)]. Bracket summaries are closed
under merge (:func:`merge_brackets`) and under pruning
(:func:`prune_brackets`, which only widens the gaps between kept
picks, never the recorded brackets) — which is exactly what the
streaming fold (streaming/jobs.py stream_gk_quantiles) needs: state =
one pruned bracket summary per group, every micro-batch merged in as
an exact summary. Certificates are computed FROM the brackets, so
error can widen with fold depth but is never silently wrong.

Everything is deterministic (no sampling): reruns agree bit-for-bit
given the same partitioning; across partitionings the answer may move
WITHIN the certified eps band (tests pin both). The driver query
returns the certificate re-proved by an exact distributed recount —
no SQL engine can replay the partition layout itself.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "BracketSummary",
    "exact_summary",
    "gk_quantiles",
    "merge_brackets",
    "merge_summaries",
    "partition_summaries",
    "prune_brackets",
    "query_brackets",
]


@dataclass
class BracketSummary:
    """Candidate values + certified count brackets (see module doc)."""

    v: np.ndarray       # sorted distinct candidate values
    lt_lo: np.ndarray   # lower bound on #(< v)
    lt_hi: np.ndarray   # upper bound on #(< v)
    le_lo: np.ndarray   # lower bound on #(<= v)
    le_hi: np.ndarray   # upper bound on #(<= v)
    n: int              # total count summarized

    def width(self) -> int:
        """Worst certified slack across candidates (rank units)."""
        if self.v.size == 0:
            return 0
        return int(
            max((self.lt_hi - self.lt_lo).max(), (self.le_hi - self.le_lo).max())
        )


def exact_summary(values: np.ndarray, eps_half: float) -> BracketSummary:
    """Summary of an in-memory array: every ceil(eps_half*n)-th element
    of the sorted values (first and last always kept), brackets
    degenerate to the EXACT counts."""
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    n = v.size
    if n == 0:
        e = np.array([], dtype=np.int64)
        return BracketSummary(np.array([], dtype=np.float64),
                              e, e.copy(), e.copy(), e.copy(), 0)
    v = np.sort(v)
    step = max(1, math.ceil(eps_half * n))
    idx = np.unique(np.r_[np.arange(0, n, step), n - 1])
    picks = np.unique(v[idx])
    lt = np.searchsorted(v, picks, side="left").astype(np.int64)
    le = np.searchsorted(v, picks, side="right").astype(np.int64)
    return BracketSummary(picks, lt, lt.copy(), le, le.copy(), int(n))


def merge_brackets(summaries: Sequence[BracketSummary]) -> BracketSummary:
    """Merge bracket summaries: the union of candidates, with each
    source contributing certified bounds on both counts.

    Per source S and candidate x: a pick equal to x contributes its own
    brackets exactly; otherwise the largest pick below x lower-bounds
    both counts by its le_lo (everything <= that pick is < x), the
    smallest pick above x upper-bounds both by its lt_hi (everything
    < x resp. <= x is < that pick); no pick on a side -> 0 / n_S."""
    live = [s for s in summaries if s.v.size]
    if not live:
        return exact_summary(np.array([]), 1.0)
    allv = np.unique(np.concatenate([s.v for s in live]))
    z = np.zeros(allv.size, dtype=np.int64)
    lt_lo, lt_hi, le_lo, le_hi = z.copy(), z.copy(), z.copy(), z.copy()
    n_total = 0
    for s in summaries:
        n_total += int(s.n)
        if s.v.size == 0:
            continue
        below = np.searchsorted(s.v, allv, side="right") - 1
        above = np.searchsorted(s.v, allv, side="left")
        has_below = below >= 0
        has_above = above < s.v.size
        bi = np.clip(below, 0, None)
        ai = np.clip(above, None, s.v.size - 1)
        eq = has_below & (s.v[bi] == allv)

        lower = np.where(has_below, s.le_lo[bi], 0)  # via pick strictly below
        upper = np.where(has_above, s.lt_hi[ai], int(s.n))  # via pick above

        p_lt_lo = np.where(eq, s.lt_lo[bi], lower)
        p_lt_hi = np.where(eq, s.lt_hi[bi], upper)
        p_le_lo = np.where(eq, s.le_lo[bi], lower)
        p_le_hi = np.where(eq, s.le_hi[bi], upper)
        lt_lo += p_lt_lo
        lt_hi += np.maximum(p_lt_hi, p_lt_lo)
        le_lo += p_le_lo
        le_hi += np.maximum(p_le_hi, p_le_lo)
    return BracketSummary(allv, lt_lo, lt_hi, le_lo, le_hi, n_total)


def prune_brackets(s: BracketSummary, cap: int) -> BracketSummary:
    """Keep <= cap candidates (every k-th plus both ends). Recorded
    brackets of kept picks are untouched — still certified; only the
    GAPS between picks widen, which the query accounts for by always
    answering from a recorded candidate."""
    if s.v.size <= cap:
        return s
    step = math.ceil(s.v.size / max(cap - 1, 1))
    idx = np.unique(np.r_[np.arange(0, s.v.size, step), s.v.size - 1])
    return BracketSummary(
        s.v[idx], s.lt_lo[idx], s.lt_hi[idx],
        s.le_lo[idx], s.le_hi[idx], s.n,
    )


def query_brackets(
    s: BracketSummary, qs: Sequence[float], eps: float
) -> list[dict]:
    """Answer quantiles from a bracket summary, with certificates."""
    out = []
    for q in qs:
        target = math.ceil(q * s.n)
        # certified distance from target to x's true ordinal run
        # [#(<x)+1, #(<=x)] using the pessimistic bracket ends
        dist = np.maximum(
            0, np.maximum(s.lt_hi + 1 - target, target - s.le_lo)
        )
        i = int(np.argmin(dist))
        out.append(
            {
                "q": float(q),
                "value": float(s.v[i]),
                "rank_lo": int(s.lt_lo[i]),
                "rank_hi": int(s.le_hi[i]),
                "n": int(s.n),
                "eps_bound_ok": bool(dist[i] <= eps * s.n),
            }
        )
    return out


# ---------------------------------------------------------------------------
# batch path: one map-only pass + driver merge
# ---------------------------------------------------------------------------


def partition_summaries(
    df: DataFrame, value_col: str, eps_half: float
) -> list[BracketSummary]:
    """One map-only pass -> a small exact BracketSummary per partition.

    Summary size <= 2/eps_half + 1 regardless of partition rows — the
    executor->driver traffic is O(P / eps), never O(n)."""
    from pyspark import TaskContext
    from pyspark.sql import functions as F

    def summarize(batches: Iterable[pd.DataFrame]):
        pid = TaskContext.get().partitionId()
        vals = [b[value_col].to_numpy() for b in batches]
        v = np.concatenate(vals) if vals else np.array([], dtype=np.float64)
        s = exact_summary(v, eps_half)
        if s.n == 0:
            return
        yield pd.DataFrame(
            {
                "pid": np.full(s.v.size, pid, dtype=np.int64),
                "v": s.v,
                "rlo": s.lt_lo,
                "rhi": s.le_lo,
                "np_": np.full(s.v.size, s.n, dtype=np.int64),
            }
        )

    rows = (
        df.select(F.col(value_col).cast("double").alias(value_col))
        .mapInPandas(
            summarize, "pid long, v double, rlo long, rhi long, np_ long"
        )
        .collect()
    )
    by_pid: dict[int, list] = {}
    for r in rows:
        by_pid.setdefault(r.pid, []).append(r)
    out = []
    for pid in sorted(by_pid):
        grp = sorted(by_pid[pid], key=lambda r: r.rlo)
        v = np.array([r.v for r in grp])
        lt = np.array([r.rlo for r in grp], dtype=np.int64)
        le = np.array([r.rhi for r in grp], dtype=np.int64)
        out.append(
            BracketSummary(v, lt, lt.copy(), le, le.copy(), int(grp[0].np_))
        )
    return out


def merge_summaries(
    summaries: Sequence[BracketSummary],
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Tuple view of :func:`merge_brackets` (tests use the raw arrays)."""
    m = merge_brackets(summaries)
    return m.v, m.lt_lo, m.lt_hi, m.le_lo, m.le_hi, m.n


def gk_quantiles(
    df: DataFrame,
    value_col: str,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    eps: float = 0.01,
) -> list[dict]:
    """-> [{q, value, rank_lo, rank_hi, n, eps_bound_ok}] with the
    certificate that the value's true ordinal run is within eps*n of
    the target rank ceil(q*n)."""
    if any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError("qs must be in (0, 1]")
    merged = merge_brackets(partition_summaries(df, value_col, eps / 2.0))
    return query_brackets(merged, qs, eps)

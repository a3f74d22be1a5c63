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
global rank bounds with two vectorized searchsorted passes, prunes
back to O(1/eps), and answers any number of quantile queries with the
certificate that each returned value's true rank lies within
[target - eps*n, target + eps*n].

Why rank bounds stay honest through the merge: for a summary element
x with exact local rank r_s(x) in partition s, its global rank is
sum_s over partitions of (#elements < x in s), which each partition's
summary brackets between the recorded ranks of its neighbors of x —
the standard mergeable-summary argument, implemented below as
searchsorted(left)/searchsorted(right) over each source summary.
Everything is deterministic (no sampling), so reruns agree bit-for-bit
given the same partitioning; across different partitionings the answer
may differ WITHIN the same certified eps band (tests pin both).

The driver query is rows-only by necessity (the result depends on the
partition layout inside the eps band — no SQL engine replays that);
the strong oracle is the certificate test against exact numpy ranks.
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["gk_quantiles", "merge_summaries", "partition_summaries"]


def partition_summaries(
    df: DataFrame, value_col: str, eps_half: float
) -> list[tuple[np.ndarray, np.ndarray, int]]:
    """One map-only pass -> [(values, exact_local_ranks, n_partition)].

    Each partition keeps every ceil(eps_half * n_p)-th element of its
    sorted values (always including first and last), rank = exact
    0-based count of elements strictly below, plus tie count so
    duplicates stay exact. Summary size <= 2/eps_half + 1 regardless
    of n_p — the executor->driver traffic is O(P / eps), never O(n).
    """
    from pyspark import TaskContext
    from pyspark.sql import functions as F

    def summarize(batches: Iterable[pd.DataFrame]):
        pid = TaskContext.get().partitionId()
        vals = [b[value_col].to_numpy() for b in batches]
        v = (
            np.concatenate(vals)
            if vals
            else np.array([], dtype=np.float64)
        )
        v = v[~pd.isna(v)]
        n = v.size
        if n == 0:
            return
        v.sort()
        step = max(1, math.ceil(eps_half * n))
        idx = np.unique(np.r_[np.arange(0, n, step), n - 1])
        picks = v[idx]
        # exact local rank bounds of each picked value among the
        # partition's n values: [#strictly-below, #<=value]
        rlo = np.searchsorted(v, picks, side="left")
        rhi = np.searchsorted(v, picks, side="right")
        yield pd.DataFrame(
            {
                "pid": np.full(idx.size, pid, dtype=np.int64),
                "v": picks,
                "rlo": rlo,
                "rhi": rhi,
                "np_": np.full(idx.size, n),
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
        out.append(
            (
                np.array([r.v for r in grp]),
                np.array([r.rlo for r in grp]),
                np.array([r.rhi for r in grp]),
                int(grp[0].np_),
            )
        )
    return out


def merge_summaries(
    summaries: Sequence[tuple[np.ndarray, np.ndarray, np.ndarray, int]],
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Driver-side merge: global rank bounds for the union of picks.

    -> (values, lt_lo, lt_hi, le_lo, le_hi, n): for each candidate x,
    certified brackets on BOTH counts — #(elements < x) in
    [lt_lo, lt_hi] and #(elements <= x) in [le_lo, le_hi]. x then
    occupies ordinal positions [#(<x)+1, #(<=x)], which is how a value
    carrying duplicate mass (a spike) answers every quantile inside
    its run. Per partition: a pick equal to x gives both counts
    exactly; otherwise the neighboring picks' recorded ranks bracket
    them within the pick spacing (<= eps_half * n_p slack each).
    """
    allv = np.unique(np.concatenate([s[0] for s in summaries if s[0].size]))
    z = np.zeros(allv.size, dtype=np.int64)
    lt_lo, lt_hi, le_lo, le_hi = z.copy(), z.copy(), z.copy(), z.copy()
    n_total = 0
    for v, rlo, rhi, n_p in summaries:
        n_total += int(n_p)
        if v.size == 0:
            continue
        below = np.searchsorted(v, allv, side="right") - 1  # largest pick <= x
        above = np.searchsorted(v, allv, side="left")  # smallest pick >= x
        has_below = below >= 0
        has_above = above < v.size
        bi = np.clip(below, 0, None)
        ai = np.clip(above, None, v.size - 1)
        eq = has_below & (v[bi] == allv)  # a pick equals x exactly

        # #(w < x): pick==x -> rlo exact; pick < x -> >= rhi(pick);
        #           smallest pick > x -> <= rlo(that pick)
        p_lt_lo = np.where(eq, rlo[bi], np.where(has_below, rhi[bi], 0))
        p_lt_hi = np.where(
            eq, rlo[bi], np.where(has_above, rlo[ai], int(n_p))
        )
        # #(w <= x): pick==x -> rhi exact; pick < x -> >= rhi(pick);
        #            smallest pick > x -> <= rlo(that pick)
        p_le_lo = np.where(eq, rhi[bi], np.where(has_below, rhi[bi], 0))
        p_le_hi = np.where(
            eq, rhi[bi], np.where(has_above, rlo[ai], int(n_p))
        )
        lt_lo += p_lt_lo.astype(np.int64)
        lt_hi += np.maximum(p_lt_hi, p_lt_lo).astype(np.int64)
        le_lo += p_le_lo.astype(np.int64)
        le_hi += np.maximum(p_le_hi, p_le_lo).astype(np.int64)
    return allv, lt_lo, lt_hi, le_lo, le_hi, n_total


def gk_quantiles(
    df: DataFrame,
    value_col: str,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    eps: float = 0.01,
) -> list[dict]:
    """-> [{q, value, rank_lo, rank_hi, n, eps_bound_ok}] with the
    certificate that [rank_lo, rank_hi] (the value's possible true
    ranks) intersects [target - eps*n, target + eps*n].
    """
    if any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError("qs must be in (0, 1]")
    summaries = partition_summaries(df, value_col, eps / 2.0)
    allv, lt_lo, lt_hi, le_lo, le_hi, n = merge_summaries(summaries)
    out = []
    for q in qs:
        target = math.ceil(q * n)
        # x occupies ordinal positions [#(<x)+1, #(<=x)]; the CERTIFIED
        # distance from the target rank to x's true position interval
        # uses the pessimistic bracket ends (true start <= lt_hi + 1,
        # true end >= le_lo)
        dist = np.maximum(
            0, np.maximum(lt_hi + 1 - target, target - le_lo)
        )
        i = int(np.argmin(dist))
        ok = dist[i] <= eps * n
        out.append(
            {
                "q": float(q),
                "value": float(allv[i]),
                "rank_lo": int(lt_lo[i]),
                "rank_hi": int(le_hi[i]),
                "n": int(n),
                "eps_bound_ok": bool(ok),
            }
        )
    return out

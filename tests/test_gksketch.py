"""Mergeable eps-approximate quantile summaries: certified rank error."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdal_spark.operators.gksketch import (
    gk_quantiles,
    merge_summaries,
    partition_summaries,
)


def _df(spark, values, n_parts=8):
    return spark.createDataFrame(
        [(float(v),) for v in values], "value double"
    ).repartition(n_parts)


def _exact_rank_band(values, x):
    """(strictly-below count, <=-count) of x in values."""
    a = np.sort(np.asarray(values, dtype=float))
    return (
        int(np.searchsorted(a, x, side="left")),
        int(np.searchsorted(a, x, side="right")),
    )


def test_certified_rank_error_uniformish(spark):
    # deterministic spread-out values, no RNG
    values = [((i * 48271 + 11) % 100003) / 7.0 for i in range(20000)]
    eps = 0.01
    qs = (0.1, 0.5, 0.9, 0.99)
    out = gk_quantiles(_df(spark, values), "value", qs=qs, eps=eps)
    n = len(values)
    for row in out:
        assert row["n"] == n
        assert row["eps_bound_ok"]
        lo, hi = _exact_rank_band(values, row["value"])
        target = math.ceil(row["q"] * n)
        # the value's true ordinal run [lo+1, hi] is within eps*n of target
        assert lo + 1 - eps * n <= target <= hi + eps * n
        # and the reported brackets really contain the true counts
        assert row["rank_lo"] <= lo and hi <= row["rank_hi"]


def test_heavy_duplicates(spark):
    # 90% of mass on one value — quantiles must land exactly on it
    values = [5.0] * 9000 + [float(i) for i in range(1000)]
    out = gk_quantiles(_df(spark, values), "value", qs=(0.5, 0.9), eps=0.01)
    for row in out:
        assert row["eps_bound_ok"]
        assert row["value"] == 5.0


def test_partition_invariance_within_band(spark):
    values = [((i * 69621 + 7) % 65537) / 3.0 for i in range(8000)]
    eps = 0.02
    n = len(values)
    for parts in (2, 16):
        out = gk_quantiles(_df(spark, values, parts), "value",
                           qs=(0.5,), eps=eps)
        lo, hi = _exact_rank_band(values, out[0]["value"])
        target = math.ceil(0.5 * n)
        assert lo - (eps * n + parts) <= target <= hi + (eps * n + parts)


def test_summary_size_bounded(spark):
    values = [float(i) for i in range(50000)]
    eps_half = 0.005
    summaries = partition_summaries(_df(spark, values, 4), "value", eps_half)
    assert len(summaries) == 4
    for s in summaries:
        assert s.v.size <= math.ceil(2.0 / eps_half) + 2
        # exact local ranks: first pick is the partition minimum
        assert s.lt_lo[0] == 0 and s.le_lo[-1] == s.n
        assert (np.diff(s.lt_lo) > 0).all()
        assert s.width() == 0  # partition summaries are exact-bracket


def test_merge_rank_bounds_bracket_truth(spark):
    values = [((i * 48271) % 9973) / 11.0 for i in range(6000)]
    summaries = partition_summaries(_df(spark, values, 8), "value", 0.01)
    allv, lt_lo, lt_hi, le_lo, le_hi, n = merge_summaries(summaries)
    assert n == len(values)
    a = np.sort(np.asarray(values))
    true_lt = np.searchsorted(a, allv, side="left")
    true_le = np.searchsorted(a, allv, side="right")
    assert (lt_lo <= true_lt).all() and (true_lt <= lt_hi).all()
    assert (le_lo <= true_le).all() and (true_le <= le_hi).all()
    # bracket width bounded by the per-partition slack
    assert (lt_hi - lt_lo).max() <= 0.01 * n + len(summaries)


def test_rejects_bad_q(spark):
    with pytest.raises(ValueError):
        gk_quantiles(_df(spark, [1.0, 2.0]), "value", qs=(0.0,))

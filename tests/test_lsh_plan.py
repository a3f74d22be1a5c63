"""LSH S-curve planner: optimality and operating-curve honesty."""

from __future__ import annotations

import pytest

from pdal_spark.datapipe.dedup import lsh_plan


def _p(s, b, r):
    return 1.0 - (1.0 - s**r) ** b


def test_plan_minimizes_step_deviation_among_divisors():
    n, t = 128, 0.8
    plan = lsh_plan(n, t)
    assert plan["bands"] * plan["rows"] == n
    res = 1000
    ss = [(i + 0.5) / res for i in range(res)]
    for r in range(1, n + 1):
        if n % r:
            continue
        b = n // r
        fp = sum(_p(s, b, r) for s in ss if s < t) / res
        fn = sum(1 - _p(s, b, r) for s in ss if s >= t) / res
        assert plan["error"] <= fp + fn + 1e-12


def test_threshold_est_tracks_target():
    lo = lsh_plan(64, 0.4)
    hi = lsh_plan(64, 0.9)
    assert lo["threshold_est"] < hi["threshold_est"]
    # the classic (1/b)^(1/r) approximation of the curve's knee
    assert abs(lo["threshold_est"] - (1 / lo["bands"]) ** (1 / lo["rows"])) < 1e-12


def test_operating_curve_is_the_real_curve():
    plan = lsh_plan(128, 0.8)
    b, r = plan["bands"], plan["rows"]
    for s, p in plan["recall_at"].items():
        assert p == pytest.approx(_p(float(s), b, r), abs=1e-6)
    # recall monotone in s; fp vanishes away from the threshold
    rec = list(plan["recall_at"].values())
    assert rec == sorted(rec)
    assert min(plan["fp_at"].values()) < 0.01


def test_rejects_bad_inputs():
    with pytest.raises(ValueError):
        lsh_plan(128, 1.0)
    with pytest.raises(ValueError):
        lsh_plan(1, 0.5)

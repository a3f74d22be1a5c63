"""filters.icp + the exact 3D 1-NN join primitive.

Oracle: a literal numpy replication of IterativeClosestPoint.cpp's
icp() loop (brute-force NN, Umeyama via SVD, same convergence rules),
compared on transform / converged / fitness / transformed coordinates.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdal_spark.operators.icp import icp, nn1_join_3d


# ---------------------------------------------------------------------------
# deterministic fixtures (no RNG)
# ---------------------------------------------------------------------------


def _cloud(n: int) -> np.ndarray:
    """Low-discrepancy-ish 3D cloud via integer LCGs — deterministic and
    irregular enough that NN structure is nontrivial."""
    i = np.arange(n, dtype=np.int64)
    x = ((i * 48271 + 11) % 100003) / 100003.0 * 100.0
    y = ((i * 16807 + 7) % 100019) / 100019.0 * 80.0
    z = ((i * 69621 + 3) % 100043) / 100043.0 * 20.0
    return np.stack([x, y, z], axis=1)


def _rigid(theta_deg: float, t: tuple[float, float, float]) -> np.ndarray:
    th = math.radians(theta_deg)
    m = np.eye(4)
    m[0, 0] = math.cos(th)
    m[0, 1] = -math.sin(th)
    m[1, 0] = math.sin(th)
    m[1, 1] = math.cos(th)
    m[:3, 3] = t
    return m


def _apply(m: np.ndarray, pts: np.ndarray) -> np.ndarray:
    return pts @ m[:3, :3].T + m[:3, 3]


def _df(spark, pts: np.ndarray):
    return spark.createDataFrame(
        [(int(i), float(p[0]), float(p[1]), float(p[2]))
         for i, p in enumerate(pts)],
        "page_id long, x double, y double, z double",
    )


# ---------------------------------------------------------------------------
# numpy oracle — literal replication of IterativeClosestPoint.cpp:104-280
# ---------------------------------------------------------------------------


def _np_umeyama(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Eigen::umeyama(b^T, a^T, false): map b onto a."""
    ma, mb = a.mean(axis=0), b.mean(axis=0)
    sigma = (a - ma).T @ (b - mb) / len(a)
    u, _, vt = np.linalg.svd(sigma)
    s = np.ones(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        s[2] = -1.0
    r = u @ np.diag(s) @ vt
    t = np.eye(4)
    t[:3, :3] = r
    t[:3, 3] = ma - r @ mb
    return t


def _np_nn(query: np.ndarray, ref: np.ndarray):
    """Brute-force 1-NN with the engine's (distance, id) tiebreak."""
    d2 = ((query[:, None, :] - ref[None, :, :]) ** 2).sum(axis=2)
    idx = d2.argmin(axis=1)
    return idx, np.sqrt(d2[np.arange(len(query)), idx])


def _np_icp(fixed: np.ndarray, moving: np.ndarray, max_iter=100,
            rt=0.99999, tt=9e-8, mse_abs=1e-12, max_similar=0):
    centroid = fixed.mean(axis=0)
    fc = fixed - centroid
    mc = moving - centroid
    final = np.eye(4)
    converged, prev_mse, num_similar, iters = False, 0.0, 0, 0
    for _ in range(max_iter):
        iters += 1
        moved = _apply(final, mc)
        idx, dist = _np_nn(moved, fc)
        mse = float(dist.mean())
        t = _np_umeyama(fc[idx], moved)
        final = final @ t
        is_similar = False
        cos_angle = 0.5 * (t[0, 0] + t[1, 1] + t[2, 2] - 1.0)
        tr_sqr = float(t[:3, 3] @ t[:3, 3])
        if abs(mse - prev_mse) < mse_abs:
            if num_similar >= max_similar:
                converged = True
                break
            is_similar = True
        if cos_angle >= rt and tr_sqr <= tt:
            if num_similar >= max_similar:
                converged = True
                break
            is_similar = True
        num_similar = num_similar + 1 if is_similar else 0
        prev_mse = mse
    out = _apply(final, moving - centroid) + centroid
    _, fdist = _np_nn(out, fixed)
    return out, final, converged, float(fdist.mean()), iters


# ---------------------------------------------------------------------------
# nn1_join_3d
# ---------------------------------------------------------------------------


class TestNN1Join3D:
    def test_exact_vs_brute_force(self, spark):
        src, cand = _cloud(400), _cloud(300) + np.array([1.0, -2.0, 0.5])
        out = (
            nn1_join_3d(_df(spark, src),
                        _df(spark, cand).withColumnRenamed("page_id", "nid"),
                        cell=5.0, src_id="page_id", cand_id="nid")
            .orderBy("page_id")
            .collect()
        )
        idx, dist = _np_nn(src, cand)
        assert len(out) == len(src)
        for r in out:
            assert r.nid == idx[r.page_id]
            assert abs(r.dist - dist[r.page_id]) < 1e-9

    def test_expansion_rounds_and_fallback(self, spark):
        # a distant micro-cluster forces cell doubling; cell chosen tiny
        # so the far rows exhaust max_rounds and exercise the fallback
        src = np.vstack([_cloud(50), _cloud(5) + 5000.0])
        cand = _cloud(40)
        out = (
            nn1_join_3d(_df(spark, src),
                        _df(spark, cand).withColumnRenamed("page_id", "nid"),
                        cell=2.0, src_id="page_id", cand_id="nid", max_rounds=3)
            .orderBy("page_id")
            .collect()
        )
        idx, dist = _np_nn(src, cand)
        assert len(out) == len(src)
        for r in out:
            assert r.nid == idx[r.page_id]
            assert abs(r.dist - dist[r.page_id]) < 1e-9

    def test_every_src_row_matched_once(self, spark):
        src, cand = _cloud(200), _cloud(10)
        out = nn1_join_3d(_df(spark, src),
                          _df(spark, cand).withColumnRenamed("page_id", "nid"),
                          cell=1.0, src_id="page_id", cand_id="nid")
        ids = [r.page_id for r in out.select("page_id").collect()]
        assert sorted(ids) == list(range(200))


# ---------------------------------------------------------------------------
# icp
# ---------------------------------------------------------------------------


class TestICP:
    @pytest.mark.parametrize("theta,trans", [
        (2.0, (0.8, -0.6, 0.3)),
        (-3.5, (-1.2, 0.4, 0.0)),
    ])
    def test_matches_reference_loop(self, spark, theta, trans):
        fixed = _cloud(500)
        moving = _apply(_rigid(theta, trans), _cloud(500))
        out_df, meta = icp(_df(spark, fixed), _df(spark, moving),
                           max_iter=25)
        o_pts, o_final, o_conv, o_fit, o_iters = _np_icp(
            fixed, moving, max_iter=25)
        assert meta["iterations"] == o_iters
        assert meta["converged"] == o_conv
        assert np.allclose(np.array(meta["transform"]), o_final, atol=1e-8)
        assert abs(meta["fitness"] - o_fit) < 1e-8
        got = {r.page_id: (r.x, r.y, r.z)
               for r in out_df.select("page_id", "x", "y", "z").collect()}
        for i, p in enumerate(o_pts):
            assert np.allclose(got[i], p, atol=1e-8)

    def test_recovers_small_offset(self, spark):
        # identical clouds, pure translation: ICP must drive the moving
        # cloud (near-)exactly back onto the fixed one
        fixed = _cloud(400)
        moving = fixed + np.array([0.5, -0.3, 0.2])
        out_df, meta = icp(_df(spark, fixed), _df(spark, moving),
                           max_iter=50)
        assert meta["converged"]
        assert meta["fitness"] < 1e-6
        inv = np.array(meta["transform"])
        # recovered transform ~ inverse of the applied offset
        assert np.allclose(inv[:3, 3], [-0.5, 0.3, -0.2], atol=1e-5)

    def test_preserves_extra_columns(self, spark):
        fixed = _cloud(100)
        moving = fixed + 0.1
        mdf = _df(spark, moving).withColumn(
            "tag", F.concat(F.lit("p"), F.col("page_id"))
        )
        out_df, _ = icp(_df(spark, fixed), mdf, max_iter=3,
                        compute_fitness=False)
        assert "tag" in out_df.columns
        rows = out_df.select("page_id", "tag").collect()
        assert all(r.tag == f"p{r.page_id}" for r in rows)

"""SMRF ground segmentation tests.

Grid kernels get independent oracles (np.gradient for the MATLAB-style
gradients, hand-computed literals for the morphology and inpainting);
the end-to-end operator gets a semantic golden (plane + building) and
feeds filters.hag downstream, mirroring kernels/GroundKernel.cpp.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdal_spark.operators import ground


def test_grad_matches_numpy_gradient():
    rng = np.random.default_rng(3)
    g = rng.normal(size=(9, 7))
    gy, gx = np.gradient(g)  # numpy = same central/one-sided scheme
    np.testing.assert_allclose(ground.grad_x(g), gx, atol=1e-12)
    np.testing.assert_allclose(ground.grad_y(g), gy, atol=1e-12)


def test_erode_dilate_literal():
    g = np.zeros((5, 5))
    g[2, 2] = -3.0
    e1 = ground.erode_diamond(g, 1)
    # the low value spreads to the 4-neighborhood
    assert e1[2, 2] == -3.0 and e1[1, 2] == -3.0 and e1[2, 1] == -3.0
    assert e1[1, 1] == 0.0
    # opening (erode then dilate back) removes a 1-cell PEAK exactly
    p = np.zeros((5, 5))
    p[2, 2] = 7.0
    opened = ground.dilate_diamond(ground.erode_diamond(p, 1), 1)
    assert opened[2, 2] == 0.0
    # and dilate/erode are duals: dilating the eroded low spot restores 0s
    back = ground.dilate_diamond(e1, 1)
    assert back[0, 0] == 0.0


def test_knnfill_literal():
    g = np.array([
        [1.0, 2.0, 3.0],
        [4.0, np.nan, 6.0],
        [7.0, 8.0, 9.0],
    ])
    out = ground.knnfill(g)
    # hole at center: its 8 nearest populated cells are all 8 others
    assert out[1, 1] == pytest.approx((1 + 2 + 3 + 4 + 6 + 7 + 8 + 9) / 8)
    # populated cells untouched
    assert out[0, 0] == 1.0 and out[2, 2] == 9.0


def test_progressive_filter_flags_spike():
    g = np.zeros((7, 7))
    g[3, 3] = 5.0
    obj = ground.progressive_filter(g, cell=1.0, slope=0.15, max_window=3.0)
    assert obj[3, 3] == 1
    assert obj[0, 0] == 0


@pytest.fixture(scope="module")
def scene(spark):
    # 41x41 lattice, spacing 1, z=0 plane with a 5x5-cell building of
    # height 10 at [10,15)^2
    n = 41
    df = spark.range(n * n).select(
        F.col("id").alias("page_id"),
        (F.col("id") % n).cast("double").alias("x"),
        (F.col("id") / n).cast("long").cast("double").alias("y"),
    )
    return df.withColumn(
        "z",
        F.when(
            (F.col("x") >= 10) & (F.col("x") < 15)
            & (F.col("y") >= 10) & (F.col("y") < 15),
            10.0,
        ).otherwise(0.0),
    )


def test_smrf_plane_plus_building(scene):
    out = ground.smrf(
        scene, cell=1.0, slope=0.15, threshold=0.5, window=18.0, scalar=1.25
    ).toPandas()
    building = out[out.z == 10.0]
    flat = out[out.z == 0.0]
    assert set(out.classification.unique()) <= {ground.GROUND, ground.NOT_GROUND}
    assert (building.classification == ground.NOT_GROUND).all()
    # the flat plane is overwhelmingly ground (gradient edge cells may
    # get permissive thresholds, never the other way)
    assert (flat.classification == ground.GROUND).mean() > 0.99


def test_smrf_feeds_hag(scene):
    """GroundKernel.cpp workflow: smrf -> hag; building points sit ~10
    above the interpolated ground, ground points at exactly 0."""
    from pdal_spark.operators.pointcloud import hag

    classed = ground.smrf(
        scene, cell=1.0, slope=0.15, threshold=0.5, window=18.0, scalar=1.25
    )
    out = hag(classed, count=3, id_col="page_id").toPandas()
    g = out[out.classification == ground.GROUND]
    ng = out[(out.classification == ground.NOT_GROUND) & (out.z == 10.0)]
    assert (g.height_above_ground == 0.0).all()
    assert len(ng) and np.allclose(ng.height_above_ground, 10.0, atol=1e-9)


def test_smrf_net_cut_path():
    """cut > 0 exercises the net-cutting branch (SMRFilter.cpp:397-427):
    still a clean plane/building split on the same scene."""
    import pandas as pd

    xs, ys = np.meshgrid(np.arange(21.0), np.arange(21.0))
    z = np.where((xs >= 8) & (xs < 12) & (ys >= 8) & (ys < 12), 8.0, 0.0)
    pdf = pd.DataFrame({
        "page_id": np.arange(xs.size), "x": xs.ravel(), "y": ys.ravel(),
        "z": z.ravel(),
    })
    import pyspark.sql

    spark = pyspark.sql.SparkSession.getActiveSession()
    df = spark.createDataFrame(pdf)
    out = ground.smrf(df, cell=1.0, window=10.0, cut=6.0).toPandas()
    assert (out[out.z == 8.0].classification == ground.NOT_GROUND).all()
    assert (out[out.z == 0.0].classification == ground.GROUND).mean() > 0.95


# --- PMF ---------------------------------------------------------------------


def _pmf_reference_loop(xs, ys, zs, cell, max_window, slope, init_d, max_d,
                        exponential=True):
    """Literal PMFFilter::processGround loop (sequential groundIdx
    shrinking) — independent oracle for the engine's closed-form
    min-threshold transform."""
    minx, miny = xs.min(), ys.min()
    n_cols = int((xs.max() - minx) / cell) + 1
    n_rows = int((ys.max() - miny) / cell) + 1
    zi = np.full((n_rows, n_cols), np.nan)
    for i in range(len(xs)):
        c = int(np.floor(xs[i] - minx) / cell)
        r = int(np.floor(ys[i] - miny) / cell)
        if np.isnan(zi[r, c]) or zs[i] < zi[r, c]:
            zi[r, c] = zs[i]
    zi = ground.nn1fill(zi)
    wins = ground.pmf_windows(cell, max_window, slope, init_d, max_d,
                              exponential)
    gidx = list(range(len(xs)))
    for ws, ht in wins:
        iters = int(0.5 * (ws - 1))
        mo = ground.dilate_diamond(ground.erode_diamond(zi, iters), iters)
        keep = []
        for i in gidx:
            c = int(np.floor((xs[i] - minx) / cell))
            r = int(np.floor((ys[i] - miny) / cell))
            if zs[i] - mo[r, c] < ht:
                keep.append(i)
        zi, gidx = mo, keep
    return set(gidx)


def test_pmf_windows_series():
    # exponential: ws_i = cell*(2*2^i+1) -> 3, 5, 9, 17, 33; stops when
    # prev ws >= max_window (the last may exceed it)
    wins = ground.pmf_windows(1.0, 33.0, 1.0, 0.15, 2.5)
    assert [w for w, _ in wins] == [3.0, 5.0, 9.0, 17.0, 33.0]
    assert wins[0][1] == 0.15
    assert wins[1][1] == min(1.0 * (5.0 - 3.0) * 1.0 + 0.15, 2.5)
    assert wins[-1][1] == 2.5  # capped by max_distance


def test_pmf_matches_reference_loop(scene):
    pdf = scene.toPandas().sort_values("page_id")
    xs = pdf.x.to_numpy()
    ys = pdf.y.to_numpy()
    zs = pdf.z.to_numpy()
    want = _pmf_reference_loop(xs, ys, zs, 1.0, 17.0, 1.0, 0.5, 3.0)
    out = ground.pmf(scene, cell=1.0, max_window=17.0, slope=1.0,
                     initial_distance=0.5, max_distance=3.0).toPandas()
    got = set(out.loc[out.classification == ground.GROUND, "page_id"])
    assert got == want
    # semantic: building is non-ground, plane overwhelmingly ground
    assert not (set(pdf.loc[pdf.z == 10.0, "page_id"]) & got)
    flat = set(pdf.loc[pdf.z == 0.0, "page_id"])
    assert len(flat & got) / len(flat) > 0.99


# --- tiled-halo grid execution ----------------------------------------------


@pytest.fixture(scope="module")
def big_scene(spark):
    """80x80 unit lattice with ~12% of cells empty (exercises both
    knnfill passes), rolling terrain, two buildings, and a spike — big
    enough that tile_cells=16 gives a genuine 5x5 multi-tile split."""
    import pandas as pd

    rng = np.random.default_rng(42)
    n = 80
    xs, ys = np.meshgrid(np.arange(float(n)), np.arange(float(n)))
    xs, ys = xs.ravel(), ys.ravel()
    zterrain = 2.0 * np.sin(xs / 11.0) + 1.5 * np.cos(ys / 7.0)
    z = zterrain.copy()
    b1 = (xs >= 20) & (xs < 27) & (ys >= 30) & (ys < 38)
    b2 = (xs >= 55) & (xs < 60) & (ys >= 10) & (ys < 14)
    z[b1] += 9.0
    z[b2] += 12.0
    z[(xs == 70) & (ys == 70)] += 30.0
    keep = rng.random(len(xs)) > 0.12
    pdf = pd.DataFrame({
        "page_id": np.arange(len(xs))[keep], "x": xs[keep], "y": ys[keep],
        "z": z[keep],
    })
    return spark.createDataFrame(pdf).repartition(8)


def _cls(df):
    out = df.toPandas().sort_values("page_id").reset_index(drop=True)
    return list(zip(out.page_id, out.classification))


def test_smrf_tiled_equals_single(big_scene):
    kw = dict(cell=1.0, slope=0.15, threshold=0.5, window=4.0, scalar=1.25)
    single = ground.smrf(big_scene, mode="driver", **kw)
    tiled = ground.smrf(big_scene, mode="tiled", tile_cells=16, **kw)
    assert _cls(single) == _cls(tiled)


def test_smrf_tiled_equals_single_with_cut(big_scene):
    kw = dict(cell=1.0, slope=0.15, threshold=0.5, window=4.0, scalar=1.25,
              cut=3.0)
    single = ground.smrf(big_scene, mode="driver", **kw)
    tiled = ground.smrf(big_scene, mode="tiled", tile_cells=16,
                        halo_cells=40, **kw)
    assert _cls(single) == _cls(tiled)


def test_pmf_tiled_equals_single(big_scene):
    kw = dict(cell=1.0, max_window=5.0, slope=1.0, initial_distance=0.5,
              max_distance=3.0)
    single = ground.pmf(big_scene, mode="driver", **kw)
    tiled = ground.pmf(big_scene, mode="tiled", tile_cells=16, **kw)
    assert _cls(single) == _cls(tiled)


def test_pmf_tiled_fractional_cell_keys(spark):
    """cell=0.5 makes the build key (floor BEFORE divide) differ from
    the classify key (floor AFTER) — the marker-tile union must route
    points whose classify cell is unpopulated."""
    import pandas as pd

    rng = np.random.default_rng(7)
    xs = rng.uniform(0, 30, 2500)
    ys = rng.uniform(0, 30, 2500)
    z = 0.1 * xs + np.where((xs > 10) & (xs < 14) & (ys > 10) & (ys < 14),
                            6.0, 0.0)
    pdf = pd.DataFrame({"page_id": np.arange(len(xs)), "x": xs, "y": ys,
                        "z": z})
    df = spark.createDataFrame(pdf).repartition(6)
    kw = dict(cell=0.5, max_window=3.0, slope=1.0, initial_distance=0.5,
              max_distance=3.0)
    single = ground.pmf(df, mode="driver", **kw)
    tiled = ground.pmf(df, mode="tiled", tile_cells=16, **kw)
    assert _cls(single) == _cls(tiled)


def test_tiled_certificate_raises_on_thin_halo(big_scene):
    """A halo smaller than the stencil radius must refuse, never
    silently approximate."""
    from py4j.protocol import Py4JJavaError

    with pytest.raises((Py4JJavaError, Exception)) as ei:
        ground.smrf(big_scene, mode="tiled", tile_cells=16, halo_cells=2,
                    cell=1.0, window=4.0).toPandas()
    assert "halo" in str(ei.value) or "GroundTiling" in str(ei.value)


def test_smrf_grid_window_whole_grid_is_identity():
    """Degenerate tiling (window == grid, all edges global) must equal
    smrf_grid bit-for-bit."""
    rng = np.random.default_rng(5)
    g = rng.normal(size=(30, 30))
    g[rng.random(g.shape) < 0.2] = np.nan
    zipro1, th1 = ground.smrf_grid(g, 1.0, 0.15, 0.5, 4.0, 1.25)
    zipro2, th2 = ground.smrf_grid_window(
        g, (0, 30, 0, 30), (True, True, True, True), (0, 0), 30,
        1.0, 0.15, 0.5, 4.0, 1.25,
    )
    np.testing.assert_array_equal(zipro1, zipro2)
    np.testing.assert_array_equal(th1, th2)


def test_fill_nearest_ring_path_equals_lexsort():
    """The big-grid expanding-ring kNN fill must select exactly the
    same neighbors (same distances, same global-index tie-break) as the
    small-grid full-lexsort form — including under a tiled origin."""
    rng = np.random.default_rng(13)
    g = rng.normal(size=(300, 300))          # 90k cells -> ring path
    g[rng.random(g.shape) < 0.6] = np.nan    # 60% holes, ragged
    g[100:140, 50:200] = np.nan              # one big void
    got, holes, dist = ground._fill_nearest(g, 8, np.mean, (70, 30), 5000)
    rr, cc = np.nonzero(~np.isnan(g))
    vals = g[rr, cc]
    lin = (cc + 30).astype(np.int64) * 5000 + (rr + 70)
    for (r, c), gd in list(zip(holes, dist))[::37]:  # sample for speed
        d2 = (rr - r) ** 2 + (cc - c) ** 2
        order = np.lexsort((lin, d2))[:8]
        assert got[r, c] == pytest.approx(vals[order].mean(), abs=0)
        assert gd == pytest.approx(float(np.sqrt(d2[order].max())), abs=0)
    # k=1 variant through the same dispatch
    got1, holes1, _ = ground._fill_nearest(g, 1, lambda v: v[0], (0, 0), 300)
    lin0 = cc.astype(np.int64) * 300 + rr
    for r, c in holes1[::53]:
        d2 = (rr - r) ** 2 + (cc - c) ** 2
        j = np.lexsort((lin0, d2))[0]
        assert got1[r, c] == vals[j]


def test_fill_nearest_property_vectorized_equals_dense():
    """Property test: on arbitrary small grids (random shapes, fills,
    origins, k) the vectorized fill must be BIT-IDENTICAL to the dense
    reference path — values, hole list, and certificate distances."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        rows=st.integers(3, 24),
        cols=st.integers(3, 24),
        fill=st.floats(0.05, 0.95),
        k=st.sampled_from([1, 3, 8]),
        r0=st.integers(0, 500),
        c0=st.integers(0, 500),
        seed=st.integers(0, 10_000),
    )
    def check(rows, cols, fill, k, r0, c0, seed):
        rng = np.random.default_rng(seed)
        g = rng.normal(size=(rows, cols))
        g[rng.random(g.shape) >= fill] = np.nan
        if not np.any(~np.isnan(g)):
            return
        agg = np.mean if k > 1 else (lambda v: v[0])
        a, ha, da = ground._fill_nearest(g, k, agg, (r0, c0), 4096,
                                         algo="dense")
        b, hb, db = ground._fill_nearest(g, k, agg, (r0, c0), 4096,
                                         algo="vectorized")
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(ha, hb)
        np.testing.assert_array_equal(da, db)

    check()


@pytest.mark.parametrize("seed,cell,window,cut,tile", [
    (1, 1.0, 3.0, 0.0, 16),
    (2, 2.0, 6.0, 0.0, 8),
    (3, 1.0, 5.0, 4.0, 32),
])
def test_smrf_tiled_fuzz_parity(spark, seed, cell, window, cut, tile):
    """Randomized scenes (cliffs, craters, ragged holes) across cell /
    window / cut / tile-size combinations: the certified tiled path
    must equal the single grid exactly, or raise — never drift."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    n = 60
    xs, ys = np.meshgrid(np.arange(float(n)), np.arange(float(n)))
    xs, ys = xs.ravel() * cell, ys.ravel() * cell
    z = rng.normal(0.0, 0.3, len(xs)) + 3.0 * np.sin(xs / 9.0)
    z[(xs > 20 * cell) & (xs < 30 * cell) & (ys > 15 * cell)
      & (ys < 22 * cell)] += 11.0
    z[(xs - 45 * cell) ** 2 + (ys - 45 * cell) ** 2 < (6 * cell) ** 2] -= 5.0
    keep = rng.random(len(xs)) > 0.15
    pdf = pd.DataFrame({"page_id": np.arange(len(xs))[keep],
                        "x": xs[keep], "y": ys[keep], "z": z[keep]})
    df = spark.createDataFrame(pdf).repartition(5)
    kw = dict(cell=cell, slope=0.2, threshold=0.4, window=window,
              scalar=1.25, cut=cut)
    single = ground.smrf(df, mode="driver", **kw)
    tiled = ground.smrf(df, mode="tiled", tile_cells=tile, halo_cells=45,
                        **kw)
    assert _cls(single) == _cls(tiled)


# --- skewness balancing ------------------------------------------------------


def _skew_reference_loop(zs_sorted):
    """Literal SkewnessBalancingFilter::processGround incremental-moment
    scan (M1/M2/M3 update formulas, :76-103)."""
    n = 0
    M1 = M2 = M3 = 0.0
    last_positive = 0
    skew = 0.0
    last_skew = float("nan")
    cls = np.full(len(zs_sorted), 0)
    for i, zv in enumerate(zs_sorted):
        n1 = n
        n += 1
        delta = zv - M1
        delta_n = delta / n
        term1 = delta * delta_n * n1
        M1 += delta_n
        M3 += term1 * delta_n * (n - 2) - 3 * delta_n * M2
        M2 += term1
        skew = np.sqrt(n) * M3 / M2**1.5 if M2 > 0 else float("nan")
        if skew > 0 and last_skew <= 0:
            cls[last_positive:i] = ground.GROUND
            last_positive = i
        last_skew = skew
    if last_positive == 0 and not skew > 0:
        cls[:] = ground.GROUND
    else:
        cls[last_positive:] = ground.NOT_GROUND
    return cls


def test_skewness_balancing_matches_reference(spark):
    rng = np.random.default_rng(11)
    # terrain-ish: symmetric low mass + a positive-skew tail of highs
    zs = np.concatenate([rng.normal(10, 1, 400), rng.exponential(8, 100) + 12])
    import pandas as pd

    pdf = pd.DataFrame({"page_id": np.arange(len(zs)), "z": zs})
    df = spark.createDataFrame(pdf).repartition(7)
    out = ground.skewness_balancing(df, z="z", arrival_col="page_id") \
        .toPandas().sort_values(["z", "page_id"]).reset_index(drop=True)
    order = np.lexsort((pdf.page_id.to_numpy(), pdf.z.to_numpy()))
    want = _skew_reference_loop(zs[order])
    assert list(out.classification) == list(want)
    # sanity: both classes present and ground is the low-z prefix
    assert set(want) == {ground.GROUND, ground.NOT_GROUND}


def test_skewness_balancing_all_ground(spark):
    # symmetric data: skewness never goes positive -> everything ground
    import pandas as pd

    zs = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    df = spark.createDataFrame(pd.DataFrame({"page_id": np.arange(6), "z": zs}))
    out = ground.skewness_balancing(df, z="z", arrival_col="page_id").toPandas()
    assert (out.classification == ground.GROUND).all()

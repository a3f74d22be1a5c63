"""filters.smrf — Simple Morphological Filter ground segmentation.

Reference: /root/reference/filters/SMRFilter.cpp (Pingel, Clarke,
McBride 2013 as implemented there) — run/createZImin/createLowMask/
createObjMask/createZIpro/classifyGround, plus the EigenUtils grid
helpers (erodeDiamond/dilateDiamond EigenUtils.cpp:278-355, gradX/gradY
EigenUtils.hpp:253-290, knnfill SMRFilter.cpp:575-633).

Execution split (the Spark-first shape):

  * POINT-side work is distributed: the minimum-Z surface is one
    ``groupBy(cell).agg(min(z))`` (map-side combine, single shuffle over
    the points), and the final classify is a broadcast join of the
    per-cell (DEM, threshold) table back onto the points — both scale
    with the point count across executors.
  * GRID-side work (morphological opening, inpainting, gradients) is an
    iterative stencil over the CELL GRID, whose size is
    O(extent / cell^2) — independent of the point count, orders of
    magnitude smaller (a 100 TB cloud over a city at 1 m cells is a
    ~10^8-cell grid). It runs as one vectorized numpy pass on the
    driver; for continent-scale grids the same kernel applies per
    splitter tile with a (4 * window/cell)-cell halo, the standard
    overlap-tile decomposition (splitter.py buffered tiles) — noted,
    not needed at the gated scales.

Semantics replicated from the reference, including the quirks:
  * cell key: ``floor(x - minx) / cell`` — floor BEFORE divide
    (SMRFilter.cpp:459-460, like ELM);
  * grid dims: ``int((max - min) / cell) + 1`` (:241-244);
  * progressive filter: erode the PREVIOUS erosion once per round,
    dilate by the current radius, diff against the previous OPENED
    surface, flag > slope * cell * radius (:637-700);
  * low-outlier mask = progressive filter on the NEGATED min surface
    with slope 5.0, window 1 (:370-383);
  * optional net cutting (cut > 0) with a (2*ceil(cut/cell))-iteration
    opening splashed onto a every-vth-row/col net (:397-427, :495-533);
  * inpainting: mean of the 8 nearest populated cells by center
    distance (:575-633);
  * thresholds: threshold + scalar * ||grad(DEM / cell)|| with the
    gradient surface inpainted too (:282-310);
  * classify: |DEM[cell] - z| > thresh[cell] -> class 1 else 2; cells
    with NaN DEM leave the input classification untouched (:359-368).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NOT_GROUND, GROUND = 1, 2


# ---------------------------------------------------------------------------
# grid kernels (numpy twins of the EigenUtils helpers)
# ---------------------------------------------------------------------------


def erode_diamond(g: np.ndarray, iterations: int) -> np.ndarray:
    """Morphological erosion with the 5-cell diamond element, iterated
    (EigenUtils.cpp:318-355)."""
    out = g
    for _ in range(iterations):
        p = np.pad(out, 1, constant_values=np.inf)
        out = np.minimum.reduce([
            p[1:-1, 1:-1], p[:-2, 1:-1], p[2:, 1:-1], p[1:-1, :-2], p[1:-1, 2:],
        ])
    return out


def dilate_diamond(g: np.ndarray, iterations: int) -> np.ndarray:
    """Diamond dilation, iterated (EigenUtils.cpp:278-316)."""
    out = g
    for _ in range(iterations):
        p = np.pad(out, 1, constant_values=-np.inf)
        out = np.maximum.reduce([
            p[1:-1, 1:-1], p[:-2, 1:-1], p[2:, 1:-1], p[1:-1, :-2], p[1:-1, 2:],
        ])
    return out


def grad_x(g: np.ndarray) -> np.ndarray:
    """MATLAB-style gradient along x/columns (EigenUtils.hpp:253-269)."""
    out = np.zeros_like(g)
    if g.shape[1] >= 2:
        out[:, 1:-1] = 0.5 * (g[:, 2:] - g[:, :-2])
        out[:, 0] = g[:, 1] - g[:, 0]
        out[:, -1] = g[:, -1] - g[:, -2]
    return out


def grad_y(g: np.ndarray) -> np.ndarray:
    """Gradient along y/rows (EigenUtils.hpp:278-290)."""
    out = np.zeros_like(g)
    if g.shape[0] >= 2:
        out[1:-1, :] = 0.5 * (g[2:, :] - g[:-2, :])
        out[0, :] = g[1, :] - g[0, :]
        out[-1, :] = g[-1, :] - g[-2, :]
    return out


def knnfill(g: np.ndarray) -> np.ndarray:
    """Fill NaN cells with the mean of the 8 nearest populated cells by
    center distance (SMRFilter.cpp:575-633); ties broken by linear cell
    index (the reference KD tie order is build order — unspecified;
    pinned here for determinism)."""
    rows, cols = g.shape
    rr, cc = np.nonzero(~np.isnan(g))
    if len(rr) == 0:
        return g.copy()
    vals = g[rr, cc]
    out = g.copy()
    holes = np.argwhere(np.isnan(g))
    k = min(8, len(rr))
    lin = cc.astype(np.int64) * rows + rr  # column-major like the reference
    for r, c in holes:
        d2 = (rr - r) ** 2 + (cc - c) ** 2
        order = np.lexsort((lin, d2))[:k]
        out[r, c] = vals[order].mean()
    return out


def progressive_filter(
    g: np.ndarray, cell: float, slope: float, max_window: float
) -> np.ndarray:
    """Iteratively opened surface -> OBJ mask (SMRFilter.cpp:637-700)."""
    max_radius = int(np.ceil(max_window / cell))
    prev_surface = g
    prev_erosion = g
    obj = np.zeros(g.shape, dtype=np.int64)
    for radius in range(1, max_radius + 1):
        cur_erosion = erode_diamond(prev_erosion, 1)
        cur_opening = dilate_diamond(cur_erosion, radius)
        prev_erosion = cur_erosion
        thresh = slope * cell * radius
        obj = np.maximum(obj, (np.abs(prev_surface - cur_opening) > thresh).astype(np.int64))
        prev_surface = cur_opening
    return obj


def smrf_grid(
    zimin_raw: np.ndarray,
    cell: float,
    slope: float,
    threshold: float,
    window: float,
    scalar: float,
    cut: float = 0.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Grid pipeline: raw min-Z grid (NaN = empty) -> (ZIpro, thresh).

    Mirrors SMRFilter::run's grid stages in order: inpaint ZImin, low
    mask (negated surface, slope 5.0, window 1), net mask/cut, object
    mask, provisional DEM (re-inpainted), slope-aware thresholds."""
    zimin = knnfill(zimin_raw)
    low = progressive_filter(-zimin, cell, 5.0, 1.0)

    rows, cols = zimin.shape
    is_net = np.zeros(zimin.shape, dtype=bool)
    zinet = zimin
    if cut > 0.0:
        v = int(np.ceil(cut / cell))
        is_net[:, ::v] = True
        is_net[::v, :] = True
        big_open = dilate_diamond(erode_diamond(zimin, 2 * v), 2 * v)
        zinet = np.where(is_net, big_open, zimin)

    obj = progressive_filter(zinet, cell, slope, window)

    zipro_raw = np.where((obj == 1) | (low == 1) | is_net, np.nan, zimin)
    zipro = knnfill(zipro_raw)

    scaled = zipro / cell
    gx, gy = grad_x(scaled), grad_y(scaled)
    gsurfs = knnfill(np.sqrt(gx * gx + gy * gy))
    thresh = threshold + scalar * gsurfs
    return zipro, thresh


# ---------------------------------------------------------------------------
# the distributed operator
# ---------------------------------------------------------------------------


def smrf(
    df: DataFrame,
    cell: float = 1.0,
    slope: float = 0.15,
    threshold: float = 0.5,
    window: float = 18.0,
    scalar: float = 1.25,
    cut: float = 0.0,
    x: str = "x",
    y: str = "y",
    z: str = "z",
    class_col: str = "classification",
    bounds: tuple[float, float, float, float] | None = None,
) -> DataFrame:
    """Classify every point GROUND (2) / NOT_GROUND (1) per SMRF.

    ``bounds`` pins (minx, miny, maxx, maxy); None computes them (one
    extra aggregate — order-independent either way)."""
    if bounds is None:
        b = df.agg(F.min(x), F.min(y), F.max(x), F.max(y)).collect()[0]
        bounds = (b[0], b[1], b[2], b[3])
    minx, miny, maxx, maxy = bounds
    n_cols = int((maxx - minx) / cell) + 1
    n_rows = int((maxy - miny) / cell) + 1

    # floor BEFORE divide, like the reference (SMRFilter.cpp:459-460)
    ccol = (F.floor(F.col(x) - F.lit(minx)) / cell).cast("int")
    crow = (F.floor(F.col(y) - F.lit(miny)) / cell).cast("int")
    work = df.withColumn("_sc", ccol).withColumn("_sr", crow)

    # distributed min-Z surface: one shuffle, map-side combine
    cells = (
        work.groupBy("_sc", "_sr").agg(F.min(z).alias("_zmin")).collect()
    )
    zimin = np.full((n_rows, n_cols), np.nan)
    for r in cells:
        zimin[r["_sr"], r["_sc"]] = r["_zmin"]

    zipro, thresh = smrf_grid(zimin, cell, slope, threshold, window, scalar, cut)

    rr, cc = np.nonzero(~np.isnan(zipro))
    side_rows = [
        (int(cc[i]), int(rr[i]), float(zipro[rr[i], cc[i]]),
         float(thresh[rr[i], cc[i]]))
        for i in range(len(rr))
    ]
    spark = df.sparkSession
    side = spark.createDataFrame(
        side_rows, "_sc int, _sr int, _dem double, _thr double"
    )
    joined = work.join(F.broadcast(side), ["_sc", "_sr"], "left")
    base = F.col(class_col) if class_col in df.columns else F.lit(1)
    cls = F.when(
        F.col("_dem").isNotNull(),
        F.when(F.abs(F.col("_dem") - F.col(z)) > F.col("_thr"),
               F.lit(NOT_GROUND)).otherwise(F.lit(GROUND)),
    ).otherwise(base)
    return joined.withColumn(class_col, cls).drop("_sc", "_sr", "_dem", "_thr")


# ---------------------------------------------------------------------------
# filters.pmf — progressive morphological filter (PMFFilter.cpp:241-373)
# ---------------------------------------------------------------------------


def pmf_windows(
    cell: float, max_window: float, slope: float, initial_distance: float,
    max_distance: float, exponential: bool = True,
) -> list[tuple[float, float]]:
    """(window size, height threshold) series (PMFFilter.cpp:305-330).
    The while-check uses the PREVIOUS ws, so the last appended window may
    exceed max_window — replicated."""
    out: list[tuple[float, float]] = []
    ws, it = 0.0, 0
    while ws < max_window:
        if exponential:
            ws = cell * (2.0 * 2.0**it + 1.0)
        else:
            ws = cell * (2.0 * (it + 1) * 2 + 1.0)
        if it == 0:
            ht = initial_distance
        else:
            ht = slope * (ws - out[it - 1][0]) * cell + initial_distance
        ht = min(ht, max_distance)
        out.append((ws, ht))
        it += 1
    return out


def pmf(
    df: DataFrame,
    cell: float = 1.0,
    max_window: float = 33.0,
    slope: float = 1.0,
    initial_distance: float = 0.15,
    max_distance: float = 2.5,
    exponential: bool = True,
    x: str = "x",
    y: str = "y",
    z: str = "z",
    class_col: str = "classification",
    bounds: tuple[float, float, float, float] | None = None,
) -> DataFrame:
    """filters.pmf: progressive morphological opening of the min-Z grid;
    a point stays ground iff it survives EVERY iteration's test
    ``z - opened_j[cell] < ht_j`` (PMFFilter.cpp:344-360). Because the
    per-point test at step j depends only on its cell, the progressive
    set-shrinking is equivalent to one closed-form predicate

        z < min_j(opened_j[cell] + ht_j)

    — so the distributed classify is a single broadcast join of a
    per-cell threshold table (grid-sized), no per-iteration point pass.
    Ground -> class 2; non-ground keeps its input class (the reference
    only labels ground returns; absent column -> 1).

    Reference quirks replicated: grid build cell key floors BEFORE the
    divide (:243-244) while the classify key floors AFTER (:350-353);
    void cells inpaint from the single nearest populated cell (:274-290).
    """
    if bounds is None:
        b = df.agg(F.min(x), F.min(y), F.max(x), F.max(y)).collect()[0]
        bounds = (b[0], b[1], b[2], b[3])
    minx, miny, maxx, maxy = bounds
    n_cols = int((maxx - minx) / cell) + 1
    n_rows = int((maxy - miny) / cell) + 1

    gcol = (F.floor(F.col(x) - F.lit(minx)) / cell).cast("int")
    grow = (F.floor(F.col(y) - F.lit(miny)) / cell).cast("int")
    cells = (
        df.withColumn("_pc", gcol).withColumn("_pr", grow)
        .groupBy("_pc", "_pr").agg(F.min(z).alias("_zmin")).collect()
    )
    zimin = np.full((n_rows, n_cols), np.nan)
    for r in cells:
        zimin[r["_pr"], r["_pc"]] = r["_zmin"]
    zimin = nn1fill(zimin)

    limit = np.full(zimin.shape, np.inf)
    for ws, ht in pmf_windows(cell, max_window, slope, initial_distance,
                              max_distance, exponential):
        iters = int(0.5 * (ws - 1))
        opened = dilate_diamond(erode_diamond(zimin, iters), iters)
        limit = np.minimum(limit, opened + ht)
        zimin = opened

    rr, cc = np.nonzero(np.isfinite(limit))
    side_rows = [
        (int(cc[i]), int(rr[i]), float(limit[rr[i], cc[i]]))
        for i in range(len(rr))
    ]
    spark = df.sparkSession
    side = spark.createDataFrame(side_rows, "_pc int, _pr int, _zlim double")
    # classify key: floor AFTER the divide (PMFFilter.cpp:350-353)
    kcol = F.floor((F.col(x) - F.lit(minx)) / cell).cast("int")
    krow = F.floor((F.col(y) - F.lit(miny)) / cell).cast("int")
    work = df.withColumn("_pc", kcol).withColumn("_pr", krow)
    joined = work.join(F.broadcast(side), ["_pc", "_pr"], "left")
    base = F.col(class_col) if class_col in df.columns else F.lit(1)
    cls = F.when(F.col(z) < F.col("_zlim"), F.lit(GROUND)).otherwise(base)
    return joined.withColumn(class_col, cls).drop("_pc", "_pr", "_zlim")


def nn1fill(g: np.ndarray) -> np.ndarray:
    """Fill NaN cells with the value of the single nearest populated
    cell by center distance (PMFFilter.cpp:274-290); ties pinned by
    column-major linear index like knnfill."""
    rows, cols = g.shape
    rr, cc = np.nonzero(~np.isnan(g))
    if len(rr) == 0:
        return g.copy()
    vals = g[rr, cc]
    lin = cc.astype(np.int64) * rows + rr
    out = g.copy()
    for r, c in np.argwhere(np.isnan(g)):
        d2 = (rr - r) ** 2 + (cc - c) ** 2
        i = np.lexsort((lin, d2))[0]
        out[r, c] = vals[i]
    return out


# ---------------------------------------------------------------------------
# filters.skewnessbalancing (SkewnessBalancingFilter.cpp:60-110)
# ---------------------------------------------------------------------------


def skewness_balancing(
    df: DataFrame,
    z: str = "z",
    arrival_col: str = "page_id",
    class_col: str = "classification",
) -> DataFrame:
    """Bartels & Wei skewness balancing: scan points in ascending-z
    order maintaining running skewness of the prefix; each time the
    skewness crosses from <=0 to >0, everything before the crossing is
    (re)marked ground — net effect: ground = all points BEFORE the LAST
    crossing (everything from it on is non-ground); no crossing at all
    -> all ground iff the final skewness <= 0.

    Distributed shape: prefix skewness comes from exact global prefix
    power sums (ordered.prefix_sums — range partition + offsets, no
    single-task window); the "previous" skewness is derived by
    subtracting the row's own contribution, so no cross-partition lag is
    needed. The last crossing is one scalar aggregate.

    Pinned divergences: z-ties ordered by arrival (the reference's
    std::sort order on ties is unspecified), and the running central
    moments come from power sums (algebraically equal to the reference's
    incremental M1/M2/M3, fp-rounding aside — sign tests use the raw
    doubles, like the reference)."""
    from pdal_spark.operators.ordered import prefix_sums

    zc = F.col(z).cast("double")
    keys = [F.col(z).asc(), F.col(arrival_col).asc()]
    work = prefix_sums(
        df,
        keys,
        {"_n": F.lit(1.0), "_s1": zc, "_s2": zc * zc, "_s3": zc * zc * zc},
        inclusive=True,
    )

    def skew(n, s1, s2, s3):
        m1 = s1 / n
        m2 = s2 - s1 * s1 / n
        m3 = s3 - 3.0 * m1 * s2 + 2.0 * n * m1 * m1 * m1
        # m2 == 0 -> the reference's 0/0 NaN; NULL here compares the same
        # way (every >/<= test false) and survives ANSI mode
        return F.when(m2 > 0, F.sqrt(n) * m3 / F.pow(m2, 1.5))

    n = F.col("_n")
    cur = skew(n, F.col("_s1"), F.col("_s2"), F.col("_s3"))
    prev = F.when(
        n > 1,
        skew(n - 1, F.col("_s1") - zc, F.col("_s2") - zc * zc,
             F.col("_s3") - zc * zc * zc),
    )
    # crossing: skew > 0 after this point AND <= 0 before it (first row's
    # "before" is NaN in the reference -> no crossing; NULL here -> false)
    flip = (cur > 0) & F.coalesce(prev <= 0, F.lit(False))
    work = work.withColumn("_flip", flip).withColumn("_skew", cur)
    work = work.persist()
    last_flip_row = work.agg(
        F.max(F.when(F.col("_flip"), F.col("_n"))).alias("lf"),
        F.max(F.struct(F.col("_n"), F.col("_skew"))).alias("fin"),
    ).collect()[0]
    last_flip = last_flip_row["lf"]
    final_skew = last_flip_row["fin"]["_skew"]
    base = F.col(class_col) if class_col in df.columns else F.lit(NOT_GROUND)
    if last_flip is None:
        lbl = F.lit(GROUND) if (final_skew is None or final_skew <= 0 or
                                final_skew != final_skew) else F.lit(NOT_GROUND)
        out = work.withColumn(class_col, lbl)
    else:
        out = work.withColumn(
            class_col,
            F.when(F.col("_n") < F.lit(float(last_flip)), F.lit(GROUND))
            .otherwise(F.lit(NOT_GROUND)),
        )
    return out.drop("_n", "_s1", "_s2", "_s3", "_flip", "_skew")

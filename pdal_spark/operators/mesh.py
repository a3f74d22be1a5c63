"""filters.delaunay analog: 2D Delaunay triangulation -> faces table.

Reference: /root/reference/filters/DelaunayFilter.cpp:61-110 (delaunator
over (x, y), triangles attached as mesh "delaunay2d"; < 3 points warns
and yields no mesh). Golden set from
test/unit/filters/DelaunayFilterTest.cpp:49-63 — triangle equality is
up to cyclic rotation with counterclockwise orientation.

Spark-first execution. The mesh is a DataFrame of faces (a, b, c point
ids, CCW, rotated so the smallest id leads). Two modes:

  single  one Arrow kernel over the whole view (the parity mode;
          refuses inputs beyond max_rows_single, like pointcloud.sample)
  tiled   the 100 TB shape: splitter-style tile assign, each point
          duplicated into every tile whose halo-expanded box contains
          it, per-tile Bowyer-Watson via applyInPandas, and a triangle
          is OWNED by the tile containing its circumcenter — emitted
          exactly once. EXACTNESS IS VALIDATED AT RUN TIME (same
          contract as knn.knn_join validate): a locally-Delaunay
          triangle is globally Delaunay iff its circumcircle is empty
          of global points, which is guaranteed when the circumcircle —
          clipped to the global data bbox, points cannot live beyond
          it — fits inside the owning tile's halo box. Any triangle
          violating that raises DelaunayValidationError("increase
          halo"), so a passing run is PROVEN exact, not assumed.

Degenerate inputs (duplicate or exactly-cocircular point sets) are
outside the float64 kernel's contract — the reference's delaunator
makes its own arbitrary choices there too.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DelaunayValidationError(RuntimeError):
    pass


def _circumcircles(P: np.ndarray, T: np.ndarray):
    """(cx, cy, r2) per triangle (vectorized)."""
    a, b, c = P[T[:, 0]], P[T[:, 1]], P[T[:, 2]]
    ab, ac = b - a, c - a
    d = 2.0 * (ab[:, 0] * ac[:, 1] - ab[:, 1] * ac[:, 0])
    d = np.where(d == 0.0, np.finfo(np.float64).tiny, d)
    ab2 = (ab * ab).sum(1)
    ac2 = (ac * ac).sum(1)
    ux = (ac[:, 1] * ab2 - ab[:, 1] * ac2) / d
    uy = (ab[:, 0] * ac2 - ac[:, 0] * ab2) / d
    cx, cy = a[:, 0] + ux, a[:, 1] + uy
    r2 = ux * ux + uy * uy
    return cx, cy, r2


def _incircle_mask(P: np.ndarray, a: np.ndarray, b: np.ndarray,
                   c: np.ndarray) -> np.ndarray:
    """Strictly-inside-circumcircle mask over all rows of P for one CCW
    triangle (a, b, c) — the standard incircle determinant on local
    coordinate differences, numerically robust where comparing d2
    against a huge r2 is pure float noise (near-collinear triples have
    circumradii ~1e15 and every d2/r2 == 1.0 +- eps)."""
    adx, ady = a[0] - P[:, 0], a[1] - P[:, 1]
    bdx, bdy = b[0] - P[:, 0], b[1] - P[:, 1]
    cdx, cdy = c[0] - P[:, 0], c[1] - P[:, 1]
    ad2 = adx * adx + ady * ady
    bd2 = bdx * bdx + bdy * bdy
    cd2 = cdx * cdx + cdy * cdy
    det = (
        adx * (bdy * cd2 - cdy * bd2)
        - ady * (bdx * cd2 - cdx * bd2)
        + ad2 * (bdx * cdy - cdx * bdy)
    )
    return det > 0.0


def _delaunay_np(pts: np.ndarray) -> np.ndarray:
    """Bowyer-Watson over (n, 2) float64 -> (m, 3) int64 faces, CCW,
    rotated so the smallest vertex id leads. Pure numpy, no SciPy.

    The super-triangle must sit outside every circumcircle of the true
    triangulation, and near-collinear hull points make circumradii
    arbitrarily large — so no finite super-triangle is always safe
    (and growing it wrecks float64: measured topology explosion at
    64^3 x span). Instead: run at a numerically comfortable scale —
    every produced face is then genuinely Delaunay, but faces whose
    circumcircle reaches the super-triangle are SUPPRESSED, leaving
    pockets at the hull. Euler gives the exact expected face count
    (2n - 2 - h, h = hull boundary points incl. collinear); the
    missing pocket faces are recovered by brute-force empty-circle
    tests over boundary-edge triples until the count is met."""
    n = len(pts)
    if n < 3:
        return np.empty((0, 3), np.int64)
    h = len(_hull_np(pts))
    want = 2 * n - 2 - h
    T = _bowyer_watson(pts, 64.0)
    if len(T) < want:
        T = _fill_hull_pockets(pts, T, want)
    return T


def _fill_hull_pockets(P: np.ndarray, T: np.ndarray, want: int) -> np.ndarray:
    """Recover super-triangle-suppressed hull faces: repeatedly look at
    boundary edges (edges with exactly one incident face), form triples
    from boundary edges sharing a vertex, and accept any triple whose
    circumcircle is empty of ALL points — by definition a Delaunay face.
    Each acceptance closes part of a pocket; stops at the Euler count."""
    have = {tuple(t) for t in T}
    hull_ids = [int(i) for i in _hull_np(P)]

    def try_add(i: int, j: int, k: int) -> bool:
        if i == j or j == k or i == k:
            return False
        tri = _canonical(P, np.array([[i, j, k]], np.int64))
        key = tuple(tri[0])
        if key in have:
            return False
        a, b, c = P[key[0]], P[key[1]], P[key[2]]
        area2 = (b[0] - a[0]) * (c[1] - a[1]) \
            - (b[1] - a[1]) * (c[0] - a[0])
        if area2 == 0.0:
            return False
        inside = _incircle_mask(P, P[key[0]], P[key[1]], P[key[2]])
        inside[list(key)] = False
        if inside.any():
            return False
        have.add(key)
        return True

    while len(have) < want:
        T = np.array(sorted(have), np.int64)
        e = np.concatenate([T[:, [0, 1]], T[:, [1, 2]], T[:, [2, 0]]])
        ek = np.sort(e, axis=1)
        uniq, counts = np.unique(ek, axis=0, return_counts=True)
        boundary = uniq[counts == 1]
        # third-corner candidates: boundary-edge endpoints + hull points
        # (covers corner pockets whose other two edges are absent hull
        # edges and so produce no shared-vertex pair)
        cand_v = sorted({int(x) for x in boundary.ravel()} | set(hull_ids))
        added = False
        for u, w in boundary:
            for x in cand_v:
                if try_add(int(u), int(w), x):
                    added = True
                    break
            if added:
                break
        if not added:  # degenerate input: best effort
            break
    return np.array(sorted(have), np.int64)


def _bowyer_watson(pts: np.ndarray, scale: float) -> np.ndarray:
    n = len(pts)
    span = float(np.ptp(pts, axis=0).max()) or 1.0
    cx0, cy0 = pts.mean(axis=0)
    m = scale * span + 1.0
    P = np.vstack([
        pts,
        [[cx0 - 2.0 * m, cy0 - m], [cx0 + 2.0 * m, cy0 - m], [cx0, cy0 + 2.0 * m]],
    ]).astype(np.float64)
    T = np.array([[n, n + 1, n + 2]], np.int64)
    cx0s, cy0s, r20s = _circumcircles(P, T)
    # C holds (cx, cy, r2) per live triangle — one array so the per-
    # insertion compaction is a single fancy-index, not three
    C = np.column_stack([cx0s, cy0s, r20s])
    Px, Py = P[:, 0], P[:, 1]
    for i in range(n):
        px, py = P[i]
        dx = C[:, 0] - px
        dy = C[:, 1] - py
        bad = dx * dx + dy * dy < C[:, 2]
        if not bad.any():  # numerically outside everything: skip point
            continue
        good = ~bad
        bad_t = T[bad]
        # cavity boundary = undirected edges appearing exactly once —
        # the cavity is a handful of triangles, so a plain dict count
        # beats numpy's sort-based unique at this size
        cnt: dict[tuple[int, int], int] = {}
        edges = []
        for a_, b_, c_ in bad_t.tolist():
            for u_, v_ in ((a_, b_), (b_, c_), (c_, a_)):
                k_ = (u_, v_) if u_ < v_ else (v_, u_)
                cnt[k_] = cnt.get(k_, 0) + 1
                edges.append((u_, v_, k_))
        boundary = np.array(
            [(u_, v_) for u_, v_, k_ in edges if cnt[k_] == 1], np.int64
        ).reshape(-1, 2)
        m = len(boundary)
        new_t = np.column_stack([boundary, np.full(m, i, np.int64)])
        # inline circumcircles of the few new triangles (local coords)
        ax, ay = Px[boundary[:, 0]], Py[boundary[:, 0]]
        abx = Px[boundary[:, 1]] - ax
        aby = Py[boundary[:, 1]] - ay
        acx, acy = px - ax, py - ay
        d = 2.0 * (abx * acy - aby * acx)
        d[d == 0.0] = np.finfo(np.float64).tiny
        ab2 = abx * abx + aby * aby
        ac2 = acx * acx + acy * acy
        ux = (acy * ab2 - aby * ac2) / d
        uy = (abx * ac2 - acx * ab2) / d
        newC = np.column_stack([ax + ux, ay + uy, ux * ux + uy * uy])
        T = np.vstack([T[good], new_t])
        C = np.vstack([C[good], newC])
    T = T[(T < n).all(axis=1)]
    return _canonical(P, T)


def _canonical(P: np.ndarray, T: np.ndarray) -> np.ndarray:
    """CCW orientation, then rotate so the smallest id is first."""
    if len(T) == 0:
        return T.reshape(0, 3)
    a, b, c = P[T[:, 0]], P[T[:, 1]], P[T[:, 2]]
    cw = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) \
        - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]) < 0
    T = T.copy()
    T[cw] = T[cw][:, [0, 2, 1]]
    roll = T.argmin(axis=1)
    out = np.empty_like(T)
    for r in (0, 1, 2):
        sel = roll == r
        out[sel] = np.roll(T[sel], -r, axis=1)
    return out


def _hull_np(P: np.ndarray) -> np.ndarray:
    """Indices of the convex hull BOUNDARY points of (n, 2) P — Andrew
    monotone chain KEEPING collinear boundary points (they are
    triangulation vertices, and the 2n-2-h face-count identity counts
    them in h)."""
    n = len(P)
    if n == 0:
        return np.empty(0, np.int64)
    order = np.lexsort((P[:, 1], P[:, 0]))
    Ps = P[order]
    keep = np.ones(len(order), bool)
    keep[1:] = (np.diff(Ps, axis=0) != 0).any(axis=1)
    order = order[keep]
    if len(order) <= 2:
        return order.astype(np.int64)

    def half(idxs):
        out: list[int] = []
        for i in idxs:
            while len(out) >= 2:
                o1, o2 = out[-2], out[-1]
                cr = (P[o2, 0] - P[o1, 0]) * (P[i, 1] - P[o1, 1]) \
                    - (P[o2, 1] - P[o1, 1]) * (P[i, 0] - P[o1, 0])
                if cr < 0:
                    out.pop()
                else:
                    break
            out.append(int(i))
        return out

    lower = half(order)
    upper = half(order[::-1])
    return np.array(lower[:-1] + upper[:-1], np.int64)


def _hull_points(pts: DataFrame) -> list[tuple[int, tuple[float, float]]]:
    """(pid, (x, y)) of the global convex hull boundary: per-partition
    monotone chain, tiny candidate set to the driver, final chain
    there (hull of a union == hull of the union of subset hulls)."""

    def part_hull(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            idx = _hull_np(pdf[["px", "py"]].to_numpy(np.float64))
            yield pdf.iloc[idx][["pid", "px", "py"]]

    cand = pts.mapInPandas(part_hull, "pid long, px double, py double").collect()
    if not cand:
        return []
    ids = np.array([r.pid for r in cand], np.int64)
    P = np.array([[r.px, r.py] for r in cand], np.float64)
    idx = _hull_np(P)
    return [(int(ids[i]), (float(P[i, 0]), float(P[i, 1]))) for i in idx]


def delaunay(
    df: DataFrame,
    x: str = "x",
    y: str = "y",
    id_col: str = "page_id",
    mode: str = "single",
    tile_len: float | None = None,
    halo: float | None = None,
    origin: tuple[float, float] = (0.0, 0.0),
    validate: bool = True,
    max_rows_single: int = 200_000,
) -> DataFrame:
    """Faces (a, b, c) of the 2D Delaunay triangulation, ids = id_col.

    mode="single": whole view through one kernel (parity mode).
    mode="tiled": per-tile kernels with halo-duplicated points; triangle
    owned by its circumcenter's tile; validate proves exactness.
    """
    spark = df.sparkSession
    pts = df.select(
        F.col(id_col).cast("long").alias("pid"),
        F.col(x).cast("double").alias("px"),
        F.col(y).cast("double").alias("py"),
    )
    schema = "a long, b long, c long"
    if mode == "single":
        n = pts.count()
        if n > max_rows_single:
            raise ValueError(
                f"single-kernel delaunay refused for {n} rows "
                f"(> {max_rows_single}); use mode='tiled'"
            )

        def tri_all(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("pid").reset_index(drop=True)
            T = _delaunay_np(pdf[["px", "py"]].to_numpy(np.float64))
            ids = pdf["pid"].to_numpy(np.int64)
            return pd.DataFrame({"a": ids[T[:, 0]], "b": ids[T[:, 1]],
                                 "c": ids[T[:, 2]]})

        return (
            pts.withColumn("_g", F.lit(0))
            .groupBy("_g")
            .applyInPandas(lambda _, pdf: tri_all(pdf), schema=schema)
        )

    if tile_len is None or halo is None:
        raise ValueError("mode='tiled' requires tile_len and halo")
    ox, oy = origin
    bb = pts.agg(
        F.min("px").alias("minx"), F.max("px").alias("maxx"),
        F.min("py").alias("miny"), F.max("py").alias("maxy"),
    ).collect()[0]
    ring = int(np.ceil(halo / tile_len))
    tx = F.floor((F.col("px") - ox) / tile_len).cast("long")
    ty = F.floor((F.col("py") - oy) / tile_len).cast("long")
    offs = [(dx, dy) for dx in range(-ring, ring + 1)
            for dy in range(-ring, ring + 1)]
    off_df = spark.createDataFrame(offs, "dx long, dy long")
    # point -> every tile whose halo box contains it
    cand = (
        pts.withColumn("tx", tx).withColumn("ty", ty)
        .crossJoin(F.broadcast(off_df))
        .withColumn("gx", F.col("tx") + F.col("dx"))
        .withColumn("gy", F.col("ty") + F.col("dy"))
        .filter(
            (F.col("px") >= (F.col("gx") * tile_len + ox - halo))
            & (F.col("px") < (F.col("gx") * tile_len + ox + tile_len + halo))
            & (F.col("py") >= (F.col("gy") * tile_len + oy - halo))
            & (F.col("py") < (F.col("gy") * tile_len + oy + tile_len + halo))
        )
        .select("gx", "gy", "pid", "px", "py")
    )
    gminx, gmaxx = float(bb.minx), float(bb.maxx)
    gminy, gmaxy = float(bb.miny), float(bb.maxy)
    tl, hl = float(tile_len), float(halo)

    def tri_tile(key, pdf: pd.DataFrame) -> pd.DataFrame:
        gx, gy = int(key[0]), int(key[1])
        pdf = pdf.sort_values("pid").reset_index(drop=True)
        P = pdf[["px", "py"]].to_numpy(np.float64)
        T = _delaunay_np(P)
        empty = pd.DataFrame(
            {"a": [], "b": [], "c": [], "owned": [], "proven": []}
        ).astype({"a": np.int64, "b": np.int64, "c": np.int64,
                  "owned": bool, "proven": bool})
        if len(T) == 0:
            return empty
        ccx, ccy, r2 = _circumcircles(P, T)
        r = np.sqrt(r2)
        x0, y0 = gx * tl + ox, gy * tl + oy
        # ownership: circumcenter CLAMPED to the global data bbox (hull
        # faces park far-outside centers on the boundary) falls in this
        # tile. proven <=> the circumcircle clipped to the bbox (no
        # points exist beyond it) fits the halo box: local emptiness
        # then implies global emptiness. owned & proven faces are final;
        # everything else is emitted as a CANDIDATE for the global
        # verification pass — including faces this tile does NOT own,
        # because the owner tile may not even see all their vertices.
        ocx = np.clip(ccx, gminx, gmaxx)
        ocy = np.clip(ccy, gminy, gmaxy)
        owned = (ocx >= x0) & (ocx < x0 + tl) & (ocy >= y0) & (ocy < y0 + tl)
        lo_x = np.maximum(ccx - r, gminx)
        hi_x = np.minimum(ccx + r, gmaxx)
        lo_y = np.maximum(ccy - r, gminy)
        hi_y = np.minimum(ccy + r, gmaxy)
        proven = (
            (lo_x >= x0 - hl) & (hi_x <= x0 + tl + hl)
            & (lo_y >= y0 - hl) & (hi_y <= y0 + tl + hl)
        )
        keep = owned | ~proven
        T, owned, proven = T[keep], owned[keep], proven[keep]
        ids = pdf["pid"].to_numpy(np.int64)
        return pd.DataFrame({"a": ids[T[:, 0]], "b": ids[T[:, 1]],
                             "c": ids[T[:, 2]], "owned": owned,
                             "proven": proven})

    tagged = (
        cand.groupBy("gx", "gy")
        .applyInPandas(tri_tile, schema=schema + ", owned boolean, proven boolean")
        .persist()
    )
    interior = tagged.filter("owned AND proven").select("a", "b", "c")

    # ---- hull-band completion --------------------------------------
    # Candidate faces that could not be locally proven come from two
    # sources: (1) faces some tile produced without proof (their empty
    # circle is non-local), (2) DT over the small point set U = vertices
    # of those faces + the global hull boundary (faces no tile ever saw
    # whole have their vertices in U). Every candidate is then VERIFIED
    # against the full distributed point set — an empty circumcircle IS
    # the definition of globally Delaunay — and the final Euler count
    # (2n - 2 - h) certifies joint completeness. Exact or raise, never
    # a silent approximation.
    #
    # Only the hull BAND ever reaches the driver: interior faces are
    # O(n) and stay distributed (the dedup against them is an anti-join
    # here and a band-restricted semi-join collect below), so driver
    # memory is bounded by the band size, not the triangulation.
    unproven = {
        (r.a, r.b, r.c)
        for r in tagged.filter("NOT proven").select("a", "b", "c")
        .distinct()
        .join(interior, ["a", "b", "c"], "left_anti")
        .collect()
    }
    hull_rows = _hull_points(pts)
    band_ids = {i for f in unproven for i in f} | {pid for pid, _ in hull_rows}
    if len(band_ids) > max_rows_single:
        raise DelaunayValidationError(
            f"hull-band completion set has {len(band_ids)} points "
            f"(> {max_rows_single}); increase halo or use mode='single'"
        )
    cand_keys = set(unproven)
    upts: dict[int, tuple[float, float]] = {}
    if band_ids:
        bid_df = spark.createDataFrame(
            [(int(i),) for i in band_ids], "pid long"
        )
        for r in bid_df.join(pts, "pid").collect():
            upts[int(r.pid)] = (float(r.px), float(r.py))
        uid = np.array(sorted(upts), np.int64)
        UP = np.array([upts[i] for i in uid], np.float64)
        if len(uid) >= 3:
            # interior faces fully inside the band id set — the only
            # interior faces the band DT can re-derive
            band_interior = interior
            for col in ("a", "b", "c"):
                band_interior = band_interior.join(
                    F.broadcast(bid_df.withColumnRenamed("pid", col)),
                    col, "left_semi",
                )
            interior_band_keys = {
                (r.a, r.b, r.c) for r in band_interior.collect()
            }
            for t in _delaunay_np(UP):
                key2 = (int(uid[t[0]]), int(uid[t[1]]), int(uid[t[2]]))
                if key2 not in interior_band_keys:
                    cand_keys.add(key2)
    verified: list[tuple[int, int, int]] = []
    if cand_keys:
        faces_l = sorted(cand_keys)
        # coords for circumcircles: candidate vertices are in upts by
        # construction (unproven-face vertices and hull pts are all in
        # band_ids)
        cc = spark.createDataFrame(
            [
                (a, b, c, *upts[a], *upts[b], *upts[c])
                for a, b, c in faces_l
            ],
            "a long, b long, c long, ax double, ay double, "
            "bx double, by double, cx double, cy double",
        )
        # robust incircle determinant (see _incircle_mask) as pure
        # column math; candidates are CCW by _canonical
        adx, ady = F.col("ax") - F.col("px"), F.col("ay") - F.col("py")
        bdx, bdy = F.col("bx") - F.col("px"), F.col("by") - F.col("py")
        cdx, cdy = F.col("cx") - F.col("px"), F.col("cy") - F.col("py")
        ad2 = adx * adx + ady * ady
        bd2 = bdx * bdx + bdy * bdy
        cd2 = cdx * cdx + cdy * cdy
        det = (
            adx * (bdy * cd2 - cdy * bd2)
            - ady * (bdx * cd2 - cdx * bd2)
            + ad2 * (bdx * cdy - cdx * bdy)
        )
        viol = (
            pts.crossJoin(F.broadcast(cc))
            .filter(
                (F.col("pid") != F.col("a"))
                & (F.col("pid") != F.col("b"))
                & (F.col("pid") != F.col("c"))
            )
            .filter(det > 0.0)
            .select("a", "b", "c")
            .distinct()
            .collect()
        )
        bad_keys = {(r.a, r.b, r.c) for r in viol}
        verified = [f for f in faces_l if f not in bad_keys]
    band_faces = spark.createDataFrame(verified, schema)
    faces = interior.unionByName(band_faces).persist()
    if validate:
        nf = faces.count()
        n = pts.count()
        h = len(hull_rows)
        if nf != 2 * n - 2 - h:
            raise DelaunayValidationError(
                f"face count {nf} != 2n-2-h = {2 * n - 2 - h} "
                f"(n={n}, hull={h}); increase halo"
            )
    return faces


def hag_delaunay(
    df: DataFrame,
    tile_len: float,
    halo: float,
    origin: tuple[float, float] = (0.0, 0.0),
    x: str = "x",
    y: str = "y",
    z: str = "z",
    classification: str = "classification",
    ground_class: int = 2,
    id_col: str = "page_id",
    nn_cell: float | None = None,
) -> DataFrame:
    """filters.hag delaunay mode (HAGFilter.cpp:102-146, 294-296):
    HeightAboveGround = z - TIN-interpolated ground z; ground points get
    HAG = 0 (HAGFilter.cpp:240); points outside the ground TIN fall back
    to the nearest ground point's z (HAGFilter.cpp:143-146).

    The reference triangulates each point's local k-neighbor fan (its
    own comment calls it a "locally-computed surface"); the Spark-first
    shape computes the GLOBAL ground TIN once (tiled delaunay above) and
    barycentric-interpolates in pure codegen column math: faces explode
    to the tiles their bbox overlaps, points bucket by tile, the
    containing face is found by sign tests, z by barycentric weights.
    Deterministic: if a point sits on a shared edge both planes agree
    analytically; min(face) is used so the float result is stable too.
    """
    spark = df.sparkSession
    ox, oy = origin
    ground = df.filter(F.col(classification) == ground_class)
    non_ground = df.filter(F.col(classification) != ground_class)
    gpts = ground.select(
        F.col(id_col).alias("gid"), F.col(x).alias("gx"),
        F.col(y).alias("gy"), F.col(z).alias("gz"),
    ).persist()
    faces = delaunay(
        ground, x=x, y=y, id_col=id_col, mode="tiled",
        tile_len=tile_len, halo=halo, origin=origin,
    )
    v = lambda n: gpts.select(  # noqa: E731
        F.col("gid").alias(n),
        F.col("gx").alias(f"{n}x"), F.col("gy").alias(f"{n}y"),
        F.col("gz").alias(f"{n}z"),
    )
    fc = (
        faces.join(v("a"), "a").join(v("b"), "b").join(v("c"), "c")
    )
    # face -> every tile its bbox overlaps (faces are halo-bounded so
    # the overlap ring is small); point -> its tile; equi-join on tile
    fminx = F.least("ax", "bx", "cx")
    fmaxx = F.greatest("ax", "bx", "cx")
    fminy = F.least("ay", "by", "cy")
    fmaxy = F.greatest("ay", "by", "cy")
    tx0 = F.floor((fminx - ox) / tile_len).cast("long")
    tx1 = F.floor((fmaxx - ox) / tile_len).cast("long")
    ty0 = F.floor((fminy - oy) / tile_len).cast("long")
    ty1 = F.floor((fmaxy - oy) / tile_len).cast("long")
    f_tiled = (
        fc.withColumn("gxs", F.sequence(tx0, tx1))
        .withColumn("gys", F.sequence(ty0, ty1))
        .withColumn("tgx", F.explode("gxs"))
        .withColumn("tgy", F.explode("gys"))
        .drop("gxs", "gys")
    )
    p = non_ground.select(
        F.col(id_col).alias("pid"), F.col(x).alias("px"),
        F.col(y).alias("py"), F.col(z).alias("pz"),
    ).withColumn(
        "tgx", F.floor((F.col("px") - ox) / tile_len).cast("long")
    ).withColumn(
        "tgy", F.floor((F.col("py") - oy) / tile_len).cast("long")
    )
    det = (F.col("bx") - F.col("ax")) * (F.col("cy") - F.col("ay")) \
        - (F.col("by") - F.col("ay")) * (F.col("cx") - F.col("ax"))
    l2 = (
        (F.col("px") - F.col("ax")) * (F.col("cy") - F.col("ay"))
        - (F.col("py") - F.col("ay")) * (F.col("cx") - F.col("ax"))
    ) / det
    l3 = (
        (F.col("bx") - F.col("ax")) * (F.col("py") - F.col("ay"))
        - (F.col("by") - F.col("ay")) * (F.col("px") - F.col("ax"))
    ) / det
    l1 = F.lit(1.0) - l2 - l3
    hit = (
        p.join(f_tiled, ["tgx", "tgy"])
        .withColumn("_l1", l1).withColumn("_l2", l2).withColumn("_l3", l3)
        .filter(
            (F.col("_l1") >= 0) & (F.col("_l2") >= 0) & (F.col("_l3") >= 0)
        )
        .withColumn(
            "_gz",
            F.col("_l1") * F.col("az") + F.col("_l2") * F.col("bz")
            + F.col("_l3") * F.col("cz"),
        )
        .groupBy("pid")
        .agg(
            F.min_by(
                F.col("_gz"), F.struct("a", "b", "c")
            ).alias("_ground_z")
        )
    )
    # outside-TIN fallback: nearest ground point's z (HAGFilter.cpp:146).
    # Outside-hull points are few (hull fringe) but can be arbitrarily
    # far from any ground point, so no bucketed ring search is safe —
    # broadcast the small missed side across one streaming pass of the
    # ground table (min_by with a gid tiebreak keeps it deterministic).
    missed = p.join(hit, "pid", "left_anti").select("pid", "px", "py")
    d2 = (F.col("gx") - F.col("px")) * (F.col("gx") - F.col("px")) \
        + (F.col("gy") - F.col("py")) * (F.col("gy") - F.col("py"))
    fb = (
        gpts.crossJoin(F.broadcast(missed))
        .groupBy("pid")
        .agg(
            F.min_by(F.col("gz"), F.struct(d2.alias("d2"), F.col("gid")))
            .alias("_ground_z")
        )
    )
    ground_z = hit.unionByName(fb)
    out_ng = (
        non_ground.join(
            ground_z.withColumnRenamed("pid", id_col), id_col
        )
        .withColumn("height_above_ground", F.col(z) - F.col("_ground_z"))
        .drop("_ground_z")
    )
    out_g = ground.withColumn("height_above_ground", F.lit(0.0))
    return out_ng.unionByName(out_g)

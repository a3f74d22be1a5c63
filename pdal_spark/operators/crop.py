"""filters.crop — keep points inside (or outside) boxes / circles / polygons.

Reference semantics (/root/reference/filters/CropFilter.cpp):
  * box:    inclusive contains, `cropOutside != contains` (252-258;
            Bounds.hpp:122 `minx <= x && x <= maxx && ...`)
  * circle: bbox pre-reject on |dx|,|dy|(,|dz|) > d, then strict
            `x²+y²(+z²) < d²` (295-318)
  * polygon: exact point-in-polygon; reference accelerates with a grid
            (GridPnp.hpp:60-80) — our scale path is a coarse-cell
            prefilter with the exact even-odd ray cast vectorized in
            numpy over Arrow batches
  * batch mode emits ONE VIEW PER GEOMETRY (221-248) → `geom_id` column
  * stream mode ORs all geometries (146-162) → `crop_any`

Scale notes: geometry lists are small and broadcast (Spark literal
arrays / broadcast join); box & circle predicates stay entirely in
WholeStageCodegen. Polygon tests only leave the JVM for points whose
coarse cell straddles a polygon boundary.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Box:
    minx: float
    miny: float
    maxx: float
    maxy: float
    minz: float | None = None
    maxz: float | None = None


@dataclass(frozen=True)
class Circle:
    x: float
    y: float
    distance: float
    z: float | None = None


@dataclass(frozen=True)
class Polygon:
    """Single exterior ring + optional holes, each [(x, y), ...] closed or open."""

    exterior: tuple[tuple[float, float], ...]
    holes: tuple[tuple[tuple[float, float], ...], ...] = field(default_factory=tuple)

    def rings(self):
        return (self.exterior, *self.holes)

    def bbox(self) -> Box:
        xs = [p[0] for p in self.exterior]
        ys = [p[1] for p in self.exterior]
        return Box(min(xs), min(ys), max(xs), max(ys))


def box_contains(b: Box, x: Column, y: Column, z: Column | None = None) -> Column:
    c = (
        (F.lit(b.minx) <= x) & (x <= F.lit(b.maxx))
        & (F.lit(b.miny) <= y) & (y <= F.lit(b.maxy))
    )
    if b.minz is not None and z is not None:
        c = c & (F.lit(b.minz) <= z) & (z <= F.lit(b.maxz))
    return c


def circle_contains(c: Circle, x: Column, y: Column, z: Column | None = None) -> Column:
    dx, dy = F.abs(x - F.lit(c.x)), F.abs(y - F.lit(c.y))
    pre = (dx <= F.lit(c.distance)) & (dy <= F.lit(c.distance))
    d2 = F.lit(c.distance * c.distance)
    if c.z is not None and z is not None:
        dz = F.abs(z - F.lit(c.z))
        return pre & (dz <= F.lit(c.distance)) & (dx * dx + dy * dy + dz * dz < d2)
    return pre & (dx * dx + dy * dy < d2)


def box_contains_sql(b: Box, x: str = "x", y: str = "y") -> str:
    return (
        f"({b.minx!r} <= {x} AND {x} <= {b.maxx!r} "
        f"AND {b.miny!r} <= {y} AND {y} <= {b.maxy!r})"
    )


def circle_contains_sql(c: Circle, x: str = "x", y: str = "y") -> str:
    return (
        f"(abs({x} - {c.x!r}) <= {c.distance!r} AND abs({y} - {c.y!r}) <= {c.distance!r} "
        f"AND (abs({x} - {c.x!r}) * abs({x} - {c.x!r})"
        f" + abs({y} - {c.y!r}) * abs({y} - {c.y!r})) < {c.distance * c.distance!r})"
    )


# ---------------------------------------------------------------------------
# WKT parsing (POLYGON / MULTIPOLYGON)
# ---------------------------------------------------------------------------


def _split_depth0(s: str) -> list[str]:
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts]


def _wkt_ring(s: str) -> tuple:
    s = s.strip()
    if not (s.startswith("(") and s.endswith(")")):
        raise ValueError(f"bad WKT ring: {s[:40]!r}")
    pts = []
    for tok in s[1:-1].split(","):
        c = tok.split()
        pts.append((float(c[0]), float(c[1])))  # Z (if any) ignored — 2-D crop
    return tuple(pts)


def _wkt_poly(body: str) -> Polygon:
    rings = [_wkt_ring(r) for r in _split_depth0(body)]
    return Polygon(exterior=rings[0], holes=tuple(rings[1:]))


def parse_wkt_polygons(wkt: str) -> list[Polygon]:
    """Minimal WKT parser: POLYGON / MULTIPOLYGON, 2-D or 3-D
    coordinates (Z dropped — the reference's polygon crop is 2-D:
    CropFilter / EptReader passesPolyFilter both test (x, y) only)."""
    s = wkt.strip()
    u = s.upper()
    if "(" not in s or not s.endswith(")"):
        raise ValueError(f"bad WKT: {s[:60]!r}")
    body = s[s.index("(") + 1:len(s) - 1]
    if u.startswith("MULTIPOLYGON"):
        out = []
        for g in _split_depth0(body):
            g = g.strip()
            if not (g.startswith("(") and g.endswith(")")):
                raise ValueError(f"bad WKT polygon group: {g[:40]!r}")
            out.append(_wkt_poly(g[1:-1]))
        return out
    if u.startswith("POLYGON"):
        return [_wkt_poly(body)]
    raise ValueError(f"unsupported WKT geometry: {s[:30]!r}")


# ---------------------------------------------------------------------------
# Exact point-in-polygon: vectorized even-odd ray cast (numpy).
# ---------------------------------------------------------------------------


def pnp_even_odd_np(px: np.ndarray, py: np.ndarray, poly: Polygon) -> np.ndarray:
    """Even-odd (crossing-number) test over all rings; holes flip parity.

    Same decision procedure as the reference's GridPnp ray cast
    (filters/private/pnp/GridPnp.hpp:60-80), vectorized: for each edge
    (x1,y1)->(x2,y2), a rightward ray from p crosses iff
    (y1 > py) != (y2 > py) and px < x-at-py on the edge.
    """
    inside = np.zeros(len(px), dtype=bool)
    for ring in poly.rings():
        pts = list(ring)
        if pts[0] == pts[-1]:
            pts = pts[:-1]
        n = len(pts)
        for i in range(n):
            x1, y1 = pts[i]
            x2, y2 = pts[(i + 1) % n]
            crosses = (y1 > py) != (y2 > py)
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
            inside ^= crosses & (px < xint)
    return inside


def polygon_pnp_sql(poly: Polygon, x: str = "x", y: str = "y") -> str:
    """ANSI-SQL even-odd test (edge-by-edge XOR as sum-of-crossings % 2)."""
    terms = []
    for ring in poly.rings():
        pts = list(ring)
        if pts[0] == pts[-1]:
            pts = pts[:-1]
        n = len(pts)
        for i in range(n):
            x1, y1 = pts[i]
            x2, y2 = pts[(i + 1) % n]
            terms.append(
                f"(CASE WHEN (({y1!r} > {y}) <> ({y2!r} > {y})) AND "
                f"({x} < ({x2!r} - {x1!r}) * ({y} - {y1!r}) / ({y2!r} - {y1!r}) + {x1!r}) "
                f"THEN 1 ELSE 0 END)"
            )
    return f"((({' + '.join(terms)}) % 2) = 1)"


def polygon_contains_col(poly: Polygon, x: Column, y: Column) -> Column:
    """Exact even-odd PnP as a pure Column expression (JVM, codegen'd).

    Unrolls the crossing-number sum over every edge — identical decision
    procedure to pnp_even_odd_np / polygon_pnp_sql. For the typical crop
    polygon (tens to a few hundred vertices) this stays entirely inside
    WholeStageCodegen: no Arrow round-trip, no Python, columns untouched.
    The bbox prefilter short-circuits the edge sum for most rows.
    """
    b = poly.bbox()
    crossings: Column | None = None
    for ring in poly.rings():
        pts = list(ring)
        if pts[0] == pts[-1]:
            pts = pts[:-1]
        n = len(pts)
        for i in range(n):
            x1, y1 = pts[i]
            x2, y2 = pts[(i + 1) % n]
            if y1 == y2:
                # horizontal edge: (y1 > py) != (y2 > py) is identically
                # false — contributes no crossing, so skip it at build
                # time (also keeps identical-AST noise out of the plan)
                continue
            crosses = (F.lit(y1) > y) != (F.lit(y2) > y)
            xint = (
                F.lit(x2 - x1) * (y - F.lit(y1)) / F.lit(y2 - y1) + F.lit(x1)
            )
            term = F.when(crosses & (x < xint), F.lit(1)).otherwise(F.lit(0))
            crossings = term if crossings is None else crossings + term
    assert crossings is not None
    return box_contains(b, x, y) & ((crossings % 2) == 1)


# Above this many total edges, the unrolled codegen expression gets large;
# fall back to the Arrow/numpy kernel (which scales to arbitrary rings).
_EXPR_EDGE_LIMIT = 512


def _poly_edge_count(poly: Polygon) -> int:
    return sum(len(r) for r in poly.rings())


def polygon_contains(
    df: DataFrame, poly: Polygon, x: str = "x", y: str = "y", out: str = "_inside"
) -> DataFrame:
    """Add a boolean `out` column: exact PnP, vectorized over Arrow batches.

    Cheap bbox prefilter stays in codegen; only candidate rows run the
    numpy kernel. The polygon is captured in the closure (broadcast with
    the task — tiny) — the reference likewise grid-indexes the polygon
    per thread (CropFilter.cpp:183-190).
    """
    b = poly.bbox()
    pre = box_contains(b, F.col(x), F.col(y))

    def kernel(it):
        for pdf in it:
            res = np.zeros(len(pdf), dtype=bool)
            cand = pdf["_pre"].to_numpy(dtype=bool)
            if cand.any():
                res[cand] = pnp_even_odd_np(
                    pdf.loc[cand, x].to_numpy(np.float64),
                    pdf.loc[cand, y].to_numpy(np.float64),
                    poly,
                )
            yield pdf.drop(columns=["_pre"]).assign(**{out: res})

    staged = df.withColumn("_pre", pre)
    schema = staged.drop("_pre").schema.add(out, "boolean")
    return staged.mapInPandas(kernel, schema=schema)


# ---------------------------------------------------------------------------
# The operator
# ---------------------------------------------------------------------------

Geometry = Box | Circle | Polygon


def crop(
    df: DataFrame,
    geometries: list[Geometry],
    outside: bool = False,
    mode: str = "batch",
    x: str = "x",
    y: str = "y",
    z: str | None = None,
) -> DataFrame:
    """Crop `df` to the given geometries.

    mode="batch"  -> one output view per geometry: result carries `geom_id`
                     (CropFilter.cpp:221-248; a point inside k geometries
                     appears k times, under k geom_ids).
    mode="stream" -> OR of all geometries, no duplication, no geom_id
                     (CropFilter.cpp:146-162).
    """
    if not geometries:
        raise ValueError("crop requires at least one geometry")
    if mode not in ("batch", "stream"):
        raise ValueError(f"mode must be 'batch' or 'stream', got {mode!r}")
    zc = F.col(z) if z else None

    def contains(g: Geometry) -> Column:
        if isinstance(g, Box):
            return box_contains(g, F.col(x), F.col(y), zc)
        if isinstance(g, Circle):
            return circle_contains(g, F.col(x), F.col(y), zc)
        raise TypeError(g)

    polys = [(i, g) for i, g in enumerate(geometries) if isinstance(g, Polygon)]
    simple = [(i, g) for i, g in enumerate(geometries) if not isinstance(g, Polygon)]

    work = df
    flags: list[tuple[int, Column]] = []
    for i, g in simple:
        flags.append((i, contains(g)))
    for i, g in polys:
        if _poly_edge_count(g) <= _EXPR_EDGE_LIMIT:
            # fast path: pure column expression, stays in codegen
            flags.append((i, polygon_contains_col(g, F.col(x), F.col(y))))
            continue
        col = f"_pnp_{i}"
        work = polygon_contains(work, g, x=x, y=y, out=col)
        flags.append((i, F.col(col)))
    flags.sort(key=lambda t: t[0])

    keep = [(i, (~c if outside else c)) for i, c in flags]
    drop_tmp = [f"_pnp_{i}" for i, _ in polys]

    if mode == "stream":
        cond = keep[0][1]
        for _, c in keep[1:]:
            cond = cond | c
        return work.filter(cond).drop(*drop_tmp)

    # batch: tag each row with the array of geom_ids that keep it, explode.
    tags = F.array(
        *[F.when(c, F.lit(i)).otherwise(F.lit(None)) for i, c in keep]
    )
    return (
        work.withColumn("geom_id", F.explode(F.filter(tags, lambda v: v.isNotNull())))
        .drop(*drop_tmp)
    )


def hexagon_ring(cx: float, cy: float, r: float) -> Polygon:
    """Regular hexagon helper for tests (CropFilterTest uses WKT fixtures)."""
    pts = tuple(
        (cx + r * math.cos(math.pi / 3 * k), cy + r * math.sin(math.pi / 3 * k))
        for k in range(6)
    )
    return Polygon(exterior=pts)

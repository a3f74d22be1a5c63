"""Deterministic geocoding + spatial cell math (Column exprs and numpy twins).

Every function here exists in two forms where parity testing needs it:
a Spark ``Column`` expression (JVM-side, codegen'd, the production path)
and a numpy implementation (the slow obviously-correct oracle used by
tests, mirroring the reference's stream-vs-standard dual-run pattern).

Reference semantics matched:
  * splitter tile assignment — int-cast-then-decrement floor and strict
    buffer inequalities per /root/reference/filters/SplitterFilter.cpp:129-178
  * hexbin cell addressing — offset-rectangle + mini-column slope
    correction per /root/reference/filters/private/hexer/HexGrid.cpp:181-260
    with C++ truncated-division ``%``/``(int)`` semantics
  * raster cell indexing — truncating index, y-flipped rows per
    /root/reference/io/private/GDALGrid.hpp:120-127
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

SQRT_3 = math.sqrt(3.0)
# The reference hexer library uses a TRUNCATED root-3 constant for the grid
# width (HexGrid.hpp:53 `static const double SQRT_3 = 1.732050808`) while
# HexBinFilter computes height with the exact sqrt(3) (HexBinFilter.cpp:100).
# Bit-parity on cell assignment requires replicating both choices exactly
# (verified against a compiled build of the reference hexer sources).
SQRT_3_HEXER = 1.732050808

# ---------------------------------------------------------------------------
# Geocoding: deterministic (key -> lon/lat). Two flavors:
#   * LCG over an integer id — expressible in pure SQL (Spark AND DuckDB),
#     used for oracle-checked queries over the shared test tables.
#   * SHA-256 over (url, warc_ts) — the pages-table geocode from the north
#     star; 52-bit mantissa slices so the double is exact everywhere.
# ---------------------------------------------------------------------------

# Two multiply-mod rounds: one round leaves small ids unmixed (id*a < 2^31
# never wraps), two rounds distribute uniformly. All intermediates < 2^63,
# so plain BIGINT arithmetic — identical in Spark, DuckDB, and numpy.
_HX = (2654435761, 12345, 48271, 11)
_HY = (2246822519, 101, 69621, 7)
_LCG_M = 2147483648  # 2^31


def _mix(id_col: Column, p: tuple[int, int, int, int]) -> Column:
    a1, c1, a2, c2 = p
    h = (id_col * F.lit(a1) + F.lit(c1)) % F.lit(_LCG_M)
    return (h * F.lit(a2) + F.lit(c2)) % F.lit(_LCG_M)


def geocode_lcg_x(id_col: Column) -> Column:
    """x/lon in [-180, 180) from an int64 id; exact in float64."""
    h = _mix(id_col, _HX)
    return (h.cast("double") / F.lit(float(_LCG_M))) * F.lit(360.0) - F.lit(180.0)


def geocode_lcg_y(id_col: Column) -> Column:
    """y/lat in [-90, 90) from an int64 id; exact in float64."""
    h = _mix(id_col, _HY)
    return (h.cast("double") / F.lit(float(_LCG_M))) * F.lit(180.0) - F.lit(90.0)


def _mix_sql(id_expr: str, p: tuple[int, int, int, int]) -> str:
    a1, c1, a2, c2 = p
    return f"((({id_expr} * {a1} + {c1}) % {_LCG_M}) * {a2} + {c2}) % {_LCG_M}"


def geocode_lcg_sql(id_expr: str) -> tuple[str, str]:
    """ANSI-SQL twins of geocode_lcg_{x,y} (DuckDB-compatible)."""
    x = f"(({_mix_sql(id_expr, _HX)}) / {float(_LCG_M)!r}) * 360.0 - 180.0"
    y = f"(({_mix_sql(id_expr, _HY)}) / {float(_LCG_M)!r}) * 180.0 - 90.0"
    return x, y


def geocode_lcg_np(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ids = ids.astype(np.int64)
    hx = ((ids * _HX[0] + _HX[1]) % _LCG_M * _HX[2] + _HX[3]) % _LCG_M
    hy = ((ids * _HY[0] + _HY[1]) % _LCG_M * _HY[2] + _HY[3]) % _LCG_M
    return (hx / _LCG_M) * 360.0 - 180.0, (hy / _LCG_M) * 180.0 - 90.0


_POW52 = float(1 << 52)


def geocode_sha2_x(url: Column, warc_ts: Column) -> Column:
    """lon from sha256(url|iso-ts): first 13 hex chars (52 bits, exact)."""
    h = F.sha2(
        F.concat(url, F.lit("|"), F.date_format(warc_ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")),
        256,
    )
    v = F.conv(F.substring(h, 1, 13), 16, 10).cast("double")
    return (v / F.lit(_POW52)) * F.lit(360.0) - F.lit(180.0)


def geocode_sha2_y(url: Column, warc_ts: Column) -> Column:
    """lat from sha256(url|iso-ts): hex chars 14..26 (52 bits, exact)."""
    h = F.sha2(
        F.concat(url, F.lit("|"), F.date_format(warc_ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")),
        256,
    )
    v = F.conv(F.substring(h, 14, 13), 16, 10).cast("double")
    return (v / F.lit(_POW52)) * F.lit(180.0) - F.lit(90.0)


def geocode_sha2_py(url: str, warc_ts_iso: str) -> tuple[float, float]:
    """Python oracle for geocode_sha2_{x,y}. ``warc_ts_iso`` like 2024-01-01T00:00:00Z."""
    h = hashlib.sha256(f"{url}|{warc_ts_iso}".encode()).hexdigest()
    x = (int(h[0:13], 16) / _POW52) * 360.0 - 180.0
    y = (int(h[13:26], 16) / _POW52) * 180.0 - 90.0
    return x, y


# ---------------------------------------------------------------------------
# Splitter tiles (SplitterFilter.cpp:129-178 semantics)
# ---------------------------------------------------------------------------


def _trunc_long(col: Column) -> Column:
    # Spark's cast(double as long) truncates toward zero, matching C++
    # static_cast<int>. (DuckDB CAST rounds — oracle SQL must use trunc().)
    return col.cast("long")


def tile_coord(v: Column, origin: Column | float, length: float) -> Column:
    """One axis of the splitter tile id: int-cast then decrement-if-negative.

    NOT plain floor: a point exactly on a negative tile boundary
    (dv/length integral and < 0) lands one tile lower than floor would
    put it — matching SplitterFilter.cpp:131-141 exactly.
    """
    dv = v - origin
    pos = _trunc_long(dv / F.lit(length))
    return F.when(dv < 0, pos - 1).otherwise(pos)


def tile_coord_sql(v: str, origin: str, length: float) -> str:
    """DuckDB/ANSI twin of tile_coord (trunc(), not round-on-cast)."""
    dv = f"({v} - {origin})"
    pos = f"CAST(trunc({dv} / {length!r}) AS BIGINT)"
    return f"(CASE WHEN {dv} < 0 THEN {pos} - 1 ELSE {pos} END)"


def tile_coord_np(v: np.ndarray, origin: float, length: float) -> np.ndarray:
    dv = v - origin
    pos = np.trunc(dv / length).astype(np.int64)
    pos[dv < 0] -= 1
    return pos


def square_contains(
    xpos: Column, ypos: Column, x: Column, y: Column,
    origin_x: float, origin_y: float, length: float, buffer: float,
) -> Column:
    """Strict-inequality buffered-square test (SplitterFilter.cpp:170-178)."""
    minx = F.lit(origin_x) + xpos.cast("double") * F.lit(length) - F.lit(buffer)
    maxx = minx + F.lit(length) + F.lit(2.0 * buffer)
    miny = F.lit(origin_y) + ypos.cast("double") * F.lit(length) - F.lit(buffer)
    maxy = miny + F.lit(length) + F.lit(2.0 * buffer)
    return (minx < x) & (x < maxx) & (miny < y) & (y < maxy)


# ---------------------------------------------------------------------------
# Hexbin cell addressing (HexGrid.cpp:181-260)
# ---------------------------------------------------------------------------


def hex_dims(height: float) -> tuple[float, float]:
    """(width, height) of the pointy-top hex grid (HexGrid.cpp:57-59) —
    width uses the reference's truncated SQRT_3 constant."""
    return (3.0 / (2.0 * SQRT_3_HEXER)) * height, height


def hex_cell_np(
    px: np.ndarray, py: np.ndarray, origin_x: float, origin_y: float, height: float
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized port of HexGrid::findHexagon (HexGrid.cpp:181-260).

    C++ semantics preserved: floor() for column/row, truncation for
    ``(int)halfrow``, truncated ``%`` (sign of dividend) for parity tests.
    The grid origin is an explicit parameter (the reference uses the first
    point — order-dependent, so callers must pin it; cf. SURVEY §7.3).
    """
    width = (3.0 / (2.0 * SQRT_3_HEXER)) * height
    x0 = np.asarray(px, dtype=np.float64) - origin_x
    y0 = np.asarray(py, dtype=np.float64) - origin_y

    col = x0 / width
    x = np.floor(col).astype(np.int64)
    x_even = (x % 2) == 0  # numpy % is floored, but ==0 test matches C for any sign
    y = np.where(
        x_even,
        np.floor(y0 / height),
        np.floor((y0 - (height / 2.0)) / height),
    ).astype(np.int64)

    xcol = col - np.floor(col)
    mini = xcol > (2.0 / 3.0)
    xoff = (xcol - 2.0 / 3.0) * 3.0

    halfrow = y0 / (height / 2.0)
    halfy = np.trunc(halfrow).astype(np.int64)  # C (int) cast: toward zero
    yrow = halfrow - np.floor(halfrow)

    # C++ `%` truncates toward zero: halfy % 2 in {-1, 0, 1}.
    halfy_even = (halfy - np.trunc(halfy / 2.0).astype(np.int64) * 2) == 0
    x_odd = ~x_even

    neg_slope = (halfy_even & x_even) | (x_odd & ~halfy_even)
    bump_neg = mini & neg_slope & (xoff > yrow)
    bump_pos = mini & ~neg_slope & (yrow > xoff)

    y = y - (bump_neg & x_even).astype(np.int64)
    y = y + (bump_pos & x_odd).astype(np.int64)
    x = x + (bump_neg | bump_pos).astype(np.int64)
    return x, y


def hex_cell_cols(
    px: Column, py: Column, origin_x: float, origin_y: float, height: float
) -> tuple[Column, Column]:
    """Column-expression twin of hex_cell_np — stays in WholeStageCodegen."""
    width = (3.0 / (2.0 * SQRT_3_HEXER)) * height
    x0 = px - F.lit(float(origin_x))
    y0 = py - F.lit(float(origin_y))

    col = x0 / F.lit(width)
    x = F.floor(col).cast("long")
    x_even = (x % 2) == 0
    y = F.when(x_even, F.floor(y0 / F.lit(height))).otherwise(
        F.floor((y0 - F.lit(height / 2.0)) / F.lit(height))
    ).cast("long")

    xcol = col - F.floor(col)
    mini = xcol > F.lit(2.0 / 3.0)
    xoff = (xcol - F.lit(2.0 / 3.0)) * F.lit(3.0)

    halfrow = y0 / F.lit(height / 2.0)
    halfy = halfrow.cast("long")  # Spark cast truncates toward zero, like C
    yrow = halfrow - F.floor(halfrow)

    halfy_even = (halfy % 2) == 0  # Spark % truncates like C — even-test safe
    x_odd = ~x_even

    neg_slope = (halfy_even & x_even) | (x_odd & ~halfy_even)
    bump_neg = mini & neg_slope & (xoff > yrow)
    bump_pos = mini & ~neg_slope & (yrow > xoff)

    y_out = y - F.when(bump_neg & x_even, F.lit(1)).otherwise(F.lit(0))
    y_out = y_out + F.when(bump_pos & x_odd, F.lit(1)).otherwise(F.lit(0))
    x_out = x + F.when(bump_neg | bump_pos, F.lit(1)).otherwise(F.lit(0))
    return x_out.cast("long"), y_out.cast("long")


def hex_cell_sql(
    px: str, py: str, origin_x: float, origin_y: float, height: float
) -> tuple[str, str]:
    """ANSI-SQL twin of hex_cell_cols for the DuckDB oracle.

    DuckDB gotchas handled: CAST(double AS int) rounds → use trunc();
    `%` on integers truncates (same as C) so even-tests are safe.
    """
    width = (3.0 / (2.0 * SQRT_3_HEXER)) * height
    x0 = f"({px} - {float(origin_x)!r})"
    y0 = f"({py} - {float(origin_y)!r})"
    col = f"({x0} / {width!r})"
    x = f"CAST(floor({col}) AS BIGINT)"
    x_even = f"(({x}) % 2 = 0)"
    y = (
        f"CAST(CASE WHEN {x_even} THEN floor({y0} / {height!r}) "
        f"ELSE floor(({y0} - {height / 2.0!r}) / {height!r}) END AS BIGINT)"
    )
    xcol = f"({col} - floor({col}))"
    mini = f"({xcol} > (2.0/3.0))"
    xoff = f"(({xcol} - 2.0/3.0) * 3.0)"
    halfrow = f"({y0} / {height / 2.0!r})"
    halfy = f"CAST(trunc({halfrow}) AS BIGINT)"
    yrow = f"({halfrow} - floor({halfrow}))"
    halfy_even = f"(({halfy}) % 2 = 0)"
    x_odd = f"(NOT {x_even})"
    neg = f"(({halfy_even} AND {x_even}) OR ({x_odd} AND NOT {halfy_even}))"
    bump_neg = f"({mini} AND {neg} AND ({xoff} > {yrow}))"
    bump_pos = f"({mini} AND NOT {neg} AND ({yrow} > {xoff}))"
    y_sql = (
        f"({y} - CASE WHEN {bump_neg} AND {x_even} THEN 1 ELSE 0 END"
        f" + CASE WHEN {bump_pos} AND {x_odd} THEN 1 ELSE 0 END)"
    )
    x_sql = f"({x} + CASE WHEN {bump_neg} OR {bump_pos} THEN 1 ELSE 0 END)"
    return x_sql, y_sql


# ---------------------------------------------------------------------------
# Raster cell indexing (GDALGrid.hpp:120-127): truncating, y-flipped rows.
# ---------------------------------------------------------------------------


def raster_col(x: Column, origin_x: float, edge: float) -> Column:
    return ((x - F.lit(origin_x)) / F.lit(edge)).cast("long")


def raster_row(y: Column, origin_y: float, edge: float, height: int) -> Column:
    return F.lit(height) - ((y - F.lit(origin_y)) / F.lit(edge)).cast("long") - 1


def raster_cell_np(
    x: np.ndarray, y: np.ndarray, origin_x: float, origin_y: float,
    edge: float, height: int,
) -> tuple[np.ndarray, np.ndarray]:
    i = np.trunc((x - origin_x) / edge).astype(np.int64)
    j = height - np.trunc((y - origin_y) / edge).astype(np.int64) - 1
    return i, j

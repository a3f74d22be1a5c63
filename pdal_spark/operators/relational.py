"""The cheap relational layer: PDAL's projection / predicate / limit /
partition / sort stages as thin DataFrame compositions.

Order contract: PDAL semantics are frequently defined over *arrival
order* (decimation stride, head/tail, stable sort, divider runs, voxel
first-in-wins). A distributed engine has no implicit arrival order, so
every order-dependent operator here takes an explicit ``order_col`` —
the persisted arrival index (page_id / doc_id in our tables). This is
the same pinning the reference's own tests do for order-dependent
defaults (splitter origin, hexbin origin).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pdal_spark.functions.dimrange import DimRange, compile_ranges, parse_range, value_passes
from pdal_spark.functions.mongo import compile_mongo
from pdal_spark.operators.ordered import global_rank

# ---------------------------------------------------------------------------
# projections / per-row updates
# ---------------------------------------------------------------------------


def ferry(df: DataFrame, copies: list[tuple[str, str]]) -> DataFrame:
    """filters.ferry (FerryFilter.cpp:116-127): copy src dim -> dest dim.

    Self-copy and duplicate destinations are errors (77-83); a new dest
    column is created as double (88-101) — here it inherits src type,
    cast to double only when the column is numeric-narrow."""
    seen: set[str] = set()
    for src, dst in copies:
        if src == dst:
            raise ValueError(f"Can't ferry dimension to itself: {src!r}")
        if dst in seen:
            raise ValueError(f"Duplicate ferry destination: {dst!r}")
        seen.add(dst)
    out = df
    for src, dst in copies:
        out = out.withColumn(dst, F.col(src))
    return out


def assign(
    df: DataFrame, assignments: list[str], condition: str | None = None
) -> DataFrame:
    """filters.assign (AssignFilter.cpp:146-157): `Dim[lo:hi]=value`.

    Optional global `condition` DimRange short-circuits the whole row.
    Assignments apply IN ORDER and each reads the current (possibly
    already-updated) value — replicated via a withColumn chain.
    """
    cond_col: Column | None = None
    if condition:
        c = parse_range(condition)
        is_float = dict((f.name, f.dataType.typeName()) for f in df.schema.fields).get(
            c.name
        ) in ("double", "float")
        cond_col = value_passes(c, F.col(c.name), is_float)

    out = df
    for a in assignments:
        rng_s, _, val_s = a.rpartition("=")
        if not rng_s:
            raise ValueError(f"Missing '=' in assignment: {a!r}")
        r = parse_range(rng_s)
        value = float(val_s)
        is_float = dict((f.name, f.dataType.typeName()) for f in out.schema.fields).get(
            r.name
        ) in ("double", "float")
        hit = value_passes(r, F.col(r.name), is_float)
        if cond_col is not None:
            hit = hit & cond_col
        dtype = [f.dataType for f in out.schema.fields if f.name == r.name][0]
        out = out.withColumn(
            r.name, F.when(hit, F.lit(value).cast(dtype)).otherwise(F.col(r.name))
        )
    return out


def transformation(df: DataFrame, matrix: list[float], x="x", y="y", z="z") -> DataFrame:
    """filters.transformation (TransformationFilter.cpp:66-81): row-major
    4x4 affine on (X, Y, Z)."""
    if len(matrix) != 16:
        raise ValueError("matrix must have 16 row-major entries")
    m = matrix
    has_z = z in df.columns
    zc = F.col(z) if has_z else F.lit(0.0)
    nx = F.lit(m[0]) * F.col(x) + F.lit(m[1]) * F.col(y) + F.lit(m[2]) * zc + F.lit(m[3])
    ny = F.lit(m[4]) * F.col(x) + F.lit(m[5]) * F.col(y) + F.lit(m[6]) * zc + F.lit(m[7])
    nz = F.lit(m[8]) * F.col(x) + F.lit(m[9]) * F.col(y) + F.lit(m[10]) * zc + F.lit(m[11])
    out = df.withColumns({x: nx, y: ny}) if not has_z else df.withColumns({x: nx, y: ny, z: nz})
    return out


# ---------------------------------------------------------------------------
# predicates
# ---------------------------------------------------------------------------


def range_filter(df: DataFrame, limits: list[str] | list[DimRange]) -> DataFrame:
    """filters.range: OR within same dim, AND across dims."""
    return df.filter(compile_ranges(df, limits))


def mongo_filter(df: DataFrame, expr: dict) -> DataFrame:
    """filters.mongo: JSON predicate tree."""
    return df.filter(compile_mongo(expr))


# ---------------------------------------------------------------------------
# limits / strides / partitions (order-dependent; order_col mandatory)
# ---------------------------------------------------------------------------


def _with_arrival_index(df: DataFrame, order_col: str, out: str = "_i") -> DataFrame:
    # 0-based arrival rank, computed distributed (range partition +
    # offsets, ordered.global_rank) — never a no-partition window. When
    # order_col is already the dense 0..n-1 index, callers pass
    # dense_index=True and skip even this.
    return global_rank(df, [F.col(order_col).asc()], out_col=out, zero_based=True)


def decimation(
    df: DataFrame,
    step: int,
    offset: int = 0,
    limit: int | None = None,
    order_col: str = "page_id",
    dense_index: bool = False,
) -> DataFrame:
    """filters.decimation (DecimationFilter.cpp:73-89): keep rows with
    offset <= i < limit and (i - offset) % step == 0 over arrival order.

    dense_index=True treats order_col itself as the 0..n-1 arrival index
    (no shuffle at all — the 100TB path for synthetic ids).
    """
    if dense_index:
        staged = df.withColumn("_i", F.col(order_col))
    else:
        staged = _with_arrival_index(df, order_col)
    ic = F.col("_i")
    keep = (ic >= offset) & (((ic - offset) % step) == 0)
    if limit is not None:
        keep = keep & (ic < limit)
    return staged.filter(keep).drop("_i")


def head(df: DataFrame, n: int, order_col: str = "page_id") -> DataFrame:
    """filters.head (HeadFilter.hpp:54-86): first n rows by arrival.

    Arrival order is total on order_col, so the first n rows ARE the n
    smallest keys — sort+limit, which Spark plans as
    TakeOrderedAndProject (per-partition top-n, one tiny merge; no
    full-table shuffle, scale-safe for the small n this filter is for).
    """
    return df.orderBy(F.col(order_col).asc()).limit(n)


def tail(df: DataFrame, n: int, order_col: str = "page_id") -> DataFrame:
    """filters.tail (TailFilter.hpp:54-84): last n rows by arrival —
    the n largest keys, same TakeOrderedAndProject plan as head."""
    return df.orderBy(F.col(order_col).desc()).limit(n)


def divider(
    df: DataFrame,
    count: int | None = None,
    capacity: int | None = None,
    mode: str = "partition",
    order_col: str = "page_id",
) -> DataFrame:
    """filters.divider (DividerFilter.cpp:109-155): label rows with view_id.

    mode=partition -> contiguous runs of ceil(n/count); mode=round_robin
    -> i % count. capacity -> count = ceil(n/capacity).
    """
    if (count is None) == (capacity is None):
        raise ValueError("Exactly one of count/capacity must be given")
    n = df.count()
    if capacity is not None:
        count = -(-n // capacity)
    staged = _with_arrival_index(df, order_col)
    i = F.col("_i")
    if mode == "partition":
        size = -(-n // count)
        vid = (i / size).cast("long")
    elif mode == "round_robin":
        vid = i % count
    else:
        raise ValueError(f"mode must be partition|round_robin, got {mode!r}")
    return staged.withColumn("view_id", vid).drop("_i")


def groupby_views(df: DataFrame, dim: str) -> DataFrame:
    """filters.groupby (GroupByFilter.cpp:72-92): one view per distinct
    value — the view key IS the value (cast to long like the reference's
    uint64 map key)."""
    return df.withColumn("view_id", F.col(dim).cast("long"))


def merge(*dfs: DataFrame) -> DataFrame:
    """filters.merge (MergeFilter.cpp:52-75): union-all, input order."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=False)
    return out


def sort_stable(
    df: DataFrame, dim: str, order: str = "ASC", arrival_col: str = "page_id"
) -> DataFrame:
    """filters.sort (SortFilter.cpp:64-73): stable by one dim.

    ASC = std::stable_sort -> equal keys keep arrival order.
    DESC uses a negated comparator, which REVERSES equal-key runs —
    replicated with a descending arrival tiebreaker.
    """
    if order.upper() == "ASC":
        return df.orderBy(F.col(dim).asc(), F.col(arrival_col).asc())
    return df.orderBy(F.col(dim).desc(), F.col(arrival_col).desc())


def sort_rank(
    df: DataFrame, dim: str, order: str = "ASC", arrival_col: str = "page_id",
    out_col: str = "sort_rank",
) -> DataFrame:
    """Stable-sort order of filters.sort encoded as an explicit 1-based
    rank column (order-insensitive compares still verify the total order
    and the arrival tiebreak). Distributed global_rank — no single-task
    window."""
    if order.upper() == "ASC":
        keys = [F.col(dim).asc(), F.col(arrival_col).asc()]
    else:
        keys = [F.col(dim).desc(), F.col(arrival_col).desc()]
    return global_rank(df, keys, out_col=out_col)


def locate(
    df: DataFrame, dim: str, minmax: str = "max", arrival_col: str = "page_id",
    view_col: str | None = None,
) -> DataFrame:
    """filters.locate (LocateFilter.cpp:72-106): the single point with
    min/max of `dim` per view; strict comparisons while scanning ->
    first-seen (lowest arrival) wins ties."""
    direction = F.col(dim).desc() if minmax == "max" else F.col(dim).asc()
    if view_col:
        w = Window.partitionBy(view_col).orderBy(direction, F.col(arrival_col).asc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    # single view: distributed top-1 (TakeOrdered), not a global window
    return df.orderBy(direction, F.col(arrival_col).asc()).limit(1)


# ---------------------------------------------------------------------------
# voxel family
# ---------------------------------------------------------------------------


def _voxel_cols(cell: float, origin: tuple, x, y, z):
    ox, oy, oz = origin if len(origin) == 3 else (*origin, 0.0)
    gx = F.floor((F.col(x) - F.lit(ox)) / F.lit(cell)).cast("long")
    gy = F.floor((F.col(y) - F.lit(oy)) / F.lit(cell)).cast("long")
    gz = (
        F.floor((F.col(z) - F.lit(oz)) / F.lit(cell)).cast("long")
        if z is not None
        else F.lit(0).cast("long")
    )
    return gx, gy, gz


def voxel_downsize(
    df: DataFrame,
    cell: float,
    mode: str = "first",
    origin: tuple[float, float, float] = (0.0, 0.0, 0.0),
    order_col: str = "page_id",
    x: str = "x",
    y: str = "y",
    z: str | None = None,
) -> DataFrame:
    """filters.voxeldownsize (VoxelDownsizeFilter.cpp:103-145): first point
    wins per voxel; mode='center' additionally snaps coords to the voxel
    center. The reference's origin is the first point's voxel corner —
    order-dependent, so origin is pinned explicitly here.
    """
    origin = origin if len(origin) == 3 else (*origin, 0.0)
    gx, gy, gz = _voxel_cols(cell, origin, x, y, z)
    w = Window.partitionBy(gx, gy, gz).orderBy(F.col(order_col).asc())
    out = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    if mode == "center":
        ox, oy, oz = origin
        out = out.withColumn(x, (F.floor((F.col(x) - ox) / cell) + 0.5) * cell + ox)
        out = out.withColumn(y, (F.floor((F.col(y) - oy) / cell) + 0.5) * cell + oy)
        if z is not None:
            out = out.withColumn(z, (F.floor((F.col(z) - oz) / cell) + 0.5) * cell + oz)
    return out


def voxel_center_nearest_neighbor(
    df: DataFrame,
    cell: float,
    origin: tuple[float, float, float] = (0.0, 0.0, 0.0),
    order_col: str = "page_id",
    x: str = "x",
    y: str = "y",
    z: str | None = None,
) -> DataFrame:
    """filters.voxelcenternearestneighbor: keep the point nearest each
    voxel's center (VoxelCenterNearestNeighborFilter.cpp)."""
    origin = origin if len(origin) == 3 else (*origin, 0.0)
    gx, gy, gz = _voxel_cols(cell, origin, x, y, z)
    ox, oy, _ = origin
    cx = (gx.cast("double") + 0.5) * cell + ox
    cy = (gy.cast("double") + 0.5) * cell + oy
    d2 = (F.col(x) - cx) ** 2 + (F.col(y) - cy) ** 2
    if z is not None:
        cz = (gz.cast("double") + 0.5) * cell + origin[2]
        d2 = d2 + (F.col(z) - cz) ** 2
    w = Window.partitionBy(gx, gy, gz).orderBy(d2.asc(), F.col(order_col).asc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def voxel_centroid_nearest_neighbor(
    df: DataFrame,
    cell: float,
    origin: tuple[float, float, float] = (0.0, 0.0, 0.0),
    order_col: str = "page_id",
    x: str = "x",
    y: str = "y",
    z: str | None = None,
) -> DataFrame:
    """filters.voxelcentroidnearestneighbor
    (VoxelCentroidNearestNeighborFilter.cpp:69-160): one survivor per
    voxel —
      * 1 point: itself;
      * 2 points: the one nearer the voxel CENTER (they are equidistant
        to the centroid); `d1 < d2` keeps the first, so on a distance tie
        the LATER arrival wins (:118-123);
      * 3+ points: the one nearest the CENTROID; strict `<` while
        scanning in arrival order, so the EARLIER arrival wins ties
        (:139-150).
    The reference keys voxels off the first point's coords
    (order-dependent); origin is pinned explicitly, like the center-NN
    sibling. order_col must be numeric (the n==2 tie negates it).
    """
    origin = origin if len(origin) == 3 else (*origin, 0.0)
    gx, gy, gz = _voxel_cols(cell, origin, x, y, z)
    ox, oy, oz = origin
    work = df.withColumn("_vx", gx).withColumn("_vy", gy).withColumn("_vz", gz)
    wv = Window.partitionBy("_vx", "_vy", "_vz")
    n = F.count("*").over(wv)
    # voxel center
    cx = (F.col("_vx").cast("double") + 0.5) * cell + ox
    cy = (F.col("_vy").cast("double") + 0.5) * cell + oy
    # centroid
    mx = F.avg(x).over(wv)
    my = F.avg(y).over(wv)
    tx = F.when(n == 2, cx).otherwise(mx)
    ty = F.when(n == 2, cy).otherwise(my)
    d2 = (F.col(x) - tx) ** 2 + (F.col(y) - ty) ** 2
    if z is not None:
        cz = (F.col("_vz").cast("double") + 0.5) * cell + oz
        mz = F.avg(z).over(wv)
        tz = F.when(n == 2, cz).otherwise(mz)
        d2 = d2 + (F.col(z) - tz) ** 2
    tie = F.when(n == 2, -F.col(order_col)).otherwise(F.col(order_col))
    work = (
        work.withColumn("_d2t", d2).withColumn("_tie", tie)
    )
    wr = Window.partitionBy("_vx", "_vy", "_vz").orderBy(
        F.col("_d2t").asc(), F.col("_tie").asc()
    )
    return (
        work.withColumn("_rn", F.row_number().over(wr))
        .filter(F.col("_rn") == 1)
        .drop("_vx", "_vy", "_vz", "_d2t", "_tie", "_rn")
    )


# ---------------------------------------------------------------------------
# robust-range filters
# ---------------------------------------------------------------------------


def iqr_filter(df: DataFrame, dim: str, k: float = 1.5) -> DataFrame:
    """filters.iqr (IQRFilter.cpp): keep rows within [Q1 - k*IQR, Q3 + k*IQR].

    Exact percentiles (Spark `percentile`, type 7 linear interpolation —
    same estimator the reference's Utils::compute_quantile uses).
    """
    q = df.agg(
        F.expr(f"percentile({dim}, 0.25)").alias("q1"),
        F.expr(f"percentile({dim}, 0.75)").alias("q3"),
    ).collect()[0]
    lo = q["q1"] - k * (q["q3"] - q["q1"])
    hi = q["q3"] + k * (q["q3"] - q["q1"])
    return df.filter((F.col(dim) > F.lit(lo)) & (F.col(dim) < F.lit(hi)))


def mad_filter(df: DataFrame, dim: str, k: float = 2.0) -> DataFrame:
    """filters.mad (MADFilter.cpp): keep |v - median| < k * MAD
    (MAD = median absolute deviation)."""
    med = df.agg(F.expr(f"percentile({dim}, 0.5)").alias("m")).collect()[0]["m"]
    mad = (
        df.select(F.abs(F.col(dim) - F.lit(med)).alias("ad"))
        .agg(F.expr("percentile(ad, 0.5)").alias("mad"))
        .collect()[0]["mad"]
    )
    return df.filter(F.abs(F.col(dim) - F.lit(med)) < F.lit(k * mad))


def returns_filter(df: DataFrame, groups: list[str]) -> DataFrame:
    """filters.returns (ReturnsFilter.cpp:55-89): label rows
    first/last/intermediate/only from ReturnNumber/NumberOfReturns and
    keep requested groups; one view per group -> `return_group` column."""
    rn, nr = F.col("ReturnNumber"), F.col("NumberOfReturns")
    label = (
        F.when((nr == 1), F.lit("only"))
        .when(rn == 1, F.lit("first"))
        .when(rn == nr, F.lit("last"))
        .otherwise(F.lit("intermediate"))
    )
    out = df.withColumn("return_group", label)
    return out.filter(F.col("return_group").isin(groups))


# ---------------------------------------------------------------------------
# filters.randomize
# ---------------------------------------------------------------------------

_SHUFFLE_P = 2_147_483_647  # Mersenne prime 2^31 - 1


def shuffle_params(seed: int) -> tuple[int, int]:
    """Derive the affine-permutation coefficients (a, b) from a seed via
    two splitmix64 steps (public-domain Steele et al. mixer). a is in
    [1, p-1] (invertible mod prime p), b in [0, p-1]."""
    mask = (1 << 64) - 1

    def mix(z: int) -> int:
        z = (z + 0x9E3779B97F4A7C15) & mask
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
        return z ^ (z >> 31)

    s1 = mix(seed & mask)
    s2 = mix(s1)
    return (s1 % (_SHUFFLE_P - 1)) + 1, s2 % _SHUFFLE_P


def shuffle_key_sql(seed: int, rid: str) -> str:
    """The shuffle sort key as an ANSI-SQL expression over integer row
    id column `rid` — identical arithmetic in Spark SQL and DuckDB
    (all intermediates < 2^62, no BIGINT overflow)."""
    a, b = shuffle_params(seed)
    return f"(({a} * ({rid} % {_SHUFFLE_P}) + {b}) % {_SHUFFLE_P})"


def randomize(
    df: DataFrame,
    seed: int,
    order_col: str = "page_id",
    out_col: str = "shuffle_rank",
) -> DataFrame:
    """filters.randomize (RandomizeFilter.hpp:63-70): shuffle the view
    into a deterministic pseudo-random order given `seed`.

    The reference runs std::shuffle with std::mt19937(seed) — whose
    output is *implementation-defined* (std::shuffle's draw sequence is
    not specified by the standard), so bit-level parity is not even
    well-defined across the reference's own builds. The contract kept
    here is the meaningful one: a uniform-looking, seed-deterministic
    permutation of the view.

    Spark-first shape: the permutation is an affine cipher
    ``key = (a*rid + b) mod p`` over the Mersenne prime p = 2^31-1 —
    a bijection on [0, p) for any a != 0, so for views under ~2.1 B rows
    every row gets a distinct key (beyond that the arrival id breaks the
    rare collisions deterministically). The new order is materialized as
    a 1-based rank column computed with the distributed range-partition
    scheme (ordered.global_rank) — one range shuffle, no single-task
    window, no RNG state to carry across partitions.
    """
    key = F.expr(shuffle_key_sql(seed, order_col))
    return global_rank(
        df, [key.asc(), F.col(order_col).asc()], out_col=out_col
    )

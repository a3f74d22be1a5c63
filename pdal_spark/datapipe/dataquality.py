"""Single-pass data-quality profiling + constraint verification
(Deequ-style; Schelter et al., "Automating Large-Scale Data Quality
Verification", VLDB 2018).

The operational gate every 100 TB ingest needs before training jobs
read a crawl drop: did this increment arrive complete, unique on its
key, inside expected value ranges, with sane language/url shapes? Deequ
phrases this as declarative CONSTRAINTS compiled onto shared scan-level
metrics; this module does the same with two primitives:

* ``profile(df, cols)`` — per-column metrics (completeness, distinct
  count, numeric moments, string length stats) in long form.
* ``check(df, constraints)`` — a constraint suite evaluated to
  (name, column, metric, value, passed) verdict rows.

Scale shape: every metric an ANY-column suite needs is computed in ONE
aggregate over ONE scan — Catalyst fuses the count/sum/min/max
accumulators into a single partial-aggregate (map-side combine, one
exchange of exactly one row per metric batch, no joins). Distinct
counts are the one exception: ``distinct_mode="exact"`` uses
count(DISTINCT col) (Catalyst expands to one extra aggregate per
distinct column — exact, the driver-oracle mode), while
``distinct_mode="approx"`` keeps the single-pass shape with HLL
sketches (approx_count_distinct, the 100 TB default — no expansion, no
extra exchange, ~2% relative error).

Determinism: counts/min/max are order-free, and means/stddev come
from power sums divided once. Integral columns sum as exact BIGINT —
fully order-free. Float/double/decimal columns sum as DOUBLE
(truncating them to long would silently profile a column of 0.9s as
mean 0.0 — and these verdicts gate publishes via audited_append); a
DOUBLE sum's reduce order varies across partitions, so at extreme
magnitudes (sums ~1e15+) the 6-dp rounding may not absorb the noise —
don't sit a float mean_between bound exactly on the boundary. A
mean_between constraint over a float column must declare
``"float": True`` (checked) so check_sql accumulates identically.
Every emitted ``value`` is rounded to 6 dp on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["profile", "check", "histogram",
           "profile_sql", "check_sql", "histogram_sql"]

_R = 6  # decimal places every emitted value is rounded to (both engines)


def _is_numeric(df: DataFrame, col: str) -> bool:
    t = dict(df.dtypes)[col]
    return t in ("tinyint", "smallint", "int", "bigint", "float", "double",
                 "decimal") or t.startswith("decimal")


_INTEGRAL = ("tinyint", "smallint", "int", "bigint")


def _sum_cast(df: DataFrame, col: str) -> str:
    """Power-sum accumulator type: BIGINT for integral columns
    (bit-exact, order-free), DOUBLE for float/double/decimal — the
    long-cast there would truncate every value before summing."""
    return "long" if dict(df.dtypes)[col] in _INTEGRAL else "double"


# ---------------------------------------------------------------------------
# profile
# ---------------------------------------------------------------------------

def profile(
    df: DataFrame,
    cols: list[str] | None = None,
    distinct_mode: str = "approx",
) -> DataFrame:
    """Per-column profile in long form: (column, metric, value).

    Metrics: ``n`` (table rows, emitted once per column), ``n_null``,
    ``completeness``; numeric columns add ``min``/``max``/``mean``/
    ``stddev_pop``; string columns add ``min_len``/``max_len``/
    ``mean_len``. ``n_distinct`` is exact or HLL per
    ``distinct_mode`` (see module docstring).

    One aggregate job; the long form comes from exploding an
    array-of-structs built over the single aggregate row (no second
    scan, no union of jobs).
    """
    if cols is None:
        cols = [c for c in df.columns]
    if distinct_mode not in ("exact", "approx"):
        raise ValueError("distinct_mode must be 'exact' or 'approx'")

    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"_nn_{c}"))
        if distinct_mode == "exact":
            aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
        else:
            aggs.append(F.approx_count_distinct(c).alias(f"_nd_{c}"))
        if _is_numeric(df, c):
            sc = _sum_cast(df, c)
            aggs += [
                F.min(c).cast("double").alias(f"_min_{c}"),
                F.max(c).cast("double").alias(f"_max_{c}"),
                F.sum(F.col(c).cast(sc)).alias(f"_s1_{c}"),
                F.sum(F.col(c).cast(sc) * F.col(c).cast(sc)).alias(
                    f"_s2_{c}"
                ),
            ]
        else:
            ln = F.length(c)
            aggs += [
                F.min(ln).cast("double").alias(f"_min_{c}"),
                F.max(ln).cast("double").alias(f"_max_{c}"),
                F.sum(ln.cast("long")).alias(f"_s1_{c}"),
                F.lit(None).cast("long").alias(f"_s2_{c}"),
            ]
    row = df.agg(*aggs)

    n = F.col("_n").cast("double")
    entries: list[Column] = []

    def ent(c: str, metric: str, value: Column) -> Column:
        return F.struct(
            F.lit(c).alias("column"),
            F.lit(metric).alias("metric"),
            F.round(value.cast("double"), _R).alias("value"),
        )

    for c in cols:
        nn = F.col(f"_nn_{c}").cast("double")
        s1 = F.col(f"_s1_{c}").cast("double")
        s2 = F.col(f"_s2_{c}").cast("double")
        numeric = _is_numeric(df, c)
        entries += [
            ent(c, "n", n),
            ent(c, "n_null", n - nn),
            ent(c, "completeness", F.when(n > 0, nn / n)),
            ent(c, "n_distinct", F.col(f"_nd_{c}")),
            ent(c, "min" if numeric else "min_len", F.col(f"_min_{c}")),
            ent(c, "max" if numeric else "max_len", F.col(f"_max_{c}")),
            ent(c, "mean" if numeric else "mean_len",
                F.when(nn > 0, s1 / nn)),
        ]
        if numeric:
            # population stddev from exact integer power sums
            entries.append(
                ent(c, "stddev_pop",
                    F.when(nn > 0, F.sqrt(s2 / nn - (s1 / nn) * (s1 / nn)))))
    return (
        row.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.column", "e.metric", "e.value")
    )


def profile_sql(
    table: str, cols_numeric: list[str], cols_string: list[str],
    distinct_mode: str = "exact", cols_float: list[str] = (),
) -> str:
    """DuckDB twin of profile() for the given column split.
    ``cols_float`` names the numeric columns that are float/double —
    their power sums accumulate as DOUBLE, matching _sum_cast."""
    nd = "count(DISTINCT {c})" if distinct_mode == "exact" else None
    if nd is None:
        raise ValueError("only distinct_mode='exact' has an engine twin")
    parts = []
    for c in cols_numeric + cols_string:
        numeric = c in cols_numeric
        st = "DOUBLE" if c in cols_float else "BIGINT"
        v = f"CAST({c} AS DOUBLE)" if numeric else f"CAST(length({c}) AS DOUBLE)"
        s1 = f"sum(CAST({c} AS {st}))" if numeric else f"sum(CAST(length({c}) AS BIGINT))"
        s2 = f"sum(CAST({c} AS {st})*CAST({c} AS {st}))" if numeric else "NULL"
        mmin, mmax, mmean = (
            ("min", "max", "mean") if numeric else ("min_len", "max_len", "mean_len")
        )
        parts.append(f"""
          SELECT '{c}' AS "column", 'n' AS metric,
                 round(CAST(count(*) AS DOUBLE), {_R}) AS value FROM {table}
          UNION ALL SELECT '{c}', 'n_null',
                 round(CAST(count(*) - count({c}) AS DOUBLE), {_R}) FROM {table}
          UNION ALL SELECT '{c}', 'completeness',
                 round(CASE WHEN count(*) > 0
                       THEN CAST(count({c}) AS DOUBLE) / count(*) END, {_R})
                 FROM {table}
          UNION ALL SELECT '{c}', 'n_distinct',
                 round(CAST(count(DISTINCT {c}) AS DOUBLE), {_R}) FROM {table}
          UNION ALL SELECT '{c}', '{mmin}', round(min({v}), {_R}) FROM {table}
          UNION ALL SELECT '{c}', '{mmax}', round(max({v}), {_R}) FROM {table}
          UNION ALL SELECT '{c}', '{mmean}',
                 round(CASE WHEN count({c}) > 0
                       THEN CAST({s1} AS DOUBLE) / count({c}) END, {_R})
                 FROM {table}""")
        if numeric:
            parts.append(f"""
          SELECT '{c}', 'stddev_pop',
                 round(CASE WHEN count({c}) > 0 THEN sqrt(
                       CAST({s2} AS DOUBLE) / count({c})
                       - (CAST({s1} AS DOUBLE) / count({c}))
                         * (CAST({s1} AS DOUBLE) / count({c}))) END, {_R})
                 FROM {table}""")
    return " UNION ALL ".join(parts)


# ---------------------------------------------------------------------------
# check
# ---------------------------------------------------------------------------

def check(df: DataFrame, constraints: list[dict]) -> DataFrame:
    """Evaluate a Deequ-style constraint suite in ONE aggregate pass.

    Each constraint is a dict with ``name``, ``kind`` and parameters:

    * ``row_count_between``: ``lo``/``hi`` bounds on table rows
    * ``not_null``: ``col`` — completeness == 1.0
    * ``unique``: ``col`` — no value occurs twice (count == distinct)
    * ``min_ge`` / ``max_le``: ``col``, ``bound`` (numeric)
    * ``mean_between``: ``col``, ``lo``, ``hi``
    * ``values_in``: ``col``, ``allowed`` list, optional ``min_rate``
      (default 1.0) — fraction of non-null rows inside the set
    * ``pattern_rate``: ``col``, ``pattern`` (RE2-safe regex), ``min_rate``
      — fraction of non-null rows matching
    * ``min_length_ge``: ``col``, ``bound`` — min string length

    Returns (name, column, metric, value, passed) — value is the
    measured metric the verdict was taken on, rounded to 6 dp.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(constraints):
        kind, col = c["kind"], c.get("col")
        a = f"_c{i}"
        if kind == "row_count_between":
            continue
        elif kind == "not_null":
            aggs.append(F.count(col).alias(a))
        elif kind == "unique":
            aggs.append(F.count(col).alias(a))
            aggs.append(F.count_distinct(F.col(col)).alias(a + "d"))
        elif kind == "min_ge":
            aggs.append(F.min(col).cast("double").alias(a))
        elif kind == "max_le":
            aggs.append(F.max(col).cast("double").alias(a))
        elif kind == "mean_between":
            sc = _sum_cast(df, col)
            # the SQL twin can only see the constraint dict, not the
            # dtype — force the caller to declare float columns so the
            # engines can never silently diverge (truncate-vs-double)
            if (sc == "double") != bool(c.get("float")):
                raise ValueError(
                    f"mean_between on {col!r}: column dtype is "
                    f"{dict(df.dtypes)[col]} but the constraint "
                    f"{'lacks' if sc == 'double' else 'sets'} "
                    "'float': True — the flag must match the dtype so "
                    "check_sql sums with the same accumulator type"
                )
            aggs.append(F.sum(F.col(col).cast(sc)).alias(a))
            aggs.append(F.count(col).alias(a + "n"))
        elif kind == "values_in":
            hit = F.col(col).isin(*c["allowed"]).cast("long")
            aggs.append(F.sum(hit).alias(a))
            aggs.append(F.count(col).alias(a + "n"))
        elif kind == "pattern_rate":
            hit = F.regexp_like(F.col(col), F.lit(c["pattern"])).cast("long")
            aggs.append(F.sum(hit).alias(a))
            aggs.append(F.count(col).alias(a + "n"))
        elif kind == "min_length_ge":
            aggs.append(F.min(F.length(col)).cast("double").alias(a))
        else:
            raise ValueError(f"unknown constraint kind: {kind}")
    row = df.agg(*aggs)

    entries: list[Column] = []
    for i, c in enumerate(constraints):
        kind, col = c["kind"], c.get("col", "")
        a = f"_c{i}"
        n = F.col("_n").cast("double")
        if kind == "row_count_between":
            value, passed, metric = n, (
                (n >= c["lo"]) & (n <= c["hi"])), "n"
        elif kind == "not_null":
            value = F.when(n > 0, F.col(a).cast("double") / n)
            passed, metric = F.col(a) == F.col("_n"), "completeness"
        elif kind == "unique":
            value = F.when(
                F.col(a) > 0,
                F.col(a + "d").cast("double") / F.col(a).cast("double"))
            passed, metric = F.col(a + "d") == F.col(a), "distinctness"
        elif kind == "min_ge":
            value = F.col(a)
            passed, metric = F.col(a) >= c["bound"], "min"
        elif kind == "max_le":
            value = F.col(a)
            passed, metric = F.col(a) <= c["bound"], "max"
        elif kind == "mean_between":
            value = F.when(
                F.col(a + "n") > 0,
                F.col(a).cast("double") / F.col(a + "n").cast("double"))
            passed = (value >= c["lo"]) & (value <= c["hi"])
            metric = "mean"
        elif kind in ("values_in", "pattern_rate"):
            value = F.when(
                F.col(a + "n") > 0,
                F.col(a).cast("double") / F.col(a + "n").cast("double"))
            passed = value >= float(c.get("min_rate", 1.0))
            metric = "in_set_rate" if kind == "values_in" else "match_rate"
        elif kind == "min_length_ge":
            value = F.col(a)
            passed, metric = F.col(a) >= c["bound"], "min_length"
        entries.append(F.struct(
            F.lit(c["name"]).alias("name"),
            F.lit(col).alias("column"),
            F.lit(metric).alias("metric"),
            F.round(value.cast("double"), _R).alias("value"),
            F.coalesce(passed.cast("int"), F.lit(0)).alias("passed"),
        ))
    return (
        row.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.name", "e.column", "e.metric", "e.value", "e.passed")
    )


def check_sql(table: str, constraints: list[dict]) -> str:
    """DuckDB twin of check(): one SELECT per constraint, unioned.

    DuckDB's regexp_matches is RE2 like Spark's regexp_like for the
    pattern subset the suites here use (anchors, classes, literals).
    """
    parts = []
    for c in constraints:
        kind, col = c["kind"], c.get("col", "")
        if kind == "row_count_between":
            v = "CAST(count(*) AS DOUBLE)"
            p = f"(count(*) >= {c['lo']} AND count(*) <= {c['hi']})"
            metric = "n"
        elif kind == "not_null":
            v = f"CASE WHEN count(*) > 0 THEN CAST(count({col}) AS DOUBLE) / count(*) END"
            p = f"count({col}) = count(*)"
            metric = "completeness"
        elif kind == "unique":
            v = (f"CASE WHEN count({col}) > 0 THEN CAST(count(DISTINCT {col}) AS DOUBLE)"
                 f" / count({col}) END")
            p = f"count(DISTINCT {col}) = count({col})"
            metric = "distinctness"
        elif kind == "min_ge":
            v = f"CAST(min({col}) AS DOUBLE)"
            p = f"min({col}) >= {c['bound']}"
            metric = "min"
        elif kind == "max_le":
            v = f"CAST(max({col}) AS DOUBLE)"
            p = f"max({col}) <= {c['bound']}"
            metric = "max"
        elif kind == "mean_between":
            # "float": True -> the column is float/double; DOUBLE sums
            # on both engines (check() decides from the actual dtype)
            st = "DOUBLE" if c.get("float") else "BIGINT"
            v = (f"CASE WHEN count({col}) > 0 THEN "
                 f"CAST(sum(CAST({col} AS {st})) AS DOUBLE) / count({col}) END")
            p = f"(({v}) >= {c['lo']} AND ({v}) <= {c['hi']})"
            metric = "mean"
        elif kind == "values_in":
            lst = ", ".join("'" + a.replace("'", "''") + "'"
                            for a in c["allowed"])
            v = (f"CASE WHEN count({col}) > 0 THEN "
                 f"CAST(sum(CASE WHEN {col} IN ({lst}) THEN 1 ELSE 0 END) AS DOUBLE)"
                 f" / count({col}) END")
            p = f"({v}) >= {float(c.get('min_rate', 1.0))}"
            metric = "in_set_rate"
        elif kind == "pattern_rate":
            pat = c["pattern"].replace("'", "''")
            v = (f"CASE WHEN count({col}) > 0 THEN "
                 f"CAST(sum(CASE WHEN regexp_matches({col}, '{pat}') THEN 1 ELSE 0 END)"
                 f" AS DOUBLE) / count({col}) END")
            p = f"({v}) >= {float(c.get('min_rate', 1.0))}"
            metric = "match_rate"
        elif kind == "min_length_ge":
            v = f"CAST(min(length({col})) AS DOUBLE)"
            p = f"min(length({col})) >= {c['bound']}"
            metric = "min_length"
        else:
            raise ValueError(f"unknown constraint kind: {kind}")
        name = c["name"].replace("'", "''")
        parts.append(
            f"SELECT '{name}' AS name, '{col}' AS \"column\", "
            f"'{metric}' AS metric, round({v}, {_R}) AS value, "
            f"CAST(coalesce({p}, FALSE) AS INT) AS passed FROM {table}")
    return " UNION ALL ".join(parts)


def histogram(df: DataFrame, col: str, bins: int) -> DataFrame:
    """Equi-width histogram of a numeric column: (bin, lo, hi, n).

    Two jobs — a min/max aggregate (driver-collected: two scalars),
    then one map-side-combined count per bin; empty bins emit n=0 via a
    broadcast bin spine so downstream charting/drift checks see the
    full domain. Bin rule: floor((v - min) / width), the last bin
    closed on max (the standard right-closed top bin). Deterministic:
    the bin index is a single double subtract/divide/floor, identical
    in both engines."""
    from pyspark.sql import functions as F

    if bins < 1:
        raise ValueError("bins must be >= 1")
    row = df.agg(
        F.min(col).cast("double").alias("lo"),
        F.max(col).cast("double").alias("hi"),
    ).collect()[0]
    lo, hi = row.lo, row.hi
    spark = df.sparkSession
    if lo is None:
        spine = spark.range(0, bins).select(
            F.col("id").cast("long").alias("bin"),
            F.lit(None).cast("double").alias("lo"),
            F.lit(None).cast("double").alias("hi"),
            F.lit(0).cast("long").alias("n"),
        )
        return spine
    width = (hi - lo) / bins if hi > lo else 1.0
    b = F.least(
        F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width)),
        F.lit(bins - 1),
    ).cast("long")
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = spark.range(0, bins).select(F.col("id").cast("long").alias("bin"))
    return (
        spine.join(counts, "bin", "left")
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("hi"),
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
        )
    )


def histogram_sql(table: str, col: str, bins: int) -> str:
    """DuckDB twin of histogram() — identical bin arithmetic."""
    return f"""
      WITH mm AS (
        SELECT CAST(min({col}) AS DOUBLE) AS lo,
               CAST(max({col}) AS DOUBLE) AS hi
        FROM {table}
      ),
      w AS (
        SELECT lo, CASE WHEN hi > lo THEN (hi - lo) / {bins}
                        ELSE 1.0 END AS width
        FROM mm
      ),
      counts AS (
        SELECT least(CAST(floor((CAST({col} AS DOUBLE) - w.lo) / w.width)
                          AS BIGINT), {bins - 1}) AS bin,
               count(*) AS n
        FROM {table}, w
        WHERE {col} IS NOT NULL
        GROUP BY 1
      )
      SELECT i.range AS bin,
             w.lo + i.range * w.width AS lo,
             w.lo + (i.range + 1) * w.width AS hi,
             CAST(coalesce(c.n, 0) AS BIGINT) AS n
      FROM range(0, {bins}) i
      CROSS JOIN w
      LEFT JOIN counts c ON c.bin = i.range
    """

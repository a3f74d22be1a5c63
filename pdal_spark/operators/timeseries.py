"""Timeseries operators over event streams: sessionization and the
bounded-interval (range) join.

Both are standard warehouse operations Spark's DataFrame API has no
primitive for; both are planned scale-first:

  * sessionize — gap-based session ids per key: one exchange on the
    key, two PARTITIONED cumulative windows (lag -> new-session flag ->
    running sum). Never a global window.
  * interval_join — pairs (l, r) with |l.ts - r.ts| <= delta per key:
    the 1-D analog of the spatial cell join. Each side buckets into
    delta-wide time bins, one side explodes to its 3-neighborhood
    (bin-1, bin, bin+1), the join runs on (key, bin) equality and the
    exact |dt| predicate filters inside the joined stage — never a
    non-equi range join (BNLJ) and never a cartesian. Bucket-join
    candidates over-cover by construction; the exact predicate makes
    the result independent of the binning (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_seconds(df: DataFrame, ts: str) -> Column:
    """Epoch seconds (double, microsecond-exact) for any ts column type.

    TIMESTAMP_NTZ (parquet's isAdjustedToUTC=false — what the test
    tables carry) won't cast to double, and routing it through the
    session timezone would make results depend on the driver's tz; the
    to_utc_timestamp(ts, 'UTC') identity re-tags the wall time as UTC
    so unix_micros is deterministic. Numeric/LTZ columns cast directly
    (matching DuckDB's epoch())."""
    c = F.col(ts)
    if df.schema[ts].dataType.typeName() == "timestamp_ntz":
        return F.unix_micros(F.to_utc_timestamp(c, "UTC")).cast("double") / F.lit(
            1e6
        )
    return c.cast("double")


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: float,
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    key's previous event exceeds ``gap_seconds``. Emits ``session_col``
    (0-based per key) — the standard clickstream sessionization."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc())
    sec = _epoch_seconds(df, ts)
    prev = F.lag(sec).over(w)
    gap = sec - prev
    is_new = F.when(prev.isNull() | (gap > gap_seconds), 1).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        session_col, (F.sum(is_new).over(wsum) - 1).cast("long")
    )


def sessionize_sql(
    table: str, key: str, ts: str, gap_seconds: float,
    session_col: str = "session_id", select: str = "*",
) -> str:
    """DuckDB twin — identical window algebra (epoch() yields seconds
    as DOUBLE, matching Spark's cast('double') on timestamps)."""
    prev = f"lag(epoch({ts})) OVER (PARTITION BY {key} ORDER BY {ts})"
    is_new = (
        f"CASE WHEN {prev} IS NULL OR epoch({ts}) - {prev} > {gap_seconds!r} "
        f"THEN 1 ELSE 0 END"
    )
    return (
        f"SELECT {select} FROM ("
        f"  SELECT *, CAST(sum(_new) OVER ("
        f"    PARTITION BY {key} ORDER BY {ts}"
        f"    ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS {session_col}"
        f"  FROM (SELECT *, {is_new} AS _new FROM {table}))"
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    delta_seconds: float,
    suffix: str = "_r",
) -> DataFrame:
    """All (left, right) pairs of the same key within ±delta seconds —
    time-bin bucket join + exact predicate (see module docstring)."""
    lsec = _epoch_seconds(left, ts)
    l = left.withColumn("_lsec", lsec).withColumn(
        "_bin", F.floor(F.col("_lsec") / F.lit(delta_seconds)).cast("long")
    )
    rsec = _epoch_seconds(right, ts)
    r = right.withColumn("_rsec", rsec).select(
        F.col(key),
        F.col("_rsec"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right.columns if c != key],
    ).withColumn(
        "_bin",
        F.explode(
            F.array(
                *[
                    F.floor(F.col("_rsec") / F.lit(delta_seconds)).cast("long") + o
                    for o in (-1, 0, 1)
                ]
            )
        ),
    )
    dt = F.col("_lsec") - F.col("_rsec")
    return (
        l.join(r, [key, "_bin"])
        .filter(F.abs(dt) <= delta_seconds)
        .drop("_bin", "_lsec", "_rsec")
    )


def interval_join_sql(
    left_table: str,
    right_table: str,
    key: str,
    ts: str,
    delta_seconds: float,
    left_select: str,
    right_payload: list[str],
    suffix: str = "_r",
) -> str:
    """DuckDB twin: the index-free exact form (plain inequality join)
    — independent of the binning strategy."""
    pay = ", ".join(f"r.{c} AS {c}{suffix}" for c in right_payload)
    return (
        f"SELECT {left_select}, {pay} FROM {left_table} l "
        f"JOIN {right_table} r ON l.{key} = r.{key} "
        f"AND abs(epoch(l.{ts}) - epoch(r.{ts})) <= {delta_seconds!r}"
    )

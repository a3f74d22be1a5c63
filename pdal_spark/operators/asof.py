"""As-of join — the timeseries join Spark's DataFrame API lacks.

For every LEFT row, attach the latest RIGHT row of the same key whose
timestamp is <= the left timestamp (the "last known state at event
time" join: price at trade time, sensor reading at sample time, last
page view before a click).

Execution shape (the scale-right form — no range-condition join, no
per-row probe): union both sides tagged, ONE exchange on the key, and
a partitioned window ordered by (ts, side) carrying the right side's
payload forward with last(..., ignorenulls=True) over ROWS UNBOUNDED
PRECEDING — a streaming-friendly cumulative window, never a global
one and never an O(left x right) range join. Rows at equal timestamps
order right-before-left, which implements the <= bound.

The DuckDB oracle is the engine's own native ASOF JOIN — a fully
independent implementation of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    payload: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row + the latest right ``payload``
    columns at or before its ``ts`` (NULLs where no right row precedes).

    ``on`` is the equality key, ``ts`` the ordering column (same name
    both sides), ``payload`` the right columns to carry (each emitted
    as ``<name><suffix>``)."""
    lcols = left.columns
    # payload travels as ONE struct so every output column comes from
    # the SAME right row — per-column last(ignorenulls) would fall back
    # to an older row for a column that is NULL in the latest one,
    # fabricating a (col_a, col_b) combination no right row ever held.
    pay_struct = F.struct(*[F.col(c).alias(c) for c in payload])
    null_struct = F.lit(None).cast(
        "struct<"
        + ", ".join(f"{c}: {right.schema[c].dataType.simpleString()}" for c in payload)
        + ">"
    )
    tagged_l = left.select(
        *lcols, F.lit(1).alias("_side"), null_struct.alias("_p")
    )
    tagged_r = right.select(
        *[
            (F.col(c) if c in (on, ts) else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        pay_struct.alias("_p"),
    )
    u = tagged_l.unionByName(tagged_r)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_m", F.last(F.col("_p"), ignorenulls=True).over(w))
    return (
        u.filter(F.col("_side") == 1)
        .select(
            *lcols,
            *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in payload],
        )
    )


def asof_join_sql(
    left_table: str,
    right_table: str,
    on: str,
    ts: str,
    payload: list[str],
    left_select: str,
    suffix: str = "_r",
) -> str:
    """DuckDB twin using the engine's NATIVE ASOF LEFT JOIN (match on
    r.ts <= l.ts, latest wins) — an independent implementation."""
    pay = ", ".join(f"r.{c} AS {c}{suffix}" for c in payload)
    return (
        f"SELECT {left_select}, {pay} FROM {left_table} l "
        f"ASOF LEFT JOIN {right_table} r "
        f"ON l.{on} = r.{on} AND r.{ts} <= l.{ts}"
    )

"""KMV (k-minimum-values) distinct-count sketch.

The classic bottom-k sketch (Bar-Yossef et al. 2002): hash every value
with a fixed uniform hash, keep the k smallest DISTINCT hashes per
group. ``|sketch| < k`` means the group's full distinct set was seen
(exact count); otherwise the k-th smallest hash estimates cardinality
as ``(k-1) * M / h_k`` (hashes ~ uniform on [0, M)). Sketches merge by
union + re-truncate, which is what makes the operator work at 100 TB:

  * phase 1 (map-side, mapInPandas): each PARTITION emits at most k
    hashes per group it touches — the sketch state is bounded by
    (groups-in-partition x k) regardless of row count;
  * phase 2: one exchange on the group key; partial sketches merge
    with pure array expressions (flatten -> distinct -> sort -> slice)
    — per-group state is bounded by (partitions x k), never by the
    group's row count.

The hash is the repo's affine cipher over the Mersenne prime 2^31-1
(same family as relational.shuffle_key_sql) — exact integer math,
bit-identical in Spark, DuckDB, and numpy, so the SQL twin compares
the sketch CONTENT exactly, not just the estimate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

P31 = 2_147_483_647


def _hash_params(seed: int) -> tuple[int, int]:
    # splitmix-style derivation, reduced mod P31; a != 0
    a = ((seed * 2654435761 + 0x9E3779B9) % (P31 - 1)) + 1
    b = (seed * 40503 + 7) % P31
    return a, b


def kmv_hash(value: Column, seed: int = 7) -> Column:
    """Uniform hash of an integer column onto [0, P31)."""
    a, b = _hash_params(seed)
    return (F.lit(a) * F.pmod(value.cast("long"), F.lit(P31)) + F.lit(b)) % F.lit(
        P31
    )


def kmv_hash_sql(value: str, seed: int = 7) -> str:
    a, b = _hash_params(seed)
    return f"(({a} * ((({value}) % {P31} + {P31}) % {P31}) + {b}) % {P31})"


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    seed: int = 7,
) -> DataFrame:
    """Per-group KMV sketch + cardinality estimate.

    Output: group_cols + (sketch array<long>, n_in_sketch, kth_hash,
    est_distinct). ``est_distinct`` is exact when n_in_sketch < k."""
    import pandas as pd

    # NULL values don't count toward distinct cardinality (SQL
    # count(DISTINCT x) semantics); NULL GROUP KEYS are kept as their
    # own group like SQL GROUP BY (pandas groupby must not drop them).
    h = kmv_hash(F.col(value_col), seed)
    hashed = df.select(*group_cols, h.alias("_h")).filter(
        F.col("_h").isNotNull()
    )

    schema = (
        ", ".join(f"{c} {hashed.schema[c].dataType.simpleString()}" for c in group_cols)
        + ", _partial array<bigint>"
    )

    def partial(batches):
        acc: dict[tuple, set] = {}
        for pdf in batches:
            for key, sub in pdf.groupby(group_cols, sort=False, dropna=False):
                if not isinstance(key, tuple):
                    key = (key,)
                s = acc.setdefault(key, set())
                s.update(int(v) for v in sub["_h"].unique())
                if len(s) > 4 * k:  # re-truncate opportunistically
                    acc[key] = set(sorted(s)[:k])
        rows = []
        for key, s in acc.items():
            rows.append((*key, sorted(s)[:k]))
        if rows:
            yield pd.DataFrame(rows, columns=[*group_cols, "_partial"])

    partials = hashed.mapInPandas(partial, schema)
    merged = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("_partial")))),
        1,
        k,
    )
    out = partials.groupBy(*group_cols).agg(merged.alias("sketch"))
    m = F.size("sketch")
    kth = F.element_at("sketch", F.least(F.lit(k), m))
    est = F.when(m < k, m.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(P31)) / kth.cast("double")
    )
    return out.select(
        *group_cols,
        "sketch",
        m.cast("long").alias("n_in_sketch"),
        kth.alias("kth_hash"),
        F.round(est, 6).alias("est_distinct"),
    )


def kmv_sketch_sql(
    table: str,
    group_cols: list[str],
    value_expr: str,
    k: int = 64,
    seed: int = 7,
    with_sketch: bool = False,
) -> str:
    """DuckDB twin — the single-pass reference form (list of distinct
    hashes, sorted, truncated). Identical sketch content and estimate.
    ``with_sketch=False`` omits the array column (scalar-only output
    for the driver's value-hash compare)."""
    g = ", ".join(group_cols)
    h = kmv_hash_sql(value_expr, seed)
    sk = f"list_slice(list_sort(list_distinct(list({h}))), 1, {k})"
    cols = f"{g}, sketch, " if with_sketch else f"{g}, "
    return (
        f"SELECT {cols}"
        f"CAST(len(sketch) AS BIGINT) AS n_in_sketch, "
        f"sketch[least({k}, len(sketch))] AS kth_hash, "
        f"round(CASE WHEN len(sketch) < {k} THEN CAST(len(sketch) AS DOUBLE) "
        f"ELSE {float(k - 1)!r} * {float(P31)!r} / sketch[{k}] END, 6) "
        f"AS est_distinct "
        f"FROM (SELECT {g}, {sk} AS sketch FROM {table} "
        f"WHERE ({h}) IS NOT NULL GROUP BY {g})"
    )

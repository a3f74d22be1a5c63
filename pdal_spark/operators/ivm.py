"""Incremental view maintenance over a change-data-feed.

The 100 TB consumer pattern: a per-key aggregate (tile counts, domain
stats, token totals) maintained WITHOUT rescanning the table — each
snapshot delta folds into the standing aggregate. Append-only diffs
already compose this way (tests
test_incremental_counts_merge_to_full_recompute); this module closes
the loop for UPDATES and DELETES via `catalog.changes()`: an update
arrives as its delete+insert pair, so signed counting makes the
aggregate exact again.

Classic self-maintainable aggregates only (Gupta & Mumick's
distributive class): COUNT and SUM fold with +1/-1 signs; MIN/MAX are
NOT self-maintainable under deletes (a removed extremum needs a
rescan) and are deliberately absent. One combinable exchange over the
delta (which is sized by the CHANGE, not the table) + one over the
union with the standing aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["aggregate_state", "maintain_aggregate"]


def aggregate_state(df: DataFrame, keys: list[str],
                    sum_cols: tuple = (), count_col: str = "n") -> DataFrame:
    """The maintainable aggregate of a table: per-key COUNT + SUMs."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias(count_col),
        *[F.sum(F.col(c).cast("long")).alias(f"sum_{c}") for c in sum_cols],
    )


def maintain_aggregate(
    base: DataFrame, changes: DataFrame, keys: list[str],
    sum_cols: tuple = (), count_col: str = "n",
) -> DataFrame:
    """Fold a CDF frame (rows + ``_change_type`` insert/delete) into a
    standing aggregate produced by :func:`aggregate_state`. Exact:
    maintained == aggregate_state(new table) for any change set
    (pytest + driver-oracle pinned). Groups whose count reaches zero
    vanish, new groups appear."""
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    delta = changes.groupBy(*keys).agg(
        F.sum(sign).alias(count_col),
        *[
            F.sum(sign * F.col(c).cast("long")).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )
    merged = base.unionByName(delta).groupBy(*keys).agg(
        F.sum(count_col).alias(count_col),
        *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
    )
    return merged.filter(F.col(count_col) > 0)

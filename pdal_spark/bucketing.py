"""Bucketed-table layout: storage-level join co-location.

At 100 TB the dominant RECURRING cost is re-shuffling the pages table
every time it joins a per-doc sidecar (quality scores, dedup verdicts,
pack manifests, kNN neighbor tables). Spark's bucketed tables move that
shuffle to WRITE TIME, once: ``bucketBy(n, key)`` hash-partitions the
files by the join key (Murmur3, the same function the shuffle uses), so
two tables bucketed into the same ``n`` on the same key sort-merge-join
with ZERO exchanges — every scan task reads bucket i of both sides.
``sortBy`` additionally pre-sorts within buckets, removing the Sort
nodes too. The reference's tile-indexed directory trees
(/root/reference/kernels/TileKernel.cpp one-file-per-tile layout;
io/TIndexReader.cpp dispatch) are the same idea at the file-system
level: co-locate by key at write time so readers never re-partition.

The catalog entry is what carries the bucket spec; plain
``spark.read.parquet`` on the same files would NOT know the layout
(Spark would re-shuffle). That is why these helpers go through
``saveAsTable`` — on a real deployment the table lives in the shared
metastore/Iceberg catalog; in-sandbox the session catalog plays that
role and the plan-shape tests assert the exchanges are actually gone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join", "n_exchanges", "n_sorts"]


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (and optionally bucket-sorted)
    parquet table registered in the session catalog. ``path`` makes it
    an external table (useful for temp dirs in tests)."""
    if sort:
        # one FILE per bucket: Spark only propagates the sortBy ordering
        # out of a bucketed scan when each bucket is a single file
        # (multi-file buckets would need a merge to stay sorted) —
        # repartition on the bucket key with numPartitions == n_buckets
        # uses the same murmur3 hash as the bucket spec, so every task
        # holds exactly one bucket's rows and writes exactly one file.
        df = df.repartition(n_buckets, *bucket_cols)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(name)


def bucketed_join(
    spark: SparkSession,
    left: str,
    right: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key. With
    matching bucket specs the physical plan is a SortMergeJoin whose
    children are bare bucketed scans — no Exchange on either side (and
    no Sort either when the tables were written sortBy the key into
    one file per bucket).

    Sets ``spark.sql.legacy.bucketedTableScan.outputOrdering``: Spark
    only propagates bucket-sort order after LISTING files to confirm
    each bucket is a single file (correct but planning-cost-bearing,
    hence opt-in); write_bucketed's aligned repartition guarantees the
    single-file layout, so the listing always succeeds here."""
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    )
    return spark.table(left).join(spark.table(right), on, how)


def n_exchanges(df: DataFrame) -> int:
    """Count SHUFFLE Exchange operators in the executed plan (plan-
    shape evidence helper; 0 for a properly co-bucketed join).
    BroadcastExchange is deliberately not counted — it ships a hashed
    small side to every executor, which is the cheap co-location
    mechanism, not the all-to-all repartition bucketing eliminates."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
        or "Exchange rangepartitioning" in line
        or "Exchange RoundRobinPartitioning" in line
        or "Exchange SinglePartition" in line
    )


def n_sorts(df: DataFrame) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "- Sort [" in line or line.startswith("Sort [")
    )

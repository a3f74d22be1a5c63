#!/usr/bin/env python
"""spark-submit entry point for the north-star tile job.

The deployment shape the engine is designed for:

    spark-submit --master <cluster> \\
        --py-files pdal_spark.zip \\
        tools/submit_tile_job.py \\
        --input  s3://bucket/pages/   (or --synth-pages N for a dry run)
        --output s3://bucket/tiles/

Pipeline: read Common-Crawl-style pages (url, warc_ts, html, text,
lang) -> deterministic geocode -> bbox crop -> splitter tiling ->
per-tile partitioned parquet, executed through lineage.ResumableJob:
the tile grid is split into row STRIPES, each stripe is one
write-then-commit batch, and a restarted job skips every committed
stripe (crash between data write and ledger append re-runs just that
stripe — at-least-once write, exactly-once commit). The ledger doubles
as the per-partition metrics sidecar.

No repo-relative imports: everything comes from the pdal_spark package
shipped via --py-files, so the script runs unmodified on a real
multi-executor cluster.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet dir of pages (url, warc_ts, html, text, lang)")
    src.add_argument("--synth-pages", type=int, help="synthesize N pages instead of reading input")
    p.add_argument("--output", required=True, help="output dir (tiles + _ledger)")
    p.add_argument("--tile-len", type=float, default=30.0)
    p.add_argument("--origin-x", type=float, default=-180.0)
    p.add_argument("--origin-y", type=float, default=-90.0)
    p.add_argument("--bbox", nargs=4, type=float, metavar=("MINX", "MINY", "MAXX", "MAXY"),
                   default=[-140.0, -60.0, 140.0, 75.0], help="crop bbox")
    p.add_argument("--stripes", type=int, default=4,
                   help="resumable batches = tile-row stripes")
    p.add_argument("--catalog", default=None,
                   help="optional snapshot-table dir: each completed "
                        "stripe also commits one catalog snapshot "
                        "(Iceberg-protocol append, idempotent on rerun)")
    return p.parse_args(argv)


def main(argv: list[str]) -> None:
    args = parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pdal_spark import synth
    from pdal_spark.lineage import ResumableJob
    from pdal_spark.operators import crop as crop_op
    from pdal_spark.operators import splitter as splitter_op

    spark = SparkSession.builder.appName("pdal_spark-tile-job").getOrCreate()

    if args.synth_pages:
        pages = synth.with_coords(synth.synth_pages(spark, args.synth_pages))
    else:
        pages = synth.with_coords(spark.read.parquet(args.input))

    box = crop_op.Box(*args.bbox)
    cropped = crop_op.crop(
        pages.select("url", "warc_ts", "text", "x", "y"), [box], mode="stream"
    )
    tiled = splitter_op.split(cropped, args.tile_len, args.origin_x, args.origin_y)

    # resumable stripes over tile rows: every tile_y lands in exactly one
    # stripe, so stripes partition the output and retries stay idempotent
    n_rows_total = int((args.bbox[3] - args.origin_y) / args.tile_len) + 1
    per = -(-n_rows_total // args.stripes)
    lo_row = int((args.bbox[1] - args.origin_y) / args.tile_len)

    def stripe(spark_, bid: str):
        i = int(bid.split("_")[1])
        lo, hi = lo_row + i * per, lo_row + (i + 1) * per
        return tiled.filter(
            (F.col("tile_y") >= lo) & (F.col("tile_y") < hi)
        )

    job = ResumableJob(spark, args.output)
    t0 = time.time()
    timings = job.run([f"stripe_{i}" for i in range(args.stripes)], stripe)
    ledger = job.ledger().orderBy("batch_id").collect()

    snapshots = []
    if args.catalog:
        # per-stripe catalog snapshots: the ledger gives exactly-once
        # batch commits, the labeled append gives exactly-once SNAPSHOT
        # commits — a rerun skips stripes already in history()
        from pdal_spark.catalog import SnapshotTable

        table = SnapshotTable(spark, args.catalog, stats_cols=("x", "y"))
        done = table.committed_operations()
        for r in ledger:
            if r.batch_id in done:
                continue
            v = table.append(stripe(spark, r.batch_id), operation=r.batch_id)
            snapshots.append({"stripe": r.batch_id, "version": v})
    print(json.dumps({
        "ran_batches": sorted(timings),
        "skipped_batches": sorted(
            {r.batch_id for r in ledger} - set(timings)
        ),
        "total_rows": sum(r.n_rows for r in ledger),
        "wall_s": round(time.time() - t0, 2),
        "catalog_snapshots": snapshots,
    }))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])

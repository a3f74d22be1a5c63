#!/usr/bin/env python
"""Partition-count sweep for the shuffle-heavy kNN workload (judge
follow-up on BENCH/BASELINE.md workload 2's 0.62 efficiency).

Question: is the sub-0.8 core-count scaling of the cell-bucketed kNN
join a parallelism/spill artifact (fixable by sizing
spark.sql.shuffle.partitions) or a hardware bound of a single shared-
memory box? Sweep the partition count at fixed cores: if wall-time is
flat, the job is neither partition-starved nor spilling — the residual
gap to linear scaling is the shared memory-bandwidth wall, which a real
multi-NODE cluster does not share (each node brings its own bandwidth).

Run: python tools/knn_sweep.py [n_points]  -> prints JSON per config.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_knn(cpus: int, parts: int, n: int, reps: int = 3) -> dict:
    code = f"""
import time, json
from pyspark.sql import functions as F
from pdal_spark.session import get_spark
from pdal_spark import synth
from pdal_spark.operators import knn
sp = get_spark(master="local[{cpus}]", shuffle_partitions={parts})
pts = synth.synth_points(sp, {n}, num_partitions={cpus}*2).cache(); pts.count()
src = pts.select(F.col("page_id").alias("src_id"), "x", "y")
cand = pts.select(F.col("page_id").alias("cand_id"), "x", "y")
best = None
for rep in range({reps}):
    t0 = time.time()
    knn.knn_join(src, cand, 8, cell_size=1.2, exclude_self=True,
                 salt_threshold=None)\\
       .write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({{"sec": round(best,2), "points_per_sec": round({n}/best,1)}}))
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1800, cwd=REPO)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.strip().startswith("{"):
            return json.loads(line)
    raise RuntimeError(out.stdout[-1000:] + out.stderr[-1000:])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 700_000
    results = {}
    for cpus, parts_list in ((16, (16, 32, 64, 128, 256)), (4, (4, 16, 64))):
        for parts in parts_list:
            r = run_knn(cpus, parts, n)
            results[f"local[{cpus}]x{parts}p"] = r
            print(f"local[{cpus}] parts={parts}: {r}", file=sys.stderr)
    print(json.dumps({"n": n, "sweep": results}))


if __name__ == "__main__":
    main()

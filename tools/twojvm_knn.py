#!/usr/bin/env python
"""Two-JVM scaling proof for the halo-block kNN kernel (round-5 lead
task, VERDICT r4 §Next 1): is the 0.68 real-cluster efficiency a
single-box memory-system ceiling or a kernel defect?

Design (same as tools/twojvm_maponly.py, which settled the map-only
family's 0.36 the same way): run the SAME kNN self-join workload
(synth_points -> knn_join k=8, the cluster_bench.py job) (a) in ONE
local[8] JVM, then (b) in TWO CONCURRENT local[8] JVMs over
INDEPENDENT same-size point sets (disjoint id/coordinate ranges, own
heaps, own GC, own python worker pools) — the closest single-box
analog of two executor NODES. If the concurrent pair finishes in ~the
single-run wall time (efficiency ~0.85+ like the map-only case), the
residual 0.68 -> 0.8 gap is the box's shared LLC/DRAM, which each
node of a real cluster brings its own copy of; if the pair degrades
toward 2x, the kernel itself doesn't scale and needs work.

PDAL_SPARK_FORCE_DISTRIBUTED=1 pins the cogroup-kernel plan shape
(the subject of the measurement), exactly as the plan census does.

Run: python tools/twojvm_knn.py [points]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CODE = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from pdal_spark import synth
from pdal_spark.operators import knn

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
# disjoint halves: shift ids (and thereby the LCG coordinates) per JVM
pts = synth.synth_points(spark, {points}, num_partitions=16).withColumn(
    "page_id", F.col("page_id") + F.lit({half} * 1000000000)
).cache()
pts.count()
spark.range(0, 1000, 1, 8).count()  # warm executor threads
src = pts.select(F.col("page_id").alias("src_id"), "x", "y")
cand = pts.select(F.col("page_id").alias("cand_id"), "x", "y")
best = None
for rep in range(2):  # rep 1 pays JIT/codegen warmup
    t0 = time.time()
    n = knn.knn_join(src, cand, 8, cell_size=1.2, exclude_self=True).count()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print("RESULT" + json.dumps(dict(sec=round(best, 3), rows=n)))
"""


def _proc(half: int, points: int) -> subprocess.Popen:
    env = dict(os.environ, PDAL_SPARK_FORCE_DISTRIBUTED="1")
    return subprocess.Popen(
        [sys.executable, "-c", CODE.format(repo=REPO, half=half,
                                           points=points)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=env,
    )


def _result(p: subprocess.Popen) -> dict:
    out, _ = p.communicate(timeout=3600)
    for line in out.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line[len("RESULT"):])
    raise RuntimeError("no RESULT line in:\n" + out[-2000:])


def main() -> None:
    points = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    best = {"single": None, "pair": None}
    for rep in range(3):
        r = _result(_proc(0, points))
        if best["single"] is None or r["sec"] < best["single"]:
            best["single"] = r["sec"]
        print(f"rep{rep} single local[8]: {r['sec']}s ({r['rows']} rows)",
              flush=True)
        pa, pb = _proc(1, points), _proc(2, points)
        ra, rb = _result(pa), _result(pb)
        # compare compute windows, not process startup skew: the pair
        # wall is the max of the two timed regions
        pair = max(ra["sec"], rb["sec"])
        if best["pair"] is None or pair < best["pair"]:
            best["pair"] = pair
        print(f"rep{rep} pair 2x local[8]: {ra['sec']}s / {rb['sec']}s",
              flush=True)
    eff = best["single"] / best["pair"]
    print(json.dumps({
        "workload": "knn_kernel_two_jvm",
        "points_per_jvm": points,
        "single_jvm_sec": best["single"],
        "concurrent_pair_sec": best["pair"],
        "two_node_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()

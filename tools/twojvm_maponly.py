#!/usr/bin/env python
"""Two-JVM scaling proof for the map-only family (BENCH/BASELINE.md):
is winnow_fp's weak single-JVM core-count curve a JVM artifact or a
machine artifact?

Design: run the SAME 100k-doc winnow_fp job (a) in ONE local[8] JVM,
then (b) in TWO CONCURRENT local[8] JVMs (disjoint halves, own heaps,
own GC) — the closest single-box analog of two executor nodes. If the
concurrent pair finishes in ~the single-run wall time, per-JVM
allocation/GC is the bottleneck and adding executors scales cleanly;
if the pair degrades toward 2x, the box's shared memory bandwidth is
the wall.

Run: python tools/twojvm_maponly.py [reps_per_jvm]
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
from pdal_spark.datapipe import winnow as W

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
    "doc_id", "text"
)
parts = [base.withColumn("doc_id", F.col("doc_id") + F.lit(({half} * 1000 + i) * 1000000))
         for i in range({reps})]
df = parts[0]
for p in parts[1:]:
    df = df.unionByName(p)
df = df.repartition(32).cache()
n_docs = df.count()
t0 = time.time()
n_fp = W.winnow_fingerprints(df, k=8, w=4).count()
dt = time.time() - t0
print("RESULT" + json.dumps(dict(sec=round(dt, 3), n_docs=n_docs)))
"""


def _proc(half: int, reps: int) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, "-c", CODE.format(repo=REPO, half=half, reps=reps)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )


def _result(p: subprocess.Popen) -> dict:
    out, _ = p.communicate(timeout=1800)
    for line in out.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line[len("RESULT"):])
    raise RuntimeError("no RESULT line")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    best = {"single": None, "pair": None}
    for rep in range(3):
        r = _result(_proc(0, reps))
        if best["single"] is None or r["sec"] < best["single"]:
            best["single"] = r["sec"]
        print(f"rep{rep} single local[8]: {r['sec']}s", flush=True)
        t0 = time.time()
        pa, pb = _proc(1, reps), _proc(2, reps)
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
        "workload": "winnow_fp_two_jvm",
        "single_jvm_sec": best["single"],
        "concurrent_pair_sec": best["pair"],
        "two_node_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()

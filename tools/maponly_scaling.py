#!/usr/bin/env python
"""Scaling-efficiency evidence for the MAP-ONLY operator family
(BENCH/BASELINE.md §5): winnowing fingerprint extraction — char-gram
md5 hashing + window minima as pure array codegen, zero exchanges —
run at local[4] vs local[16] on the same input (the scaling_bench.py
methodology: fresh JVM per run, best-of-3, 4->16 stays within the
VM's 16 physical cores).

A map-only job is the cleanest cluster proxy available on one box:
with no shuffle and no shared state, per-core throughput is limited
only by CPU, exactly as adding executor nodes would be.

Run: python tools/maponly_scaling.py [replicas] [lo] [hi]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CODE = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from pdal_spark.datapipe import winnow as W

spark = (
    SparkSession.builder.master("local[{cores}]")
    .config("spark.sql.shuffle.partitions", "{cores}")
    .config("spark.driver.memory", "8g")  # local-mode default 1g is
    .config("spark.ui.enabled", "false")  # GC-bound at 16 cores
    .getOrCreate()
)
base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
    "doc_id", "text"
)
parts = [base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1000000))
         for i in range({reps})]
df = parts[0]
for p in parts[1:]:
    df = df.unionByName(p)
df = df.repartition({cores} * 4).cache()
n_docs = df.count()  # materialize outside the timed region
t0 = time.time()
n_fp = W.winnow_fingerprints(df, k=8, w=4).count()
dt = time.time() - t0
print("RESULT" + json.dumps(
    dict(cores={cores}, sec=round(dt, 3), n_docs=n_docs, n_fp=n_fp,
         docs_per_sec=round(n_docs / dt, 1))
))
"""


def run(cores: int, reps: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CODE.format(repo=REPO, cores=cores, reps=reps)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line[len("RESULT"):])
    raise RuntimeError(out.stderr[-2000:])


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    best = {}
    for rep in range(3):
        for cores in (lo, hi):
            r = run(cores, reps)
            k = str(cores)
            if k not in best or r["sec"] < best[k]["sec"]:
                best[k] = r
            print(f"rep{rep} c{cores}: {r['sec']}s", flush=True)
    eff = (
        best[str(hi)]["docs_per_sec"]
        / best[str(lo)]["docs_per_sec"]
        / (hi / lo)
    )
    print(json.dumps({"workload": "winnow_fp_maponly", "lo": best[str(lo)],
                      "hi": best[str(hi)], "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()

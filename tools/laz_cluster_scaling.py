#!/usr/bin/env python
"""Chunk-parallel .laz DECODE at 1 vs 4 executor JVMs — the round-5
extension of the cluster harness to the LAS/LAZ format-I/O workload
(BENCH/BASELINE.md §6 measured the uncompressed reader at local[N];
this measures the laszip decoder on the REAL standalone cluster, the
same deployment shape as §6b/6c).

Setup: synthesize one .laz driver-side via the chunk-parallel writer
(local[32], fixed 100k-point chunks), then run `read_las` + a
count/sum aggregate at spark.cores.max=4 (ONE 4-core executor) vs 16
(FOUR 4-core executors) on a standalone master + 4 workers.  Each
laszip chunk is one task (one seek + one sequential entropy decode);
parallelism comes from the chunk manifest, so one file saturates all
executors.

Run: python tools/laz_cluster_scaling.py [points] [attempts]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from cluster_bench import (  # noqa: E402
    MASTER_URL, _spark_home, build_zip, start_cluster, stop_cluster,
)


def synth_laz(path: str, n: int) -> None:
    code = f"""
import sys
sys.path.insert(0, {REPO!r})
from pyspark.sql import functions as F
from pdal_spark.session import get_spark
from pdal_spark import synth
from pdal_spark.formats import las

sp = get_spark(master="local[32]", shuffle_partitions=32)
pts = synth.synth_points(sp, {n}).select(
    "x", "y",
    (F.col("page_id") % 1000 * 0.05).alias("z"),
    (F.col("page_id") % 65536).cast("int").alias("intensity"),
    ((F.col("page_id") % 5) + 1).cast("int").alias("return_number"),
    F.lit(5).cast("int").alias("number_of_returns"),
    F.col("page_id").cast("double").alias("gps_time"),
)
info = las.write_las(pts, {path!r}, fmt=1, scales=(1e-6, 1e-6, 1e-4),
                     compression=True, order_by=["gps_time"],
                     chunk_size=100_000)
print("WROTE", info["count"], info["chunks"])
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600, cwd=REPO)
    if "WROTE" not in out.stdout:
        raise RuntimeError(f"synth failed: {out.stdout[-800:]}"
                           f"\n{out.stderr[-1500:]}")
    print(out.stdout.strip().splitlines()[-1], file=sys.stderr)


DRIVER = """
import json, time
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("{master}")
    .appName("laz-decode-x{cores_max}")
    .config("spark.cores.max", "{cores_max}")
    .config("spark.executor.cores", "4")
    .config("spark.executor.memory", "6g")
    .config("spark.sql.shuffle.partitions", "{cores_max}")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate())
spark.sparkContext.addPyFile("{zip_path}")
import time as _t
want = {cores_max} // 4
t0 = _t.time()
while _t.time() - t0 < 60:
    if spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1 \
            >= want:
        break
    _t.sleep(0.5)
spark.range(0, 1000, 1, {cores_max}).count()

from pdal_spark.formats import las
best = None
for rep in range(2):  # rep 1 pays JIT + python-worker warmup
    t0 = time.time()
    df = las.read_las(spark, {path!r})
    row = df.agg(F.count("*").alias("n"), F.sum("z").alias("sz")).collect()[0]
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print("RESULT " + json.dumps({{"sec": round(best, 2),
                               "points_per_sec": round(row.n / best, 1),
                               "n": row.n}}))
spark.stop()
"""


def run_decode(cores_max: int, zip_path: str, path: str) -> dict:
    code = DRIVER.format(master=MASTER_URL, cores_max=cores_max,
                         zip_path=zip_path, path=path)
    env = dict(os.environ, SPARK_HOME=_spark_home())
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600, cwd="/tmp", env=env)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"driver failed: {out.stdout[-1500:]}"
                       f"\n{out.stderr[-1500:]}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    attempts = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    path = os.path.join(tempfile.gettempdir(), f"laz_scale_{n}.laz")
    if not os.path.exists(path):
        synth_laz(path, n)
    zip_path = build_zip()
    procs = start_cluster(n_workers=4, cores=4, mem="8g")
    try:
        pairs = []
        for att in range(attempts):
            lo = run_decode(4, zip_path, path)
            hi = run_decode(16, zip_path, path)
            eff = lo["sec"] / hi["sec"] / 4.0
            pairs.append((eff, lo, hi))
            print(json.dumps({"attempt": att, "eff": round(eff, 2),
                              "lo": lo, "hi": hi}), flush=True)
        pairs.sort(key=lambda t: t[0])
        eff, lo, hi = pairs[len(pairs) // 2]
        print(json.dumps({
            "workload": "laz_decode_cluster",
            "points": n,
            "file_mb": round(os.path.getsize(path) / 1e6, 1),
            "executors_1x4cores": lo, "executors_4x4cores": hi,
            "efficiency_median": round(eff, 2),
            "efficiency_attempts": [round(e, 2) for e, _l, _h in pairs],
        }))
    finally:
        stop_cluster(procs)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()

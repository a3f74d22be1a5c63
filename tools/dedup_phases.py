#!/usr/bin/env python
"""Per-phase timing of the minhash dedup pipeline on the standalone
cluster — diagnostic companion to cluster_bench.py (which showed the
end-to-end job flat at ~48 s for both 4 and 16 cores).

Run: python tools/dedup_phases.py [docs] [cores_max ...]
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from cluster_bench import MASTER_URL, _spark_home, build_zip, start_cluster, stop_cluster

PHASED = """
import time
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("{master}")
    .appName("dedup-phases-{cores_max}")
    .config("spark.cores.max", "{cores_max}")
    .config("spark.executor.cores", "4")
    .config("spark.executor.memory", "6g")
    .config("spark.sql.shuffle.partitions", "{cores_max}")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate())
spark.sparkContext.addPyFile("{zip_path}")

from pdal_spark import synth
from pdal_spark.datapipe import dedup

t0 = time.time()
while time.time() - t0 < 60:
    if spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1 >= {cores_max} // 4:
        break
    time.sleep(0.5)
spark.range(0, 1000, 1, {cores_max}).count()

df = synth.synth_corpus(spark, {docs}, num_partitions={cores_max} * 2).cache()
df.count()

def mark(label, t0):
    t1 = time.time()
    print(f"PHASE {{label}}: {{t1 - t0:.1f}}s", flush=True)
    return t1

t = time.time()
words = dedup.doc_words(df).persist()
n_words = words.count()
t = mark(f"doc_words ({{n_words}} rows)", t)

sigarr = dedup.minhash_signature_arrays(
    df, text_col="text", id_col="doc_id", word_id_mode="hash", words=words
).persist()
sigarr.count()
t = mark("signatures", t)

sets = words.groupBy("id").agg(
    F.sort_array(F.collect_list(F.xxhash64("word"))).alias("masks"),
    F.count("*").alias("sz"),
).persist()
sets.count()
t = mark("sets (word-hash arrays)", t)

rows_n = dedup.MINHASH_K // dedup.MINHASH_BANDS
bnd = sigarr.select(
    "id", "sig",
    F.explode(F.sequence(F.lit(0), F.lit(dedup.MINHASH_BANDS - 1))).alias("band"),
).withColumn(
    "key",
    F.array_join(
        F.transform(
            F.slice(F.col("sig"), F.col("band") * rows_n + 1, F.lit(rows_n)),
            lambda x: x.cast("string"),
        ),
        ",",
    ),
)
keyed = bnd.join(sets.select("id", "sz"), "id")
out = dedup._fetch_verified_pairs(
    keyed, sets, 0.8, band_dedup=(dedup.MINHASH_BANDS, rows_n)
)
n = out.count()
t = mark(f"band join + fetch verify ({{n}} pairs)", t)
spark.stop()
"""


def main() -> None:
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    configs = [int(c) for c in sys.argv[2:]] or [4, 16]
    zip_path = build_zip()
    procs = start_cluster(n_workers=4, cores=4, mem="8g")
    try:
        for cores in configs:
            print(f"=== cores_max={cores} ===", flush=True)
            code = PHASED.format(master=MASTER_URL, cores_max=cores,
                                 zip_path=zip_path, docs=docs)
            env = dict(os.environ, SPARK_HOME=_spark_home())
            out = subprocess.run([sys.executable, "-c", code],
                                 capture_output=True, text=True,
                                 timeout=1800, cwd="/tmp", env=env)
            for line in out.stdout.splitlines():
                if line.startswith("PHASE"):
                    print(line, flush=True)
            if out.returncode != 0:
                print(out.stderr[-1500:])
    finally:
        stop_cluster(procs)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()

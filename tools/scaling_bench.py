#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule (BENCH/BASELINE.md).

No real cluster exists in this sandbox, so the N-vs-4N-executor
criterion is evidenced the prescribed way: the same jobs on the same
input at two parallelism levels — local[4] vs local[16], fresh JVM each,
best-of-3 reps (the host shows bursty CPU steal). 4 and 16 both sit
within the VM's 16 PHYSICAL cores (32 vCPUs = 16 cores + SMT; the raw
probe below shows x32 is only ~25x of x1, so 8->32 can never show a
clean 4x — 4->16 is the honest 4x pair).

Workloads:
  1. compute-dense tile job — synthesize pages, sha256 geocode, bbox
     crop, splitter tiling, per-tile counts; all compute, no storage.
     This is the cluster-scaling proxy: on a real multi-node cluster
     every executor brings its own memory bandwidth and disks, so
     node-count scaling tracks the CPU-bound curve.
  2. spatial kNN join — cell-bucketed k=8 self-join over 400k points
     (shuffle + per-cell window): partially bound by the VM's SHARED
     memory bandwidth, the known worst case for single-box core-count
     scaling (a real cluster adds bandwidth with nodes).
  3. skew scenario — hot-mega-cell kNN, salted vs unsalted (results
     provably identical; tests/test_knn.py).

Run: python tools/scaling_bench.py [pages] [lo] [hi]
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_py(code: str, timeout: int = 1800) -> dict:
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=timeout, cwd=REPO)
    for line in reversed(out.stdout.strip().splitlines()):
        if line.strip().startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"bench failed: {out.stdout[-1500:]} {out.stderr[-1500:]}")


def run_compute_tile(cpus: int, pages: int) -> dict:
    code = f"""
import time, json
from pyspark.sql import functions as F
from pdal_spark.session import get_spark
from pdal_spark import synth
import __spark_entry__ as E
from pdal_spark.operators import crop as crop_op, splitter as splitter_op
sp = get_spark(master="local[{cpus}]", shuffle_partitions={cpus})
best = None
for rep in range(3):
    t0 = time.time()
    pages = synth.with_coords(synth.synth_pages(sp, {pages}, num_partitions={cpus}*2))
    cropped = crop_op.crop(pages.select("url","warc_ts","x","y"), [E.BOX], mode="stream")
    tiled = splitter_op.split(cropped, E.TILE_LEN, E.TILE_OX, E.TILE_OY)
    tiled.groupBy("tile_x","tile_y").agg(F.count("*").alias("n")).count()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({{"sec": round(best,2), "pages_per_sec": round({pages}/best,1)}}))
"""
    return _run_py(code)


def run_knn(cpus: int, n: int = 700_000) -> dict:
    code = f"""
import time, json
from pyspark.sql import functions as F
from pdal_spark.session import get_spark
from pdal_spark import synth
from pdal_spark.operators import knn
sp = get_spark(master="local[{cpus}]", shuffle_partitions={cpus})
pts = synth.synth_points(sp, {n}, num_partitions={cpus}*2).cache(); pts.count()
src = pts.select(F.col("page_id").alias("src_id"), "x", "y")
cand = pts.select(F.col("page_id").alias("cand_id"), "x", "y")
best = None
for rep in range(3):
    t0 = time.time()
    knn.knn_join(src, cand, 8, cell_size=1.2, exclude_self=True)\\
       .write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({{"sec": round(best,2), "points_per_sec": round({n}/best,1)}}))
"""
    return _run_py(code)


def run_dedup(cpus: int, docs: int = 1_500_000) -> dict:
    """Open-vocabulary minhash dedup pipeline (word_id_mode='hash' —
    zero vocabulary shuffles) over synth_corpus: a 2^20-token hash word
    space keeps random-doc overlap ~zero while every 100th doc is an
    exact clone, so the banded join + inline verify recover exactly
    docs/100 pairs. The measurement tracks the LINEAR pipeline
    (tokenize -> signatures -> bands -> bucket join -> verify), not a
    quadratic pair dump; the pair count doubles as a correctness
    assert."""
    code = f"""
import time, json
from pyspark.sql import functions as F
from pdal_spark.session import get_spark
from pdal_spark import synth
from pdal_spark.datapipe import dedup
sp = get_spark(master="local[{cpus}]", shuffle_partitions={cpus})
n = {docs}
df = synth.synth_corpus(sp, n, num_partitions={cpus}*2).cache()
df.count()
best = None
for rep in range(3):
    t0 = time.time()
    got = dedup.minhash_dedup_pairs(df, 0.8, word_id_mode="hash").count()
    assert got == n // 100, got  # one clone pair per planted clone
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({{"sec": round(best,2), "docs_per_sec": round({docs}/best,1),
                   "pairs": got}}))
"""
    return _run_py(code)


def run_skew(cpus: int = 16, n: int = 60_000) -> dict:
    code = f"""
import time, json
from pyspark.sql import functions as F
from pdal_spark.session import get_spark
from pdal_spark import synth
from pdal_spark.operators import knn
spark = get_spark(master="local[{cpus}]", shuffle_partitions={cpus})
pts = synth.with_skew(synth.synth_points(spark, {n}), hot_frac_pct=30)
pts = pts.cache(); pts.count()
src = pts.select(F.col("page_id").alias("src_id"), "x", "y")
cand = pts.select(F.col("page_id").alias("cand_id"), "x", "y")
def t(salt):
    # salting is DEFAULT-ON ("auto") since round 2 — the baseline must
    # pin salt_threshold=None or it silently measures salted-vs-salted
    kw = dict(salt_threshold=10000, n_salts=16) if salt \\
        else dict(salt_threshold=None)
    best = None
    for rep in range(2):
        t0 = time.time()
        knn.knn_join(src, cand, 5, cell_size=0.2, exclude_self=True, **kw)\\
           .write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return round(best, 2)
print(json.dumps({{"unsalted_sec": t(False), "salted_sec": t(True), "n": {n}}}))
"""
    return _run_py(code)


def cpu_probe() -> dict:
    import multiprocessing as mp

    def work(q):
        t0 = time.time()
        c = 0
        while time.time() - t0 < 2.0:
            c += 1
        q.put(c)

    out = {}
    for n in (1, 4, 8, 16, 32):
        q = mp.Queue()
        ps = [mp.Process(target=work, args=(q,)) for _ in range(n)]
        [p.start() for p in ps]
        [p.join() for p in ps]
        out[n] = sum(q.get() for _ in ps)
    return {f"x{n}": round(v / out[1], 2) for n, v in out.items()}


def main() -> None:
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    ratio = hi / lo

    # Methodology for a host with bursty noisy-neighbor contention (the
    # raw probe fluctuates minute to minute): measure lo/hi BACK-TO-BACK
    # as a pair per attempt — adjacent runs share contention conditions —
    # and take the MEDIAN of the per-pair efficiency ratios.
    import statistics

    attempts = int(os.environ.get("BENCH_ATTEMPTS", "5"))
    probe = cpu_probe()
    print(f"cpu probe: {probe}", file=sys.stderr)
    comp_pairs, knn_pairs, ded_pairs = [], [], []
    for att in range(attempts):
        comp = {c: run_compute_tile(c, pages) for c in (lo, hi)}
        knn = {c: run_knn(c) for c in (lo, hi)}
        ded = {c: run_dedup(c) for c in (lo, hi)}
        ec = (comp[hi]["pages_per_sec"] / comp[lo]["pages_per_sec"]) / ratio
        ek = (knn[hi]["points_per_sec"] / knn[lo]["points_per_sec"]) / ratio
        ed = (ded[hi]["docs_per_sec"] / ded[lo]["docs_per_sec"]) / ratio
        comp_pairs.append((ec, comp))
        knn_pairs.append((ek, knn))
        ded_pairs.append((ed, ded))
        print(f"[att {att}] eff compute={ec:.2f} knn={ek:.2f} dedup={ed:.2f} "
              f"comp={comp} knn={knn} ded={ded}", file=sys.stderr)
    comp_pairs.sort(key=lambda t: t[0])
    knn_pairs.sort(key=lambda t: t[0])
    ded_pairs.sort(key=lambda t: t[0])
    eff_comp, comp = comp_pairs[len(comp_pairs) // 2]   # median pair
    eff_knn, knn = knn_pairs[len(knn_pairs) // 2]
    eff_ded, ded = ded_pairs[len(ded_pairs) // 2]
    eff_comp_all = [round(e, 2) for e, _ in comp_pairs]
    eff_knn_all = [round(e, 2) for e, _ in knn_pairs]
    eff_ded_all = [round(e, 2) for e, _ in ded_pairs]
    print(f"medians: compute={eff_comp:.2f} of {eff_comp_all}, "
          f"knn={eff_knn:.2f} of {eff_knn_all}, "
          f"dedup={eff_ded:.2f} of {eff_ded_all}", file=sys.stderr)
    skew = run_skew()
    print(f"skew: {skew}", file=sys.stderr)

    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%MZ")
    md = f"""# BENCH/BASELINE — measured scaling numbers ({stamp})

Sandbox proxy for the north rule's N vs 4N executors: same job, same
input, local[{lo}] vs local[{hi}] (fresh JVM each, best of 3 reps).
Why {lo}->{hi}: the VM's 32 vCPUs are 16 physical cores + SMT — raw
parallel-CPU probe {probe}; x32 tops out at ~25x of x1, so 8->32 cannot
express a clean 4x. {lo} and {hi} both sit within physical cores.

## 1. Compute-dense tile job (headline scaling)

Synthesize {pages:,} Common-Crawl-style pages (spark.range, zero RNG) ->
sha256(url|warc_ts) geocode -> bbox crop -> splitter tiling -> per-tile
counts. All compute — the proxy for multi-node scaling, where each
added executor brings its own memory bandwidth and disks.

| config | pages | wall (s) | pages/sec |
|---|---|---|---|
| local[{lo}]  | {pages:,} | {comp[lo]['sec']} | {comp[lo]['pages_per_sec']:,.0f} |
| local[{hi}] | {pages:,} | {comp[hi]['sec']} | {comp[hi]['pages_per_sec']:,.0f} |

**Scaling efficiency ({ratio:.0f}x): {eff_comp:.2f}** — median of
per-attempt paired ratios {eff_comp_all} (north rule: >= 0.8)

## 2. Spatial kNN join (shuffle-heavy)

Cell-bucketed k=8 self-join over 700,000 points (explode 3x3
neighborhood, shuffle on cell, per-query window top-k).

| config | wall (s) | points/sec |
|---|---|---|
| local[{lo}]  | {knn[lo]['sec']} | {knn[lo]['points_per_sec']:,.0f} |
| local[{hi}] | {knn[hi]['sec']} | {knn[hi]['points_per_sec']:,.0f} |

**Scaling efficiency ({ratio:.0f}x): {eff_knn:.2f}** (median of
{eff_knn_all}) — shuffle-heavy work
on a single box is bounded by SHARED memory bandwidth across all cores
(the raw-CPU probe scales near-perfectly; the spread between it and this
number is the bandwidth wall). On a real multi-NODE cluster the shuffle
bandwidth grows with node count, so node-scaling tracks workload 1.

## 3. Skew scenario (north rule: explicit salting for hot mega-cells)

kNN (k=5) over {skew['n']:,} points with 30% of rows inside one
0.1-degree hot cell, local[16]. Salting splits cells above the count
threshold into sub-keys; query rows explode only over hot cells.
Results are provably identical salted vs unsalted
(tests/test_knn.py::test_salted_equals_unsalted).

| variant | wall (s) |
|---|---|
| unsalted (hot cell on one task) | {skew['unsalted_sec']} |
| salted (hot cell split 16-way)  | {skew['salted_sec']} |

## 4. Near-dup pipeline (minhash LSH, open vocabulary)

Minhash dedup (k-signature, banded LSH bucket
join, inline verify, word_id_mode="hash" — zero vocabulary shuffles)
over a 1,500,000-doc synth_corpus: 2^20-token hash word space (random-doc
overlap ~0) with every 100th doc an exact clone. Each run must recover
EXACTLY the {ded[lo]['pairs']:,} planted clone pairs (asserted), so the
measurement is the linear pipeline, not a quadratic pair dump.

| config | wall (s) | docs/sec |
|---|---|---|
| local[{lo}]  | {ded[lo]['sec']} | {ded[lo]['docs_per_sec']:,.0f} |
| local[{hi}] | {ded[hi]['sec']} | {ded[hi]['docs_per_sec']:,.0f} |

**Scaling efficiency ({ratio:.0f}x): {eff_ded:.2f}** (median of
{eff_ded_all})

## Raw JSON

compute={json.dumps(comp)}
knn={json.dumps(knn)}
dedup={json.dumps(ded)}
skew={json.dumps(skew)}
probe={json.dumps(probe)}
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    # preserve manually-appended analysis sections (## 2b / ## 3b ...)
    # across regeneration
    keep = ""
    if os.path.exists(out_path):
        old = open(out_path).read()
        idx = old.find("\n## 2b.")
        if idx >= 0:
            keep = old[idx:]
    with open(out_path, "w") as f:
        f.write(md + keep)
    print(md)


if __name__ == "__main__":
    main()

"""Snapshot-versioned table catalog — the Iceberg commit protocol on
plain parquet.

North-rule context: production runs read/write Iceberg tables. The
sandbox has no Iceberg runtime, so this module implements the parts of
the spec the engine actually leans on, catalog-agnostically, with the
same on-disk shape Iceberg uses:

    table/
      data/<uuid>.parquet            immutable data files
      metadata/v<N>.json             snapshot manifests (file list +
                                     per-file column min/max + counts)
      metadata/version-hint.text     current-version pointer

* **Atomic, optimistic commits.** A writer stages data files, then
  creates ``v<N+1>.json`` with ``open(..., "x")`` — EXCLUSIVE create. If
  another writer won the race the create fails and the commit RETRIES
  against the new current snapshot (re-reading its file list), exactly
  Iceberg's optimistic-concurrency loop. The version hint is updated
  last (a stale hint only costs a directory probe, never correctness).
* **Time travel.** ``read(version=K)`` / ``history()`` — every snapshot
  records parent, operation, timestamp and summary counts.
* **File pruning.** ``append`` collects per-file min/max for the
  declared stats columns from the parquet FOOTERS (pyarrow metadata
  scan — no data read) and stores them in the manifest; ``read`` with a
  ``bbox`` prunes whole files before Spark ever sees them, the
  manifest-level analog of Iceberg partition/metrics pruning. Row-group
  pushdown inside surviving files still applies on top.
* **Rollback.** ``rollback(K)`` commits a new snapshot that re-points to
  ``K``'s file list (history is never rewritten).
* **Point-lookup indexes.** ``bloom_cols`` adds a per-file Bloom bitmap
  to the manifest (1 KiB/file at defaults, built from one column-pruned
  pyarrow read at stage time): range stats cannot prune interleaved
  keys, the bloom prunes point lookups and small merges anyway — no
  false negatives, Iceberg/Delta's bloom-index analog.

``lineage.ResumableJob`` (write-then-commit batches) composes with this:
each completed batch can be ``append``-ed as one snapshot, giving
exactly-once visible commits over at-least-once batch writes.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    pass


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str,
                 stats_cols: Sequence[str] = (),
                 bloom_cols: Sequence[str] = (),
                 bloom_bits: int = 8192, bloom_k: int = 4):
        self.spark = spark
        self.path = path
        self.data_dir = os.path.join(path, "data")
        self.meta_dir = os.path.join(path, "metadata")
        self.stats_cols = tuple(stats_cols)
        self.bloom_cols = tuple(bloom_cols)
        self.bloom_bits = int(bloom_bits)
        self.bloom_k = int(bloom_k)
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.meta_dir, exist_ok=True)

    # -- per-file bloom indexes ---------------------------------------------
    #
    # min/max footer stats prune RANGE predicates; they are useless for
    # point lookups over interleaved keys (every file's [min,max] covers
    # every key — the "find one url among 10^12" shape). A per-file
    # Bloom bitmap (bloom_bits bits, bloom_k probes; 1 KiB per file at
    # the default) in the manifest prunes those: no false negatives,
    # deterministic (md5-derived probe positions), built at stage time
    # from ONE column-pruned pyarrow read of the staged file.

    def _bloom_positions(self, value) -> list[int]:
        import hashlib

        out = []
        for i in range(self.bloom_k):
            d = hashlib.md5(f"{i}:{value}".encode()).digest()
            out.append(int.from_bytes(d[:8], "big") % self.bloom_bits)
        return out

    def _build_bloom(self, path: str, col: str) -> str:
        import pyarrow.parquet as pq

        bits = bytearray(self.bloom_bits // 8)
        vals = pq.read_table(path, columns=[col]).column(0)
        for v in vals.drop_null().to_pylist():
            for p in self._bloom_positions(v):
                bits[p >> 3] |= 1 << (p & 7)
        return bytes(bits).hex()

    def _bloom_may_contain(self, f: dict, col: str, values) -> bool:
        bl = f.get("bloom", {}).get(col)
        if bl is None:
            return True  # unindexed file -> cannot prune
        bits = bytes.fromhex(bl)
        for v in values:
            if all(
                bits[p >> 3] & (1 << (p & 7))
                for p in self._bloom_positions(v)
            ):
                return True
        return False

    # -- snapshot bookkeeping ---------------------------------------------

    def _hint_path(self) -> str:
        return os.path.join(self.meta_dir, "version-hint.text")

    def current_version(self) -> int:
        """Highest committed manifest (hint is a hint, directory is truth)."""
        v = 0
        try:
            with open(self._hint_path()) as f:
                v = int(f.read().strip() or 0)
        except FileNotFoundError:
            pass
        while os.path.exists(os.path.join(self.meta_dir, f"v{v + 1}.json")):
            v += 1
        return v

    def snapshot(self, version: Optional[int] = None) -> dict:
        v = self.current_version() if version is None else version
        if v == 0:
            return {"version": 0, "files": [], "parent": None,
                    "operation": "create", "ts": None, "total_rows": 0}
        with open(os.path.join(self.meta_dir, f"v{v}.json")) as f:
            return json.load(f)

    def history(self) -> DataFrame:
        rows = []
        v = self.current_version()
        for i in range(1, v + 1):
            s = self.snapshot(i)
            rows.append((s["version"], s["parent"], s["operation"],
                         float(s["ts"]), len(s["files"]),
                         int(s["total_rows"])))
        return self.spark.createDataFrame(
            rows,
            "version int, parent int, operation string, ts double, "
            "n_files int, total_rows long",
        )

    # -- writes ------------------------------------------------------------

    def _stage(self, df: DataFrame) -> list[dict]:
        """Write data files + collect footer stats (no data re-read)."""
        import pyarrow.parquet as pq

        stage = os.path.join(self.data_dir, f"stage-{uuid.uuid4().hex[:12]}")
        df.write.mode("overwrite").parquet(stage)
        entries = []
        for name in sorted(os.listdir(stage)):
            if not name.endswith(".parquet"):
                continue
            src = os.path.join(stage, name)
            dst = os.path.join(self.data_dir, f"{uuid.uuid4().hex}.parquet")
            os.rename(src, dst)
            meta = pq.ParquetFile(dst).metadata
            stats: dict = {}
            for c in self.stats_cols:
                idx = meta.schema.names.index(c) if c in meta.schema.names else -1
                if idx < 0:
                    continue
                mins, maxs = [], []
                for rg in range(meta.num_row_groups):
                    st = meta.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        mins, maxs = [], []
                        break
                    mins.append(st.min)
                    maxs.append(st.max)
                if mins:
                    stats[c] = [min(mins), max(maxs)]
            entry = {"path": dst, "rows": meta.num_rows, "stats": stats}
            blooms = {
                c: self._build_bloom(dst, c)
                for c in self.bloom_cols if c in meta.schema.names
            }
            if blooms:
                entry["bloom"] = blooms
            entries.append(entry)
        for leftover in os.listdir(stage):
            os.remove(os.path.join(stage, leftover))
        os.rmdir(stage)
        return entries

    def _commit(self, new_files: list[dict], operation: str,
                base_files_fn, max_retries: int = 10) -> int:
        """Optimistic commit loop (exclusive-create on the manifest)."""
        for _ in range(max_retries):
            cur = self.current_version()
            files = base_files_fn(self.snapshot(cur))
            manifest = {
                "version": cur + 1,
                "parent": cur if cur else None,
                "operation": operation,
                "ts": time.time(),
                "files": files + new_files,
                "total_rows": sum(int(f["rows"]) for f in files + new_files),
                "stats_cols": list(self.stats_cols),
            }
            target = os.path.join(self.meta_dir, f"v{cur + 1}.json")
            try:
                with open(target, "x") as f:
                    json.dump(manifest, f)
            except FileExistsError:
                continue  # lost the race — re-read and retry
            tmp = self._hint_path() + ".tmp"
            with open(tmp, "w") as f:
                f.write(str(cur + 1))
            os.replace(tmp, self._hint_path())
            return cur + 1
        raise CommitConflict(f"gave up after {max_retries} commit attempts")

    def append(self, df: DataFrame, operation: str = "append") -> int:
        """Stage data files, then commit snapshot = parent files + new.
        ``operation`` labels the snapshot in history() — callers use it
        for idempotence (skip an already-committed labeled append)."""
        new_files = self._stage(df)
        return self._commit(new_files, operation, lambda s: list(s["files"]))

    def audited_append(self, df: DataFrame,
                       constraints: list[dict]) -> tuple[Optional[int], list]:
        """Write-audit-publish (the Iceberg WAP pattern): stage the
        data files, run a Deequ-style constraint suite against EXACTLY
        the staged bytes (not the input plan — what is audited is what
        publishes), and commit only if every constraint passes. On
        failure the staged files are deleted and the table is
        untouched — a bad crawl drop can never become visible to
        readers, because visibility IS the manifest commit.

        Returns (version, verdicts): version None when the audit
        failed. Verdicts are (name, column, metric, value, passed)
        rows either way — the ingest log keeps them."""
        from pdal_spark.datapipe.dataquality import check

        new_files = self._stage(df)
        staged = self.spark.read.parquet(*[f["path"] for f in new_files])
        verdicts = check(staged, constraints).collect()
        if all(r.passed == 1 for r in verdicts):
            v = self._commit(new_files, "audited-append",
                             lambda s: list(s["files"]))
            return v, verdicts
        for f in new_files:
            os.remove(f["path"])
        return None, verdicts

    def fsck(self, version: Optional[int] = None,
             check_rows: bool = False) -> dict:
        """Catalog consistency check (the operational `fsck` every
        snapshot store needs before trusting a restore): verifies that
        every data file the snapshot references exists, optionally that
        its parquet-footer row count still matches the manifest
        (``check_rows`` — footer-only, no data read), and reports
        on-disk parquet files no LIVE snapshot references (orphans from
        crashed writes before their commit; `expire` only collects
        files that WERE committed once). Returns
        {missing, row_mismatches, orphans, ok}."""
        import pyarrow.parquet as pq

        s = self.snapshot(version)
        missing, mismatches = [], []
        for f in s["files"]:
            if not os.path.exists(f["path"]):
                missing.append(f["path"])
            elif check_rows:
                n = pq.ParquetFile(f["path"]).metadata.num_rows
                if n != int(f["rows"]):
                    mismatches.append(
                        {"path": f["path"], "manifest_rows": int(f["rows"]),
                         "footer_rows": n})
        live: set = set()
        for v in range(1, self.current_version() + 1):
            live |= {f["path"] for f in self.snapshot(v)["files"]}
        orphans = sorted(
            os.path.join(self.data_dir, name)
            for name in os.listdir(self.data_dir)
            if name.endswith(".parquet")
            and os.path.join(self.data_dir, name) not in live
        )
        return {
            "missing": sorted(missing),
            "row_mismatches": mismatches,
            "orphans": orphans,
            "ok": not missing and not mismatches,
        }

    def committed_operations(self) -> set:
        return {
            self.snapshot(v)["operation"]
            for v in range(1, self.current_version() + 1)
        }

    def overwrite(self, df: DataFrame) -> int:
        """Snapshot containing ONLY the new files (old files stay on disk
        for time travel until expired)."""
        new_files = self._stage(df)
        return self._commit(new_files, "overwrite", lambda s: [])

    def merge(self, source: DataFrame, key: str,
              when_matched: str = "update") -> dict:
        """Copy-on-write MERGE (the Iceberg/Delta ``MERGE INTO`` shape):
        target rows whose ``key`` appears in ``source`` are replaced by
        the source row (``when_matched="update"``) or removed
        (``"delete"``); unmatched source rows are inserted (update mode
        only). Only data files that actually CONTAIN a matching key are
        rewritten — every other file carries into the new snapshot
        untouched, which is the property that makes point-updates
        affordable on a 100 TB table (rewrite = touched files only,
        not the table).

        Candidate selection is two-level: manifest footer stats on the
        key column prune files whose [min,max] range cannot intersect
        the source keys (no data read — requires ``key`` in
        ``stats_cols``; without stats every file is a candidate), then
        one column-pruned scan of the candidates with per-row file
        provenance (input_file_name) finds the files with real matches.

        Source must be unique on ``key`` (checked) and schema-aligned
        with the target in update mode. Commit is serializable: if
        another writer commits between planning and commit, the merge
        raises CommitConflict rather than committing against a file
        list it did not plan on (Iceberg's validation semantics).
        Returns counts + the new version."""
        from pyspark.sql import functions as F

        if when_matched not in ("update", "delete"):
            raise ValueError("when_matched must be 'update' or 'delete'")
        dup = source.groupBy(key).count().filter("count > 1").limit(1)
        if dup.count():
            raise ValueError(f"source is not unique on {key}")
        planned_version = self.current_version()
        snap = self.snapshot(planned_version)
        files = snap["files"]

        # level 1: manifest stats prune (no I/O)
        bounds = source.agg(
            F.min(key).alias("lo"), F.max(key).alias("hi")
        ).collect()[0]
        lo, hi = bounds.lo, bounds.hi

        def may_match(f: dict) -> bool:
            st = f.get("stats", {}).get(key)
            if st is None or lo is None:
                return True  # no stats -> must scan
            return not (st[0] > hi or st[1] < lo)

        cand = [f for f in files if may_match(f)]
        # level 1b: per-file bloom prune — decisive for point updates
        # over interleaved keys, where every file's [min,max] range
        # covers every key. Only engaged when the source keyset is
        # small enough to collect (CDC batches are; a 100 TB-source
        # merge skips straight to the provenance scan).
        if key in self.bloom_cols and cand:
            probe = source.select(key).limit(10_001).collect()
            if len(probe) <= 10_000:
                keys_small = [r[0] for r in probe]
                cand = [
                    f for f in cand
                    if self._bloom_may_contain(f, key, keys_small)
                ]
        # level 2: provenance scan of candidates, column-pruned to key
        touched_paths: set = set()
        if cand:
            scan = self.spark.read.parquet(*[f["path"] for f in cand])
            hit = (
                scan.select(F.col(key), F.input_file_name().alias("_f"))
                .join(source.select(key).distinct(), key, "semi")
                .select("_f").distinct().collect()
            )
            touched_basenames = {os.path.basename(r._f) for r in hit}
            touched_paths = {
                f["path"] for f in cand
                if os.path.basename(f["path"]) in touched_basenames
            }
        keep_files = [f for f in files if f["path"] not in touched_paths]

        if touched_paths:
            touched_scan = self.spark.read.parquet(*sorted(touched_paths))
            kept_rows = touched_scan.join(
                source.select(key).distinct(), key, "anti"
            )
        else:
            kept_rows = None
        if when_matched == "update":
            new_data = (
                kept_rows.unionByName(source) if kept_rows is not None
                else source
            )
        else:
            new_data = kept_rows
        new_files = self._stage(new_data) if new_data is not None else []

        def base(s: dict) -> list:
            if s["version"] != planned_version:
                raise CommitConflict(
                    f"table advanced to v{s['version']} while merge "
                    f"planned against v{planned_version}"
                )
            return list(keep_files)

        try:
            v = self._commit(new_files, "merge", base, max_retries=1)
        except CommitConflict:
            # staged files were never committed: remove them (mirrors
            # audited_append's failure cleanup) so a retried merge
            # under contention cannot leak permanent orphans — expire()
            # only collects once-committed files and fsck only reports.
            for f in new_files:
                if os.path.exists(f["path"]):
                    os.remove(f["path"])
            raise
        return {
            "version": v,
            "files_total": len(files),
            "files_candidate": len(cand),
            "files_rewritten": len(touched_paths),
            "files_carried": len(keep_files),
        }

    def compact(self, small_threshold_rows: int,
                target_partitions: int | None = None) -> dict:
        """Small-file compaction (the lakehouse OPTIMIZE bin-pack):
        rewrite files below ``small_threshold_rows`` into
        ``target_partitions`` right-sized ones; every large file
        carries into the new snapshot untouched. The weekly-crawl
        failure mode this exists for: thousands of stripe-sized commit
        files turning every scan's task list into driver pressure.

        Needs >= 2 small files to do anything (a lone small file
        cannot be packed tighter). Same serializable validation as
        merge(). Returns counts + the new version (unchanged version
        on no-op)."""
        planned_version = self.current_version()
        files = self.snapshot(planned_version)["files"]
        small = [f for f in files if int(f["rows"]) < small_threshold_rows]
        if len(small) < 2:
            return {"version": planned_version, "files_compacted": 0,
                    "files_carried": len(files)}
        keep_files = [f for f in files if int(f["rows"]) >= small_threshold_rows]
        rows_small = sum(int(f["rows"]) for f in small)
        if target_partitions is None:
            target_partitions = max(1, rows_small // small_threshold_rows)
        packed = self.spark.read.parquet(
            *[f["path"] for f in small]
        ).repartition(target_partitions)
        new_files = self._stage(packed)

        def base(s: dict) -> list:
            if s["version"] != planned_version:
                raise CommitConflict(
                    f"table advanced to v{s['version']} while compaction "
                    f"planned against v{planned_version}"
                )
            return list(keep_files)

        try:
            v = self._commit(new_files, "compact", base, max_retries=1)
        except CommitConflict:
            for f in new_files:  # same orphan cleanup as merge()
                if os.path.exists(f["path"]):
                    os.remove(f["path"])
            raise
        return {"version": v, "files_compacted": len(small),
                "files_new": len(new_files), "files_carried": len(keep_files)}

    def changes(self, from_version: int,
                to_version: Optional[int] = None) -> DataFrame:
        """Change-data-feed between two snapshots (the Delta/Iceberg
        CDF shape): every row added since ``from_version`` tagged
        ``insert``, every row removed tagged ``delete`` (an update from
        merge() appears as its delete+insert pair — the engine stores
        no row ids, so that is the honest representation).

        File-diff first (manifest-only): rows in carried-over files
        never enter the comparison at all — the comparison reads ONLY
        the added/removed file sets, so a 3-file merge against a 100 TB
        table diffs 3 files, not the table. Rewritten files' carried
        rows cancel via exceptAll (multiset semantics — duplicate rows
        cancel one-for-one)."""
        from pyspark.sql import functions as F

        a = self.snapshot(from_version)["files"]
        b = self.snapshot(to_version)["files"]
        a_paths = {f["path"] for f in a}
        b_paths = {f["path"] for f in b}
        removed = sorted(f["path"] for f in a if f["path"] not in b_paths)
        added = sorted(f["path"] for f in b if f["path"] not in a_paths)

        def rd(paths):
            if not paths:
                ref = (b or a)
                if not ref:
                    raise ValueError("empty table and no snapshot schema")
                return self.spark.read.parquet(ref[0]["path"]).limit(0)
            return self.spark.read.parquet(*paths)

        added_rows, removed_rows = rd(added), rd(removed)
        inserts = added_rows.exceptAll(removed_rows).withColumn(
            "_change_type", F.lit("insert")
        )
        deletes = removed_rows.exceptAll(added_rows).withColumn(
            "_change_type", F.lit("delete")
        )
        return inserts.unionByName(deletes)

    def rollback(self, version: int) -> int:
        """New snapshot re-pointing to an old file list (history intact)."""
        old = self.snapshot(version)["files"]
        return self._commit(
            [], f"rollback-to-{version}", lambda s: list(old)
        )

    def expire(self, keep_from_version: int) -> int:
        """Delete data files unreachable from snapshots >= the given one.

        Returns the number of files removed. Manifests are kept (cheap,
        and reads of expired versions fail loudly on the missing file)."""
        live: set = set()
        for v in range(keep_from_version, self.current_version() + 1):
            live |= {f["path"] for f in self.snapshot(v)["files"]}
        removed = 0
        for name in os.listdir(self.data_dir):
            p = os.path.join(self.data_dir, name)
            if name.endswith(".parquet") and p not in live:
                os.remove(p)
                removed += 1
        return removed

    # -- reads -------------------------------------------------------------

    def version_as_of(self, ts: float) -> int:
        """SQL ``AS OF TIMESTAMP`` resolution: the latest version whose
        commit timestamp is <= ``ts`` (0 = before any commit)."""
        best = 0
        for v in range(1, self.current_version() + 1):
            if float(self.snapshot(v)["ts"]) <= ts:
                best = v
        return best

    def read(
        self,
        version: Optional[int] = None,
        bbox: Optional[tuple] = None,
        bbox_cols: tuple = ("x", "y"),
        as_of_ts: Optional[float] = None,
    ) -> DataFrame:
        """Scan a snapshot; ``bbox=(minx, miny, maxx, maxy)`` prunes whole
        files from the manifest stats before Spark plans the read.
        ``as_of_ts`` reads the table as of a wall-clock epoch second
        (mutually exclusive with ``version``)."""
        if as_of_ts is not None:
            if version is not None:
                raise ValueError("pass version or as_of_ts, not both")
            version = self.version_as_of(as_of_ts)
            if version == 0:
                raise ValueError(
                    f"no snapshot committed at or before ts={as_of_ts}"
                )
        s = self.snapshot(version)
        files = s["files"]
        if bbox is not None:
            minx, miny, maxx, maxy = bbox
            cx, cy = bbox_cols

            def overlaps(f: dict) -> bool:
                st = f.get("stats", {})
                if cx in st and (st[cx][0] > maxx or st[cx][1] < minx):
                    return False
                if cy in st and (st[cy][0] > maxy or st[cy][1] < miny):
                    return False
                return True  # missing stats -> cannot prune, must read

            files = [f for f in files if overlaps(f)]
        if not files:
            # preserve schema when possible by reading zero rows
            all_files = s["files"]
            if not all_files:
                raise ValueError("empty table and no snapshot schema")
            return self.spark.read.parquet(all_files[0]["path"]).limit(0)
        return self.spark.read.parquet(*[f["path"] for f in files])

    def incremental_read(
        self,
        from_version: int,
        to_version: Optional[int] = None,
        bbox: Optional[tuple] = None,
        bbox_cols: tuple = ("x", "y"),
    ) -> DataFrame:
        """Scan ONLY the data files added after ``from_version`` (the
        Iceberg incremental-append pattern): a consumer that checkpointed
        "processed through v3" resumes by reading the v3→head file DIFF
        — never rescanning the processed 100 TB. Composes with the bbox
        footer-stats prune. Files REMOVED since from_version (overwrite/
        rollback) are the consumer's signal to recompute; this scan is
        append-diff only."""
        base = {f["path"] for f in self.snapshot(from_version)["files"]}
        s = self.snapshot(to_version)
        files = [f for f in s["files"] if f["path"] not in base]
        if bbox is not None:
            minx, miny, maxx, maxy = bbox
            cx, cy = bbox_cols
            files = [
                f for f in files
                if not (cx in f.get("stats", {})
                        and (f["stats"][cx][0] > maxx or f["stats"][cx][1] < minx))
                and not (cy in f.get("stats", {})
                         and (f["stats"][cy][0] > maxy or f["stats"][cy][1] < miny))
            ]
        if not files:
            ref = s["files"] or self.snapshot(self.current_version())["files"]
            if not ref:
                raise ValueError("empty table and no snapshot schema")
            return self.spark.read.parquet(ref[0]["path"]).limit(0)
        return self.spark.read.parquet(*[f["path"] for f in files])

    def pruned_count(self, bbox: tuple, version: Optional[int] = None,
                     bbox_cols: tuple = ("x", "y")) -> tuple[int, int]:
        """(files read, files total) for a bbox — pruning evidence."""
        s = self.snapshot(version)
        total = len(s["files"])
        kept = self.read(version=version, bbox=bbox, bbox_cols=bbox_cols)
        # count distinct files in the planned scan (inputFiles returns
        # file:// URIs; data-file names are uuids, so compare basenames)
        n = len({
            os.path.basename(f["path"]) for f in s["files"]
        } & {os.path.basename(p) for p in kept.inputFiles()})
        return n, total

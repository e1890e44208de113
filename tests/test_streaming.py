"""Structured Streaming semantics pinned with deterministic micro-batches.

Strategy: stage events.parquet (or synthetic rows) into a temp dir, drain
with trigger(availableNow=True), and compare against the equivalent batch
computation. Late-data/watermark behavior is asserted through the append-
mode contract: a window is emitted iff the final watermark passed its end.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

import pytest
from pyspark.sql import functions as F

from connected_data_lake_spark.sources.tables import load_table
from connected_data_lake_spark.streaming import events as SE
from connected_data_lake_spark.streaming import stateful as ST


@pytest.fixture()
def events_dir(spark, sf_dir, tmp_path):
    d = str(tmp_path / "events_in")
    os.makedirs(d)
    shutil.copy(f"{sf_dir}/events.parquet", f"{d}/events.parquet")
    return d


def _drain(stream_df, mode="append"):
    name = "t_" + uuid.uuid4().hex[:12]
    return SE.run_to_memory(stream_df, name, output_mode=mode)


def test_tumbling_append_emits_only_watermark_closed_windows(spark, sf_dir, events_dir):
    out = _drain(SE.tumbling_counts(SE.read_events_stream(spark, events_dir))).collect()
    assert out, "expected closed windows to be emitted"

    # batch side: same ts values as TIMESTAMP (UTC session) to compare
    ev = load_table(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    max_ts = ev.agg(F.max("ts")).first()[0]
    batch = {
        (r.win_start, r.event_type): (r.n_events, r.sum_value)
        for r in (
            ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
            .select(
                F.col("w.start").alias("win_start"),
                F.col("w.end").alias("win_end"),
                "event_type",
                "n_events",
                "sum_value",
            )
            .collect()
        )
    }
    streamed = {(r.win_start, r.event_type): (r.n_events, r.sum_value) for r in out}
    # every emitted window matches the batch result exactly
    for key, vals in streamed.items():
        assert batch[key] == vals
    # and emitted == windows whose end the final watermark passed
    import datetime

    wm = max_ts - datetime.timedelta(hours=1)
    for r in out:
        assert r.win_end <= wm
    n_expected = sum(
        1
        for r in (
            ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").count().select("w.end")
        ).collect()
        if r.end <= wm
    )
    assert len(out) == n_expected


def test_dedup_within_watermark(spark, tmp_path):
    d = str(tmp_path / "dup_in")
    rows = [
        (1, 1_700_000_000_000_000_000, 10, "click", 1.0, "{}"),
        (1, 1_700_000_001_000_000_000, 10, "click", 1.0, "{}"),  # dup id
        (2, 1_700_000_002_000_000_000, 11, "view", 2.0, "{}"),
        (2, 1_700_000_002_000_000_000, 11, "view", 2.0, "{}"),  # dup id
        (3, 1_700_000_003_000_000_000, 12, "click", 3.0, "{}"),
    ]
    spark.createDataFrame(rows, SE.EVENTS_RAW_SCHEMA).coalesce(1).write.parquet(d)
    out = _drain(SE.dedup_within_watermark(SE.read_events_stream(spark, d))).collect()
    assert sorted(r.event_id for r in out) == [1, 2, 3]


def test_stateful_running_profile_across_batches(spark, tmp_path):
    d = str(tmp_path / "state_in")
    os.makedirs(d)
    batch1 = [
        (1, 1_700_000_000_000_000_000, 10, "click", 1.5, "{}"),
        (2, 1_700_000_001_000_000_000, 10, "click", 2.5, "{}"),
        (3, 1_700_000_002_000_000_000, 11, "view", 10.0, "{}"),
    ]
    batch2 = [
        (4, 1_700_000_003_000_000_000, 10, "click", 4.0, "{}"),
        (5, 1_700_000_004_000_000_000, 12, "view", 7.0, "{}"),
    ]
    # two files with strictly increasing mtimes -> two micro-batches
    spark.createDataFrame(batch1, SE.EVENTS_RAW_SCHEMA).coalesce(1).write.parquet(f"{d}/b1")
    time.sleep(1.1)
    spark.createDataFrame(batch2, SE.EVENTS_RAW_SCHEMA).coalesce(1).write.parquet(f"{d}/b2")

    stream = SE.read_events_stream(spark, f"{d}/*", max_files_per_trigger=1)
    out = _drain(ST.running_user_profile(stream), mode="update").collect()

    # last emitted row per user carries the final accumulated state
    final = {}
    for r in out:
        final[r.user_id] = (r.n_events, r.total_value, r.last_ts_us)
    assert final[10] == (3, 8.0, 1_700_000_003_000_000)
    assert final[11] == (1, 10.0, 1_700_000_002_000_000)
    assert final[12] == (1, 7.0, 1_700_000_004_000_000)
    # user 10 was touched by both batches -> at least 2 emissions
    assert sum(1 for r in out if r.user_id == 10) >= 2


def test_sessionized_stream_matches_batch_closed_sessions(spark, sf_dir, events_dir):
    out = _drain(SE.sessionized(SE.read_events_stream(spark, events_dir))).collect()
    assert out
    batch = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.sum_value)
        for r in (
            load_table(spark, sf_dir, "events")
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
                "sum_value",
            )
            .collect()
        )
    }
    for r in out:
        assert batch[(r.user_id, r.session_start)] == (r.session_end, r.n_events, r.sum_value)


def test_sessionize_with_alerts_emits_early_and_on_gap(spark, tmp_path):
    d = str(tmp_path / "alert_in")
    t0 = 1_700_000_000
    rows = []
    # session 1: six events a minute apart -> alert at the 5th, then the
    # session closes when the same batch crosses the 30-min gap
    for i in range(6):
        rows.append((i, (t0 + 60 * i) * 10**9, 10, "click", 1.0, "{}"))
    # session 2: two events 55 min after session 1 -> stays OPEN (the final
    # watermark = max_ts - 1h never passes last_ts + gap), so no emission
    for j in range(2):
        rows.append((10 + j, (t0 + 3300 + 60 * j) * 10**9, 10, "click", 1.0, "{}"))
    spark.createDataFrame(rows, SE.EVENTS_RAW_SCHEMA).coalesce(1).write.parquet(d)

    out = _drain(
        ST.sessionize_with_alerts(
            SE.read_events_stream(spark, d), gap_minutes=30, alert_after=5
        )
    ).collect()

    alerts = [r for r in out if r.kind == "alert"]
    sessions = [r for r in out if r.kind == "session"]
    assert len(alerts) == 1 and len(sessions) == 1
    a, s = alerts[0], sessions[0]
    # the alert fired EARLY: at the threshold count, before the session end
    assert (a.user_id, a.n_events, a.sum_value) == (10, 5, 5.0)
    assert a.last_ts_us == (t0 + 60 * 4) * 10**6
    # the closed session carries the full six events
    assert (s.user_id, s.n_events, s.sum_value) == (10, 6, 6.0)
    assert s.session_start_us == t0 * 10**6
    assert s.last_ts_us == (t0 + 60 * 5) * 10**6


def test_trending_topk_matches_exact_counts(spark, tmp_path):
    """CMS trending top-k: with width >> distinct keys the estimates are
    exact, so the final per-window ranking must equal the batch
    groupBy-count — including y overtaking x only after batch 2."""
    import time as _time

    from connected_data_lake_spark.streaming import trending as TR

    d = str(tmp_path / "ev")
    base = 1_700_000_000_000_000_000  # ns, aligned inside one hour window
    hour_ns = 3_600 * 1_000_000_000

    def ev(i, off_ns, typ):
        return (i, base + off_ns, 1, typ, 1.0, "{}")

    batch1 = [ev(i, i * 1_000_000_000, t) for i, t in enumerate(["x"] * 5 + ["y"] * 3 + ["z"])]
    batch2 = [ev(100 + i, 60_000_000_000 + i * 1_000_000_000, "y") for i in range(4)] + [
        ev(200 + i, hour_ns + i * 1_000_000_000, "w") for i in range(2)
    ]
    spark.createDataFrame(batch1, SE.EVENTS_RAW_SCHEMA).coalesce(1).write.parquet(f"{d}/b1")
    _time.sleep(1.1)
    spark.createDataFrame(batch2, SE.EVENTS_RAW_SCHEMA).coalesce(1).write.parquet(f"{d}/b2")

    stream = SE.read_events_stream(spark, f"{d}/*", max_files_per_trigger=1)
    out = _drain(TR.trending_topk(stream, window_minutes=60, k=3), mode="update").collect()

    win_a = (base // 1000) - (base // 1000) % (3_600 * 1_000_000)
    win_b = win_a + 3_600 * 1_000_000
    # final estimates equal exact counts (no collisions at width 1024)
    best = {}
    for r in out:
        best[(r.window_start_us, r.key)] = max(best.get((r.window_start_us, r.key), 0), r.est_count)
    assert best == {
        (win_a, "x"): 5,
        (win_a, "y"): 7,
        (win_a, "z"): 1,
        (win_b, "w"): 2,
    }
    # the final window-A emission ranks y(7) over x(5) over z(1)
    finals = {(r.key, r.est_count, r.rank) for r in out if r.window_start_us == win_a}
    assert {("y", 7, 1), ("x", 5, 2), ("z", 1, 3)} <= finals
    # batch-1 emission existed too (early emission, x still leading)
    assert ("x", 5, 1) in finals


def _twin_fixture_dir(spark, tmp_path) -> str:
    """Write a deterministic raw-ns events.parquet usable BOTH as a batch
    sf_dir (load_table) and as a stream source — the shared input for the
    stream/batch twin parity assertions below."""
    sf = str(tmp_path / "twin_sf")
    os.makedirs(sf)
    t0 = 1_700_000_000
    rows = []
    # user 1: one 7-event session, distinct values -> alert at the 5th
    for i in range(7):
        rows.append((100 + i, (t0 + 60 * i) * 10**9, 1, "click", float(i + 1), "{}"))
    # user 2: a 3-event session, then (after a 40-min gap) a 6-event session
    for i in range(3):
        rows.append((200 + i, (t0 + 60 * i) * 10**9, 2, "view", 0.5, "{}"))
    for i in range(6):
        rows.append(
            (210 + i, (t0 + 2400 + 60 * i) * 10**9, 2, "view", float(i), "{}")
        )
    # user 3: exactly 5 events (alert and session carry the same count)
    for i in range(5):
        rows.append((300 + i, (t0 + 30 * i) * 10**9, 3, "purchase", 2.0, "{}"))
    # sentinel user far in the future: drives the final watermark past every
    # real session's end + gap so the stateful operator closes them all; its
    # own 1-event session stays open and is excluded from the comparison
    rows.append((999, (t0 + 10 * 86_400) * 10**9, 99, "click", 0.0, "{}"))
    spark.createDataFrame(rows, SE.EVENTS_RAW_SCHEMA).coalesce(1).write.parquet(
        f"{sf}/events.parquet"
    )
    return sf


def test_sessionize_alerts_stream_matches_batch_twin(spark, tmp_path):
    """Row-level parity: the stateful streaming sessionizer's closed
    sessions AND early alerts == the declared batch twin
    (events_sessionize_alerts), on the same fixture."""
    from connected_data_lake_spark.plans import spec_of

    sf = _twin_fixture_dir(spark, tmp_path)
    streamed = {
        (r.user_id, r.kind, r.session_start_us, r.last_ts_us, r.n_events, r.sum_value)
        for r in _drain(
            ST.sessionize_with_alerts(
                SE.read_events_stream(spark, f"{sf}/events.parquet"),
                gap_minutes=30,
                alert_after=5,
            )
        ).collect()
        if r.user_id != 99
    }
    batch = {
        (r.user_id, r.kind, r.session_start_us, r.last_ts_us, r.n_events, r.sum_value)
        for r in spec_of("events_sessionize_alerts").spark(spark, sf).collect()
        if r.user_id != 99
    }
    assert streamed == batch and len(batch) == 7  # 4 sessions + 3 alerts


def test_trending_topk_stream_matches_batch_twin(spark, tmp_path):
    """Final CMS emissions == the declared exact batch twin
    (events_trending_topk) when the sketch is collision-free: same
    windows, same keys, same counts, same ranks."""
    from connected_data_lake_spark.plans import spec_of
    from connected_data_lake_spark.streaming import trending as TR

    sf = _twin_fixture_dir(spark, tmp_path)
    out = _drain(
        TR.trending_topk(SE.read_events_stream(spark, f"{sf}/events.parquet"), k=5),
        mode="update",
    ).collect()
    # update-mode re-emits per batch: the FINAL estimate per (window, key)
    # is the last (= max, counts are monotone) emission
    final: dict = {}
    for r in out:
        key = (r.window_start_us, r.key)
        if r.est_count >= final.get(key, (0, 0))[0]:
            final[key] = (r.est_count, r.rank)
    streamed = {(w, k, c, rk) for (w, k), (c, rk) in final.items()}
    batch = {
        (r.window_start_us, r.key, r.n_events, r.rank)
        for r in spec_of("events_trending_topk").spark(spark, sf).collect()
    }
    assert streamed == batch and batch


def test_ohlc_stream_matches_batch_twin(spark, sf_dir, events_dir):
    """Every watermark-closed OHLC bar emitted by the stream must equal
    the batch twin's bar (open/close pinned by the same total (ts,
    event_id) order on both sides)."""
    out = _drain(SE.ohlc_minutely(SE.read_events_stream(spark, events_dir))).collect()
    assert out, "expected closed bars to be emitted"

    from connected_data_lake_spark.plans import spec_of

    batch = {
        (r.minute, r.event_type): (
            r.open_v, r.high_v, r.low_v, r.close_v, r.n_events
        )
        for r in spec_of("events_ohlc_minutely").spark(spark, sf_dir).collect()
    }
    for r in out:
        # streaming window start is TIMESTAMP (UTC session); the batch
        # twin's date_trunc over TIMESTAMP_NTZ carries the same wall time
        key = (r.minute.replace(tzinfo=None), r.event_type)
        assert batch[key] == (
            r.open_v, r.high_v, r.low_v, r.close_v, r.n_events
        ), key

"""Streaming joins (streaming/joins.py): stream-static enrichment and
stream-stream windowed attribution, each pinned against the equivalent
batch computation over the same rows."""

from __future__ import annotations

import os
import shutil
import time
import uuid

import pytest
from pyspark.sql import functions as F

from connected_data_lake_spark.sources.tables import load_table
from connected_data_lake_spark.streaming import events as SE
from connected_data_lake_spark.streaming import joins as SJ


@pytest.fixture()
def events_dir(spark, sf_dir, tmp_path):
    d = str(tmp_path / "events_in")
    os.makedirs(d)
    shutil.copy(f"{sf_dir}/events.parquet", f"{d}/events.parquet")
    return d


def _drain(stream_df, mode="append"):
    name = "t_" + uuid.uuid4().hex[:12]
    return SE.run_to_memory(stream_df, name, output_mode=mode)


def test_stream_static_enrichment_matches_batch(spark, sf_dir, events_dir):
    dim = spark.createDataFrame(
        [(uid, "tier-" + str(uid % 3)) for uid in range(0, 2000)],
        "user_id bigint, tier string",
    )
    out = _drain(
        SJ.enrich_with_dimension(SE.read_events_stream(spark, events_dir), dim)
        .groupBy("tier")
        .agg(F.count("*").alias("n")),
        mode="complete",
    ).collect()
    ev = load_table(spark, sf_dir, "events")
    batch = {
        r["tier"]: r["n"]
        for r in ev.join(F.broadcast(dim), "user_id", "left")
        .groupBy("tier")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {r["tier"]: r["n"] for r in out} == batch


def test_stream_stream_attribution_matches_batch(spark, tmp_path):
    d = str(tmp_path / "attr_in")
    t0 = 1_700_000_000
    rows = []
    # user 1: view at t0, clicks at +5m (attributed) and +20m (outside the
    # 10m window); user 2: click with no prior view; user 3: two views
    # before one click -> both attribute (inner join semantics)
    rows.append((1, t0 * 10**9, 1, "view", 1.0, "{}"))
    rows.append((2, (t0 + 300) * 10**9, 1, "click", 1.0, "{}"))
    rows.append((3, (t0 + 1200) * 10**9, 1, "click", 1.0, "{}"))
    rows.append((4, (t0 + 60) * 10**9, 2, "click", 1.0, "{}"))
    rows.append((5, (t0 + 30) * 10**9, 3, "view", 1.0, "{}"))
    rows.append((6, (t0 + 90) * 10**9, 3, "view", 1.0, "{}"))
    rows.append((7, (t0 + 400) * 10**9, 3, "click", 1.0, "{}"))
    half = len(rows) // 2
    spark.createDataFrame(rows[:half], SE.EVENTS_RAW_SCHEMA).coalesce(1).write.parquet(f"{d}/b1")
    time.sleep(1.1)
    spark.createDataFrame(rows[half:], SE.EVENTS_RAW_SCHEMA).coalesce(1).write.parquet(f"{d}/b2")

    stream = SE.read_events_stream(spark, f"{d}/*", max_files_per_trigger=1)
    out = _drain(SJ.attribute_conversions(stream, attribution_minutes=10)).collect()
    got = {(r.user_id, r.view_id, r.click_id, r.latency_us) for r in out}
    assert got == {
        (1, 1, 2, 300_000_000),
        (3, 5, 7, 370_000_000),
        (3, 6, 7, 310_000_000),
    }


def test_stream_stream_attribution_parity_on_corpus(spark, sf_dir, events_dir):
    """Inner stream-stream join over the full fixture equals the batch
    theta join on identical rows (availableNow drains everything, and
    inner joins emit on match, not on watermark closure)."""
    stream = SE.read_events_stream(spark, events_dir)
    out = _drain(SJ.attribute_conversions(stream, attribution_minutes=10)).collect()
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("ts_us").alias("vus"), F.col("event_id").alias("vid")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts_us").alias("cus"), F.col("event_id").alias("cid")
    )
    batch = (
        v.join(
            c,
            (F.col("u") == F.col("cu"))
            & (F.col("cus") >= F.col("vus"))
            & (F.col("cus") <= F.col("vus") + 600 * 1_000_000),
        )
        .select("vid", "cid")
        .collect()
    )
    assert {(r.view_id, r.click_id) for r in out} == {(r.vid, r.cid) for r in batch}
    assert len(out) == len(batch) > 0

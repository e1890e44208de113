"""Streaming-native soak: replay sf0.1 through file-source micro-batches.

Extends the stream-vs-batch twin pattern from pytest assertion to a
measured artifact (VERDICT r7 next-round #8). Two legs, each a real
Structured Streaming run (file source, N micro-batches via
maxFilesPerTrigger=1 + availableNow):

- **events**: the stateful sessionizer (streaming/stateful.py::
  sessionize_with_alerts, applyInPandasWithState + event-time timeout)
  over the sf events replayed as N time-ordered parquet slices plus a
  far-future sentinel file that drives the final watermark past every real
  session's close. Parity: emitted (session|alert) rows == the declared
  batch twin ``events_sessionize_alerts`` on the same replay dir,
  excluding the sentinel user; sum_value compared at 3 decimals (stream
  accumulates in strict event order, batch aggregation order is
  engine-chosen — identical at 3 dp, last-ulp different beyond).
- **documents**: the foreachBatch incremental-dedup classifier
  (streaming/dedup.py::classify_stream) over the ``doc_id % 5 == 0`` new
  slice replayed in M files, probing the SAME offline corpus index the
  declared ``dedup_incremental`` query uses. Parity: the parquet sink's
  rows == the batch query's rows exactly (classification is per-doc
  deterministic, so micro-batch splits cannot change it).

Writes BENCH_STREAM.json:
    {"events": {"rows": N, "micro_batches": B, "wall_sec": S,
                "rows_per_sec": R, "parity_ok": true, ...}, "documents":
     {...}, "sf": 0.1}

Usage:  python tools/bench_stream.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SENTINEL_USER = 99_999_999


def _slice_bounds(n_rows: int, n_slices: int) -> list[tuple[int, int]]:
    step = -(-n_rows // n_slices)
    return [(i, min(i + step, n_rows)) for i in range(0, n_rows, step)]


def build_events_replay(
    spark, sf_dir: str, root: str, n_slices: int, replicas: int = 1
) -> int:
    """Write the events table as n_slices time-ordered parquet files under
    {root}/events.parquet (one file per slice, written sequentially so file
    mtimes replay in event-time order), plus a sentinel slice that closes
    every real session. Returns the REAL row count (excl. sentinel).

    ``replicas > 1`` is the state-store soak (VERDICT r8 stretch #9): the
    stream carries replicas-x rows with user_ids offset per replica, so
    every replica's sessions are CONCURRENTLY open — peak state must grow
    with ACTIVE keys (replicas x users), never with total events, which is
    exactly the bounded-state claim under test."""
    import datetime

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    out = os.path.join(root, "events.parquet")
    os.makedirs(out, exist_ok=True)
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if replicas > 1:
        reps = spark.range(replicas).select(F.col("id").alias("_rep"))
        raw = (
            raw.crossJoin(reps)
            .withColumn("user_id", F.col("user_id") + F.col("_rep") * F.lit(10_000_000))
            .withColumn("event_id", F.col("event_id") + F.col("_rep") * F.lit(10**10))
            .drop("_rep")
        )
    n = raw.count()
    ranked = raw.withColumn("_rk", F.row_number().over(Window.orderBy("ts", "event_id"))).persist()
    ranked.count()
    for lo, hi in _slice_bounds(n, n_slices):
        (
            ranked.filter((F.col("_rk") > lo) & (F.col("_rk") <= hi))
            .drop("_rk")
            .coalesce(1)
            .write.mode("append")
            .parquet(out)
        )
    # sentinel LAST slice: one event 30 days after the final real one, on
    # its own user — drives the final watermark past last_real_ts + gap so
    # the stateful operator's event-time timeouts close every real session.
    # Built driver-side from a template row so both ts layouts (long-nanos
    # and timestamp[us]) keep their exact physical dtype.
    one = raw.orderBy(F.desc("ts")).limit(1).toPandas()
    if raw.schema["ts"].dataType.simpleString() == "bigint":  # long-nanos
        one.loc[:, "ts"] = int(one["ts"].iloc[0]) + 30 * 86_400 * 10**9
    else:
        one.loc[:, "ts"] = one["ts"].iloc[0] + datetime.timedelta(days=30)
    one.loc[:, "user_id"] = SENTINEL_USER
    one.loc[:, "event_id"] = 10**12
    one.loc[:, "value"] = 0.0
    spark.createDataFrame(one, schema=raw.schema).coalesce(1).write.mode("append").parquet(out)
    ranked.unpersist()
    return n


def run_events_leg(
    spark, sf_dir: str, root: str, n_slices: int, replicas: int = 1
) -> dict:
    from pyspark.sql import functions as F

    from connected_data_lake_spark.plans import spec_of
    from connected_data_lake_spark.streaming import events as SE
    from connected_data_lake_spark.streaming import stateful as ST

    n_rows = build_events_replay(spark, sf_dir, root, n_slices, replicas)
    stream_path = os.path.join(root, "events.parquet")
    t0 = time.perf_counter()
    q = (
        ST.sessionize_with_alerts(
            SE.read_events_stream(spark, stream_path, max_files_per_trigger=1),
            gap_minutes=30,
            alert_after=5,
        )
        .writeStream.format("memory")
        .queryName("soak_sessions")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(root, "ckpt_events"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1800)
    wall = time.perf_counter() - t0
    progress = list(q.recentProgress)
    n_batches = len([p for p in progress if p["numInputRows"] > 0]) or n_slices + 1
    # peak state rows across micro-batches: the bounded-state measurement —
    # applyInPandasWithState reports its store size per progress event
    peak_state = max(
        (op.get("numRowsTotal", 0) for p in progress for op in p.get("stateOperators", [])),
        default=0,
    )

    streamed = {
        (r.user_id, r.kind, r.session_start_us, r.last_ts_us, r.n_events, round(r.sum_value, 3))
        for r in spark.table("soak_sessions").collect()
        if r.user_id != SENTINEL_USER
    }
    batch = {
        (r.user_id, r.kind, r.session_start_us, r.last_ts_us, r.n_events, round(r.sum_value, 3))
        for r in spec_of("events_sessionize_alerts").spark(spark, root).collect()
        if r.user_id != SENTINEL_USER
    }
    return {
        "operator": "sessionize_with_alerts(applyInPandasWithState, event-time timeout)",
        "rows": n_rows,
        "micro_batches": n_batches,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(n_rows / wall, 1),
        "emitted_rows": len(streamed),
        "peak_state_rows": peak_state,
        "replicas": replicas,
        "parity_ok": streamed == batch,
        "only_stream": len(streamed - batch),
        "only_batch": len(batch - streamed),
    }


def run_documents_leg(spark, sf_dir: str, root: str, n_slices: int) -> dict:
    from pyspark.sql import functions as F

    from connected_data_lake_spark.plans import extensions as EXT
    from connected_data_lake_spark.plans import spec_of
    from connected_data_lake_spark.streaming.dedup import classify_stream

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    new = docs.filter((F.col("doc_id") % 5) == 0).orderBy("doc_id").persist()
    n_rows = new.count()
    replay = os.path.join(root, "docs_replay")
    os.makedirs(replay, exist_ok=True)
    ids = [r["doc_id"] for r in new.select("doc_id").collect()]
    for lo, hi in _slice_bounds(len(ids), n_slices):
        chunk = ids[lo:hi]
        new.filter(F.col("doc_id").isin(chunk)).coalesce(1).write.mode("append").parquet(replay)
    new.unpersist()

    corp_fp, band_idx, sh_c = EXT._dedup_corpus_index(spark, sf_dir)
    out_path = os.path.join(root, "docs_classified")
    t0 = time.perf_counter()
    q = classify_stream(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(replay),
        corp_fp,
        band_idx,
        sh_c,
        out_path=out_path,
        checkpoint_path=os.path.join(root, "ckpt_docs"),
        threshold=0.5,
    )
    q.awaitTermination(1800)
    wall = time.perf_counter() - t0
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0]) or n_slices

    streamed = {
        (r.doc_id, r.status, r.match_id, None if r.jaccard is None else round(r.jaccard, 6))
        for r in spark.read.parquet(out_path).collect()
    }
    batch = {
        (r.doc_id, r.status, r.match_id, None if r.jaccard is None else round(r.jaccard, 6))
        for r in spec_of("dedup_incremental").spark(spark, sf_dir).collect()
    }
    return {
        "operator": "classify_stream(foreachBatch incremental dedup vs offline index)",
        "rows": n_rows,
        "micro_batches": n_batches,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(n_rows / wall, 1),
        "emitted_rows": len(streamed),
        "parity_ok": streamed == batch,
        "only_stream": len(streamed - batch),
        "only_batch": len(batch - streamed),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--event-slices", type=int, default=20)
    ap.add_argument("--doc-slices", type=int, default=10)
    ap.add_argument(
        "--replicas",
        type=int,
        default=1,
        help="events replicated N-x with offset user_ids (state-store soak)",
    )
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_STREAM.json"))
    args = ap.parse_args()

    from connected_data_lake_spark.session import get_spark

    spark = get_spark("cdl-spark-stream-soak")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="cdl_soak_")
    try:
        sf_label = os.path.basename(args.sf.rstrip("/"))
        result = {
            "sf": sf_label,
            "events": run_events_leg(
                spark, args.sf, root, args.event_slices, args.replicas
            ),
            "documents": run_documents_leg(spark, args.sf, root, args.doc_slices),
        }
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
        print(json.dumps(result))
        ok = result["events"]["parity_ok"] and result["documents"]["parity_ok"]
        sys.exit(0 if ok else 1)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Structured Streaming over the events table (SURVEY §2.10 T3).

The reference has NO streaming query engine (its "sync" is object-storage
replication — reference crates/cdl-k8s-provider/src/object.rs:1203-1340);
this module is the Spark-idiomatic equivalent the build mandates: file
source → event-time windows + watermark → sink, with the same DataFrame
shapes as the batch queries in plans/events.py, so one definition serves
both batch and streaming ("run the batch query on a stream" is exactly
what Structured Streaming promises).

All builders take/return DataFrames; tests drive them with
``trigger(availableNow=True)`` into memory sinks for deterministic
assertions (late-window suppression, within-watermark dedup, cross-batch
state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from connected_data_lake_spark.session import prepare_session

def _events_raw_schema(ts_type: T.DataType) -> T.StructType:
    """events.parquet schema with the given physical dtype for ``ts``."""
    return T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", ts_type, True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )


#: legacy on-disk schema (ts = raw int64 nanoseconds under the removed
#: nanosAsLong conf). Kept public: tests use it to write synthetic
#: long-ts inputs, exercising the LongType normalization branch.
EVENTS_RAW_SCHEMA = _events_raw_schema(T.LongType())


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of events with the same column normalization as
    the batch loader (sources/tables.py): ts_us LONG + ts TIMESTAMP.

    A file source needs an explicit schema; new files appearing under
    ``path`` become micro-batches — the Auto-Loader-style ingestion shape
    (reference T1 is a tokio channel pipeline, not a query stream). The
    ``ts`` physical dtype is sniffed from the files already at ``path``
    (one footer read at planning time, not per batch) and normalized with
    the same dtype branch as the batch loader, so long-nanos and
    timestamp[us] inputs stream identically."""
    prepare_session(spark)
    try:
        ts_type = spark.read.parquet(path).schema["ts"].dataType
    except Exception:  # empty dir at start-up: assume current writer layout
        ts_type = T.TimestampNTZType()
    reader = spark.readStream.schema(_events_raw_schema(ts_type))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(path)
    if isinstance(ts_type, T.LongType):
        ts_us = F.expr("ts DIV 1000")
    else:
        # NTZ/TIMESTAMP: UTC session (prepare_session) makes the cast exact
        ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    # ts is TIMESTAMP (not NTZ): watermarks reject TIMESTAMP_NTZ event-time
    # columns; with the session pinned to UTC the values are identical to
    # the batch loader's NTZ reading.
    return raw.select(
        "event_id",
        ts_us.alias("ts_us"),
        F.timestamp_micros(ts_us).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "1 hour"
) -> DataFrame:
    """Tumbling event-time window counts per event type with a watermark —
    the streaming twin of plans/events.events_tumbling_hourly. In append
    mode a window is emitted once the watermark passes its end; later
    events are dropped (late-data handling)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def ohlc_minutely(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Minutely OHLC bars per event type on a stream — the streaming twin
    of plans/events.events_ohlc_minutely. Open/close are min_by/max_by on
    the TOTAL (ts, event_id) struct key, so the result is deterministic
    and batch-equal regardless of arrival order (the batch twin pins the
    same total order via row_number); bars close when the watermark
    passes the minute end. State per open bar is O(1): two (key, value)
    pairs + three scalars."""
    key = F.struct("ts", "event_id")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        .agg(
            F.round(F.min_by("value", key), 6).alias("open_v"),
            F.round(F.max("value"), 6).alias("high_v"),
            F.round(F.min("value"), 6).alias("low_v"),
            F.round(F.max_by("value", key), 6).alias("close_v"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col("w.start").alias("minute"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "open_v",
            "high_v",
            "low_v",
            "close_v",
            "n_events",
        )
    )


def sessionized(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Session windows (inactivity gap) per user on a stream — the
    streaming twin of plans/events.events_session_gap30m; sessions close
    when the watermark passes session_end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-per-id event stream: dropDuplicatesWithinWatermark on
    event_id — duplicates arriving within the watermark interval are
    dropped; state for old ids is reclaimed as the watermark advances
    (bounded state — the property that makes this runnable forever)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def run_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "append",
    timeout_sec: int = 120,
) -> DataFrame:
    """Drain a streaming DataFrame into an in-memory table with
    availableNow (process everything, then stop) and return the sink as a
    batch DataFrame. Test/demo helper — a production sink would be a
    parquet/Delta path with a checkpoint location."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    spark = stream_df.sparkSession
    return spark.table(query_name)

"""Streaming joins: stream-static enrichment and stream-stream correlation.

Two join families a streaming ingest pipeline needs that the batch
operators can't provide:

- **Stream-static**: every micro-batch broadcast-joins against a slowly-
  changing dimension snapshot (user → segment, doc → source metadata).
  Spark re-resolves the static side per batch, so a view over a parquet
  table picks up dimension updates without restarting the query.

- **Stream-stream**: correlating two live event streams (view → click
  attribution, request → response latency) needs BOTH sides buffered in
  state with watermarks bounding how long an unmatched row waits. The
  event-time range predicate in the join condition is what lets Spark
  reclaim state — without it the buffers grow forever; with it, a row is
  dropped once the other stream's watermark passes its admissible window.
  (State bound: O(rows inside the watermark × join window), independent
  of total stream length.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_dimension(
    events: DataFrame,
    dim: DataFrame,
    on: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static join: each micro-batch of ``events`` joins the batch
    ``dim`` relation (broadcast — dimensions are small by definition; a
    fact-sized static side would flip this to a shuffle join). The static
    plan re-resolves every micro-batch, so a dim backed by a parquet path
    reflects updates between batches."""
    return events.join(F.broadcast(dim), on, how)


def attribute_conversions(
    events: DataFrame,
    attribution_minutes: int = 10,
    watermark: str = "1 hour",
    from_type: str = "view",
    to_type: str = "click",
) -> DataFrame:
    """Stream-stream INNER join: attribute each ``to_type`` event to every
    ``from_type`` event by the same user within the preceding
    ``attribution_minutes`` — the classic view→click funnel attribution.

    Both sides carry watermarks and the join condition carries the
    event-time range (click inside [view, view + window]), which is what
    bounds the state store: a buffered view is reclaimed once the click
    watermark passes view_ts + window; a buffered click once the view
    watermark passes click_ts. ``events`` is the normalized stream from
    read_events_stream (ts TIMESTAMP, ts_us LONG).
    """
    views = (
        events.filter(F.col("event_type") == from_type)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("ts_us").alias("view_ts_us"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == to_type)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("ts_us").alias("click_ts_us"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    cond = (
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (
            F.col("click_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {attribution_minutes} MINUTES")
        )
    )
    return views.join(clicks, cond, "inner").select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        # integer microsecond latency: exact on both engines, no float epochs
        (F.col("click_ts_us") - F.col("view_ts_us")).alias("latency_us"),
    )

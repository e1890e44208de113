"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stateful stream processing at all; this is the
mandated Spark-native extension point for operators that windows can't
express:

- :func:`running_user_profile` — per-user lifetime state surviving across
  micro-batches (count / total value / last seen timestamp), the canonical
  "enrich every event with lifetime state" pipeline stage.
- :func:`sessionize_with_alerts` — sessionization with EARLY threshold
  alerts. The built-in ``session_window`` (streaming/events.py) emits a
  session only when the watermark closes it; flood/abuse detection wants a
  row the moment an in-progress session crosses a threshold. Early
  emission while state stays open is exactly what the built-ins cannot
  express. State per user is five scalars (O(active users) total),
  reclaimed by EVENT-TIME timeout once the watermark passes
  last_ts + gap.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
        T.StructField("last_ts_us", T.LongType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
        T.StructField("last_ts_us", T.LongType(), True),
    ]
)


def running_user_profile(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value, last_ts_us), updated every
    micro-batch; state persists across batches in the state store. Output
    mode: update (one row per user per batch that touched them)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, total, last = state.get
        else:
            n, total, last = 0, 0.0, None
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_last = pdf["ts_us"].max()
            if batch_last is not None and not pd.isna(batch_last):
                last = int(batch_last) if last is None else max(last, int(batch_last))
        state.update((n, total, last))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "last_ts_us": [last],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_PROFILE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: emitted rows: early alerts and closed-session summaries share one schema
SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # 'alert' | 'session'
        T.StructField("session_start_us", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start_us", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("alerted", T.BooleanType()),
    ]
)


def sessionize_with_alerts(
    events: DataFrame,
    gap_minutes: int = 30,
    alert_after: int = 5,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateful sessionizer emitting early threshold alerts AND final
    session summaries (module docstring). ``events`` is the normalized
    stream from read_events_stream (ts TIMESTAMP, ts_us LONG). Events
    inside a micro-batch are processed in event-time order (sorted
    defensively); an alert fires once per session, on the first crossing
    of ``alert_after`` events."""
    gap_us = gap_minutes * 60 * 1_000_000

    def _step(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        out: list[tuple] = []

        def _emit(kind: str, s) -> None:
            out.append((user_id, kind, s[0], s[1], s[2], s[3]))

        if state.hasTimedOut:
            # gap of silence observed in event time: close + emit, drop state
            if state.exists:
                _emit("session", tuple(state.get))
            state.remove()
        else:
            s = tuple(state.get) if state.exists else None
            for pdf in batches:
                pdf = pdf.sort_values("ts_us")
                for ts_us, value in zip(pdf["ts_us"], pdf["value"]):
                    ts_us = int(ts_us)
                    if s is not None and ts_us - s[1] > gap_us:
                        _emit("session", s)  # gap crossed inside the batch
                        s = None
                    if s is None:
                        s = (ts_us, ts_us, 1, float(value), False)
                    else:
                        s = (s[0], ts_us, s[2] + 1, s[3] + float(value), s[4])
                    if s[2] >= alert_after and not s[4]:
                        _emit("alert", s)
                        s = (s[0], s[1], s[2], s[3], True)
            if s is not None:
                state.update(s)
                # EventTimeTimeout fires once the WATERMARK passes this
                # millisecond timestamp
                state.setTimeoutTimestamp(int((s[1] + gap_us) // 1000))
        yield pd.DataFrame(
            out,
            columns=[f.name for f in SESSION_OUTPUT_SCHEMA.fields],
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _step,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

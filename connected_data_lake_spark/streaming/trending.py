"""Streaming trending top-k via a count-min sketch (custom stateful op).

"What are the hottest keys in each window, right now?" is the classic
streaming query Spark's built-ins can't express: a windowed groupBy-count
is fine, but ranking it (row_number over the running aggregate) is
unsupported on a streaming aggregate, and waiting for the watermark to
close the window defeats "right now". The standard fix (Spaces-Saving /
count-min + heap, the same shape Algebird/Flink use) is a per-window
sketch updated every micro-batch with EARLY emission of the current
top-k — exactly the applyInPandasWithState extension point.

State per window group is one count-min sketch (depth × width int64
matrix, a few KB) plus the exact strings of the current top candidates —
O(windows × sketch size), NOT O(distinct keys), which is the entire
point: a hot-key burst over billions of distinct keys keeps state
bounded. Counts are CMS estimates (overestimates under collision; exact
when width comfortably exceeds distinct keys — the test pins that case);
the candidate set tracks every key seen in a batch where it entered the
sketch, pruned back to ``track`` entries by estimated count, so a key
that is never near the top costs nothing durable.

Event-time timeout reclaims a window's sketch once the watermark passes
its end + grace, the same discipline as sessionize_with_alerts.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TRENDING_SCHEMA = T.StructType(
    [
        T.StructField("window_start_us", T.LongType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("est_count", T.LongType(), False),
        T.StructField("rank", T.IntegerType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("sketch", T.ArrayType(T.LongType()), False),
        T.StructField("cand_keys", T.ArrayType(T.StringType()), False),
    ]
)

_SEEDS = (0x9E3779B9, 0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F)

_INTERVAL_MS = {
    "second": 1_000,
    "seconds": 1_000,
    "minute": 60_000,
    "minutes": 60_000,
    "hour": 3_600_000,
    "hours": 3_600_000,
    "day": 86_400_000,
    "days": 86_400_000,
}


def _interval_to_ms(interval: str) -> int:
    """Milliseconds of a '<n> <unit>' watermark/delay interval string."""
    n, unit = interval.strip().split()
    return int(n) * _INTERVAL_MS[unit.lower()]


def _positions(key: str, width: int, depth: int) -> list[int]:
    import hashlib

    digest = hashlib.md5(key.encode()).digest()
    return [
        (int.from_bytes(digest[4 * d : 4 * d + 4], "big") ^ _SEEDS[d]) % width
        for d in range(depth)
    ]


def _estimate(sketch: np.ndarray, key: str, width: int, depth: int) -> int:
    return int(min(sketch[d, p] for d, p in enumerate(_positions(key, width, depth))))


def trending_topk(
    events: DataFrame,
    window_minutes: int = 60,
    k: int = 5,
    width: int = 1024,
    depth: int = 4,
    track: int = 64,
    key_col: str = "event_type",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-window top-``k`` keys by estimated count, re-emitted every
    micro-batch that touches the window (update semantics — a dashboard
    upserts on (window_start_us, rank)). ``events`` is the normalized
    stream from read_events_stream (ts TIMESTAMP for the watermark,
    ts_us LONG for arithmetic window bucketing)."""
    window_us = window_minutes * 60 * 1_000_000
    delay_ms = _interval_to_ms(watermark)
    bucketed = events.withWatermark("ts", watermark).select(
        "ts",
        (F.col("ts_us") - F.col("ts_us") % window_us).alias("window_start_us"),
        F.col(key_col).cast("string").alias("key"),
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (window_start_us,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            flat, cand = state.get
            sketch = np.asarray(flat, dtype=np.int64).reshape(depth, width)
            candidates = set(cand)
        else:
            sketch = np.zeros((depth, width), dtype=np.int64)
            candidates = set()
        for pdf in pdfs:
            counts = pdf["key"].value_counts()
            for key_str, n in counts.items():
                for d, p in enumerate(_positions(key_str, width, depth)):
                    sketch[d, p] += int(n)
                candidates.add(key_str)
        ranked = sorted(
            ((_estimate(sketch, ks, width, depth), ks) for ks in candidates),
            key=lambda t: (-t[0], t[1]),
        )
        candidates = {ks for _, ks in ranked[:track]}
        state.update((sketch.ravel().tolist(), sorted(candidates)))
        # reclaim the sketch once the watermark passes window END + the
        # lateness bound, anchored in EVENT time like sessionize_with_alerts
        # (stateful.py): the earlier currentWatermark+60s anchor reclaimed a
        # window untouched for >60s of watermark advance while late events
        # for it were still admissible under the watermark — those events
        # rebuilt the sketch from zero and overwrote correct (window, rank)
        # rows with undercounts (ADVICE r5). Once the watermark passes
        # window_end + delay, every event of the window is late-dropped
        # upstream, so reclamation can never lose admissible data. The max
        # guard keeps the timestamp ahead of the current watermark (Spark
        # rejects earlier ones) for windows already fully behind it.
        # int(): the grouping key arrives as numpy int64 and GroupState
        # JSON-serializes the timeout timestamp
        window_end_ms = (int(window_start_us) + window_us) // 1000
        state.setTimeoutTimestamp(
            max(window_end_ms + delay_ms, state.getCurrentWatermarkMs() + 1)
        )
        if ranked:
            top = ranked[:k]
            yield pd.DataFrame(
                {
                    "window_start_us": np.full(len(top), window_start_us, dtype=np.int64),
                    "key": [ks for _, ks in top],
                    "est_count": np.asarray([c for c, _ in top], dtype=np.int64),
                    "rank": np.arange(1, len(top) + 1, dtype="int32"),
                }
            )

    return bucketed.groupBy("window_start_us").applyInPandasWithState(
        update,
        outputStructType=TRENDING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

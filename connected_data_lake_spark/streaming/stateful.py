"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stateful stream processing at all; this is the
mandated Spark-native extension point for operators that windows can't
express — here, a per-user running profile that survives across
micro-batches (count / total value / last seen timestamp), the canonical
"enrich every event with lifetime state" pipeline stage.
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

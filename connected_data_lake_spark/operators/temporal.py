"""Temporal join operators: as-of join (point-in-time lookup).

The reference cannot express this (not in DataFusion 41 core — SURVEY §2.3
J8) and Spark has no native ASOF JOIN either; this is the classic
union-marker emulation, chosen over a range join because it costs ONE
shuffle on the join keys and a per-key sorted window scan — no candidate
explosion, no range-predicate nested loop. DuckDB's native ASOF JOIN
provides the oracle.

Shape: for each left row, attach the most recent right row whose timestamp
is <= the left timestamp (backward direction, inclusive), per join key.
The standard tool for point-in-time-correct feature lookups (training-data
pipelines: join events to the feature/dimension snapshot that was current
at event time — never a future value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward (inclusive) as-of join.

    Every left column survives; each ``right_cols`` entry appears as
    ``{prefix}{col}`` (plus ``{prefix}{right_ts}``, the matched
    timestamp), NULL when the key has no right row at-or-before the left
    timestamp.

    Plan: tag right rows 0 / left rows 1, union by name, and run
    ``last(struct-of-right-values, ignorenulls)`` over a window
    partitioned by the keys, ordered by (ts, tag[, tiebreak]), growing
    from the partition start. Right rows at the same timestamp as a left
    row sort first (tag 0 < 1) — inclusive semantics; the struct keeps
    all matched values from ONE right row (per-column last() could mix
    rows when right columns hold NULLs). ``tiebreak`` (a right column,
    e.g. an event id) makes the winner among equal-timestamp right rows
    deterministic: the greatest tiebreak value wins.

    One hash shuffle on ``on`` + one sort — the same cost class as a
    groupBy; safe at any left/right cardinality ratio. Skewed keys:
    pre-filter right to the left's key set (semi join) or salt.
    """
    right_cols = right_cols or []
    rstruct = F.struct(
        F.col(right_ts).alias("_mts"), *[F.col(c).alias(c) for c in right_cols]
    )
    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("_ts"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_tb"),
        F.lit(0).alias("_side"),
        rstruct.alias("_r"),
    )
    l = left.select(  # noqa: E741
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(1).alias("_side"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
    out = matched.filter(F.col("_side") == 1)
    out = out.withColumn(f"{prefix}{right_ts}", F.col("_m._mts"))
    for c in right_cols:
        out = out.withColumn(f"{prefix}{c}", F.col(f"_m.{c}"))
    return out.drop("_ts", "_tb", "_side", "_r", "_m")


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int = 86_400,
) -> DataFrame:
    """Interval × point range join WITHOUT a nested-loop: bin both sides to
    fixed time buckets, equality-join on the bucket, then apply the exact
    range predicate as a residual filter.

    Neither Spark nor the reference has a native range join (DuckDB's
    IEJoin provides the oracle); the naive formulation
    ``ON p.ts >= i.start AND p.ts < i.end`` plans as BroadcastNestedLoop —
    O(|points| × |intervals|) and a scale-killer. Binning makes it an
    equi-join: each interval explodes to its covered buckets
    (len/bin_seconds + 1 rows — bounded when intervals are short relative
    to the bin), each point maps to exactly ONE bucket (so matches are
    never duplicated), and the shuffle key is the bucket id. Work is
    O(Σ per-bucket points × per-bucket intervals) — the classic
    time-binned spatial-join trade: pick ``bin_seconds`` near the typical
    interval length so most intervals hit 1-2 buckets.

    Semantics: inner join, ``start <= ts < end`` (end exclusive). All
    columns from both inputs survive; inputs must not share column names.
    Timestamps are compared on their unix-second value via an internal
    cast, so DATE/TIMESTAMP/TIMESTAMP_NTZ inputs all work.
    """
    w = int(bin_seconds)
    p_sec = F.unix_timestamp(F.col(point_ts).cast("timestamp"))
    s_sec = F.unix_timestamp(F.col(start_col).cast("timestamp"))
    e_sec = F.unix_timestamp(F.col(end_col).cast("timestamp"))
    p = points.withColumn("_cdl_bin", F.floor(p_sec / w))
    # Degenerate intervals (end <= start) match nothing under the
    # end-exclusive predicate, but sequence(lo, hi) with hi < lo generates a
    # DESCENDING sequence — one malformed row on dirty data would explode to
    # every bucket between its endpoints before the residual filter discards
    # them. Drop such rows before the explode so fan-out is bounded by the
    # true interval length.
    iv = intervals.filter(e_sec > s_sec).withColumn(
        "_cdl_bin",
        F.explode(
            # end-exclusive: the last covered second is end-1
            F.sequence(F.floor(s_sec / w), F.floor((e_sec - 1) / w))
        ),
    )
    out = p.join(iv, "_cdl_bin").filter(
        (F.col(point_ts).cast("timestamp") >= F.col(start_col).cast("timestamp"))
        & (F.col(point_ts).cast("timestamp") < F.col(end_col).cast("timestamp"))
    )
    return out.drop("_cdl_bin")

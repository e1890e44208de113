"""Streaming distribution-drift monitor: per-micro-batch PSI against a
frozen reference histogram.

The continuous twin of the batch ``stats_psi_value_drift`` query
(plans/extensions.py), in the shape production drift monitors actually
run: the REFERENCE side (decile edges + smoothed bucket fractions) is
computed ONCE offline from the reference corpus and frozen as planning
metadata — 9 + 10 doubles — while each micro-batch only buckets its own
rows (a scan-local literal comparison sum, one 10-group aggregate) and
appends one PSI row to the metrics sink. No state store, no stream-stream
join: drift monitoring is stateless per batch BY DESIGN — the reference
never changes until a human re-baselines it.

The reference has no streaming engine (SURVEY §2.10); this extends its
surface the same way streaming/dedup.py extends ingest.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reference_histogram(
    df: DataFrame,
    value_col: str = "value",
    n_buckets: int = 10,
    smoothing: float = 0.5,
    quantize_dp: int = 3,
) -> tuple[list[float], list[float]]:
    """Offline reference build: (decile edges, smoothed bucket fractions)
    of ``value_col`` — 9 + 10 doubles to the driver (planning metadata).
    Values are quantized to ``quantize_dp`` decimals first so the edge
    computation's distinct-value relation is bounded by the value range,
    independent of corpus row count (the batch PSI query's documented
    scale property)."""
    from connected_data_lake_spark.operators.percentile import exact_percentiles

    v = F.round(F.col(value_col), quantize_dp).alias("value")
    base = df.select(v).withColumn("g", F.lit(1))
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    cols = [f"q{i}" for i in range(1, n_buckets)]
    # Spark-side HALF_UP rounding (see the batch PSI query's note on
    # python round()'s banker's-rounding tie behavior)
    row = (
        exact_percentiles(base, ["g"], "value", fracs, cols)
        .select(*[F.round(c, 6).alias(c) for c in cols])
        .collect()[0]
    )
    edges = [row[c] for c in cols]
    bucket = _bucket_expr("value", edges)
    counts = {
        r["bucket"]: r["c"]
        for r in base.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("c"))
        .collect()
    }
    n = sum(counts.values())
    ref = [
        (counts.get(b, 0) + smoothing) / (n + n_buckets * smoothing)
        for b in range(n_buckets)
    ]
    return edges, ref


def _bucket_expr(value_col: str, edges: list[float]):
    return sum(
        (F.when(F.col(value_col) > F.lit(e), 1).otherwise(0) for e in edges),
        start=F.lit(0),
    )


def batch_psi(
    batch_df: DataFrame,
    edges: list[float],
    ref_fracs: list[float],
    value_col: str = "value",
    smoothing: float = 0.5,
    quantize_dp: int = 3,
) -> tuple[int, float]:
    """PSI of one batch against the frozen reference: returns
    ``(n_rows, psi)``. Bucket counts are the only distributed work (one
    10-group aggregate over a scan-local bucket expression); the PSI sum
    over 10 buckets happens driver-side in exact python floats."""
    n_buckets = len(ref_fracs)
    v = F.round(F.col(value_col), quantize_dp).alias("value")
    counts = {
        r["bucket"]: r["c"]
        for r in batch_df.select(v)
        .groupBy(_bucket_expr("value", edges).alias("bucket"))
        .agg(F.count("*").alias("c"))
        .collect()
    }
    n = sum(counts.values())
    psi = 0.0
    for b in range(n_buckets):
        pb = (counts.get(b, 0) + smoothing) / (n + n_buckets * smoothing)
        pr = ref_fracs[b]
        psi += (pr - pb) * math.log(pr / pb)
    return n, round(psi, 6)


def psi_stream(
    values_stream: DataFrame,
    edges: list[float],
    ref_fracs: list[float],
    out_path: str,
    checkpoint_path: str,
    value_col: str = "value",
    smoothing: float = 0.5,
):
    """Wire a streaming DataFrame through per-micro-batch PSI scoring into
    a parquet metrics sink: one ``(epoch_id, n_rows, psi)`` row per batch.
    Returns the started StreamingQuery (availableNow trigger — tests and
    replay jobs await termination; production swaps the trigger)."""

    def _score(batch_df: DataFrame, epoch_id: int) -> None:
        n, psi = batch_psi(
            batch_df, edges, ref_fracs, value_col=value_col, smoothing=smoothing
        )
        batch_df.sparkSession.createDataFrame(
            [(int(epoch_id), n, psi)], "epoch_id long, n_rows long, psi double"
        ).write.mode("append").parquet(out_path)

    return (
        values_stream.writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )

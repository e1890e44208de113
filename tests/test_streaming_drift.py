"""Streaming PSI drift monitor (streaming/drift.py): per-micro-batch PSI
against a frozen reference histogram must agree with the batch scorer on
the same rows, and the reference build must be reproducible."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from connected_data_lake_spark.streaming.drift import (
    batch_psi,
    psi_stream,
    reference_histogram,
)

RNG = random.Random(20260815)


def _values_df(spark, n, shift=0.0):
    rows = [(i, RNG.random() * 100 + shift) for i in range(n)]
    return spark.createDataFrame(rows, "id long, value double")


def test_reference_histogram_fracs_sum_to_one(spark):
    ref_df = _values_df(spark, 2000)
    edges, fracs = reference_histogram(ref_df, "value")
    assert len(edges) == 9 and len(fracs) == 10
    assert edges == sorted(edges)
    assert math.isclose(sum(fracs), 1.0, rel_tol=1e-9)
    # deterministic rebuild
    assert reference_histogram(ref_df, "value") == (edges, fracs)


def test_batch_psi_zero_on_reference_itself(spark):
    ref_df = _values_df(spark, 2000)
    edges, fracs = reference_histogram(ref_df, "value")
    n, psi = batch_psi(ref_df, edges, fracs, "value")
    assert n == 2000
    # scoring the reference against itself: identical smoothed fractions
    assert psi == 0.0


def test_batch_psi_flags_shifted_distribution(spark):
    ref_df = _values_df(spark, 2000)
    edges, fracs = reference_histogram(ref_df, "value")
    _, psi_same = batch_psi(_values_df(spark, 1000), edges, fracs, "value")
    _, psi_shift = batch_psi(_values_df(spark, 1000, shift=60.0), edges, fracs, "value")
    assert psi_shift > psi_same
    assert psi_shift > 0.25  # the conventional "significant drift" bar


def test_stream_psi_matches_batch_per_file(spark, tmp_path):
    """File-source replay: each input file becomes (at least) one
    micro-batch; the union of streamed PSI rows must cover the same row
    count, and re-scoring each micro-batch's rows in batch mode must
    reproduce its streamed PSI exactly (twin parity)."""
    ref_df = _values_df(spark, 2000)
    edges, fracs = reference_histogram(ref_df, "value")
    src = tmp_path / "in"
    for i in range(3):
        _values_df(spark, 300, shift=20.0 * i).withColumn(
            "part", F.lit(i)
        ).coalesce(1).write.mode("append").parquet(str(src))
    stream = (
        spark.readStream.schema("id long, value double, part int")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    q = psi_stream(stream, edges, fracs, str(out), str(ckpt))
    q.awaitTermination(120)
    got = spark.read.parquet(str(out)).collect()
    assert sum(r["n_rows"] for r in got) == 900
    assert all(math.isfinite(r["psi"]) for r in got)
    # twin parity: each micro-batch is exactly one input file
    # (maxFilesPerTrigger=1), so the streamed (n_rows, psi) multiset must
    # equal batch_psi over each file scored directly
    import glob

    expected = sorted(
        batch_psi(spark.read.parquet(f), edges, fracs, "value")
        for f in glob.glob(str(src / "*.parquet"))
    )
    assert sorted((r["n_rows"], r["psi"]) for r in got) == expected

"""operators/heavyhitters.py — the exactness and partitioning-independence
properties the fixture-bound oracle can't exercise."""

from __future__ import annotations

from collections import Counter

import random

from connected_data_lake_spark.operators.heavyhitters import heavy_hitters

RNG = random.Random(20260815)


def _items(n_heavy=3, n_tail=400, rows=4000):
    rows_out = []
    for i in range(n_heavy):
        rows_out += [f"heavy{i}"] * (rows // (n_heavy + 2))
    while len(rows_out) < rows:
        rows_out.append(f"tail{RNG.randrange(n_tail)}")
    RNG.shuffle(rows_out)
    return rows_out


def test_exact_and_partitioning_independent(spark):
    data = _items()
    truth = {
        it: c for it, c in Counter(data).items() if c * 50 > len(data)
    }
    for n_parts in (1, 7, 32):
        df = spark.createDataFrame(
            [(x,) for x in data], "item string"
        ).repartition(n_parts)
        got = {r["item"]: r["cnt"] for r in heavy_hitters(df, "item", 50).collect()}
        assert got == truth, f"n_parts={n_parts}"


def test_no_heavy_hitters_yields_empty(spark):
    data = [f"u{i}" for i in range(1000)]  # all unique
    df = spark.createDataFrame([(x,) for x in data], "item string")
    assert heavy_hitters(df, "item", 100).count() == 0

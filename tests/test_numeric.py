"""gcd/lcm Euclid-fold columns (functions/numeric.py) vs Python's math."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from connected_data_lake_spark.functions.numeric import gcd, lcm


def test_gcd_lcm_match_math_module(spark):
    rng = random.Random(11)
    rows = [(rng.randrange(0, 10**12), rng.randrange(0, 10**12)) for _ in range(400)]
    # worst-case Euclid step counts (consecutive Fibonacci numbers), zeros,
    # equal values, negatives (result is defined non-negative)
    fib_a, fib_b = 7540113804746346429, 4660046610375530309  # F(92), F(91)
    rows += [(0, 0), (0, 9), (9, 0), (5, 5), (-12, 18), (12, -18), (fib_a, fib_b)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = df.select(
        "a",
        "b",
        gcd(F.col("a"), F.col("b")).alias("g"),
        lcm(F.col("a") % 10_000, F.col("b") % 10_000).alias("l"),
    ).collect()
    for r in out:
        assert r.g == math.gcd(r.a, r.b), (r.a, r.b, r.g)
        # Spark % is a remainder (sign of dividend), Python % is a modulo —
        # mirror Spark's semantics exactly (fmod would go through float and
        # lose precision on 19-digit longs); math.lcm is sign-insensitive
        def rem(x: int) -> int:
            return (abs(x) % 10_000) * (1 if x >= 0 else -1)

        assert r.l == math.lcm(rem(r.a), rem(r.b)), (r.a, r.b, r.l)


def test_lcm_exact_above_double_mantissa(spark):
    """lcm must use exact integer division: |a|/gcd through DoubleType
    rounds for |a| >= 2^53 (lcm(2^53+1, 2) would return 2^54 instead of
    2^54+2)."""
    big = 2**53 + 1
    rows = [(big, 2), (2**62 - 1, 1), (big, big), (3**33, 2 * 3**33)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = df.select("a", "b", lcm(F.col("a"), F.col("b")).alias("l")).collect()
    for r in out:
        assert r.l == math.lcm(r.a, r.b), (r.a, r.b, r.l)


def test_fold_stays_jvm_side(spark):
    """The whole point of the fold: no Python UDF in the plan."""
    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") * 7 % 13).alias("b")
    )
    plan = (
        df.select(gcd(F.col("a"), F.col("b")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

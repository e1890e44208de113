"""Numeric scalar functions Spark lacks but the reference surface lists.

SURVEY §2.8 math family (DataFusion ``math_expressions``) includes ``gcd``
and ``lcm``; Spark has no built-ins for either. Rather than a Python UDF
(row-at-a-time, off the JVM hot path), both are expressed as a bounded
Euclid fold over ``F.aggregate`` — a per-row constant-length higher-order
function that stays entirely in the JVM. The fold runs 96 iterations with
an early-exit guard (``y = 0`` keeps the state fixed); 92 iterations is
the worst case for 64-bit inputs (consecutive Fibonacci numbers maximize
Euclid's step count), so the bound is exact, not a heuristic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Euclid worst case for 64-bit magnitudes (Fibonacci pairs) is 92 steps.
_EUCLID_BOUND = 96


def gcd(a: Column, b: Column) -> Column:
    """Greatest common divisor of two integral columns (non-negative
    BIGINT; gcd(0, 0) = 0, matching DuckDB/PostgreSQL)."""
    a0 = F.abs(a.cast("long"))
    b0 = F.abs(b.cast("long"))
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(_EUCLID_BOUND)),
        F.struct(a0.alias("x"), b0.alias("y")),
        lambda acc, _: F.when(acc.y == 0, acc).otherwise(
            F.struct(acc.y.alias("x"), (acc.x % acc.y).alias("y"))
        ),
        lambda acc: acc.x,
    )


def lcm(a: Column, b: Column) -> Column:
    """Least common multiple (non-negative BIGINT; lcm(0, x) = 0).

    Computed as ``(|a| div gcd) · |b|`` — dividing before multiplying keeps
    the intermediate within range whenever the true lcm fits in BIGINT.
    The division uses Spark's ``div`` (IntegralDivide, exact on LONG), not
    ``/`` (DoubleType): gcd divides |a| exactly, but a double quotient
    rounds for |a| ≥ 2^53 (e.g. a = 2^53+1, b = 2 would return 2^54
    instead of 2^54+2).
    """
    g = gcd(a, b)
    return F.when(g == 0, F.lit(0).cast("long")).otherwise(
        F.call_function("div", F.abs(a.cast("long")), g) * F.abs(b.cast("long"))
    )

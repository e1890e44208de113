"""Vector (embedding) column functions.

Embeddings are ``array<float>`` columns; all math is done JVM-side with
higher-order functions after casting to double (left-fold accumulation —
deterministic, and bit-identical to DuckDB's list_* double kernels, which
makes these functions oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product (double) via zip_with + left-fold aggregate."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str) -> Column:
    """L2 norm (double)."""
    return F.sqrt(
        F.aggregate(as_double(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity (double)."""
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance (double)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(as_double(a), as_double(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
